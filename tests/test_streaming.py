"""Streaming reduce: equivalence with batch + checkpointed incremental drain."""

import pandas.testing
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.datagen import generate, to_spark
from dandi_s3_log_parser_spark.operators.reduce import (
    parse_and_filter_log_lines,
    split_reduced,
)
from dandi_s3_log_parser_spark.functions.text import with_header_and_text
from dandi_s3_log_parser_spark.plans.lineage import LineageLog
from dandi_s3_log_parser_spark.sources.tables import Catalog
from dandi_s3_log_parser_spark.streaming.stream_reduce import (
    read_stream_errors,
    read_stream_reduced,
    stream_reduce,
)

COLS = ["timestamp", "ip_address", "object_key", "bytes_sent"]


def _sorted(df):
    return df[COLS].sort_values(COLS).reset_index(drop=True)


def test_stream_reduce_matches_batch_and_resumes(spark, tmp_path):
    tables = generate(600, seed=19)
    pages, dims = to_spark(spark, tables)

    # land the first half, drain, then land the rest and drain again
    pages_dir = tmp_path / "pages"
    ckpt = tmp_path / "ckpt"
    first = pages.filter(F.dayofmonth("warc_ts") <= 3)
    second = pages.filter(F.dayofmonth("warc_ts") > 3)
    first.write.mode("append").parquet(str(pages_dir))

    catalog = Catalog(spark, tmp_path / "wh")
    q = stream_reduce(
        spark, str(pages_dir), catalog, str(ckpt), excluded_ips=dims["excluded_ips"]
    )
    q.awaitTermination(300)
    mid = read_stream_reduced(catalog).count()
    assert mid > 0

    second.write.mode("append").parquet(str(pages_dir))
    q2 = stream_reduce(
        spark, str(pages_dir), catalog, str(ckpt), excluded_ips=dims["excluded_ips"]
    )
    q2.awaitTermination(300)

    got = _sorted(read_stream_reduced(catalog).toPandas())
    # batch reference over the same pages
    kept, _ = split_reduced(
        parse_and_filter_log_lines(
            with_header_and_text(pages), "header",
            excluded_ips=dims["excluded_ips"],
        )
    )
    want = _sorted(kept.select(*COLS).toPandas())
    assert len(got) > mid  # second drain added rows (checkpoint resumed, no re-read)
    pandas.testing.assert_frame_equal(got, want)

    lin = LineageLog(catalog, "stream_lineage").read().toPandas()
    assert (lin["rows_in"] >= lin["rows_out"]).all()


def test_stream_errors_side_channel_matches_batch(spark, tmp_path):
    """A malformed line lands in the stream error side-channel (never
    dropped — reference ``_error_collection.py`` semantics), and the
    batch and streaming reduce agree on both kept and error counts over
    the same input."""
    import datetime

    good = (
        "owner bucket [01/Jan/2020:05:06:35 +0000] 9.9.9.9 - REQ1 REST.GET.OBJECT "
        'blobs/aaa/bbb/cc "GET /blobs/aaa/bbb/cc HTTP/1.1" 200 - 512 512 1 1 '
        '"-" "agent/1.0" - H== - C - host TLSv1.2 - -'
    )
    # three opening ' "' quote starts, zero matching '" ' ends after them
    bad = (
        "owner bucket [01/Jan/2020:05:06:36 +0000] 9.9.9.9 - REQ2 REST.GET.OBJECT "
        'blobs/aaa/bbb/cc "GET /x "y "z'
    )
    ts = datetime.datetime(2020, 1, 1, 5, 6)
    pages = spark.createDataFrame(
        [
            ("u1", ts, (good + "\nbody").encode(), "body", "en"),
            ("u2", ts, (bad + "\nbody").encode(), "body", "en"),
        ],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    pages_dir = tmp_path / "pages"
    pages.write.mode("append").parquet(str(pages_dir))

    catalog = Catalog(spark, tmp_path / "wh")
    q = stream_reduce(spark, str(pages_dir), catalog, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    errs = read_stream_errors(catalog).toPandas()
    assert len(errs) == 1
    assert errs["parse_status"].iloc[0].startswith("error_")
    assert read_stream_reduced(catalog).count() == 1

    # batch parity on the identical input
    kept_b, errors_b = split_reduced(
        parse_and_filter_log_lines(with_header_and_text(pages), "header")
    )
    assert kept_b.count() == read_stream_reduced(catalog).count()
    assert errors_b.count() == len(errs)

    # the error count is committed to per-batch lineage
    lin = LineageLog(catalog, "stream_lineage").read().toPandas()
    err_rows = lin[lin["stage"] == "stream_reduce_errors"]
    assert err_rows["rows_out"].sum() == 1
