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
from dandi_s3_log_parser_spark.streaming.stream_reduce import stream_reduce

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
    mid = catalog.read("reduced_stream").count()
    assert mid > 0

    second.write.mode("append").parquet(str(pages_dir))
    q2 = stream_reduce(
        spark, str(pages_dir), catalog, str(ckpt), excluded_ips=dims["excluded_ips"]
    )
    q2.awaitTermination(300)

    got = _sorted(catalog.read("reduced_stream").toPandas())
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
