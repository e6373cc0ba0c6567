"""Checkpointed resume semantics + error side-output."""

import pandas as pd
import pandas.testing
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.datagen import generate, to_spark
from dandi_s3_log_parser_spark.operators.reduce import (
    parse_and_filter_log_lines,
    split_reduced,
)
from dandi_s3_log_parser_spark.plans.lineage import LineageLog
from dandi_s3_log_parser_spark.plans.pipeline import (
    PipelineConfig,
    run_bin_stage,
    run_pipeline,
    run_reduce_stage,
)
from dandi_s3_log_parser_spark.sources.tables import Catalog


def test_resume_mid_pipeline(spark, tmp_path):
    """Simulate an interrupted run (only 2 days reduced) then resume; the
    final tables must equal a clean single run (reference J5 anti-join
    resume + two-phase commit semantics)."""
    tables = generate(800, seed=11)
    pages, dims = to_spark(spark, tables)
    cfg = PipelineConfig()

    # clean single run
    clean_cat = Catalog(spark, tmp_path / "clean")
    run_pipeline(spark, clean_cat, pages, dims, cfg, "clean")

    # interrupted: reduce only the first two days, then resume everything
    resumed_cat = Catalog(spark, tmp_path / "resumed")
    lineage = LineageLog(resumed_cat)
    two_days = pages.filter(
        F.date_format("warc_ts", "yyyy-MM-dd").isin("2024-03-01", "2024-03-02")
    )
    done = run_reduce_stage(
        spark, resumed_cat, two_days, cfg, lineage, "part1",
        excluded_ips=dims["excluded_ips"],
    )
    assert sorted(done) == ["2024-03-01", "2024-03-02"]
    run_bin_stage(spark, resumed_cat, cfg, lineage, "part1")

    run_pipeline(spark, resumed_cat, pages, dims, cfg, "part2", resume=True)

    # resume processed only the remaining days
    lin = lineage.read().toPandas()
    p2 = lin[(lin["run_id"] == "part2") & (lin["stage"] == "reduce")]
    assert set(p2["input_partition"]) == {"2024-03-03", "2024-03-04", "2024-03-05"}

    for table in ("reduced", "binned", "dandiset_summary_by_asset", "version_summary_by_day"):
        a = clean_cat.read(table).toPandas()
        b = resumed_cat.read(table).toPandas()
        cols = sorted(a.columns)
        pandas.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )


def test_unparseable_line_goes_to_errors(spark):
    """A structurally-broken line (mismatched quote blocks) is dropped AND
    recorded in the error side-output (reference ``_error_collection``)."""
    good = (
        "owner bucket [01/Jan/2020:05:06:35 +0000] 9.9.9.9 - REQ1 REST.GET.OBJECT "
        'blobs/aaa/bbb/cc "GET /blobs/aaa/bbb/cc HTTP/1.1" 200 - 512 512 1 1 '
        '"-" "agent/1.0" - H== - C - host TLSv1.2 - -'
    )
    # three opening ' "' quote starts, zero matching '" ' ends after them
    bad = (
        'owner bucket [01/Jan/2020:05:06:36 +0000] 9.9.9.9 - REQ2 REST.GET.OBJECT '
        'blobs/aaa/bbb/cc "GET /x "y "z'
    )
    df = spark.createDataFrame([(good,), (bad,)], ["value"])
    parsed = parse_and_filter_log_lines(df, "value")
    kept, errors = split_reduced(parsed)
    assert kept.count() == 1
    err = errors.toPandas()
    assert len(err) == 1
    assert err["parse_status"].iloc[0].startswith("error_")
