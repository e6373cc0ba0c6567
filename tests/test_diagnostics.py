"""Pre-flight join diagnostics: hand-computed cardinality + skew
attribution; the sf0.01 parity gate covers it at corpus scale."""

from __future__ import annotations

import pytest

from dandi_s3_log_parser_spark.operators.diagnostics import (
    join_size_estimate,
)


def test_join_size_estimate_hand_computed(spark):
    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 1 + [(None,)],
        "k string",
    )
    right = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 1 + [("d",)] * 5 + [(None,)],
        "k string",
    )
    rows = join_size_estimate(left, right, "k", topn=2).collect()
    # summary: |A join B| = 3*4 + 2*1 = 14 (c and d don't meet, NULLs
    # never join)
    summary = [r for r in rows if r["key"] is None][0]
    assert summary["contrib"] == 14
    assert summary["share"] == 1.0 and summary["cum_share"] is None
    top = sorted(
        (r for r in rows if r["key"] is not None),
        key=lambda r: -r["contrib"],
    )
    assert [(r["key"], r["contrib"]) for r in top] == [("a", 12), ("b", 2)]
    assert top[0]["share"] == pytest.approx(12 / 14, abs=1e-6)
    assert top[0]["cum_share"] == top[0]["share"]
    assert top[1]["cum_share"] == pytest.approx(
        round(12 / 14, 6) + round(2 / 14, 6), abs=1e-9
    )


def test_join_size_estimate_empty_overlap(spark):
    left = spark.createDataFrame([("a",)], "k string")
    right = spark.createDataFrame([("b",)], "k string")
    rows = join_size_estimate(left, right, "k").collect()
    assert len(rows) == 1  # only the summary row
    assert rows[0]["key"] is None and rows[0]["contrib"] == 0


def test_join_size_estimate_plan_no_window(spark):
    left = spark.createDataFrame([("a",), ("b",)], "k string")
    right = spark.createDataFrame([("a",)], "k string")
    out = join_size_estimate(left, right, "k", topn=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # cum_share is the triangle join
