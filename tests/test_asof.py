"""As-of join: semantics pinned on an explicit fixture, plan audited.

The operator's contract is DuckDB ``ASOF LEFT JOIN`` (the registered
query's oracle); these tests pin the corner cases a hash-verified bulk
comparison can mask — inclusive-timestamp ties, no-earlier-row NULLs,
NULL keys never matching, the tolerance bound — and the one-exchange
plan shape the docstring promises.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dandi_s3_log_parser_spark.operators.asof import asof_join  # noqa: E402


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T00:00:00")),  # == snap ts: inclusive
            (2, 7, _ts("2024-01-05T12:00:00")),  # between snaps
            (3, 7, _ts("2023-12-31T23:59:59")),  # before first: NULL
            (4, 8, _ts("2024-02-01T00:00:00")),  # other key, after both
            (5, None, _ts("2024-01-05T00:00:00")),  # NULL key: no match
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01T00:00:00"), "a"),
            (7, _ts("2024-01-04T00:00:00"), "b"),
            (8, _ts("2024-01-02T00:00:00"), "c"),
            (None, _ts("2024-01-01T00:00:00"), "nullkey"),
        ],
        "user_id long, snap_ts timestamp, plan string",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="snap_ts",
        value_cols=["plan"],
    )
    got = {r["event_id"]: r["plan"] for r in out.collect()}
    assert got == {1: "a", 2: "b", 3: None, 4: "c", 5: None}


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="snap_ts",
        value_cols=["plan"], tolerance_seconds=2 * 86400,
    )
    got = {r["event_id"]: r["plan"] for r in out.collect()}
    # event 2 is 1.5 days after snap b (fresh); event 4 is 30 days
    # after snap c (stale -> NULL)
    assert got == {1: "a", 2: "b", 3: None, 4: None, 5: None}


def test_asof_join_single_exchange(spark):
    """The docstring's scale claim: ONE hash exchange on the key, no
    join node at all (union + running window), nothing resembling a
    range-explosion cross join."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="snap_ts",
        value_cols=["plan"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# interval_overlap_join — bucketized overlap join
# ---------------------------------------------------------------------------


def _iv(spark, rows):
    import datetime as dt  # noqa: F401

    return spark.createDataFrame(
        rows, "uid long, id long, start timestamp, end timestamp"
    )


def test_interval_overlap_join_semantics(spark):
    import datetime as dt

    from dandi_s3_log_parser_spark.operators.asof import interval_overlap_join

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    left = _iv(spark, [
        (1, 10, T(9, 0), T(9, 45)),   # overlaps r100 across 3 x 15-min buckets
        (1, 11, T(11, 0), T(11, 5)),  # overlaps nothing
        (2, 12, T(9, 0), T(9, 45)),   # same times, other key -> no match
        (1, 13, T(12, 0), T(11, 0)),  # invalid (end < start) -> dropped
        (1, 14, T(9, 40), T(9, 41)),  # second overlap with r100
    ])
    right = _iv(spark, [
        (1, 100, T(9, 30), T(10, 30)),
        (1, 101, T(11, 6), T(11, 7)),
        (2, 102, T(23, 0), T(23, 30)),
    ])
    got = {
        (r["l_id"], r["r_id"]): r
        for r in interval_overlap_join(
            left, right, key_col="uid", bucket_seconds=900
        ).collect()
    }
    # emit-once: (10, 100) share buckets 9:30 and 9:45 but appear once
    assert set(got) == {(10, 100), (14, 100)}
    assert got[(10, 100)]["overlap_start"] == T(9, 30)
    assert got[(10, 100)]["overlap_end"] == T(9, 45)
    assert got[(14, 100)]["overlap_start"] == T(9, 40)


def test_interval_overlap_join_closed_boundary_and_micros(spark):
    """Closed-interval touch at the boundary matches, and sub-second
    timestamps are compared exactly (micros, not truncated seconds)."""
    import datetime as dt

    from dandi_s3_log_parser_spark.operators.asof import interval_overlap_join

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0, 500000)
    left = _iv(spark, [(1, 1, dt.datetime(2024, 1, 1, 9), t0)])
    # starts 1 microsecond after left ends -> NO overlap; equal -> overlap
    r_touch = _iv(spark, [(1, 2, t0, dt.datetime(2024, 1, 1, 11))])
    r_miss = _iv(spark, [
        (1, 3, t0 + dt.timedelta(microseconds=1), dt.datetime(2024, 1, 1, 11))
    ])
    assert interval_overlap_join(left, r_touch, key_col="uid").count() == 1
    assert interval_overlap_join(left, r_miss, key_col="uid").count() == 0


def test_interval_overlap_join_plan_is_hash_join(spark):
    import datetime as dt

    from dandi_s3_log_parser_spark.operators.asof import interval_overlap_join

    df = _iv(spark, [(1, 1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))])
    plan = (
        interval_overlap_join(df, df, key_col="uid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
