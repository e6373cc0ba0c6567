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
