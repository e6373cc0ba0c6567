"""Rolling z-score anomaly detection."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.operators.anomaly import rolling_anomaly


def _events(spark, counts, key="k"):
    """One event per count unit on consecutive days of 2024-01."""
    rows = []
    for day, n in enumerate(counts, start=1):
        for i in range(n):
            rows.append((key, datetime(2024, 1, day, 0, i % 60)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_rolling_anomaly_hand_computed(spark):
    """Baseline excludes today; flat history -> std 0 -> z NULL; a
    spike against a varied baseline computes the closed-form z."""
    # days: 2,4,2,4,2,4,30  -> for day 7: mean=3, var=1, z=(30-3)/1=27
    ev = _events(spark, [2, 4, 2, 4, 2, 4, 30])
    got = {
        str(r["day"]): r
        for r in rolling_anomaly(ev, min_history=3).collect()
    }
    assert len(got) == 7
    # first two days: history < 3 -> all NULL, not anomalous
    for d in ("2024-01-01", "2024-01-02"):
        r = got[d]
        assert r["baseline_mean"] is None and r["z"] is None
        assert r["is_anomaly"] is False
    d7 = got["2024-01-07"]
    assert d7["n_events"] == 30
    assert d7["baseline_mean"] == 3.0
    assert d7["baseline_std"] == 1.0
    assert d7["z"] == 27.0
    assert d7["is_anomaly"] is True
    # day 4 (baseline 2,4,2: mean 8/3, std sqrt(8/9)): z small, no flag
    d4 = got["2024-01-04"]
    assert d4["is_anomaly"] is False
    assert d4["z"] == pytest.approx((4 - 8 / 3) / (8 / 9) ** 0.5, abs=1e-3)


def test_rolling_anomaly_flat_baseline_never_divides_by_zero(spark):
    """Constant history -> std 0 -> z NULL even for a deviating day."""
    ev = _events(spark, [3, 3, 3, 3, 50])
    r = [x for x in rolling_anomaly(ev).collect() if x["n_events"] == 50][0]
    assert r["baseline_std"] == 0.0
    assert r["z"] is None and r["is_anomaly"] is False


def test_rolling_anomaly_window_is_key_partitioned(spark):
    """Scale shape: the window partitions by key (never a single-task
    global window) and its input is the (key, day) pre-aggregate."""
    ev = _events(spark, [1, 2, 3]).unionByName(
        _events(spark, [3, 2, 1], key="other")
    )
    out = rolling_anomaly(ev)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the window's partition spec names the key column
    spec = plan.split("windowspecdefinition(")[1]
    assert spec.startswith("key")
    # per-key frames are independent
    assert out.filter(F.col("key") == "other").count() == 3
    with pytest.raises(ValueError):
        rolling_anomaly(ev, window_days=0)


# ---------------------------------------------------------------------------
# burst_detect — RANGE-frame sliding-window rate limiting
# ---------------------------------------------------------------------------


def test_burst_detect_sliding_window_exact(spark):
    """A burst straddling a tumbling-bucket edge is still caught:
    3 events within any 60s window trigger, regardless of alignment."""
    import datetime as dt

    from dandi_s3_log_parser_spark.operators.anomaly import burst_detect

    T = lambda m, s=0: dt.datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    rows = [
        # u1: events at 10:00:30, 10:01:00, 10:01:20 -> 3rd sees all
        (1, 1, T(0, 30)), (1, 2, T(1, 0)), (1, 3, T(1, 20)),
        # u1: far-away single event -> trailing count 1
        (1, 4, T(30)),
        # u2: two events only -> never reaches 3
        (2, 5, T(0)), (2, 6, T(0, 30)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = burst_detect(
        df, window_seconds=60, threshold=3
    ).collect()
    assert [(r["user_id"], r["event_id"], r["trailing_count"]) for r in got] == [
        (1, 3, 3)
    ]


def test_burst_detect_window_is_inclusive_and_exact_boundary(spark):
    """An event exactly window_seconds before counts (closed frame);
    one microsecond earlier does not."""
    import datetime as dt

    from dandi_s3_log_parser_spark.operators.anomaly import burst_detect

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows_in = [(1, 1, t0), (1, 2, t0 + dt.timedelta(seconds=60))]
    rows_out = [
        (1, 1, t0 - dt.timedelta(microseconds=1)),
        (1, 2, t0 + dt.timedelta(seconds=60)),
    ]
    schema = "user_id long, event_id long, ts timestamp"
    got_in = burst_detect(
        spark.createDataFrame(rows_in, schema), window_seconds=60, threshold=2
    ).collect()
    got_out = burst_detect(
        spark.createDataFrame(rows_out, schema), window_seconds=60, threshold=2
    ).collect()
    assert [r["event_id"] for r in got_in] == [2]
    assert got_out == []


def test_burst_detect_ties_are_peers(spark):
    """Same-microsecond events all see the same trailing count (value-
    based frame), so the result is independent of within-tie order."""
    import datetime as dt

    from dandi_s3_log_parser_spark.operators.anomaly import burst_detect

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(1, i, t0) for i in range(3)]
    got = burst_detect(
        spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp"),
        window_seconds=60,
        threshold=3,
    ).collect()
    assert sorted(r["event_id"] for r in got) == [0, 1, 2]
    assert {r["trailing_count"] for r in got} == {3}
