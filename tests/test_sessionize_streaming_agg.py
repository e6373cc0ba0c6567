"""Sessionization (batch window-function + streaming session_window)
and watermarked streaming windowed totals."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from dandi_s3_log_parser_spark.streaming.stream_aggregate import (
    stream_session_stats,
    stream_windowed_totals,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions — (09:00, 09:10, 09:25) then gap >30min
        # -> (11:00, 11:05)
        (1, _ts(9, 0)), (1, _ts(9, 10)), (1, _ts(9, 25)),
        (1, _ts(11, 0)), (1, _ts(11, 5)),
        # user 2: one singleton
        (2, _ts(9, 30)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_assigns_gap_sessions(events):
    got = sessionize(events, gap_minutes=30).collect()
    sess = {(r["user_id"], r["ts"].hour, r["ts"].minute): r["session_id"]
            for r in got}
    assert sess[(1, 9, 0)] == sess[(1, 9, 10)] == sess[(1, 9, 25)] == 0
    assert sess[(1, 11, 0)] == sess[(1, 11, 5)] == 1
    assert sess[(2, 9, 30)] == 0


def test_session_stats_boundary_is_strict(spark):
    # gap EXACTLY 30min does not open a new session (> not >=)
    rows = [(1, _ts(9, 0)), (1, _ts(9, 30)), (1, _ts(10, 1))]
    d = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = session_stats(d, gap_minutes=30).collect()
    assert sorted((r["session_id"], r["n_events"]) for r in out) == [
        (0, 2), (1, 1),
    ]


def test_sessionize_deterministic_under_repartition(events):
    a = sorted(map(tuple, session_stats(events, gap_minutes=30).collect()))
    b = sorted(
        map(tuple, session_stats(events.repartition(5), gap_minutes=30).collect())
    )
    assert a == b


def test_stream_windowed_totals_matches_batch(spark, tmp_path):
    # batch-equivalence of the streaming windowed agg: availableNow
    # drains a static parquet dir; watermarked append-mode emits every
    # window once the stream is exhausted
    src = str(tmp_path / "events_src")
    events = spark.range(200).select(
        (F.col("id") % 7).alias("user_id"),
        (
            F.lit(dt.datetime(2024, 1, 1))
            + F.make_interval(mins=F.col("id") * 11)
        ).alias("ts"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = stream_windowed_totals(
        stream, key_col="user_id", value_col="value", window="1 hour"
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n", "value_sum")
    )
    got = sorted(map(tuple, spark.read.parquet(sink).collect()))
    want = sorted(map(tuple, batch.collect()))
    # append-mode only emits windows the watermark has CLOSED; the
    # final windows (inside the 2h watermark of max ts) stay in state
    assert len(got) > 0
    assert set(got).issubset(set(want))
    max_ts = events.agg(F.max("ts")).first()[0]
    horizon = max_ts - dt.timedelta(hours=3)  # watermark 2h + window 1h
    closed = [w for w in want if w[0] < horizon]
    assert set(closed).issubset(set(got))
    shutil.rmtree(sink, ignore_errors=True)


def test_stream_session_window_matches_batch_sessionize(spark, tmp_path):
    # session_window on a drained stream == batch window-function
    # sessionization (same gap), for sessions the watermark closed
    src = str(tmp_path / "sess_src")
    rows = [
        (1, _ts(9, 0)), (1, _ts(9, 10)), (1, _ts(9, 25)),
        (1, _ts(11, 0)), (1, _ts(11, 5)),
        (2, _ts(9, 30)),
        # a late sentinel far ahead so the watermark passes the others
        (99, dt.datetime(2024, 1, 2, 23, 0)),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = stream_session_stats(stream, gap="30 minutes", watermark="1 hour")
    sink = str(tmp_path / "sess_sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    assert (1, _ts(9, 0), 3) in got
    assert (1, _ts(11, 0), 2) in got
    assert (2, _ts(9, 30), 1) in got


def test_sessionize_two_phase_equals_single_window(spark):
    """Bucketed two-phase sessionization must be row-identical to the
    single-window formulation, including sessions spanning bucket
    boundaries and multi-bucket-gap silences."""
    import random

    rng = random.Random(7)
    rows = []
    # hot user: 400 events across 10 days with random gaps straddling
    # the 30-min threshold and several >1-day silences
    t = dt.datetime(2024, 1, 1)
    for i in range(400):
        step = rng.choice([dt.timedelta(minutes=rng.randint(1, 90)),
                           dt.timedelta(hours=rng.randint(1, 30))])
        t = t + step
        rows.append((1, t))
    # a user whose sessions cross midnight exactly
    rows += [(2, dt.datetime(2024, 1, 1, 23, 50)),
             (2, dt.datetime(2024, 1, 2, 0, 10)),
             (2, dt.datetime(2024, 1, 2, 0, 41))]
    d = spark.createDataFrame(rows, "user_id long, ts timestamp")
    a = sorted(map(tuple, sessionize(d, gap_minutes=30, skew_bucket="day").collect()))
    b = sorted(map(tuple, sessionize(d, gap_minutes=30, skew_bucket=None).collect()))
    assert a == b
    # midnight-crossing pair stays one session; 0:41 (31min gap) splits
    got = {(r[0], r[1]): r[2] for r in a}
    assert got[(2, dt.datetime(2024, 1, 1, 23, 50))] == got[(2, dt.datetime(2024, 1, 2, 0, 10))]
    assert got[(2, dt.datetime(2024, 1, 2, 0, 41))] == got[(2, dt.datetime(2024, 1, 2, 0, 10))] + 1


# ---------------------------------------------------------------------------
# event_funnel — ordered first-touch conversion
# ---------------------------------------------------------------------------


def _fev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_event_funnel_strict_ordering(spark):
    from dandi_s3_log_parser_spark.operators.sessionize import event_funnel

    rows = [
        # u1 converts fully in order
        (1, _ts(9, 0), "view"), (1, _ts(9, 5), "click"),
        (1, _ts(9, 9), "buy"),
        # u2 clicked BEFORE its first view -> stops at step 1
        (2, _ts(8, 0), "click"), (2, _ts(9, 0), "view"),
        # u3 view -> click, no buy
        (3, _ts(9, 0), "view"), (3, _ts(9, 30), "click"),
        # u4 never viewed -> counted nowhere
        (4, _ts(9, 0), "buy"),
    ]
    out = {r["step"]: r for r in
           event_funnel(_fev(spark, rows), ["view", "click", "buy"])
           .collect()}
    assert out["view"]["keys"] == 3
    assert out["click"]["keys"] == 2
    assert out["buy"]["keys"] == 1
    assert out["view"]["conversion"] == 1.0
    assert out["click"]["conversion"] == pytest.approx(0.6667)
    assert out["buy"]["conversion"] == pytest.approx(0.3333)
    assert [r["step_index"] for r in sorted(
        out.values(), key=lambda r: r["step_index"])] == [1, 2, 3]


def test_event_funnel_same_timestamp_not_counted(spark):
    """Strictly-after semantics: a click at the exact view time does
    not convert (first-touch funnels require progression in time)."""
    from dandi_s3_log_parser_spark.operators.sessionize import event_funnel

    rows = [(1, _ts(9, 0), "view"), (1, _ts(9, 0), "click"),
            (1, _ts(9, 1), "click")]
    out = {r["step"]: r["keys"] for r in
           event_funnel(_fev(spark, rows), ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}

    rows2 = [(1, _ts(9, 0), "view"), (1, _ts(9, 0), "click")]
    out2 = {r["step"]: r["keys"] for r in
            event_funnel(_fev(spark, rows2), ["view", "click"]).collect()}
    assert out2 == {"view": 1, "click": 0}


def test_event_funnel_empty_first_step_null_conversion(spark):
    from dandi_s3_log_parser_spark.operators.sessionize import event_funnel

    rows = [(1, _ts(9, 0), "click")]
    got = event_funnel(_fev(spark, rows), ["view", "click"]).collect()
    assert [(r["keys"], r["conversion"]) for r in got] == [
        (0, None), (0, None)]
