"""Gap-based sessionization: group a key's event stream into sessions
separated by idle gaps.

The classic log-analytics operator over the reference's request stream
(the reference's per-asset activity logs are exactly per-key ordered
event sequences — ``_map_binned_s3_logs_to_dandisets.py`` materializes
them; sessionization is the aggregation a traffic analyst runs on them
next).  Also the batch twin of Structured Streaming's session windows:
the same (key, session) grouping computed incrementally by
``F.session_window`` shows up in ``streaming/stream_aggregate.py``.

Formulation (pure window functions, no Python, no self-join):

1. ``lag(ts) over (partition by key order by ts)``;
2. new-session flag = gap > threshold (interval comparison — exact
   microsecond arithmetic, identical across engines);
3. session ordinal = running sum of flags;
4. one hash aggregate keyed (key, session ordinal).

Scale: the window shuffle partitions by key — the same partitioning the
per-key sinks already need, so on the real pipeline this reuses the
route exchange.  Skewed hot keys funnel one task each; the two-phase
time-bucketed rank implemented in ``aggregate.mapped_per_asset``
applies unchanged (session flags only need lag(1), which the bucket
boundary provides via the previous bucket's max ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    skew_bucket: str | None = "day",
) -> DataFrame:
    """Assign each event a per-key session ordinal (0-based).

    Adds ``session_id``; keeps all input columns.

    Skew design (same shape as ``aggregate.mapped_per_asset``): a
    single per-key window funnels a hot key's whole history into one
    task.  With ``skew_bucket`` set, the computation is two-phase over
    ``date_trunc`` buckets:

    1. per (key, bucket): lag within the bucket; the FIRST row of each
       bucket compares against the previous non-empty bucket's max ts,
       carried over on the tiny (key, bucket, max_ts, flag_count)
       side table;
    2. session ordinal = per-bucket running flag count + the running
       sum of prior buckets' flag totals (offsets joined back without
       a broadcast hint — the fact side is already partitioned on the
       join key).

    Buckets partition event-time order by construction, so the result
    is row-identical to the single-window formulation (A/B-tested).
    ``skew_bucket=None`` keeps the one-window path.
    """
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    if skew_bucket is None:
        w = Window.partitionBy(key_col).orderBy(ts_col)
        prev = F.lag(ts_col).over(w)
        new_sess = (prev.isNull() | (F.col(ts_col) > prev + gap)).cast("long")
        return events.withColumn(
            "session_id",
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1,
        )

    bucketed = events.withColumn("_bkt", F.date_trunc(skew_bucket, F.col(ts_col)))
    w_in = Window.partitionBy(key_col, "_bkt").orderBy(ts_col)
    prev_in = F.lag(ts_col).over(w_in)
    # rows after the first in their bucket resolve locally; first rows
    # get a placeholder and resolve against the carried-over prev-bucket
    # max ts below
    flagged = bucketed.withColumn("_prev_in", prev_in)
    # tiny per-(key, bucket) table: last event ts + how many sessions
    # OPEN within the bucket given a fully-local view (first row counts
    # as a new session iff its local prev is null — corrected later)
    per_bkt = (
        bucketed.groupBy(key_col, "_bkt")
        .agg(F.max(ts_col).alias("_last_ts"))
        .withColumn(
            "_prev_last",
            F.lag("_last_ts").over(Window.partitionBy(key_col).orderBy("_bkt")),
        )
        .drop("_last_ts")
    )
    joined = flagged.join(per_bkt, on=[key_col, "_bkt"])
    prev_eff = F.coalesce(F.col("_prev_in"), F.col("_prev_last"))
    new_sess = (prev_eff.isNull() | (F.col(ts_col) > prev_eff + gap)).cast("long")
    with_flag = joined.withColumn("_flag", new_sess)
    # per-bucket running flag sum + cross-bucket offsets (tiny table)
    local_cum = F.sum("_flag").over(
        w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged2 = with_flag.withColumn("_lcum", local_cum)
    offsets = (
        with_flag.groupBy(key_col, "_bkt")
        .agg(F.sum("_flag").alias("_bflags"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bflags").over(
                    Window.partitionBy(key_col)
                    .orderBy("_bkt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_bflags")
    )
    return (
        flagged2.join(offsets, on=[key_col, "_bkt"])
        .withColumn("session_id", F.col("_off") + F.col("_lcum") - 1)
        .select(*events.columns, "session_id")
    )


def session_stats(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per (key, session): event count, span, start/end.

    Timestamps are emitted as microsecond ISO strings so downstream
    sinks (and cross-engine oracles) are byte-stable.
    """
    s = sessionize(
        events, key_col=key_col, ts_col=ts_col, gap_minutes=gap_minutes
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format(F.max(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
    ]
    return s.groupBy(key_col, "session_id").agg(*aggs)
