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
) -> DataFrame:
    """Assign each event a per-key session ordinal (0-based).

    Adds ``session_id``; keeps all input columns.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull()
        | (
            F.col(ts_col)
            > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
        )
    ).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
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
