"""Stream-stream watermarked interval join.

The last Structured Streaming capability class the streaming recast
needs (alongside windowed aggregation, stateful dedup/anomaly/CDC):
joining two LIVE event streams — the click-to-impression attribution /
request-to-error correlation shape — where a right-stream event matches
a left-stream event on a key within a bounded time interval after it.

Spark executes this as a symmetric stateful hash join: each side
buffers rows in the state store until the OTHER side's watermark passes
the point where a match could still arrive.  The time-range condition
plus both watermarks is what makes state BOUNDED — without the interval
bound the join would buffer both streams forever (Spark refuses to plan
an unbounded stream-stream inner join without one).

State size ~ (events per watermark window) per side, shuffled on the
join key exactly like the batch equi-join — the 100 TB-day shape is the
same key-partitioned exchange a batch job pays, held incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key_col`` where the right event
    lands within ``[left_ts, left_ts + max_delay]`` (closed interval —
    the batch ``interval_overlap_join`` convention).

    Both inputs must already carry distinct column names apart from
    ``key_col`` (rename upstream); the result carries the left columns
    then the right columns minus its key.  ``watermark`` bounds how
    out-of-order each stream may be; matches spanning more than
    ``watermark`` of skew are dropped by contract (late data), exactly
    like the windowed aggregates in this package.

    Returns the transformed stream; the caller attaches sink +
    checkpoint.  Batch equivalence: running the same frames through a
    static inner join with the identical condition yields the same
    rows (pinned by the streaming test) whenever no data is late past
    the watermark.
    """
    overlap = set(left.columns) & set(right.columns) - {key_col}
    if overlap:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; "
            "rename before joining"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key_col] == rw[key_col])
        & (rw[right_ts] >= lw[left_ts])
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = lw.join(rw, cond, "inner")
    return joined.select(
        lw[key_col].alias(key_col),
        *[lw[c] for c in left.columns if c != key_col],
        *[rw[c] for c in right.columns if c != key_col],
    )
