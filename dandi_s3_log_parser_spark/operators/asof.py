"""As-of (most-recent-at-or-before) join, Spark-first.

Spark has no ASOF JOIN operator (pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` / kdb ``aj`` territory), but its semantics decompose into
existing DataFrame ops with exactly ONE shuffle: union the fact and
dimension rows on the join key, sort each key's timeline once, and
carry the latest dimension values forward with ``last(ignorenulls)``
over a running window.  No Python in the hot path, no per-row UDF, no
range-explosion cross join.

Scale shape (the 100 TB argument):

* One exchange total — both inputs hash-partition on ``key`` and the
  per-partition sort handles the timeline; an equivalent
  window-function-free formulation (theta-join ``l.key = r.key AND
  l.ts >= r.ts`` + max-per-event) would explode to |events| x
  |snapshots per key| intermediate rows before aggregating them away.
* Map-side width: dimension rows travel with NULL fact columns and
  vice versa, so the exchanged row is the width of the OUTPUT row, once.
* Skew: a key's timeline is processed sequentially by one task — the
  right model when keys are plentiful (users, domains, instruments).
  For a pathological single hot key, the bucketed carry-forward
  variant applies (rank within (key, coarse ts bucket), prefix the
  tiny per-bucket "last value" table, broadcast it back — the same
  two-phase trick ``sessionize``/W1 use); not implemented until a
  workload needs it.

Semantics match DuckDB ``ASOF LEFT JOIN`` (the oracle for the
registered query): for each left row, the right row with the greatest
``right_ts <= left_ts`` for the same key; ties on the timestamp match
(inclusive); left rows with no earlier right row keep NULL values;
NULL keys never match (SQL equality semantics), which the window path
must enforce explicitly because ``partitionBy`` groups NULLs together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: attach each ``value_cols`` entry from the
    latest ``right`` row whose ``right_ts <= left_ts`` per ``key``.

    ``right`` must be unique per ``(key, right_ts)`` — with duplicates
    the carried row among equal timestamps is nondeterministic (same
    contract as pandas ``merge_asof``).  ``tolerance_seconds`` NULLs
    the carried values when the match is staler than the bound
    (pandas ``merge_asof(tolerance=...)`` semantics; DuckDB ASOF has
    no tolerance — keep it None for oracle-compared plans).
    """
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")

    left_cols = left.columns
    carried_ts = "_asof_right_ts"
    # one relation, two row kinds: fact rows (tag 1) carry NULL dim
    # values, dim rows (tag 0) carry NULL fact columns.  tag orders a
    # same-timestamp dim row BEFORE the fact row so the inclusive
    # (<=) match works without a second pass.
    lhs = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).alias(c) for c in value_cols],
        F.lit(None).cast("timestamp").alias(carried_ts),
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in value_cols],
        F.col(right_ts).alias(carried_ts),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [carried_ts, *value_cols]
    out = rhs.unionByName(lhs).select(
        *left_cols,
        "_k",
        "_tag",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    stale = F.lit(False)
    if tolerance_seconds is not None:
        stale = (
            F.unix_timestamp(F.col(left_ts))
            - F.unix_timestamp(F.col(carried_ts))
        ) > tolerance_seconds
    no_match = F.col("_k").isNull() | stale
    return out.filter(F.col("_tag") == 1).select(
        *left_cols,
        *[
            F.when(no_match, F.lit(None)).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
    )
