"""Custom stateful streaming operator: incremental first-seen dedup.

Completes the SURVEY §2.8 recast's last capability class — arbitrary
per-key streaming state via ``applyInPandasWithState`` (watermarked
windows and session windows are built-ins; this is the pattern for
state Spark has no operator for).  The semantics are the streaming twin
of ``operators.dedup.exact_dedup``: the FIRST row per (key, dedup
value) across the whole stream survives; every later repeat is dropped,
no matter how many microbatches or restarts separate them.

Scale design:

* state is one 64-bit digest set per group key, held in the streaming
  state store (RocksDB-backed on a real cluster) and shuffled on
  ``key_col`` — the same exchange key a batch ``groupBy`` dedup pays;
* digests come from ``pd.util.hash_pandas_object`` (vectorized, fixed
  hash key, deterministic across executors and restarts); a 64-bit
  collision silently drops a non-duplicate (~2^-32 at 10^9 rows/key —
  the same trade ``exact_dedup`` documents for sha2-256, weaker here
  because the state must stay small);
* ``max_state_per_key`` bounds any one key's state; past the cap the
  operator FAILS OPEN (rows pass through undeduped) — at 100 TB an
  unbounded hot key would otherwise grow one state row without limit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, LongType, StructField, StructType


def stream_first_seen(
    events: DataFrame,
    *,
    key_col: str = "ip_address",
    dedup_col: str = "object_key",
    max_state_per_key: int = 1_000_000,
) -> DataFrame:
    """First-seen filter on a streaming DataFrame (see module doc).

    Returns the transformed stream; the caller attaches the sink and
    checkpoint.  Exactly-once with a checkpoint: replayed microbatches
    re-derive the same state.
    """
    out_schema = events.schema
    cols = [f.name for f in events.schema.fields]
    state_schema = StructType([StructField("seen", ArrayType(LongType()))])

    def fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            digests = pd.util.hash_pandas_object(
                pdf[dedup_col], index=False
            ).astype("int64")
            # fully vectorized (no per-row Python — at a hot key near
            # the cap this kernel sees millions of rows per batch):
            # a row is fresh iff it is the first in-batch occurrence
            # AND not in cross-batch state; rows processed once the
            # state is full FAIL OPEN (pass through, never added).
            # over_cap is monotone in row order, so counting additions
            # with the no-cap `fresh` prefix-sum is exact: any row the
            # count misjudges is already past the cap boundary itself.
            fresh = ~digests.duplicated() & ~digests.isin(seen)
            additions_before = fresh.cumsum() - fresh.astype("int64")
            over_cap = (len(seen) + additions_before) >= max_state_per_key
            kept = pdf[(fresh | over_cap).to_numpy()]
            seen.update(digests[(fresh & ~over_cap).to_numpy()].tolist())
            if len(kept):
                yield kept[cols]
        state.update((list(seen),))

    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
