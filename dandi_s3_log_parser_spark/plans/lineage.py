"""Checkpoint / lineage bookkeeping for resumable runs.

Replaces the reference's resume machinery — the completed-output
anti-join (``_dandi_s3_log_file_reducer.py:73-80``) and the two-phase
``started``/``completed`` tracking files with corruption checks
(``_bin_all_reduced_s3_logs_by_object_key.py:30-54``) — with a single
append-only ``lineage`` table (north rule: per-partition lineage +
row-count metrics).  A partition is the unit of resume; a stage run
processes only partitions with no committed lineage row, and partition
writes are dynamic overwrites, so a crash between write and lineage
commit re-runs that partition idempotently (the same two-phase safety
the reference hand-rolls; Iceberg snapshots make it atomic for real).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import Catalog

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("input_partition", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("committed_at", T.StringType(), False),
    ]
)


class LineageLog:
    def __init__(self, catalog: Catalog, table: str = "lineage") -> None:
        self.catalog = catalog
        self.table = table

    def read(self) -> DataFrame:
        if not self.catalog.exists(self.table):
            return self.catalog.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.catalog.read(self.table)

    def committed_partitions(self, stage: str) -> set[str]:
        rows = (
            self.read()
            .filter((F.col("stage") == stage) & (F.col("status") == "committed"))
            .select("input_partition")
            .distinct()
            .collect()
        )
        return {r["input_partition"] for r in rows}

    def stage_rows_out(self, stage: str) -> dict[str, int]:
        """Latest committed rows_out per partition for ``stage`` (the
        lineage table is partition-grain tiny; downstream stages reuse
        these counts instead of re-scanning the data they just wrote)."""
        rows = (
            self.read()
            .filter((F.col("stage") == stage) & (F.col("status") == "committed"))
            .orderBy(F.desc("committed_at"))
            .collect()
        )
        out: dict[str, int] = {}
        for r in rows:
            out.setdefault(r["input_partition"], r["rows_out"])
        return out

    def pending(self, stage: str, partitions: list[str]) -> list[str]:
        """Driver-side anti-join of the work list against committed
        lineage (reference J5 resume semantics; the partition list is
        day-grain and stays tiny even at 10^12 rows)."""
        done = self.committed_partitions(stage)
        return sorted(p for p in partitions if p not in done)

    def record(
        self,
        run_id: str,
        stage: str,
        entries: list[tuple[str, int | None, int | None]],
        status: str = "committed",
    ) -> None:
        now = datetime.datetime.now(datetime.timezone.utc).isoformat()
        rows = [
            (run_id, stage, part, rows_in, rows_out, status, now)
            for part, rows_in, rows_out in entries
        ]
        df = self.catalog.spark.createDataFrame(rows, LINEAGE_SCHEMA)
        mode = "append" if self.catalog.exists(self.table) else "overwrite"
        self.catalog.write(df, self.table, mode=mode)

    def metrics(self) -> DataFrame:
        return self.read().orderBy("committed_at")
