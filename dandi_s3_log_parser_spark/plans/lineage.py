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

Execution model: lineage is partition-grain **metadata** — thousands of
rows even at 10^12 fact rows — so commits and lookups run on the
driver via pyarrow (microseconds), never as Spark jobs.  This mirrors
how table formats handle their own bookkeeping (an Iceberg commit is a
driver-side manifest write, not a cluster job).  The on-disk format is
plain parquet in the catalog directory, so ``read()`` still exposes the
log as a Spark DataFrame for metrics queries, and a real deployment
swaps the directory for an Iceberg table with no schema change.
"""

from __future__ import annotations

import datetime
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
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

_ARROW_SCHEMA = pa.schema(
    [
        pa.field("run_id", pa.string(), nullable=False),
        pa.field("stage", pa.string(), nullable=False),
        pa.field("input_partition", pa.string(), nullable=False),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("status", pa.string(), nullable=False),
        pa.field("committed_at", pa.string(), nullable=False),
    ]
)


class LineageLog:
    def __init__(self, catalog: Catalog, table: str = "lineage") -> None:
        self.catalog = catalog
        self.table = table

    # -- driver-side storage ---------------------------------------------------

    def _dir(self) -> Path:
        return Path(self.catalog.path(self.table))

    def _files(self) -> list[Path]:
        d = self._dir()
        return sorted(d.glob("*.parquet")) if d.exists() else []

    def _read_arrow(self) -> pa.Table:
        files = self._files()
        if not files:
            return _ARROW_SCHEMA.empty_table()
        return pa.concat_tables([pq.read_table(f) for f in files])

    def read(self) -> DataFrame:
        """The lineage log as a Spark DataFrame (metrics / audit surface)."""
        if not self._files():
            return self.catalog.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.catalog.spark.read.parquet(str(self._dir()))

    def committed_partitions(self, stage: str) -> set[str]:
        t = self._read_arrow()
        out = set()
        for s, status, part in zip(
            t["stage"].to_pylist(), t["status"].to_pylist(),
            t["input_partition"].to_pylist(),
        ):
            if s == stage and status == "committed":
                out.add(part)
        return out

    def stage_rows_out(self, stage: str) -> dict[str, int]:
        """Latest committed rows_out per partition for ``stage`` (the
        lineage table is partition-grain tiny; downstream stages reuse
        these counts instead of re-scanning the data they just wrote)."""
        t = self._read_arrow()
        rows = sorted(
            (
                r
                for r in t.to_pylist()
                if r["stage"] == stage and r["status"] == "committed"
            ),
            key=lambda r: r["committed_at"],
            reverse=True,
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
        """Append one commit file (write-then-publish: the parquet file
        appears atomically under its final name only when complete).

        The in-progress temp name starts with '.' so Spark's file index
        ignores it: a crash between write and rename must not leave a
        partial file that ``read()``/``metrics()`` (spark.read.parquet
        over the directory) would choke on.  Stale hidden temp files
        from crashed writers are GC'd opportunistically here.
        """
        now = datetime.datetime.now(datetime.timezone.utc).isoformat()
        table = pa.Table.from_pylist(
            [
                {
                    "run_id": run_id,
                    "stage": stage,
                    "input_partition": part,
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "status": status,
                    "committed_at": now,
                }
                for part, rows_in, rows_out in entries
            ],
            schema=_ARROW_SCHEMA,
        )
        d = self._dir()
        d.mkdir(parents=True, exist_ok=True)
        import time

        for stale in d.glob(".commit-*.inprogress"):
            try:
                if time.time() - stale.stat().st_mtime > 600:
                    stale.unlink()
            except OSError:
                pass
        final = d / f"commit-{uuid.uuid4().hex}.parquet"
        tmp = d / f".{final.stem}.inprogress"
        pq.write_table(table, tmp)
        tmp.rename(final)

    def metrics(self) -> DataFrame:
        return self.read().orderBy("committed_at")
