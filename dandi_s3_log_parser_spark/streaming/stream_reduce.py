"""Structured Streaming variant of the reduce stage.

The reference is batch with file-level incrementality (SURVEY §2.8); the
streaming recast gives exactly-once per-microbatch semantics for a
continuously-landing pages table:

* ``readStream`` file source over the pages directory (on a real
  cluster: ``readStream.format("iceberg")`` for snapshot-incremental);
* the SAME extraction/filter operators as batch (one code path —
  ``parse_and_filter_log_lines`` is stream-safe: no global sorts);
* ``foreachBatch`` fan-out: each microbatch appends day-partitioned
  reduced rows and error rows through the same Catalog, and records
  per-batch lineage — checkpointing makes restarts resume from the last
  committed batch (replaces the reference's started/completed files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PAGES_SCHEMA
from ..functions.text import with_header_and_text
from ..operators.reduce import parse_and_filter_log_lines, split_reduced
from ..plans.lineage import LineageLog
from ..plans.pipeline import PipelineConfig
from ..sources.tables import Catalog


def stream_reduce(
    spark: SparkSession,
    pages_dir: str,
    catalog: Catalog,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    *,
    excluded_ips: DataFrame | None = None,
    available_now: bool = True,
):
    """Start the streaming reduce; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the source and
    stops (batch-incremental mode); False runs continuously.
    """
    cfg = cfg or PipelineConfig()
    lineage = LineageLog(catalog, "stream_lineage")

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(pages_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        day = cfg.day_col
        batch = batch_df.withColumn(day, F.date_format("warc_ts", "yyyy-MM-dd"))
        # per-batch lineage counts ride the ONE write action via
        # observe() — a count() on batch/reduced would re-run the whole
        # parse chain once per metric, tripling the per-microbatch work
        obs_in = Observation(f"stream_in_{batch_id}")
        batch = batch.observe(obs_in, F.count(F.lit(1)).alias("n"))
        parsed = parse_and_filter_log_lines(
            with_header_and_text(batch),
            "header",
            operation_type=cfg.operation_type,
            excluded_ips=excluded_ips,
            key_parents=cfg.key_parents,
            truncate_zarr=cfg.truncate_zarr,
            passthrough=("url", day),
        )
        # the observe sits BETWEEN parse and the kept-filter: it counts
        # kept rows AND blocks Catalyst from pushing the filter through
        # the parse projection (which would duplicate the whole parse
        # expression tree — see plans/pipeline.py reduce stage)
        from ..config import OK_STATUSES

        obs_out = Observation(f"stream_out_{batch_id}")
        parsed = parsed.observe(
            obs_out,
            F.count(F.when(F.col("parse_status").isin(*OK_STATUSES), 1)).alias("n"),
        )
        kept, errors = split_reduced(parsed)
        reduced = kept.select(
            "timestamp", "ip_address", "object_key", "bytes_sent", "url", day
        )
        mode = "append" if catalog.exists("reduced_stream") else "overwrite"
        catalog.write(reduced, "reduced_stream", partition_by=(day,), mode=mode)
        lineage.record(
            f"stream-batch-{batch_id}",
            "stream_reduce",
            [(str(batch_id), obs_in.get["n"], obs_out.get["n"])],
        )

    writer = (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process_batch)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
