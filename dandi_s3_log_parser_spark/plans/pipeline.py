"""End-to-end parse -> enrich -> route -> aggregate pipeline.

The reference's three CLI entry points (reduce / bin / map,
``_command_line_interface.py:15-175``) become three stage functions over
catalog tables, each checkpointed through the lineage table at
day-partition grain and resumable mid-pipeline.

Physical plan intent per stage (verify with ``.explain("formatted")``):

* reduce: parquet scan with day partition pruning -> codegen'd
  projections/filters -> one ArrowEvalPython (the status/bytes UDF) ->
  dynamic-overwrite day-partitioned write.  No shuffle at all.
* bin: day-pruned scan of reduced -> one salted repartition (the only
  shuffle, skew-spread) -> partitioned write by (key_parent, key_shard,
  day).
* map: binned scan -> broadcast joins (assets dim, distinct-IP region
  map) -> partial+final hash aggregations for the summaries.  The fact
  table never shuffles for joins; only the final groupBys exchange
  pre-aggregated partials.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import (
    DEFAULT_KEY_PARENTS,
    DEFAULT_OPERATION_TYPE,
    OK_STATUSES,
    TEST_IP_HASH_SALT,
)
from ..functions.text import with_header_and_text
from ..operators.aggregate import (
    dandiset_summaries,
    join_assets,
    mapped_per_asset,
    version_summaries,
)
from ..operators.enrich import enrich_with_region
from ..operators.reduce import parse_and_filter_log_lines
from ..operators.route import route_binned
from ..sources.tables import Catalog
from .lineage import LineageLog


@dataclass
class PipelineConfig:
    operation_type: str = DEFAULT_OPERATION_TYPE
    key_parents: tuple[str, ...] = DEFAULT_KEY_PARENTS
    truncate_zarr: bool = True
    ip_hash_salt: str = TEST_IP_HASH_SALT
    salt_buckets: int = 8
    day_col: str = "day"
    extra: dict = field(default_factory=dict)


def _day_counts(df: DataFrame, day_col: str) -> dict[str, int]:
    rows = df.groupBy(day_col).count().collect()
    return {str(r[day_col]): r["count"] for r in rows}


def read_reduced(catalog: Catalog) -> DataFrame:
    """Kept reduced rows (partition-pruned on rclass='ok')."""
    return catalog.read("reduced").filter(F.col("rclass") == "ok").drop("rclass")


def read_reduce_errors(catalog: Catalog) -> DataFrame:
    """Error side-channel rows from the reduce stage."""
    return (
        catalog.read("reduced")
        .filter(F.col("rclass") == "error")
        .select(
            F.lit("reduce").alias("stage"),
            F.col("parse_status").alias("error_type"),
            F.col("url").alias("message"),
        )
    )


def run_reduce_stage(
    spark: SparkSession,
    catalog: Catalog,
    pages: DataFrame,
    cfg: PipelineConfig,
    lineage: LineageLog,
    run_id: str,
    *,
    excluded_ips: DataFrame | None = None,
    resume: bool = True,
) -> list[str]:
    """Pages -> ``reduced`` (day-partitioned) + ``errors`` side-output.

    Returns the list of day partitions processed this run.
    """
    day = cfg.day_col
    pages = pages.withColumn(day, F.date_format("warc_ts", "yyyy-MM-dd"))
    all_days = [r[day] for r in pages.select(day).distinct().collect()]
    days = lineage.pending("reduce", all_days) if resume else sorted(all_days)
    if not days:
        return []
    batch = pages.filter(F.col(day).isin(days))

    with_header = with_header_and_text(batch)
    parsed = parse_and_filter_log_lines(
        with_header,
        "header",
        operation_type=cfg.operation_type,
        excluded_ips=excluded_ips,
        key_parents=cfg.key_parents,
        truncate_zarr=cfg.truncate_zarr,
        passthrough=("url", day),
    )
    # ONE scan, ONE write: ok rows and error rows land in the same
    # day-partitioned table under an `rclass` partition column (writing
    # kept and errors as two separate actions would re-run the whole
    # parse — 2x the scan at 100 TB).  Downstream reads partition-prune
    # on rclass='ok'; the error side-channel is the rclass='error' slice
    # (replaces the reference's per-process error files,
    # _error_collection.py:7-40).  Well-formed-but-rejected rows
    # (drop_*) are filtered out entirely, matching the bad-lines golden
    # semantics.
    out = (
        parsed.filter(
            F.col("parse_status").isin(*OK_STATUSES)
            | F.col("parse_status").startswith("error_")
        )
        .withColumn(
            "rclass",
            F.when(F.col("parse_status").startswith("error_"), "error").otherwise("ok"),
        )
        .select(
            "timestamp",
            "ip_address",
            "object_key",
            "bytes_sent",
            "url",
            "parse_status",
            day,
            "rclass",
        )
    )
    catalog.write(out, "reduced", partition_by=(day, "rclass"), mode="overwrite")

    rows_in = _day_counts(batch, day)
    rows_out = _day_counts(read_reduced(catalog).filter(F.col(day).isin(days)), day)
    lineage.record(
        run_id,
        "reduce",
        [(d, rows_in.get(d, 0), rows_out.get(d, 0)) for d in days],
    )
    return days


def run_bin_stage(
    spark: SparkSession,
    catalog: Catalog,
    cfg: PipelineConfig,
    lineage: LineageLog,
    run_id: str,
    *,
    resume: bool = True,
) -> list[str]:
    """``reduced`` -> ``binned`` partitioned by (key_parent, key_shard, day).

    Day partitions committed by reduce but not yet binned are processed;
    the dynamic day overwrite makes re-runs idempotent (replaces the
    reference's started/completed two-phase files).
    """
    day = cfg.day_col
    reduce_done = sorted(lineage.committed_partitions("reduce"))
    days = lineage.pending("bin", reduce_done) if resume else reduce_done
    if not days:
        return []
    reduced = read_reduced(catalog).filter(F.col(day).isin(days))
    binned = route_binned(reduced, salt_buckets=cfg.salt_buckets)
    binned = binned.withColumn(day, F.date_format("timestamp", "yyyy-MM-dd"))
    catalog.write(
        binned, "binned", partition_by=("key_parent", "key_shard", day), mode="overwrite"
    )
    rows = _day_counts(catalog.read("binned").filter(F.col(day).isin(days)), day)
    lineage.record(run_id, "bin", [(d, rows.get(d, 0), rows.get(d, 0)) for d in days])
    return days


def run_map_stage(
    spark: SparkSession,
    catalog: Catalog,
    cfg: PipelineConfig,
    lineage: LineageLog,
    run_id: str,
    *,
    assets: DataFrame,
    ip_region_cache: DataFrame,
    cidr_ranges: DataFrame,
    geo_fallback: DataFrame,
) -> None:
    """``binned`` x dims -> per-asset mapped logs + version/dandiset summaries.

    Aggregates are full recomputes over the binned table (they must
    reflect every committed day); the heavy lifting is partial+final
    hash aggregation, all joins broadcast.
    """
    binned = catalog.read("binned")
    enriched = enrich_with_region(
        binned, ip_region_cache, cidr_ranges, geo_fallback, salt=cfg.ip_hash_salt
    )
    activity = join_assets(enriched, assets)

    mapped = mapped_per_asset(activity)
    catalog.write(
        mapped, "mapped_per_asset", partition_by=("dandiset_id", "version_id")
    )

    for name, df in version_summaries(activity).items():
        catalog.write(df, f"version_summary_{name}")
    for name, df in dandiset_summaries(enriched, assets).items():
        catalog.write(df, f"dandiset_summary_{name}")

    n = catalog.read("mapped_per_asset").count()
    lineage.record(run_id, "map", [("ALL", None, n)])


def run_pipeline(
    spark: SparkSession,
    catalog: Catalog,
    pages: DataFrame,
    dims: dict[str, DataFrame],
    cfg: PipelineConfig | None = None,
    run_id: str = "run-0",
    *,
    resume: bool = True,
) -> LineageLog:
    cfg = cfg or PipelineConfig()
    lineage = LineageLog(catalog)
    run_reduce_stage(
        spark,
        catalog,
        pages,
        cfg,
        lineage,
        run_id,
        excluded_ips=dims.get("excluded_ips"),
        resume=resume,
    )
    run_bin_stage(spark, catalog, cfg, lineage, run_id, resume=resume)
    run_map_stage(
        spark,
        catalog,
        cfg,
        lineage,
        run_id,
        assets=dims["assets"],
        ip_region_cache=dims["ip_region_cache"],
        cidr_ranges=dims["cidr_ranges"],
        geo_fallback=dims["geo_fallback"],
    )
    return lineage
