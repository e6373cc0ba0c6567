"""Stage 3b — map binned rows to datasets and aggregate summaries.

Spark-first recast of the reference's triple-nested mapping loop
(``_map_binned_s3_logs_to_dandisets.py:103-259``) into a handful of
DataFrame statements.  Semantics preserved:

* assets with no binned rows are skipped -> **inner** broadcast join
  (``:169-170``);
* per-asset mapped logs carry ``index`` (row_number from 0 ordered by
  timestamp), ``timestamp, bytes_sent, region`` (``:183-193``);
* version-level summaries count a blob once per version it appears in
  (the per-version asset loop);
* dandiset-level summaries count each blob **once** even when shared by
  several versions — the reference accumulates dandiset rollups in
  dicts keyed by blob_id (``:200,206,212``), so version-duplicated
  blobs collapse; asset totals re-key blob->asset_path with the winning
  path (``:238-240``);
* sort orders: by_day ascending date, by_region / by_asset descending
  bytes (``:268,281,293``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_assets(binned: DataFrame, assets: DataFrame) -> DataFrame:
    """facts x assets inner broadcast join on object_key == blob_key (J1).

    A blob shared by two versions yields one output row per version —
    matching the reference's per-version asset iteration.
    """
    dim = F.broadcast(
        assets.select("blob_key", "dandiset_id", "version_id", "asset_path")
    )
    return binned.join(dim, binned.object_key == dim.blob_key, "inner").drop("blob_key")


def mapped_per_asset(activity: DataFrame) -> DataFrame:
    """Per-asset activity log with a deterministic 0-based row index
    (row_number over timestamp within asset — SURVEY §2.5).

    Skew note (100x scale): the output contract requires a global
    per-asset order, so a hot asset (the reference's 000108-style
    dandiset) funnels its whole history into one window task.  The
    mitigation when a single asset outgrows a task is a two-phase
    rank: range-repartition within the asset by timestamp, number
    rows per range partition, then add per-partition offsets computed
    from partition counts (a tiny driver-side prefix sum over
    #partitions integers — not rows).  Not wired here because the
    per-asset sink write (`write_mapped_tsv`) already consumes the
    window output partition-by-partition and no sf tested comes near
    task-memory limits; the plan documents the escape hatch.
    """
    w = Window.partitionBy("dandiset_id", "version_id", "asset_path").orderBy(
        "timestamp", "ip_address", "bytes_sent"
    )
    return activity.select(
        "dandiset_id",
        "version_id",
        "asset_path",
        (F.row_number().over(w) - 1).alias("index"),
        F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        "bytes_sent",
        "region",
    )


def _day(df: DataFrame) -> DataFrame:
    return df.withColumn("date", F.date_format("timestamp", "yyyy-MM-dd"))


def version_summaries(activity: DataFrame) -> dict[str, DataFrame]:
    """by_day / by_region / by_asset at (dandiset, version) grain."""
    keys = ["dandiset_id", "version_id"]
    a = _day(activity)
    return {
        "by_day": a.groupBy(*keys, "date")
        .agg(F.sum("bytes_sent").alias("bytes_sent"))
        .orderBy(*keys, "date"),
        "by_region": a.groupBy(*keys, "region")
        .agg(F.sum("bytes_sent").alias("bytes_sent"))
        .orderBy(*keys, F.desc("bytes_sent")),
        "by_asset": a.groupBy(*keys, "asset_path")
        .agg(F.sum("bytes_sent").alias("bytes_sent"))
        .orderBy(*keys, F.desc("bytes_sent")),
    }


def dandiset_summaries(binned: DataFrame, assets: DataFrame) -> dict[str, DataFrame]:
    """Dandiset-grain rollups at the **distinct blob** grain.

    The reference's dicts keyed by blob_id (``:114-117,200,206,212``)
    mean a blob in N versions counts once; we reproduce that by deduping
    the asset dim to (dandiset_id, blob_key) with the max asset_path as
    the winning name before joining.
    """
    dim = F.broadcast(
        assets.groupBy("dandiset_id", "blob_key").agg(
            F.max("asset_path").alias("asset_path")
        )
    )
    enriched = binned.join(dim, binned.object_key == dim.blob_key, "inner").drop(
        "blob_key"
    )
    a = _day(enriched)
    return {
        "by_day": a.groupBy("dandiset_id", "date")
        .agg(F.sum("bytes_sent").alias("bytes_sent"))
        .orderBy("dandiset_id", "date"),
        "by_region": a.groupBy("dandiset_id", "region")
        .agg(F.sum("bytes_sent").alias("bytes_sent"))
        .orderBy("dandiset_id", F.desc("bytes_sent")),
        "by_asset": a.groupBy("dandiset_id", "asset_path")
        .agg(F.sum("bytes_sent").alias("bytes_sent"))
        .orderBy("dandiset_id", F.desc("bytes_sent")),
    }
