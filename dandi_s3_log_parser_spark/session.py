"""SparkSession factory tuned for this engine.

Local mode is the test/bench environment; the same builder settings are
what we would ship to a multi-executor cluster (AQE on, Arrow on,
shuffle partitions sized to cores, UTC).  Iceberg is the intended table
format at scale (see ``sources/tables.py``); when the Iceberg runtime
jar is absent (this sandbox) the catalog transparently falls back to
Hive-partitioned Parquet with identical partitioning semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dandi_s3_log_parser_spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
    master: str | None = "auto",
) -> SparkSession:
    """``master='auto'`` (default) runs ``local[$SPARK_GRAFT_CPUS]``;
    ``master=None`` leaves the master unset so ``spark-submit --master``
    / cluster deploy config wins (the --py-files shipping path)."""
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = SparkSession.builder
    if master == "auto":
        builder = builder.master(f"local[{cpus}]")
    elif master:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # work-list discovery (plans.pipeline.discover_days) is a bare
        # min/max over the timestamp column: with aggregate pushdown the
        # scan answers it from parquet footer stats (zero data pages);
        # TIMESTAMP_MICROS (not INT96) is required for usable ts stats
        .config("spark.sql.parquet.aggregatePushDown", "true")
        # InferFiltersFromGenerate adds `size(e)>0 AND isnotnull(e)`
        # above every explode; predicate pushdown then substitutes the
        # generator's WHOLE expression tree (tokenize/shingle chains
        # here) through the projections into the parquet scan's
        # DataFilters, where it is re-evaluated once per consumer on
        # the scan tasks (observed in the sf1.0 decontaminate plan: a
        # 3-line gram-building tree inside the scan Filter, costing
        # ~5 s per branch).  The inferred filters are purely an
        # optimization — explode of an empty/null array already emits
        # nothing — and every generator in this engine explodes a
        # DERIVED array, so the inference only ever duplicates work.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # ReservedCodeCacheSize: every query plan generates fresh
        # wholestage-codegen classes; a long session (the 70-query
        # bench runs ~200 plans) fills HotSpot's default 240 MB code
        # cache, after which the JIT stops compiling and stages run in
        # bytecode interpretation (measured as 10-25x executor-CPU
        # inflation on late-session queries).  1 GiB of reserved
        # (virtual) code cache removes the cliff at any scale.
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.timezone=UTC -XX:ReservedCodeCacheSize=1g",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.timezone=UTC -XX:ReservedCodeCacheSize=1g",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
