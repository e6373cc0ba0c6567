#!/usr/bin/env python
"""Headline benchmark: prints ONE JSON line.

Measures (a) the end-to-end parse -> enrich -> route -> aggregate
pipeline on a deterministic synthetic pages table (the BASELINE.json
north-star metric, reported as docs/sec), and (b) per-query seconds for
the headline operator queries on $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  BENCH_PAGES          synthetic pages row count (default 200000)

Scaling evidence (N vs 4N parallelism) lives in bench_scaling.py and
BENCH.md; this script is the driver-facing single-line benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent
WORK = REPO / "_work"


def _ensure_bench_pages(spark, n_pages: int, seed: int = 42):
    """Generate-once cache of the synthetic pages table (parquet).

    Pages come from the distributed chunk-seeded generator (parallel,
    deterministic in (n_pages, seed)); the dimension tables depend only
    on the seed and come from the driver-side oracle generator."""
    from dandi_s3_log_parser_spark.datagen import generate, generate_pages_spark, to_spark

    # v2: chunk-seeded distributed generator + TIMESTAMP_MICROS parquet
    # (footer-stat day discovery) — versioned key so stale v1 caches
    # (driver-side generator, INT96 timestamps) are never served
    path = WORK / f"bench_pages_v2_n{n_pages}_s{seed}"
    dims_path = WORK / f"bench_dims_v2_n{n_pages}_s{seed}"
    if not (path / "_SUCCESS").exists():
        pages = generate_pages_spark(spark, n_pages, seed)
        _, dims = to_spark(spark, generate(0, seed))
        pages.write.mode("overwrite").parquet(str(path))
        for name, df in dims.items():
            df.write.mode("overwrite").parquet(str(dims_path / name))
    dims = {
        name: spark.read.parquet(str(dims_path / name))
        for name in ("assets", "cidr_ranges", "ip_region_cache", "geo_fallback", "excluded_ips")
    }
    return spark.read.parquet(str(path)), dims


def bench_pipeline(spark, n_pages: int) -> tuple[float, float, float]:
    """(cold_sec, steady_sec, steady_docs_per_sec): the first pass pays
    JIT/codegen/Python-worker startup; the second is the steady-state
    regime a long-lived cluster runs in."""
    import shutil

    from dandi_s3_log_parser_spark.plans.pipeline import PipelineConfig, run_pipeline
    from dandi_s3_log_parser_spark.sources.tables import Catalog

    pages, dims = _ensure_bench_pages(spark, n_pages)
    secs = []
    for run in ("cold", "steady"):
        wh = WORK / "bench_warehouse"
        shutil.rmtree(wh, ignore_errors=True)
        catalog = Catalog(spark, wh)
        t0 = time.perf_counter()
        run_pipeline(
            spark, catalog, pages, dims, PipelineConfig(), f"bench-{run}", resume=False
        )
        secs.append(time.perf_counter() - t0)
    return secs[0], secs[1], n_pages / secs[1]


HEADLINE_QUERIES = (
    "reduce_filter_project",
    "regex_extract",
    "by_day_agg",
    "by_region_agg",
    "range_join",
    "window_rownumber",
    "sort_limit_topk",
    "rollup_agg",
    "dedup_exact",
    "token_count",
    "lang_id",
    "minhash_lsh_dedup",
    "cosine_topk",
    "lsh_ann_topk",
    "embedding_lsh_near_dup",
    "hourly_window",
    "sessionize",
    "repetition_metrics",
    "pack_sequences",
    "dedup_clusters",
    "decontaminate",
    "pii_redact",
    "corpus_line_dedup",
    "upsample_corpus",
    "vocab_topk",
    "curation_funnel",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))

    from dandi_s3_log_parser_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    queries: dict[str, float] = {}
    cold_sec, steady_sec, docs_per_sec = bench_pipeline(spark, n_pages)
    queries["pipeline_e2e"] = round(cold_sec, 3)
    queries["pipeline_e2e_steady"] = round(steady_sec, 3)

    registry = entrymod.queries()
    for name in HEADLINE_QUERIES:
        fn = registry[name]
        # time construction + execution: iterative operators (e.g.
        # dedup_clusters' label-propagation loop) do their real work at
        # construction, so timing only the final action would underreport
        # them; for pure-lazy plans construction adds only milliseconds
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": f"e2e parse->enrich->route->aggregate on {n_pages} synthetic docs + headline operator queries",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "docs_per_sec": round(docs_per_sec, 1),
                "pipeline_docs": n_pages,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
