#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink, optionally dumps `.explain("formatted")`
to plans/r06/.  NOT the driver-facing bench — that is bench.py, frozen.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--explain TAG] q1 q2 ...

  --explain before   -> writes plans/r06/<query>_before.txt
  --explain after    -> writes plans/r06/<query>_after.txt
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REPO = Path(__file__).resolve().parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--explain", default=None, choices=["before", "after"])
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import os

    from dandi_s3_log_parser_spark.session import get_spark

    import __spark_entry__ as entrymod

    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("WARN")
    registry = entrymod.queries()

    out = {}
    for name in args.queries:
        fn = registry[name]
        if args.explain:
            plans_dir = REPO / "plans" / "r06"
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}_{args.explain}.txt").write_text(txt)
        ts = []
        for t in range(args.trials):
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            import gc

            gc.collect()
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(ts), "trials": ts}
        print(json.dumps({name: out[name]}), flush=True)

    print("TOTAL " + json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
