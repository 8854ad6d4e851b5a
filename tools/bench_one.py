#!/usr/bin/env python
"""Time individual REGISTRY queries with bench.py's exact methodology
(local[$SPARK_GRAFT_CPUS], warmup, clearCache before every timed trial,
keep-min over N trials) — for isolating one query while optimizing,
without paying the full 200-query workload.

Usage:  python tools/bench_one.py registry_name [...] [--runs 3]
        [--sf /root/testdata/sf0.1] [--noop]

--noop times `df.write.format("noop")` instead of `df.count()` (guide
§1.4) to take the sink/collect out of the measurement; bench.py itself
times count() and that contract is unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from whiterrabbit_spark.io import read_parquet_table
    from whiterrabbit_spark.queries import build_registry
    from whiterrabbit_spark.session import get_spark

    spark = get_spark(app_name="wrs-bench-one", cpus=args.cpus)
    queries, _ = build_registry()

    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").count()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        read_parquet_table(spark, args.sf, t).limit(1).collect()

    for name in args.names:
        fn = queries[name]
        trials = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.noop and hasattr(df, "write"):
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count() if hasattr(df, "count") else len(df)
                assert n >= 0
            trials.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(trials)} trials={trials}", flush=True)


if __name__ == "__main__":
    main()
