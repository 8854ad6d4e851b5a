#!/usr/bin/env python
"""50M-row layout-advisor smoke (VERDICT r4 #1 done-criterion).

Settles the "persist is slower" dispute at the scale that matters:
generates a 50M-row two-column fact table as parquet, then runs
``layout_prune_report`` (3 layouts incl. a z-order key, the registry
query's shape) twice —

  lazy        materialize=False  (r3/r4 form: trust ReusedExchange)
  checkpoint  materialize=True   (r5 form: one melt scan, localCheckpoint)

— and reports wall time plus the number of parquet scan nodes in the
final plan. At sf0.1 the lazy form hides its re-scans (tiny table, OS
page cache); at 50M rows the re-reads are real I/O and the checkpointed
form should win outright, which is the 100 TB-shaped answer.

Usage: python tools/smoke_layout_50m.py [n_rows]
Writes nothing outside the repo (data under .smoke/, removed after).
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
DATA = os.path.join(REPO, ".smoke", "fact_layout")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from whiterrabbit_spark.profile import layout_prune_report, zorder_key_expr

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .appName("smoke-layout-50m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(DATA):
        # deterministic pseudo-random columns: q quantity-like (50
        # distinct), p price-like (1M distinct) — the registry shape
        (
            spark.range(N, numPartitions=64)
            .select(
                ((F.col("id") * 2654435761) % 50 + 1)
                .cast("double")
                .alias("q"),
                (((F.col("id") * 40503 + 17) % 1000000) / 10.0).alias("p"),
            )
            .write.mode("overwrite")
            .parquet(DATA)
        )

    fact = spark.read.parquet(DATA)
    layouts = {
        "by_q": "q",
        "by_p": "p",
        "by_z": zorder_key_expr(["q", "p"], [1.0, 0.0], [50.0, 100000.0], 8),
    }

    results = {}
    for mode, mat in (("lazy", False), ("checkpoint", True)):
        spark.catalog.clearCache()
        t0 = time.time()
        out = layout_prune_report(
            fact, "q", layouts, chunk_rows=131072,
            probe_lo=10.0, probe_hi=15.0, materialize=mat,
        )
        rows = out.collect()
        wall = time.time() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_scans = len(re.findall(r"Scan parquet|BatchScan", plan))
        results[mode] = (wall, n_scans, sorted(map(tuple, rows)))
        print(
            f"{mode:10s}  wall={wall:7.1f}s  parquet_scan_nodes={n_scans}"
        )

    assert results["lazy"][2] == results["checkpoint"][2], "result drift!"
    print(
        f"speedup checkpoint vs lazy: "
        f"{results['lazy'][0] / results['checkpoint'][0]:.2f}x"
    )
    shutil.rmtree(os.path.join(REPO, ".smoke"), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
