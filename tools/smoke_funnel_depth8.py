#!/usr/bin/env python
"""Depth-8 funnel smoke at 50M events (VERDICT r5 #7 done-criterion).

The lambda-hoist fix materializes each funnel step's completion time as
its own projected alias; if CollapseProject ever re-inlined the chain,
step i's filter would re-evaluate the whole step-(i-1) expression per
array element — O(n^steps) per user, infeasible past depth ~4. This
smoke proves the runtime bound is O(steps × events) at the scale that
matters: 50M events (200k users × 250 events each, all 8 step types
interleaved), funnel depths 3 and 8, same data.

Pass criterion: t(depth 8) < 4 × t(depth 3). Linear-in-depth cost would
predict ~8/3 ≈ 2.7× (the per-step collect_list aggregates and the fold
both scale with depth); exponential re-evaluation would not finish.

The plan-shape counterpart (exactly one array_min per step in the
optimized plan) is pinned in
tests/test_plans.py::test_funnel_depth_stays_linear.

Usage: python tools/smoke_funnel_depth8.py [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
N_USERS = max(N // 250, 1)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from whiterrabbit_spark.extensions.sequences import (
        funnel_completion_times,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .appName("smoke-funnel-depth8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 250 events per user; type cycles through s0..s7 with jittered,
    # increasing timestamps so every user completes the full funnel
    events = (
        spark.range(N)
        .select(
            (F.col("id") % N_USERS).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + (F.col("id") / N_USERS).cast("long") * 60
                + (F.col("id") % 13)
            ).alias("ts"),
            F.concat(
                F.lit("s"),
                ((F.col("id") / N_USERS).cast("long") % 8).cast("string"),
            ).alias("event_type"),
        )
        .localCheckpoint()
    )
    n = events.count()

    # warm-up: a depth-2 funnel pays the Python-worker/JIT/shuffle
    # first-touch once so the timed depths compare steady-state
    funnel_completion_times(events, ["s0", "s1"]).agg(
        F.sum("steps_completed")
    ).collect()

    out = {"n_events": n, "n_users": N_USERS}
    for depth in (3, 8):
        steps = [f"s{i}" for i in range(depth)]
        t0 = time.time()
        done = (
            funnel_completion_times(events, steps)
            .agg(F.sum("steps_completed").alias("s"))
            .collect()[0]["s"]
        )
        out[f"t_depth{depth}_s"] = round(time.time() - t0, 1)
        out[f"sum_steps_depth{depth}"] = done
    out["ratio_8_vs_3"] = round(out["t_depth8_s"] / out["t_depth3_s"], 2)
    out["pass"] = out["ratio_8_vs_3"] < 4.0
    print(json.dumps(out))
    spark.stop()
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
