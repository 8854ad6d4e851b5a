#!/usr/bin/env python
"""Dump the IN-BUCKET hyperplane_near_pairs plan (the >broadcast-scale
path) at sf0.001 by forcing the bytes gate to 0 — plan SHAPE is
scale-independent, so this is the committed evidence for changes to the
scale path that the sf0.001 registry entry (fetch-join form) cannot
show.

    python tools/explain_lsh_inbucket.py --out plans/r08 --suffix after
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from whiterrabbit_spark.extensions import similarity as sim
    from whiterrabbit_spark.io import read_parquet_table
    from whiterrabbit_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name=f"explain-inbucket-{args.suffix}", cpus=args.cpus)
    sim.LSH_FETCH_JOIN_MAX_BYTES = 0  # force the in-bucket (scale) path
    df = read_parquet_table(spark, args.sf, "embeddings")
    out = sim.hyperplane_near_pairs(
        df, 0.9, dim=64, n_tables=8, seed=42, max_bucket_size=4000,
        auto_bucket_target=64,
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    path = os.path.join(
        args.out, f"hyperplane_inbucket_{args.suffix}.txt"
    )
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
