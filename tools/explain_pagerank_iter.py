#!/usr/bin/env python
"""Dump the pagerank per-iteration update plan, before/after the
broadcast-state gate (commit "pagerank: broadcast iteration state
below a node-count gate").

pagerank's RETURNED frame is top-k materialized rows (ExistingRDD), so
``tools/explain_dump.py`` cannot show the change. This tool builds the
iteration-1 update through the real code path (:func:`_pagerank_step`,
the exact function the loop calls) over the same sf edge induction the
registry uses, and explains it with the gate off (before-equivalent:
Catalyst picks a sort-merge join of the 2|E| edge table) and on
(after: broadcast hint on the |nodes|-row rank state).

    python tools/explain_pagerank_iter.py --out plans/r08
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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from whiterrabbit_spark.extensions import graph
    from whiterrabbit_spark.queries import _copurchase_edges  # registry's edge induction
    from whiterrabbit_spark.session import get_spark

    spark = get_spark(app_name="explain-pagerank-iter", cpus=8)
    edges = _copurchase_edges(spark, args.sf)
    both = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).coalesce(spark.sparkContext.defaultParallelism).persist()
    out_deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = out_deg.select(F.col("src").alias("node"), "__deg").persist()
    n_nodes = nodes.count()
    ranks0 = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"), "__deg")

    for suffix, bcast in (
        ("before", lambda df: df),          # gate off: r7 behaviour, planner decides
        ("after", F.broadcast),             # gate on (n_nodes <= broadcast_nodes_max)
    ):
        step = graph._pagerank_step(both, nodes, ranks0, n_nodes, 0.85, bcast)
        plan = step._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"pagerank_iteration_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    nodes.unpersist()
    both.unpersist()


if __name__ == "__main__":
    main()
