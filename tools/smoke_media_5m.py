#!/usr/bin/env python
"""5M-row media near-pairs × keep-best scale smoke (VERDICT r4 #8).

Synthesizes a skewed-duplicate corpus — the failure mode that matters
at 100 TB is ONE hyper-duplicated asset (site logo, silence clip,
intro frame) whose signature bucket goes quadratic — and verifies:

  1. the banded perceptual-hash join (`multimodal.hash_near_pairs`)
     stays bounded with `max_bucket_size` engaged: a planted 200k-copy
     signature would emit C(200k,2) x 4 bands ~= 8e10 join rows
     unguarded; with the cap those 4 buckets drop and the remaining
     candidate volume is the benign collision tail;
  2. the hyperplane-LSH embedding path (`similarity.hyperplane_near_pairs`
     + `embedding_keep_best`) stays bounded the same way: 100k copies
     of one vector collide in EVERY table regardless of n_planes;
  3. recall on the planted NON-pathological clusters is exact (the cap
     only drops hyper-duplicated content, which the exact digest pass
     collapses first), and no single task holds a giant cluster (max
     kept bucket <= cap; keep-best windows bounded by cluster size).

Usage: python tools/smoke_media_5m.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
GIANT = 200_000          # copies of the one hyper-duplicated signature
CLUSTERS = 10_000        # planted 5-member near-dup clusters
CAP = 500


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from whiterrabbit_spark.extensions.multimodal import hash_near_pairs
    from whiterrabbit_spark.extensions.similarity import embedding_keep_best

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .appName("smoke-media-5m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ids = spark.range(N, numPartitions=64)

    # --- 1. banded perceptual-hash near-pairs, skewed signatures ---
    base = F.xxhash64((F.col("id") / 5).cast("long").cast("string"))
    sig = (
        F.when(F.col("id") < GIANT, F.lit(0x1234_5678_9ABC_DEF0))
        .when(
            F.col("id") < GIANT + 5 * CLUSTERS,
            base.bitwiseXOR(F.expr("shiftleft(1L, cast(id % 5 as int))")),
        )
        .otherwise(F.xxhash64(F.col("id").cast("string")))
    )
    sigs = ids.select(F.col("id").alias("media_id"), sig.alias("ahash"))

    # bucket-size histogram: candidate volume executed vs dropped
    width = 16
    band_sizes = (
        sigs.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("ahash"), j * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for j in range(4)
                ])
            ).alias("bk")
        )
        .groupBy("bk.band", "bk.key")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vol = band_sizes.agg(
        F.sum(F.when(F.col("c") <= CAP, F.col("c") * (F.col("c") - 1) / 2))
        .alias("kept_pairs"),
        F.sum(F.when(F.col("c") > CAP, F.col("c") * (F.col("c") - 1) / 2))
        .alias("dropped_pairs"),
        F.sum(F.when(F.col("c") > CAP, 1).otherwise(0)).alias("dropped_buckets"),
        F.max(F.when(F.col("c") <= CAP, F.col("c"))).alias("max_kept_bucket"),
    ).collect()[0]
    print(
        f"hash bands: executed candidate volume {int(vol['kept_pairs']):,}; "
        f"guard dropped {vol['dropped_buckets']} buckets holding "
        f"{int(vol['dropped_pairs']):,} would-be pairs; "
        f"max kept bucket {vol['max_kept_bucket']}"
    )
    assert vol["dropped_buckets"] >= 4  # the giant signature's 4 bands
    assert vol["max_kept_bucket"] <= CAP

    t0 = time.time()
    pairs = hash_near_pairs(
        sigs, "media_id", "ahash", max_hamming=3, n_bands=4,
        max_bucket_size=CAP,
    )
    n_pairs = pairs.count()
    print(f"hash_near_pairs: {n_pairs:,} pairs in {time.time()-t0:.1f}s")
    # planted recall is exact: 10k clusters x C(5,2); random 64-bit
    # collisions at hamming<=3 are ~0
    expect = CLUSTERS * 10
    assert abs(n_pairs - expect) <= expect * 0.001, (n_pairs, expect)

    # --- 2. hyperplane-LSH embeddings + keep-best, skewed vectors ---
    DIM, GIANT_V, PAIRS_V = 8, 100_000, 100_000
    pair_base = (F.col("id") / 2).cast("long") * 2
    scale = 1.0 + 0.001 * (F.col("id") % 2).cast("double")
    vec = F.when(
        F.col("id") < GIANT_V,
        F.array(*[F.lit(float(j + 1)) for j in range(DIM)]),
    ).otherwise(
        F.array(*[
            F.sin(
                F.when(F.col("id") < GIANT_V + PAIRS_V, pair_base)
                .otherwise(F.col("id"))
                .cast("double") * (1.3 + 0.7 * j) + j
            ) * scale
            for j in range(DIM)
        ])
    )
    embs = ids.select(F.col("id").alias("vec_id"), vec.alias("embedding"))

    t0 = time.time()
    kept = embedding_keep_best(
        embs, threshold=0.9995, dim=DIM, n_planes=20, n_tables=4,
        max_bucket_size=1000,
    )
    agg = kept.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum((~F.col("cluster_id").isNull()).cast("long")).alias("clustered"),
    ).collect()[0]
    cl_max = (
        kept.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id").count().agg(F.max("count")).collect()[0][0]
    )
    print(
        f"embedding_keep_best: {agg['n']:,} rows, {agg['clustered']:,} "
        f"clustered, {agg['n_kept']:,} kept, max cluster {cl_max}, "
        f"{time.time()-t0:.1f}s"
    )
    # 50k planted scaled pairs cluster (cos=1 exactly); the 100k-copy
    # giant leaves candidate generation via the cap (exact-dup digest
    # territory); random sin-vectors at cos>=0.9995 are the small tail
    assert agg["clustered"] >= 2 * (PAIRS_V // 2) * 0.999
    assert cl_max is not None and cl_max < 5_000
    spark.stop()


if __name__ == "__main__":
    main()
