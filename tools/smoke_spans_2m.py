#!/usr/bin/env python
"""2M-document exact-substring-family scale smoke (round 5; scrub pass
added in round 6 — VERDICT r5 #4 done-criterion).

The span table is O(total tokens) rows (one hashed k-gram per token
position); at 2M docs x ~55 tokens that is ~90M span rows through one
groupBy(span_hash) with a countDistinct expand - the family's only
shuffle. Verifies wall-time stays linear-ish, planted cross-doc spans
are found exactly, the coverage rollup's per-doc windows stay bounded
(partitioned by doc, max window = doc length), and the SCRUB pass
removes the planted passage from exactly PLANTED-1 documents (the
corpus-first occurrence keeps it), with tokens-removed equal to the
passage length times the scrubbed-doc count.

Usage: python tools/smoke_spans_2m.py [n_docs]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
PLANTED = 50_000          # docs that embed the SAME 10-token passage


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from whiterrabbit_spark.extensions.dedup import (
        duplicated_span_coverage,
        duplicated_spans,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .appName("smoke-spans-2m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ~55 unique tokens per doc from the doc id; PLANTED docs embed one
    # shared 10-token passage in the middle
    uniq = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"w{j}x"), F.col("id")) for j in range(55)],
    )
    passage = " ".join(f"shared{j}" for j in range(10))
    text = F.when(
        F.col("id") < PLANTED,
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}x"), F.col("id")) for j in range(20)],
            F.lit(passage),
            *[F.concat(F.lit(f"w{j}x"), F.col("id")) for j in range(20, 45)],
        ),
    ).otherwise(uniq)
    docs = spark.range(N, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        (F.col("id") % 10).cast("string").alias("source"),
    )

    t0 = time.time()
    cat = duplicated_spans(docs, k=10, top_k=20).collect()
    t_cat = time.time() - t0
    # the planted passage alone is shared verbatim by PLANTED docs; the
    # surrounding 9-token flanks differ per doc, so spans fully inside
    # the passage (exactly one at k=10) dominate the catalog
    top = cat[0]
    print(
        f"dup_spans: {len(cat)} rows in {t_cat:.1f}s; top n_docs="
        f"{top['n_docs']:,} occ={top['n_occurrences']:,} "
        f"example={top['example'][:40]!r}"
    )
    assert top["n_docs"] == PLANTED and top["example"] == passage

    t0 = time.time()
    cov = {
        r["group"]: r
        for r in duplicated_span_coverage(docs, k=10).collect()
    }
    t_cov = time.time() - t0
    total_flagged = sum(r["docs_with_dups"] for r in cov.values())
    print(
        f"coverage: {len(cov)} groups in {t_cov:.1f}s; "
        f"docs_with_dups={total_flagged:,}"
    )
    assert total_flagged == PLANTED

    # scrub: keep-first on (doc_id, pos) — doc 0 holds the corpus-first
    # passage occurrence and keeps it; every other planted doc loses
    # exactly the 10 passage tokens (flanks are per-doc unique)
    from whiterrabbit_spark.extensions.dedup import substring_scrub

    t0 = time.time()
    scrub = (
        substring_scrub(docs, k=10)
        .agg(
            F.sum((F.col("n_tokens_removed") > 0).cast("long")).alias(
                "docs_scrubbed"
            ),
            F.sum("n_tokens_removed").alias("tok_removed"),
        )
        .collect()[0]
    )
    t_scrub = time.time() - t0
    print(
        f"scrub: docs_scrubbed={scrub['docs_scrubbed']:,} "
        f"tokens_removed={scrub['tok_removed']:,} in {t_scrub:.1f}s"
    )
    assert scrub["docs_scrubbed"] == PLANTED - 1
    assert scrub["tok_removed"] == (PLANTED - 1) * 10

    # decontamination: one benchmark doc holding the planted passage —
    # its span hashes broadcast, the 2M-doc span table never shuffles
    # for the match; every planted doc flags as contaminated
    from whiterrabbit_spark.extensions.dedup import benchmark_contamination

    bench = spark.createDataFrame(
        [("b0", "x1 x2 x3 " + passage + " x4 x5")],
        "doc_id string, text string",
    )
    t0 = time.time()
    con = benchmark_contamination(docs, bench, k=10).agg(
        F.sum("docs_contaminated").alias("n"),
        F.max("max_overlap_frac").alias("mx"),
    ).collect()[0]
    t_con = time.time() - t0
    print(
        f"contamination: docs_contaminated={con['n']:,} "
        f"max_frac={con['mx']} in {t_con:.1f}s"
    )
    assert con["n"] == PLANTED
    spark.stop()


if __name__ == "__main__":
    main()
