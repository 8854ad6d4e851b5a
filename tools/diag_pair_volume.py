#!/usr/bin/env python
"""Diagnostic (r9 item 1): why does containment_pairs run SLOWER on the
500k-doc MID corpus than the 2M-doc BASE corpus?

Hypothesis A (VERDICT r8): the unmaterialized persisted subtrees hid
their size and a join that broadcasts at base stays sort-merge at mid
(fixed in r9 by eager materialization).
Hypothesis B (this tool): the rare self-join's candidate VOLUME
Σ C(df,2) over shingles with df ≤ max_candidate_df is larger at mid in
ABSOLUTE terms — the fixed df cap (100) sits above the mid corpus's
boilerplate-trigram document frequency and below the base corpus's, so
shrinking the corpus 4× INCREASES the joinable postings.

Prints, per variant: |docs|, |postings|, |rare postings (df≤cap)|,
Σ C(df,2) (exact candidate join rows), and the same for the hot side.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from whiterrabbit_spark.extensions.dedup import _shingle_table  # noqa: E402
from whiterrabbit_spark.io import read_parquet_table  # noqa: E402
from whiterrabbit_spark.session import get_spark  # noqa: E402

CAP = 100


def main() -> None:
    spark = get_spark(app_name="diag-pair-volume")
    spark.sparkContext.setLogLevel("ERROR")
    for variant in sys.argv[1:] or ("mid", "base"):
        d = os.path.join(REPO, ".smoke", "scale_r7", variant)
        docs = read_parquet_table(spark, d, "documents")
        sh = _shingle_table(docs, "text", "doc_id", 3)
        df_counts = sh.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df")
        )
        row = df_counts.agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df").alias("n_postings"),
            F.sum(F.when(F.col("df") <= CAP, F.col("df"))).alias("rare_postings"),
            F.sum(
                F.when(
                    F.col("df") <= CAP,
                    F.col("df") * (F.col("df") - 1) / 2,
                )
            ).alias("rare_join_rows"),
            F.sum(F.when(F.col("df") > CAP, F.col("df"))).alias("hot_postings"),
            F.count(F.when(F.col("df") > CAP, 1)).alias("hot_shingles"),
            F.max("df").alias("max_df"),
        ).collect()[0]
        print(variant, docs.count(), row.asDict())
    spark.stop()


if __name__ == "__main__":
    main()
