"""Benchmark decontamination: flag corpus documents whose word n-grams
overlap a (small) benchmark/eval set.

The standard LLM-training hygiene pass: before training, every document is
checked for n-gram collisions with held-out evaluation benchmarks, and
documents over an overlap threshold are dropped (see e.g. GPT-3 appendix C /
PaLM §6-style 13-gram decontamination; this module is the Spark-first form).

Not in the reference surface (`/root/reference/whiteRRabbit.R` profiles
single tables and has no joins — SURVEY §2 "not present"); this is a
BASELINE.json north-star extension.

Scale shape (100 TB corpus, MB-scale benchmark)
-----------------------------------------------
* The benchmark side is tiny (eval sets are thousands of documents) — its
  distinct-shingle table is **broadcast**; the corpus side never shuffles
  its text.
* Corpus shingles are exploded map-side, hit-tested against the broadcast
  hash table, and re-aggregated per doc_id. The only Exchange is the
  groupBy(doc_id) — and partial aggregation collapses it to ~two longs per
  (doc × map-partition) before the shuffle, so shuffled bytes are O(docs),
  never O(shingles) and never O(text).
* An inner-join-then-count would lose zero-overlap docs; the LEFT join +
  conditional count keeps every corpus doc so the caller can also use the
  result as a keep-list (overlap_frac < threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whiterrabbit_spark.extensions.dedup import shingles_expr


def benchmark_shingles(bench: DataFrame, text_col: str, k: int = 5) -> DataFrame:
    """Distinct word k-gram shingles of the benchmark set (one column,
    ``shingle``). Small enough to broadcast by construction."""
    return (
        bench.select(F.explode(shingles_expr(F.col(text_col), k)).alias("shingle"))
        .distinct()
    )


def contamination_stats(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document overlap of ``corpus`` n-grams with ``bench`` n-grams.

    Returns one row per corpus document:
    ``id_col, n_shingles, n_overlap, overlap_frac`` — every doc is kept
    (zero-overlap docs have n_overlap = 0) so the frame doubles as a
    keep/drop list.

    ``broadcast_bench=False`` is the escape hatch for a benchmark whose
    shingle table outgrows the broadcast threshold (a union of many eval
    suites): the hit-test becomes a shuffle join on the shingle key —
    the corpus side then shuffles its (id, shingle) pairs once, which is
    still O(shingles) small rows, never the text.
    """
    bsh = benchmark_shingles(bench, text_col, k)
    sh = corpus.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col(text_col), k)).alias("shingle"),
    )
    marked = bsh.withColumn("_hit", F.lit(1))
    hits = sh.join(
        F.broadcast(marked) if broadcast_bench else marked, "shingle", "left"
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("_hit").alias("n_overlap"),
        (F.count("_hit") / F.count(F.lit(1))).alias("overlap_frac"),
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.3,
) -> tuple[DataFrame, DataFrame]:
    """Split ``corpus`` into (clean, contaminated) by benchmark overlap.

    ``contaminated`` carries the overlap stats; ``clean`` is the original
    corpus rows (all columns) whose overlap_frac < threshold — the frame a
    training pipeline feeds forward.
    """
    stats = contamination_stats(corpus, bench, text_col, id_col, k)
    contaminated = stats.filter(F.col("overlap_frac") >= threshold)
    clean = corpus.join(
        contaminated.select(id_col), id_col, "left_anti"
    )
    return clean, contaminated
