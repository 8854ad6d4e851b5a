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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whiterrabbit_spark.extensions.dedup import md5_int60, shingles_expr


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


def _bloom_positions(h: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(h), n_hashes) bit positions by double hashing: the 60-bit md5
    value splits into h1 (low 30 bits) and an odd h2 (high 30 bits | 1);
    position_i = (h1 + i*h2) mod n_bits. ``n_bits`` must be a power of two
    so the odd stride cycles the full table. Shared by the build (driver)
    and probe (executor) sides — identical arithmetic is the correctness
    contract."""
    h = h.astype(np.uint64)
    h1 = h & np.uint64((1 << 30) - 1)
    h2 = (h >> np.uint64(30)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)


def build_bloom(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """Packed uint64 bit array (length n_bits/64) with all positions of
    every hash set."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    if len(hashes):
        pos = _bloom_positions(np.asarray(hashes), n_bits, n_hashes).ravel()
        np.bitwise_or.at(words, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
    return words


def _bloom_contains(
    words: np.ndarray, h: np.ndarray, n_bits: int, n_hashes: int
) -> np.ndarray:
    pos = _bloom_positions(h, n_bits, n_hashes)
    bits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def contamination_stats_bloom(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter form of :func:`contamination_stats` — the 100 TB scale
    path when even the benchmark's *string* shingle table is awkward to
    broadcast (a union of many eval suites): the benchmark collapses to a
    bit array (n_bits/8 bytes, e.g. 1 MiB at the default 2^23) shipped
    once per executor via a SparkContext broadcast, and the corpus side is
    a MAP-ONLY Arrow-batched probe — shingle md5s are computed JVM-side,
    the membership test is vectorized numpy, and no join or shuffle of
    corpus data happens at all (the only Exchange in the whole plan is
    none — output is one row per input row, produced in place).

    One-sided error: a true overlap is never missed; overlap counts can
    only be OVER-estimated by false positives, rate ≈ (1-e^(-kn/m))^k —
    at the defaults, <1e-4 for a 1M-shingle benchmark. So the clean set is
    a (slightly conservative) subset of the exact clean set, the safe
    direction for decontamination.

    Returns ``(id_col, n_shingles, n_overlap, overlap_frac)`` like the
    exact form.
    """
    bench_hashes = np.array(
        [
            r[0]
            for r in benchmark_shingles(bench, text_col, k)
            .select(md5_int60(F.col("shingle")))
            .collect()
        ],
        dtype=np.int64,
    )
    words = build_bloom(bench_hashes, n_bits, n_hashes)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(words)

    hashed = corpus.select(
        F.col(id_col),
        F.transform(
            shingles_expr(F.col(text_col), k), lambda s: md5_int60(s)
        ).alias("_hashes"),
        # null-text docs are dropped, matching the exact form (whose
        # explode eliminates them) — parity is the contract here
    ).where(F.col("_hashes").isNotNull())
    id_field = hashed.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_shingles", T.LongType()),
            T.StructField("n_overlap", T.LongType()),
            T.StructField("overlap_frac", T.DoubleType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["_hashes"].map(len).to_numpy()
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["_hashes"]]
            ) if lens.sum() else np.empty(0, dtype=np.int64)
            hits = _bloom_contains(w, flat, n_bits, n_hashes)
            bounds = np.cumsum(lens)[:-1]
            per_doc = np.array(
                [seg.sum() for seg in np.split(hits, bounds)], dtype=np.int64
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_shingles": lens,
                    "n_overlap": per_doc,
                    "overlap_frac": per_doc / np.maximum(lens, 1),
                }
            )

    return hashed.mapInPandas(probe, out_schema)


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
