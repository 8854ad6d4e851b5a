"""Dataset splitting / sampling for training pipelines.

* ``hash_split`` — deterministic train/val/test assignment from a stable
  hash of the row key: reproducible across runs, clusters, and engines
  (no RNG state), stable under data re-partitioning, and any row's split
  is computable in isolation — the properties a 100 TB training pipeline
  needs from a split. Pure map-side expression, no shuffle.
* ``stratified_sample`` — per-stratum Bernoulli sampling via
  ``DataFrame.sampleBy`` (seeded): rebalancing class mixes at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def hash_bucket_expr(key: Column, salt: str = "", buckets: int = SPLIT_BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from md5 of the stringified key
    (+salt). 15 hex chars = 60 bits, bias < 2^-46 for bucket counts this
    small; md5 is reproduced bit-identically by the DuckDB oracle."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % buckets).cast("int")


def hash_split_expr(
    key: Column, weights: dict[str, float], salt: str = "", buckets: int = SPLIT_BUCKETS
) -> Column:
    """Split-name column from cumulative weight thresholds over the hash
    bucket. Weights must sum to ~1; the last split absorbs rounding."""
    bucket = hash_bucket_expr(key, salt, buckets)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Attach a deterministic ``split`` column (default 80/10/10)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(
        "split", hash_split_expr(F.col(id_col), weights, salt, buckets)
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Seeded per-stratum sample (Bernoulli per row — approximate counts,
    exact-in-expectation; deterministic for a fixed seed + partitioning)."""
    return df.sampleBy(strata_col, fractions, seed)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """Per-stratum sampling by stable hash threshold instead of RNG:
    a row is kept iff ``hash_bucket(id) < fraction[stratum]·buckets``.

    Unlike ``stratified_sample`` (Bernoulli RNG — resample changes rows),
    the kept set is a pure function of the row key: re-runs, engines, and
    repartitionings agree row-for-row, membership is computable per row in
    isolation, and supersampling is monotone (raising a fraction only adds
    rows — the property training-data ablations need so smaller samples
    nest inside bigger ones). Map-side expression, no shuffle.

    Strata missing from ``fractions`` are dropped (sampleBy semantics).
    """
    bucket = hash_bucket_expr(F.col(id_col), salt, buckets)
    expr = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == stratum) & (bucket < int(round(frac * buckets)))
        expr = cond if expr is None else expr | cond
    return df.where(expr if expr is not None else F.lit(False))
