"""S4 — seeded exact-N row sampling (whiteRRabbit.R:225-238).

The reference materializes ``maxRows`` random line numbers and filters with
awk so only sampled lines are ever parsed — a hand-rolled sample pushdown.
There is no exact-N pushdown in Spark; per SURVEY §2/S4 the scale-correct
analog is a seeded Bernoulli sample slightly over the target fraction,
truncated to exactly N. ``sample`` is evaluated inside the scan (rows are
dropped before any shuffle); ``limit`` bounds the result deterministically.

The reference's Windows head+tail variant (W:239-263) is a platform
artifact and deliberately not ported (SURVEY §2/S5); the residual in-memory
sample (W:266-272) is subsumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from whiterrabbit_spark.config import ScanConfig


def exact_random_sample(
    df: DataFrame,
    n: int,
    total_rows: int | None = None,
    cfg: ScanConfig | None = None,
) -> DataFrame:
    """Return ~exactly ``n`` rows, seeded. ``total_rows`` (if known from the
    cheap line count, io.count_lines) sizes the Bernoulli fraction; without
    it we pay one count job."""
    cfg = cfg or ScanConfig()
    if n <= 0:
        return df
    if total_rows is None:
        total_rows = df.count()
    if total_rows <= n:
        return df
    # Oversample by 10% + slack so the limit(n) is satisfied w.h.p.;
    # Bernoulli variance at n=100k is ±~300, slack 1000 is ample.
    frac = min(1.0, (n + 4 * (n**0.5) + 1000) / total_rows * 1.1)
    return df.sample(fraction=frac, seed=cfg.seed).limit(n)
