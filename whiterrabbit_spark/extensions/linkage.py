"""Record linkage (entity resolution) between two keyed tables.

The profiling/dedup machinery in this package works WITHIN one corpus;
linkage is the cross-table form: match records that denote the same
entity despite typos, formatting drift, and truncation (customer files
vs CRM exports, supplier masters across subsidiaries). Classic
blocking-and-verify:

* **block** — candidate pairs share a cheap normalized key (default:
  the first ``block_chars`` alphanumerics, lowercased, plus a coarse
  length bucket). An equi-join on the block key — Catalyst shuffles
  both sides on it; WITHOUT blocking this is a cross join, which at
  scale is not a slow plan but a non-plan.
* **verify** — candidates score with the built-in JVM ``levenshtein``
  (threshold-accelerated: the ``max_dist`` argument turns the O(n·m)
  DP into O(n·max_dist) with early exit) on the FULL normalized string.
* **resolve** — keep the best match per left record (min distance,
  right-id tie-break) via one window over the candidate frame,
  partition size = per-record candidate count (block-size bounded).

Blocking trades recall for tractability: a typo inside the block prefix
hides the true match. Standard mitigation is a union of independent
blockings (prefix + suffix + sorted-token signature); the ``block_expr``
hook accepts any expression so callers can compose them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_name(col: Column) -> Column:
    """Matching canonical form: lowercase, alphanumerics+spaces only,
    whitespace collapsed. Deliberately cheap and engine-portable (the
    DuckDB oracle mirrors it exactly)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def block_key(col: Column, block_chars: int = 3, len_bucket: int = 4) -> Column:
    """Default blocking key: first ``block_chars`` alphanumerics of the
    normalized form + length bucket (``len/len_bucket``) — cheap, high
    recall on prefix-stable names, and the length bucket keeps giant
    same-prefix blocks (e.g. "customer…") subdivided."""
    norm = F.regexp_replace(normalize_name(col), " ", "")
    # explicit floor: a bare divide-then-cast truncates on Spark but
    # ROUNDS on engines like DuckDB — the oracle must mirror exactly
    return F.concat_ws(
        "|",
        F.substring(norm, 1, block_chars),
        F.floor(F.length(norm) / len_bucket).cast("int").cast("string"),
    )


def link_records(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 5,
    block_chars: int = 3,
    block_expr=None,
) -> DataFrame:
    """Best match per left record: ``(left_id, right_id, distance)``,
    candidates from shared blocks, verified by bounded levenshtein on
    normalized strings, resolved min-distance (right-id tie-break).
    Left records with no candidate within ``max_dist`` are absent from
    the result (count them with an anti-join when orphan reporting is
    needed)."""
    bexpr = block_expr if block_expr is not None else (
        lambda c: block_key(c, block_chars)
    )
    l = left.select(
        F.col(left_id).alias("__lid"),
        normalize_name(F.col(left_text)).alias("__lnorm"),
        bexpr(F.col(left_text)).alias("__block"),
    )
    r = right.select(
        F.col(right_id).alias("__rid"),
        normalize_name(F.col(right_text)).alias("__rnorm"),
        bexpr(F.col(right_text)).alias("__block"),
    )
    cand = l.join(r, "__block").withColumn(
        "__dist", F.levenshtein(F.col("__lnorm"), F.col("__rnorm"), max_dist)
    ).where(F.col("__dist") >= 0)  # threshold form returns -1 past max_dist
    w = Window.partitionBy("__lid").orderBy(
        F.col("__dist").asc(), F.col("__rid").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__lid").alias("left_id"),
            F.col("__rid").alias("right_id"),
            F.col("__dist").alias("distance"),
        )
    )


def blocking_report(df: DataFrame, block_expr, id_col: str) -> DataFrame:
    """Blocking-quality diagnostic for record linkage: block-size
    distribution and the pair-reduction ratio — candidate pairs
    Σ nb·(nb−1)/2 as a fraction of the all-pairs N·(N−1)/2. THE number
    to check before running :func:`link_records` at scale (the sf0.1
    sweep that hung on a single collapsed block is exactly what this
    catches: a max_block_share near 1 means the key does not block).

    One groupBy(block) + one rollup over the |blocks|-row frame.

    Returns one row: ``(n_records, n_blocks, max_block, p50_block,
    p99_block, candidate_pairs, pair_reduction)``.
    """
    from pyspark.sql import functions as F

    blk = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(block_expr.alias("b"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    nb = F.col("nb").cast("double")
    return blk.agg(
        F.sum("nb").alias("n_records"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("nb").alias("max_block"),
        F.percentile(nb, 0.5).alias("p50_block"),
        F.percentile(nb, 0.99).alias("p99_block"),
        F.sum(F.col("nb") * (F.col("nb") - 1) / 2).cast("long").alias(
            "candidate_pairs"
        ),
    ).select(
        "n_records",
        "n_blocks",
        "max_block",
        "p50_block",
        "p99_block",
        "candidate_pairs",
        F.round(
            F.col("candidate_pairs")
            / (F.col("n_records") * (F.col("n_records") - F.lit(1)) / 2.0),
            6,
        ).alias("pair_reduction"),
    )
