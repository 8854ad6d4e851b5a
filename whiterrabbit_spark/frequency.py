"""F1 — value frequency tables (whiteRRabbit.R:329-352).

Reference semantics preserved:
* computed for every non-date/timestamp column — numerics included, their
  values stringified (W:331, W:342);
* values counted over non-missing, non-empty entries (W:322);
* drop values with count < ``min_cell_count`` (W:335);
* truncate to the top ``max_distinct_values`` by count (W:336-338), with the
  reference's stable tie-break — R ``sort(table(...), decreasing=TRUE)``
  keeps value order on ties ⇒ deterministic ``(count DESC, value ASC)``;
* **Percentage denominator is the sum over the DISPLAYED (filtered +
  truncated) rows only** (W:344) — percentages sum to 1.0 over the emitted
  table, not over the data. Quirk kept.

Scale shape: instead of one groupBy job per column (reference loops
per-column in memory), all eligible columns melt into one
``explode(array(struct(col_name, value)))`` → single
``groupBy(column_name, value)`` job — one shuffle with map-side partial
aggregation; the post-agg windows operate on ≤ distinct-value cardinality,
not row cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whiterrabbit_spark.config import ScanConfig


def _eligible(dt: T.DataType) -> bool:
    # W:331: skip Date/POSIXt columns.
    return not isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType))


def value_frequencies(
    df: DataFrame,
    columns: list[str] | None = None,
    cfg: ScanConfig | None = None,
) -> DataFrame:
    """Frequency frame: (column_name, value, count, percentage).

    ``columns`` defaults to every frequency-eligible (non-date) column.
    """
    cfg = cfg or ScanConfig()
    if columns is None:
        columns = [f.name for f in df.schema.fields if _eligible(f.dataType)]
    else:
        types = {f.name: f.dataType for f in df.schema.fields}
        columns = [c for c in columns if _eligible(types[c])]
    if not columns:
        return df.sparkSession.createDataFrame(
            [],
            "column_name string, value string, count long, percentage double",
        )

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("kv")
    ).select("kv.column_name", "kv.value")

    counts = (
        melted.where(F.col("value").isNotNull() & (F.col("value") != ""))
        .groupBy("column_name", "value")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= cfg.min_cell_count)
    )

    w_rank = Window.partitionBy("column_name").orderBy(
        F.col("count").desc(), F.col("value").asc()
    )
    retained = (
        counts.withColumn("__rn", F.row_number().over(w_rank))
        .where(F.col("__rn") <= cfg.max_distinct_values)
    )
    w_all = Window.partitionBy("column_name")
    return (
        retained.withColumn(
            "percentage", F.col("count") / F.sum("count").over(w_all)
        )
        .drop("__rn")
        .orderBy("column_name", F.col("count").desc(), F.col("value").asc())
    )
