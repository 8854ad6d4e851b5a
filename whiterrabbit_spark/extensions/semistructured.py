"""Semi-structured (JSON-string) column operators.

Event/telemetry tables carry a free-form JSON properties column next to
the typed columns (the driver's ``events.props``); profiling and rollups
need those fields extracted WITHOUT a Python-side parse. Extraction is
``from_json`` with a declared field schema — a JVM ``JsonToStructs``
expression inside whole-stage codegen, map-side and shuffle-free; the
reference has no JSON surface at all (whiteRRabbit.R reads delimited text
only), so this is a north-star extension.

Scale notes: extraction composes into the scan stage (one pass, column-
pruned to the JSON column + keys); a rollup over extracted fields is the
standard partial-aggregable groupBy. Malformed JSON yields NULL fields
(PERMISSIVE mode), so corrupt rows degrade to missing values, not job
failures — the right default for 100 TB of telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_json_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    prefix: str = "",
) -> DataFrame:
    """Project typed fields out of a JSON-string column: ``fields`` maps
    field name → Spark type DDL (e.g. ``{"k": "int"}``). Appends one
    typed column per field (``prefix + name``); all original columns are
    kept. Missing keys and malformed documents become NULL.

    The document parses ONCE: one ``from_json`` lands in an intermediate
    struct column that every field projects from (per-field ``from_json``
    copies would each get their schema pruned to a single field —
    non-identical expressions CSE cannot merge, re-tokenizing the JSON
    once per field)."""
    clash = [prefix + n for n in fields if prefix + n in df.columns]
    if clash:
        raise ValueError(
            f"extracted field(s) {clash} collide with existing columns; "
            "pass a prefix"
        )
    # backtick-quoted DDL: field names that are reserved words or contain
    # special characters must not break the schema parse
    schema = ", ".join(f"`{name}` {ddl}" for name, ddl in fields.items())
    tmp = f"_{json_col}_parsed"
    while tmp in df.columns:
        # an existing column with the intermediate's name would be
        # silently overwritten and then dropped — disambiguate instead
        tmp += "_"
    out = df.withColumn(tmp, F.from_json(F.col(json_col), schema))
    for name in fields:
        out = out.withColumn(prefix + name, F.col(tmp)[name])
    return out.drop(tmp)


def json_field_rollup(
    df: DataFrame,
    json_col: str,
    field: str,
    field_type: str,
    group_col: str,
) -> DataFrame:
    """Typed rollup over one JSON field per group: count, non-null count,
    min/max/avg, exact distinct — the profiling summary for a
    semi-structured column. One extraction pass fused into the scan, one
    partial-aggregable groupBy shuffle, O(groups) rows out."""
    extracted = extract_json_fields(df, json_col, {field: field_type}, "_j_")
    v = F.col(f"_j_{field}")
    return extracted.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n_present"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
        F.avg(v).alias("avg_val"),
        F.countDistinct(v).alias("distinct_vals"),
    )


def variant_field_rollup(
    df: DataFrame,
    json_col: str,
    field: str,
    group_col: str,
) -> DataFrame:
    """Semi-structured rollup through Spark 4's VARIANT type:
    ``parse_json`` turns the raw JSON string into the shredding-friendly
    binary variant encoding once, ``variant_get`` projects the field
    with a type — the modern path that at lake scale lets the reader
    skip re-parsing text per query (and, with parquet variant
    shredding, prune to the subcolumn). Same output contract as
    :func:`json_field_rollup`, so the two can be A/B'd directly.

    ``try_parse_json`` swallows malformed rows into NULL (the quarantine
    convention), ``try_variant_get`` returns NULL on path-miss or cast
    failure — both map-side, fused into the scan projection.
    """
    v = F.try_parse_json(F.col(json_col))
    k = F.try_variant_get(v, f"$.{field}", "bigint")
    return (
        df.select(F.col(group_col), k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("__k").alias("n_present"),
            F.min("__k").alias("min_val"),
            F.max("__k").alias("max_val"),
            F.avg("__k").alias("avg_val"),
            F.countDistinct("__k").alias("distinct_vals"),
        )
    )
