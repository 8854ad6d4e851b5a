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


_BOOL_RE = "^(true|false)$"
_INT_RE = "^-?[0-9]+$"
_DOUBLE_RE = r"^-?[0-9]+\.[0-9]+([eE][-+]?[0-9]+)?$"


def json_schema_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema DISCOVERY over a free-form JSON column — the profile you
    run before :func:`extract_json_fields` can be given its field list:
    per top-level key, how many rows carry it, what fraction of the
    table that is, and the lexical type mix of its values
    (bool/int/double/string, JSON nulls counted separately). The drift
    twin of the typed-column profile for telemetry payloads: a key
    appearing, vanishing, or changing type between snapshots shows up
    as a diffable row.

    Fully JVM: ``from_json`` to ``map<string,string>`` (one codegen
    expression — scalars arrive as their JSON literals, so typing is a
    regexp classification), ``explode`` bounded by keys-per-row, ONE
    groupBy(key) with conditional-sum type counts, and the row total
    joined in as a broadcast one-row frame (its count is a second,
    column-pruned scan — at 100 TB parquet serves it from footer
    metadata, but it IS a scan). No Python anywhere.
    Lexical caveat (documented): a QUOTED "123" classifies as int —
    the map extraction strips quotes; type counts describe the value
    lexicon, not the JSON quoting.

    Returns one row per key:
    ``(key, n_present, pct_rows, n_null, n_bool, n_int, n_double,
    n_string)``.
    """
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    kv = df.select(
        F.explode(
            F.from_json(F.col(json_col), "map<string,string>")
        ).alias("key", "value")
    )
    v = F.col("value")
    is_bool = v.rlike(_BOOL_RE)
    is_int = v.rlike(_INT_RE)
    is_double = v.rlike(_DOUBLE_RE)
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
            F.sum(F.when(v.isNotNull() & is_bool, 1).otherwise(0)).alias("n_bool"),
            F.sum(F.when(v.isNotNull() & is_int, 1).otherwise(0)).alias("n_int"),
            F.sum(F.when(v.isNotNull() & is_double, 1).otherwise(0)).alias("n_double"),
            F.sum(
                F.when(
                    v.isNotNull() & ~is_bool & ~is_int & ~is_double, 1
                ).otherwise(0)
            ).alias("n_string"),
        )
        .join(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.round(F.col("n_present") / F.col("__total"), 6).alias("pct_rows"),
            "n_null", "n_bool", "n_int", "n_double", "n_string",
        )
        .orderBy("key")
    )


def json_schema_drift(
    ref: DataFrame, cur: DataFrame, json_col: str
) -> DataFrame:
    """Schema drift between two snapshots of a free-form JSON column —
    the diffable follow-on :func:`json_schema_profile` exists for: per
    key, presence fraction in each snapshot, the delta, and whether the
    DOMINANT lexical type changed (the silent producer-side break that
    typed pipelines hit as a cast error much later). Keys absent from
    one snapshot read as 0.0 presence there (appeared/vanished rows).

    Two profile passes + a FULL OUTER join on the tiny per-key frames —
    per snapshot one parse scan plus the profile's column-pruned count
    scan; everything after is key-cardinality-sized.

    Returns one row per key:
    ``(key, ref_pct, cur_pct, delta_pct, ref_type, cur_type,
    type_changed)`` where *_type is the argmax of the type counts
    (bool > int > double > string on ties, 'none' for a key absent or
    all-null in that snapshot).
    """
    def prof(df: DataFrame, side: str) -> DataFrame:
        p = json_schema_profile(df, json_col)
        dom = (
            F.when(
                (F.col("n_bool") >= F.col("n_int"))
                & (F.col("n_bool") >= F.col("n_double"))
                & (F.col("n_bool") >= F.col("n_string"))
                & (F.col("n_bool") > 0), "bool")
            .when(
                (F.col("n_int") >= F.col("n_double"))
                & (F.col("n_int") >= F.col("n_string"))
                & (F.col("n_int") > 0), "int")
            .when(
                (F.col("n_double") >= F.col("n_string"))
                & (F.col("n_double") > 0), "double")
            .when(F.col("n_string") > 0, "string")
            .otherwise("none")
        )
        return p.select(
            "key",
            F.col("pct_rows").alias(f"{side}_pct"),
            dom.alias(f"{side}_type"),
        )

    out = prof(ref, "ref").join(prof(cur, "cur"), "key", "full_outer")
    rp = F.coalesce("ref_pct", F.lit(0.0))
    cp = F.coalesce("cur_pct", F.lit(0.0))
    rt = F.coalesce("ref_type", F.lit("none"))
    ct = F.coalesce("cur_type", F.lit("none"))
    return out.select(
        "key",
        rp.alias("ref_pct"),
        cp.alias("cur_pct"),
        F.round(cp - rp, 6).alias("delta_pct"),
        rt.alias("ref_type"),
        ct.alias("cur_type"),
        (rt != ct).alias("type_changed"),
    ).orderBy("key")
