"""Mirror of the driver's t2 correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count, column names, and order-insensitive values.

Run at sf0.001 by default (fast); set WRS_ORACLE_SF=/root/testdata/sf0.01
to mirror the driver's exact scale.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("WRS_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0  # -0.0 == 0.0 but repr-differs (r5 driver-red)
        return round(v, 6)
    if isinstance(v, int):
        return v
    return str(v)


def _strict(v):
    """Repr-strict: floats keep their exact repr — what the driver's
    value hash effectively sees (VERDICT r5 #1/#2)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, int):
        return v
    return str(v)


def _rows_to_set(cols, rows, norm=_norm):
    return sorted(
        tuple(norm(v) for _, v in sorted(zip(cols, r), key=lambda p: p[0]))
        for r in rows
    )


def _assert_no_negative_zero(name, rows):
    """Property (VERDICT r5 #1c): no registry query may emit -0.0 — a
    repr-hash coin flip. The boundary normalization in build_registry
    adds +0.0 to every double (and array<double>) output."""
    def leaves(v):
        # Recursive: structs collect as Row (tuple subclass), maps as
        # dict — a flat scan would miss nested doubles entirely.
        if isinstance(v, (list, tuple)):
            for x in v:
                yield from leaves(x)
        elif isinstance(v, dict):
            for k, x in v.items():
                yield from leaves(k)
                yield from leaves(x)
        else:
            yield v

    hits = [
        v
        for r in rows
        for v in leaves(tuple(r))
        if isinstance(v, float) and v == 0 and math.copysign(1, v) < 0
    ]
    assert not hits, f"{name}: emitted {len(hits)} -0.0 leaf value(s)"


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# Spark simpleString -> the DuckDB type the driver's dtype-sensitive hash
# canonicalizes identically.  Both sides must land in this table (see
# test_oracle_types.py for the r2 HUGEINT hash-red post-mortem).
SPARK_TO_DUCK = {
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    _assert_no_negative_zero(name, spark_rows)

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only check
        return

    con = _duck()
    rel = con.sql(ORACLES[name])
    duck_cols = list(rel.columns)
    duck_types = {c: str(t).split("(")[0] for c, t in zip(rel.columns, rel.types)}
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    type_mismatches = [
        (f.name, f.dataType.simpleString(), duck_types.get(f.name))
        for f in sdf.schema.fields
        if SPARK_TO_DUCK.get(f.dataType.simpleString()) != duck_types.get(f.name)
    ]
    assert not type_mismatches, (
        f"{name}: spark/oracle result-type drift {type_mismatches} — the "
        f"driver hashes dtypes; align both sides to bigint/double/string/"
        f"boolean/date/timestamp"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    _assert_no_negative_zero(name, duck_rows)
    s, d = _rows_to_set(spark_cols, spark_rows), _rows_to_set(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
    ss = _rows_to_set(spark_cols, spark_rows, _strict)
    dd = _rows_to_set(duck_cols, duck_rows, _strict)
    strict_mismatches = [(a, b) for a, b in zip(ss, dd) if a != b]
    assert not strict_mismatches, (
        f"{name}: repr-strict divergence the rounded compare cannot see "
        f"(the r5 cusum failure mode): {strict_mismatches[:3]}"
    )
