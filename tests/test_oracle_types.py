"""Result-type discipline for the driver's correctness gate.

The driver hashes Spark and DuckDB result frames dtype-sensitively: DuckDB
``sum(INTEGER)`` yields HUGEINT (int128), which hash-mismatches Spark's
LongType even when every value is identical (the four r2 hash-reds —
corpus_report / functional_dependencies / fk_coverage / cramers_v — were
exactly this).  The contract enforced here:

1. every ``oracle_sql()`` statement, executed in DuckDB over the real
   parquet tables, produces ONLY types in {BIGINT, DOUBLE, VARCHAR,
   BOOLEAN, DATE, TIMESTAMP};
2. the matching Spark query's schema uses only the corresponding Spark
   types — so both sides canonicalize to the same pandas/arrow dtype no
   matter how the driver hashes.

Test 2 (per-query Spark/DuckDB alignment) lives in test_entry_oracle.py,
piggy-backed on the existing value-parity run; this module is the fast
DuckDB-only sweep so an oracle typing regression fails in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB logical types whose pandas/arrow canonical form is shared with a
# Spark type the repo emits.  Anything else (HUGEINT, DECIMAL, TINYINT,
# INTEGER, lists, structs) risks a driver dtype-hash mismatch.
ALLOWED_DUCK = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}

ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_result_types(duck, name):
    rel = duck.sql(ORACLES[name])
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] not in ALLOWED_DUCK
    ]
    assert not offenders, (
        f"{name}: oracle produces driver-hazardous result types {offenders}; "
        f"cast to BIGINT/DOUBLE/VARCHAR in the oracle SQL (and align the "
        f"Spark side)"
    )
