#!/usr/bin/env python
"""Full-matrix oracle artifact (VERDICT r3 #1).

Runs EVERY registry query on Spark and its oracle_sql() on DuckDB at
sf0.01 (the driver's correctness scale) and writes one diffable JSON
artifact ``ORACLE_FULL_r{N}.json`` at the repo root:

    name -> {rows, oracle_rows, schema_match, hash_match, value_hash, err}

The driver's CORRECTNESS_r{N}.json samples ~50 queries per round; this
artifact covers the other ~220 oracle-backed entries so "never sampled"
queries still have a checked-in, per-round green record.

Usage:  python tools/oracle_full.py [round_number]
Env:    WRS_ORACLE_SF (default /root/testdata/sf0.01)
        SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("WRS_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Mirror of tests/test_entry_oracle.py — keep the two in lockstep so a
# green artifact implies a green mirror suite.
SPARK_TO_DUCK = {
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


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
    """Repr-strict normalization: floats keep their exact repr — no
    rounding, no signed-zero mapping. This is the hash the DRIVER
    effectively computes; the r5 cusum red passed the tolerant rounded
    compare while failing this one, so the artifact now records both
    (VERDICT r5 #1b/#2)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return v
    return str(v)


def _rows_to_set(cols, rows, norm=_norm):
    return sorted(
        tuple(norm(v) for _, v in sorted(zip(cols, r), key=lambda p: p[0]))
        for r in rows
    )


def _value_hash(norm_rows) -> str:
    h = hashlib.sha256()
    for r in norm_rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def _scan_signed_zero(rows) -> int:
    """Count -0.0 leaf values (floats and floats inside lists) — the
    property the registry boundary normalization must hold to zero."""
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

    n = 0
    for r in rows:
        for x in leaves(tuple(r)):
            if isinstance(x, float) and x == 0 and math.copysign(1, x) < 0:
                n += 1
    return n


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from whiterrabbit_spark.session import get_spark

    rnd = sys.argv[1] if len(sys.argv) > 1 else "4"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="wrs-oracle-full", cpus=cpus)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    out: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(sorted(queries), 1):
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "strict_hash_match": None, "neg_zeros": None,
            "spark_rows": None, "oracle_rows": None, "value_hash": None,
            "err": None,
        }
        try:
            sdf = queries[name](spark, SF_DIR)
            spark_cols = list(sdf.columns)
            spark_types = {
                f.name: f.dataType.simpleString() for f in sdf.schema.fields
            }
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            rec["neg_zeros"] = _scan_signed_zero(spark_rows)
            s_norm = _rows_to_set(spark_cols, spark_rows)
            rec["value_hash"] = _value_hash(s_norm)

            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                rel = con.sql(oracles[name])
                duck_cols = list(rel.columns)
                duck_types = {
                    c: str(t).split("(")[0] for c, t in zip(rel.columns, rel.types)
                }
                duck_rows = rel.fetchall()
                rec["oracle_rows"] = len(duck_rows)
                rec["neg_zeros"] += _scan_signed_zero(duck_rows)
                rec["rows_match"] = len(spark_rows) == len(duck_rows)
                rec["schema_match"] = sorted(spark_cols) == sorted(duck_cols) and all(
                    SPARK_TO_DUCK.get(spark_types[c]) == duck_types.get(c)
                    for c in spark_cols
                )
                d_norm = _rows_to_set(duck_cols, duck_rows)
                rec["hash_match"] = s_norm == d_norm
                rec["strict_hash_match"] = _rows_to_set(
                    spark_cols, spark_rows, _strict
                ) == _rows_to_set(duck_cols, duck_rows, _strict)
                if not (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rec["hash_match"]
                    and rec["strict_hash_match"]
                    and rec["neg_zeros"] == 0
                ):
                    rec["err"] = "mismatch"
        except Exception as exc:  # record, keep going — artifact must be total
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        if i % 25 == 0:
            print(f"[{i}/{len(queries)}] {time.time() - t_start:.0f}s", flush=True)

    n_green = sum(1 for r in out.values() if r["err"] is None)
    n_rows_only = sum(1 for r in out.values() if r["err"] == "no_oracle")
    n_bad = len(out) - n_green - n_rows_only
    summary = {
        "_summary": {
            "sf_dir": SF_DIR,
            "total": len(out),
            "oracle_green": n_green,
            "rows_only": n_rows_only,
            "failures": n_bad,
            "strict_hash": True,  # green == strict repr hash too (r5 #2)
            "neg_zero_total": sum(r["neg_zeros"] or 0 for r in out.values()),
            "elapsed_s": round(time.time() - t_start, 1),
        }
    }
    summary.update(out)
    # WRS_ORACLE_OUT overrides the artifact name — used for the sf0.1
    # sweep (ORACLE_SF01_r{N}.json, VERDICT r4 #6) vs the sf0.01 matrix
    path = os.path.join(
        REPO,
        os.environ.get("WRS_ORACLE_OUT", f"ORACLE_FULL_r{rnd}.json"),
    )
    with open(path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"wrote {path}: {n_green} green / {n_rows_only} rows-only / {n_bad} failures")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
