#!/usr/bin/env python
"""Fast single-query oracle check while iterating on new registry
entries: runs the named queries() entries on Spark and DuckDB at the
given SF dir (default sf0.001 for speed) with EXACTLY the compare
rules of tools/oracle_full.py.

Usage:  python tools/oracle_one.py name [name ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from oracle_full import (  # noqa: E402
    SPARK_TO_DUCK, TABLES, _rows_to_set, _value_hash,
)


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from whiterrabbit_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]

    spark = get_spark(app_name="wrs-oracle-one", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = 0
    for name in args:
        sdf = queries[name](spark, sf_dir)
        spark_cols = list(sdf.columns)
        spark_types = {
            f.name: f.dataType.simpleString() for f in sdf.schema.fields
        }
        spark_rows = [tuple(r) for r in sdf.collect()]
        s_norm = _rows_to_set(spark_cols, spark_rows)
        if name not in oracles:
            print(f"{name}: NO ORACLE ({len(spark_rows)} spark rows)")
            print(spark_rows[:5])
            continue
        rel = con.sql(oracles[name])
        duck_cols = list(rel.columns)
        duck_types = {
            c: str(t).split("(")[0] for c, t in zip(rel.columns, rel.types)
        }
        duck_rows = rel.fetchall()
        d_norm = _rows_to_set(duck_cols, duck_rows)
        schema_ok = sorted(spark_cols) == sorted(duck_cols) and all(
            SPARK_TO_DUCK.get(spark_types[c]) == duck_types.get(c)
            for c in spark_cols
        )
        ok = schema_ok and s_norm == d_norm
        bad += not ok
        print(
            f"{name}: {'GREEN' if ok else 'MISMATCH'} "
            f"spark={len(spark_rows)} duck={len(duck_rows)} "
            f"schema={schema_ok} hash={_value_hash(s_norm)}/"
            f"{_value_hash(d_norm)}"
        )
        if not ok:
            if not schema_ok:
                print("  spark types:", spark_types)
                print("  duck  types:", duck_types)
            only_s = [r for r in s_norm if r not in set(map(tuple, d_norm))]
            only_d = [r for r in d_norm if r not in set(map(tuple, s_norm))]
            print("  only-spark:", only_s[:4])
            print("  only-duck :", only_d[:4])
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
