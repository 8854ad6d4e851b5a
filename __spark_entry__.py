"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship single-pass profile of lineitem;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions, as Spark callables paired
with DuckDB oracle SQL over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from whiterrabbit_spark.config import ScanConfig
from whiterrabbit_spark.profile import profile_table
from whiterrabbit_spark.queries import build_registry

_QUERIES, _ORACLES = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: one-pass full profile (counts + numeric + date stats
    for every column) of sf0.001 lineitem — SURVEY §7 step 1."""
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    summary, _ = profile_table(df, ScanConfig(max_rows=-1), table_name="lineitem")
    return summary


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
