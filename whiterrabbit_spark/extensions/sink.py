"""Curated-corpus sinks: the OUTPUT stage of a training-data pipeline.

The reference's sinks (whiteRRabbit.R:483-534) emit KB-scale scan
*reports*; a curation pipeline additionally has to write the curated
DATA back out — at 100 TB that means hive-partitioned parquet whose
layout serves the downstream reader:

* **partition columns** (split/lang/source) become directory keys, so a
  trainer reading ``split=train/lang=en`` scans only those files
  (partition pruning — verified in tests via the InMemoryFileIndex
  ``PartitionFilters`` of a filtered read);
* **file sizing**: each write task emits one file per partition value it
  holds. Repartitioning by the partition columns first collapses that to
  ONE file per key (vs the N-tasks × M-values small-file explosion), and
  ``max_records_per_file`` re-splits oversized keys — the two dials that
  bound file count from above and file size from above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_curated(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned parquet under ``path``.

    Rows shuffle onto the partition keys first, so each partition
    directory holds one file per reducer that received the key —
    normally ONE — instead of one file per (task × key): that is the
    small-file control that matters when 10k tasks each hold 100
    partition values (10⁶ files without it). ``max_records_per_file``
    (the writer's own splitter) re-splits any oversized key from above,
    which is collision- and AQE-proof where a manual salt is not.
    """
    arranged = df.repartition(*[F.col(c) for c in partition_cols])
    writer = arranged.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_curated(spark: SparkSession, path: str) -> DataFrame:
    """Read a curated corpus back; partition columns come from the
    directory layout (filters on them prune at the file index, before
    any data IO)."""
    return spark.read.parquet(path)
