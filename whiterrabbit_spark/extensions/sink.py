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

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_curated(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
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
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.partitionBy(*partition_cols).parquet(path)


def read_curated(spark: SparkSession, path: str) -> DataFrame:
    """Read a curated corpus back; partition columns come from the
    directory layout (filters on them prune at the file index, before
    any data IO)."""
    return spark.read.parquet(path)


def zorder_value(cols: list[str], bits: int = 16) -> F.Column:
    """Bit-interleaved Z-order key over already-RANKED columns.

    Callers pass columns holding integer ranks in [0, 2^bits); the
    expression interleaves their bits (column 0 owns the most-significant
    position of each round) into one BIGINT whose ordering is the Z
    space-filling curve. Pure JVM expressions — shiftleft/or folds inside
    whole-stage codegen, no UDF.
    """
    n = len(cols)
    assert 1 <= n * bits <= 63, "interleaved width must fit a BIGINT"
    z = F.lit(0).cast("bigint")
    for b in range(bits - 1, -1, -1):  # MSB first
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("bigint"), b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: co-locate rows that are close in
    EVERY ``zorder_cols`` dimension into the same files, so parquet
    min/max statistics prune multi-dimensional range predicates — the
    data-layout half of "pruning" that hive partitioning (one dimension,
    directory granularity) cannot give. The same technique Delta/Iceberg
    expose as OPTIMIZE ZORDER BY, built from Spark primitives:

    1. per-column equi-depth quantile RANK (so skewed columns still
       spread across the curve),
    2. bit-interleave the ranks into one BIGINT (``zorder_value``),
    3. ``repartitionByRange(n_files, z)`` — contiguous curve segments per
       file — plus ``sortWithinPartitions(z)`` for tight row-group stats.

    The rank step is NOT a global-window ntile (an unpartitioned window
    funnels 100 TB through one task): per-column equi-depth cutpoints come
    from one ``approxQuantile`` pass (2^bits − 1 doubles to the driver),
    and binning is a map-side ``size(filter(cuts, x -> col >= x))`` fold
    over the inlined cutpoint array — O(2^bits) comparisons per row inside
    codegen, which bounds ``bits`` to ~8 (256 equi-depth bins per
    dimension: file-granularity pruning needs far fewer distinct curve
    positions than files). Only shuffle: the range partitioner's sample +
    exchange on z. At 100 TB, ``n_files`` becomes files-per-job sized to
    ~1 GB each.
    """
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    # one approxQuantile job computes every dimension's cutpoints — one
    # full scan total, not one per column
    all_cuts = df.select(
        *[F.col(c).cast("double").alias(c) for c in zorder_cols]
    ).stat.approxQuantile(zorder_cols, probs, 0.001)
    ranked = df
    rank_cols = []
    for c, cuts in zip(zorder_cols, all_cuts):
        rc = f"_zr_{c}"
        cut_arr = F.array(*[F.lit(float(x)) for x in sorted(set(cuts))])
        ranked = ranked.withColumn(
            rc,
            F.size(
                F.filter(cut_arr, lambda x: F.col(c).cast("double") >= x)
            ),
        )
        rank_cols.append(rc)
    z = zorder_value(rank_cols, bits)
    (
        ranked.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *rank_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    n_shards: int | None = None,
    compress: bool = True,
    mode: str = "overwrite",
) -> None:
    """Training-ready JSONL export: every row serialized with ``to_json``
    (struct of all columns) and written as sharded ``.txt[.gz]`` files —
    the interchange format tokenizer/packing stages consume. Shard size is
    bounded from above by ``max_records_per_file`` (the writer's own
    splitter) and shard count pinned by ``n_shards`` (a repartition —
    round-robin, so shards are size-balanced); gzip per shard keeps files
    independently decompressable.

    Serialization is JVM-side (``to_json`` inside codegen); the only
    shuffle is the optional repartition. The inverse reader is
    ``io.read_jsonl`` (all-string profiling entry) or a typed
    ``spark.read.json``.
    """
    # ignoreNullFields=false: to_json's default drops null-valued fields
    # per row, so an all-null column would vanish from the export and a
    # typed read-back would lose it — emit explicit nulls for a
    # schema-faithful round trip
    out = df.select(
        F.to_json(
            F.struct(*df.columns), {"ignoreNullFields": "false"}
        ).alias("value")
    )
    if n_shards:
        out = out.repartition(n_shards)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    key_cols: list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize as a bucketed (and bucket-sorted) managed table: every
    FUTURE equi-join or aggregation on ``key_cols`` between tables
    bucketed the same way runs with ZERO Exchange — the shuffle is paid
    once at write time instead of per query (plan-pinned in
    ``tests/test_scale_techniques.py::test_bucketed_join_has_no_shuffle``).
    The 100 TB move for a fact table joined on the same key every day.

    ``n_buckets`` should hold each bucket under an executor's comfortable
    working set at target scale (buckets are the join's parallelism
    ceiling: too few = stragglers, too many = small files).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # a fresh session has an empty in-memory metastore but may face
        # a warehouse dir left by an earlier run: saveAsTable refuses to
        # adopt an ORPHANED location (LOCATION_ALREADY_EXISTS), so drop
        # the catalog entry AND clear a location no table owns
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        loc = os.path.join(wh, table_name.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.bucketBy(n_buckets, *key_cols)
    if sort:
        writer = writer.sortBy(*key_cols)
    writer.mode(mode).format("parquet").saveAsTable(table_name)


def compact_dataset(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 256,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files sized
    for scan efficiency and return the output file-split count. Streaming
    sinks and over-parallel writers leave thousands of KB-sized files;
    every future scan then pays per-file open/footer cost and the
    scheduler pays per-split overhead — the classic lakehouse maintenance
    job. Partition count comes from the dataset's actual bytes (cheap
    footer-level listing via the input_file metadata), so the rewrite
    coalesces without a shuffle; `maxRecordsPerFile` is deliberately NOT
    used here since target size is in bytes, not rows.
    """
    sizes = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
        .select("length")
        .collect()
    )
    total_bytes = sum(int(r.length) for r in sizes)
    df = spark.read.parquet(path)
    n = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df.coalesce(n).write.mode("overwrite").parquet(out_path)
    return n
