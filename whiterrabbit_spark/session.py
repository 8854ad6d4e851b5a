"""SparkSession builder tuned for the profiling workload.

Local-mode knobs follow the public Spark docs: shuffle partitions sized to
cores (not the 200 default), AQE on for runtime coalescing/skew handling,
UTC session timezone (the reference parses dates tz="UTC",
whiteRRabbit.R:181), Arrow enabled for the few pandas hops.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "whiterrabbit-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Big shuffles start wide and AQE coalesces DOWN — the static
        # shuffle.partitions alone capped a 500M-row LSH scoring join
        # at 64 reducers (~8 GB per task, Java-heap OOM in SCALE_r7);
        # small queries still end at few partitions post-coalesce.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(shuffle_partitions * 8, 256)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # A single mid-size file otherwise splits into max(bytes/128MB,
        # defaultParallelism/openCost) tasks — often fewer than cores; on a
        # cluster the same floor keeps small folder scans from bottling on
        # a handful of executors.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # Parquet reads via DSv2 (dropped from useV1SourceList) so that
        # aggregate pushdown actually engages — under the v1 default the
        # conf below is a silent no-op. Bare count()/min/max (e.g. the
        # auto-approx row-count probe) then resolve from footer metadata
        # (plan shows PushedAggregation); Spark falls back to a normal
        # scan whenever pushdown doesn't apply (filters, nested fields).
        # File WRITES are unaffected (always the v1 writer path).
        .config("spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # UI off by default (port churn + memory in test runs); the 50M
        # scan smoke flips it on via env to read per-stage inputBytes
        # from the status REST API (its scan-count pin).
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") else "false",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # ANSI off: the engine's inference casts rely on NULL-on-failure
        # semantics (we still use try_* functions everywhere it matters).
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
