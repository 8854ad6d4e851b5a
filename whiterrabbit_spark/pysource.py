"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

The reference engine reads delimited files only (whiteRRabbit.R:1-60);
this module exercises the OTHER side of Spark's source surface: a
user-defined, partition-parallel source written in pure Python and
registered with ``spark.dataSource.register`` — the extension point a
100 TB pipeline uses for internal feeds (queue snapshots, synthetic
load, fixture generators) without a JVM connector.

The built-in source here is a deterministic synthetic table: row ``i``
maps to ``(i, i % 7, (i * 2654435761) % 1000)`` — the Knuth
multiplicative hash keeps values pseudo-random yet exactly reproducible
by any engine (the DuckDB oracle regenerates the same rows from
``generate_series``), and ``partitions()`` splits the id range so the
scan parallelizes like any native source.
"""

from __future__ import annotations

import math

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KNUTH = 2654435761


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 10_000))
        self.n_partitions = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        step = max(1, math.ceil(self.n / self.n_partitions))
        return [
            _IdRange(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange):
        for i in range(partition.start, partition.end):
            yield (i, i % 7, (i * KNUTH) % 1000)


class SyntheticDataSource(DataSource):
    """``spark.read.format("wrs_synth").option("n", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "wrs_synth"

    def schema(self) -> str:
        return "id bigint, day bigint, value bigint"

    def reader(self, schema) -> SyntheticReader:
        return SyntheticReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SyntheticDataSource)


try:  # Spark 4 streaming Python data source API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - pyspark < 4 fallback
    SimpleDataSourceStreamReader = object


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the synthetic source: the same Knuth-hash rows
    arrive in ``rows_per_batch`` micro-batch slices until ``n`` rows
    have been emitted, then the offset stops advancing — a bounded,
    exactly-replayable stream (``readBetweenOffsets`` regenerates any
    slice), so a drained stream equals the batch table row-for-row and
    the DuckDB oracle can check a STREAMING pipeline's final state."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 10_000))
        self.batch = max(1, int(options.get("rows_per_batch", 1000)))

    @staticmethod
    def _rows(lo: int, hi: int):
        return iter([(i, i % 7, (i * KNUTH) % 1000) for i in range(lo, hi)])

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.n)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["pos"]), int(end["pos"]))
