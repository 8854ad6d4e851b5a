"""X2 — privacy date jitter (whiteRRabbit.R:283-291).

Per element, a uniform integer offset from {-5..5} (11 values, 0 included)
is added as days to every date/timestamp column. The reference draws
unseeded (W:287); we use ``rand(seed)`` with a per-column seed offset so
runs are reproducible and columns jitter independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whiterrabbit_spark.config import ScanConfig


def shift_dates(df: DataFrame, cfg: ScanConfig | None = None) -> DataFrame:
    cfg = cfg or ScanConfig()
    out = df
    for i, f in enumerate(df.schema.fields):
        if isinstance(f.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            offset = (F.floor(F.rand(cfg.seed + i) * 11) - 5).cast("int")
            if isinstance(f.dataType, T.DateType):
                out = out.withColumn(f.name, F.date_add(F.col(f.name), offset))
            else:
                out = out.withColumn(
                    f.name,
                    F.col(f.name)
                    + F.make_dt_interval(days=offset),
                )
    return out
