"""Change-data-capture application: merge a changelog into a snapshot.

The missing write-path primitive between :mod:`whiterrabbit_spark.drift`
(detect what changed) and ``extensions.diff`` (enumerate what changed):
actually APPLY an upsert/delete changelog to a base snapshot, yielding
the next snapshot — the core of any incremental 100 TB table maintenance
loop (SCD2 in ``queries._scd2_history`` builds history; this builds the
current view).

Semantics (latest-wins):

* per key, order changes by ``seq_cols`` (e.g. commit timestamp then log
  sequence number — the caller guarantees the tuple is a total order per
  key; ties would make "latest" undefined in ANY engine);
* latest op ``D`` ⇒ the key disappears, whether or not it existed;
* latest op ``I``/``U`` ⇒ the key holds that change's payload;
* keys untouched by the changelog keep their snapshot row.

Scale shape: ONE per-key window over the changelog bounded by that key's
change count (changelogs are deltas — orders of magnitude smaller than
the snapshot), then one left-anti join (snapshot keys not superseded)
and a union. The snapshot itself never enters a window and is never
shuffled beyond the anti join on its key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (with ``op_col`` in {'I','U','D'}) on top of
    ``snapshot``; returns the next snapshot with the snapshot's columns.

    ``changes`` must carry every snapshot column plus ``seq_cols`` and
    ``op_col``; extra columns are dropped from the result.
    """
    payload_cols = snapshot.columns
    missing = [c for c in payload_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changelog lacks snapshot columns: {missing}")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    surviving = latest.where(F.col(op_col) != "D").select(*payload_cols)
    superseded_keys = latest.select(*key_cols)
    untouched = snapshot.join(superseded_keys, key_cols, "left_anti")
    return untouched.unionByName(surviving)
