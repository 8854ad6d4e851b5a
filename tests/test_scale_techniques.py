"""Scale-technique demonstrations with plan/parity evidence: salting for
skewed aggregation keys and bucketing for shuffle-free co-located joins —
the two hand-applied data-layout techniques the engine's docs promise for
100 TB (AQE and partial aggregation cover the rest automatically).
"""

from __future__ import annotations

import math
import uuid

import pytest
from pyspark.sql import functions as F


def test_salted_counts_match_direct(spark):
    """Two-stage salted count == direct groupBy count on a 90%-one-value
    skewed column."""
    from whiterrabbit_spark.frequency import salted_value_counts

    df = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 500).cast("string"))
        ).alias("k")
    )
    direct = {r["value"]: r["count"] for r in df.groupBy(F.col("k").alias("value"))
              .agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {r["value"]: r["count"] for r in
              salted_value_counts(df, "k", salt_buckets=16).collect()}
    assert salted == direct
    assert salted["hot"] == 180_000


@pytest.fixture()
def bucketed_tables(spark):
    # warehouse dir is a static conf — use the session default; DROP TABLE
    # removes the files afterwards
    a = f"ba_{uuid.uuid4().hex[:8]}"
    b = f"bb_{uuid.uuid4().hex[:8]}"
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    (left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(a))
    (right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(b))
    yield a, b
    spark.sql(f"DROP TABLE IF EXISTS {a}")
    spark.sql(f"DROP TABLE IF EXISTS {b}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Two tables bucketed on the join key join WITHOUT any Exchange —
    bucket layout replaces the shuffle (the co-located join the docs
    promise for repeatedly-joined 100 TB tables); result parity against
    the shuffled join of the raw frames."""
    a, b = bucketed_tables
    # force the sort-merge path (a 10k-row side would broadcast, hiding
    # the bucket layout this test demonstrates)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "k")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000
        s = joined.agg(F.sum(F.col("x") + F.col("y"))).collect()[0][0]
        # sum(2k + 3k) over k in [0, 10000)
        assert s == 5 * (10_000 * 9_999) // 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_approx_heavy_hitters_finds_frequent_values(spark):
    """Two-pass heavy hitters: every value above the support threshold is
    returned with its EXACT count; sub-support noise values are not."""
    from whiterrabbit_spark.frequency import approx_heavy_hitters

    df = spark.range(100_000).select(
        F.when(F.col("id") % 100 < 40, "a")
        .when(F.col("id") % 100 < 70, "b")
        .when(F.col("id") % 100 < 90, "c")
        .otherwise(F.concat(F.lit("noise_"), (F.col("id") % 9973).cast("string")))
        .alias("k")
    )
    got = {r["value"]: r["count"] for r in
           approx_heavy_hitters(df, "k", support=0.05).collect()}
    assert got["a"] == 40_000 and got["b"] == 30_000 and got["c"] == 20_000
    assert all(not v.startswith("noise_") for v in got)


def test_salted_join_matches_plain(spark):
    """Salted (key, salt) join == plain equi-join on a 90%-hot-key left
    side, for inner and left joins including unmatched left rows."""
    from pyspark.sql import functions as F

    from whiterrabbit_spark.extensions.joins import salted_join

    left = spark.range(100_000).select(
        F.when(F.col("id") % 10 != 0, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k2", 3), ("absent", 9)], "k string, rv int"
    )
    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        salted = salted_join(left, right, "k", salt_buckets=8, how=how)
        assert salted.count() == plain.count()
        a = plain.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("rv").alias("s")
        ).collect()
        b = salted.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("rv").alias("s")
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    import pytest

    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_heavy_hitters_prunes_but_stays_exact(spark):
    """High-cardinality tail + planted heavy keys: the MG candidate set
    must be a tiny fraction of the distinct values, and the final
    answer must equal the naive GROUP BY ... HAVING exactly."""
    import pyspark.sql.functions as F

    from whiterrabbit_spark.profile import heavy_hitters

    n_tail, n_heavy_rows = 60_000, 4_000
    tail = spark.range(n_tail).select(
        (F.col("id") + 1_000_000).alias("v")
    )  # 60k distinct singletons
    heavy = spark.range(n_heavy_rows).select(
        (F.col("id") % 4).alias("v")
    )  # 4 keys x 1000 rows
    df = tail.unionAll(heavy).repartition(8, "v")
    total = n_tail + n_heavy_rows
    phi = 500 / total  # threshold 500 -> exactly the 4 planted keys

    got = sorted(
        (r["value"], r["n"]) for r in heavy_hitters(df, "v", phi).collect()
    )
    assert got == [(0, 1000), (1, 1000), (2, 1000), (3, 1000)]

    # the candidate pass really prunes: m = ceil(2/phi) per partition
    # bounds candidates ~ partitions*m << 60k distinct
    import math

    m = math.ceil(2 / phi)
    assert m * 8 < n_tail  # the guarantee is meaningful at this shape


def test_heavy_hitters_matches_naive_on_events(spark):
    import pyspark.sql.functions as F

    from whiterrabbit_spark.profile import heavy_hitters

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    phi = 0.05
    got = sorted(
        (r["value"], r["n"])
        for r in heavy_hitters(ev, "user_id", phi).collect()
    )
    total = ev.where(F.col("user_id").isNotNull()).count()
    naive = sorted(
        (r["user_id"], r["n"])
        for r in ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= math.ceil(phi * total))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_shuffle_shard_materialization_local_sort_only(spark):
    """Materializing training shards from shuffle_shards must compile
    to one hash-partition exchange + per-partition sort — NEVER a
    range-partitioned global sort (the single-total-order trap at
    100 TB)."""
    from whiterrabbit_spark.extensions import splits as sp

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    sh = sp.shuffle_shards(df, "doc_id", 8)
    mat = sh.repartition(8, "shard_id").sortWithinPartitions("shuffle_key")
    plan = mat._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "hashpartitioning" in plan
    assert "rangepartitioning" not in plan.lower()
    # the sort is partition-local: formatted mode prints the Sort
    # node's Arguments with "false" for global
    import re
    m = re.search(r"\(\d+\) Sort\nInput.*\nArguments: (.*)", plan)
    assert m and "false" in m.group(1)


def test_epoch_upsample_is_shuffle_free(spark):
    """The weighted-repeat operator is a map-side CASE + bounded
    explode: its plan must contain zero Exchange nodes."""
    from whiterrabbit_spark.extensions import splits as sp

    df = spark.range(1_000).selectExpr("id", "'a' AS g")
    up = sp.epoch_upsample(df, "id", "g", {"a": 2.5})
    plan = up._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_write_bucketed_table_self_heals_orphaned_location(spark, tmp_path):
    """A fresh session's in-memory metastore doesn't know about tables a
    previous run left in the warehouse dir — saveAsTable would refuse the
    orphaned location. write_bucketed_table(mode=overwrite) must clear it
    and succeed (regression for the bucket_join_orders registry query)."""
    import os
    import uuid

    from whiterrabbit_spark.extensions.sink import write_bucketed_table

    name = f"heal_{uuid.uuid4().hex[:8]}"
    df = spark.range(100).select(F.col("id").alias("k"))
    write_bucketed_table(df, name, ["k"], n_buckets=2)
    # simulate the orphan: drop ONLY the catalog entry, keep the files
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, name)
    assert os.path.isdir(loc)
    spark.sql(f"DROP TABLE {name}")
    os.makedirs(loc, exist_ok=True)  # dir may survive drop on some stores
    write_bucketed_table(df, name, ["k"], n_buckets=2)  # must not raise
    assert spark.table(name).count() == 100
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_runtime_bloom_filter_prunes_fact_side(spark, tmp_path):
    """With runtime bloom filters enabled and a selective dim filter,
    the optimized plan injects might_contain on the fact side — the
    fact rows that can't join die BEFORE the shuffle (the 100 TB
    fact/dim join saver). Result parity with the plain join."""
    from whiterrabbit_spark.extensions.joins import (
        enable_runtime_bloom_filter,
    )

    fact = spark.range(500_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("x")
    )
    dim = spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("tag")
    )
    fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    prev = {
        c: spark.conf.get(c, None)
        for c in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        enable_runtime_bloom_filter(
            spark, application_side_threshold="0"
        )
        # force the shuffle-join path: a broadcast join has no shuffle
        # to protect, so injection rightly skips it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim")).where(
            F.col("tag") == 3
        )
        j = f.join(d, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert j.count() == sum(1 for i in range(50_000) if i % 13 == 3)
    finally:
        for c, v in prev.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_distributed_row_number_matches_global_window(spark):
    """distributed_row_number == the single-reducer global window on a
    composite ordering with a massive tie block (the shape that breaks
    value-bucketed schemes: 80% of rows tie on the leading key and can
    only be balanced by splitting the tie on the tiebreak column)."""
    from pyspark.sql import Window

    from whiterrabbit_spark.profile import distributed_row_number

    df = spark.range(50_000).select(
        F.when(F.col("id") % 5 < 4, F.lit(1))
        .otherwise(F.col("id") % 97)
        .alias("n"),
        F.concat(F.lit("k"), F.col("id")).alias("key"),
    )
    order = [F.col("n").desc(), F.col("key").asc()]
    got = {
        r["key"]: r["rn"]
        for r in distributed_row_number(df, order, "rn").collect()
    }
    want = {
        r["key"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_rank_movers_distributed_matches_plain(spark):
    """rank_movers forced down the distributed-rank path
    (max_single_reducer=0) == the plain global-window path, including
    the n==0 -> NULL-rank masking."""
    from whiterrabbit_spark.profile import rank_movers

    df = spark.range(20_000).select(
        (F.col("id") % 731).cast("string").alias("k"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("p"),
    )
    kw = dict(key_col="k", period_col="p", period_a="a", period_b="b")
    plain = {
        r["key"]: (r["rank_a"], r["rank_b"], r["rank_change"])
        for r in rank_movers(df, **kw).collect()
    }
    dist = {
        r["key"]: (r["rank_a"], r["rank_b"], r["rank_change"])
        for r in rank_movers(df, max_single_reducer=0, **kw).collect()
    }
    assert dist == plain and len(plain) == 731


def test_zipf_fit_distributed_matches_plain(spark):
    """zipf_fit's distributed rank path == the plain path (identical
    one-row regression output — ranks are exact, not just
    tie-permuted)."""
    from whiterrabbit_spark.extensions.textstats import zipf_fit

    docs = spark.range(2_000).select(
        F.concat_ws(
            " ",
            F.lit("the common word"),
            F.concat(F.lit("tok"), (F.col("id") % 321)),
            F.concat(F.lit("u"), F.col("id")),
        ).alias("text")
    )
    plain = zipf_fit(docs).collect()[0]
    dist = zipf_fit(docs, max_single_reducer=0).collect()[0]
    assert plain["n_terms"] == dist["n_terms"]
    assert plain["n_tokens"] == dist["n_tokens"]
    assert abs(plain["zipf_slope"] - dist["zipf_slope"]) < 1e-9
    assert abs(plain["r2"] - dist["r2"]) < 1e-9


def test_km_survival_distributed_matches_plain(spark):
    """km_survival's chained-distributed-prefix path == the plain
    window path row-for-row (risk sets AND the ln/exp survival chain),
    including an everyone-dies terminal bucket (survival -> 0.0)."""
    from whiterrabbit_spark.profile import km_survival

    df = spark.range(30_000).select(
        (F.pmod(F.xxhash64("id"), 400)).alias("dur"),
        (F.pmod(F.xxhash64("id", F.lit(7)), 3) < 2).alias("ev"),
    )
    # Terminal everyone-dies bucket: every subject still at risk at the
    # max duration has an event, so d_t == n_at_risk there and the
    # log(1 - d/n) term is log(0) -> NULL. The window path's SUM skips
    # that NULL (survival = prior value); the distributed path must
    # coalesce the term to reproduce that, not propagate NULL.
    df = df.unionByName(
        spark.range(500).select(
            F.lit(1000).alias("dur"), F.lit(True).alias("ev")
        )
    )
    plain = {
        r["t"]: (r["n_at_risk"], r["n_events"], r["survival"])
        for r in km_survival(df, "dur", "ev").collect()
    }
    dist = {
        r["t"]: (r["n_at_risk"], r["n_events"], r["survival"])
        for r in km_survival(
            df, "dur", "ev", max_single_reducer=0
        ).collect()
    }
    assert dist == plain and len(plain) > 100
    assert 1000 in plain and plain[1000][1] == plain[1000][0]
    assert plain[1000][2] is not None
