"""TPC-H-shaped join analytics over the reduced testdata schema.

The testdata tables are TPC-H-like but trimmed (no partsupp; lineitem has
no commitdate/receiptdate/shipmode; p_type is a single token), so each
query here is the *shape* of its TPC-H namesake adapted to the columns
that exist — the join topology, predicate placement, and aggregation
structure are the point, not the spec constants:

- Q4  -> left-SEMI join (EXISTS) from a date-windowed fact to a second fact
- Q5  -> 6-table snowflake join with a region filter entering through dims
- Q7  -> nation-pair volume: two dim legs onto one fact-fact spine
- Q10 -> returned-item revenue: fact-fact join + dim, group on customer,
         top-k by revenue
- Q14 -> promo share: conditional aggregate ratio over a part join
- Q15 -> top supplier: fact rollup + exact-max selection WITHOUT a global
         window (single-row max broadcast instead — a global Window would
         funnel every supplier into one partition)
- Q18 -> large orders: pre-aggregated HAVING subquery joined back to the
         order/customer spine
- Q22 -> anti-join (NOT EXISTS) with an exact integer-arithmetic
         above-average gate (bal_cents * n > sum_cents avoids the
         float-mean boundary hazard between engines)

Money math follows the repo's fixed-point discipline (queries.py Q1/Q3/Q6):
sums accumulate in integer cents / e4 so both engines are bit-exact and the
6-dp rounding never sits on a float boundary.

Scale notes (100 TB): the fact-fact joins shuffle on their natural keys
(orderkey / custkey / suppkey); dim legs (nation x region, the one-row max,
the aggregate gate) are broadcast explicitly; SF-scaled dims (supplier,
part, the HAVING subquery output) are left to AQE, which broadcasts them
while they fit and falls back to shuffle joins beyond — forcing
``F.broadcast`` on those would OOM a 1000-executor driver at SF100k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whiterrabbit_spark.io import read_parquet_table

R = 6  # rounding digits for double stats — keep equal to queries.R

# Integer fixed-point building blocks (exact on both engines). Lazy —
# building a Column requires an active SparkContext in PySpark 4, so the
# expression is constructed per call, not at import.
def _rev_e4():
    price_e2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_e2 = F.round(F.col("l_discount") * 100).cast("long")
    return price_e2 * (100 - disc_e2)

_REV_E4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def tpch_q4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped order-priority checking: count Q3-1997 orders that have
    at least one returned line item. The EXISTS becomes a LEFT SEMI join —
    the lineitem side is filtered before the join and never duplicates
    order rows, and the date window prunes the orders scan."""
    orders = read_parquet_table(spark, sf_dir, "orders")
    li = read_parquet_table(spark, sf_dir, "lineitem")
    windowed = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    returned = li.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        windowed.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority"""


def tpch_q5_regional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped local-supplier revenue: ASIA-region 1996 revenue per
    nation where the supplier and the customer share the nation. The
    region filter enters through the broadcast nation x region dim; the
    c_nationkey = s_nationkey equi-condition rides the supplier join."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    orders = read_parquet_table(spark, sf_dir, "orders")
    cust = read_parquet_table(spark, sf_dir, "customer")
    supp = read_parquet_table(spark, sf_dir, "supplier")
    nation = read_parquet_table(spark, sf_dir, "nation")
    region = read_parquet_table(spark, sf_dir, "region")

    asia_nations = nation.join(
        region.where(F.col("r_name") == "ASIA"),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev_e4()) / 1e4, R).alias("revenue"))
    )


TPCH_Q5_SQL = f"""
SELECT n_name,
       round(sum({_REV_E4_SQL}) / 1e4, {R}) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name"""


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped cross-nation shipping volume: revenue flowing between
    two nations (either direction) by ship year. Two independent dim legs
    (supplier-nation, customer-nation) land on the lineitem-orders spine;
    the pair filter is evaluated post-join on broadcast dim columns."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    orders = read_parquet_table(spark, sf_dir, "orders")
    cust = read_parquet_table(spark, sf_dir, "customer")
    supp = read_parquet_table(spark, sf_dir, "supplier")
    nation = read_parquet_table(spark, sf_dir, "nation")

    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (("NATION_2", "NATION_7"), ("NATION_7", "NATION_2"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == pair[0][0]) & (F.col("cust_nation") == pair[0][1]))
            | ((F.col("supp_nation") == pair[1][0]) & (F.col("cust_nation") == pair[1][1]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev_e4()) / 1e4, R).alias("volume"))
    )


TPCH_Q7_SQL = f"""
SELECT supp_nation, cust_nation, ship_year,
       round(sum(rev_e4) / 1e4, {R}) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         {_REV_E4_SQL} AS rev_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2')
) shipping
GROUP BY supp_nation, cust_nation, ship_year"""


def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped returned-item reporting: top 20 customers by revenue
    lost to returns in Q1-1997. Fact-fact join shuffles on orderkey, the
    customer rollup shuffles on custkey, nation broadcasts; top-k is a
    TakeOrderedAndProject under a total order (revenue DESC, custkey)."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    orders = read_parquet_table(spark, sf_dir, "orders")
    cust = read_parquet_table(spark, sf_dir, "customer")
    nation = read_parquet_table(spark, sf_dir, "nation")
    bal_e2 = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        .join(
            li.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("c_custkey", "c_name", bal_e2.alias("bal_e2"), F.col("n_name"))
        .agg(F.round(F.sum(_rev_e4()) / 1e4, R).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            (F.col("bal_e2") / 100.0).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name,
       round(sum({_REV_E4_SQL}) / 1e4, {R}) AS revenue,
       CAST(round(c_acctbal * 100) AS BIGINT) / 100.0 AS c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, round(c_acctbal * 100), n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20"""


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped promotion effect: share of September-1997 revenue from
    PROMO-type parts. One conditional-aggregate ratio over the
    lineitem x part join; part is SF-scaled so the join is left to AQE
    (broadcast while small, shuffle beyond) rather than forced."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    part = read_parquet_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(F.lit(0))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-09-01"))
            & (F.col("l_shipdate") < F.lit("1997-10-01"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(_rev_e4()), R).alias(
                "promo_revenue_pct"
            ),
            F.round(F.sum(_rev_e4()) / 1e4, R).alias("total_revenue"),
        )
    )


TPCH_Q14_SQL = f"""
SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_E4_SQL} ELSE 0 END)
             * 100.0 / sum({_REV_E4_SQL}), {R}) AS promo_revenue_pct,
       round(sum({_REV_E4_SQL}) / 1e4, {R}) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped top supplier: supplier(s) with the maximum H2-1997
    revenue. The max is a one-row aggregate broadcast back over the
    per-supplier rollup — never a global Window, which would shuffle
    every supplier into a single partition at scale. Ties all surface
    (deterministic: revenue is an exact integer sum)."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    supp = read_parquet_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-07-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
    )
    mx = rev.agg(F.max("rev_e4").alias("max_e4"))
    return (
        rev.join(F.broadcast(mx), F.col("rev_e4") == F.col("max_e4"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_e4") / 1e4, R).alias("total_revenue"),
        )
    )


TPCH_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_REV_E4_SQL}) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(rev_e4 / 1e4, {R}) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)"""


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped large-volume customers: orders whose total quantity
    exceeds 250, joined back to the order/customer spine. The HAVING
    rollup runs first and is small (top ~1% of orders), so AQE broadcasts
    it into the spine; top-100 under a total order."""
    li = read_parquet_table(spark, sf_dir, "lineitem")
    orders = read_parquet_table(spark, sf_dir, "orders")
    cust = read_parquet_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    price_e2 = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            (price_e2 / 100.0).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


TPCH_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
       sum_qty
FROM orders
JOIN (SELECT l_orderkey AS big_orderkey,
             CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(round(sum(l_quantity)) AS BIGINT) > 250) big
  ON o_orderkey = big_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100"""


def tpch_q22_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped global sales opportunity: per-nation count and balance
    of above-average-balance customers who never ordered. NOT EXISTS is a
    LEFT ANTI join on custkey; the above-average gate is exact integer
    arithmetic (bal_cents * n > sum_cents) so no float-mean boundary can
    disagree between engines. The one-row gate broadcasts."""
    cust = read_parquet_table(spark, sf_dir, "customer")
    orders = read_parquet_table(spark, sf_dir, "orders")
    bal_e2 = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = cust.where(F.col("c_acctbal") > 0)
    gate = pos.agg(
        F.sum(bal_e2).alias("sum_e2"), F.count(F.lit(1)).alias("n_pos")
    )
    return (
        cust.withColumn("bal_e2", bal_e2)
        .crossJoin(F.broadcast(gate))
        .where(F.col("bal_e2") * F.col("n_pos") > F.col("sum_e2"))
        .join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_e2") / 100.0).alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = """
WITH gate AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_e2,
         count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS totacctbal
FROM customer, gate
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_e2
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey"""
