"""Classic TPC-H decision-support queries (the subset expressible over
the driver testdata's column subset) — the recognizable relational
workload family: Q3 shipping priority, Q5 local supplier volume, Q10
returned-item reporting, Q13 customer order distribution, Q14 promo
revenue share, Q18 large-volume customers.

Determinism conventions shared with the rest of the surface: date
pivots are UTC epoch-second literals compared on the timestamp's epoch
(timezone-independent in both engines), money aggregates render at 4dp,
and every top-k orders by the ROUNDED measure with a key tie-break so
float summation order can't reorder near-ties across engines.

Scale notes: these are exactly the shapes Catalyst is built for — all
filters reach the scans, dimension sides broadcast (nation/region/
part), fact-fact joins shuffle on the key with AQE, and every agg is
partial-map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import load, r4

# UTC epoch pivots
_D_1996_01_01 = 820454400
_D_1996_03_01 = 825638400
_D_1996_04_01 = 828316800
_D_1996_06_30 = 836092800
_D_1997_01_01 = 852076800


def _epoch(col: str) -> F.Column:
    return F.col(col).cast("timestamp_ltz").cast("long")


def _rev() -> F.Column:
    # built lazily — classic-mode F.col needs an active SparkContext,
    # so a module-level Column would break import-before-session
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# -- Q3: shipping priority -------------------------------------------------


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        _epoch("o_orderdate") < _D_1996_06_30
    )
    li = load(spark, sf_dir, "lineitem").filter(
        _epoch("l_shipdate") > _D_1996_06_30
    )
    rev = (
        li.join(
            orders.join(
                cust.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            _epoch("o_orderdate").alias("o_epoch"),
            "o_orderpriority",
        )
        .agg(r4(F.sum(_rev())).alias("revenue"))
    )
    w = Window.orderBy(
        F.desc("revenue"), F.asc("o_epoch"), F.asc("l_orderkey")
    )
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("l_orderkey", "o_epoch", "o_orderpriority", "revenue")
    )


TPCH_Q3_SQL = f"""
WITH rev AS (
  SELECT l.l_orderkey,
         CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_epoch,
         o.o_orderpriority,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND epoch(o.o_orderdate) < {_D_1996_06_30}
    AND epoch(l.l_shipdate) > {_D_1996_06_30}
  GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_epoch, o_orderpriority, revenue FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_epoch, l_orderkey)
         AS rn FROM rev
) WHERE rn <= 10
"""


# -- Q4 (variant): order priority checking ------------------------------------
# The reference Q4 gates on l_commitdate < l_receiptdate (columns this
# schema lacks); the variant keeps Q4's shape — a left-semi EXISTS
# against lineitem — gating on "some line shipped after the order
# date", and counts orders per priority.


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (_epoch("o_orderdate") >= _D_1996_01_01)
        & (_epoch("o_orderdate") < _D_1996_04_01)
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(_epoch("l_shipdate") > _epoch("o_orderdate"))
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


TPCH_Q4_SQL = f"""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE epoch(o.o_orderdate) >= {_D_1996_01_01}
  AND epoch(o.o_orderdate) < {_D_1996_04_01}
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND epoch(l.l_shipdate) > epoch(o.o_orderdate))
GROUP BY o.o_orderpriority
"""


# -- Q6: forecasting revenue change -------------------------------------------


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (_epoch("l_shipdate") >= _D_1996_01_01)
        & (_epoch("l_shipdate") < _D_1997_01_01)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


TPCH_Q6_SQL = f"""
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE epoch(l_shipdate) >= {_D_1996_01_01}
  AND epoch(l_shipdate) < {_D_1997_01_01}
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# -- Q5: local supplier volume ----------------------------------------------


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (_epoch("o_orderdate") >= _D_1996_01_01)
        & (_epoch("o_orderdate") < _D_1997_01_01)
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(r4(F.sum(_rev())).alias("revenue"))
    )


TPCH_Q5_SQL = f"""
SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
       AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND epoch(o.o_orderdate) >= {_D_1996_01_01}
  AND epoch(o.o_orderdate) < {_D_1997_01_01}
GROUP BY n.n_name
"""


# -- Q10: returned item reporting -------------------------------------------


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (_epoch("o_orderdate") >= _D_1996_01_01)
        & (_epoch("o_orderdate") < _D_1996_04_01)
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", r4(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
        )
        .agg(r4(F.sum(_rev())).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
    )


TPCH_Q10_SQL = f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 4) AS c_acctbal,
         n.n_name,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND epoch(o.o_orderdate) >= {_D_1996_01_01}
    AND epoch(o.o_orderdate) < {_D_1996_04_01}
  GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, c_name, c_acctbal, n_name, revenue FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rn
  FROM rev
) WHERE rn <= 20
"""


# -- Q13: customer order-count distribution ----------------------------------


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
    )


TPCH_Q13_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""


# -- Q14: promotion effect --------------------------------------------------


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (_epoch("l_shipdate") >= _D_1996_03_01)
        & (_epoch("l_shipdate") < _D_1996_04_01)
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type").startswith("PROMO"), _rev()).otherwise(0.0)
    return j.agg(
        r4(100.0 * F.sum(promo) / F.sum(_rev())).alias("promo_revenue_pct"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


TPCH_Q14_SQL = f"""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN l.l_extendedprice * (1 - l.l_discount)
                    ELSE 0.0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
         AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE epoch(l.l_shipdate) >= {_D_1996_03_01}
  AND epoch(l.l_shipdate) < {_D_1996_04_01}
"""


# -- Q18: large volume customers ----------------------------------------------

_Q18_QTY = 250


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_QTY)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            _epoch("o_orderdate").alias("o_epoch"),
            r4(F.col("o_totalprice")).alias("o_totalprice"),
            r4(F.col("sum_qty")).alias("sum_qty"),
        )
    )


TPCH_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {_Q18_QTY}
)
SELECT c.c_custkey, c.c_name, b.l_orderkey AS o_orderkey,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_epoch,
       ROUND(o.o_totalprice, 4) AS o_totalprice,
       ROUND(b.sum_qty, 4) AS sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


QUERIES = {
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q6": tpch_q6,
    "tpch_q5": tpch_q5,
    "tpch_q10": tpch_q10,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
}

ORACLES = {
    "tpch_q3": TPCH_Q3_SQL,
    "tpch_q4": TPCH_Q4_SQL,
    "tpch_q6": TPCH_Q6_SQL,
    "tpch_q5": TPCH_Q5_SQL,
    "tpch_q10": TPCH_Q10_SQL,
    "tpch_q13": TPCH_Q13_SQL,
    "tpch_q14": TPCH_Q14_SQL,
    "tpch_q18": TPCH_Q18_SQL,
}
