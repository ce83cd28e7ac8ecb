"""Classic TPC-H decision-support queries — the full family expressible
over the driver testdata's column subset (Q2-Q22; Q1 is covered by
q01_pricing_summary, and Q12 is the one omission — its l_shipmode
column has no analog here). Queries whose reference form needs partsupp
(Q2, Q9, Q11, Q16, Q20) derive the part-supplier relation from lineitem
and keep the reference shape (correlated minima, scalar-subquery
thresholds, nested IN chains); Q4 and Q21 replace the missing
commit/receipt dates with ship-vs-order-date lateness.

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


# -- Q7: volume shipping -------------------------------------------------
# Bidirectional nation-pair trade volume by ship year. Plan: the two
# nation lookups broadcast; supplier (100 rows) and customer broadcast;
# the only shuffle is lineitem⋈orders on the order key, then a tiny
# partial agg. The OR'd pair predicate is pushed below the join by
# Catalyst as a semi-filter on each nation dimension.

_D_1998_01_01 = 883612800
_D_1999_01_01 = 915148800


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (_epoch("l_shipdate") >= _D_1996_01_01)
        & (_epoch("l_shipdate") < _D_1998_01_01)
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp_ltz"))
            .cast("long")
            .alias("l_year"),
        )
        .agg(r4(F.sum(_rev())).alias("revenue"))
    )


TPCH_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND epoch(l.l_shipdate) >= {_D_1996_01_01}
  AND epoch(l.l_shipdate) < {_D_1998_01_01}
GROUP BY 1, 2, 3
"""


# -- Q8: national market share -------------------------------------------
# Share of EUROPE's PROMO-part order volume supplied by NATION_3, by
# order year. The case-sum / sum division renders at 4dp like every
# money aggregate.


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cn = (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    sn = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (_epoch("o_orderdate") >= _D_1996_01_01)
        & (_epoch("o_orderdate") < _D_1998_01_01)
    )
    li = load(spark, sf_dir, "lineitem")
    j = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = _rev()
    return (
        j.groupBy(
            F.year(F.col("o_orderdate").cast("timestamp_ltz"))
            .cast("long")
            .alias("o_year")
        )
        .agg(
            r4(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


TPCH_Q8_SQL = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
  AND epoch(o.o_orderdate) >= {_D_1996_01_01}
  AND epoch(o.o_orderdate) < {_D_1998_01_01}
GROUP BY 1
"""


# -- Q15: top supplier ------------------------------------------------------
# Q15's CREATE VIEW revenue0 + scalar-max correlated filter, as a
# self-referencing plan: the per-supplier quarterly revenue agg is
# computed once, and the max is a single-row broadcast joined back.
# Max selection compares the ROUNDED revenue (the surface's shared
# tie-break convention) so float summation order can't flip the argmax.


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (_epoch("l_shipdate") >= _D_1996_01_01)
        & (_epoch("l_shipdate") < _D_1996_04_01)
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        r4(F.sum(_rev())).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE epoch(l_shipdate) >= {_D_1996_01_01}
    AND epoch(l_shipdate) < {_D_1996_04_01}
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue0 r JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


# -- Q17: small-quantity-order revenue --------------------------------------
# Correlated scalar subquery (per-part 0.2·avg(quantity) threshold)
# decorrelated into an agg + join — the plan Catalyst produces for the
# textbook form anyway, stated explicitly. Quantities are integral
# doubles, so the per-part avg is EXACT in both engines (integer sums
# < 2^53 are order-independent) and the strict `<` threshold cannot
# straddle an ulp.


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.2).alias("thresh")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(avg_q, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


TPCH_Q17_SQL = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


# -- Q19: discounted revenue (OR-of-conjuncts) -------------------------------
# Three (brand, size-range, quantity-range) predicate families OR'd
# together — the disjunctive-pushdown stress case: Catalyst pushes the
# shared join key and the per-branch part filters into both scans.


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(15, 40)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        r4(F.sum(_rev())).alias("revenue"),
    )


TPCH_Q19_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 15 AND 40
       AND l.l_quantity BETWEEN 20 AND 35)
"""


# -- Q22: global sales opportunity (variant) ---------------------------------
# The reference keys on phone country codes (absent here); the variant
# keeps Q22's operator shape — scalar-subquery threshold + NOT EXISTS
# anti-join — gating on "above-average-balance customers with no order
# since 1999". Plan: the avg is a single-row broadcast, the anti-join
# is a left-anti on the customer key.


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(_epoch("o_orderdate") >= _D_1999_01_01)
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = f"""
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND epoch(o.o_orderdate) >= {_D_1999_01_01})
GROUP BY c.c_nationkey
"""


# -- Q2 (variant): minimum-cost supplier ------------------------------------
# The schema has no partsupp, so the (part, supplier) "supply cost" is
# derived from lineitem as the minimum observed unit price — rounded to
# 4dp BEFORE the MIN so the reduction is order-independent. Shape
# preserved from the reference Q2: region-restricted suppliers, a
# correlated per-part minimum (window MIN here — the decorrelation
# Catalyst produces for the textbook scalar subquery), and a top-20 by
# account balance with a full tie-break.

_D_1995_01_01 = 788918400


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    uc = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4)).alias(
            "cost"
        )
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    cand = (
        uc.join(F.broadcast(eu), uc.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            uc.l_partkey == F.col("p_partkey"),
        )
        .withColumn(
            "mc", F.min("cost").over(Window.partitionBy("p_partkey"))
        )
        .filter(F.col("cost") == F.col("mc"))
    )
    w = Window.orderBy(
        F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
    )


TPCH_Q2_SQL = """
WITH uc AS (
  SELECT l_partkey, l_suppkey,
         MIN(ROUND(l_extendedprice / l_quantity, 4)) AS cost
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cand AS (
  SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_name, uc.cost,
         MIN(uc.cost) OVER (PARTITION BY p.p_partkey) AS mc
  FROM uc
  JOIN eu ON uc.l_suppkey = eu.s_suppkey
  JOIN part p ON uc.l_partkey = p.p_partkey
  WHERE p.p_type = 'SMALL'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey) AS rn
  FROM cand WHERE cost = mc
) WHERE rn <= 20
"""


# -- Q9 (variant): product-type profit by nation and year --------------------
# No ps_supplycost, so per-line profit is revenue minus a 10%-of-retail
# cost proxy. The calendar year is replaced by a 365-day epoch bin from
# 1995-01-01 — deterministic in both engines with no timezone or
# calendar dependence. Plan: part + supplier→nation broadcast; the one
# shuffle is lineitem⋈orders on the order key.


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor((_epoch("o_orderdate") - _D_1995_01_01) / 31536000)
        .cast("bigint")
        .alias("yr"),
    )
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name", "yr")
        .agg(r4(F.sum(amount)).alias("profit"))
    )


TPCH_Q9_SQL = f"""
SELECT n.n_name, CAST(floor((epoch(o.o_orderdate) - {_D_1995_01_01}) / 31536000)
           AS BIGINT) AS yr,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity), 4) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY 1, 2
"""


# -- Q11 (variant): important parts vs a global-share threshold ---------------
# The reference's HAVING-against-a-scalar-subquery shape. Part value is
# computed in INTEGER CENTS (round(price*100) cast to int64, times the
# integral quantity) so both the per-part sums and the global total are
# exact and the strict `>` threshold cannot straddle a float ulp —
# value*1500 > total keeps parts ≥1.33× the mean share.


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint")
    v = li.groupBy("l_partkey").agg(F.sum(cents).alias("value_cents"))
    total = v.agg(F.sum("value_cents").alias("total_cents"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1500 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


TPCH_Q11_SQL = """
WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, value_cents FROM v
WHERE value_cents * 1500 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
"""


# -- Q16 (variant): supplier-relationship counts ------------------------------
# Distinct (part, supplier) pairs come from lineitem in place of
# partsupp; the complaint-supplier NOT IN becomes an anti-join on a
# name pattern. COUNT(DISTINCT supplier) per (brand, type, size) over
# an 8-value size IN-list, excluding one brand and one type prefix.


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_name").endswith("7")
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            pairs.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY 1, 2, 3
"""


# -- Q20 (variant): promotion-candidate suppliers -----------------------------
# The nested-IN chain: suppliers who, for some 'red' part they supply,
# shipped more than half of that part's all-time quantity inside
# 1996-Q1 (min 40 units so singleton pairs don't trivially qualify).
# Quantities are integral doubles summed as BIGINT — the 2·qw > tot
# comparison is exact integer arithmetic in both engines.


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    li = load(spark, sf_dir, "lineitem")
    in_win = (_epoch("l_shipdate") >= _D_1996_01_01) & (
        _epoch("l_shipdate") < _D_1996_04_01
    )
    qty = F.col("l_quantity").cast("bigint")
    agg = (
        li.join(
            F.broadcast(red.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_win, qty).otherwise(F.lit(0))).alias("qw"),
            F.sum(qty).alias("tot"),
        )
        .filter((F.col("tot") >= 40) & (2 * F.col("qw") > F.col("tot")))
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation")
    return (
        load(spark, sf_dir, "supplier")
        .join(agg, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


TPCH_Q20_SQL = f"""
WITH agg AS (
  SELECT l_suppkey, l_partkey,
         SUM(CASE WHEN epoch(l_shipdate) >= {_D_1996_01_01}
                   AND epoch(l_shipdate) < {_D_1996_04_01}
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qw,
         SUM(CAST(l_quantity AS BIGINT)) AS tot
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY 1, 2
)
SELECT s.s_name, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM agg WHERE tot >= 40 AND 2 * qw > tot)
"""


# -- Q21 (variant): suppliers who kept orders waiting --------------------------
# Lateness = shipped more than 90 days after the order date, over
# finished ('F') orders. The textbook EXISTS / NOT-EXISTS pair is
# decorrelated into one per-order aggregate — nsupp ≥ 2 (some other
# supplier touched the order) and nlate = 1 (every late line is this
# supplier's) — one shuffle instead of a triple self-join; the oracle
# keeps the correlated form, cross-validating the decorrelation.


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load(spark, sf_dir, "lineitem")
    base = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (_epoch("l_shipdate") > _epoch("o_orderdate") + 7776000).alias("late"),
    )
    per_order = base.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "nlate"
        ),
    )
    waiting = (
        base.filter(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.orderBy(F.desc("numwait"), F.asc("s_name"))
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == F.col("s_suppkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("s_name", "numwait")
    )


TPCH_Q21_SQL = """
WITH numwait AS (
  SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
  FROM lineitem l1
  JOIN orders o ON l1.l_orderkey = o.o_orderkey
  JOIN supplier s ON l1.l_suppkey = s.s_suppkey
  WHERE o.o_orderstatus = 'F'
    AND epoch(l1.l_shipdate) > epoch(o.o_orderdate) + 7776000
    AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND epoch(l3.l_shipdate) > epoch(o.o_orderdate) + 7776000)
  GROUP BY s.s_name
)
SELECT s_name, numwait FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY numwait DESC, s_name) AS rn
  FROM numwait
) WHERE rn <= 20
"""


QUERIES = {
    "tpch_q2": tpch_q2,
    "tpch_q9": tpch_q9,
    "tpch_q11": tpch_q11,
    "tpch_q16": tpch_q16,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q3": tpch_q3,
    "tpch_q4": tpch_q4,
    "tpch_q6": tpch_q6,
    "tpch_q5": tpch_q5,
    "tpch_q10": tpch_q10,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q15": tpch_q15,
    "tpch_q17": tpch_q17,
    "tpch_q19": tpch_q19,
    "tpch_q22": tpch_q22,
}

ORACLES = {
    "tpch_q2": TPCH_Q2_SQL,
    "tpch_q9": TPCH_Q9_SQL,
    "tpch_q11": TPCH_Q11_SQL,
    "tpch_q16": TPCH_Q16_SQL,
    "tpch_q20": TPCH_Q20_SQL,
    "tpch_q21": TPCH_Q21_SQL,
    "tpch_q3": TPCH_Q3_SQL,
    "tpch_q4": TPCH_Q4_SQL,
    "tpch_q6": TPCH_Q6_SQL,
    "tpch_q5": TPCH_Q5_SQL,
    "tpch_q10": TPCH_Q10_SQL,
    "tpch_q13": TPCH_Q13_SQL,
    "tpch_q14": TPCH_Q14_SQL,
    "tpch_q18": TPCH_Q18_SQL,
    "tpch_q7": TPCH_Q7_SQL,
    "tpch_q8": TPCH_Q8_SQL,
    "tpch_q15": TPCH_Q15_SQL,
    "tpch_q17": TPCH_Q17_SQL,
    "tpch_q19": TPCH_Q19_SQL,
    "tpch_q22": TPCH_Q22_SQL,
}
