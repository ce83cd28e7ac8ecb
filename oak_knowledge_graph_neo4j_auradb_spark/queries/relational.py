"""Relational / query-surface operators (SURVEY.md §2.2-§2.8) expressed
over the driver's TPC-H-ish tables.

These re-express the reference's operator inventory — filters (P4/P5),
multi-hop traversal joins (J6), composite-key joins (J1), first-seen
dedup (A1), explode (J3/E2), aggregations incl. HAVING/top-k (A6, §2.7),
union (§2.8), computed booleans (F8), template IDs (F2), regex
normalization (F1/J2), type casts (§1.2) — as declarative DataFrame
plans so Catalyst gets pushdown/pruning/broadcast for free.

Every callable takes ``(spark, sf_dir)``; every aggregate/computed
column is aliased identically in the DataFrame plan and the DuckDB
oracle SQL (driver hash-compares by sorted column name).

Scale notes (100 TB posture) are on each query; the common themes:
dimension sides broadcast, aggregations are partial (map-side combine),
first-seen dedup is a min-struct aggregate rather than a window so the
shuffle carries distinct keys only, and all filters/projections sit
directly on the scan so they push into the parquet/Iceberg reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import TOKENS_SQL, load, r4


# --------------------------------------------------------------------------
# q01 — aggregation pipeline (TPC-H Q1 shape; SURVEY §2.4 A6)
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy agg with partial (map-side) combine; only 6 of 11 lineitem
    columns are read (column pruning into the scan)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_price"
            ),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — top-k (ORDER BY + LIMIT → TakeOrderedAndProject; SURVEY §2.7)
# --------------------------------------------------------------------------
def q02_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k never sorts globally: per-partition heaps + k-row merge on
    the driver (TakeOrderedAndProject) — O(n) scan at any scale.
    Deterministic tiebreak on the key."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", r4(F.col("o_totalprice")).alias("totalprice"))
    )


Q02_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# q03 — multi-hop traversal join (Cypher pattern ≅ J6, 4 hops)
# --------------------------------------------------------------------------
def q03_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→nation→customer→orders→lineitem: the graph-traversal shape
    of the reference's query surface (oak_curriculum_graph_documentation.md
    §6 pattern 6). region/nation are broadcast (no shuffle of the fact
    side); the two big joins shuffle on their keys once each."""
    region = F.broadcast(load(spark, sf_dir, "region"))
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lineitems"),
            r4(F.sum("l_quantity")).alias("sum_qty"),
        )
    )


Q03_SQL = """
SELECT r_name,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_lineitems,
       ROUND(SUM(l_quantity), 4) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# q04 — predicate stack: equality + membership + CONTAINS (P4/P5/P9)
# --------------------------------------------------------------------------
def q04_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates land in PushedFilters on the parquet scan."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_type") == "ECONOMY")
        & F.col("p_size").isin(1, 5, 9, 13)
        & F.col("p_name").contains("a")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


Q04_SQL = """
SELECT p_partkey, p_name, p_brand, p_size
FROM part
WHERE p_type = 'ECONOMY' AND p_size IN (1, 5, 9, 13) AND p_name LIKE '%a%'
"""


# --------------------------------------------------------------------------
# q05 — composite-key join (J1: the reference's multi-source merge)
# --------------------------------------------------------------------------
def q05_composite_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join on a composite key (partkey, suppkey) against a derived
    dimension — the reference's (unit_slug, programme_slug_by_year)
    merge. The dim is aggregated *before* the join (dedup-before-join,
    SURVEY §4) and broadcasts; AQE skew-join would split a hot key."""
    li = load(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    joined = li.join(
        F.broadcast(dim), on=["l_partkey", "l_suppkey"], how="left"
    ).filter(F.col("l_extendedprice") == F.col("min_price"))
    return joined.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_min_lines"),
        r4(F.sum("min_price")).alias("sum_min_price"),
        F.max("n_lines").alias("max_group_lines"),
    )


Q05_SQL = """
WITH dim AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS min_price,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT li.l_partkey,
       COUNT(*) AS n_min_lines,
       ROUND(SUM(dim.min_price), 4) AS sum_min_price,
       MAX(dim.n_lines) AS max_group_lines
FROM lineitem li
LEFT JOIN dim ON li.l_partkey = dim.l_partkey AND li.l_suppkey = dim.l_suppkey
WHERE li.l_extendedprice = dim.min_price
GROUP BY li.l_partkey
"""


# --------------------------------------------------------------------------
# q06 — deterministic first-seen dedup (A1/A2: the engine's core trick)
# --------------------------------------------------------------------------
def q06_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First row per key under an explicit total order, as a min-struct
    aggregate: map-side combine collapses duplicates before the
    exchange, so the shuffle carries distinct keys — a row_number window
    would shuffle every row (mapper.py module docstring)."""
    c = load(spark, sf_dir, "customer")
    agg = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.min(F.struct("c_custkey", "c_name")).alias("_w")
    )
    return agg.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("_w.c_custkey").alias("first_custkey"),
        F.col("_w.c_name").alias("first_name"),
    )


Q06_SQL = """
SELECT c_nationkey, c_mktsegment,
       MIN(c_custkey) AS first_custkey,
       ARG_MIN(c_name, c_custkey) AS first_name
FROM customer GROUP BY c_nationkey, c_mktsegment
"""


# --------------------------------------------------------------------------
# q07 — explode / flatten (J3/E2) + top-k tokens
# --------------------------------------------------------------------------
def q07_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split→explode→count: the reference's array explode before joins.
    The count is partial-aggregated per partition before the shuffle."""
    from .common import tokens

    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


Q07_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS token
      FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# --------------------------------------------------------------------------
# q08 — grouped HAVING (Cypher `WHERE count(..) < n`, P9)
# --------------------------------------------------------------------------
def q08_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r4(F.sum("o_totalprice")).alias("sum_price"),
        )
        .filter(F.col("n_orders") >= 15)
    )


Q08_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS sum_price
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
"""


# --------------------------------------------------------------------------
# q09 — union (SURVEY §2.8 implicit union / unionByName)
# --------------------------------------------------------------------------
def q09_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_name").alias("name"),
        r4(F.col("c_acctbal")).alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        r4(F.col("s_acctbal")).alias("acctbal"),
    )
    return c.unionByName(s)


Q09_SQL = """
SELECT 'customer' AS kind, c_name AS name, ROUND(c_acctbal, 4) AS acctbal FROM customer
UNION ALL
SELECT 'supplier' AS kind, s_name AS name, ROUND(s_acctbal, 4) AS acctbal FROM supplier
"""


# --------------------------------------------------------------------------
# q10 — anti join (loader MATCH-miss complement, J5) over broadcast keys
# --------------------------------------------------------------------------
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders. The key set broadcasts; at 100 TB the
    same plan runs as a shuffled left-anti with AQE."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    return c.join(
        F.broadcast(o), c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


Q10_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --------------------------------------------------------------------------
# q11 — window rank top-n per group (query-surface `collect(...)[0..n]`)
# --------------------------------------------------------------------------
def q11_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("o_custkey", "o_orderkey", r4(F.col("o_totalprice")).alias("totalprice"), "rank")
    )


Q11_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS totalprice, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders)
WHERE rank <= 2
"""


# --------------------------------------------------------------------------
# q12 — count(DISTINCT) + sorted collect_set (A6)
# --------------------------------------------------------------------------
def q12_collect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`collect(DISTINCT x)` made deterministic via sort_array — the
    Cypher list-collection aggregations of the query surface."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            # DuckDB's array_to_string renders an empty/all-NULL list
            # as NULL, not '' (deg_nulls sweep)
            F.when(
                F.size(F.collect_set("c_mktsegment")) > 0,
                F.concat_ws(
                    ",", F.sort_array(F.collect_set("c_mktsegment"))
                ),
            ).alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


Q12_SQL = """
SELECT n_name,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q13 — synthetic template ID (F2) with null-guard
# --------------------------------------------------------------------------
def q13_synthetic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`"{a}-{b}"` template → None if any component is null
    (data_cleaner.py:337-368 semantics)."""
    c = load(spark, sf_dir, "customer")
    synth = F.when(
        F.col("c_mktsegment").isNull() | F.col("c_nationkey").isNull(),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(F.lower("c_mktsegment"), F.lit("-"), F.col("c_nationkey").cast("string"))
    )
    return c.select("c_custkey", synth.alias("synthetic_id"))


Q13_SQL = """
SELECT c_custkey,
       CASE WHEN c_mktsegment IS NULL OR c_nationkey IS NULL THEN NULL
            ELSE lower(c_mktsegment) || '-' || CAST(c_nationkey AS VARCHAR)
       END AS synthetic_id
FROM customer
"""


# --------------------------------------------------------------------------
# q14 — regex key normalization (F1/J2: `-<digits>` suffix semantics)
# --------------------------------------------------------------------------
def q14_regex_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.withColumn(
            "brand_num",
            F.regexp_extract("p_brand", r"^Brand#(\d+)$", 1).cast("long"),
        )
        .groupBy("brand_num")
        .agg(F.count(F.lit(1)).alias("n_parts"), r4(F.avg("p_retailprice")).alias("avg_price"))
    )


Q14_SQL = """
SELECT CAST(regexp_extract(p_brand, '^Brand#(\\d+)$', 1) AS BIGINT) AS brand_num,
       COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 4) AS avg_price
FROM part GROUP BY 1
"""


# --------------------------------------------------------------------------
# q15 — the reference's int(float(x)) cast chain (§1.2)
# --------------------------------------------------------------------------
def q15_cast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'104.0' → 104: string → double → long, the tolerant int cast the
    reference needed for pandas-mangled CSV values
    (schema_mapper.py:797-799)."""
    li = load(spark, sf_dir, "lineitem")
    qty_str = F.col("l_quantity").cast("string")
    return (
        li.select(qty_str.cast("double").cast("long").alias("qty_int"))
        .groupBy("qty_int")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q15_SQL = """
SELECT CAST(CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS BIGINT) AS qty_int,
       COUNT(*) AS n
FROM lineitem GROUP BY 1
"""


# --------------------------------------------------------------------------
# q16 — string transforms (F4/F5: case/trim/prefix)
# --------------------------------------------------------------------------
def q16_string_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.upper(F.trim("s_name")).alias("upper_name"),
        F.concat(F.lit("SUP:"), F.lower("s_name")).alias("prefixed"),
    )


Q16_SQL = """
SELECT s_suppkey, upper(trim(s_name)) AS upper_name,
       'SUP:' || lower(s_name) AS prefixed
FROM supplier
"""


# --------------------------------------------------------------------------
# q17 — empty-aware computed boolean (F8/P7) + JSON field access (F9)
# --------------------------------------------------------------------------
def q17_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object on the event props payload + the engine's
    empty-value semantics ('', '{}', '[]' ⇒ empty)."""
    e = load(spark, sf_dir, "events")
    t = F.trim(F.col("props"))
    is_empty = (
        F.col("props").isNull() | (t == "") | t.rlike(r"^(\[\s*\]|\{\s*\})$")
    )
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", is_empty.alias("props_empty"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("props_empty"), 1).otherwise(0)).alias("n_empty"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_k"),
        )
    )


Q17_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN props IS NULL OR trim(props) = ''
                 OR regexp_matches(trim(props), '^(\\[\\s*\\]|\\{\\s*\\})$')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q18 — tumbling-window aggregation (streaming-shaped batch; SURVEY §2.9)
# --------------------------------------------------------------------------
def q18_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window per event type. The identical expression
    runs under Structured Streaming (`streaming/jobs.py`) with a
    watermark; here it is the batch twin the oracle can check."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
    )


Q18_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q19 — sessionization (gap-based; stateful-streaming twin)
# --------------------------------------------------------------------------
def q19_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user via lag + running sum — the batch
    twin of `applyInPandasWithState` sessionization. One shuffle on
    user_id; both windows reuse the same partitioning."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ; session TZ is UTC so the
    # LTZ round-trip is exact and matches DuckDB's epoch()
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch, 1).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q19_SQL = """
WITH g AS (
  -- floor(epoch) truncates to whole seconds exactly as Spark's
  -- timestamp→long cast does (floorDiv of micros); bare epoch() keeps
  -- fractional seconds and can classify a gap straddling 1800 s
  -- differently
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), s AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, MAX(session_id) AS n_sessions,
       COUNT(*) AS n_events
FROM s GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q37 — exact grouped percentiles: Spark's `percentile` (exact, linear
# interpolation at p*(n-1)) ≡ DuckDB `quantile_cont`. The Catalyst
# ObjectHashAggregate path — exact quantiles shuffle one buffer per
# group, not the full column; the approximate scale path is
# `percentile_approx` (KLL-like sketch, mergeable map-side).
# --------------------------------------------------------------------------


def q37_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
    return (
        li.groupBy("l_returnflag")
        .agg(p.alias("p"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p25"),
            F.round(F.col("p")[1], 4).alias("p50"),
            F.round(F.col("p")[2], 4).alias("p75"),
        )
    )


Q37_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q38 — as-of join: for every order, the latest event of the same user
# at-or-before the order date. Spark lacks a native as-of join; the
# scalable formulation is union-then-window: tag both sides, sort each
# user's timeline once, and carry event attributes forward with
# last_value(ignoreNulls). ONE shuffle on the join key (vs the naive
# inequality join's per-key explosion); windows reuse the exchange.
# The DuckDB twin uses its native ASOF LEFT JOIN, so this checks our
# union-window algorithm against an independent as-of implementation.
# Ties (same user, same ts) are pre-collapsed to max event_id on both
# sides so the match is deterministic.
# --------------------------------------------------------------------------


def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    evd = (
        ev.groupBy(F.col("user_id").alias("uid"), "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("s"))
        .select(
            "uid",
            "ts",
            F.lit(0).alias("side"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.value").alias("value"),
            F.col("ts").alias("ets"),
            F.lit(None).cast("long").alias("o_orderkey"),
        )
    )
    right = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("timestamp").alias("ets"),
        "o_orderkey",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        evd.unionByName(right)
        .select(
            "side",
            "o_orderkey",
            F.last("event_id", ignorenulls=True).over(w).alias("ev_id"),
            F.last("ets", ignorenulls=True).over(w).alias("ev_ts"),
            r4(F.last("value", ignorenulls=True).over(w)).alias("ev_value"),
        )
        .filter(F.col("side") == 1)
        .drop("side")
    )


Q38_SQL = """
WITH evd AS (
  SELECT user_id AS uid, ts,
         MAX(event_id) AS event_id,
         arg_max(value, event_id) AS value
  FROM events GROUP BY user_id, ts
)
SELECT o.o_orderkey,
       e.event_id AS ev_id,
       e.ts AS ev_ts,
       ROUND(e.value, 4) AS ev_value
FROM orders o
ASOF LEFT JOIN evd e
  ON o.o_custkey = e.uid AND o.o_orderdate >= e.ts
"""


# --------------------------------------------------------------------------
# q39 — ROLLUP subtotals (grouping-sets family; SURVEY §2.4 notes the
# reference has none — engine addition). Spark plans a single Expand +
# hash aggregate: one shuffle carries all three grouping levels.
# grouping_id() and DuckDB GROUPING(a, b) use the same bit order
# (leftmost column = most significant bit).
# --------------------------------------------------------------------------


def q39_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    if li.isEmpty():
        # SQL ROLLUP's () grouping set renders the grand-total row even
        # over empty input (like a global aggregate); Spark's rollup
        # renders nothing — emit the standard row (deg_empty sweep)
        return spark.createDataFrame(
            [(None, None, 3, None, 0)],
            "l_returnflag string, l_linestatus string, gid long, "
            "sum_price double, n long",
        )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        r4(F.sum("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


Q39_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       ROUND(SUM(l_extendedprice), 4) AS sum_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q40 — top-k per group with ranking + lag (window-function family).
# Deterministic tie-break on o_orderkey. Spark: one shuffle on the
# partition key; row_number and lag share the same window frame, so a
# single sort serves both.
# --------------------------------------------------------------------------


def q40_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            r4(F.col("o_totalprice")).alias("price"),
            r4(F.lag("o_totalprice").over(w)).alias("prev_price"),
        )
        .filter(F.col("rn") <= 3)
    )


Q40_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
         ROUND(o_totalprice, 4) AS price,
         ROUND(LAG(o_totalprice) OVER w, 4) AS prev_price
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# q44 — approximate distinct counting (HyperLogLog++; SURVEY §2.4 notes
# the reference has no approx-distinct — engine addition). The sketch
# is MERGEABLE: map-side partial sketches combine at reduce, so the
# shuffle carries fixed-size sketch bytes per group instead of the
# distinct-key set — the scale path when countDistinct's exact
# expansion won't fit. HLL++ is deterministic for given data (no RNG),
# so the error-bound CLAIM is oracle-checkable: the query emits the
# exact count plus a boolean "estimate within 3%", and the DuckDB twin
# asserts exact + TRUE. A hash match certifies the sketch's accuracy
# contract, not a lucky value.
# --------------------------------------------------------------------------


def q44_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_approx") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                <= 0.03
            ).alias("within_3pct"),
        )
    )


Q44_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_3pct
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q45 — quantile sketch (percentile_approx, a KLL-style mergeable
# sketch): the scale path q37's exact percentile can't take (exact
# shuffles every group's value buffer; the sketch is fixed-size and
# combines map-side). Same oracle trick as q44: the sketch is
# deterministic for given data, so emit the EXACT median plus a boolean
# "sketch within 1% of exact", and the twin asserts exact + TRUE — a
# hash match certifies the accuracy contract.
# --------------------------------------------------------------------------


def q45_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5D)").alias("_exact"),
            F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("_approx"),
        )
        .select(
            "l_linestatus",
            r4(F.col("_exact")).alias("p50_exact"),
            # vacuously true when BOTH sides are NULL (a group with
            # zero non-null prices — the oracle's literal TRUE);
            # try_divide guards an exact-zero median
            F.when(
                F.col("_exact").isNull(), F.col("_approx").isNull()
            )
            .otherwise(
                F.abs(
                    F.try_divide(
                        F.col("_approx") - F.col("_exact"), F.col("_exact")
                    )
                )
                <= 0.01
            )
            .alias("within_1pct"),
        )
    )


Q45_SQL = """
SELECT l_linestatus,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
       TRUE AS within_1pct
FROM lineitem GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# q46 — pivot (long → wide): order counts per status × priority.
# Spark's `pivot` with an EXPLICIT value list compiles to conditional
# aggregation in ONE pass / one shuffle — the same shape the oracle
# spells out. (Without the list Spark runs an extra distinct job to
# discover columns — always pin the list at scale.)
# --------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q46_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(f"p{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    return piv.select(*cols)


Q46_SQL = """
SELECT o_orderstatus,
       CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
       CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
       CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
       CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4,
       CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q47 — anti-join (NOT EXISTS): customers with no orders, counted per
# nation. left_anti plans as a broadcast/shuffled hash anti-join over
# distinct keys — the orders side is pre-aggregated to its key set by
# the join itself; no fact-row fan-out. Oracle is the NOT EXISTS form
# DuckDB decorrelates to the same shape.
# --------------------------------------------------------------------------


def q47_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order (every customer has *some* order
    in this corpus, so the unfiltered anti-join would be a trivial
    0-row check); the filter sits below the anti-join and pushes into
    the orders scan."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    no_orders = cust.join(urgent, "c_custkey", "left_anti")
    return (
        no_orders.join(F.broadcast(nation), no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


Q47_SQL = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY n.n_name
"""


# --------------------------------------------------------------------------
# q48 — correlated scalar subquery, decorrelated: orders priced above
# 2× their customer's average. The idiomatic Spark plan is the manual
# decorrelation — ONE aggregate over orders + ONE join back — exactly
# what an optimizer turns the correlated form into (the oracle uses the
# same decorrelated CTE). The threshold predicate is evaluated in EXACT
# decimal arithmetic (`price * n > 2 * sum`) because double AVG is
# summation-order-dependent — the two engines disagree in the 4th
# decimal on some groups, which would flip boundary rows. The reported
# average is likewise exact fixed-point: avg in 1e-4 units via the
# integer half-up division (2a + b) div (2b) — double division ties
# (e.g. sum/8 landing exactly on .xxxx5) round differently in Java's
# BigDecimal-of-shortest-string vs DuckDB's true-binary rounding.
# --------------------------------------------------------------------------


def q48_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    cagg = orders.groupBy("o_custkey").agg(
        F.sum(dec).alias("tot"), F.count(F.lit(1)).alias("n")
    )
    avg_e4 = F.expr(
        "(2 * CAST(tot * 100 AS BIGINT) * 100 + n) DIV (2 * n)"
    )
    return (
        orders.join(cagg, "o_custkey")
        .filter(dec * F.col("n") > 2 * F.col("tot"))
        .select(
            "o_orderkey",
            "o_custkey",
            r4(F.col("o_totalprice")).alias("price"),
            avg_e4.alias("cust_avg_e4"),
        )
    )


Q48_SQL = """
WITH cagg AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey,
       ROUND(o.o_totalprice, 4) AS price,
       (2 * CAST(c.tot * 100 AS BIGINT) * 100 + c.n) // (2 * c.n)
           AS cust_avg_e4
FROM orders o JOIN cagg c ON o.o_custkey = c.o_custkey
WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * c.n > 2 * c.tot
"""


# --------------------------------------------------------------------------
# q49 — date/time function family (SURVEY §2.6 notes the reference has
# no date arithmetic — engine addition): truncation to month, parts
# (year/quarter/day-of-week), and an interval shift. Sessions run in
# UTC (session.py pins spark.sql.session.timeZone) so both engines
# truncate the same wall clock. Spark dayofweek is 1=Sunday; DuckDB
# dayofweek is 0=Sunday — the oracle maps dow+1 to align.
# --------------------------------------------------------------------------


def q49_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("month", "ts").alias("month"),
            F.quarter("ts").cast("long").alias("qtr"),
            F.dayofweek("ts").cast("long").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias(
                "max_ts_plus_90m"
            ),
        )
    )


Q49_SQL = """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
       CAST(quarter(ts) AS BIGINT) AS qtr,
       CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(ts + INTERVAL 90 MINUTE) AS max_ts_plus_90m
FROM events
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q56 — CUBE grouping sets (completes q39's ROLLUP into the full
# family): all four (returnflag, linestatus) subtotal combinations in
# ONE pass — a single Expand (4 replicas per row, map-side) feeding one
# partial+final aggregate, not four scans. grouping_id disambiguates
# a NULL data value from a NULL subtotal marker; Spark's bit order
# matches DuckDB's GROUPING(a, b) (q39 established the convention).
# --------------------------------------------------------------------------


def q56_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    if li.isEmpty():
        # CUBE's () grouping set: grand-total row survives empty input
        # (q39's ROLLUP note)
        return spark.createDataFrame(
            [(None, None, 3, None, 0)],
            "l_returnflag string, l_linestatus string, gid long, "
            "sum_qty long, n long",
        )
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


Q56_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q57 — rank-to-distribution window family (ntile / percent_rank /
# cume_dist): quartile assignment and relative standing per order
# within its priority class. The ORDER BY carries an explicit unique
# tie-break (totalprice, orderkey) because ntile over a tied prefix is
# engine-order-dependent — without it the two engines may split ties
# into different buckets. All three functions share ONE window sort:
# one shuffle on the partition key, one sort, three projections.
# --------------------------------------------------------------------------


def q57_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


Q57_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


# --------------------------------------------------------------------------
# q58 — bivariate statistics family (corr / covar_samp / stddev_samp):
# quantity-price relationship per return flag. Both engines maintain
# Welford-style running moments merged across partials; the MERGE
# ORDER differs (32 Spark partitions vs DuckDB's morsel order), so
# results agree only to numerical-analysis error, not bit-exactly.
# Rounding is sized to the error bound, not a fixed 6dp: corr is
# dimensionless (error ~1e-12) → 6dp; stddev/covar carry the data's
# magnitude (~1e4/~1e2 with merge error up to ~1e-4) → 2dp, margin
# ~50× over the worst-case bound.
# --------------------------------------------------------------------------


def q58_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr(q, p), 6).alias("qp_corr"),
        F.round(F.covar_samp(q, p), 2).alias("qp_covar"),
        F.round(F.stddev_samp(q), 2).alias("qty_stddev"),
    )


Q58_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CORR(CAST(l_quantity AS DOUBLE),
                  CAST(l_extendedprice AS DOUBLE)), 6) AS qp_corr,
       ROUND(COVAR_SAMP(CAST(l_quantity AS DOUBLE),
                        CAST(l_extendedprice AS DOUBLE)), 2) AS qp_covar,
       ROUND(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)), 2) AS qty_stddev
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q59 — ordered string aggregation (LISTAGG): the distinct market
# segments of each nation's customers as one comma-joined string.
# collect_set's element order is partition-arrival order — never
# comparable across engines or cluster sizes — so the deterministic
# form is collect_set → array_sort → array_join, all JVM-side. The
# oracle is DuckDB's native string_agg(DISTINCT … ORDER BY …); Spark's
# own listagg can't take both DISTINCT and ORDER BY, hence the
# array composition.
# --------------------------------------------------------------------------


def q59_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    # string_agg over zero non-null values is NULL, not '' — collect_set
    # drops NULLs, so guard the empty set (deg_nulls sweep)
    segs = F.array_sort(F.collect_set("c_mktsegment"))
    return c.groupBy("c_nationkey").agg(
        F.when(F.size(segs) > 0, F.array_join(segs, ",")).alias(
            "segments"
        ),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )


Q59_SQL = """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
           AS segments,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
FROM customer GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# q60 — sliding (hopping) windows in batch: 10-minute windows every
# 5 minutes, so each event lands in exactly width/slide = 2 windows.
# Spark's F.window(slide < width) plans this as a generator (one
# Expand-like replicate per overlapping window) feeding ONE aggregate —
# events are never self-joined. The oracle derives the same assignment
# arithmetically: unnest the event's two epoch-grid window starts.
# Timestamps are compared as UTC-naive (session pins UTC; the oracle
# strips DuckDB's timestamptz).
# --------------------------------------------------------------------------


def q60_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n"
        )
    )


Q60_SQL = """
WITH grid AS (
  SELECT event_type,
         unnest([
           CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))
                AS TIMESTAMP),
           CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT))
                AS TIMESTAMP)
         ]) AS window_start
  FROM events
  -- event-time precondition: rows without a timestamp join no window
  -- (Spark's window() generator excludes them by construction)
  WHERE ts IS NOT NULL
)
SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM grid GROUP BY window_start, event_type
"""


# --------------------------------------------------------------------------
# q61 — native session windows (gap-based): Spark's session_window
# merges a user's events whenever consecutive gaps stay under 30
# minutes; window.end is last-event + gap by definition. The oracle
# re-derives sessions the classic SQL way — lag → gap flag → running
# sum as session id — so a value match cross-checks Spark's built-in
# session operator against the manual derivation (the same pair q19
# checks in the other direction). One shuffle on user_id; the
# sessionization itself is a sort-merge within partitions.
# --------------------------------------------------------------------------


def q61_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


Q61_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  -- event-time precondition (q60's note)
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# q63 — schemaless JSON-path extraction (get_json_object): pull a field
# out of the events.props JSON string WITHOUT declaring a schema — the
# exploratory complement to q17's from_json (which needs the struct
# up front). The path extraction runs inside codegen per row; at scale
# the right move is extracting once into a materialized column rather
# than re-parsing per consumer, which is exactly what this projection
# feeds. Oracle: DuckDB's ->> path operator.
# --------------------------------------------------------------------------


def q63_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
        )
    )


Q63_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS BIGINT)
           AS n_distinct_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q64 — array set-function family (intersect / except / contains):
# per-nation segment sets compared against a fixed reference set.
# Spark's array_intersect/array_except preserve first-array encounter
# order, which is NOT portable across engines — so the query emits set
# CARDINALITIES and a membership bool, which are order-free, and keeps
# the portable ordered rendering (array_join∘array_sort) for the one
# array column it returns. All array ops run inside codegen on the
# already-aggregated (25-row) side — zero extra shuffles beyond q59's.
# --------------------------------------------------------------------------

_REF_SEGMENTS = ("AUTOMOBILE", "BUILDING", "MACHINERY")


def q64_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    ref = F.array(*[F.lit(s) for s in _REF_SEGMENTS])
    segs = F.array_sort(F.collect_set("c_mktsegment"))
    return (
        c.groupBy("c_nationkey")
        .agg(segs.alias("segs"))
        .select(
            "c_nationkey",
            F.size(F.array_intersect("segs", ref)).cast("long").alias("n_common"),
            F.size(F.array_except("segs", ref)).cast("long").alias("n_extra"),
            F.array_contains("segs", "HOUSEHOLD").alias("has_household"),
            # q12's note: array_to_string([]) is NULL in the oracle
            F.when(
                F.size("segs") > 0, F.array_join("segs", ",")
            ).alias("segments"),
        )
    )


Q64_SQL = f"""
WITH g AS (
  SELECT c_nationkey,
         list_sort(list_distinct(list(c_mktsegment))) AS segs
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey,
       CAST(len(list_intersect(segs,
            {list(_REF_SEGMENTS)!r})) AS BIGINT) AS n_common,
       CAST(len(list_filter(segs,
            s -> NOT list_contains({list(_REF_SEGMENTS)!r}, s)))
            AS BIGINT) AS n_extra,
       list_contains(segs, 'HOUSEHOLD') AS has_household,
       array_to_string(segs, ',') AS segments
FROM g
"""


# --------------------------------------------------------------------------
# q65 — conditional aggregation family (count_if / filtered avg /
# bool_or): one pass, every conditional folded into the same partial
# aggregate — the idiom that replaces N filtered subqueries with one
# scan. Oracle uses SQL-standard FILTER clauses.
# --------------------------------------------------------------------------


def q65_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_discount")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(disc > 0.05).cast("long").alias("n_high_disc"),
        r4(F.avg(F.when(disc > 0.05, F.col("l_extendedprice")))).alias(
            "avg_price_high_disc"
        ),
        F.bool_or(F.col("l_quantity") >= 50).alias("any_bulk"),
        F.every(disc >= 0).alias("all_nonneg_disc"),
    )


Q65_SQL = """
SELECT l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
           AS n_high_disc,
       ROUND(AVG(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4)
           AS avg_price_high_disc,
       bool_or(l_quantity >= 50) AS any_bulk,
       bool_and(l_discount >= 0) AS all_nonneg_disc
FROM lineitem GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# q67 — skew-safe count-distinct (explicit two-phase): event_type has
# 5 values over the whole corpus — the textbook hot key. A naive
# count(DISTINCT user_id) GROUP BY event_type shuffles EVERY row of a
# hot type to one reducer, which holds the full distinct set in memory:
# the straggler/OOM that kills the job at 10^12 rows. The two-phase
# form shuffles on the COMPOSITE key (event_type, user_id) first —
# uniform by construction, partial-agg combines duplicates map-side —
# then counts per type over the already-distinct stream, where each
# reducer row is one distinct value, not one input row. Same trick the
# flagship uses for hot curriculum units (north-star's salted keys);
# for an algebraic agg Spark's partial aggregation already does this,
# but count-distinct needs it spelled out. Oracle: the naive form —
# semantically identical, catastrophically different at scale.
# --------------------------------------------------------------------------


def q67_skew_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    phase1 = ev.select("event_type", "user_id").distinct()
    return phase1.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


Q67_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q43 — set operations (INTERSECT / EXCEPT / UNION over distinct key
# sets; SURVEY §2.8 notes the reference has union only — engine
# addition completes the family). Each set op plans as an aggregate or
# left-anti join over pre-aggregated distinct keys: the shuffle carries
# distinct keys only, never the fact rows.
# --------------------------------------------------------------------------


def q43_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    a = orders.filter(F.col("o_totalprice") > 100_000).select(
        F.col("o_custkey").alias("uid")
    ).distinct()
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid")
    ).distinct()
    rows = [
        a.intersect(b).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("intersect").alias("setop"), "n"
        ),
        a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("except").alias("setop"), "n"
        ),
        a.union(b).distinct().agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("union").alias("setop"), "n"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


Q43_SQL = """
WITH a AS (SELECT DISTINCT o_custkey AS uid FROM orders
           WHERE o_totalprice > 100000),
     b AS (SELECT DISTINCT user_id AS uid FROM events
           WHERE event_type = 'click')
SELECT 'intersect' AS setop, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT uid FROM a INTERSECT SELECT uid FROM b)
UNION ALL
SELECT 'except', CAST(COUNT(*) AS BIGINT)
FROM (SELECT uid FROM a EXCEPT SELECT uid FROM b)
UNION ALL
SELECT 'union', CAST(COUNT(*) AS BIGINT)
FROM (SELECT uid FROM a UNION SELECT uid FROM b)
"""


# --------------------------------------------------------------------------
# q176 — MULTISET set operations (bag semantics): q43 covers the
# DISTINCT forms; this pins exceptAll/intersectAll — duplicate
# multiplicities subtract/min instead of collapsing, the semantics a
# resumable pipeline needs to reconcile at-least-once deliveries.
# Bags: per-user click days vs view days (duplicates are real). The
# oracle is DuckDB's EXCEPT ALL / INTERSECT ALL on the same bags, plus
# a multiplicity identity check: |A| = |A∖B| + |A∩B| as a rows-equal
# witness.
# --------------------------------------------------------------------------


def q176_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(es / 86400).cast("long").alias("day"),
    )
    a = ev.filter(F.col("event_type") == "click").select("user_id", "day")
    b = ev.filter(F.col("event_type") == "view").select("user_id", "day")

    def tag(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(name).alias("setop"), "n"
        )

    out = tag("except_all", a.exceptAll(b))
    for name, df in (
        ("intersect_all", a.intersectAll(b)),
        ("union_all", a.unionAll(b)),
    ):
        out = out.unionByName(tag(name, df))
    return out


Q176_SQL = """
WITH a AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events WHERE event_type = 'click'
), b AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events WHERE event_type = 'view'
)
SELECT 'except_all' AS setop, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
UNION ALL
SELECT 'intersect_all', CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
UNION ALL
SELECT 'union_all', CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
"""


# --------------------------------------------------------------------------
# q121 — UNPIVOT/melt: the wide aggregate (one row per return flag,
# three measure columns) relationally melted to (key, measure, value)
# rows — Spark's DataFrame.unpivot (3.4+) vs DuckDB's UNPIVOT. The
# kg melt (operators/mapper.py) does this at scale with a fused
# stack(); this pins the public API form. Measures are rendered to the
# shared 4dp double before melting so the value column is one type.
# --------------------------------------------------------------------------


def q121_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.sum("l_extendedprice")).alias("sum_price"),
        r4(F.sum("l_discount")).alias("sum_disc"),
    )
    # DuckDB's UNPIVOT excludes NULL cells by default; Spark's keeps
    # them — filter to match (deg_nulls sweep; no-op on real data)
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    ).filter(F.col("value").isNotNull())


Q121_SQL = """
WITH agg AS (
  SELECT l_returnflag,
         ROUND(SUM(l_quantity), 4) AS sum_qty,
         ROUND(SUM(l_extendedprice), 4) AS sum_price,
         ROUND(SUM(l_discount), 4) AS sum_disc
  FROM lineitem GROUP BY 1
)
UNPIVOT agg ON sum_qty, sum_price, sum_disc
INTO NAME measure VALUE value
"""


# --------------------------------------------------------------------------
# q122 — RANGE-frame windows over a SPARSE series: the trailing 7-day
# event count per type computed with RANGE BETWEEN 6 PRECEDING AND
# CURRENT ROW over the integer day — on sparse days RANGE bounds by
# VALUE distance (missing days shrink the window), where a ROWS frame
# would silently span arbitrary calendar gaps. The ROWS twin is emitted
# beside it so the distinction is part of the checked result. One
# shuffle: both frames share the (event_type, day) sort.
# --------------------------------------------------------------------------


def q122_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts").cast("timestamp_ltz").cast("long") / 86400).alias(
            "day"
        ),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    wr = (
        Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    )
    wn = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        "day",
        F.col("c").cast("long").alias("n_day"),
        F.sum("c").over(wr).cast("long").alias("n_7d_range"),
        F.sum("c").over(wn).cast("long").alias("n_7row"),
    )


Q122_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       CAST(c AS BIGINT) AS n_day,
       CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d_range,
       CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7row
FROM daily
"""


# --------------------------------------------------------------------------
# q123 — explicit GROUPING SETS (the general form behind q39's ROLLUP
# and q56's CUBE): per-language totals and per-source totals in ONE
# pass over documents — Catalyst plans the Expand + single aggregate
# exactly as for rollup/cube. grouping_id disambiguates which set a
# row belongs to (bit order pinned by the same convention as q56).
# --------------------------------------------------------------------------


def q123_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "documents").createOrReplaceTempView("q123_docs")
    return spark.sql(
        """
        SELECT lang, source,
               CAST(grouping_id() AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM q123_docs
        GROUP BY GROUPING SETS ((lang), (source))
        """
    )


Q123_SQL = """
SELECT lang, source,
       CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((lang), (source))
"""


# --------------------------------------------------------------------------
# q125 — SALTED skew join, the manual technique AQE's skew-join split
# automates (and the form you still need when the skewed side feeds a
# non-AQE stage, a streaming join, or an aggregation keyed on the hot
# value): the fact side's join key is widened with a DETERMINISTIC salt
# (event_id mod 16 — reproducible across engines and retries, unlike
# rand()), the dim side replicates once per salt, and the join key
# becomes (key, salt) — a hot key now spreads over 16 tasks. The salt
# is dropped before the aggregate, so the result is EXACTLY the plain
# join's — which is what the oracle states.
# --------------------------------------------------------------------------

_SALTS = 16


def q125_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("event_id") % _SALTS).alias("salt")
    )
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0), ("error", 0.0),
         ("signup", 5.0)],
        "event_type string, weight double",
    )
    dim_rep = dim.crossJoin(
        spark.range(_SALTS).select(F.col("id").cast("long").alias("salt"))
    )
    return (
        ev.join(dim_rep, ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            r4(F.sum(F.col("value") * F.col("weight"))).alias(
                "weighted_value"
            ),
        )
    )


Q125_SQL = """
WITH dim(event_type, weight) AS (
  VALUES ('click', 1.0), ('view', 0.1), ('purchase', 10.0),
         ('error', 0.0), ('signup', 5.0)
)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(e.value * d.weight), 4) AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


# --------------------------------------------------------------------------
# q127 — BPE pair statistics: the frequency table of adjacent CHARACTER
# pairs inside tokens — the quantity the first byte-pair-encoding merge
# step maximizes when training a tokenizer. Pairs are built array-side
# (transform over an index sequence, 1-based substring in both
# engines), exploded once, counted with a partial agg, top-20 with a
# full tie-break. Integer counts throughout.
# --------------------------------------------------------------------------


def q127_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import tokens

    d = load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("tok") - 1),
        lambda i: F.col("tok").substr(i, F.lit(2)),
    )
    cnt = (
        d.filter(F.length("tok") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("pair", "cnt")
    )


Q127_SQL = f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
), pairs AS (
  SELECT substr(tok, i, 2) AS pair
  FROM tok, unnest(generate_series(1, len(tok) - 1)) AS u(i)
  WHERE len(tok) >= 2
), cnt AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT pair, cnt FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rn FROM cnt
) WHERE rn <= 20
"""


# --------------------------------------------------------------------------
# q128 — MERGEABLE HLL sketches (hll_sketch_agg / hll_union_agg): each
# day builds a per-type user sketch, the daily sketches UNION-merge
# into one per-type estimate — the property that makes sketches the
# scale answer (daily shards aggregate without re-touching raw data;
# a re-aggregation is sketch-sized, not data-sized). The oracle can't
# run Datasketches, so it states the exact distinct count and the
# q44-style error-bound boolean (TRUE) that the merged estimate must
# satisfy — lgConfigK=14 gives ~0.8% RSE, asserted at 3%.
# --------------------------------------------------------------------------


def q128_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.floor(F.col("ts").cast("timestamp_ltz").cast("long") / 86400).alias(
            "day"
        ),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    # count("day") (not count(*)): the oracle's COUNT(DISTINCT day)
    # ignores a NULL day; the join is null-safe so a NULL event_type
    # group survives like the oracle's single GROUP BY (deg_nulls)
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
        F.count("day").cast("long").alias("n_days"),
    )
    exact = ev.groupBy(F.col("event_type").alias("_et")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return merged.join(
        exact, merged.event_type.eqNullSafe(F.col("_et"))
    ).select(
        "event_type",
        "n_days",
        "n_exact",
        (
            F.abs(F.col("_est") - F.col("n_exact"))
            / F.col("n_exact").cast("double")
            <= 0.03
        ).alias("within_3pct"),
    )


Q128_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400)
            AS BIGINT) AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_3pct
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q129 — order-independent TABLE CHECKSUM (anti-entropy fingerprint):
# per group, XOR of a canonical per-row hash plus the row count — the
# O(1)-output replica/snapshot comparison that q103's full-outer diff
# escalates to only on mismatch. XOR is commutative/associative with no
# overflow, so the checksum is partition- and order-independent and
# computes as one partial agg. The per-row rendering avoids every
# engine-dependent string form: integers as decimal strings, the
# timestamp as its epoch, money as integer cents.
# --------------------------------------------------------------------------


def q129_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    o = load(spark, sf_dir, "orders")
    # F.concat (NULL-propagating, like the oracle's ||), NOT concat_ws:
    # a row with any NULL field must checksum as NULL on both engines
    # so BIT_XOR skips it (deg_nulls sweep)
    row = F.concat(
        F.col("o_orderkey").cast("string"),
        F.lit("|"),
        F.col("o_custkey").cast("string"),
        F.lit("|"),
        F.col("o_orderstatus"),
        F.lit("|"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("|"),
        F.col("o_orderdate").cast("timestamp_ltz").cast("long").cast("string"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.bit_xor(md5long(row)).alias("checksum"),
    )


Q129_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       BIT_XOR(CAST('0x' || substr(md5(
         CAST(o_orderkey AS VARCHAR) || '|' ||
         CAST(o_custkey AS VARCHAR) || '|' ||
         o_orderstatus || '|' ||
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
         CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) AS VARCHAR)
       ), 1, 15) AS BIGINT)) AS checksum
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q130 — CDC change-log application: the events stream read as a keyed
# change log (op = delete when value < 100, else upsert), materialized
# to current state by keeping each key's LAST operation (ts, event_id
# tie-break) and dropping keys whose last op is a delete — the
# Debezium-style apply that complements q90's SCD2 history and q92's
# streaming MERGE. One window shuffle on the key; the state table is
# what a MERGE INTO target would hold.
# --------------------------------------------------------------------------


def q130_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("value") < 100, F.lit("D")).otherwise(F.lit("U")).alias(
            "op"
        ),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    last = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    state = last.filter(F.col("op") == "U").select(
        "user_id", r4(F.col("value")).alias("current_value")
    )
    return state.agg(
        F.count(F.lit(1)).cast("long").alias("n_live_keys"),
        r4(F.sum("current_value")).alias("total_value"),
        r4(F.min("current_value")).alias("min_value"),
        r4(F.max("current_value")).alias("max_value"),
    )


Q130_SQL = """
WITH log AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN value < 100 THEN 'D' ELSE 'U' END AS op
  FROM events
), last AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      ORDER BY ts DESC, event_id DESC) AS rn
    FROM log
  ) WHERE rn = 1
), state AS (
  SELECT user_id, ROUND(value, 4) AS current_value FROM last WHERE op = 'U'
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_live_keys,
       ROUND(SUM(current_value), 4) AS total_value,
       ROUND(MIN(current_value), 4) AS min_value,
       ROUND(MAX(current_value), 4) AS max_value
FROM state
"""


# --------------------------------------------------------------------------
# q134 — ANALYZE-style column statistics: per column of lineitem, the
# row/NDV/null counts and value range a cost-based optimizer collects
# (ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS). One scan, one
# 1-row aggregate computing every column's stats as parallel
# expressions, then a compile-time melt to (column, stat...) rows —
# numeric ranges rendered through the shared integer-cents/4dp
# conventions so both engines emit identical strings.
# --------------------------------------------------------------------------


def q134_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cols = {
        "l_orderkey": F.col("l_orderkey").cast("string"),
        "l_partkey": F.col("l_partkey").cast("string"),
        "l_suppkey": F.col("l_suppkey").cast("string"),
        "l_quantity": F.col("l_quantity").cast("long").cast("string"),
        "l_returnflag": F.col("l_returnflag"),
        "l_linestatus": F.col("l_linestatus"),
    }
    aggs = []
    for name, expr in cols.items():
        aggs += [
            F.count(expr).cast("long").alias(f"{name}__n"),
            F.countDistinct(expr).cast("long").alias(f"{name}__ndv"),
            F.min(expr).alias(f"{name}__min"),
            F.max(expr).alias(f"{name}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', {n}__n, {n}__ndv, {n}__min, {n}__max" for n in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, ndv, min_value, max_value)"
    )


Q134_SQL = """
SELECT t.* FROM (
  SELECT
    [
      {'column_name': 'l_orderkey',
       'n_rows': CAST(COUNT(CAST(l_orderkey AS VARCHAR)) AS BIGINT),
       'ndv': CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR)) AS BIGINT),
       'min_value': MIN(CAST(l_orderkey AS VARCHAR)),
       'max_value': MAX(CAST(l_orderkey AS VARCHAR))},
      {'column_name': 'l_partkey',
       'n_rows': CAST(COUNT(CAST(l_partkey AS VARCHAR)) AS BIGINT),
       'ndv': CAST(COUNT(DISTINCT CAST(l_partkey AS VARCHAR)) AS BIGINT),
       'min_value': MIN(CAST(l_partkey AS VARCHAR)),
       'max_value': MAX(CAST(l_partkey AS VARCHAR))},
      {'column_name': 'l_suppkey',
       'n_rows': CAST(COUNT(CAST(l_suppkey AS VARCHAR)) AS BIGINT),
       'ndv': CAST(COUNT(DISTINCT CAST(l_suppkey AS VARCHAR)) AS BIGINT),
       'min_value': MIN(CAST(l_suppkey AS VARCHAR)),
       'max_value': MAX(CAST(l_suppkey AS VARCHAR))},
      {'column_name': 'l_quantity',
       'n_rows': CAST(COUNT(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))
                      AS BIGINT),
       'ndv': CAST(COUNT(DISTINCT CAST(CAST(l_quantity AS BIGINT)
                                       AS VARCHAR)) AS BIGINT),
       'min_value': MIN(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)),
       'max_value': MAX(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))},
      {'column_name': 'l_returnflag',
       'n_rows': CAST(COUNT(l_returnflag) AS BIGINT),
       'ndv': CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
       'min_value': MIN(l_returnflag),
       'max_value': MAX(l_returnflag)},
      {'column_name': 'l_linestatus',
       'n_rows': CAST(COUNT(l_linestatus) AS BIGINT),
       'ndv': CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
       'min_value': MIN(l_linestatus),
       'max_value': MAX(l_linestatus)}
    ] AS rows
  FROM lineitem
), UNNEST(rows) AS u(t)
"""


# --------------------------------------------------------------------------
# q135 — OHLC bars: per (event_type, day), the opening and closing
# values plus the high/low/volume — the tumbling bar aggregation every
# time-series store ships. Open/close use min_by/max_by over a
# COMPOSITE integer key (epoch·10⁴ + event_id) so ties are impossible
# and the pick is deterministic in both engines; one partial agg, no
# window sort.
# --------------------------------------------------------------------------


def q135_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    key = es * 10000 + F.col("event_id") % 10000
    return (
        ev.select(
            "event_type",
            F.floor(es / 86400).alias("day"),
            "value",
            key.alias("k"),
        )
        .groupBy("event_type", "day")
        .agg(
            r4(F.min_by("value", "k")).alias("open"),
            r4(F.max("value")).alias("high"),
            r4(F.min("value")).alias("low"),
            r4(F.max_by("value", "k")).alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
        )
    )


Q135_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         value,
         CAST(floor(epoch(ts)) AS BIGINT) * 10000 + event_id % 10000 AS k
  FROM events
)
SELECT event_type, day,
       ROUND(MIN_BY(value, k), 4) AS open,
       ROUND(MAX(value), 4) AS high,
       ROUND(MIN(value), 4) AS low,
       ROUND(MAX_BY(value, k), 4) AS close,
       CAST(COUNT(*) AS BIGINT) AS volume
FROM b GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q243 — JOIN-CARDINALITY estimation audit: the number a cost-based
# optimizer must get right before choosing broadcast vs shuffle vs
# skew-salting at 100 TB. Ground truth for the l_partkey self-join is
# |L ⋈ L| = Σ_k c(k)² (one partial-agg groupBy, never the join
# itself). Against it, the two standard estimators: (a) the uniform
# assumption |L|²/ndv — what Spark's CBO uses without histograms, and
# exactly the estimate that explodes under skew; (b) heavy-hitter +
# uniform tail — top-H key frequencies kept exactly (the equi-height
# histogram/TopK stats ANALYZE collects), remaining mass assumed
# uniform over the remaining NDV. Output: one row with the exact
# count, both estimates, and signed relative errors — the audit that
# justifies paying for histogram stats on join keys. All counting is
# exact int64; estimates are rendered at 4dp.
# --------------------------------------------------------------------------

_JSE_TOPH = 20


def q243_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    base = freq.agg(
        F.sum(F.col("c") * F.col("c")).alias("exact"),
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("ndv"),
    )
    hh = (
        freq.orderBy(F.col("c").desc(), F.col("l_partkey").asc())
        .limit(_JSE_TOPH)  # TakeOrderedAndProject — no global sort
        .agg(
            F.sum(F.col("c") * F.col("c")).alias("hh_sq"),
            F.sum("c").alias("hh_n"),
            F.count(F.lit(1)).alias("hh_k"),
        )
    )
    # try_divide throughout: when every distinct key is a heavy hitter
    # (ndv = hh_k — any table with ≤ TOPH keys) the tail denominator is
    # 0 and DuckDB renders the estimate NULL (deg_one sweep)
    est_uni = F.try_divide(F.col("n") * F.col("n"), F.col("ndv"))
    est_hh = F.col("hh_sq") + F.try_divide(
        (F.col("n") - F.col("hh_n")) * (F.col("n") - F.col("hh_n")),
        F.col("ndv") - F.col("hh_k"),
    )
    return base.crossJoin(F.broadcast(hh)).select(
        F.col("exact").cast("long").alias("exact_pairs"),
        r4(est_uni).alias("est_uniform"),
        r4(est_hh).alias("est_hh_tail"),
        r4(
            F.try_divide(est_uni - F.col("exact"), F.col("exact"))
        ).alias("uniform_rel_err"),
        r4(
            F.try_divide(est_hh - F.col("exact"), F.col("exact"))
        ).alias("hh_tail_rel_err"),
    )


Q243_SQL = f"""
WITH freq AS (
  SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey
), base AS (
  SELECT SUM(c * c) AS exact, SUM(c) AS n, COUNT(*) AS ndv FROM freq
), hh AS (
  SELECT SUM(c * c) AS hh_sq, SUM(c) AS hh_n, COUNT(*) AS hh_k
  FROM (
    SELECT c FROM freq ORDER BY c DESC, l_partkey ASC LIMIT {_JSE_TOPH})
)
SELECT CAST(exact AS BIGINT) AS exact_pairs,
       ROUND(1.0 * n * n / ndv, 4) AS est_uniform,
       ROUND(hh_sq + 1.0 * (n - hh_n) * (n - hh_n) / (ndv - hh_k), 4)
         AS est_hh_tail,
       ROUND((1.0 * n * n / ndv - exact) / exact, 4) AS uniform_rel_err,
       ROUND((hh_sq + 1.0 * (n - hh_n) * (n - hh_n) / (ndv - hh_k)
              - exact) / exact, 4) AS hh_tail_rel_err
FROM base CROSS JOIN hh
"""


# --------------------------------------------------------------------------
# q336 — Spark 4 VARIANT-type JSON path (SPARK-45891): parse the
# events `props` JSON column into the binary VARIANT encoding ONCE,
# then extract typed fields with `variant_get` — the
# semi-structured-data fast path that replaces per-access string
# re-parsing (the VariantGet expression runs against the decoded
# binary, inside codegen, with no schema declared up front). Per event
# type: count, distinct k, mean k, and the count in k's top decile
# band (k ≥ 90) — enough shape to prove typed extraction, aggregation,
# and predicate use of a VARIANT field. Oracle: DuckDB's native JSON
# path extraction over the same strings. One partial agg; the parse
# is projection-local (no shuffle of its own).
# --------------------------------------------------------------------------


def q336_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.count_if(F.col("k") >= 90).cast("long").alias("n_top_band"),
        )
    )


Q336_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
       ROUND(AVG(k), 6) AS avg_k,
       CAST(COUNT(*) FILTER (WHERE k >= 90) AS BIGINT) AS n_top_band
FROM ev GROUP BY 1
"""


# --------------------------------------------------------------------------
# q354 — SQL PIPE SYNTAX (Spark 4, SPARK-49555): the |> operator
# chain — FROM … |> WHERE … |> AGGREGATE … GROUP BY … |> ORDER BY —
# compiles to the identical Catalyst plan as the nested-SELECT form,
# so this pins (a) that the engine surface accepts the linear style
# data engineers increasingly write ETL in, and (b) that its results
# are bit-equal to the classic form the DuckDB oracle runs. Money is
# summed in integer cents (the repo's exactness idiom — a DOUBLE sum
# would be partial-order-dependent).
# --------------------------------------------------------------------------


def q354_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("q354_orders")
    return spark.sql(
        """
        FROM q354_orders
        |> WHERE o_orderstatus <> 'F'
        |> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n_orders,
                     SUM(cents) AS total_cents,
                     DATE_FORMAT(MIN(o_orderdate), 'yyyy-MM-dd')
                       AS first_order
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


Q354_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "q354_pipe_syntax": q354_pipe_syntax,
    "q336_variant_props": q336_variant_props,
    "q243_join_size_estimate": q243_join_size_estimate,
    "q176_multiset_ops": q176_multiset_ops,
    "q125_salted_join": q125_salted_join,
    "q127_bpe_pairs": q127_bpe_pairs,
    "q128_hll_merge": q128_hll_merge,
    "q129_table_checksum": q129_table_checksum,
    "q130_cdc_apply": q130_cdc_apply,
    "q134_analyze_stats": q134_analyze_stats,
    "q135_ohlc_bars": q135_ohlc_bars,
    "q121_unpivot": q121_unpivot,
    "q122_range_frame": q122_range_frame,
    "q123_grouping_sets": q123_grouping_sets,
    "q01_pricing_summary": q01_pricing_summary,
    "q02_topk_orders": q02_topk_orders,
    "q03_region_rollup": q03_region_rollup,
    "q04_filter_predicates": q04_filter_predicates,
    "q05_composite_join": q05_composite_join,
    "q06_first_seen_dedup": q06_first_seen_dedup,
    "q07_token_explode": q07_token_explode,
    "q08_having": q08_having,
    "q09_union": q09_union,
    "q10_anti_join": q10_anti_join,
    "q11_window_topn": q11_window_topn,
    "q12_collect_distinct": q12_collect_distinct,
    "q13_synthetic_id": q13_synthetic_id,
    "q14_regex_normalize": q14_regex_normalize,
    "q15_cast_chain": q15_cast_chain,
    "q16_string_transforms": q16_string_transforms,
    "q17_json_props": q17_json_props,
    "q18_tumbling_window": q18_tumbling_window,
    "q19_sessionize": q19_sessionize,
    "q37_group_percentiles": q37_group_percentiles,
    "q38_asof_join": q38_asof_join,
    "q39_rollup_totals": q39_rollup_totals,
    "q40_topk_per_group": q40_topk_per_group,
    "q43_set_ops": q43_set_ops,
    "q44_approx_distinct": q44_approx_distinct,
    "q45_quantile_sketch": q45_quantile_sketch,
    "q46_pivot": q46_pivot,
    "q47_customers_without_orders": q47_customers_without_orders,
    "q48_above_customer_avg": q48_above_customer_avg,
    "q49_datetime_family": q49_datetime_family,
    "q56_cube_totals": q56_cube_totals,
    "q57_rank_family": q57_rank_family,
    "q58_stats_family": q58_stats_family,
    "q59_string_agg": q59_string_agg,
    "q60_sliding_windows": q60_sliding_windows,
    "q61_session_windows": q61_session_windows,
    "q63_json_path": q63_json_path,
    "q64_array_functions": q64_array_functions,
    "q65_conditional_agg": q65_conditional_agg,
    "q67_skew_distinct": q67_skew_distinct,
}

ORACLES = {
    "q354_pipe_syntax": Q354_SQL,
    "q336_variant_props": Q336_SQL,
    "q243_join_size_estimate": Q243_SQL,
    "q176_multiset_ops": Q176_SQL,
    "q125_salted_join": Q125_SQL,
    "q127_bpe_pairs": Q127_SQL,
    "q128_hll_merge": Q128_SQL,
    "q129_table_checksum": Q129_SQL,
    "q130_cdc_apply": Q130_SQL,
    "q134_analyze_stats": Q134_SQL,
    "q135_ohlc_bars": Q135_SQL,
    "q121_unpivot": Q121_SQL,
    "q122_range_frame": Q122_SQL,
    "q123_grouping_sets": Q123_SQL,
    "q01_pricing_summary": Q01_SQL,
    "q02_topk_orders": Q02_SQL,
    "q03_region_rollup": Q03_SQL,
    "q04_filter_predicates": Q04_SQL,
    "q05_composite_join": Q05_SQL,
    "q06_first_seen_dedup": Q06_SQL,
    "q07_token_explode": Q07_SQL,
    "q08_having": Q08_SQL,
    "q09_union": Q09_SQL,
    "q10_anti_join": Q10_SQL,
    "q11_window_topn": Q11_SQL,
    "q12_collect_distinct": Q12_SQL,
    "q13_synthetic_id": Q13_SQL,
    "q14_regex_normalize": Q14_SQL,
    "q15_cast_chain": Q15_SQL,
    "q16_string_transforms": Q16_SQL,
    "q17_json_props": Q17_SQL,
    "q18_tumbling_window": Q18_SQL,
    "q19_sessionize": Q19_SQL,
    "q37_group_percentiles": Q37_SQL,
    "q38_asof_join": Q38_SQL,
    "q39_rollup_totals": Q39_SQL,
    "q40_topk_per_group": Q40_SQL,
    "q43_set_ops": Q43_SQL,
    "q44_approx_distinct": Q44_SQL,
    "q45_quantile_sketch": Q45_SQL,
    "q46_pivot": Q46_SQL,
    "q47_customers_without_orders": Q47_SQL,
    "q48_above_customer_avg": Q48_SQL,
    "q49_datetime_family": Q49_SQL,
    "q56_cube_totals": Q56_SQL,
    "q57_rank_family": Q57_SQL,
    "q58_stats_family": Q58_SQL,
    "q59_string_agg": Q59_SQL,
    "q60_sliding_windows": Q60_SQL,
    "q61_session_windows": Q61_SQL,
    "q63_json_path": Q63_SQL,
    "q64_array_functions": Q64_SQL,
    "q65_conditional_agg": Q65_SQL,
    "q67_skew_distinct": Q67_SQL,
}
