"""Training-data pipeline operators, batch 4: temporal analytics and
corpus-audit stages.

* q99 — gap-filling with last-observation-carried-forward (LOCF) over a
  dense day grid: the hypertable-rollup/gapfill operator time-series
  stores ship natively, expressed as sequence-explode + ignore-nulls
  window so Catalyst plans it with ONE shuffle (the grid join and the
  LOCF window share the event_type partitioning).
* q100 — range join with a bounded equi-prefix: "count clicks in the
  2 h before each error, per user". The naive plan is an equi-join on
  user_id with the range as a post-filter — correct, but a hot user
  fans out quadratically. The Spark side implements the scale form:
  both sides bucket time into window-width buckets and each probe
  explodes into exactly TWO candidate buckets (its own + the previous),
  so the join key is (user_id, bucket) — per-task fan-out is bounded by
  bucket occupancy, never by a user's full history. The oracle states
  the plain declarative range join.
* q101 — cross-document chunk containment (copy-detection audit): every
  document's non-overlapping 20-token chunks are fingerprinted; the
  fraction of a doc's chunks appearing in ANY other document measures
  how much of it is copied text. This is the chunk-granular complement
  of q20's whole-doc hash dedup and q70's hot-block boilerplate: df is
  computed on the 60-bit chunk fingerprint (not the chunk string), so
  the document-frequency shuffle carries 8-byte keys at 100 TB.

Every query has a DuckDB oracle twin; shared helpers (`tokens`,
`md5long`, epoch-day idiom) keep the two engines' renderings identical.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import (
    MD5LONG_SQL,
    TOKENS_SQL,
    exact_ntile,
    histogram_rank,
    load,
    md5long,
    r4,
    tokens,
)

# --------------------------------------------------------------------------
# q99 — day-grid gap-fill with LOCF. Sparse signal: high-value events
# (value > _GF_MIN) observe only ~1/3 of (event_type, day) cells; the
# grid densifies to every day in the observed span and LOCF carries the
# last daily average forward. Leading days before a type's first
# observation stay NULL (no fabrication). Spark plan: the bounds agg is
# a single-row broadcast, the grid explode is k_types × n_days rows
# (tiny vs the raw stream), and the left join + ignore-nulls `last`
# window both partition by event_type — one shuffle total. At 100 TB
# the daily pre-agg (partial, map-side) is what touches the raw data;
# everything after runs on the rollup.
# --------------------------------------------------------------------------

_GF_MIN = 250.0


def _eday(col: str) -> F.Column:
    """Epoch day (UTC) as int64 — the repo's portable day idiom."""
    return (
        (F.col(col).cast("timestamp_ltz").cast("long") / 86400).cast("long")
    )


def q99_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > _GF_MIN)
        .select("event_type", _eday("ts").alias("day"), "value")
    )
    daily = ev.groupBy("event_type", "day").agg(r4(F.avg("value")).alias("v"))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("value_locf"),
        F.col("v").isNull().alias("gap_filled"),
    )


Q99_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         value
  FROM events WHERE value > {_GF_MIN}
), daily AS (
  SELECT event_type, day, round(avg(value), 4) AS v
  FROM ev GROUP BY 1, 2
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
grid AS (
  SELECT t.event_type, g.day
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(d0, d1)) AS day FROM bounds) g
)
SELECT g.event_type, g.day,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
       d.v IS NULL AS gap_filled
FROM grid g
LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
"""


# --------------------------------------------------------------------------
# q100 — equi-prefix range join (bucketed). Window width = _RJ_SEC.
# Correctness invariant of the bucketing: for any click with
# e.ts - W <= c.ts < e.ts, floor(c/W) ∈ {floor(e/W) - 1, floor(e/W)},
# so probing exactly two buckets per error loses nothing; the exact
# range predicate then trims the bucket's false positives. Errors with
# zero prior clicks are preserved by the final right join (count 0,
# sum NULL).
# --------------------------------------------------------------------------

_RJ_SEC = 7200  # 2-hour lookback


def q100_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    esec = F.col("ts").cast("timestamp_ltz").cast("long")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("ets"), esec.alias("es")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        "value",
        (esec / _RJ_SEC).cast("long").alias("b"),
    )
    probes = err.select(
        "event_id",
        "user_id",
        "ets",
        F.explode(
            F.array(
                (F.col("es") / _RJ_SEC).cast("long"),
                (F.col("es") / _RJ_SEC).cast("long") - 1,
            )
        ).alias("b"),
    )
    matched = (
        probes.join(clk, on=["user_id", "b"])
        .filter(
            (F.col("cts") >= F.col("ets") - F.expr(f"INTERVAL {_RJ_SEC} SECONDS"))
            & (F.col("cts") < F.col("ets"))
        )
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            r4(F.sum("value")).alias("s"),
        )
    )
    return err.join(matched, on="event_id", how="left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_prior_clicks"),
        F.col("s").alias("sum_click_value"),
    )


Q100_SQL = f"""
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), clk AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
), m AS (
  SELECT e.event_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(SUM(c.value), 4) AS s
  FROM err e JOIN clk c ON e.user_id = c.user_id
   AND c.ts >= e.ts - INTERVAL {_RJ_SEC} SECOND AND c.ts < e.ts
  GROUP BY e.event_id
)
SELECT e.event_id, e.user_id,
       COALESCE(m.n, CAST(0 AS BIGINT)) AS n_prior_clicks,
       m.s AS sum_click_value
FROM err e LEFT JOIN m ON e.event_id = m.event_id
"""


# --------------------------------------------------------------------------
# q101 — cross-document chunk containment. Two shuffles: df partial-agg
# on the chunk fingerprint, then the fingerprint join back (AQE
# broadcasts the df table per partition when it is small relative to
# the corpus — at web scale the distinct-chunk table is the smaller
# side after df>1 filtering... kept as a full join here because the
# per-doc ratio needs every chunk's df verdict).
# --------------------------------------------------------------------------

_CHUNK = 20


def q101_chunk_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(t) / {_CHUNK}.0) AS INT) - 1), "
                f"b -> concat_ws(' ', slice(t, b * {_CHUNK} + 1, {_CHUNK})))"
            )
        ).alias("blk"),
    ).select("doc_id", md5long(F.col("blk")).alias("h"))
    df_tbl = chunks.groupBy("h").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return (
        chunks.join(df_tbl, on="h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count_if(F.col("ndocs") > 1).cast("long").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            r4(F.col("n_shared") / F.col("n_chunks")).alias("share_ratio"),
        )
    )


Q101_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL.format(x='text')} AS tk FROM documents
), tt AS (SELECT doc_id, tk FROM t WHERE len(tk) > 0),
ch AS (
  SELECT doc_id,
         {MD5LONG_SQL.format(x=f"concat_ws(' ', list_slice(tk, b * {_CHUNK} + 1, (b + 1) * {_CHUNK}))")} AS h
  FROM tt, unnest(range(0, CAST(ceil(len(tk) / {_CHUNK}.0) AS INT))) AS u(b)
), dfreq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY h
)
SELECT ch.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (dfreq.ndocs > 1) AS BIGINT) AS n_shared,
       ROUND(COUNT(*) FILTER (dfreq.ndocs > 1) / CAST(COUNT(*) AS DOUBLE), 4)
         AS share_ratio
FROM ch JOIN dfreq ON ch.h = dfreq.h
GROUP BY ch.doc_id
"""


# --------------------------------------------------------------------------
# q103 — snapshot reconciliation via FULL OUTER join (the one join
# flavor the surface didn't yet exercise): per-user high-value purchase
# totals in the first half of the month vs the second, full-outer
# joined and classified added / removed / changed / same. This is the
# table-diff operator every incremental pipeline needs between two
# snapshot versions. Plan: two branch aggs over one scan share the
# user_id shuffle; the full-outer join is key-colocated with them.
# Status compares the ROUNDED totals (shared rendering), so the
# classification is engine-portable.
# --------------------------------------------------------------------------

_SPLIT_DAY = 19738  # 2024-01-16 UTC, epoch days
_HV_MIN = 100.0


def q103_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > _HV_MIN))
        .select("user_id", _eday("ts").alias("day"), "value")
    )
    a = (
        ev.filter(F.col("day") < _SPLIT_DAY)
        .groupBy("user_id")
        .agg(r4(F.sum("value")).alias("total_a"))
    )
    b = (
        ev.filter(F.col("day") >= _SPLIT_DAY)
        .groupBy("user_id")
        .agg(r4(F.sum("value")).alias("total_b"))
    )
    j = a.join(b, on="user_id", how="full_outer")
    status = (
        F.when(F.col("total_a").isNull(), F.lit("added"))
        .when(F.col("total_b").isNull(), F.lit("removed"))
        .when(F.col("total_a") == F.col("total_b"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select("user_id", "total_a", "total_b", status.alias("status"))


Q103_SQL = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         value
  FROM events WHERE event_type = 'purchase' AND value > {_HV_MIN}
), a AS (
  SELECT user_id, round(sum(value), 4) AS total_a
  FROM ev WHERE day < {_SPLIT_DAY} GROUP BY user_id
), b AS (
  SELECT user_id, round(sum(value), 4) AS total_b
  FROM ev WHERE day >= {_SPLIT_DAY} GROUP BY user_id
)
SELECT COALESCE(a.user_id, b.user_id) AS user_id, a.total_a, b.total_b,
       CASE WHEN a.total_a IS NULL THEN 'added'
            WHEN b.total_b IS NULL THEN 'removed'
            WHEN a.total_a = b.total_b THEN 'same'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
"""


# --------------------------------------------------------------------------
# q104 — incremental aggregation / materialized-view maintenance: the
# base-period rollup is a stored partial-aggregate table; the delta
# period produces another; the published view re-aggregates the ALGEBRAIC
# partials (count ⊕ sum ⊕ min ⊕ max, avg derived at publish time —
# never averaged partials). The oracle computes the full-table rollup
# directly, so a value match PROVES the merge is lossless — the property
# that lets a 100-TB pipeline maintain rollups by touching only the new
# partition instead of rescanning history. (Numerically this is exactly
# Spark's own partial→final agg path, stated at the table level.)
# --------------------------------------------------------------------------


def q104_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", _eday("ts").alias("day"), "value"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    # NULL-timestamp rows route to the base partial: the oracle is one
    # un-split GROUP BY, and day < SPLIT drops NULL days from BOTH
    # partials (deg_nulls sweep)
    base = partial(
        ev.filter((F.col("day") < _SPLIT_DAY) | F.col("day").isNull())
    )
    delta = partial(ev.filter(F.col("day") >= _SPLIT_DAY))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "event_type",
        "n",
        r4(F.col("s")).alias("sum_value"),
        r4(F.col("mn")).alias("min_value"),
        r4(F.col("mx")).alias("max_value"),
        r4(F.try_divide("s", "n")).alias("avg_value"),
    )


Q104_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value,
       ROUND(SUM(value) / COUNT(*), 4) AS avg_value
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q105 — robust outlier detection via median/MAD (the robust-statistics
# complement of q73's mean/σ z-score, which a single extreme value can
# mask). Two exact-percentile aggs (median, then median of |v − med|),
# each a partial agg on event_type + a broadcast-back join — the q37
# percentile machinery proved Spark `percentile` ≡ DuckDB
# `quantile_cont` exactly, so the 3.0 robust-z threshold compares
# identical doubles. At scale the exact median swaps for the
# percentile_approx sketch (q45) with the same plan shape.
# --------------------------------------------------------------------------

_MAD_K = 1.4826  # normal-consistency constant
_RZ_CUT = 3.0


def q105_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), on="event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad"), F.first("med").alias("med")
    )
    rz = dev.select("event_type", "value").join(
        F.broadcast(mad), on="event_type"
    ).select(
        "event_type",
        "med",
        "mad",
        # try_divide: a single-sample group has MAD 0 (DuckDB: NULL)
        F.try_divide(
            F.abs(F.col("value") - F.col("med")),
            F.lit(_MAD_K) * F.col("mad"),
        ).alias("rz"),
    )
    return rz.groupBy("event_type").agg(
        r4(F.first("med")).alias("median"),
        r4(F.first("mad")).alias("mad"),
        F.count_if(F.col("rz") > _RZ_CUT).cast("long").alias("n_outliers"),
        r4(F.max("rz")).alias("max_rz"),
    )


Q105_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
  FROM events e JOIN med m ON e.event_type = m.event_type
), mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad, ANY_VALUE(med) AS med
  FROM dev GROUP BY event_type
), rz AS (
  SELECT d.event_type, m.med, m.mad,
         abs(d.value - m.med) / ({_MAD_K} * m.mad) AS rz
  FROM dev d JOIN mad m ON d.event_type = m.event_type
)
SELECT event_type,
       ROUND(ANY_VALUE(med), 4) AS median,
       ROUND(ANY_VALUE(mad), 4) AS mad,
       CAST(COUNT(*) FILTER (rz > {_RZ_CUT}) AS BIGINT) AS n_outliers,
       ROUND(MAX(rz), 4) AS max_rz
FROM rz GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q106 — WEIGHTED quantiles (p25/median/p75) of document token counts,
# weighted by byte size — the statistic corpus-mixture balancing
# actually needs (an unweighted median over docs misstates the
# token-mass distribution). All arithmetic is INTEGER-exact: weights
# and values are ints, the ordered running sum is sequential in both
# engines, and the q·total comparison is rational — no float rounding
# anywhere, so the driver compare is exact by construction. Plan: one
# window sort per lang (the running sum), one broadcast totals join,
# one min-agg per quantile.
# --------------------------------------------------------------------------


def q106_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "lang",
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("tc"),
            F.col("n_chars").cast("long").alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    win = (
        Window.partitionBy("lang")
        .orderBy("tc", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = d.select(
        "lang", "tc", F.sum("w").over(win).alias("cw")
    )
    tot = d.groupBy("lang").agg(F.sum("w").alias("tw"))
    j = cum.join(F.broadcast(tot), on="lang")
    qs = []
    for name, num, den in (("wp25", 1, 4), ("wmedian", 1, 2), ("wp75", 3, 4)):
        qs.append(
            F.min(
                F.when(F.col("cw") * den >= F.col("tw") * num, F.col("tc"))
            ).alias(name)
        )
    return j.groupBy("lang").agg(*qs)


Q106_SQL = f"""
WITH d AS (
  SELECT lang, doc_id,
         CAST(len({TOKENS_SQL.format(x='text')}) AS BIGINT) AS tc,
         CAST(n_chars AS BIGINT) AS w
  FROM documents WHERE n_chars > 0
), cum AS (
  SELECT lang, tc,
         SUM(w) OVER (PARTITION BY lang ORDER BY tc, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM d
), tot AS (SELECT lang, SUM(w) AS tw FROM d GROUP BY lang)
SELECT c.lang,
       MIN(CASE WHEN c.cw * 4 >= t.tw * 1 THEN c.tc END) AS wp25,
       MIN(CASE WHEN c.cw * 2 >= t.tw * 1 THEN c.tc END) AS wmedian,
       MIN(CASE WHEN c.cw * 4 >= t.tw * 3 THEN c.tc END) AS wp75
FROM cum c JOIN tot t ON c.lang = t.lang
GROUP BY c.lang
"""


# --------------------------------------------------------------------------
# q107 — time-weighted average (the TSDB `time_weight('Linear'/'LOCF')`
# operator): per user, each event's value holds until the next event
# (LOCF weighting), so TWA = Σ value·Δt / span. One lead() window per
# user supplies Δt (integer seconds — exact); the weighted sum renders
# at 4dp like every money aggregate. Single shuffle: the window and the
# final agg share the user_id partitioning.
# --------------------------------------------------------------------------


def q107_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("t"),
        "value",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (F.lead("t").over(w) - F.col("t")).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dur").cast("long").alias("span_sec"),
            r4(F.sum(F.col("value") * F.col("dur")) / F.sum("dur")).alias("twa"),
        )
        .filter(F.col("span_sec") > 0)
    )


Q107_SQL = """
WITH seg AS (
  SELECT user_id, value,
         LEAD(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
           - CAST(floor(epoch(ts)) AS BIGINT) AS dur
  FROM events
)
SELECT user_id,
       CAST(SUM(dur) AS BIGINT) AS span_sec,
       ROUND(SUM(value * dur) / SUM(dur), 4) AS twa
FROM seg WHERE dur IS NOT NULL
GROUP BY user_id HAVING SUM(dur) > 0
"""


# --------------------------------------------------------------------------
# q108 — SQL-standard linear-regression aggregates (REGR_* family):
# per-group OLS slope/intercept/R² of extended price on quantity — the
# closed-form single-pass regression every warehouse exposes and the
# cheap first-order feature/drift probe in a training pipeline. All
# JVM-side partial aggregates (one shuffle); both engines implement the
# identical SQL-standard formulas, so only rendering is rounded (slope/
# intercept 4dp, R² 6dp — far above the ~1e-9 accumulated-float error).
# --------------------------------------------------------------------------


def q108_regr_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
    )


Q108_SQL = """
SELECT l_returnflag,
       CAST(REGR_COUNT(CAST(l_extendedprice AS DOUBLE),
                       CAST(l_quantity AS DOUBLE)) AS BIGINT) AS n,
       ROUND(REGR_SLOPE(CAST(l_extendedprice AS DOUBLE),
                        CAST(l_quantity AS DOUBLE)), 4) AS slope,
       ROUND(REGR_INTERCEPT(CAST(l_extendedprice AS DOUBLE),
                            CAST(l_quantity AS DOUBLE)), 4) AS intercept,
       ROUND(REGR_R2(CAST(l_extendedprice AS DOUBLE),
                     CAST(l_quantity AS DOUBLE)), 6) AS r2,
       ROUND(REGR_AVGX(CAST(l_extendedprice AS DOUBLE),
                       CAST(l_quantity AS DOUBLE)), 6) AS avg_x,
       ROUND(REGR_AVGY(CAST(l_extendedprice AS DOUBLE),
                       CAST(l_quantity AS DOUBLE)), 4) AS avg_y
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q113 — exponential smoothing (EWMA, α=0.5) per user series, in closed
# form: s_n = Σᵢ value_i · 0.5^{w(i)} with w(1)=n−1, w(i>1)=n−i+1 —
# the drift/trend primitive streaming monitors keep per key. α=1/2
# makes every weight an exact power of two, so each term is an EXACT
# IEEE scaling of the input in both engines and only the final sum
# order needs the shared 4dp rendering. Plan: ONE window shuffle on
# user_id (row_number and count share the sort), one per-user agg on
# the same partitioning, one 1-row rollup.
# --------------------------------------------------------------------------


def q113_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    ord_ = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    expo = F.when(F.col("i") == 1, F.col("n") - 1).otherwise(
        F.col("n") - F.col("i") + 1
    )
    s = ord_.groupBy("user_id").agg(
        F.sum(F.col("value") * F.pow(F.lit(0.5), expo)).alias("ewma")
    )
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        r4(F.avg("ewma")).alias("avg_ewma"),
        r4(F.min("ewma")).alias("min_ewma"),
        r4(F.max("ewma")).alias("max_ewma"),
    )


Q113_SQL = """
WITH ord AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT user_id,
         SUM(value * pow(0.5, CASE WHEN i = 1 THEN n - 1
                                   ELSE n - i + 1 END)) AS ewma
  FROM ord GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(ewma), 4) AS avg_ewma,
       ROUND(MIN(ewma), 4) AS min_ewma,
       ROUND(MAX(ewma), 4) AS max_ewma
FROM s
"""


# --------------------------------------------------------------------------
# q114 — association rules over per-user event baskets: support,
# confidence, and lift for every event-type pair — the market-basket
# co-occurrence stage (and the lift statistic behind corpus-mix /
# co-topic audits). Baskets are the DISTINCT (user, type) pairs; the
# pair join is a self-join on user_id whose fan-out is bounded by the
# (small) per-user basket, and the item-count table broadcasts. All
# counts are integers; the three ratios divide identical integers in
# both engines, rendered at 6dp.
# --------------------------------------------------------------------------


def q114_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    basket = (
        load(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    )
    n_users = basket.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    item = basket.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = basket.select("user_id", F.col("event_type").alias("a"))
    b = basket.select("user_id", F.col("event_type").alias("b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("ab"))
    )
    ca = item.select(F.col("event_type").alias("a"), F.col("c").alias("ca"))
    cb = item.select(F.col("event_type").alias("b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "a",
            "b",
            F.col("ab").cast("long").alias("pair_cnt"),
            F.round(F.col("ab") / F.col("n_users"), 6).alias("support"),
            F.round(F.col("ab") / F.col("ca"), 6).alias("confidence"),
            F.round(
                F.col("ab") * F.col("n_users") / (F.col("ca") * F.col("cb")), 6
            ).alias("lift"),
        )
    )


Q114_SQL = """
WITH basket AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM basket),
item AS (SELECT event_type, COUNT(*) AS c FROM basket GROUP BY 1),
pairs AS (
  SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS ab
  FROM basket x JOIN basket y ON x.user_id = y.user_id
  WHERE x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT p.a, p.b, CAST(p.ab AS BIGINT) AS pair_cnt,
       ROUND(CAST(p.ab AS DOUBLE) / n.n_users, 6) AS support,
       ROUND(CAST(p.ab AS DOUBLE) / ia.c, 6) AS confidence,
       ROUND(CAST(p.ab AS DOUBLE) * n.n_users / (ia.c * ib.c), 6) AS lift
FROM pairs p
JOIN item ia ON p.a = ia.event_type
JOIN item ib ON p.b = ib.event_type
CROSS JOIN n
"""


# --------------------------------------------------------------------------
# q116 — LINEAR-INTERPOLATION gap fill over the day grid (the
# interpolate() companion to q99's LOCF): missing days get
# prev + (next−prev)·(day−prev_day)/(next_day−prev_day) between the
# surrounding observations, NULL outside them (no extrapolation).
# Determinism: the daily inputs are rounded to the shared 4dp rendering
# BEFORE interpolation (identical doubles in both engines), day deltas
# are integers, and the interpolation expression is parenthesized
# identically in both dialects — bit-identical results, with a final
# 4dp rendering. Plan: the forward and backward scans are two frames
# of ONE window partitioning (single shuffle on event_type).
# --------------------------------------------------------------------------


def q116_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > _GF_MIN)
        .select("event_type", _eday("ts").alias("day"), "value")
    )
    daily = ev.groupBy("event_type", "day").agg(r4(F.avg("value")).alias("v"))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    g = grid.join(daily, ["event_type", "day"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    prev_v = F.last("v", ignorenulls=True).over(wb)
    prev_d = F.last(obs_day, ignorenulls=True).over(wb)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_d = F.first(obs_day, ignorenulls=True).over(wf)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        prev_v
        + (next_v - prev_v) * ((F.col("day") - prev_d) / (next_d - prev_d))
    )
    return g.select(
        "event_type",
        "day",
        r4(interp).alias("value_interp"),
        F.col("v").isNull().alias("interpolated"),
    )


Q116_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         value
  FROM events WHERE value > {_GF_MIN}
), daily AS (
  SELECT event_type, day, round(avg(value), 4) AS v
  FROM ev GROUP BY 1, 2
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
grid AS (
  SELECT t.event_type, g.day
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(generate_series(d0, d1)) AS day FROM bounds) g
), j AS (
  SELECT g.event_type, g.day, d.v,
         last_value(d.v IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
         first_value(d.v IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
  FROM grid g
  LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
)
SELECT event_type, day,
       round(CASE WHEN v IS NOT NULL THEN v
                  ELSE prev_v + (next_v - prev_v)
                         * ((day - prev_d) / (next_d - prev_d)) END,
             4) AS value_interp,
       v IS NULL AS interpolated
FROM j
"""


# --------------------------------------------------------------------------
# q117 — chi-square drift test between two deterministic corpus halves
# (split = doc_id mod 2): the contingency table of language × split,
# expected counts e = row·col/total, and the χ² statistic
# Σ (o−e)²/e — the distribution-drift / feature-independence gate a
# data pipeline runs between snapshots or shards. All counts are
# integers (exact); e and the χ² terms are identical double
# expressions in both engines, summed then rendered at 4dp. One
# partial-agg shuffle on the (small) contingency key; marginals
# broadcast back.
# --------------------------------------------------------------------------


def q117_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang", (F.col("doc_id") % 2).alias("split")
    )
    o = d.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("o"))
    row = o.groupBy("lang").agg(F.sum("o").alias("rc"))
    col = o.groupBy("split").agg(F.sum("o").alias("cc"))
    tot = o.agg(F.sum("o").alias("n"))
    cell = (
        o.join(F.broadcast(row), "lang")
        .join(F.broadcast(col), "split")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "split",
            "o",
            (
                (F.col("o") - (F.col("rc") * F.col("cc")) / F.col("n"))
                * (F.col("o") - (F.col("rc") * F.col("cc")) / F.col("n"))
                / ((F.col("rc") * F.col("cc")) / F.col("n"))
            ).alias("term"),
        )
    )
    return cell.agg(
        F.sum("o").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        r4(F.sum("term")).alias("chi2"),
    )


Q117_SQL = """
WITH d AS (SELECT lang, doc_id % 2 AS split FROM documents),
o AS (SELECT lang, split, COUNT(*) AS o FROM d GROUP BY 1, 2),
row_m AS (SELECT lang, SUM(o) AS rc FROM o GROUP BY 1),
col_m AS (SELECT split, SUM(o) AS cc FROM o GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM o),
cell AS (
  SELECT o.lang, o.split, o.o,
         (o.o - (r.rc * c.cc) / t.n)
           * (o.o - (r.rc * c.cc) / t.n)
           / ((r.rc * c.cc) / t.n) AS term
  FROM o JOIN row_m r ON o.lang = r.lang
  JOIN col_m c ON o.split = c.split CROSS JOIN tot t
)
SELECT CAST(SUM(o) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(SUM(term), 4) AS chi2
FROM cell
"""


# --------------------------------------------------------------------------
# q120 — Kolmogorov-Smirnov drift statistic of the document-length
# distribution, every language vs the 'en' reference: max |F_lang(v) −
# F_en(v)| over the union value grid — the nonparametric two-sample
# drift test (χ²'s q117 sibling for continuous features). Exactness:
# both CDFs are ratios of integers (cum/n), so every grid evaluation is
# an identical double in both engines; the max is exact and only the
# rendering rounds (6dp). Plan: one (lang, value) count agg, one dense
# grid (langs × distinct values, both tiny after the agg) with a
# running-sum window per lang, one max agg.
# --------------------------------------------------------------------------


def q120_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("lang", "n_chars")
    cnt = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    vals = d.select("n_chars").distinct()
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    grid = langs.crossJoin(vals).join(cnt, ["lang", "n_chars"], "left")
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = grid.select(
        "lang",
        "n_chars",
        (
            F.sum(F.coalesce("c", F.lit(0))).over(w) / F.col("n")
        ).alias("cdf"),
        "n",
    )
    en = cdf.filter(F.col("lang") == "en").select(
        F.col("n_chars").alias("v"), F.col("cdf").alias("cdf_en")
    )
    return (
        cdf.filter(F.col("lang") != "en")
        .join(F.broadcast(en), F.col("n_chars") == F.col("v"))
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.round(F.max(F.abs(F.col("cdf") - F.col("cdf_en"))), 6).alias(
                "ks_stat"
            ),
        )
    )


Q120_SQL = """
WITH cnt AS (
  SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2
), vals AS (SELECT DISTINCT n_chars FROM documents),
langs AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
grid AS (
  SELECT l.lang, v.n_chars, l.n, COALESCE(c.c, 0) AS c
  FROM langs l CROSS JOIN vals v
  LEFT JOIN cnt c ON l.lang = c.lang AND v.n_chars = c.n_chars
), cdf AS (
  SELECT lang, n_chars, n,
         SUM(c) OVER (PARTITION BY lang ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / n AS cdf
  FROM grid
)
SELECT a.lang, CAST(MAX(a.n) AS BIGINT) AS n_docs,
       ROUND(MAX(ABS(a.cdf - b.cdf)), 6) AS ks_stat
FROM cdf a JOIN cdf b ON a.n_chars = b.n_chars AND b.lang = 'en'
WHERE a.lang <> 'en'
GROUP BY a.lang
"""


# --------------------------------------------------------------------------
# q150 — conversion latency: seconds from each user's FIRST click to
# their first purchase AFTER it, with exact median/p90 — the funnel
# complement of q75 (which counts ordered completions; this measures
# the time between them). Latencies are integer epoch differences, so
# min/max/percentile are exact; one per-user agg + one conditional-min
# join + a 1-row rollup.
# --------------------------------------------------------------------------


def q150_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("es").alias("c0"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("es") > F.col("c0"))
        .groupBy("user_id")
        .agg(F.min(F.col("es") - F.col("c0")).alias("latency"))
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("latency").cast("long").alias("min_sec"),
        F.percentile(F.col("latency"), F.lit(0.5)).alias("median_sec"),
        F.percentile(F.col("latency"), F.lit(0.9)).alias("p90_sec"),
        r4(F.avg("latency")).alias("avg_sec"),
    )


Q150_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), first_click AS (
  SELECT user_id, MIN(es) AS c0 FROM ev WHERE event_type = 'click'
  GROUP BY user_id
), conv AS (
  SELECT e.user_id, MIN(e.es - f.c0) AS latency
  FROM ev e JOIN first_click f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.es > f.c0
  GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(latency) AS BIGINT) AS min_sec,
       quantile_cont(latency, 0.5) AS median_sec,
       quantile_cont(latency, 0.9) AS p90_sec,
       ROUND(AVG(latency), 4) AS avg_sec
FROM conv
"""


# --------------------------------------------------------------------------
# q146 — one-way ANOVA F-statistic: does mean event value differ across
# event types? F = (SSB/(k−1)) / (SSW/(n−k)) assembled from per-group
# sums — the multi-group generalization of q131's two-sample test.
# Sums of doubles carry ulp noise only; both engines evaluate the same
# expression over the same per-group aggregates, rendered at 6dp. One
# partial agg on the (tiny) group key + a 1-row combine.
# --------------------------------------------------------------------------


def q146_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_all"),
        F.sum("s").alias("s_all"),
        F.sum("ss").alias("ss_all"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("s_all") * F.col("s_all") / F.col("n_all")
    ssw = F.col("ss_all") - F.col("sb")
    # try_divide: one group (k=1) or all-singleton groups (n=k) zero a
    # denominator — DuckDB renders NULL (deg_one sweep)
    f_stat = F.try_divide(
        F.try_divide(ssb, F.col("k") - 1),
        F.try_divide(ssw, F.col("n_all") - F.col("k")),
    )
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_all").cast("long").alias("n"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
    )


Q146_SQL = """
WITH g AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DOUBLE)) AS s,
         SUM(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS ss
  FROM events GROUP BY event_type
), tot AS (
  SELECT COUNT(*) AS k, SUM(n) AS n_all, SUM(s) AS s_all, SUM(ss) AS ss_all,
         SUM(s * s / n) AS sb
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n_all AS BIGINT) AS n,
       ROUND(sb - s_all * s_all / n_all, 4) AS ss_between,
       ROUND(ss_all - sb, 4) AS ss_within,
       ROUND(((sb - s_all * s_all / n_all) / (k - 1))
             / ((ss_all - sb) / (n_all - k)), 6) AS f_stat
FROM tot
"""


# --------------------------------------------------------------------------
# q147 — Benford first-digit audit of order totals: the observed
# leading-digit distribution of o_totalprice (as integer cents — the
# digit comes from the BIGINT's decimal string, so no float rendering
# is ever compared) against Benford's log₁₀(1+1/d) expectation, with
# the per-digit χ² contribution — the classic fabricated-data /
# data-quality screen. One partial agg on a 9-value key.
# --------------------------------------------------------------------------


def q147_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    ).filter(F.col("digit") >= 1)
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("n_all"))
    exp_p = F.log10(1 + 1 / F.col("digit").cast("double"))
    j = obs.crossJoin(F.broadcast(tot))
    chi_term = (
        (F.col("n") - exp_p * F.col("n_all"))
        * (F.col("n") - exp_p * F.col("n_all"))
        / (exp_p * F.col("n_all"))
    )
    return j.select(
        "digit",
        F.col("n").cast("long").alias("n_obs"),
        F.round(F.col("n") / F.col("n_all"), 6).alias("p_obs"),
        F.round(exp_p, 6).alias("p_benford"),
        F.round(chi_term, 6).alias("chi2_term"),
    )


Q147_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
), obs AS (
  SELECT digit, COUNT(*) AS n FROM d WHERE digit >= 1 GROUP BY digit
), tot AS (SELECT SUM(n) AS n_all FROM obs)
SELECT digit, CAST(n AS BIGINT) AS n_obs,
       ROUND(CAST(n AS DOUBLE) / n_all, 6) AS p_obs,
       ROUND(log10(1 + 1 / CAST(digit AS DOUBLE)), 6) AS p_benford,
       ROUND((n - log10(1 + 1 / CAST(digit AS DOUBLE)) * n_all)
             * (n - log10(1 + 1 / CAST(digit AS DOUBLE)) * n_all)
             / (log10(1 + 1 / CAST(digit AS DOUBLE)) * n_all), 6)
         AS chi2_term
FROM obs CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q143 — ROLLING correlation between two daily series (clicks vs
# purchases per day): corr isn't a window function in either engine, so
# it's assembled from five windowed sums over the same 7-day RANGE
# frame — (nΣxy − ΣxΣy)/√((nΣx² − (Σx)²)(nΣy² − (Σy)²)) — the rolling
# co-movement monitor. The daily inputs are integer counts, so every
# windowed sum is EXACT and both engines evaluate the identical double
# expression; 6dp rendering. Windows short of 3 days emit NULL. One
# shuffle: all five sums share one global day ordering (the series is
# one row per day — window over a rollup, not raw events).
# --------------------------------------------------------------------------


def q143_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        _eday("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("day").agg(
        F.count_if(F.col("event_type") == "click").alias("x"),
        F.count_if(F.col("event_type") == "purchase").alias("y"),
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return daily.select(
        "day",
        F.col("x").cast("long").alias("clicks"),
        F.col("y").cast("long").alias("purchases"),
        F.when(n >= 3, F.round(corr, 6)).alias("corr_7d"),
    )


Q143_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) FILTER (WHERE event_type = 'click') AS x,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS y
  FROM events GROUP BY 1
), win AS (
  SELECT day, x, y,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x * y) OVER w AS sxy,
         SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
  FROM daily
  WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(x AS BIGINT) AS clicks, CAST(y AS BIGINT) AS purchases,
       CASE WHEN n >= 3 THEN
         ROUND((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS corr_7d
FROM win
"""


# --------------------------------------------------------------------------
# q141 — inter-arrival-time distribution per user stream: the gap (in
# seconds) between a user's consecutive events, rolled up per event
# type of the LATER event — the arrival-process diagnostic behind
# rate-limiter sizing and bot detection. Gaps are integer seconds (lag
# over the per-user sort), so min/max/percentile are exact; the mean
# renders at 4dp. One window shuffle on user_id, one agg.
# --------------------------------------------------------------------------


def q141_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = ev.withColumn("gap", F.col("es") - F.lag("es").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap"),
        F.max("gap").cast("long").alias("max_gap"),
        F.percentile(F.col("gap"), F.lit(0.5)).alias("median_gap"),
        r4(F.avg("gap")).alias("avg_gap"),
    )


Q141_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS gap
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap) AS BIGINT) AS min_gap,
       CAST(MAX(gap) AS BIGINT) AS max_gap,
       quantile_cont(gap, 0.5) AS median_gap,
       ROUND(AVG(gap), 4) AS avg_gap
FROM g WHERE gap IS NOT NULL
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q142 — Pareto concentration point: per market segment, the smallest
# number of customers whose spend covers ≥80% of the segment's revenue
# (the 80/20 audit on top of q133's Gini). Spend is integer cents and
# the 80% gate is 5·cumsum ≥ 4·total — pure int64 arithmetic, no float
# threshold to straddle. One descending-rank window per segment (the
# cumsum shares its sort) + one agg.
# --------------------------------------------------------------------------


def q142_pareto_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(cents).alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("x"), F.asc("o_custkey")
    )
    wtot = Window.partitionBy("c_mktsegment")
    ranked = spend.select(
        "c_mktsegment",
        F.row_number().over(w).alias("i"),
        F.sum("x")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("x").over(wtot).alias("tot"),
    )
    return (
        ranked.filter(5 * F.col("cum") >= 4 * F.col("tot"))
        .groupBy("c_mktsegment")
        .agg(F.min("i").cast("long").alias("customers_for_80pct"))
        .join(
            spend.groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).cast("long").alias("n_customers")
            ),
            "c_mktsegment",
        )
    )


Q142_SQL = """
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY x DESC, o_custkey) AS i,
         SUM(x) OVER (PARTITION BY c_mktsegment
                      ORDER BY x DESC, o_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(x) OVER (PARTITION BY c_mktsegment) AS tot
  FROM spend
)
SELECT r.c_mktsegment,
       CAST(MIN(r.i) AS BIGINT) AS customers_for_80pct,
       CAST(MIN(n.n) AS BIGINT) AS n_customers
FROM ranked r
JOIN (SELECT c_mktsegment, COUNT(*) AS n FROM spend GROUP BY 1) n
  ON r.c_mktsegment = n.c_mktsegment
WHERE 5 * r.cum >= 4 * r.tot
GROUP BY r.c_mktsegment
"""


# --------------------------------------------------------------------------
# q138 — AR(1) autoregression per series: φ = REGR_SLOPE(xₜ, xₜ₋₁) of
# each event type's daily mean — the one-number persistence/trend
# diagnostic (φ→1 random-walk-like, φ→0 white noise) behind
# forecasting and drift monitors. The daily means are rounded to the
# shared 4dp rendering BEFORE the lag join (identical doubles both
# engines, the q116 convention); one window and one REGR agg share the
# event_type shuffle.
# --------------------------------------------------------------------------


def q138_ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", _eday("ts").alias("day"), "value"
    )
    daily = ev.groupBy("event_type", "day").agg(r4(F.avg("value")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("v_prev", F.lag("v").over(w)).filter(
        F.col("v_prev").isNotNull()
    )
    return lagged.groupBy("event_type").agg(
        F.regr_count(F.col("v"), F.col("v_prev")).cast("long").alias("n"),
        F.round(F.regr_slope(F.col("v"), F.col("v_prev")), 6).alias("phi"),
        F.round(F.regr_intercept(F.col("v"), F.col("v_prev")), 4).alias(
            "intercept"
        ),
    )


Q138_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         ROUND(AVG(value), 4) AS v
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, v,
         LAG(v) OVER (PARTITION BY event_type ORDER BY day) AS v_prev
  FROM daily
)
SELECT event_type,
       CAST(REGR_COUNT(v, v_prev) AS BIGINT) AS n,
       ROUND(REGR_SLOPE(v, v_prev), 6) AS phi,
       ROUND(REGR_INTERCEPT(v, v_prev), 4) AS intercept
FROM lagged WHERE v_prev IS NOT NULL
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q139 — day-of-week seasonality profile: per (event_type, weekday),
# the mean daily volume and its share of the type's weekly total, plus
# a peak flag — the seasonal-decomposition first pass. Weekday is
# epoch-day arithmetic ((day + 4) mod 7: 1970-01-01 was a Thursday),
# so no calendar/locale dependence; counts are integers and the share
# divides integers, rendered at 6dp.
# --------------------------------------------------------------------------


def q139_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", _eday("ts").alias("day")
    )
    per_dow = ev.select(
        "event_type", ((F.col("day") + 4) % 7).alias("dow")
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return per_dow.select(
        "event_type",
        "dow",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
        (F.col("n") == F.max("n").over(w)).alias("is_peak"),
    )


Q139_SQL = """
WITH d AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow
  FROM events
), per AS (
  SELECT event_type, dow, COUNT(*) AS n FROM d GROUP BY 1, 2
)
SELECT event_type, dow, CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6)
         AS share,
       n = MAX(n) OVER (PARTITION BY event_type) AS is_peak
FROM per
"""


# --------------------------------------------------------------------------
# q131 — two-proportion A/B z-statistic: users split by user_id parity,
# conversion = "has a purchase over 150"; z = (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁))
# — the experiment-readout primitive (q117's χ² generalizes to many
# cells; this is the two-cell special case every A/B dashboard shows).
# All inputs are integer counts; both engines evaluate the identical
# double expression, rendered at 6dp.
# --------------------------------------------------------------------------


def q131_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        # CASE-mirror, not a boolean cast: NULL event fields must count
        # as 0 conversions as the oracle's CASE does (deg_nulls sweep)
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    g = per_user.groupBy((F.col("user_id") % 2).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    a = g.filter(F.col("grp") == 0).select(
        F.col("n").alias("n0"), F.col("k").alias("k0")
    )
    b = g.filter(F.col("grp") == 1).select(
        F.col("n").alias("n1"), F.col("k").alias("k1")
    )
    j = a.crossJoin(b)
    p0 = F.col("k0") / F.col("n0")
    p1 = F.col("k1") / F.col("n1")
    pp = (F.col("k0") + F.col("k1")) / (F.col("n0") + F.col("n1"))
    z = F.try_divide(
        p1 - p0,
        F.sqrt(pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1"))),
    )
    return j.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("k0").cast("long").alias("k0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("k1").cast("long").alias("k1"),
        F.round(p1 - p0, 6).alias("lift"),
        F.round(z, 6).alias("z_stat"),
    )


Q131_SQL = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150
             THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), g AS (
  SELECT user_id % 2 AS grp, COUNT(*) AS n, SUM(conv) AS k
  FROM per_user GROUP BY 1
), j AS (
  SELECT a.n AS n0, a.k AS k0, b.n AS n1, b.k AS k1
  FROM (SELECT * FROM g WHERE grp = 0) a
  CROSS JOIN (SELECT * FROM g WHERE grp = 1) b
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(k0 AS BIGINT) AS k0,
       CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
       ROUND(k1 / n1 - k0 / n0, 6) AS lift,
       ROUND((k1 / n1 - k0 / n0)
             / sqrt(((k0 + k1) / (n0 + n1)) * (1 - (k0 + k1) / (n0 + n1))
                    * (1 / n0 + 1 / n1)), 6) AS z_stat
FROM j
"""


# --------------------------------------------------------------------------
# q132 — equal-width histogram of event values per type: bin =
# floor((v − min)/w) over the GLOBAL min/max (broadcast 1-row agg), so
# every group shares one bin grid — the standard profiling histogram.
# Bin edges are computed from identical doubles in both engines, and a
# value exactly on an edge floors identically; counts are integers.
# --------------------------------------------------------------------------

_HIST_BINS = 10


def q132_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        # try_divide: a constant column has hi == lo → NULL bin, and
        # LEAST skips NULLs on both engines → every row lands in the
        # top bin (deg_one sweep)
        F.least(
            F.floor(
                F.try_divide(
                    F.col("value") - F.col("lo"),
                    (F.col("hi") - F.col("lo")) / _HIST_BINS,
                )
            ).cast("long"),
            F.lit(_HIST_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


Q132_SQL = f"""
WITH bounds AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
SELECT event_type,
       LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / {_HIST_BINS}))
                  AS BIGINT), {_HIST_BINS - 1}) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events CROSS JOIN bounds
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q133 — Gini concentration of customer spend per market segment:
# G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over ascending per-customer spend —
# the inequality/concentration audit (is 1% of customers 90% of
# revenue?). Spend is INTEGER CENTS, ranks are integers, so both
# numerators are exact int64 sums and only the final division renders
# at 6dp. One window shuffle per segment + one agg on the same key.
# --------------------------------------------------------------------------


def q133_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(cents).alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    return ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("x")))
            / (F.count(F.lit(1)) * F.sum("x"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("gini"),
    )


Q133_SQL = """
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, x,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY x, o_custkey) AS i
  FROM spend
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND((2 * SUM(i * x)) / (COUNT(*) * SUM(x))
             - (COUNT(*) + 1) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
FROM ranked GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q161 — three-stage chained funnel (view → click → purchase): each
# stage's entry time is the MIN event time strictly after the previous
# stage's entry — the "first qualifying event after" chain that
# per-user sequence scans express with three conditional-min joins, no
# row-by-row state. Latencies are integer epoch differences; the final
# rollup counts stage survivors and averages the full traversal.
# --------------------------------------------------------------------------


def q161_funnel3_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )

    def stage(prev: DataFrame, etype: str, out: str) -> DataFrame:
        pcol = prev.columns[-1]
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("es") > F.col(pcol))
            .groupBy("user_id", *prev.columns[1:])
            .agg(F.min("es").alias(out))
        )

    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("es").alias("t_view"))
    )
    s2 = stage(s1, "click", "t_click")
    s3 = stage(s2, "purchase", "t_buy")
    return (
        s1.join(s2.select("user_id", "t_click"), "user_id", "left")
        .join(s3.select("user_id", "t_buy"), "user_id", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_viewed"),
            F.count("t_click").cast("long").alias("n_clicked"),
            F.count("t_buy").cast("long").alias("n_purchased"),
            r4(F.avg(F.col("t_buy") - F.col("t_view"))).alias(
                "avg_traversal_sec"
            ),
        )
    )


Q161_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), s1 AS (
  SELECT user_id, MIN(es) AS t_view FROM ev
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, s1.t_view, MIN(e.es) AS t_click
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.es > s1.t_view
  GROUP BY e.user_id, s1.t_view
), s3 AS (
  SELECT e.user_id, s2.t_view, MIN(e.es) AS t_buy
  FROM ev e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.es > s2.t_click
  GROUP BY e.user_id, s2.t_view
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_viewed,
       CAST(COUNT(s2.t_click) AS BIGINT) AS n_clicked,
       CAST(COUNT(s3.t_buy) AS BIGINT) AS n_purchased,
       ROUND(AVG(s3.t_buy - s3.t_view), 4) AS avg_traversal_sec
FROM s1
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


# --------------------------------------------------------------------------
# q162 — multi-grain time rollup (hour → day → week), the continuous-
# aggregate cascade a hypertable store maintains: the Spark side
# aggregates the raw stream ONCE at hour grain, then re-aggregates the
# hourly partial upward (sum-of-sums; two tiny extra shuffles on an
# already-collapsed table). The oracle derives each grain independently
# from the raw rows — a direct check that the cascade loses nothing.
# Counts re-aggregate exactly; value sums differ only in association
# order (r4-rendered).
# --------------------------------------------------------------------------


def q162_multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        F.floor(es / 3600).cast("long").alias("hour"),
        "event_type",
        F.col("value").cast("double").alias("v"),
    )
    hourly = ev.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )

    def up(df: DataFrame, src: str, dst: str, k: int) -> DataFrame:
        return (
            df.withColumn(dst, F.floor(F.col(src) / k).cast("long"))
            .groupBy(dst, "event_type")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        )

    daily = up(hourly, "hour", "day", 24)
    weekly = up(daily, "day", "week", 7)

    def render(df: DataFrame, grain: str, bucket: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.col(bucket).alias("bucket"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            r4(F.col("s")).alias("sum_value"),
        )

    return (
        render(hourly, "hour", "hour")
        .unionByName(render(daily, "day", "day"))
        .unionByName(render(weekly, "week", "week"))
    )


Q162_SQL = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type,
         CAST(value AS DOUBLE) AS v
  FROM events
)
SELECT 'hour' AS grain, es // 3600 AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(v), 4) AS sum_value
FROM ev GROUP BY 2, 3
UNION ALL
SELECT 'day', es // 86400, event_type,
       CAST(COUNT(*) AS BIGINT), ROUND(SUM(v), 4)
FROM ev GROUP BY 2, 3
UNION ALL
SELECT 'week', (es // 86400) // 7, event_type,
       CAST(COUNT(*) AS BIGINT), ROUND(SUM(v), 4)
FROM ev GROUP BY 2, 3
"""


# --------------------------------------------------------------------------
# q163 — seasonal anomaly detection: daily event counts vs the same
# day-of-week baseline (mean ± 2σ across the month's occurrences of
# that weekday). Counts are integers, so the baseline moments are exact
# integer sums and both engines assemble identical doubles; the 2σ gate
# and the rendered z-score therefore agree bit-for-bit. Every scored
# day is emitted with its anomaly flag (on this stable synthetic feed
# no day trips 2σ — a flag-only output would be vacuously green).
# σ = 0 cells are gated out before the division (ANSI mode turns x/0
# into an error, not an Infinity).
# --------------------------------------------------------------------------


def q163_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(
            F.floor(es / 86400).cast("long").alias("day"), "event_type"
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
        .withColumn("dow", (F.col("day") + 4) % 7)
    )
    base = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    j = daily.join(F.broadcast(base), ["event_type", "dow"]).filter(
        F.col("c") > 1
    )
    mu = F.col("s") / F.col("c")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("c")) / (
        F.col("c") - 1
    )
    sigma = F.sqrt(var)
    return (
        j.withColumn("mu", mu)
        .withColumn("sigma", sigma)
        .filter(F.col("sigma") > 0)
        .select(
            "event_type",
            "day",
            F.col("v").cast("long").alias("n_events"),
            F.round((F.col("v") - F.col("mu")) / F.col("sigma"), 4).alias(
                "zscore"
            ),
            (F.abs(F.col("v") - F.col("mu")) > 2 * F.col("sigma")).alias(
                "is_anomaly"
            ),
        )
    )


Q163_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
), d2 AS (
  SELECT *, (day + 4) % 7 AS dow FROM daily
), base AS (
  SELECT event_type, dow, COUNT(*) AS c, SUM(v) AS s, SUM(v * v) AS ss
  FROM d2 GROUP BY 1, 2
), j AS (
  SELECT d2.event_type, d2.day, d2.v,
         b.s / (1.0 * b.c) AS mu,
         sqrt((b.ss - b.s * b.s / (1.0 * b.c)) / (b.c - 1)) AS sigma
  FROM d2 JOIN base b USING (event_type, dow)
  WHERE b.c > 1
)
SELECT event_type, day, CAST(v AS BIGINT) AS n_events,
       ROUND((v - mu) / sigma, 4) AS zscore,
       abs(v - mu) > 2 * sigma AS is_anomaly
FROM j
WHERE sigma > 0
"""


# --------------------------------------------------------------------------
# q164 — Markov chain over per-user event-type sequences: transition
# matrix from consecutive pairs (total order: event second, event_id
# tie-break), then the stationary distribution by 4 fixed power-
# iteration rounds from the uniform start. The 5×5 matrix and 5-row
# vector make each round a toy join — the pattern, not the size, is
# the point (kg65's PageRank is the scaled form). P entries are
# identical doubles in both engines (count/count); four rounds of
# 5-term sums keep cross-engine ulp drift far below the 6dp rendering.
# --------------------------------------------------------------------------

_MK_ROUNDS = 4


def q164_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("a").agg(F.sum("c").alias("t"))
    P = pairs.join(tot, "a").select(
        "a", "b", (F.col("c") / F.col("t")).alias("p")
    ).persist()
    n_states = P.select("a").distinct().count()
    if n_states == 0:  # no transitions at all (oracle: 0 rows)
        P.unpersist()
        return spark.createDataFrame([], "state string, prob double")
    v = P.select("a").distinct().select(
        F.col("a").alias("state"), F.lit(1.0 / n_states).alias("prob")
    )
    for _ in range(_MK_ROUNDS):
        v = (
            P.join(v, P.a == v.state)
            .groupBy(F.col("b").alias("state"))
            .agg(F.sum(F.col("prob") * F.col("p")).alias("prob"))
        )
    out = v.select("state", F.round("prob", 6).alias("prob"))
    P.unpersist()
    return out


def _q164_sql(rounds: int = _MK_ROUNDS) -> str:
    steps = [
        """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), pr AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS b
  FROM ev
), cnt AS (
  SELECT a, b, COUNT(*) AS c FROM pr WHERE b IS NOT NULL GROUP BY a, b
), p AS MATERIALIZED (
  SELECT cnt.a, cnt.b, cnt.c / (1.0 * t.t) AS p
  FROM cnt JOIN (SELECT a, SUM(c) AS t FROM cnt GROUP BY a) t USING (a)
), ns AS (SELECT CAST(COUNT(DISTINCT a) AS DOUBLE) AS n FROM p),
v0 AS (SELECT DISTINCT a AS state, (SELECT 1.0 / n FROM ns) AS prob
       FROM p)"""
    ]
    for k in range(1, rounds + 1):
        steps.append(
            f"""
v{k} AS (SELECT p.b AS state, SUM(v.prob * p.p) AS prob
        FROM p JOIN v{k - 1} v ON p.a = v.state GROUP BY p.b)"""
        )
    return (
        ",".join(steps)
        + f"\nSELECT state, ROUND(prob, 6) AS prob FROM v{rounds}"
    )


# --------------------------------------------------------------------------
# q165 — 2-D activity grid (hour × weekday) with a 3×3 wraparound
# box-blur: the neighborhood-smoothing convolution a heatmap or
# density-estimation stage runs, expressed as a 9-row offset explode +
# re-aggregation (no self-join on the grid). Counts are integers;
# smoothed = sum/9 divides identical integers. Toroidal wrap keeps
# every cell's kernel mass equal.
# --------------------------------------------------------------------------


def q165_grid_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    cells = (
        load(spark, sf_dir, "events")
        .select(
            F.floor((es % 86400) / F.lit(3600)).cast("long").alias("h"),
            ((F.floor(es / 86400) + 4) % 7).cast("long").alias("w"),
        )
        .groupBy("h", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    offs = cells.sparkSession.createDataFrame(
        [(dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1)],
        "dh long, dw long",
    )
    sm = (
        cells.crossJoin(F.broadcast(offs))
        .groupBy(
            ((F.col("h") + F.col("dh") + 24) % 24).alias("h"),
            ((F.col("w") + F.col("dw") + 7) % 7).alias("w"),
        )
        .agg(F.sum("n").alias("s"))
    )
    return cells.join(sm, ["h", "w"]).select(
        F.col("h").alias("hour"),
        F.col("w").alias("dow"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s") / 9.0, 4).alias("smoothed"),
    )


Q165_SQL = """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
), cells AS (
  SELECT (es % 86400) // 3600 AS h, (es // 86400 + 4) % 7 AS w,
         COUNT(*) AS n
  FROM ev GROUP BY 1, 2
), offs AS (
  SELECT o1.dh, o2.dw
  FROM (VALUES (-1), (0), (1)) o1(dh), (VALUES (-1), (0), (1)) o2(dw)
), sm AS (
  SELECT (c.h + o.dh + 24) % 24 AS h, (c.w + o.dw + 7) % 7 AS w,
         SUM(c.n) AS s
  FROM cells c CROSS JOIN offs o GROUP BY 1, 2
)
SELECT c.h AS hour, c.w AS dow, CAST(c.n AS BIGINT) AS n,
       ROUND(s / 9.0, 4) AS smoothed
FROM cells c JOIN sm USING (h, w)
"""


# --------------------------------------------------------------------------
# q169 — STL-lite decomposition of daily event counts: trend = centered
# 7-day moving average (full windows only), seasonal = mean detrended
# value per weekday, residual = remainder. Counts are integers, so the
# trend divides identical integer sums; the seasonal mean averages
# identical doubles (order-only ulp, hidden by r4). The two windows and
# the seasonal mean all share the event_type partitioning — one shuffle.
# Every (type, day) cell is present in this feed, so the ROWS frame is
# calendar-centered; a gappy feed would first densify via q99's grid.
# --------------------------------------------------------------------------


def q169_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(F.floor(es / 86400).cast("long").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    t = (
        daily.withColumn("n7", F.count("v").over(w7))
        .withColumn("trend", F.sum("v").over(w7) / 7.0)
        .filter(F.col("n7") == 7)
        .withColumn("detr", F.col("v") - F.col("trend"))
        .withColumn("dow", (F.col("day") + 4) % 7)
    )
    ws = Window.partitionBy("event_type", "dow")
    return (
        t.withColumn("seasonal", F.avg("detr").over(ws))
        .select(
            "event_type",
            "day",
            F.col("v").cast("long").alias("n_events"),
            r4(F.col("trend")).alias("trend"),
            r4(F.col("seasonal")).alias("seasonal"),
            r4(F.col("detr") - F.col("seasonal")).alias("residual"),
        )
    )


Q169_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, day, v,
         COUNT(v) OVER w AS n7,
         SUM(v) OVER w / 7.0 AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), d AS (
  SELECT event_type, day, v, trend, v - trend AS detr,
         (day + 4) % 7 AS dow
  FROM t WHERE n7 = 7
)
SELECT event_type, day, CAST(v AS BIGINT) AS n_events,
       ROUND(trend, 4) AS trend,
       ROUND(AVG(detr) OVER (PARTITION BY event_type, dow), 4) AS seasonal,
       ROUND(detr - AVG(detr) OVER (PARTITION BY event_type, dow), 4)
         AS residual
FROM d
"""


# --------------------------------------------------------------------------
# q172 — RFM segmentation: per purchasing user, recency (days since
# last purchase, vs the feed's last purchase day), frequency, and
# monetary value in integer cents, each cut into NTILE(10) deciles
# with user_id tie-breaks. Everything is integer, and NTILE's
# first-(n mod k)-buckets-get-one-extra rule is the SQL standard in
# both engines, so the segmentation matches exactly. The three global
# ntile sorts run over the per-user rollup (user-cardinality), not the
# raw stream.
# --------------------------------------------------------------------------


def q172_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    p = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.floor(es / 86400).cast("long").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    agg = p.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("cents").alias("monetary_cents"),
    )
    ref = agg.agg(F.max("last_day").alias("ref_day"))
    a = agg.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.col("ref_day") - F.col("last_day")
    )
    # Scale path (VERDICT r2): three histogram_rank passes replace the
    # three global NTILE sorts — the unpartitioned windows run over the
    # per-measure value histograms (day counts / frequencies / cent
    # totals), never the full user rollup; exact_ntile reproduces the
    # NTILE bucket rule bit-for-bit.
    a = histogram_rank(a, "recency_days", "user_id", out="_rr", total="_n")
    a = histogram_rank(a, "frequency", "user_id", descending=True, out="_rf")
    a = histogram_rank(
        a, "monetary_cents", "user_id", descending=True, out="_rm"
    )
    n = F.col("_n")
    r_d = exact_ntile(F.col("_rr"), n, 10)
    f_d = exact_ntile(F.col("_rf"), n, 10)
    m_d = exact_ntile(F.col("_rm"), n, 10)
    return a.select(
        "user_id",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        F.col("monetary_cents").cast("long").alias("monetary_cents"),
        (
            r_d.cast("long") * 100 + f_d.cast("long") * 10 + m_d.cast("long")
        ).alias("rfm_code"),
    )


Q172_SQL = """
WITH p AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), agg AS (
  SELECT user_id, MAX(day) AS last_day, COUNT(*) AS frequency,
         SUM(cents) AS monetary_cents
  FROM p GROUP BY user_id
), a AS (
  SELECT user_id, (SELECT MAX(last_day) FROM agg) - last_day
           AS recency_days,
         frequency, monetary_cents
  FROM agg
)
SELECT user_id,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_cents AS BIGINT) AS monetary_cents,
       CAST(NTILE(10) OVER (ORDER BY recency_days, user_id) * 100
            + NTILE(10) OVER (ORDER BY frequency DESC, user_id) * 10
            + NTILE(10) OVER (ORDER BY monetary_cents DESC, user_id)
            AS BIGINT) AS rfm_code
FROM a
"""


# --------------------------------------------------------------------------
# q173 — share-of-parent rollup: each nation's revenue as a fraction of
# its region and of the world — the nested contribution margins a
# drill-down report runs, expressed as two window sums over the
# nation-level rollup (no second aggregation pass). Revenue is summed
# in integer cents (rounded per line item with an identical expression
# in both engines), so the shares divide exact integers.
# --------------------------------------------------------------------------


def q173_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("cents"),
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("cents").alias("cents"))
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    return rev.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        F.col("cents").cast("long").alias("nation_cents"),
        F.round(F.col("cents") / F.sum("cents").over(wr), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("cents") / F.sum("cents").over(wt), 6).alias(
            "share_of_total"
        ),
    )


Q173_SQL = """
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, CAST(cents AS BIGINT) AS nation_cents,
       ROUND(cents / (1.0 * SUM(cents) OVER (PARTITION BY region)), 6)
         AS share_of_region,
       ROUND(cents / (1.0 * SUM(cents) OVER ()), 6) AS share_of_total
FROM rev
"""


# --------------------------------------------------------------------------
# q175 — largest-remainder (Hamilton) apportionment: allocate a fixed
# integer budget across nations proportional to revenue. floor shares
# come from exact 128-bit-safe integer division (cents·B < 2^63), the
# leftover units go to the largest integer remainders (nation-name
# tie-break) — the allocation every rounded percentage table needs to
# sum exactly to 100%. Pure integer arithmetic end to end.
# --------------------------------------------------------------------------

_ALLOC_BUDGET = 1_000_000


def q175_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("cents").alias("cents"))
    )
    wt = Window.partitionBy()
    b = F.lit(_ALLOC_BUDGET)
    num = F.col("cents") * b
    tot = F.sum("cents").over(wt)
    a = rev.select(
        "n_name",
        "cents",
        F.expr(f"cents * {_ALLOC_BUDGET} div sum(cents) over ()").alias(
            "fl"
        ),
        (num % tot).alias("rem"),
    )
    leftover = b - F.sum("fl").over(wt)
    ranked = a.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rem"), "n_name"))
    ).withColumn("leftover", leftover)
    return ranked.select(
        F.col("n_name").alias("nation"),
        F.col("cents").cast("long").alias("cents"),
        (
            F.col("fl") + (F.col("rk") <= F.col("leftover")).cast("long")
        ).alias("alloc"),
    )


Q175_SQL = f"""
WITH rev AS (
  SELECT n.n_name AS nation,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
), a AS (
  SELECT nation, cents,
         (cents * {_ALLOC_BUDGET}) // SUM(cents) OVER () AS fl,
         (cents * {_ALLOC_BUDGET}) % SUM(cents) OVER () AS rem
  FROM rev
), r AS (
  SELECT nation, cents, fl,
         ROW_NUMBER() OVER (ORDER BY rem DESC, nation) AS rk,
         {_ALLOC_BUDGET} - SUM(fl) OVER () AS leftover
  FROM a
)
SELECT nation, CAST(cents AS BIGINT) AS cents,
       CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM r
"""


# --------------------------------------------------------------------------
# q177 — Wilson 95% confidence interval on each source's share of
# English documents: the score interval (not the normal approximation)
# a guardrail metric or A/B readout should use at small n. k and n are
# integers, so both engines assemble the identical doubles; z = 1.96
# enters as the same literal.
# --------------------------------------------------------------------------

_WILSON_Z = 1.96


def q177_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("k")
    )
    z = F.lit(_WILSON_Z)
    nn = F.col("n").cast("double")
    p = F.col("k") / nn
    z2 = z * z
    denom = 1.0 + z2 / nn
    center = p + z2 / (2.0 * nn)
    half = z * F.sqrt(p * (1.0 - p) / nn + z2 / (4.0 * nn * nn))
    return g.select(
        "source",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_en"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


Q177_SQL = f"""
WITH g AS (
  SELECT source, COUNT(*) AS n,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS k
  FROM documents GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_en,
       ROUND(k / CAST(n AS DOUBLE), 6) AS p_hat,
       ROUND((k / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z}
              / (2.0 * n)
              - {_WILSON_Z} * sqrt(k / CAST(n AS DOUBLE)
                * (1.0 - k / CAST(n AS DOUBLE)) / n
                + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_lo,
       ROUND((k / CAST(n AS DOUBLE) + {_WILSON_Z} * {_WILSON_Z}
              / (2.0 * n)
              + {_WILSON_Z} * sqrt(k / CAST(n AS DOUBLE)
                * (1.0 - k / CAST(n AS DOUBLE)) / n
                + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_hi
FROM g
"""


# --------------------------------------------------------------------------
# q180 — Spearman rank correlation between order price and order date
# per priority class: Pearson on ROW-NUMBER ranks (orderkey tie-break
# gives a deterministic total order). Rank moments are summed as
# DOUBLES: integer sums overflow int64 near n≈86k per group (sx≈n²/2
# so sx·sx≈n⁴/4 > 2⁶³ — ANSI Spark throws while DuckDB silently
# promotes to HUGEINT, diverging the twins at scale). Rank products
# are integer-valued doubles, exact (and order-independent) while the
# running sums stay below 2⁵³ — n ≤ ~3·10⁵ per group for Σrx²; beyond
# that IEEE rounding error is ~n·2⁻⁵³ relative, far inside the 6dp
# render until n≈10¹⁰. The rank-based complement of q58's Pearson
# family — robust to monotone-but-nonlinear relationships.
# --------------------------------------------------------------------------


def q180_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").cast("timestamp_ltz").cast("long").alias("es"),
    )
    wp = Window.partitionBy("o_orderpriority")
    rx = F.row_number().over(wp.orderBy("cents", "o_orderkey"))
    ry = F.row_number().over(wp.orderBy("es", "o_orderkey"))
    r = o.select(
        "o_orderpriority",
        rx.cast("double").alias("rx"),
        ry.cast("double").alias("ry"),
    )
    g = r.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum("rx").alias("sx"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
    )
    # ranks are permutations of 1..n, so Σry = Σrx and Σry² = Σrx²
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return g.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        # try_divide: a single-row group has zero rank variance
        F.round(F.try_divide(num, den), 6).alias("spearman_rho"),
    )


Q180_SQL = """
WITH o AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS es
  FROM orders
), r AS (
  SELECT o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY cents, o_orderkey) AS rx,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY es, o_orderkey) AS ry
  FROM o
), g AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         SUM(CAST(rx AS DOUBLE) * ry) AS sxy,
         SUM(CAST(rx AS DOUBLE)) AS sx,
         SUM(CAST(rx AS DOUBLE) * rx) AS sxx
  FROM r GROUP BY 1
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sx) / (n * sxx - sx * sx), 6)
         AS spearman_rho
FROM g
"""


# --------------------------------------------------------------------------
# q182 — burstiness (Fano factor) of daily event counts per type:
# variance-to-mean ratio of an integer count series. 1 ≈ Poisson,
# > 1 bursty, < 1 regular — the dispersion diagnostic a rate-limiter
# or anomaly baseline needs before assuming Poisson. Integer sums
# throughout; both engines assemble the identical doubles.
# --------------------------------------------------------------------------


def q182_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(F.floor(es / 86400).cast("long").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    # a type active on a single day has no sample variance — (d-1)=0
    # would render 0/0 NaN here while the SQL twin may error (q163's
    # c>1 gate, same reasoning)
    g = g.filter(F.col("d") > 1)
    mean = F.col("s") / F.col("d")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("d")) / (
        F.col("d") - 1
    )
    return g.select(
        "event_type",
        F.col("d").cast("long").alias("n_days"),
        F.round(mean, 4).alias("mean_daily"),
        F.round(var / mean, 6).alias("fano_factor"),
    )


Q182_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, COUNT(*) AS d, SUM(v) AS s, SUM(v * v) AS ss
  FROM daily GROUP BY 1
)
SELECT event_type, CAST(d AS BIGINT) AS n_days,
       ROUND(s / (1.0 * d), 4) AS mean_daily,
       ROUND(((ss - s * s / (1.0 * d)) / (d - 1)) / (s / (1.0 * d)), 6)
         AS fano_factor
FROM g WHERE d > 1
"""


# --------------------------------------------------------------------------
# q183 — Jensen-Shannon divergence between the first and last week's
# event-type mix: JS = H(M) − (H(P)+H(Q))/2 with M the even mixture —
# the bounded, symmetric drift metric that complements q117's χ² and
# q120's KS (which test counts and CDFs; JS compares distributions as
# distributions). Probabilities are integer-count ratios, so both
# engines feed identical doubles into ln.
# --------------------------------------------------------------------------


def q183_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.floor(es / 86400).cast("long").alias("day")
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    tagged = (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn(
            "wk",
            F.when(F.col("day") < F.col("d0") + 7, F.lit("p"))
            .when(F.col("day") > F.col("d1") - 7, F.lit("q"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("wk").isNotNull())
    )
    c = (
        tagged.groupBy("event_type")
        .agg(
            F.count_if(F.col("wk") == "p").alias("cp"),
            F.count_if(F.col("wk") == "q").alias("cq"),
        )
    )
    tot = c.agg(F.sum("cp").alias("np"), F.sum("cq").alias("nq"))
    j = c.crossJoin(F.broadcast(tot))
    # try_divide: a corpus whose span is under two weeks can leave one
    # side empty (np or nq = 0) — DuckDB renders the share NULL and the
    # NULL propagates through the mixture terms (deg_one sweep)
    p = F.try_divide("cp", "np")
    q = F.try_divide("cq", "nq")
    m = (p + q) / 2
    term = (
        F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / 2
    return j.agg(
        F.sum("cp").cast("long").alias("n_first_week"),
        F.sum("cq").cast("long").alias("n_last_week"),
        F.round(F.sum(term), 6).alias("js_divergence"),
    )


Q183_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
t AS (
  SELECT event_type,
         CASE WHEN day < b.d0 + 7 THEN 'p'
              WHEN day > b.d1 - 7 THEN 'q' END AS wk
  FROM ev, b
  WHERE day < b.d0 + 7 OR day > b.d1 - 7
), c AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE wk = 'p') AS cp,
         COUNT(*) FILTER (WHERE wk = 'q') AS cq
  FROM t GROUP BY 1
), tot AS (SELECT SUM(cp) AS np, SUM(cq) AS nq FROM c)
SELECT CAST(SUM(cp) AS BIGINT) AS n_first_week,
       CAST(SUM(cq) AS BIGINT) AS n_last_week,
       ROUND(SUM(
         (CASE WHEN cp > 0 THEN (cp / (1.0 * np))
               * ln((cp / (1.0 * np))
                    / ((cp / (1.0 * np) + cq / (1.0 * nq)) / 2))
               ELSE 0 END
          + CASE WHEN cq > 0 THEN (cq / (1.0 * nq))
               * ln((cq / (1.0 * nq))
                    / ((cp / (1.0 * np) + cq / (1.0 * nq)) / 2))
               ELSE 0 END) / 2), 6) AS js_divergence
FROM c, tot
"""


# --------------------------------------------------------------------------
# q184 — top-k contributors with an OTHER rollup: the 5 biggest
# spenders per market segment keep their identity, the long tail
# collapses into one OTHER row per segment — the reporting shape every
# "top customers" dashboard needs, built from ONE rank window and a
# conditional re-group (no anti-join pass). Integer cents; rank ties
# break on custkey.
# --------------------------------------------------------------------------


def q184_topk_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("cents"), F.asc("o_custkey")
    )
    ranked = spend.withColumn("rk", F.row_number().over(w))
    bucket = F.when(
        F.col("rk") <= 5, F.col("o_custkey").cast("string")
    ).otherwise(F.lit("OTHER"))
    return (
        ranked.groupBy(
            F.col("c_mktsegment").alias("segment"), bucket.alias("who")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


Q184_SQL = """
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY cents DESC, o_custkey) AS rk
  FROM spend
)
SELECT c_mktsegment AS segment,
       CASE WHEN rk <= 5 THEN CAST(o_custkey AS VARCHAR)
            ELSE 'OTHER' END AS who,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM ranked GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q185 — forecasting feature table: per (event_type, day), the lag-1 /
# lag-7 counts and the trailing-28-day mean — the feature
# materialization step ahead of any AR-style model (q138/q171 fit on
# exactly these shapes). One window partitioning serves all three
# features; counts are integers and the trailing mean divides the
# actual window row count (no edge-padding fabrication).
# --------------------------------------------------------------------------


def q185_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(F.floor(es / 86400).cast("long").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    w28 = w.rowsBetween(-28, -1)
    return daily.select(
        "event_type",
        "day",
        F.col("v").cast("long").alias("n"),
        F.lag("v", 1).over(w).cast("long").alias("lag1"),
        F.lag("v", 7).over(w).cast("long").alias("lag7"),
        F.round(F.avg("v").over(w28), 4).alias("trailing28_mean"),
    )


Q185_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, CAST(v AS BIGINT) AS n,
       CAST(LAG(v, 1) OVER w AS BIGINT) AS lag1,
       CAST(LAG(v, 7) OVER w AS BIGINT) AS lag7,
       ROUND(AVG(v) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING), 4)
         AS trailing28_mean
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


# --------------------------------------------------------------------------
# q187 — population stability index (PSI) of event value between the
# first and last week, over 10 equal-width bins of the observed range:
# PSI = Σ (p−q)·ln(p/q) — the binned-continuous drift score that
# complements χ² (q117, counts), KS (q120, CDFs), and JS (q183,
# categories). Bin edges come from integer-exact min/max; empty cells
# get the standard 0.5-count smoothing so the log is always finite,
# keeping both engines on identical doubles.
# --------------------------------------------------------------------------

_PSI_BINS = 10


def q187_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("x"),
        F.floor(es / 86400).cast("long").alias("day"),
    )
    b = ev.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )
    t = (
        ev.crossJoin(F.broadcast(b))
        .withColumn(
            "wk",
            F.when(F.col("day") < F.col("d0") + 7, F.lit("p"))
            .when(F.col("day") > F.col("d1") - 7, F.lit("q"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("wk").isNotNull())
        .withColumn(
            "bin",
            # try_divide + NULL-skipping LEAST: constant x → top bin
            # on both engines (q132's note; deg_one sweep)
            F.least(
                F.floor(
                    F.try_divide(
                        F.col("x") - F.col("lo"),
                        (F.col("hi") - F.col("lo")) / _PSI_BINS,
                    )
                ),
                F.lit(_PSI_BINS - 1),
            ).cast("long"),
        )
    )
    c = t.groupBy("bin").agg(
        F.count_if(F.col("wk") == "p").alias("cp"),
        F.count_if(F.col("wk") == "q").alias("cq"),
    )
    tot = c.agg(F.sum("cp").alias("np"), F.sum("cq").alias("nq"))
    j = c.crossJoin(F.broadcast(tot))
    p = (F.col("cp") + 0.5) / (F.col("np") + 0.5 * _PSI_BINS)
    q = (F.col("cq") + 0.5) / (F.col("nq") + 0.5 * _PSI_BINS)
    return j.agg(
        F.sum("cp").cast("long").alias("n_first_week"),
        F.sum("cq").cast("long").alias("n_last_week"),
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
    )


Q187_SQL = f"""
WITH ev AS (
  SELECT CAST(value AS DOUBLE) AS x,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), b AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1, MIN(x) AS lo, MAX(x) AS hi
  FROM ev
), t AS (
  SELECT CASE WHEN day < b.d0 + 7 THEN 'p'
              WHEN day > b.d1 - 7 THEN 'q' END AS wk,
         LEAST(CAST(floor((x - b.lo) / ((b.hi - b.lo) / {_PSI_BINS}))
                    AS BIGINT), {_PSI_BINS - 1}) AS bin
  FROM ev, b
  WHERE day < b.d0 + 7 OR day > b.d1 - 7
), c AS (
  SELECT bin,
         COUNT(*) FILTER (WHERE wk = 'p') AS cp,
         COUNT(*) FILTER (WHERE wk = 'q') AS cq
  FROM t GROUP BY 1
), tot AS (SELECT SUM(cp) AS np, SUM(cq) AS nq FROM c)
SELECT CAST(SUM(cp) AS BIGINT) AS n_first_week,
       CAST(SUM(cq) AS BIGINT) AS n_last_week,
       ROUND(SUM(((cp + 0.5) / (np + 0.5 * {_PSI_BINS})
                  - (cq + 0.5) / (nq + 0.5 * {_PSI_BINS}))
                 * ln(((cp + 0.5) / (np + 0.5 * {_PSI_BINS}))
                      / ((cq + 0.5) / (nq + 0.5 * {_PSI_BINS})))), 6)
         AS psi
FROM c, tot
"""


# --------------------------------------------------------------------------
# q188 — Tukey fences per event type: Q1/Q3 by exact linear-interpolated
# quantiles (F.percentile ↔ quantile_cont, the q37 idiom), outliers
# beyond 1.5·IQR counted on both tails. The boxplot/robust-fence
# complement of q73's z-score and q105's MAD outliers. Fence compares
# run on identical doubles (quantiles of the same value multiset).
# --------------------------------------------------------------------------


def q188_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("x")
    )
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("x"), F.lit(0.25)).alias("q1"),
        F.percentile(F.col("x"), F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    j = ev.join(F.broadcast(q), "event_type")
    return (
        j.groupBy("event_type")
        .agg(
            F.min("n").cast("long").alias("n"),
            r4(F.min("q1")).alias("q1"),
            r4(F.min("q3")).alias("q3"),
            F.count_if(F.col("x") < lo).cast("long").alias("n_low"),
            F.count_if(F.col("x") > hi).cast("long").alias("n_high"),
        )
    )


Q188_SQL = """
WITH q AS (
  SELECT event_type, COUNT(*) AS n,
         quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type, CAST(MIN(q.n) AS BIGINT) AS n,
       ROUND(MIN(q.q1), 4) AS q1, ROUND(MIN(q.q3), 4) AS q3,
       CAST(COUNT(*) FILTER (
         WHERE CAST(e.value AS DOUBLE) < q.q1 - 1.5 * (q.q3 - q.q1))
         AS BIGINT) AS n_low,
       CAST(COUNT(*) FILTER (
         WHERE CAST(e.value AS DOUBLE) > q.q3 + 1.5 * (q.q3 - q.q1))
         AS BIGINT) AS n_high
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q189 — exponentially decayed engagement score: per user,
# Σ 2^(−⌊age_weeks⌋) over their events, newest events counting full
# weight. Flooring the age to whole weeks makes every weight an exact
# dyadic (1, ½, ¼, ⅛, 1/16) — the sum is EXACT in IEEE double in any
# association order, so no rounding discipline is needed at all (the
# only such double aggregation on the surface besides q113's EWMA).
# --------------------------------------------------------------------------


def q189_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.floor(es / 86400).cast("long").alias("day")
    )
    ref = ev.agg(F.max("day").alias("ref_day"))
    w = F.pow(F.lit(2.0), -F.floor((F.col("ref_day") - F.col("day")) / 7))
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(w).alias("decayed_score"),
        )
    )


Q189_SQL = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), r AS (SELECT MAX(day) AS ref_day FROM ev)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(pow(2.0, -((r.ref_day - day) // 7))) AS decayed_score
FROM ev, r
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q194 — absorption probabilities on the event-type Markov chain:
# P(reach 'purchase' before 'error' | current state), by 6 rounds of
# value iteration v ← P·[b absorbing ? 0/1 : v(b)] from v₀ = 0 — the
# fixed-point linear solve (I−Q)v = R·1 a funnel-escape analysis needs,
# without matrix inversion. q164's transition machinery reused; the
# oracle unrolls the same recurrence. Transition probabilities are
# count ratios (identical doubles); six 5-term contractions stay far
# inside the 6dp render.
# --------------------------------------------------------------------------

_ABS_WIN, _ABS_LOSS = "purchase", "error"
_ABS_ROUNDS = 6


def q194_absorption_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("a").agg(F.sum("c").alias("t"))
    P = (
        pairs.join(tot, "a")
        .filter(~F.col("a").isin(_ABS_WIN, _ABS_LOSS))
        .select("a", "b", (F.col("c") / F.col("t")).alias("p"))
        .localCheckpoint()
    )
    v = P.select(F.col("a").alias("state")).distinct().select(
        "state", F.lit(0.0).alias("v")
    )
    for _ in range(_ABS_ROUNDS):
        vb = F.when(F.col("b") == _ABS_WIN, F.lit(1.0)).when(
            F.col("b") == _ABS_LOSS, F.lit(0.0)
        )
        j = P.join(
            v.select(F.col("state").alias("_bs"), F.col("v").alias("_bv")),
            P.b == F.col("_bs"),
            "left",
        )
        v = (
            j.groupBy(F.col("a").alias("state"))
            .agg(
                F.sum(
                    F.col("p")
                    * F.coalesce(vb, F.coalesce("_bv", F.lit(0.0)))
                ).alias("v")
            )
            .localCheckpoint()
        )
    return v.select("state", F.round("v", 6).alias("p_win"))


def _q194_sql(rounds: int = _ABS_ROUNDS) -> str:
    steps = [
        f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), pr AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS b
  FROM ev
), cnt AS (
  SELECT a, b, COUNT(*) AS c FROM pr WHERE b IS NOT NULL GROUP BY a, b
), p AS MATERIALIZED (
  SELECT cnt.a, cnt.b, cnt.c / (1.0 * t.t) AS p
  FROM cnt JOIN (SELECT a, SUM(c) AS t FROM cnt GROUP BY a) t USING (a)
  WHERE cnt.a NOT IN ('{_ABS_WIN}', '{_ABS_LOSS}')
),
v0 AS (SELECT DISTINCT a AS state, CAST(0 AS DOUBLE) AS v FROM p)"""
    ]
    for k in range(1, rounds + 1):
        steps.append(
            f"""
v{k} AS (SELECT p.a AS state,
        SUM(p.p * CASE WHEN p.b = '{_ABS_WIN}' THEN 1.0
                       WHEN p.b = '{_ABS_LOSS}' THEN 0.0
                       ELSE COALESCE(v.v, 0) END) AS v
        FROM p LEFT JOIN v{k - 1} v ON p.b = v.state GROUP BY p.a)"""
        )
    return (
        ",".join(steps)
        + f"\nSELECT state, ROUND(v, 6) AS p_win FROM v{rounds}"
    )


# --------------------------------------------------------------------------
# q195 — longest same-event streak per user (gaps-and-islands with the
# row_number-difference island key, q90's idiom turned on run-length):
# the distribution of each user's maximum consecutive-repeat run — the
# repetition diagnostic for bot/replay detection. Two window passes
# share the user partitioning; everything integer.
# --------------------------------------------------------------------------


def q195_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy(
        "es", "event_id"
    )
    isl = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w) - F.row_number().over(wt)).alias("isl"),
    )
    streaks = isl.groupBy("user_id", "event_type", "isl").agg(
        F.count(F.lit(1)).alias("len")
    )
    mx = streaks.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return mx.groupBy("max_streak").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).select(F.col("max_streak").cast("long").alias("max_streak"), "n_users")


Q195_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), isl AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY es, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY es, event_id) AS isl
  FROM ev
), streaks AS (
  SELECT user_id, COUNT(*) AS len
  FROM isl GROUP BY user_id, event_type, isl
), mx AS (
  SELECT user_id, MAX(len) AS max_streak FROM streaks GROUP BY user_id
)
SELECT CAST(max_streak AS BIGINT) AS max_streak,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM mx GROUP BY 1
"""


# --------------------------------------------------------------------------
# q196 — contribution analysis / delta decomposition: the week-over-
# week change in total purchase value broken down by (event_type ×
# weekday-vs-weekend) cell, with each cell's share of the total delta.
# The additivity property (cell deltas sum exactly to the total delta)
# holds because everything is integer cents — the root-cause drill-down
# a metrics dashboard runs when a topline moves.
# --------------------------------------------------------------------------


def q196_delta_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(es / 86400).cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    t = (
        ev.crossJoin(F.broadcast(b))
        .withColumn(
            "wk",
            F.when(F.col("day") < F.col("d0") + 7, F.lit("p"))
            .when(F.col("day") > F.col("d1") - 7, F.lit("q"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("wk").isNotNull())
        .withColumn(
            "daypart",
            F.when((F.col("day") + 4) % 7 >= 5, F.lit("weekend")).otherwise(
                F.lit("weekday")
            ),
        )
    )
    g = t.groupBy("event_type", "daypart").agg(
        F.sum(F.when(F.col("wk") == "p", F.col("cents")).otherwise(0)).alias(
            "cents_first"
        ),
        F.sum(F.when(F.col("wk") == "q", F.col("cents")).otherwise(0)).alias(
            "cents_last"
        ),
    )
    delta = F.col("cents_last") - F.col("cents_first")
    wt = Window.partitionBy()
    return g.select(
        "event_type",
        "daypart",
        F.col("cents_first").cast("long").alias("cents_first"),
        F.col("cents_last").cast("long").alias("cents_last"),
        delta.cast("long").alias("delta_cents"),
        F.round(delta / F.sum(delta).over(wt), 6).alias("share_of_delta"),
    )


Q196_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
t AS (
  SELECT event_type, cents,
         CASE WHEN day < b.d0 + 7 THEN 'p'
              WHEN day > b.d1 - 7 THEN 'q' END AS wk,
         CASE WHEN (day + 4) % 7 >= 5 THEN 'weekend'
              ELSE 'weekday' END AS daypart
  FROM ev, b
  WHERE day < b.d0 + 7 OR day > b.d1 - 7
), g AS (
  SELECT event_type, daypart,
         SUM(CASE WHEN wk = 'p' THEN cents ELSE 0 END) AS cents_first,
         SUM(CASE WHEN wk = 'q' THEN cents ELSE 0 END) AS cents_last
  FROM t GROUP BY 1, 2
)
SELECT event_type, daypart,
       CAST(cents_first AS BIGINT) AS cents_first,
       CAST(cents_last AS BIGINT) AS cents_last,
       CAST(cents_last - cents_first AS BIGINT) AS delta_cents,
       ROUND((cents_last - cents_first)
             / (1.0 * SUM(cents_last - cents_first) OVER ()), 6)
         AS share_of_delta
FROM g
"""


# --------------------------------------------------------------------------
# q198 — naive-forecast error metrics: score lag-7 (same weekday last
# week) as a forecaster of daily counts, per event type — WAPE, sMAPE,
# and bias over the days where the lag exists. Closes the forecasting
# loop opened by q185's feature table: feature → naive baseline →
# error metric. Counts are integers, so |v − lag7| sums exactly and
# every metric divides integers (sMAPE denominators are integer sums
# of integer pairs).
# --------------------------------------------------------------------------


def q198_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(F.floor(es / 86400).cast("long").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    f = daily.withColumn("yhat", F.lag("v", 7).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    err = F.abs(F.col("v") - F.col("yhat"))
    return f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.sum(err) / F.sum("v"), 6).alias("wape"),
        F.round(
            F.sum(2.0 * err / (F.col("v") + F.col("yhat")))
            / F.count(F.lit(1)),
            6,
        ).alias("smape"),
        (F.sum("yhat") - F.sum("v")).cast("long").alias("bias_units"),
    )


Q198_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
), f AS (
  SELECT event_type, v,
         LAG(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
  FROM daily
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(SUM(abs(v - yhat)) / (1.0 * SUM(v)), 6) AS wape,
       ROUND(SUM(2.0 * abs(v - yhat) / (v + yhat)) / COUNT(*), 6)
         AS smape,
       CAST(SUM(yhat) - SUM(v) AS BIGINT) AS bias_units
FROM f WHERE yhat IS NOT NULL
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q199 — Cohen's d effect size of weekend vs weekday event values per
# type: mean difference over the pooled standard deviation — the
# magnitude companion to q131's significance z-test (significant ≠
# large). Moments come from one grouped pass; the pooled variance
# assembles sums of doubles into the identical expression in both
# engines, rendered at 6dp.
# --------------------------------------------------------------------------


def q199_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("x"),
        ((F.floor(es / 86400) + 4) % 7 >= 5).alias("wk"),
    )
    g = ev.groupBy("event_type", "wk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    a = g.filter(F.col("wk")).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    b = g.filter(~F.col("wk")).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("ss").alias("ss2"),
    )
    # single-observation sides have no sample variance — (n-1)=0 NaNs
    # the pooled sd (q182's d>1 gate, same reasoning)
    j = a.join(b, "event_type").filter(
        (F.col("n1") > 1) & (F.col("n2") > 1)
    )
    m1 = F.col("s1") / F.col("n1")
    m2 = F.col("s2") / F.col("n2")
    v1 = (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    pooled = F.sqrt(
        ((F.col("n1") - 1) * v1 + (F.col("n2") - 1) * v2)
        / (F.col("n1") + F.col("n2") - 2)
    )
    return j.select(
        "event_type",
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
        F.round(m1 - m2, 4).alias("mean_diff"),
        F.round((m1 - m2) / pooled, 6).alias("cohens_d"),
    )


Q199_SQL = """
WITH ev AS (
  SELECT event_type, CAST(value AS DOUBLE) AS x,
         ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7) >= 5 AS wk
  FROM events
), g AS (
  SELECT event_type, wk, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS ss
  FROM ev GROUP BY 1, 2
), j AS (
  SELECT a.event_type,
         a.n AS n1, a.s AS s1, a.ss AS ss1,
         b.n AS n2, b.s AS s2, b.ss AS ss2
  FROM g a JOIN g b ON a.event_type = b.event_type
  WHERE a.wk AND NOT b.wk AND a.n > 1 AND b.n > 1
)
SELECT event_type,
       CAST(n1 AS BIGINT) AS n_weekend,
       CAST(n2 AS BIGINT) AS n_weekday,
       ROUND(s1 / n1 - s2 / n2, 4) AS mean_diff,
       ROUND((s1 / n1 - s2 / n2)
             / sqrt(((n1 - 1) * ((ss1 - s1 * s1 / n1) / (n1 - 1))
                     + (n2 - 1) * ((ss2 - s2 * s2 / n2) / (n2 - 1)))
                    / (n1 + n2 - 2)), 6) AS cohens_d
FROM j
"""


# --------------------------------------------------------------------------
# q205 — velocity check (fraud-ops): events per user in the TRAILING
# hour at row grain, via an event-time RANGE frame — the windowed form
# of a rate limiter. Rows whose trailing-hour count crosses the
# threshold are flagged; output is the per-user maximum velocity and
# flag count (row-grain output would be the quarantine side). q122
# exercised RANGE frames at daily grain; this is the per-event form
# every abuse pipeline runs. Integer counts, exact.
# --------------------------------------------------------------------------

_VELOCITY_MAX = 4


def q205_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select("user_id", es.alias("es"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-3600, 0)
    )
    v = ev.withColumn("vel", F.count(F.lit(1)).over(w))
    return v.groupBy("user_id").agg(
        F.max("vel").cast("long").alias("max_velocity"),
        F.count_if(F.col("vel") > _VELOCITY_MAX)
        .cast("long")
        .alias("n_flagged"),
    )


Q205_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
), v AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY es
                        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
           AS vel
  FROM ev
)
SELECT user_id, CAST(MAX(vel) AS BIGINT) AS max_velocity,
       CAST(COUNT(*) FILTER (WHERE vel > {_VELOCITY_MAX}) AS BIGINT)
         AS n_flagged
FROM v GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q206 — activity bitmask: each user's presence over the feed's FIRST
# 64 DAYS packed into one int64 via bit_or(1 << day_offset) — the
# bitmap-index representation
# (roaring-lite) that makes retention/overlap queries single-AND
# operations. Emitted per user with the popcount (active days) and the
# longest run of consecutive active days decoded from the mask by a
# shift-AND fold — all integer, exact.
# --------------------------------------------------------------------------


def q206_activity_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.floor(es / 86400).cast("long").alias("day")
    )
    b = ev.distinct().crossJoin(
        F.broadcast(ev.agg(F.min("day").alias("d0")))
    )
    # the mask window is EXPLICITLY the first 64 days: Spark's
    # shiftleft wraps the shift amount mod 64 (day 64 would alias day
    # 0, silently corrupting masks/popcounts/streaks) while DuckDB's
    # << does not — clamp in both twins so a longer feed narrows the
    # window instead of aliasing
    b = b.filter(F.col("day") - F.col("d0") < 64)
    mask = b.groupBy("user_id").agg(
        F.expr("bit_or(shiftleft(1L, cast(day - d0 as int)))").alias("mask")
    )
    return mask.select(
        "user_id",
        "mask",
        F.bit_count("mask").cast("long").alias("days_active"),
        _longest_run(F.col("mask")).alias("longest_streak_days"),
    )


def _longest_run(mask) -> F.Column:
    """Length of the longest 1-run in a 30-bit mask: run ≥ k iff
    mask & (mask<<1) & … & (mask<<(k−1)) is nonzero. Each step ANDs the
    PREVIOUS accumulator with a fresh shift of the base mask — the
    self-referential form m = m & (m<<1) duplicates the whole subtree
    per step (2³⁰ expression nodes → JVM OOM while building the plan);
    this linear chain is O(steps)."""
    m = mask
    run = F.when(mask != 0, F.lit(1)).otherwise(F.lit(0))
    for k in range(2, 31):
        m = m.bitwiseAND(F.shiftleft(mask, k - 1))
        run = F.when(m != 0, F.lit(k)).otherwise(run)
    return run.cast("long")


def _q206_sql() -> str:
    # DuckDB twin of the shift-AND fold, unrolled as nested CASE steps
    steps = ["m1 AS (SELECT user_id, mask, mask AS m, CASE WHEN mask <> 0 THEN 1 ELSE 0 END AS run FROM mask)"]
    for k in range(2, 31):
        steps.append(
            f"m{k} AS (SELECT user_id, mask, m & (mask << {k - 1}) AS m, "
            f"CASE WHEN (m & (mask << {k - 1})) <> 0 THEN {k} ELSE run "
            f"END AS run FROM m{k - 1})"
        )
    chain = ",\n".join(steps)
    return f"""
WITH ev AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), d0 AS (SELECT MIN(day) AS d0 FROM ev),
mask AS (
  SELECT user_id, bit_or(1::BIGINT << CAST(day - d0.d0 AS INT)) AS mask
  FROM ev, d0 WHERE day - d0.d0 < 64 GROUP BY user_id
),
{chain}
SELECT user_id, mask, CAST(bit_count(mask) AS BIGINT) AS days_active,
       CAST(run AS BIGINT) AS longest_streak_days
FROM m30
"""


# --------------------------------------------------------------------------
# q211 — maximum concurrency via sweep line: give every event a fixed
# 300 s duration and find, per event type, the peak number of
# simultaneously open intervals — the interval-scheduling/occupancy
# operator (sessions in flight, connections open). Each interval emits
# a +1 at start and a −1 at end; a cumulative sum over the merged
# boundary stream (ends sort BEFORE starts at the same instant — the
# half-open [s, e) convention) peaks at the answer. Rows tied on
# (t, kind) all carry the SAME delta, so the peak is invariant to
# intra-tie order — MAX(open) is engine-deterministic even though
# per-row prefix values are not. One window per type; all integer.
# --------------------------------------------------------------------------

_CONC_DURATION = 300


def q211_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_type", es.alias("s"), (es + _CONC_DURATION).alias("e")
    )
    starts = ev.select(
        "event_type",
        F.col("s").alias("t"),
        F.lit(1).alias("delta"),
        F.lit(1).alias("kind"),  # starts after ends at the same t
    )
    ends = ev.select(
        "event_type",
        F.col("e").alias("t"),
        F.lit(-1).alias("delta"),
        F.lit(0).alias("kind"),
    )
    sweep = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    conc = sweep.withColumn("open", F.sum("delta").over(w))
    return conc.groupBy("event_type").agg(
        F.max("open").cast("long").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


Q211_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + {_CONC_DURATION} AS e
  FROM events
), sweep AS (
  SELECT event_type, s AS t, 1 AS delta, 1 AS kind FROM ev
  UNION ALL
  SELECT event_type, e AS t, -1 AS delta, 0 AS kind FROM ev
), conc AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, kind
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS open
  FROM sweep
)
SELECT event_type, CAST(MAX(open) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
FROM conc GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q213 — interval-union coverage (the complement of q211's peak): total
# seconds each event type has AT LEAST ONE open 300 s interval, plus
# the merged-interval count. Boundary deltas are NETTED per distinct
# timestamp BEFORE the cumulative sum, so the running open-count is a
# function of (type, t) alone — fully order-deterministic — and
# coverage = Σ (next_t − t) over segments with open > 0; merged
# intervals = number of 0→positive transitions. All integer.
# --------------------------------------------------------------------------


def q213_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_type", es.alias("s"), (es + _CONC_DURATION).alias("e")
    )
    deltas = (
        ev.select("event_type", F.col("s").alias("t"), F.lit(1).alias("d"))
        .unionByName(
            ev.select(
                "event_type", F.col("e").alias("t"), F.lit(-1).alias("d")
            )
        )
        .groupBy("event_type", "t")
        .agg(F.sum("d").alias("nd"))
    )
    w = Window.partitionBy("event_type").orderBy("t")
    seg = (
        deltas.withColumn(
            "open",
            F.sum("nd").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("next_t", F.lead("t").over(w))
        .withColumn(
            "prev_open", F.coalesce(F.lag("open").over(w), F.lit(0))
        )
    )
    return seg.groupBy("event_type").agg(
        F.sum(
            F.when(
                (F.col("open") > 0) & F.col("next_t").isNotNull(),
                F.col("next_t") - F.col("t"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("covered_sec"),
        F.count_if((F.col("open") > 0) & (F.col("prev_open") == 0))
        .cast("long")
        .alias("n_merged_intervals"),
    )


Q213_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + {_CONC_DURATION} AS e
  FROM events
), deltas AS (
  SELECT event_type, t, SUM(d) AS nd FROM (
    SELECT event_type, s AS t, 1 AS d FROM ev
    UNION ALL
    SELECT event_type, e AS t, -1 AS d FROM ev
  ) GROUP BY 1, 2
), opened AS (
  SELECT event_type, t,
         SUM(nd) OVER (PARTITION BY event_type ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS open
  FROM deltas
), seg AS (
  SELECT event_type, t, open,
         LEAD(t) OVER (PARTITION BY event_type ORDER BY t) AS next_t,
         COALESCE(LAG(open) OVER (PARTITION BY event_type ORDER BY t), 0)
           AS prev_open
  FROM opened
)
SELECT event_type,
       CAST(SUM(CASE WHEN open > 0 AND next_t IS NOT NULL
                     THEN next_t - t ELSE 0 END) AS BIGINT)
         AS covered_sec,
       CAST(COUNT(*) FILTER (WHERE open > 0 AND prev_open = 0)
            AS BIGINT) AS n_merged_intervals
FROM seg GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q214 — entropy rate of the event-type Markov chain:
# H = −Σₐ π(a) Σ_b P(a,b)·ln P(a,b), with π from q164's 4 fixed power
# rounds — how predictable the NEXT event is given the current one,
# the sequence-compressibility scalar that complements q97's
# independence-assuming token entropy. Transition probabilities and
# the stationary vector are the same count-ratio doubles in both
# engines; the oracle unrolls the identical recurrence.
# --------------------------------------------------------------------------


def q214_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("a").agg(F.sum("c").alias("t"))
    P = (
        pairs.join(tot, "a")
        .select("a", "b", (F.col("c") / F.col("t")).alias("p"))
        .localCheckpoint()
    )
    n_states = P.select("a").distinct().count()
    if n_states == 0:
        # no transitions: the oracle's outer aggregate still renders one
        # row — (0, NULL) — because SUM over the empty join is NULL
        return spark.createDataFrame(
            [(0, None)], "n_states long, entropy_rate_nats double"
        )
    v = P.select("a").distinct().select(
        F.col("a").alias("state"), F.lit(1.0 / n_states).alias("prob")
    )
    for _ in range(_MK_ROUNDS):
        v = (
            P.join(v, P.a == v.state)
            .groupBy(F.col("b").alias("state"))
            .agg(F.sum(F.col("prob") * F.col("p")).alias("prob"))
            .localCheckpoint()
        )
    h_cond = P.groupBy("a").agg(
        (-F.sum(F.col("p") * F.log("p"))).alias("h")
    )
    return (
        v.join(h_cond, v.state == h_cond.a)
        .agg(
            F.lit(n_states).cast("long").alias("n_states"),
            F.round(F.sum(F.col("prob") * F.col("h")), 6).alias(
                "entropy_rate_nats"
            ),
        )
    )


def _q214_sql(rounds: int = _MK_ROUNDS) -> str:
    steps = [
        """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), pr AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS b
  FROM ev
), cnt AS (
  SELECT a, b, COUNT(*) AS c FROM pr WHERE b IS NOT NULL GROUP BY a, b
), p AS MATERIALIZED (
  SELECT cnt.a, cnt.b, cnt.c / (1.0 * t.t) AS p
  FROM cnt JOIN (SELECT a, SUM(c) AS t FROM cnt GROUP BY a) t USING (a)
), ns AS (SELECT CAST(COUNT(DISTINCT a) AS DOUBLE) AS n FROM p),
v0 AS (SELECT DISTINCT a AS state, (SELECT 1.0 / n FROM ns) AS prob
       FROM p)"""
    ]
    for k in range(1, rounds + 1):
        steps.append(
            f"""
v{k} AS (SELECT p.b AS state, SUM(v.prob * p.p) AS prob
        FROM p JOIN v{k - 1} v ON p.a = v.state GROUP BY p.b)"""
        )
    return (
        ",".join(steps)
        + f""",
hc AS (SELECT a, -SUM(p * ln(p)) AS h FROM p GROUP BY a)
SELECT (SELECT CAST(n AS BIGINT) FROM ns) AS n_states,
       ROUND(SUM(v.prob * hc.h), 6) AS entropy_rate_nats
FROM v{rounds} v JOIN hc ON v.state = hc.a"""
    )


# --------------------------------------------------------------------------
# q222 — k-anonymity audit over quasi-identifiers (Sweeney 2002): how
# identifiable is a row from (nation, market segment, balance bucket)?
# For k ∈ {2,5,10}: equivalence classes smaller than k, rows they
# expose, and the at-risk percentage — the privacy gate a training-data
# pipeline runs before releasing user-derived tables. One groupBy on
# the quasi-id tuple (partial-agg map-side), then a 3-row broadcast
# cross join; nothing data-proportional leaves the executors.
# --------------------------------------------------------------------------


def q222_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cls = (
        cust.select(
            F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_kb"),
        )
        .groupBy("nat", "seg", "bal_kb")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k int")
    small = F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0)
    return (
        cls.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("small_classes"),
            F.sum(small).cast("long").alias("rows_at_risk"),
            r4(100.0 * F.sum(small) / F.sum("n")).alias("risk_pct"),
        )
    )


Q222_SQL = """
WITH cls AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal / 1000) AS INT) AS bal_kb, COUNT(*) AS n
  FROM customer GROUP BY 1, 2, 3
), ks AS (SELECT CAST(unnest([2, 5, 10]) AS INT) AS k)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
         AS small_classes,
       CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       ROUND(100.0 * SUM(CASE WHEN n < k THEN n ELSE 0 END) / SUM(n), 4)
         AS risk_pct
FROM cls CROSS JOIN ks GROUP BY k
"""


# --------------------------------------------------------------------------
# q224 — time-respecting reachability over a temporal contact graph
# (Holme & Saramäki 2012): two events in the same value bucket within
# one hour, earlier→later, form a directed temporal contact; a user's
# 2-hop reach must traverse contacts in increasing time (earliest-
# arrival semantics: hop 2 departs after hop 1's MIN arrival). The
# interval join is the two-candidate-bucket trick (each source row
# probes hour h and h+1 by equi-join — never an unbounded range scan),
# the same shape as q100/q102; everything downstream is keyed
# groupBy/join. Oracle: identical bucket join + earliest-arrival rule.
# --------------------------------------------------------------------------


def q224_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        es.alias("s"),
        F.floor("value").cast("long").alias("b"),
    )
    a2 = ev.select(
        "u", "s", "b", F.floor(F.col("s") / 3600).alias("h")
    ).unionByName(
        ev.select(
            "u", "s", "b", (F.floor(F.col("s") / 3600) + 1).alias("h")
        )
    )
    tgt = ev.select(
        F.col("u").alias("v"),
        F.col("s").alias("t"),
        "b",
        F.floor(F.col("s") / 3600).alias("h"),
    )
    ce = (
        a2.join(tgt, ["b", "h"])
        .filter(
            (F.col("t") > F.col("s"))
            & (F.col("t") - F.col("s") <= 3600)
            & (F.col("v") != F.col("u"))
        )
        .select("u", "v", "t")
        .distinct()
        .localCheckpoint(eager=False)
    )
    arr1 = ce.groupBy("u", "v").agg(F.min("t").alias("ta"))
    ce2 = ce.select(
        F.col("u").alias("v2"), F.col("v").alias("w"), F.col("t")
    )
    hop2 = (
        arr1.join(ce2, F.col("v") == F.col("v2"))
        .filter((F.col("t") > F.col("ta")) & (F.col("u") != F.col("w")))
        .select("u", "w")
        .distinct()
    )
    n1 = arr1.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("n_1hop"))
    n2 = hop2.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("n_2hop"))
    return (
        n1.join(n2, "u", "left")
        .na.fill({"n_2hop": 0})
        .select(F.col("u").alias("user_id"), "n_1hop", "n_2hop")
    )


Q224_SQL = """
WITH ev AS (
  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(value) AS BIGINT) AS b
  FROM events
), a2 AS (
  SELECT u, s, b, s // 3600 AS h FROM ev
  UNION ALL
  SELECT u, s, b, s // 3600 + 1 AS h FROM ev
), ce AS (
  SELECT DISTINCT a.u, c.u AS v, c.s AS t
  FROM a2 a JOIN ev c
    ON c.b = a.b AND c.s // 3600 = a.h
   AND c.s > a.s AND c.s - a.s <= 3600 AND c.u <> a.u
), arr1 AS (
  SELECT u, v, MIN(t) AS ta FROM ce GROUP BY u, v
), hop2 AS (
  SELECT DISTINCT r.u, c2.v AS w
  FROM arr1 r JOIN ce c2 ON c2.u = r.v
  WHERE c2.t > r.ta AND c2.v <> r.u
), n1 AS (SELECT u, COUNT(*) AS n_1hop FROM arr1 GROUP BY u),
n2 AS (SELECT u, COUNT(*) AS n_2hop FROM hop2 GROUP BY u)
SELECT n1.u AS user_id, CAST(n1.n_1hop AS BIGINT) AS n_1hop,
       CAST(COALESCE(n2.n_2hop, 0) AS BIGINT) AS n_2hop
FROM n1 LEFT JOIN n2 ON n2.u = n1.u
"""


# --------------------------------------------------------------------------
# q230 — POISSON BOOTSTRAP confidence intervals (Chamandy et al.,
# "Estimating Uncertainty for Massive Data Streams", Google 2012): the
# at-scale bootstrap. A classical resample permutes the whole corpus
# (impossible distributed); the Poisson bootstrap gives each row an
# independent Poisson(1) multiplicity per replicate, so B resamples
# are ONE pass over the data with a B-way in-place fan-out and a keyed
# agg — no shuffle of raw rows per replicate, no global state. The
# Poisson draw is deterministic: u = md5long(doc_id|b)/2^60 inverted
# through the Poisson(1) CDF (truncated at 4; P(X>4) ≈ 0.37%), so both
# engines and any partitioning produce bit-identical replicates.
# Replicate means are exact-integer-sum ratios (no float accumulation
# order sensitivity) and the 2.5%/97.5% quantiles use the shared
# linear-interpolation definition (Spark percentile ≡ DuckDB
# quantile_cont). Output: per-source point estimate + 95% CI of mean
# document length.
# --------------------------------------------------------------------------

_BOOT_B = 32
#: cumulative Poisson(1) probabilities for k = 0..3 (then 4)
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
)
_U_DENOM = float(1 << 60)


def q230_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    r = d.select(
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "doc_id",
    ).withColumn(
        "u",
        md5long(F.concat_ws("|", "doc_id", "b")) / F.lit(_U_DENOM),
    )
    w = (
        F.when(F.col("u") < _POIS_CDF[0], 0)
        .when(F.col("u") < _POIS_CDF[1], 1)
        .when(F.col("u") < _POIS_CDF[2], 2)
        .when(F.col("u") < _POIS_CDF[3], 3)
        .otherwise(4)
        .cast("long")
    )
    rep = (
        r.withColumn("w", w)
        .groupBy("source", "b")
        .agg(
            (
                F.sum(F.col("w") * F.col("n_chars"))
                / F.nullif(F.sum("w"), F.lit(0))
            ).alias("m")
        )
    )
    return rep.groupBy("source").agg(
        r4(F.avg("m")).alias("boot_mean"),
        r4(F.percentile("m", F.lit(0.025))).alias("ci_lo"),
        r4(F.percentile("m", F.lit(0.975))).alias("ci_hi"),
    )


Q230_SQL = f"""
WITH r AS (
  SELECT source, n_chars, b,
         CAST({MD5LONG_SQL.format(x="CAST(doc_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)")}
              AS DOUBLE) / {_U_DENOM!r} AS u
  FROM documents, unnest(generate_series(0, {_BOOT_B - 1})) AS t(b)
), w AS (
  SELECT source, b, n_chars,
         CASE WHEN u < {_POIS_CDF[0]!r} THEN 0
              WHEN u < {_POIS_CDF[1]!r} THEN 1
              WHEN u < {_POIS_CDF[2]!r} THEN 2
              WHEN u < {_POIS_CDF[3]!r} THEN 3
              ELSE 4 END AS w
  FROM r
), rep AS (
  SELECT source, b,
         CAST(SUM(w * n_chars) AS DOUBLE) / NULLIF(SUM(w), 0) AS m
  FROM w GROUP BY 1, 2
)
SELECT source, ROUND(AVG(m), 4) AS boot_mean,
       ROUND(quantile_cont(m, 0.025), 4) AS ci_lo,
       ROUND(quantile_cont(m, 0.975), 4) AS ci_hi
FROM rep GROUP BY source
"""


# --------------------------------------------------------------------------
# q235 — APPROXIMATE FUNCTIONAL-DEPENDENCY discovery (the g3 error of
# Kivinen & Mannila 1995, as mined by TANE/Metanome): for each
# candidate FD A→B, the minimum fraction of rows to delete for the FD
# to hold exactly — g3 = (N − Σ_a max_b |rows(a,b)|) / N. q134 profiles
# single columns (ANALYZE); this profiles COLUMN RELATIONSHIPS, the
# other half of schema discovery on an unknown 100-TB lake. Shape per
# candidate: one (A,B) partial-agg, one per-A max — both keyed,
# integer-exact until the final rendered rate; candidates share the
# scan via a single unioned plan. An exact FD (l_orderkey →
# l_orderkey) renders 0; a near-key renders small; independent columns
# render large.
# --------------------------------------------------------------------------

_FD_CANDIDATES = (
    ("l_orderkey", "l_returnflag"),
    ("l_orderkey", "l_linestatus"),
    ("l_partkey", "l_suppkey"),
    ("l_returnflag", "l_linestatus"),
    ("l_suppkey", "l_returnflag"),
)


def q235_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    outs = []
    for a, b in _FD_CANDIDATES:
        ab = li.groupBy(
            F.col(a).alias("av"), F.col(b).alias("bv")
        ).agg(F.count(F.lit(1)).alias("c"))
        per_a = ab.groupBy("av").agg(
            F.max("c").alias("mx"), F.sum("c").alias("tot")
        )
        outs.append(
            per_a.agg(
                F.lit(f"{a}->{b}").alias("fd"),
                (F.sum("tot") - F.sum("mx")).cast("long").alias("violations"),
                F.sum("tot").cast("long").alias("n_rows"),
                r4(
                    (F.sum("tot") - F.sum("mx")) / F.sum("tot")
                ).alias("g3"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _q235_sql() -> str:
    parts = []
    for a, b in _FD_CANDIDATES:
        parts.append(
            f"""SELECT '{a}->{b}' AS fd,
       CAST(SUM(tot) - SUM(mx) AS BIGINT) AS violations,
       CAST(SUM(tot) AS BIGINT) AS n_rows,
       ROUND((SUM(tot) - SUM(mx)) / CAST(SUM(tot) AS DOUBLE), 4) AS g3
FROM (
  SELECT av, MAX(c) AS mx, SUM(c) AS tot FROM (
    SELECT {a} AS av, {b} AS bv, COUNT(*) AS c
    FROM lineitem GROUP BY 1, 2
  ) GROUP BY av
)"""
        )
    return "\nUNION ALL\n".join(parts)


# --------------------------------------------------------------------------
# q248 — CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
# 2013): the standard A/B-test sensitivity booster. Each user's
# pre-period engagement x (days before the q94-family split day) is the
# control covariate for their post-period metric y; the adjusted metric
# y' = y − θ(x − x̄) with θ = cov(x,y)/var(x) keeps the same mean but
# strips the between-user variance x explains. Arms are a deterministic
# md5 hash split of user_id (q192's assignment idiom). Output per arm:
# raw vs adjusted mean (must agree — CUPED is mean-preserving up to the
# arm-level x imbalance) and the variance-reduction fraction.
#
# Scale posture: one shuffle on user_id for the per-user pre/post sums,
# θ/x̄ from a single global aggregate broadcast back (1 row), then one
# shuffle on the 2-value arm key for the final moments. No windows, no
# Python — everything is partial-aggregable.
# --------------------------------------------------------------------------


def q248_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(es / 86400).cast("long").alias("day"),
        "value",
    )
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("day") < _SPLIT_DAY, F.col("value"))),
            F.lit(0.0),
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("day") >= _SPLIT_DAY, F.col("value"))),
            F.lit(0.0),
        ).alias("y"),
    )
    glob = per_user.agg(
        # try_divide: one user (or constant pre-period) → var_pop = 0
        F.try_divide(F.covar_pop("x", "y"), F.var_pop("x")).alias(
            "theta"
        ),
        F.avg("x").alias("mx"),
    )
    adj = per_user.crossJoin(F.broadcast(glob)).select(
        (md5long(F.col("user_id").cast("string")) % 2).alias("arm"),
        "y",
        (
            F.col("y") - F.col("theta") * (F.col("x") - F.col("mx"))
        ).alias("ya"),
    )
    return adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        r4(F.avg("y")).alias("mean_y"),
        r4(F.avg("ya")).alias("mean_y_adj"),
        F.round(F.var_pop("y"), 2).alias("var_y"),
        F.round(F.var_pop("ya"), 2).alias("var_y_adj"),
        F.round(
            F.lit(1.0) - F.try_divide(F.var_pop("ya"), F.var_pop("y")),
            6,
        ).alias("var_reduction"),
    )


Q248_SQL = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         value
  FROM events
), per_user AS (
  SELECT user_id,
         COALESCE(SUM(CASE WHEN day < {_SPLIT_DAY} THEN value END), 0)
           AS x,
         COALESCE(SUM(CASE WHEN day >= {_SPLIT_DAY} THEN value END), 0)
           AS y
  FROM ev GROUP BY user_id
), gstats AS (
  SELECT covar_pop(x, y) / var_pop(x) AS theta, AVG(x) AS mx
  FROM per_user
), adj AS (
  SELECT {MD5LONG_SQL.format(x='CAST(user_id AS VARCHAR)')} % 2 AS arm,
         y, y - theta * (x - mx) AS ya
  FROM per_user CROSS JOIN gstats
)
SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(y), 4) AS mean_y,
       ROUND(AVG(ya), 4) AS mean_y_adj,
       ROUND(var_pop(y), 2) AS var_y,
       ROUND(var_pop(ya), 2) AS var_y_adj,
       ROUND(1 - var_pop(ya) / var_pop(y), 6) AS var_reduction
FROM adj GROUP BY arm
"""


# --------------------------------------------------------------------------
# q249 — THEIL–SEN robust trend (Theil 1950; Sen 1968): the slope a
# daily-volume monitor fits when spikes would wreck OLS (q108) — the
# MEDIAN of all pairwise slopes between daily totals, 29.3%-outlier-
# robust. Median is EXACT: pairwise slopes are ranked per event type
# and the middle one (or mean of the middle two) is selected — no
# percentile_approx, so the DuckDB twin hashes identically.
#
# Scale posture: the raw feed collapses to a (type, day) grid first —
# the pairwise self-join and the ranking window are bounded by
# days²/2 per type (the window IS partitioned, by event_type), never
# by event cardinality. The day grid is the only corpus-width shuffle.
# --------------------------------------------------------------------------


def q249_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(es / 86400).cast("long").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.sum("value").alias("tot"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            (
                (F.col("b.tot") - F.col("a.tot"))
                / (F.col("b.day") - F.col("a.day")).cast("double")
            ).alias("slope"),
            F.col("a.day").alias("d1"),
            F.col("b.day").alias("d2"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    med = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    ).groupBy("event_type").agg(F.avg("slope").alias("sen"))
    days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.avg("tot").alias("mean_daily")
    )
    return med.join(days, "event_type").select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round("sen", 6).alias("sen_slope"),
        r4(F.col("mean_daily")).alias("mean_daily"),
    )


Q249_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         SUM(value) AS tot
  FROM events GROUP BY 1, 2
), slopes AS (
  SELECT a.event_type,
         (b.tot - a.tot) / CAST(b.day - a.day AS DOUBLE) AS slope,
         a.day AS d1, b.day AS d2
  FROM daily a
  JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY slope, d1, d2) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM slopes
), med AS (
  SELECT event_type, AVG(slope) AS sen
  FROM ranked
  WHERE rn = FLOOR((n + 1) / 2) OR rn = FLOOR((n + 2) / 2)
  GROUP BY event_type
), days AS (
  SELECT event_type, COUNT(*) AS n_days, AVG(tot) AS mean_daily
  FROM daily GROUP BY event_type
)
SELECT m.event_type, CAST(n_days AS BIGINT) AS n_days,
       ROUND(sen, 6) AS sen_slope,
       ROUND(mean_daily, 4) AS mean_daily
FROM med m JOIN days d ON m.event_type = d.event_type
"""


# --------------------------------------------------------------------------
# q250 — KAPLAN-MEIER survival (Kaplan & Meier 1958): the retention
# curve with RIGHT-CENSORING handled correctly — what q94's cohort
# grid cannot do: users still active at the end of the feed are not
# churned, they are censored, and dropping them biases retention low.
# A subject is a (user, event_type) engagement: T = last-seen −
# first-seen days with that feature; subjects last seen inside the
# feed's final 7 days are censored at T (per-user-overall lifetimes
# are degenerate here — every user stays active to feed end). The product-limit
# estimator S(t) = Π_{s≤t} (1 − d_s/n_s) runs as exp(Σ ln ·) so the
# cumulative product is one window sum.
#
# Scale posture: one shuffle on user_id collapses the feed to a
# per-user (T, churned) pair; everything after runs on the LIFETIME-DAY
# histogram (≤ feed-span rows) — the cumulative windows are global but
# over that aggregate (audit-covered), never over raw users.
# --------------------------------------------------------------------------

_KM_CENSOR_DAYS = 7


def q250_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(es / 86400).cast("long").alias("day"),
    )
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.min("day").alias("f"), F.max("day").alias("l")
    )
    gmax = per_user.agg(F.max("l").alias("gm"))
    lives = per_user.crossJoin(F.broadcast(gmax)).select(
        (F.col("l") - F.col("f")).alias("t"),
        (F.col("l") <= F.col("gm") - _KM_CENSOR_DAYS)
        .cast("int")
        .alias("churned"),
    )
    hist = lives.groupBy("t").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum("churned").alias("d"),
    )
    w_risk = (
        Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = (
        hist.withColumn("n_risk", F.sum("total").over(w_risk))
        .withColumn(
            "lnf",
            F.log(
                F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double")
            ),
        )
        .withColumn("surv", F.exp(F.sum("lnf").over(w_cum)))
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").alias("lifetime_days"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("churned"),
        F.round("surv", 6).alias("survival"),
    )


Q250_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), per_user AS (
  SELECT user_id, event_type, MIN(day) AS f, MAX(day) AS l
  FROM ev GROUP BY user_id, event_type
), gmax AS (SELECT MAX(l) AS gm FROM per_user),
lives AS (
  SELECT l - f AS t,
         CASE WHEN l <= gm - {_KM_CENSOR_DAYS} THEN 1 ELSE 0 END
           AS churned
  FROM per_user CROSS JOIN gmax
), hist AS (
  SELECT t, COUNT(*) AS total, SUM(churned) AS d FROM lives GROUP BY t
), risk AS (
  SELECT t, d,
         SUM(total) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM hist
), km AS (
  SELECT t, d, n_risk,
         SUM(ln(1.0 - d / CAST(n_risk AS DOUBLE)))
           OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnS
  FROM risk
)
SELECT t AS lifetime_days, CAST(n_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS churned, ROUND(exp(lnS), 6) AS survival
FROM km WHERE d > 0
"""


# --------------------------------------------------------------------------
# q252 — EMPIRICAL-BAYES beta-binomial shrinkage (Robbins 1956;
# Efron & Morris 1975's batting-average estimator): per-user engagement
# rates k/n are noisy at small n; shrinking toward a Beta(α, β) prior
# fitted from the population by METHOD OF MOMENTS (α+β =
# m(1−m)/v − 1 on the raw-rate mean/variance) gives the posterior-mean
# rate (k+α)/(n+α+β) — the estimator a ranking or abuse-flagging
# stage uses instead of raw proportions. 'click' events are the
# successes; every event is a trial.
#
# Scale posture: one shuffle on user_id for (n, k); the prior is a
# 1-row broadcast aggregate; the posterior is a map-side expression.
# Output is the per-user estimate table (the pipeline's artifact).
# --------------------------------------------------------------------------


def q252_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("k"),
    )
    rates = per_user.withColumn(
        "p", F.col("k") / F.col("n").cast("double")
    )
    prior = rates.agg(
        F.avg("p").alias("m"), F.var_pop("p").alias("v")
    ).select(
        "m",
        "v",
        # try_divide: identical per-user rates → zero prior variance
        (
            F.try_divide(F.col("m") * (1 - F.col("m")), F.col("v")) - 1
        ).alias("ab"),
    )
    out = rates.crossJoin(F.broadcast(prior)).select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("n_clicks"),
        F.round("p", 6).alias("raw_rate"),
        F.round(
            (F.col("k") + F.col("m") * F.col("ab"))
            / (F.col("n") + F.col("ab")),
            6,
        ).alias("shrunk_rate"),
    )
    return out


Q252_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS k
  FROM events GROUP BY user_id
), rates AS (
  SELECT user_id, n, k, k / CAST(n AS DOUBLE) AS p FROM per_user
), prior AS (
  SELECT m, v, m * (1 - m) / v - 1 AS ab
  FROM (SELECT AVG(p) AS m, var_pop(p) AS v FROM rates)
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(k AS BIGINT) AS n_clicks,
       ROUND(p, 6) AS raw_rate,
       ROUND((k + m * ab) / (n + ab), 6) AS shrunk_rate
FROM rates CROSS JOIN prior
"""


# --------------------------------------------------------------------------
# q254 — WINSORIZED + TRIMMED robust moments per event type (Tukey &
# McLaughlin 1963; Dixon & Tukey 1968): the heavy-tail-safe mean/std a
# metrics pipeline reports where q188 only FLAGS outliers. Order
# statistics are EXACT but computed from the per-type VALUE HISTOGRAM —
# the 5th/95th bound is the value whose cumulative count first reaches
# ⌈0.05n⌉/⌈0.95n⌉, the winsorized moments clamp histogram entries to
# those bounds, and the trimmed mean takes each value's rank-interval
# overlap with (⌊0.05n⌋, ⌊0.95n⌋] in closed form — so NO per-row rank
# window ever runs.
#
# Scale posture: one shuffle to the (type, value) histogram (2dp
# values — bounded), cumulative windows partitioned by type over that
# histogram, one final per-type rollup. Raw-event cardinality only
# passes through the first partial-aggregable groupBy.
# --------------------------------------------------------------------------

_WINSOR_LO = 0.05
_WINSOR_HI = 0.95


def q254_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    hist = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    k_lo = F.ceil(F.lit(_WINSOR_LO) * F.col("n"))
    k_hi = F.ceil(F.lit(_WINSOR_HI) * F.col("n"))
    bounds = h.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= k_lo, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("value"))).alias("hi"),
    )
    t_lo = F.floor(F.lit(_WINSOR_LO) * F.col("n"))
    t_hi = F.floor(F.lit(_WINSOR_HI) * F.col("n"))
    j = h.join(bounds, "event_type")
    clamped = F.greatest(F.least(F.col("value"), F.col("hi")), F.col("lo"))
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), t_hi)
        - F.greatest(F.col("cum") - F.col("cnt") + 1, t_lo + 1)
        + 1,
    )
    out = j.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        r4(F.sum(F.col("value") * F.col("cnt")) / F.max("n")).alias("mean"),
        F.max("lo").alias("p05"),
        F.max("hi").alias("p95"),
        r4(F.sum(clamped * F.col("cnt")) / F.max("n")).alias("win_mean"),
        r4(
            F.sqrt(
                F.sum(clamped * clamped * F.col("cnt")) / F.max("n")
                - F.pow(
                    F.sum(clamped * F.col("cnt")) / F.max("n"), 2
                )
            )
        ).alias("win_std"),
        # try_divide: n=1 leaves an empty trim interval (DuckDB: NULL)
        r4(
            F.try_divide(
                F.sum(F.col("value") * overlap),
                F.max(t_hi - t_lo).cast("double"),
            )
        ).alias("trim_mean"),
    )
    return out


Q254_SQL = f"""
WITH hist AS (
  SELECT event_type, value, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), h AS (
  SELECT event_type, value, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
), bounds AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= CEIL({_WINSOR_LO} * n) THEN value END)
           AS lo,
         MIN(CASE WHEN cum >= CEIL({_WINSOR_HI} * n) THEN value END)
           AS hi
  FROM h GROUP BY event_type
), j AS (
  SELECT h.*, b.lo, b.hi,
         GREATEST(LEAST(value, b.hi), b.lo) AS clamped,
         FLOOR({_WINSOR_LO} * n) AS t_lo,
         FLOOR({_WINSOR_HI} * n) AS t_hi,
         GREATEST(0, LEAST(cum, FLOOR({_WINSOR_HI} * n))
           - GREATEST(cum - cnt + 1, FLOOR({_WINSOR_LO} * n) + 1)
           + 1) AS ov
  FROM h JOIN bounds b USING (event_type)
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(SUM(value * cnt) / MAX(n), 4) AS mean,
       MAX(lo) AS p05, MAX(hi) AS p95,
       ROUND(SUM(clamped * cnt) / MAX(n), 4) AS win_mean,
       ROUND(sqrt(SUM(clamped * clamped * cnt) / MAX(n)
             - (SUM(clamped * cnt) / MAX(n))
               * (SUM(clamped * cnt) / MAX(n))), 4) AS win_std,
       ROUND(SUM(value * ov) / CAST(MAX(t_hi - t_lo) AS DOUBLE), 4)
         AS trim_mean
FROM j GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q255 — BENJAMINI-HOCHBERG FDR step-up (Benjamini & Hochberg 1995)
# over per-event-type A/B two-proportion z-tests: the multiple-testing
# correction an experimentation platform applies when q131's single
# z-test becomes m simultaneous tests. Per type, users hash-split into
# two arms (q192's md5 idiom), pooled-variance z on conversion;
# two-sided p via the logistic approximation Φ(z) ≈ σ(1.702z)
# (Bowling et al. 2009 — |err| < 0.0095, and IDENTICAL in both engines,
# where erf is built into neither). Reject H_(1..k*) with k* = max{k :
# p_(k) ≤ kα/m}, α = 0.10.
#
# Scale posture: two hash shuffles (user grain, then the m-row type
# grain); the rank/step-up windows run over the m-row per-type
# aggregate (audit-covered).
# --------------------------------------------------------------------------

_BH_ALPHA = 0.10


def q255_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.max((F.col("value") > 100).cast("int")).alias("conv")
    )
    arms = per_user.groupBy(
        "event_type",
        (md5long(F.col("user_id").cast("string")) % 2).alias("arm"),
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k"))
    g = arms.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("k"))).alias("k0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("k"))).alias("k1"),
    )
    # degenerate-sample gate (the q182/q199 class): a type with an
    # empty arm, zero conversions, or all-conversions has zero pooled
    # variance — ANSI Spark raises DIVIDE_BY_ZERO while DuckDB renders
    # inf, so such types are excluded in BOTH twins
    g = g.filter(
        F.col("n0").isNotNull()
        & F.col("n1").isNotNull()
        & (F.col("k0") + F.col("k1") > 0)
        & (F.col("k0") + F.col("k1") < F.col("n0") + F.col("n1"))
    )
    pp = (F.col("k0") + F.col("k1")) / (F.col("n0") + F.col("n1"))
    z = (F.col("k1") / F.col("n1") - F.col("k0") / F.col("n0")) / F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    scored = g.select(
        "event_type",
        F.round(z, 6).alias("z_stat"),
        F.round(
            2.0 / (1.0 + F.exp(1.702 * F.abs(z))), 6
        ).alias("p_value"),
    )
    wr = Window.orderBy("p_value", "event_type")
    m = Window.partitionBy()
    ranked = (
        scored.withColumn("rnk", F.row_number().over(wr))
        .withColumn("m", F.count(F.lit(1)).over(m))
        .withColumn(
            "bh_crit",
            F.round(
                F.col("rnk") * _BH_ALPHA / F.col("m"), 6
            ),
        )
    )
    kmax = ranked.withColumn(
        "kstar",
        F.max(
            F.when(F.col("p_value") <= F.col("bh_crit"), F.col("rnk"))
        ).over(m),
    )
    return kmax.select(
        "event_type",
        "z_stat",
        "p_value",
        F.col("rnk").cast("long").alias("p_rank"),
        "bh_crit",
        (F.col("rnk") <= F.coalesce("kstar", F.lit(0)))
        .cast("int")
        .alias("rejected"),
    )


Q255_SQL = f"""
WITH per_user AS (
  SELECT user_id, event_type,
         MAX(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
), arms AS (
  SELECT event_type,
         {MD5LONG_SQL.format(x='CAST(user_id AS VARCHAR)')} % 2 AS arm,
         COUNT(*) AS n, SUM(conv) AS k
  FROM per_user GROUP BY 1, 2
), g AS (
  SELECT event_type,
         SUM(CASE WHEN arm = 0 THEN n END) AS n0,
         SUM(CASE WHEN arm = 0 THEN k END) AS k0,
         SUM(CASE WHEN arm = 1 THEN n END) AS n1,
         SUM(CASE WHEN arm = 1 THEN k END) AS k1
  FROM arms GROUP BY event_type
), gated AS (
  SELECT * FROM g
  WHERE n0 IS NOT NULL AND n1 IS NOT NULL
    AND k0 + k1 > 0 AND k0 + k1 < n0 + n1
), scored AS (
  SELECT event_type,
         ROUND((k1 / (1.0 * n1) - k0 / (1.0 * n0))
           / sqrt(((k0 + k1) / (1.0 * (n0 + n1)))
                  * (1 - (k0 + k1) / (1.0 * (n0 + n1)))
                  * (1.0 / n0 + 1.0 / n1)), 6) AS z_stat
  FROM gated
), p AS (
  SELECT event_type, z_stat,
         ROUND(2.0 / (1.0 + exp(1.702 * ABS(z_stat))), 6) AS p_value
  FROM scored
), ranked AS (
  SELECT event_type, z_stat, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value, event_type) AS rnk,
         COUNT(*) OVER () AS m
  FROM p
), crit AS (
  SELECT *, ROUND(rnk * {_BH_ALPHA} / m, 6) AS bh_crit FROM ranked
), kmax AS (
  SELECT *, MAX(CASE WHEN p_value <= bh_crit THEN rnk END) OVER ()
         AS kstar
  FROM crit
)
SELECT event_type, z_stat, p_value,
       CAST(rnk AS BIGINT) AS p_rank, bh_crit,
       CASE WHEN rnk <= COALESCE(kstar, 0) THEN 1 ELSE 0 END AS rejected
FROM kmax
"""


# --------------------------------------------------------------------------
# q258 — DIFFERENCE-IN-DIFFERENCES (Card & Krueger 1994's workhorse
# quasi-experimental estimator): the 2×2 arm×period design over
# per-user period means — DiD = (ȳ₁₁−ȳ₁₀) − (ȳ₀₁−ȳ₀₀) nets out both
# the arm's level difference and the common time trend that a naive
# post-period comparison (q131) confounds. SE from the four cell
# variances (independent-cells approximation), t = DiD/SE. Arms are
# the q248 md5 user split; periods split at the q94-family day.
#
# Scale posture: one shuffle to (user, period) means, one to the
# 4-cell grid; the final pivot is a 1-row aggregate. Nothing windows.
# --------------------------------------------------------------------------


def q258_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (F.floor(es / 86400).cast("long") >= _SPLIT_DAY)
        .cast("int")
        .alias("period"),
        "value",
    )
    pu = ev.groupBy("user_id", "period").agg(F.avg("value").alias("y"))
    cells = pu.groupBy(
        (md5long(F.col("user_id").cast("string")) % 2).alias("arm"),
        "period",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("m"),
        F.var_samp("y").alias("v"),
    )

    def cell(a: int, p: int, col: str) -> F.Column:
        return F.max(
            F.when(
                (F.col("arm") == a) & (F.col("period") == p), F.col(col)
            )
        )

    g = cells.agg(
        *[
            cell(a, p, c).alias(f"{c}{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
            for c in ("m", "v", "n")
        ]
    )
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    se = F.sqrt(
        F.col("v11") / F.col("n11")
        + F.col("v10") / F.col("n10")
        + F.col("v01") / F.col("n01")
        + F.col("v00") / F.col("n00")
    )
    return g.select(
        r4(F.col("m00")).alias("ctrl_pre"),
        r4(F.col("m01")).alias("ctrl_post"),
        r4(F.col("m10")).alias("treat_pre"),
        r4(F.col("m11")).alias("treat_post"),
        r4(did).alias("did"),
        r4(se).alias("se"),
        F.round(did / se, 6).alias("t_stat"),
    )


Q258_SQL = f"""
WITH ev AS (
  SELECT user_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
                   >= {_SPLIT_DAY} THEN 1 ELSE 0 END AS period,
         value
  FROM events
), pu AS (
  SELECT user_id, period, AVG(value) AS y FROM ev GROUP BY 1, 2
), cells AS (
  SELECT {MD5LONG_SQL.format(x='CAST(user_id AS VARCHAR)')} % 2 AS arm,
         period, COUNT(*) AS n, AVG(y) AS m, var_samp(y) AS v
  FROM pu GROUP BY 1, 2
), g AS (
  SELECT
    MAX(CASE WHEN arm = 0 AND period = 0 THEN m END) AS m00,
    MAX(CASE WHEN arm = 0 AND period = 1 THEN m END) AS m01,
    MAX(CASE WHEN arm = 1 AND period = 0 THEN m END) AS m10,
    MAX(CASE WHEN arm = 1 AND period = 1 THEN m END) AS m11,
    MAX(CASE WHEN arm = 0 AND period = 0 THEN v END) AS v00,
    MAX(CASE WHEN arm = 0 AND period = 1 THEN v END) AS v01,
    MAX(CASE WHEN arm = 1 AND period = 0 THEN v END) AS v10,
    MAX(CASE WHEN arm = 1 AND period = 1 THEN v END) AS v11,
    MAX(CASE WHEN arm = 0 AND period = 0 THEN n END) AS n00,
    MAX(CASE WHEN arm = 0 AND period = 1 THEN n END) AS n01,
    MAX(CASE WHEN arm = 1 AND period = 0 THEN n END) AS n10,
    MAX(CASE WHEN arm = 1 AND period = 1 THEN n END) AS n11
  FROM cells
)
SELECT ROUND(m00, 4) AS ctrl_pre, ROUND(m01, 4) AS ctrl_post,
       ROUND(m10, 4) AS treat_pre, ROUND(m11, 4) AS treat_post,
       ROUND((m11 - m10) - (m01 - m00), 4) AS did,
       ROUND(sqrt(v11 / n11 + v10 / n10 + v01 / n01 + v00 / n00), 4)
         AS se,
       ROUND(((m11 - m10) - (m01 - m00))
             / sqrt(v11 / n11 + v10 / n10 + v01 / n01 + v00 / n00), 6)
         AS t_stat
FROM g
"""


# --------------------------------------------------------------------------
# q261 — PINBALL (quantile) LOSS evaluation of rolling quantile
# forecasts (Koenker & Bassett 1978; the M5-Uncertainty metric): per
# event type, tomorrow's q ∈ {0.1, 0.5, 0.9} daily-volume forecast is
# the EXACT q-th order statistic of the trailing 14 days; the
# evaluator reports mean pinball loss L_q = mean(q·(y−ŷ)⁺ +
# (1−q)·(ŷ−y)⁺) and empirical coverage (P[y ≤ ŷ] — should track q).
# This is the quantile upgrade of q198's point-forecast WAPE/sMAPE.
#
# Scale posture: everything runs on the (type, day) grid; the rolling
# window is partitioned by type with a fixed 14-row frame whose sorted
# array gives exact order statistics (no percentile_approx, so both
# engines hash identically).
# --------------------------------------------------------------------------

_PB_WIN = 14
_PB_QS = (0.1, 0.5, 0.9)


def q261_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(F.floor(es / 86400).cast("long").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_PB_WIN, -1)
    )
    hist = daily.withColumn(
        "trail", F.array_sort(F.collect_list("v").over(w))
    ).filter(F.size("trail") == _PB_WIN)
    outs = []
    for q in _PB_QS:
        k = math.ceil(q * _PB_WIN)
        yhat = F.element_at("trail", k).cast("double")
        y = F.col("v").cast("double")
        pin = F.when(y >= yhat, q * (y - yhat)).otherwise(
            (1 - q) * (yhat - y)
        )
        outs.append(
            hist.groupBy("event_type").agg(
                F.lit(q).alias("q"),
                F.count(F.lit(1)).cast("long").alias("n_days"),
                F.round(F.avg(pin), 6).alias("pinball"),
                F.round(F.avg((y <= yhat).cast("double")), 6).alias(
                    "coverage"
                ),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def _q261_sql() -> str:
    import math as _m

    branches = []
    for q in _PB_QS:
        k = _m.ceil(q * _PB_WIN)
        branches.append(
            f"""
SELECT event_type, CAST({q} AS DOUBLE) AS q,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(CASE WHEN v >= yh THEN {q} * (v - yh)
                 ELSE (1 - {q}) * (yh - v) END), 6) AS pinball,
       ROUND(AVG(CASE WHEN v <= yh THEN 1.0 ELSE 0.0 END), 6)
         AS coverage
FROM (SELECT event_type, CAST(v AS DOUBLE) AS v,
             CAST(trail[{k}] AS DOUBLE) AS yh FROM hist)
GROUP BY event_type"""
        )
    return (
        f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
), hist AS (
  SELECT event_type, v, list_sort(trail) AS trail FROM (
    SELECT event_type, v,
           list(v) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN {_PB_WIN} PRECEDING AND 1 PRECEDING) AS trail
    FROM daily
  ) WHERE len(trail) = {_PB_WIN}
)"""
        + "\nUNION ALL\n".join(branches)
    )


# --------------------------------------------------------------------------
# q264 — MANN-KENDALL trend test (Mann 1945; Kendall 1975): the
# nonparametric significance test that pairs with q249's Theil-Sen
# slope — S = Σ_{i<j} sign(x_j − x_i) over the day-ordered series,
# Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 with the tie
# correction (daily counts DO tie), z = (S∓1)/√Var with the
# continuity correction. Distribution-free: spikes that wreck an OLS
# t-test only contribute ±1 each.
#
# Scale posture: the pairwise sign sum runs on the per-type DAY GRID
# (≤ span² pairs per type), the tie term on the (type, value)
# histogram; the raw feed is touched once.
# --------------------------------------------------------------------------


def q264_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", F.floor(es / 86400).cast("long").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.signum(F.col("b.v") - F.col("a.v")).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    j = s.join(nn, "event_type").join(ties, "event_type")
    var = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s_stat"),
        F.round(var, 2).alias("var_s"),
        F.round(z, 6).alias("z_mk"),
        F.signum(F.col("s")).cast("int").alias("trend"),
    )


Q264_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(SUM(SIGN(b.v - a.v)) AS BIGINT) AS s,
         COUNT(*) AS n_pairs
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY a.event_type
), nn AS (
  SELECT event_type, COUNT(*) AS n FROM daily GROUP BY event_type
), ties AS (
  SELECT event_type,
         SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, v, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY event_type
), j AS (
  SELECT s.event_type, s.s, nn.n,
         (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) / 18.0
           AS var_s
  FROM s JOIN nn USING (event_type) JOIN ties USING (event_type)
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(s AS BIGINT) AS s_stat, ROUND(var_s, 2) AS var_s,
       ROUND(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z_mk,
       CAST(SIGN(s) AS INT) AS trend
FROM j
"""


# --------------------------------------------------------------------------
# q265 — CUSUM CHANGEPOINT detection (Page 1954; the AMOC variant of
# Hinkley 1970): per event type, the single most likely mean-shift day
# is the argmax of |S_t − (t/n)·S_n| over the cumulative daily-volume
# sum — the monitoring primitive behind "did this feed's level change,
# and when?". Reports the split day, before/after means, and the
# normalized max-CUSUM statistic D/(σ̂√n) a threshold rule consumes.
#
# Scale posture: everything after the first groupBy runs on the
# per-type day grid — cumulative and argmax windows are partitioned by
# type over that aggregate; ties break on the earlier day via the
# 6dp-rounded statistic (engine-stable ordering).
# --------------------------------------------------------------------------


def q265_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", F.floor(es / 86400).cast("long").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = (
        daily.withColumn("t", F.count(F.lit(1)).over(wcum))
        .withColumn("st", F.sum("v").over(wcum))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("sn", F.sum("v").over(wall))
        .withColumn("sd", F.stddev_pop("v").over(wall))
    )
    # a type whose daily counts are all identical has sd=0 — no
    # changepoint is definable and the normalized stat divides by zero
    c = c.filter((F.col("t") < F.col("n")) & (F.col("sd") > 0)).withColumn(
        "d",
        F.round(
            F.abs(F.col("st") - F.col("t") / F.col("n") * F.col("sn")), 6
        ),
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.desc("d"), F.asc("day")
    )
    best = (
        c.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            F.col("t").cast("long").alias("days_before"),
            (F.col("n") - F.col("t")).cast("long").alias("days_after"),
            F.round(F.col("st") / F.col("t"), 4).alias("mean_before"),
            F.round(
                (F.col("sn") - F.col("st")) / (F.col("n") - F.col("t")), 4
            ).alias("mean_after"),
            F.round(
                F.col("d") / (F.col("sd") * F.sqrt(F.col("n"))), 6
            ).alias("cusum_stat"),
        )
    )
    return best


Q265_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, day,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t,
         SUM(v) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(v) OVER (PARTITION BY event_type) AS sn,
         stddev_pop(v) OVER (PARTITION BY event_type) AS sd
  FROM daily
), d AS (
  SELECT *, ROUND(ABS(st - (t / (1.0 * n)) * sn), 6) AS d
  FROM c WHERE t < n AND sd > 0
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY d DESC, day) AS rn
  FROM d
)
SELECT event_type, day AS split_day,
       CAST(t AS BIGINT) AS days_before,
       CAST(n - t AS BIGINT) AS days_after,
       ROUND(st / t, 4) AS mean_before,
       ROUND((sn - st) / (n - t), 4) AS mean_after,
       ROUND(d / (sd * sqrt(n)), 6) AS cusum_stat
FROM best WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q268 — DISTRIBUTION-FREE MEDIAN CI from order statistics (the
# binomial/normal-approximation interval, e.g. Conover 1999 §3.2):
# the (x_(l), x_(u)) interval with l = ⌊n/2 − 0.98√n⌋ and
# u = ⌈n/2 + 1 + 0.98√n⌉ covers the true median at ~95% with NO
# distributional assumption — the honest error bar for the skewed
# metrics q254 winsorizes. Median and both CI endpoints are exact
# order statistics read off the per-type VALUE-HISTOGRAM cumulative
# counts (q254's rank-from-histogram idiom) — no per-row rank window.
#
# Scale posture: one shuffle to the bounded (type, value) histogram;
# cumulative window partitioned by type over that aggregate; one
# final per-type rollup.
# --------------------------------------------------------------------------


def q268_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    hist = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    half = F.col("n") / 2.0
    sq = 0.98 * F.sqrt(F.col("n"))
    r_lo = F.greatest(F.floor(half - sq), F.lit(1).cast("long"))
    r_hi = F.least(F.ceil(half + 1 + sq), F.col("n"))
    r_m1 = F.ceil(half)
    r_m2 = F.floor(half) + 1

    def at(rank):
        return F.min(F.when(F.col("cum") >= rank, F.col("value")))

    return h.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.round((at(r_m1) + at(r_m2)) / 2.0, 4).alias("median"),
        at(r_lo).alias("ci_lo"),
        at(r_hi).alias("ci_hi"),
    )


Q268_SQL = """
WITH hist AS (
  SELECT event_type, value, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), h AS (
  SELECT event_type, value, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       ROUND((MIN(CASE WHEN cum >= CEIL(n / 2.0) THEN value END)
            + MIN(CASE WHEN cum >= FLOOR(n / 2.0) + 1 THEN value END))
             / 2.0, 4) AS median,
       MIN(CASE WHEN cum >= GREATEST(FLOOR(n / 2.0 - 0.98 * sqrt(n)), 1)
           THEN value END) AS ci_lo,
       MIN(CASE WHEN cum >= LEAST(CEIL(n / 2.0 + 1 + 0.98 * sqrt(n)), n)
           THEN value END) AS ci_hi
FROM h GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q269 — ADAPTIVE-GAP SESSIONIZATION: q19 hard-codes a 30-minute gap;
# real feeds derive the cut from the data — here the 75th percentile
# of the observed inter-arrival gaps (exact, from the bounded
# gap-histogram cumulative counts), broadcast back as the session
# threshold. The two-pass derive-then-apply shape is the standard
# "data-driven hyperparameter" pipeline stage.
#
# Scale posture: gaps come from the user-partitioned lag window (one
# shuffle on user_id); the percentile is read off the gap HISTOGRAM
# (bounded by distinct integer gap seconds), never a global per-row
# rank; the threshold is a 1-row broadcast; sessionization reuses the
# same user partitioning.
# --------------------------------------------------------------------------


def q269_adaptive_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gaps = e.select(
        "user_id",
        "event_id",
        "ts",
        (epoch - F.lag(epoch, 1).over(w)).alias("gap"),
    ).persist()
    ghist = (
        gaps.filter(F.col("gap").isNotNull())
        .groupBy("gap")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wg = Window.orderBy("gap").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gh = ghist.withColumn("cum", F.sum("cnt").over(wg)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    thresh = gh.agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(0.75 * F.col("n")), F.col("gap")
            )
        ).alias("thresh")
    )
    j = gaps.crossJoin(F.broadcast(thresh))
    is_new = F.when(
        F.col("gap").isNull() | (F.col("gap") > F.col("thresh")), 1
    ).otherwise(0)
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        j.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("thresh").cast("long").alias("gap_thresh"),
        )
        .localCheckpoint()
    )
    gaps.unpersist()
    return out


Q269_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), gh AS (
  SELECT gap, cnt,
         SUM(cnt) OVER (ORDER BY gap
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS n
  FROM (SELECT gap, COUNT(*) AS cnt FROM g
        WHERE gap IS NOT NULL GROUP BY gap)
), th AS (
  SELECT MIN(CASE WHEN cum >= CEIL(0.75 * n) THEN gap END) AS thresh
  FROM gh
), s AS (
  SELECT user_id, thresh,
         SUM(CASE WHEN gap IS NULL OR gap > thresh THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM g CROSS JOIN th
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(thresh) AS BIGINT) AS gap_thresh
FROM s GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q274 — LOG-RANK TEST (Mantel 1966): does survival differ between two
# cohorts? Reuses q250's subject framing ((user, event_type)
# engagements, last-7-days censoring) split into cohorts by user parity
# and compares the full survival CURVES — the correct test where a
# t-test on mean lifetime would be censoring-biased. At each event time
# the observed cohort-A churn d_a is compared with its hypergeometric
# expectation d·n_a/n under H0, with the matching variance; the
# statistic is (Σ(d_a − E_a))² / ΣV_a ~ χ²(1).
#
# Scale posture: one corpus shuffle collapses the feed to per-subject
# lifetimes; the cohort-pivoted lifetime histogram (≤ feed-span rows)
# carries the reverse-cumulative risk-set windows and the final 1-row
# reduction. Same histogram-space order-statistics shape as q250/q268.
# --------------------------------------------------------------------------


def q274_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(es / 86400).cast("long").alias("day"),
    )
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.min("day").alias("f"), F.max("day").alias("l")
    )
    gmax = per_user.agg(F.max("l").alias("gm"))
    lives = per_user.crossJoin(F.broadcast(gmax)).select(
        (F.col("user_id") % 2).alias("g"),
        (F.col("l") - F.col("f")).alias("t"),
        (F.col("l") <= F.col("gm") - _KM_CENSOR_DAYS)
        .cast("long")
        .alias("churned"),
    )
    hist = lives.groupBy("t").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("tot_a"),
        F.sum(F.when(F.col("g") == 0, F.col("churned")).otherwise(0)).alias(
            "d_a"
        ),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("tot_b"),
        F.sum(F.when(F.col("g") == 1, F.col("churned")).otherwise(0)).alias(
            "d_b"
        ),
    )
    w_risk = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    r = hist.withColumn("na", F.sum("tot_a").over(w_risk)).withColumn(
        "nb", F.sum("tot_b").over(w_risk)
    )
    d = F.col("d_a") + F.col("d_b")
    n = F.col("na") + F.col("nb")
    fa = F.col("na") / n.cast("double")
    e_a = d * fa
    v = d * fa * (1 - fa) * (n - d) / (n - 1).cast("double")
    terms = r.filter((d > 0) & (n > 1)).select(
        "tot_a",
        "tot_b",
        "d_a",
        "d_b",
        (F.col("d_a") - e_a).alias("ome"),
        v.alias("v"),
    )
    ome = F.sum("ome")
    var = F.sum("v")
    return terms.agg(
        F.sum("tot_a").cast("long").alias("n_a"),
        F.sum("tot_b").cast("long").alias("n_b"),
        F.sum("d_a").cast("long").alias("churned_a"),
        F.sum("d_b").cast("long").alias("churned_b"),
        F.round(ome, 6).alias("o_minus_e"),
        F.round(var, 6).alias("var_lr"),
        F.round(
            F.when(var > 0, ome * ome / var).otherwise(F.lit(None)), 6
        ).alias("chi2"),
    )


Q274_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
), per_user AS (
  SELECT user_id, event_type, MIN(day) AS f, MAX(day) AS l
  FROM ev GROUP BY user_id, event_type
), gmax AS (SELECT MAX(l) AS gm FROM per_user),
lives AS (
  SELECT user_id % 2 AS g, l - f AS t,
         CASE WHEN l <= gm - {_KM_CENSOR_DAYS} THEN 1 ELSE 0 END
           AS churned
  FROM per_user CROSS JOIN gmax
), hist AS (
  SELECT t,
         SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS tot_a,
         SUM(CASE WHEN g = 0 THEN churned ELSE 0 END) AS d_a,
         SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS tot_b,
         SUM(CASE WHEN g = 1 THEN churned ELSE 0 END) AS d_b
  FROM lives GROUP BY t
), risk AS (
  SELECT t, tot_a, tot_b, d_a, d_b,
         SUM(tot_a) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS na,
         SUM(tot_b) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM hist
), terms AS (
  SELECT tot_a, tot_b, d_a, d_b,
         d_a - (d_a + d_b) * (na / CAST(na + nb AS DOUBLE)) AS ome,
         (d_a + d_b) * (na / CAST(na + nb AS DOUBLE))
           * (1 - na / CAST(na + nb AS DOUBLE))
           * (na + nb - d_a - d_b)
           / CAST(na + nb - 1 AS DOUBLE) AS v
  FROM risk
  WHERE d_a + d_b > 0 AND na + nb > 1
)
SELECT CAST(SUM(tot_a) AS BIGINT) AS n_a,
       CAST(SUM(tot_b) AS BIGINT) AS n_b,
       CAST(SUM(d_a) AS BIGINT) AS churned_a,
       CAST(SUM(d_b) AS BIGINT) AS churned_b,
       ROUND(SUM(ome), 6) AS o_minus_e,
       ROUND(SUM(v), 6) AS var_lr,
       ROUND(CASE WHEN SUM(v) > 0
             THEN SUM(ome) * SUM(ome) / SUM(v) END, 6) AS chi2
FROM terms
"""


# --------------------------------------------------------------------------
# q275 — DELETE-ONE-BUCKET JACKKNIFE (Quenouille/Tukey; the standard
# big-data variance recipe, e.g. Google's "poor man's bootstrap"): the
# ratio metric θ = Σvalue / #users has no closed-form variance because
# both numerator and denominator are random. Users are hashed into
# B=32 portable buckets; each leave-one-bucket-out replicate
# θ_(−b) = (S−s_b)/(U−u_b) is closed-form from per-bucket sufficient
# statistics, and var_jack = (B−1)/B · Σ(θ_(−b) − θ̄)². Buckets
# partition USERS (not rows), so the denominator's distinct-count
# arithmetic stays exact.
#
# Scale posture: one shuffle to per-user sums, one partial-agg rollup
# to the 32-row bucket table; the jackknife itself is O(B) arithmetic
# on that table joined to a broadcast 1-row total. The md5-based
# bucket hash is engine-portable by construction.
# --------------------------------------------------------------------------

_JK_BUCKETS = 32


def q275_ratio_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s_u"))
        .select(
            F.pmod(
                md5long(F.col("user_id").cast("string")), _JK_BUCKETS
            ).alias("b"),
            "s_u",
        )
    )
    buckets = per_user.groupBy("b").agg(
        F.sum("s_u").alias("s_b"), F.count(F.lit(1)).alias("u_b")
    )
    tot = buckets.agg(
        F.sum("s_b").alias("s"), F.sum("u_b").alias("u")
    )
    jack = buckets.crossJoin(F.broadcast(tot)).select(
        "s",
        "u",
        # try_divide twice: one bucket holding every user makes the
        # leave-one-out denominator 0, and an empty corpus makes the
        # bucket count 0 — DuckDB renders both as NULL (deg sweeps)
        F.try_divide(
            F.col("s") - F.col("s_b"),
            (F.col("u") - F.col("u_b")).cast("double"),
        ).alias("th_b"),
    )
    bcnt = F.count(F.lit(1)).cast("double")
    theta = F.try_divide(F.max("s"), F.max("u").cast("double"))
    var = (
        F.try_divide(bcnt - 1, bcnt)
        * (F.sum(F.col("th_b") * F.col("th_b")) - bcnt * F.avg("th_b") * F.avg("th_b"))
    )
    se = F.sqrt(var)
    return jack.agg(
        bcnt.cast("long").alias("n_buckets"),
        F.max("u").cast("long").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(se, 6).alias("se_jack"),
        F.round(theta - 1.96 * se, 6).alias("ci_lo"),
        F.round(theta + 1.96 * se, 6).alias("ci_hi"),
    )


Q275_SQL = f"""
WITH per_user AS (
  SELECT {MD5LONG_SQL.format(x='CAST(user_id AS VARCHAR)')}
           % {_JK_BUCKETS} AS b,
         SUM(value) AS s_u
  FROM events GROUP BY user_id
), buckets AS (
  SELECT b, SUM(s_u) AS s_b, COUNT(*) AS u_b
  FROM per_user GROUP BY b
), tot AS (SELECT SUM(s_b) AS s, SUM(u_b) AS u FROM buckets),
jack AS (
  SELECT s, u, (s - s_b) / CAST(u - u_b AS DOUBLE) AS th_b
  FROM buckets CROSS JOIN tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(MAX(u) AS BIGINT) AS n_users,
       ROUND(MAX(s) / CAST(MAX(u) AS DOUBLE), 6) AS theta,
       ROUND(sqrt((COUNT(*) - 1.0) / COUNT(*)
             * (SUM(th_b * th_b)
                - COUNT(*) * AVG(th_b) * AVG(th_b))), 6) AS se_jack,
       ROUND(MAX(s) / CAST(MAX(u) AS DOUBLE)
             - 1.96 * sqrt((COUNT(*) - 1.0) / COUNT(*)
               * (SUM(th_b * th_b)
                  - COUNT(*) * AVG(th_b) * AVG(th_b))), 6) AS ci_lo,
       ROUND(MAX(s) / CAST(MAX(u) AS DOUBLE)
             + 1.96 * sqrt((COUNT(*) - 1.0) / COUNT(*)
               * (SUM(th_b * th_b)
                  - COUNT(*) * AVG(th_b) * AVG(th_b))), 6) AS ci_hi
FROM jack
"""


# --------------------------------------------------------------------------
# q276 — COCHRAN-ARMITAGE TREND TEST (Cochran 1954; Armitage 1955): is
# a binary outcome rate monotonically associated with an ORDERED
# factor? Here: P(order value > 150k) across the 5 priority levels
# scored 1..5 — the ordinal complement of q117's unordered χ². With
# p̄ = R/N: T = Σ x_i (r_i − n_i p̄), Var = p̄(1−p̄)(Σ n_i x_i² −
# (Σ n_i x_i)²/N), Z = T/√Var. The per-level counts (n_i, r_i) are
# pure integers, so T's inputs are exact; doubles appear only in the
# final rendered statistic.
#
# Scale posture: the corpus collapses to the 5-row score contingency
# in one partial-agg pass with a 2-column pruned scan; everything else
# is 1-row arithmetic.
# --------------------------------------------------------------------------

_CA_PRICE_CUT = 150000.0


def q276_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
        F.when(F.col("o_totalprice") > _CA_PRICE_CUT, 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
    )
    cont = o.groupBy("x").agg(
        F.count(F.lit(1)).alias("n_i"), F.sum("y").alias("r_i")
    )
    nn = F.sum("n_i")
    rr = F.sum("r_i")
    pbar = rr / nn.cast("double")
    t_stat = F.sum(F.col("x") * F.col("r_i")) - pbar * F.sum(
        F.col("x") * F.col("n_i")
    )
    var = (
        pbar
        * (1 - pbar)
        * (
            F.sum(F.col("x") * F.col("x") * F.col("n_i"))
            - F.sum(F.col("x") * F.col("n_i"))
            * F.sum(F.col("x") * F.col("n_i"))
            / nn.cast("double")
        )
    )
    # try_divide: one priority level → zero trend variance (DuckDB:
    # 0/0 → NULL z)
    z = F.try_divide(t_stat, F.sqrt(var))
    return cont.agg(
        nn.cast("long").alias("n"),
        rr.cast("long").alias("n_pos"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(z, 6).alias("z_trend"),
        F.round(z * z, 6).alias("chi2_trend"),
    )


Q276_SQL = f"""
WITH o AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
         CASE WHEN o_totalprice > {_CA_PRICE_CUT} THEN 1 ELSE 0 END AS y
  FROM orders
), cont AS (
  SELECT x, COUNT(*) AS n_i, SUM(y) AS r_i FROM o GROUP BY x
)
SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       ROUND(p_bar, 6) AS p_bar,
       ROUND(z, 6) AS z_trend,
       ROUND(z * z, 6) AS chi2_trend
FROM (
  SELECT SUM(n_i) AS n, SUM(r_i) AS n_pos,
         SUM(r_i) / CAST(SUM(n_i) AS DOUBLE) AS p_bar,
         (SUM(x * r_i) - SUM(r_i) / CAST(SUM(n_i) AS DOUBLE)
            * SUM(x * n_i))
         / sqrt(SUM(r_i) / CAST(SUM(n_i) AS DOUBLE)
           * (1 - SUM(r_i) / CAST(SUM(n_i) AS DOUBLE))
           * (SUM(x * x * n_i)
              - SUM(x * n_i) * SUM(x * n_i)
                / CAST(SUM(n_i) AS DOUBLE))) AS z
  FROM cont
) t
"""


# --------------------------------------------------------------------------
# q287 — KLEINBERG BURST DETECTION (Kleinberg 2002, two-state
# automaton): label each day of every event type's daily-count series
# as base-rate or BURST via Viterbi decoding — base state emits
# Poisson(r0 = series mean), burst state Poisson(r1 = 2·r0), entering
# a burst costs γ=2. Genuinely SEQUENTIAL dynamic programming (each
# day's survivor depends on the previous day's), so the Spark side
# runs it as ONE Arrow batch per event type (`applyInPandas` over the
# bounded daily series — the sanctioned pattern for per-group
# stateful algorithms), while the DuckDB oracle unrolls the identical
# recurrence as a generated 64-step CTE chain carrying survivor paths
# as strings. Both sides bound the series to the first 64 days
# EXPLICITLY (q206's loud-bound discipline) and break cost ties toward
# the incumbent state (<=), so the decode is deterministic.
#
# Scale posture: one corpus shuffle to the (type, day) histogram; the
# Arrow stage sees ≤64 rows per type. At 100 TB the heavy work is the
# partial-agg count — the decode is O(types × days), corpus-free.
# --------------------------------------------------------------------------

_BURST_GAMMA = 2.0
_BURST_MAX_DAYS = 64


def _burst_viterbi(pdf):
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("day").head(_BURST_MAX_DAYS)
    y = pdf["y"].to_numpy(dtype="float64")
    r0 = y.mean()
    r1 = 2.0 * r0
    e0 = r0 - y * np.log(r0)
    e1 = r1 - y * np.log(r1)
    g = _BURST_GAMMA
    c0, c1 = e0[0], e1[0] + g
    p0, p1 = "0", "1"
    for t in range(1, len(y)):
        n0 = e0[t] + (c0 if c0 <= c1 else c1)
        np0 = (p0 if c0 <= c1 else p1) + "0"
        n1 = e1[t] + (c1 if c1 <= c0 + g else c0 + g)
        np1 = (p1 if c1 <= c0 + g else p0) + "1"
        c0, c1, p0, p1 = n0, n1, np0, np1
    path = p0 if c0 <= c1 else p1
    return pd.DataFrame(
        {
            "event_type": pdf["event_type"].iloc[: len(y)].values,
            "day": pdf["day"].iloc[: len(y)].values,
            "y": pdf["y"].iloc[: len(y)].values,
            "in_burst": [int(ch) for ch in path],
        }
    )


def q287_kleinberg_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = e.groupBy(F.col("event_type"), day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    # the oracle's final JOIN ... USING (event_type) drops a NULL type
    # group (NULL never equi-joins); mirror before the grouped map
    return (
        daily.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .applyInPandas(
            _burst_viterbi,
            "event_type string, day long, y long, in_burst long",
        )
    )


def _q287_sql(steps: int = _BURST_MAX_DAYS) -> str:
    g = _BURST_GAMMA
    base = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1
           AS i
  FROM daily
  QUALIFY i < {steps}
), r AS (
  SELECT event_type, AVG(y) AS r0 FROM idx GROUP BY event_type
), dd AS MATERIALIZED (
  SELECT idx.event_type, idx.day, idx.y, idx.i,
         r.r0 - idx.y * ln(r.r0) AS e0,
         2 * r.r0 - idx.y * ln(2 * r.r0) AS e1
  FROM idx JOIN r USING (event_type)
),
v0 AS (
  SELECT event_type, e0 AS c0, e1 + {g} AS c1,
         '0' AS p0, '1' AS p1
  FROM dd WHERE i = 0
)"""
    ctes = [base]
    for t in range(1, steps):
        ctes.append(f""",
v{t} AS (
  SELECT v.event_type,
         CASE WHEN d.y IS NULL THEN v.c0
              ELSE d.e0 + LEAST(v.c0, v.c1) END AS c0,
         CASE WHEN d.y IS NULL THEN v.c1
              ELSE d.e1 + LEAST(v.c1, v.c0 + {g}) END AS c1,
         CASE WHEN d.y IS NULL THEN v.p0
              ELSE (CASE WHEN v.c0 <= v.c1 THEN v.p0 ELSE v.p1 END)
                   || '0' END AS p0,
         CASE WHEN d.y IS NULL THEN v.p1
              ELSE (CASE WHEN v.c1 <= v.c0 + {g} THEN v.p1 ELSE v.p0
                    END) || '1' END AS p1
  FROM v{t - 1} v
  LEFT JOIN dd d ON d.event_type = v.event_type AND d.i = {t}
)""")
    return (
        "".join(ctes)
        + f""",
decoded AS (
  SELECT event_type,
         CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
  FROM v{steps - 1}
)
SELECT d.event_type, d.day, d.y,
       CAST(substr(dec.path, d.i + 1, 1) AS BIGINT) AS in_burst
FROM dd d JOIN decoded dec USING (event_type)"""
    )


# --------------------------------------------------------------------------
# q284 — MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016): q93's
# last-touch rule gives the whole conversion to the final channel; the
# Markov model credits each channel by how much conversion DROPS when
# it is removed. The journey chain is q194's transition machinery plus
# a virtual 'start' state (start → each user's first event);
# 'purchase' wins, 'error' loses. For each channel c, the removed
# chain redirects every b = c transition to a dead end, and
# removal_effect(c) = 1 − P_removed(win|start)/P_full(win|start); the
# normalized effects are the attribution shares. Both chains run the
# same 8-round value iteration as q194 (fixed-round, unrolled oracle).
#
# Scale posture: one corpus shuffle builds the transition counts; all
# 4 value-iteration chains (full + 3 removals) run on the checkpointed
# ≤36-row probability matrix. Nothing downstream scales with the feed.
# --------------------------------------------------------------------------

_ATTR_ROUNDS = 8
_ATTR_CHANNELS = ("click", "signup", "view")


def q284_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    seq = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "nxt", F.lead("event_type").over(w)
    )
    trans = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    starts = (
        seq.filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit("start").alias("a"), "b", "c")
    )
    pairs = trans.unionByName(starts)
    tot = pairs.groupBy("a").agg(F.sum("c").alias("t"))
    P = (
        pairs.join(tot, "a")
        .filter(~F.col("a").isin(_ABS_WIN, _ABS_LOSS))
        .select("a", "b", (F.col("c") / F.col("t")).alias("p"))
        .localCheckpoint()
    )

    def value_iter(removed: str | None):
        v = (
            P.select(F.col("a").alias("state"))
            .distinct()
            .select("state", F.lit(0.0).alias("v"))
        )
        for _ in range(_ATTR_ROUNDS):
            vb = F.when(F.col("b") == _ABS_WIN, F.lit(1.0)).when(
                F.col("b") == _ABS_LOSS, F.lit(0.0)
            )
            if removed is not None:
                vb = F.when(F.col("b") == removed, F.lit(0.0)).otherwise(
                    vb
                )
            j = P.join(
                v.select(
                    F.col("state").alias("_bs"), F.col("v").alias("_bv")
                ),
                P.b == F.col("_bs"),
                "left",
            )
            v = (
                j.groupBy(F.col("a").alias("state"))
                .agg(
                    F.sum(
                        F.col("p")
                        * F.coalesce(vb, F.coalesce("_bv", F.lit(0.0)))
                    ).alias("v")
                )
                .localCheckpoint()
            )
        # scalar-subquery semantics: exactly one row, NULL when the
        # 'start' state doesn't exist (empty corpus — deg_empty sweep);
        # a bare filter would render zero rows and erase the channel
        # rows the oracle's UNION ALL always emits
        return v.filter(F.col("state") == "start").agg(
            F.max("v").alias("pv")
        )

    base = value_iter(None)
    out = None
    for ch in _ATTR_CHANNELS:
        row = (
            value_iter(ch)
            .withColumnRenamed("pv", "p_removed")
            .crossJoin(F.broadcast(base))
            .select(
                F.lit(ch).alias("channel"),
                F.col("pv").alias("p_base"),
                "p_removed",
                (1 - F.try_divide("p_removed", "pv")).alias("re"),
            )
        )
        out = row if out is None else out.unionByName(row)
    tot_re = out.agg(F.sum("re").alias("sre"))
    return out.crossJoin(F.broadcast(tot_re)).select(
        "channel",
        F.round("p_base", 6).alias("p_win_base"),
        F.round("p_removed", 6).alias("p_win_removed"),
        F.round("re", 6).alias("removal_effect"),
        F.round(F.try_divide("re", "sre"), 6).alias("share"),
    )


def _q284_sql(rounds: int = _ATTR_ROUNDS) -> str:
    base = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), seq AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY es, event_id) AS rn,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS b
  FROM ev
), pairs AS (
  SELECT event_type AS a, b, COUNT(*) AS c
  FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
  UNION ALL
  SELECT 'start' AS a, event_type AS b, COUNT(*) AS c
  FROM seq WHERE rn = 1 GROUP BY 1, 2
), p AS MATERIALIZED (
  SELECT pairs.a, pairs.b, pairs.c / (1.0 * t.t) AS p
  FROM pairs
  JOIN (SELECT a, SUM(c) AS t FROM pairs GROUP BY a) t USING (a)
  WHERE pairs.a NOT IN ('{_ABS_WIN}', '{_ABS_LOSS}')
),
vf0 AS (SELECT DISTINCT a AS state, CAST(0 AS DOUBLE) AS v FROM p)"""
    steps = [base]
    for k in range(1, rounds + 1):
        steps.append(
            f"""
vf{k} AS (SELECT p.a AS state,
         SUM(p.p * CASE WHEN p.b = '{_ABS_WIN}' THEN 1.0
                        WHEN p.b = '{_ABS_LOSS}' THEN 0.0
                        ELSE COALESCE(v.v, 0) END) AS v
         FROM p LEFT JOIN vf{k - 1} v ON p.b = v.state GROUP BY p.a)"""
        )
    for ci, ch in enumerate(_ATTR_CHANNELS):
        steps.append(
            f"""
vc{ci}_0 AS (SELECT DISTINCT a AS state, CAST(0 AS DOUBLE) AS v FROM p)"""
        )
        for k in range(1, rounds + 1):
            steps.append(
                f"""
vc{ci}_{k} AS (SELECT p.a AS state,
         SUM(p.p * CASE WHEN p.b = '{ch}' THEN 0.0
                        WHEN p.b = '{_ABS_WIN}' THEN 1.0
                        WHEN p.b = '{_ABS_LOSS}' THEN 0.0
                        ELSE COALESCE(v.v, 0) END) AS v
         FROM p LEFT JOIN vc{ci}_{k - 1} v ON p.b = v.state
         GROUP BY p.a)"""
            )
    res = " UNION ALL ".join(
        f"""SELECT '{ch}' AS channel,
       (SELECT v FROM vf{rounds} WHERE state = 'start') AS p_base,
       (SELECT v FROM vc{ci}_{rounds} WHERE state = 'start')
         AS p_removed"""
        for ci, ch in enumerate(_ATTR_CHANNELS)
    )
    return (
        ",".join(steps)
        + f""",
re AS (
  SELECT channel, p_base, p_removed,
         1 - p_removed / p_base AS re
  FROM ({res}) r
)
SELECT channel, ROUND(p_base, 6) AS p_win_base,
       ROUND(p_removed, 6) AS p_win_removed,
       ROUND(re, 6) AS removal_effect,
       ROUND(re / SUM(re) OVER (), 6) AS share
FROM re"""
    )


# --------------------------------------------------------------------------
# q285 — HERFINDAHL-HIRSCHMAN CONCENTRATION: per language, how
# concentrated is the corpus across sources? HHI = Σ share², its
# normalized form (HHI − 1/k)/(1 − 1/k), and the effective number of
# sources 1/HHI — the diversity audit a corpus-mixing stage (q88/q242)
# reads before trusting a language's source spread. Integer counts
# until the final shares; single-source languages pin HHI_norm = 1.
#
# Scale posture: one partial-agg pass to the (lang, source) cell
# table; the per-lang rollup runs on that bounded aggregate.
# --------------------------------------------------------------------------


def q285_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = cells.groupBy("lang").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    hhi = F.col("ss") / (F.col("n_docs") * F.col("n_docs")).cast("double")
    k = F.col("n_sources").cast("double")
    norm = F.when(F.col("n_sources") > 1, (hhi - 1 / k) / (1 - 1 / k)).otherwise(
        F.lit(1.0)
    )
    return g.select(
        "lang",
        "n_docs",
        "n_sources",
        F.round(hhi, 6).alias("hhi"),
        F.round(
            (F.col("n_docs") * F.col("n_docs")).cast("double")
            / F.col("ss"),
            4,
        ).alias("effective_sources"),
        F.round(norm, 6).alias("hhi_norm"),
    )


Q285_SQL = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n
  FROM documents GROUP BY 1, 2
), g AS (
  SELECT lang, SUM(n) AS n_docs, COUNT(*) AS n_sources,
         SUM(n * n) AS ss
  FROM cells GROUP BY lang
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_sources AS BIGINT) AS n_sources,
       ROUND(ss / CAST(n_docs * n_docs AS DOUBLE), 6) AS hhi,
       ROUND(CAST(n_docs * n_docs AS DOUBLE) / ss, 4)
         AS effective_sources,
       ROUND(CASE WHEN n_sources > 1
             THEN (ss / CAST(n_docs * n_docs AS DOUBLE)
                   - 1 / CAST(n_sources AS DOUBLE))
                  / (1 - 1 / CAST(n_sources AS DOUBLE))
             ELSE 1.0 END, 6) AS hhi_norm
FROM g
"""


# --------------------------------------------------------------------------
# q281 — mSPRT ALWAYS-VALID SEQUENTIAL TEST (Robbins 1970; Johari et
# al. 2017 "Peeking at A/B tests"): the fixed-horizon z-test (q131) is
# invalidated by daily peeking; the mixture sequential probability
# ratio test gives a p-value that is valid at EVERY interim look. Data:
# the daily difference in mean event value between the user-parity
# cohorts. With the normal mixture τ² = σ² (σ² estimated once from the
# full diff series), the likelihood ratio at day n is
#   Λ_n = √(1/(1+n)) · exp(n²·x̄_n² / (2σ²(1+n)))
# and the always-valid p is p_n = min(1, 1/max_{k≤n} Λ_k) — a running
# max, so p is monotonically non-increasing by construction.
#
# Scale posture: one corpus shuffle to per-(day, cohort) means; the
# cumulative-mean and running-max windows run over the bounded day
# table. The σ² constant joins back as a broadcast 1-row frame.
# --------------------------------------------------------------------------


def q281_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    e = load(spark, sf_dir, "events").select(
        F.floor(es / 86400).cast("long").alias("day"),
        (F.col("user_id") % 2).alias("g"),
        "value",
    )
    daily = e.groupBy("day").agg(
        F.avg(F.when(F.col("g") == 0, F.col("value"))).alias("xa"),
        F.avg(F.when(F.col("g") == 1, F.col("value"))).alias("xb"),
    )
    dd = daily.filter(
        F.col("xa").isNotNull() & F.col("xb").isNotNull()
    ).select("day", (F.col("xa") - F.col("xb")).alias("diff"))
    sig = dd.agg(
        (
            F.avg(F.col("diff") * F.col("diff"))
            - F.avg("diff") * F.avg("diff")
        ).alias("s2")
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        dd.crossJoin(F.broadcast(sig))
        .withColumn("n", F.count(F.lit(1)).over(w_cum))
        .withColumn("xbar", F.avg("diff").over(w_cum))
    )
    lam = F.sqrt(1.0 / (1.0 + F.col("n"))) * F.exp(
        F.col("n")
        * F.col("n")
        * F.col("xbar")
        * F.col("xbar")
        / (2 * F.col("s2") * (1.0 + F.col("n")))
    )
    lc = c.withColumn("lam", lam).withColumn(
        "lmax", F.max("lam").over(w_cum)
    )
    return lc.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.round("xbar", 6).alias("mean_diff"),
        F.round("lam", 6).alias("lam"),
        F.round(F.least(F.lit(1.0), 1.0 / F.col("lmax")), 6).alias(
            "p_always_valid"
        ),
    )


Q281_SQL = """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         user_id % 2 AS g, value
  FROM events
), daily AS (
  SELECT day,
         AVG(CASE WHEN g = 0 THEN value END) AS xa,
         AVG(CASE WHEN g = 1 THEN value END) AS xb
  FROM e GROUP BY day
), dd AS (
  SELECT day, xa - xb AS diff FROM daily
  WHERE xa IS NOT NULL AND xb IS NOT NULL
), sig AS (
  SELECT AVG(diff * diff) - AVG(diff) * AVG(diff) AS s2 FROM dd
), c AS (
  SELECT day, s2,
         COUNT(*) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
         AVG(diff) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xbar
  FROM dd CROSS JOIN sig
), l AS (
  SELECT day, n, xbar,
         sqrt(1.0 / (1.0 + n))
           * exp(n * n * xbar * xbar / (2 * s2 * (1.0 + n))) AS lam
  FROM c
)
SELECT day, CAST(n AS BIGINT) AS n,
       ROUND(xbar, 6) AS mean_diff,
       ROUND(lam, 6) AS lam,
       ROUND(LEAST(1.0, 1.0 / MAX(lam) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
         AS p_always_valid
FROM l
"""


# --------------------------------------------------------------------------
# q282 — PARTIAL AUTOCORRELATION (Durbin 1960 / Levinson recursion,
# unrolled to lag 3): the AR-order diagnostic that q272's raw ACF
# cannot give — pacf_k is the correlation at lag k AFTER regressing out
# lags 1..k−1, so an AR(1) series shows pacf_2 ≈ pacf_3 ≈ 0 even
# though its ACF decays slowly. Closed-form Durbin-Levinson:
#   φ11 = ρ1,  φ22 = (ρ2 − ρ1²)/(1 − ρ1²),  a21 = φ11 − φ22·φ11,
#   φ33 = (ρ3 − a21·ρ2 − φ22·ρ1)/(1 − a21·ρ1 − φ22·ρ2).
# ρ_k come from the same day-offset self-join as q272, pivoted to one
# row per event type by conditional aggregation.
#
# Scale posture: identical to q272 — one shuffle to the (type, day)
# histogram; the lag join and the 1-row-per-type recursion run on
# bounded tables.
# --------------------------------------------------------------------------


def q282_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = e.groupBy(F.col("event_type"), day.alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    st = daily.groupBy("event_type").agg(
        F.avg("y").alias("mu"),
        (
            F.sum(F.col("y") * F.col("y"))
            - F.sum("y") * F.sum("y") / (F.lit(1.0) * F.count(F.lit(1)))
        ).alias("den"),
    )
    lags = spark.range(1, 4).select(F.col("id").cast("long").alias("lag"))
    a, b = daily.alias("a"), daily.alias("b")
    rho = (
        a.join(F.broadcast(lags))
        .join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("lag")),
        )
        .join(
            st.alias("st"), F.col("a.event_type") == F.col("st.event_type")
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            *[
                (
                    F.sum(
                        F.when(
                            F.col("lag") == k,
                            (F.col("a.y") - F.col("mu"))
                            * (F.col("b.y") - F.col("mu")),
                        )
                    )
                    / F.max("den")
                ).alias(f"rho{k}")
                for k in (1, 2, 3)
            ]
        )
    )
    p11 = F.col("rho1")
    p22 = (F.col("rho2") - p11 * p11) / (1 - p11 * p11)
    a21 = p11 - p22 * p11
    p33 = (F.col("rho3") - a21 * F.col("rho2") - p22 * F.col("rho1")) / (
        1 - a21 * F.col("rho1") - p22 * F.col("rho2")
    )
    return rho.select(
        "event_type",
        F.round("rho1", 4).alias("rho1"),
        F.round("rho2", 4).alias("rho2"),
        F.round("rho3", 4).alias("rho3"),
        F.round(p11, 4).alias("pacf1"),
        F.round(p22, 4).alias("pacf2"),
        F.round(p33, 4).alias("pacf3"),
    )


Q282_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, AVG(y) AS mu,
         SUM(y * y) - SUM(y) * SUM(y) / (1.0 * COUNT(*)) AS den
  FROM daily GROUP BY 1
), lags AS (
  SELECT CAST(range AS BIGINT) AS lag FROM range(1, 4)
), rho AS (
  SELECT a.event_type,
         SUM(CASE WHEN lag = 1 THEN (a.y - mu) * (b.y - mu) END)
           / MAX(den) AS rho1,
         SUM(CASE WHEN lag = 2 THEN (a.y - mu) * (b.y - mu) END)
           / MAX(den) AS rho2,
         SUM(CASE WHEN lag = 3 THEN (a.y - mu) * (b.y - mu) END)
           / MAX(den) AS rho3
  FROM daily a
  JOIN lags ON TRUE
  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + lag
  JOIN st ON st.event_type = a.event_type
  GROUP BY a.event_type
)
SELECT event_type,
       ROUND(rho1, 4) AS rho1, ROUND(rho2, 4) AS rho2,
       ROUND(rho3, 4) AS rho3,
       ROUND(rho1, 4) AS pacf1,
       ROUND((rho2 - rho1 * rho1) / (1 - rho1 * rho1), 4) AS pacf2,
       ROUND((rho3 - (rho1 - (rho2 - rho1 * rho1) / (1 - rho1 * rho1)
                       * rho1) * rho2
                   - (rho2 - rho1 * rho1) / (1 - rho1 * rho1) * rho1)
             / (1 - (rho1 - (rho2 - rho1 * rho1) / (1 - rho1 * rho1)
                      * rho1) * rho1
                  - (rho2 - rho1 * rho1) / (1 - rho1 * rho1) * rho2), 4)
         AS pacf3
FROM rho
"""


# --------------------------------------------------------------------------
# q272 — AUTOCORRELATION FUNCTION: sample ACF of the daily event-count
# series per event type at lags 1..7, the standard seasonality/
# persistence diagnostic (complements q138's lag-1 AR fit and q139's
# fixed-period seasonality). acf_k = Σ_t (y_t − μ)(y_{t+k} − μ) / Σ_t
# (y_t − μ)² with the mean and denominator over the FULL series (the
# classic biased estimator, so acf is bounded in [−1, 1] and damped in
# k). Lagged pairs come from an exact day-offset self-join of the daily
# table — a missing day contributes no pair at the lags it would span,
# identically in both engines.
#
# Scale posture: the corpus collapses to the (type, day) histogram in
# one partial-agg shuffle; the lag self-join, moment rollup, and the
# 7-row lag dimension (broadcast) all run on that bounded table. No
# per-row window, no global sort.
# --------------------------------------------------------------------------

_ACF_MAX_LAG = 7


def q272_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = e.groupBy(F.col("event_type"), day.alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    st = daily.groupBy("event_type").agg(
        F.avg("y").alias("mu"),
        (
            F.sum(F.col("y") * F.col("y"))
            - F.sum("y") * F.sum("y") / (F.lit(1.0) * F.count(F.lit(1)))
        ).alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a, b = daily.alias("a"), daily.alias("b")
    return (
        a.join(F.broadcast(lags))
        .join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("lag")),
        )
        .join(st.alias("st"), F.col("a.event_type") == F.col("st.event_type"))
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.max("n_days").alias("n_days"),
            F.round(
                F.sum(
                    (F.col("a.y") - F.col("mu"))
                    * (F.col("b.y") - F.col("mu"))
                )
                / F.max("den"),
                4,
            ).alias("acf"),
        )
    )


Q272_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, AVG(y) AS mu,
         SUM(y * y) - SUM(y) * SUM(y) / (1.0 * COUNT(*)) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), lags AS (
  SELECT CAST(range AS BIGINT) AS lag FROM range(1, {_ACF_MAX_LAG + 1})
)
SELECT a.event_type, lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MAX(n_days) AS n_days,
       ROUND(SUM((a.y - mu) * (b.y - mu)) / MAX(den), 4) AS acf
FROM daily a
JOIN lags ON TRUE
JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + lag
JOIN st ON st.event_type = a.event_type
GROUP BY a.event_type, lag
"""


# --------------------------------------------------------------------------
# q273 — 1-D GAUSSIAN MIXTURE (2 components, 3 EM rounds) over each
# event type's value distribution — the classic soft-clustering /
# bimodality probe (q84's k-means is the hard-assignment cousin; this
# is the probabilistic one). Deterministic init from the group's range
# quartpoints (μ at 25%/75% of [min,max], both variances at the group
# variance, weights ½/½); each E+M round computes responsibilities and
# re-estimates (w, μ₁, σ²₁, μ₂, σ²₂) in closed form. Components are
# rendered ordered by mean so output is label-stable.
#
# Scale posture: EM runs in HISTOGRAM SPACE — the corpus is touched
# once to build the (type, value, count) table; every round is a
# broadcast join of the 1-row-per-type parameter frame onto that
# bounded histogram plus one partial-agg rollup (only the component-2
# moments are summed; component-1 falls out of precomputed totals).
# Degenerate guards: variance floor 1e-4, soft-count clamp to
# [1e-6, n−1e-6], and a 1e-300 additive guard against double underflow
# in the responsibility denominator — all identical in both engines.
# --------------------------------------------------------------------------

_GMM_ROUNDS = 3
_GMM_VAR_FLOOR = 1e-4


def q273_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    hist = ev.groupBy("event_type", F.col("value").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("v")).alias("sv"),
        F.sum(F.col("c") * F.col("v") * F.col("v")).alias("svv"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    var0 = F.greatest(
        F.col("svv") / F.col("n")
        - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n")),
        F.lit(_GMM_VAR_FLOOR),
    )
    params = tot.select(
        "event_type",
        F.lit(0.5).alias("w2"),
        (F.col("mn") + (F.col("mx") - F.col("mn")) / 4).alias("mu1"),
        var0.alias("v1"),
        (F.col("mn") + 3 * (F.col("mx") - F.col("mn")) / 4).alias("mu2"),
        var0.alias("v2"),
    )
    for _ in range(_GMM_ROUNDS):
        j = hist.join(F.broadcast(params), "event_type")
        g1 = F.exp(
            -(F.col("v") - F.col("mu1"))
            * (F.col("v") - F.col("mu1"))
            / (2 * F.col("v1"))
        ) / F.sqrt(F.col("v1"))
        g2 = F.exp(
            -(F.col("v") - F.col("mu2"))
            * (F.col("v") - F.col("mu2"))
            / (2 * F.col("v2"))
        ) / F.sqrt(F.col("v2"))
        r2 = (
            F.col("w2")
            * g2
            / ((1 - F.col("w2")) * g1 + F.col("w2") * g2 + F.lit(1e-300))
        )
        s = j.groupBy("event_type").agg(
            F.sum(F.col("c") * r2).alias("m0"),
            F.sum(F.col("c") * r2 * F.col("v")).alias("m1"),
            F.sum(F.col("c") * r2 * F.col("v") * F.col("v")).alias("m2"),
        )
        mg = F.greatest(
            F.least(F.col("m0"), F.col("n") - F.lit(1e-6)), F.lit(1e-6)
        )
        mu1n = (F.col("sv") - F.col("m1")) / (F.col("n") - mg)
        mu2n = F.col("m1") / mg
        params = s.join(tot, "event_type").select(
            "event_type",
            (mg / F.col("n")).alias("w2"),
            mu1n.alias("mu1"),
            F.greatest(
                (F.col("svv") - F.col("m2")) / (F.col("n") - mg)
                - mu1n * mu1n,
                F.lit(_GMM_VAR_FLOOR),
            ).alias("v1"),
            mu2n.alias("mu2"),
            F.greatest(
                F.col("m2") / mg - mu2n * mu2n, F.lit(_GMM_VAR_FLOOR)
            ).alias("v2"),
        )
    lo_first = F.col("mu1") <= F.col("mu2")
    return params.join(
        tot.select("event_type", F.col("n").cast("long").alias("n")),
        "event_type",
    ).select(
        "event_type",
        "n",
        F.round(
            F.when(lo_first, 1 - F.col("w2")).otherwise(F.col("w2")), 4
        ).alias("w_lo"),
        F.round(F.least(F.col("mu1"), F.col("mu2")), 4).alias("mu_lo"),
        F.round(
            F.sqrt(F.when(lo_first, F.col("v1")).otherwise(F.col("v2"))), 4
        ).alias("sd_lo"),
        F.round(F.greatest(F.col("mu1"), F.col("mu2")), 4).alias("mu_hi"),
        F.round(
            F.sqrt(F.when(lo_first, F.col("v2")).otherwise(F.col("v1"))), 4
        ).alias("sd_hi"),
    )


def _q273_sql() -> str:
    ctes = [
        """hist AS (
  SELECT event_type, value AS v, CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
)""",
        """tot AS (
  SELECT event_type, SUM(c) AS n, SUM(c * v) AS sv,
         SUM(c * v * v) AS svv, MIN(v) AS mn, MAX(v) AS mx
  FROM hist GROUP BY 1
)""",
        f"""p0 AS (
  SELECT event_type, 0.5 AS w2,
         mn + (mx - mn) / 4 AS mu1,
         GREATEST(svv / n - (sv / n) * (sv / n), {_GMM_VAR_FLOOR}) AS v1,
         mn + 3 * (mx - mn) / 4 AS mu2,
         GREATEST(svv / n - (sv / n) * (sv / n), {_GMM_VAR_FLOOR}) AS v2
  FROM tot
)""",
    ]
    for r in range(1, _GMM_ROUNDS + 1):
        ctes.append(f"""e{r} AS (
  SELECT event_type, SUM(c * r2) AS m0, SUM(c * r2 * v) AS m1,
         SUM(c * r2 * v * v) AS m2
  FROM (
    SELECT event_type, v, c,
           w2 * g2 / ((1 - w2) * g1 + w2 * g2 + 1e-300) AS r2
    FROM (
      SELECT h.event_type, h.v, h.c, p.w2,
             exp(-(h.v - p.mu1) * (h.v - p.mu1) / (2 * p.v1))
               / sqrt(p.v1) AS g1,
             exp(-(h.v - p.mu2) * (h.v - p.mu2) / (2 * p.v2))
               / sqrt(p.v2) AS g2
      FROM hist h JOIN p{r - 1} p USING (event_type)
    ) q
  ) q2 GROUP BY event_type
)""")
        ctes.append(f"""p{r} AS (
  SELECT t.event_type,
         mg / t.n AS w2,
         (t.sv - m1) / (t.n - mg) AS mu1,
         GREATEST((t.svv - m2) / (t.n - mg)
                  - ((t.sv - m1) / (t.n - mg))
                    * ((t.sv - m1) / (t.n - mg)),
                  {_GMM_VAR_FLOOR}) AS v1,
         m1 / mg AS mu2,
         GREATEST(m2 / mg - (m1 / mg) * (m1 / mg),
                  {_GMM_VAR_FLOOR}) AS v2
  FROM (
    SELECT e.event_type, e.m1, e.m2,
           GREATEST(LEAST(e.m0, t0.n - 1e-6), 1e-6) AS mg
    FROM e{r} e JOIN tot t0 USING (event_type)
  ) g JOIN tot t USING (event_type)
)""")
    return f"""
WITH {', '.join(ctes)}
SELECT p.event_type, CAST(t.n AS BIGINT) AS n,
       ROUND(CASE WHEN mu1 <= mu2 THEN 1 - w2 ELSE w2 END, 4) AS w_lo,
       ROUND(LEAST(mu1, mu2), 4) AS mu_lo,
       ROUND(sqrt(CASE WHEN mu1 <= mu2 THEN v1 ELSE v2 END), 4) AS sd_lo,
       ROUND(GREATEST(mu1, mu2), 4) AS mu_hi,
       ROUND(sqrt(CASE WHEN mu1 <= mu2 THEN v2 ELSE v1 END), 4) AS sd_hi
FROM p{_GMM_ROUNDS} p JOIN tot t USING (event_type)
"""


# --------------------------------------------------------------------------
# q289 — isotonic regression (PAVA) of the daily mean event value per
# event type, computed in closed minimax form: fitted(k) =
# max_{i<=k} min_{j>=k} avg(y[i..j]) (Barlow et al. 1972, the exact
# solution the pool-adjacent-violators algorithm converges to). PAVA
# itself is a sequential pointer scan, but the DAY GRID is bounded
# (30 points per type here; calendar-bounded at any corpus size), so
# the minimax triple (i, k, j) materializes ≤ n³/6 rows per type over
# an already-aggregated intermediate — the raw events table is touched
# by exactly one partial-agg shuffle. Windows are partitioned by
# event_type (bounded day series), never global.
# --------------------------------------------------------------------------


def q289_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.avg("value").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    grid = daily.select(
        "event_type",
        "day",
        "y",
        F.row_number().over(w).alias("k"),
        F.sum("y").over(w).alias("s"),
    ).persist()
    # A(i, j) = avg(y[i..j]) from prefix sums: S_j - S_{i-1}
    gi = grid.select(
        F.col("event_type").alias("et"),
        F.col("k").alias("i"),
        (F.col("s") - F.col("y")).alias("s_im1"),
    )
    gj = grid.select(
        F.col("event_type").alias("et"),
        F.col("k").alias("j"),
        F.col("s").alias("s_j"),
    )
    avgs = (
        gi.join(gj, "et")
        .filter(F.col("i") <= F.col("j"))
        .select(
            "et",
            "i",
            "j",
            ((F.col("s_j") - F.col("s_im1")) / (F.col("j") - F.col("i") + 1)).alias(
                "a"
            ),
        )
    )
    ks = grid.select(F.col("event_type").alias("et"), F.col("k").alias("kk"))
    inner = (
        avgs.join(ks, "et")
        .filter((F.col("i") <= F.col("kk")) & (F.col("j") >= F.col("kk")))
        .groupBy("et", "kk", "i")
        .agg(F.min("a").alias("m"))
        .groupBy("et", "kk")
        .agg(F.max("m").alias("fitted"))
    )
    out = (
        grid.join(
            inner,
            (grid.event_type == inner.et) & (grid.k == inner.kk),
        )
        .select(
            "event_type",
            "day",
            F.round("y", 6).alias("y"),
            F.round("fitted", 6).alias("fitted"),
        )
    )
    out = out.localCheckpoint()
    grid.unpersist()
    return out


Q289_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         AVG(value) AS y
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
         SUM(y) OVER (PARTITION BY event_type ORDER BY day) AS s
  FROM daily
), avgs AS (
  SELECT gi.event_type, gi.k AS i, gj.k AS j,
         (gj.s - (gi.s - gi.y)) / (gj.k - gi.k + 1) AS a
  FROM grid gi JOIN grid gj
    ON gi.event_type = gj.event_type AND gi.k <= gj.k
), inner_min AS (
  SELECT a.event_type, g.k AS kk, a.i, MIN(a.a) AS m
  FROM avgs a JOIN grid g
    ON a.event_type = g.event_type AND a.i <= g.k AND a.j >= g.k
  GROUP BY 1, 2, 3
), fit AS (
  SELECT event_type, kk, MAX(m) AS fitted
  FROM inner_min GROUP BY 1, 2
)
SELECT g.event_type, g.day,
       ROUND(g.y, 6) AS y, ROUND(f.fitted, 6) AS fitted
FROM grid g JOIN fit f ON f.event_type = g.event_type AND f.kk = g.k
"""


# --------------------------------------------------------------------------
# q290 — inverse-propensity-weighted average treatment effect with
# stratified propensities (Rosenbaum & Rubin 1983; Horvitz-Thompson and
# Hájek estimators side by side). Treatment = customer-key parity (the
# deterministic cohort split q131/q281 use), outcome = total order
# spend, strata = market segment × nation bucket. Propensity ê(x) is
# the within-stratum treated share; strata violating positivity
# (ê ∈ {0,1}) are excluded on both engines. Scale posture: one join
# orders→customer (AQE picks the build side), one partial-agg to the
# stratum cell table, one broadcast of the ~25-row propensity dim back
# onto customers — no global windows, no collect.
# --------------------------------------------------------------------------


def q290_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 2 == 1).cast("int").alias("t"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("nb"),
    )
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("y"))
    )
    base = cust.join(
        spend, cust.c_custkey == spend.o_custkey, "left"
    ).select("t", "seg", "nb", F.coalesce("y", F.lit(0.0)).alias("y"))
    prop = (
        base.groupBy("seg", "nb")
        .agg(
            F.avg(F.col("t").cast("double")).alias("e"),
            F.count(F.lit(1)).alias("n_s"),
        )
        .filter((F.col("e") > 0) & (F.col("e") < 1))
    )
    j = base.join(F.broadcast(prop), ["seg", "nb"])
    pbar = j.agg(F.avg(F.col("t").cast("double")).alias("pbar"))
    j = j.crossJoin(F.broadcast(pbar))
    sw = F.when(
        F.col("t") == 1, F.col("pbar") / F.col("e")
    ).otherwise((1 - F.col("pbar")) / (1 - F.col("e")))
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("seg", "nb").cast("long").alias("n_strata"),
        (
            F.avg(F.when(F.col("t") == 1, F.col("y")))
            - F.avg(F.when(F.col("t") == 0, F.col("y")))
        ).alias("ate_unadj"),
        F.avg(
            F.col("t") * F.col("y") / F.col("e")
            - (1 - F.col("t")) * F.col("y") / (1 - F.col("e"))
        ).alias("ate_ipw"),
        (
            F.sum(F.when(F.col("t") == 1, sw * F.col("y")))
            / F.sum(F.when(F.col("t") == 1, sw))
            - F.sum(F.when(F.col("t") == 0, sw * F.col("y")))
            / F.sum(F.when(F.col("t") == 0, sw))
        ).alias("ate_hajek"),
    )
    return agg.select(
        "n",
        "n_strata",
        F.round("ate_unadj", 6).alias("ate_unadj"),
        F.round("ate_ipw", 6).alias("ate_ipw"),
        F.round("ate_hajek", 6).alias("ate_hajek"),
    )


Q290_SQL = """
WITH base AS (
  SELECT CASE WHEN c.c_custkey % 2 = 1 THEN 1 ELSE 0 END AS t,
         c.c_mktsegment AS seg, c.c_nationkey % 5 AS nb,
         COALESCE(s.y, 0.0) AS y
  FROM customer c LEFT JOIN (
    SELECT o_custkey, SUM(o_totalprice) AS y FROM orders GROUP BY 1
  ) s ON s.o_custkey = c.c_custkey
), prop AS (
  SELECT seg, nb, AVG(CAST(t AS DOUBLE)) AS e
  FROM base GROUP BY 1, 2
  HAVING AVG(CAST(t AS DOUBLE)) > 0 AND AVG(CAST(t AS DOUBLE)) < 1
), j AS (
  SELECT b.*, p.e FROM base b JOIN prop p USING (seg, nb)
), pb AS (SELECT AVG(CAST(t AS DOUBLE)) AS pbar FROM j),
w AS (
  SELECT j.*, CASE WHEN t = 1 THEN pb.pbar / e
              ELSE (1 - pb.pbar) / (1 - e) END AS sw
  FROM j CROSS JOIN pb
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT (seg, nb)) AS BIGINT) AS n_strata,
       ROUND(AVG(CASE WHEN t = 1 THEN y END)
             - AVG(CASE WHEN t = 0 THEN y END), 6) AS ate_unadj,
       ROUND(AVG(t * y / e - (1 - t) * y / (1 - e)), 6) AS ate_ipw,
       ROUND(SUM(CASE WHEN t = 1 THEN sw * y END)
               / SUM(CASE WHEN t = 1 THEN sw END)
             - SUM(CASE WHEN t = 0 THEN sw * y END)
               / SUM(CASE WHEN t = 0 THEN sw END), 6) AS ate_hajek
FROM w
"""


# --------------------------------------------------------------------------
# q291 — A/B power analysis per market segment: the minimum detectable
# effect at α=0.05 / power=0.8 for the current arm sizes, and the
# per-arm n required to detect a 5% lift. Closed-form two-sample
# normal approximation with pinned z constants (z_{α/2}=1.959964,
# z_β=0.841621) — the pre-experiment sizing table every experimentation
# platform renders before a test launches. One partial-agg pass per
# arm cell; everything downstream is a ~10-row rollup.
# --------------------------------------------------------------------------

_Z_A2 = 1.959964
_Z_B = 0.841621


def q291_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_custkey") % 2 == 1).cast("int").alias("t"),
        F.col("c_acctbal").alias("y"),
    )
    cells = cust.groupBy("seg", "t").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("mu"),
        F.var_samp("y").alias("v"),
    )
    a = cells.filter(F.col("t") == 1).select(
        "seg",
        F.col("n").alias("n_a"),
        F.col("mu").alias("mu_a"),
        F.col("v").alias("v_a"),
    )
    b = cells.filter(F.col("t") == 0).select(
        "seg",
        F.col("n").alias("n_b"),
        F.col("mu").alias("mu_b"),
        F.col("v").alias("v_b"),
    )
    g = a.join(b, "seg")
    sp = F.sqrt(
        (
            (F.col("n_a") - 1) * F.col("v_a")
            + (F.col("n_b") - 1) * F.col("v_b")
        )
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    mu = (
        F.col("n_a") * F.col("mu_a") + F.col("n_b") * F.col("mu_b")
    ) / (F.col("n_a") + F.col("n_b"))
    zsum = F.lit(_Z_A2 + _Z_B)
    mde = zsum * sp * F.sqrt(1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    delta = 0.05 * F.abs(mu)
    n_req = F.ceil(2.0 * F.pow(zsum, 2) * F.pow(sp, 2) / F.pow(delta, 2))
    return g.select(
        "seg",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(sp, 6).alias("pooled_sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.abs(mu), 6).alias("mde_rel"),
        n_req.cast("long").alias("n_per_arm_5pct"),
    )


Q291_SQL = f"""
WITH cells AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END AS t,
         COUNT(*) AS n, AVG(c_acctbal) AS mu, VAR_SAMP(c_acctbal) AS v
  FROM customer GROUP BY 1, 2
), g AS (
  SELECT a.seg, a.n AS n_a, a.mu AS mu_a, a.v AS v_a,
         b.n AS n_b, b.mu AS mu_b, b.v AS v_b
  FROM cells a JOIN cells b ON a.seg = b.seg AND a.t = 1 AND b.t = 0
), d AS (
  SELECT seg, n_a, n_b,
         SQRT(((n_a - 1) * v_a + (n_b - 1) * v_b)
              / (n_a + n_b - 2)) AS sp,
         (n_a * mu_a + n_b * mu_b) / (n_a + n_b) AS mu
  FROM g
)
SELECT seg, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(sp, 6) AS pooled_sd,
       ROUND({_Z_A2 + _Z_B} * sp * SQRT(1.0 / n_a + 1.0 / n_b), 6)
         AS mde_abs,
       ROUND({_Z_A2 + _Z_B} * sp * SQRT(1.0 / n_a + 1.0 / n_b)
             / ABS(mu), 6) AS mde_rel,
       CAST(CEIL(2.0 * POW({_Z_A2 + _Z_B}, 2) * POW(sp, 2)
                 / POW(0.05 * ABS(mu), 2)) AS BIGINT)
         AS n_per_arm_5pct
FROM d
"""


# --------------------------------------------------------------------------
# q292 — AMS tug-of-war sketch (Alon-Matias-Szegedy 1996) estimating
# the second frequency moment F2 = Σ f(tok)² of the per-language token
# stream: 16 ±1-signed estimators (sign from the engine-portable
# md5long hash, so both engines draw the SAME pseudo-random signs),
# averaged in 4 groups of 4 and median-combined (exact interpolated
# median on both engines), reported against the exact F2. F2 drives
# self-join size estimation and skew detection; the sketch is the form
# that survives when the token dictionary doesn't fit anywhere. Scale
# posture: one partial-agg to (lang, tok) counts, a broadcast 16-row
# seed grid (16× fan-out on the aggregated dictionary, not the corpus),
# then two keyed rollups.
# --------------------------------------------------------------------------

_AMS_R = 16
_AMS_GROUPS = 4


def q292_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist()
    )
    exact = tf.groupBy("lang").agg(
        F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
    )
    seeds = spark.range(_AMS_R).select(F.col("id").cast("int").alias("r"))
    sign = 1 - 2 * (
        md5long(F.concat(F.col("tok"), F.lit("|"), F.col("r").cast("string")))
        % 2
    )
    est = (
        tf.crossJoin(F.broadcast(seeds))
        .groupBy("lang", "r")
        .agg(F.sum(F.col("f") * sign).alias("s"))
        .groupBy("lang", (F.col("r") % _AMS_GROUPS).alias("g"))
        .agg(F.avg(F.col("s") * F.col("s")).alias("gm"))
        .groupBy("lang")
        .agg(F.percentile("gm", F.lit(0.5)).alias("est_f2"))
    )
    out = exact.join(est, "lang").select(
        "lang",
        "n_distinct_tokens",
        "exact_f2",
        F.round("est_f2", 2).alias("est_f2"),
        F.round(
            100.0
            * F.abs(F.col("est_f2") - F.col("exact_f2"))
            / F.col("exact_f2"),
            4,
        ).alias("rel_err_pct"),
    )
    out = out.localCheckpoint()
    tf.unpersist()
    return out


Q292_SQL = f"""
WITH tf AS (
  SELECT lang, tok, COUNT(*) AS f FROM (
    SELECT lang, unnest({TOKENS_SQL.format(x='text')}) AS tok
    FROM documents
  ) GROUP BY lang, tok
), exact AS (
  SELECT lang, CAST(SUM(f * f) AS BIGINT) AS exact_f2,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens
  FROM tf GROUP BY lang
), seeds AS (SELECT CAST(unnest(range(16)) AS INT) AS r),
sk AS (
  SELECT lang, r,
         SUM(f * (1 - 2 * ({MD5LONG_SQL.format(
             x="tok || '|' || CAST(r AS VARCHAR)")} % 2))) AS s
  FROM tf CROSS JOIN seeds GROUP BY lang, r
), grp AS (
  SELECT lang, r % {_AMS_GROUPS} AS g, AVG(s * s) AS gm
  FROM sk GROUP BY 1, 2
), est AS (
  SELECT lang, quantile_cont(gm, 0.5) AS est_f2 FROM grp GROUP BY lang
)
SELECT e.lang, e.n_distinct_tokens, e.exact_f2,
       ROUND(est.est_f2, 2) AS est_f2,
       ROUND(100.0 * ABS(est.est_f2 - e.exact_f2) / e.exact_f2, 4)
         AS rel_err_pct
FROM exact e JOIN est USING (lang)
"""


# --------------------------------------------------------------------------
# q293 — l-diversity audit (Machanavajjhala et al. 2007), the
# companion gate to q222's k-anonymity: a quasi-identifier class can be
# large (k-anonymous) yet still leak if every row shares the same
# sensitive value. QI = (nation, segment); sensitive = balance bucket.
# For l ∈ {2, 3, 5}: classes with fewer than l distinct sensitive
# values, rows they expose, at-risk %. Same scale shape as q222 — one
# two-level partial agg to the class table, broadcast l-grid rollup.
# --------------------------------------------------------------------------


def q293_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    cls = (
        cust.select(
            F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_kb"),
        )
        .groupBy("nat", "seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("bal_kb").alias("ldiv"),
        )
    )
    ls = spark.createDataFrame([(2,), (3,), (5,)], "l int")
    weak_rows = F.when(F.col("ldiv") < F.col("l"), F.col("n")).otherwise(0)
    return (
        cls.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("ldiv") < F.col("l"), 1).otherwise(0))
            .cast("long")
            .alias("weak_classes"),
            F.sum(weak_rows).cast("long").alias("rows_at_risk"),
            r4(100.0 * F.sum(weak_rows) / F.sum("n")).alias("risk_pct"),
        )
    )


Q293_SQL = """
WITH cls AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg, COUNT(*) AS n,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS INT)) AS ldiv
  FROM customer GROUP BY 1, 2
), ls AS (SELECT CAST(unnest([2, 3, 5]) AS INT) AS l)
SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN ldiv < l THEN 1 ELSE 0 END) AS BIGINT)
         AS weak_classes,
       CAST(SUM(CASE WHEN ldiv < l THEN n ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       ROUND(100.0 * SUM(CASE WHEN ldiv < l THEN n ELSE 0 END) / SUM(n), 4)
         AS risk_pct
FROM cls CROSS JOIN ls GROUP BY l
"""


# --------------------------------------------------------------------------
# q294 — ε-differentially-private histogram release (Dwork et al.
# 2006): per-(lang, source) document counts with Laplace(1/ε) noise,
# ε = 0.5, sensitivity 1 (one document moves one cell by one). The
# noise is drawn by inverse-CDF from an md5long-derived uniform — both
# engines compute the SAME deterministic draw, which is what makes the
# mechanism oracle-checkable; a production release swaps the hash
# uniform for a real RNG without touching the plan. Released counts
# are clamped at 0 and rounded. One partial-agg pass; the noise math
# is per-cell scalar arithmetic on the ~25-row aggregate.
# --------------------------------------------------------------------------

_DP_EPS = 0.5


def q294_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    h = md5long(F.concat(F.col("lang"), F.lit("|"), F.col("source")))
    u = ((h % 1000000) + 0.5) / 1000000.0 - 0.5
    noise = (
        -F.lit(1.0 / _DP_EPS)
        * F.signum(u)
        * F.log(1.0 - 2.0 * F.abs(u))
    )
    return cells.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n"),
        F.round(noise, 6).alias("noise"),
        F.greatest(F.lit(0), F.round(F.col("n") + noise, 0))
        .cast("long")
        .alias("released_n"),
        F.lit(_DP_EPS).alias("epsilon"),
    )


Q294_SQL = f"""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
), noised AS (
  SELECT lang, source, n,
         -(1.0 / {_DP_EPS}) * SIGN(u) * LN(1.0 - 2.0 * ABS(u)) AS noise
  FROM (
    SELECT lang, source, n,
           (({MD5LONG_SQL.format(x="lang || '|' || source")} % 1000000)
            + 0.5) / 1000000.0 - 0.5 AS u
    FROM cells
  )
)
SELECT lang, source, CAST(n AS BIGINT) AS n,
       ROUND(noise, 6) AS noise,
       CAST(GREATEST(0, ROUND(n + noise, 0)) AS BIGINT) AS released_n,
       CAST({_DP_EPS} AS DOUBLE) AS epsilon
FROM noised
"""


# --------------------------------------------------------------------------
# q295 — Holt double exponential smoothing (level + trend) of the daily
# event-count series per type, α=0.3, β=0.1, classic init l₁=y₁,
# b₁=y₂−y₁. The recurrence is sequential, but the day grid is calendar-
# bounded, so the Spark side folds the sorted per-type array with the
# JVM `aggregate` HOF — whole-stage-codegen arithmetic, zero Python —
# after ONE partial-agg shuffle builds the daily series. The oracle
# replays the identical recurrence as a recursive CTE stepping the day
# index. Output: final level/trend, 1-step forecast, RMSE of the
# 1-step-ahead predictions.
# --------------------------------------------------------------------------

_HOLT_A = 0.3
_HOLT_B = 0.1


def q295_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("arr")
    )
    a, b = _HOLT_A, _HOLT_B
    fold = f"""
    aggregate(
      slice(arr, 2, size(arr) - 1),
      named_struct(
        'l', arr[0].y,
        'b', arr[1].y - arr[0].y,
        'sse', cast(0.0 as double),
        'k', cast(0 as int)
      ),
      (acc, x) -> named_struct(
        'l', {a} * x.y + {1 - a} * (acc.l + acc.b),
        'b', {b} * (({a} * x.y + {1 - a} * (acc.l + acc.b)) - acc.l)
             + {1 - b} * acc.b,
        'sse', acc.sse + (x.y - (acc.l + acc.b)) * (x.y - (acc.l + acc.b)),
        'k', acc.k + 1
      )
    )"""
    return series.filter(F.size("arr") >= 2).select(
        "event_type",
        F.size("arr").cast("long").alias("n_days"),
        F.expr(fold).alias("h"),
    ).select(
        "event_type",
        "n_days",
        F.round(F.col("h.l"), 6).alias("level"),
        F.round(F.col("h.b"), 6).alias("trend"),
        F.round(F.col("h.l") + F.col("h.b"), 6).alias("forecast_next"),
        F.round(F.sqrt(F.col("h.sse") / F.col("h.k")), 6).alias("rmse_1step"),
    )


Q295_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k
  FROM daily
), nn AS (
  SELECT event_type, COUNT(*) AS n FROM grid GROUP BY 1
), rec AS (
  SELECT g1.event_type, 1 AS k, g1.y AS l, g2.y - g1.y AS b,
         CAST(0.0 AS DOUBLE) AS sse
  FROM grid g1 JOIN grid g2
    ON g1.event_type = g2.event_type AND g1.k = 1 AND g2.k = 2
  UNION ALL
  SELECT r.event_type, r.k + 1,
         {_HOLT_A} * d.y + {1 - _HOLT_A} * (r.l + r.b),
         {_HOLT_B} * (({_HOLT_A} * d.y + {1 - _HOLT_A} * (r.l + r.b)) - r.l)
           + {1 - _HOLT_B} * r.b,
         r.sse + (d.y - (r.l + r.b)) * (d.y - (r.l + r.b))
  FROM rec r JOIN grid d
    ON d.event_type = r.event_type AND d.k = r.k + 1
)
SELECT r.event_type, CAST(n.n AS BIGINT) AS n_days,
       ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
       ROUND(r.l + r.b, 6) AS forecast_next,
       ROUND(SQRT(r.sse / (n.n - 1)), 6) AS rmse_1step
FROM rec r JOIN nn n ON n.event_type = r.event_type AND r.k = n.n
WHERE n.n >= 2
"""


# --------------------------------------------------------------------------
# q296 — negative-binomial overdispersion fit (method of moments) of
# the per-type daily event counts: dispersion index v/μ, and the NB2
# parameters r = μ²/(v−μ), p = r/(r+μ) when the series is genuinely
# overdispersed (v > μ; otherwise NULL — Poisson suffices). The count
# model a rate-anomaly stack (q89) assumes; fitting it per type tells
# you which feeds violate Poisson. One partial-agg pass to the day
# grid, one bounded rollup.
# --------------------------------------------------------------------------


def q296_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.avg("y").alias("mu"),
        F.var_samp("y").alias("v"),
    )
    over = F.col("v") > F.col("mu")
    r = F.col("mu") * F.col("mu") / (F.col("v") - F.col("mu"))
    return g.select(
        "event_type",
        "n_days",
        F.round("mu", 6).alias("mu"),
        F.round("v", 6).alias("var"),
        F.round(F.col("v") / F.col("mu"), 6).alias("dispersion"),
        F.round(F.when(over, r), 6).alias("nb_r"),
        F.round(F.when(over, r / (r + F.col("mu"))), 6).alias("nb_p"),
    )


Q296_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         AVG(y) AS mu, VAR_SAMP(y) AS v
  FROM daily GROUP BY 1
)
SELECT event_type, n_days, ROUND(mu, 6) AS mu, ROUND(v, 6) AS var,
       ROUND(v / mu, 6) AS dispersion,
       ROUND(CASE WHEN v > mu THEN mu * mu / (v - mu) END, 6) AS nb_r,
       ROUND(CASE WHEN v > mu THEN (mu * mu / (v - mu))
                  / ((mu * mu / (v - mu)) + mu) END, 6) AS nb_p
FROM g
"""


# --------------------------------------------------------------------------
# q297 — TOST equivalence test (Schuirmann 1987) per market segment:
# instead of asking "do the parity arms differ?" (q131's z-test), ask
# "are they provably equivalent within ±δ?" with δ = 10% of the pooled
# mean. Two one-sided z statistics; equivalence is declared when BOTH
# exceed z_α = 1.644854. This is the guardrail-metric gate an
# experimentation platform runs on non-inferiority checks. Same
# two-cell-per-segment agg shape as q291.
# --------------------------------------------------------------------------

_Z_A = 1.644854


def q297_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_custkey") % 2 == 1).cast("int").alias("t"),
        F.col("c_acctbal").alias("y"),
    )
    cells = cust.groupBy("seg", "t").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("mu"),
        F.var_samp("y").alias("v"),
    )
    a = cells.filter(F.col("t") == 1).select(
        "seg",
        F.col("n").alias("n_a"),
        F.col("mu").alias("mu_a"),
        F.col("v").alias("v_a"),
    )
    b = cells.filter(F.col("t") == 0).select(
        "seg",
        F.col("n").alias("n_b"),
        F.col("mu").alias("mu_b"),
        F.col("v").alias("v_b"),
    )
    g = a.join(b, "seg")
    diff = F.col("mu_a") - F.col("mu_b")
    se = F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b"))
    pooled = (
        F.col("n_a") * F.col("mu_a") + F.col("n_b") * F.col("mu_b")
    ) / (F.col("n_a") + F.col("n_b"))
    delta = 0.1 * F.abs(pooled)
    z_lo = (diff + delta) / se
    z_hi = (delta - diff) / se
    return g.select(
        "seg",
        F.round(diff, 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round(delta, 6).alias("delta"),
        F.round(z_lo, 6).alias("z_lower"),
        F.round(z_hi, 6).alias("z_upper"),
        (F.least(z_lo, z_hi) > _Z_A).alias("equivalent"),
    )


Q297_SQL = f"""
WITH cells AS (
  SELECT c_mktsegment AS seg,
         CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END AS t,
         COUNT(*) AS n, AVG(c_acctbal) AS mu, VAR_SAMP(c_acctbal) AS v
  FROM customer GROUP BY 1, 2
), g AS (
  SELECT a.seg, a.n AS n_a, a.mu AS mu_a, a.v AS v_a,
         b.n AS n_b, b.mu AS mu_b, b.v AS v_b
  FROM cells a JOIN cells b ON a.seg = b.seg AND a.t = 1 AND b.t = 0
), d AS (
  SELECT seg, mu_a - mu_b AS diff,
         SQRT(v_a / n_a + v_b / n_b) AS se,
         0.1 * ABS((n_a * mu_a + n_b * mu_b) / (n_a + n_b)) AS delta
  FROM g
)
SELECT seg, ROUND(diff, 6) AS diff, ROUND(se, 6) AS se,
       ROUND(delta, 6) AS delta,
       ROUND((diff + delta) / se, 6) AS z_lower,
       ROUND((delta - diff) / se, 6) AS z_upper,
       LEAST((diff + delta) / se, (delta - diff) / se) > {_Z_A}
         AS equivalent
FROM d
"""


# --------------------------------------------------------------------------
# q298 — additive Holt-Winters (triple exponential smoothing, Winters
# 1960) of the per-type daily count series with weekly seasonality
# (m=7): classic init l=mean(first week), b=(mean(week 2)−mean(week 1))
# /m, s_i = y_i − mean(week 1); then the level/trend/seasonal
# recurrences over t = m+1..n. Like q295 the sequential recurrence
# folds JVM-side over the sorted per-type day array — the accumulator
# carries the rolling 7-slot seasonal window as an array field, so the
# whole fit is whole-stage-codegen arithmetic after ONE partial-agg
# shuffle. Position index (not calendar day) drives the seasonal slot,
# so missing days shift slots identically in both engines. Oracle: the
# identical recurrence as a recursive CTE carrying a LIST column.
# --------------------------------------------------------------------------

_HW_A, _HW_B, _HW_G, _HW_M = 0.3, 0.05, 0.2, 7


def q298_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("arr")
    )
    a, b, g, m = _HW_A, _HW_B, _HW_G, _HW_M
    fold = f"""
    aggregate(
      slice(arr, {m + 1}, size(arr) - {m}),
      named_struct(
        'l', aggregate(slice(arr, 1, {m}), cast(0.0 as double),
                       (acc, x) -> acc + x.y) / {m},
        'b', (aggregate(slice(arr, {m + 1}, {m}), cast(0.0 as double),
                        (acc, x) -> acc + x.y) / {m}
              - aggregate(slice(arr, 1, {m}), cast(0.0 as double),
                          (acc, x) -> acc + x.y) / {m}) / {m},
        's', transform(slice(arr, 1, {m}),
                       x -> x.y - aggregate(slice(arr, 1, {m}),
                                            cast(0.0 as double),
                                            (acc, x2) -> acc + x2.y) / {m}),
        'sse', cast(0.0 as double)
      ),
      (acc, x) -> named_struct(
        'l', {a} * (x.y - element_at(acc.s, 1))
             + {1 - a} * (acc.l + acc.b),
        'b', {b} * (({a} * (x.y - element_at(acc.s, 1))
                     + {1 - a} * (acc.l + acc.b)) - acc.l)
             + {1 - b} * acc.b,
        's', concat(
          slice(acc.s, 2, {m - 1}),
          array({g} * (x.y - ({a} * (x.y - element_at(acc.s, 1))
                              + {1 - a} * (acc.l + acc.b)))
                + {1 - g} * element_at(acc.s, 1))
        ),
        'sse', acc.sse
          + (x.y - (acc.l + acc.b + element_at(acc.s, 1)))
            * (x.y - (acc.l + acc.b + element_at(acc.s, 1)))
      )
    )"""
    n = F.size("arr")
    return (
        series.filter(n >= 2 * m + 1)
        .select(
            "event_type",
            n.cast("long").alias("n_days"),
            F.expr(fold).alias("h"),
        )
        .select(
            "event_type",
            "n_days",
            F.round(F.col("h.l"), 6).alias("level"),
            F.round(F.col("h.b"), 6).alias("trend"),
            F.round(F.element_at("h.s", 1), 6).alias("season_next"),
            F.round(
                F.col("h.l") + F.col("h.b") + F.element_at("h.s", 1), 6
            ).alias("forecast_next"),
            F.round(
                F.sqrt(F.col("h.sse") / (F.col("n_days") - m)), 6
            ).alias("rmse_1step"),
        )
    )


Q298_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k
  FROM daily
), nn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM grid GROUP BY 1
), init AS (
  SELECT event_type,
         AVG(y) FILTER (WHERE k <= {_HW_M}) AS l,
         (AVG(y) FILTER (WHERE k > {_HW_M} AND k <= {2 * _HW_M})
          - AVG(y) FILTER (WHERE k <= {_HW_M})) / {_HW_M} AS b,
         list(y - (SELECT AVG(y2.y) FROM grid y2
                   WHERE y2.event_type = grid.event_type
                     AND y2.k <= {_HW_M})
              ORDER BY k) FILTER (WHERE k <= {_HW_M}) AS s
  FROM grid GROUP BY event_type
), rec AS (
  SELECT i.event_type, {_HW_M} AS t, i.l, i.b, i.s,
         CAST(0.0 AS DOUBLE) AS sse
  FROM init i
  UNION ALL
  SELECT r.event_type, r.t + 1,
         {_HW_A} * (g.y - r.s[1]) + {1 - _HW_A} * (r.l + r.b),
         {_HW_B} * (({_HW_A} * (g.y - r.s[1])
                     + {1 - _HW_A} * (r.l + r.b)) - r.l)
           + {1 - _HW_B} * r.b,
         list_append(r.s[2:{_HW_M}],
           {_HW_G} * (g.y - ({_HW_A} * (g.y - r.s[1])
                             + {1 - _HW_A} * (r.l + r.b)))
           + {1 - _HW_G} * r.s[1]),
         r.sse + (g.y - (r.l + r.b + r.s[1]))
               * (g.y - (r.l + r.b + r.s[1]))
  FROM rec r JOIN grid g
    ON g.event_type = r.event_type AND g.k = r.t + 1
)
SELECT r.event_type, n.n AS n_days,
       ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
       ROUND(r.s[1], 6) AS season_next,
       ROUND(r.l + r.b + r.s[1], 6) AS forecast_next,
       ROUND(SQRT(r.sse / (n.n - {_HW_M})), 6) AS rmse_1step
FROM rec r JOIN nn n ON n.event_type = r.event_type AND r.t = n.n
WHERE n.n >= {2 * _HW_M + 1}
"""


# --------------------------------------------------------------------------
# q299 — Page-Hinkley drift detection (Page 1954, the sequential CUSUM
# variant drift monitors run on data streams): per type, the statistic
# m_T = Σ_{t≤T} (y_t − ȳ_t − δ) with ȳ_t the running mean, and
# PH_T = m_T − min_{t≤T} m_t; an alarm fires when PH exceeds λ. δ and λ
# are calibrated per type from the full-series mean/stddev (δ = 5% of
# the mean, λ = 3σ), broadcast back onto the day grid. All windows are
# PARTITIONED by event_type over the calendar-bounded day grid — never
# a global single-partition sort (the q166/q186 class this repo
# audits against). Oracle: the identical window stack in DuckDB.
# --------------------------------------------------------------------------

_PH_DELTA_FRAC = 0.05
_PH_LAMBDA_SD = 3.0


def q299_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    cal = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.lit(_PH_DELTA_FRAC) * F.avg("y")).alias("delta"),
        (F.lit(_PH_LAMBDA_SD) * F.stddev_samp("y")).alias("lam"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        daily.join(cal, "event_type")
        .withColumn("cumavg", F.avg("y").over(cum))
        .withColumn("m", F.sum(F.col("y") - F.col("cumavg") - F.col("delta")).over(cum))
        .withColumn("ph", F.col("m") - F.min("m").over(cum))
    )
    return d.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.round(F.max("ph"), 6).alias("max_ph"),
        F.round(F.max("lam"), 6).alias("lambda"),
        # CASE-WHEN, not a boolean cast: a 1-day series has NULL λ
        # (stddev of one sample) and the oracle's CASE counts 0 where
        # NULL would propagate (deg_one sweep)
        F.sum(F.when(F.col("ph") > F.col("lam"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarm_days"),
        F.min(F.when(F.col("ph") > F.col("lam"), F.col("day"))).alias(
            "first_alarm_day"
        ),
    )


Q299_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), cal AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         {_PH_DELTA_FRAC} * AVG(y) AS delta,
         {_PH_LAMBDA_SD} * STDDEV_SAMP(y) AS lam
  FROM daily GROUP BY 1
), cum AS (
  SELECT d.event_type, d.day, d.y, c.n_days, c.delta, c.lam,
         AVG(d.y) OVER w AS cumavg
  FROM daily d JOIN cal c ON c.event_type = d.event_type
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
               ROWS UNBOUNDED PRECEDING)
), ms AS (
  SELECT *, SUM(y - cumavg - delta) OVER w AS m
  FROM cum
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
), ph AS (
  SELECT *, m - MIN(m) OVER w AS ph
  FROM ms
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, MAX(n_days) AS n_days,
       ROUND(MAX(ph), 6) AS max_ph,
       ROUND(MAX(lam), 6) AS lambda,
       CAST(SUM(CASE WHEN ph > lam THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarm_days,
       MIN(CASE WHEN ph > lam THEN day END) AS first_alarm_day
FROM ph GROUP BY 1
"""


# --------------------------------------------------------------------------
# q300 — Yule-Walker AR(2) fit of the per-type daily count series:
# the autoregression x_t = φ₁x_{t−1} + φ₂x_{t−2} + ε solved in closed
# form from the lag-1/lag-2 autocorrelations (the 2×2 Toeplitz system):
# φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²), innovation variance
# σ²ε = c₀(1−φ₁r₁−φ₂r₂). Complements q272 (the raw ACF) and q282 (the
# PACF ladder) with the actual forecast-model coefficients. Lagged
# pairs come from q272's exact day-offset self-join — one partial-agg
# shuffle to the day grid, bounded joins after.
# --------------------------------------------------------------------------


def q300_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    st = daily.groupBy("event_type").agg(
        F.avg("y").alias("mu"),
        (
            F.sum(F.col("y") * F.col("y"))
            - F.sum("y") * F.sum("y") / (F.lit(1.0) * F.count(F.lit(1)))
        ).alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )

    def _r(lag: int) -> DataFrame:
        a, b = daily.alias("a"), daily.alias("b")
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("b.d") == F.col("a.d") + lag),
            )
            .join(
                st.alias("st"),
                F.col("a.event_type") == F.col("st.event_type"),
            )
            .groupBy(F.col("a.event_type").alias("event_type"))
            .agg(
                (
                    F.sum(
                        (F.col("a.y") - F.col("mu"))
                        * (F.col("b.y") - F.col("mu"))
                    )
                    / F.max("den")
                ).alias(f"r{lag}")
            )
        )

    j = (
        st.select("event_type", "n_days", (F.col("den") / F.col("n_days")).alias("c0"))
        .join(_r(1), "event_type")
        .join(_r(2), "event_type")
        .filter(F.abs(1.0 - F.col("r1") * F.col("r1")) > 1e-12)
    )
    phi1 = F.col("r1") * (1.0 - F.col("r2")) / (
        1.0 - F.col("r1") * F.col("r1")
    )
    phi2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1.0 - F.col("r1") * F.col("r1")
    )
    return j.select(
        "event_type",
        "n_days",
        F.round("r1", 6).alias("r1"),
        F.round("r2", 6).alias("r2"),
        F.round(phi1, 6).alias("phi1"),
        F.round(phi2, 6).alias("phi2"),
        F.round(
            F.col("c0") * (1.0 - phi1 * F.col("r1") - phi2 * F.col("r2")),
            6,
        ).alias("noise_var"),
    )


Q300_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, AVG(y) AS mu,
         SUM(y * y) - SUM(y) * SUM(y) / (1.0 * COUNT(*)) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
), r1t AS (
  SELECT a.event_type,
         SUM((a.y - mu) * (b.y - mu)) / MAX(den) AS r1
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + 1
  JOIN st ON st.event_type = a.event_type
  GROUP BY 1
), r2t AS (
  SELECT a.event_type,
         SUM((a.y - mu) * (b.y - mu)) / MAX(den) AS r2
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + 2
  JOIN st ON st.event_type = a.event_type
  GROUP BY 1
), j AS (
  SELECT st.event_type, st.n_days, st.den / st.n_days AS c0, r1, r2
  FROM st JOIN r1t ON r1t.event_type = st.event_type
  JOIN r2t ON r2t.event_type = st.event_type
  WHERE ABS(1.0 - r1 * r1) > 1e-12
)
SELECT event_type, n_days,
       ROUND(r1, 6) AS r1, ROUND(r2, 6) AS r2,
       ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) AS phi1,
       ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS phi2,
       ROUND(c0 * (1.0
             - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r1
             - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2), 6) AS noise_var
FROM j
"""


# --------------------------------------------------------------------------
# q301 — Cramér's V association between the documents table's lang and
# source columns: the chi-square independence statistic over the
# lang×source contingency table, normalized to [0,1] by n·(min(r,c)−1)
# — the corpus-balance audit that tells you whether source routing is
# language-skewed (a stratification hazard for q42/q52's samplers).
# Plan: ONE partial-agg shuffle to the contingency cells; expected
# counts come from broadcast row/column marginals; the final stat is a
# 1-row rollup. Includes the Bergsma-corrected V' (φ²corr with the
# (r−1)(c−1)/ (n−1) bias term) alongside the classic V.
# --------------------------------------------------------------------------


def q301_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rowm = cells.groupBy("lang").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("source").agg(F.sum("o").alias("ct"))
    n = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").cast("double").alias("r"),
        F.countDistinct("source").cast("double").alias("c"),
    )
    j = (
        cells.join(F.broadcast(rowm), "lang")
        .join(F.broadcast(colm), "source")
        .crossJoin(F.broadcast(n))
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    stat = j.agg(
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"),
        F.max("n").alias("n"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
    )
    phi2 = F.col("chi2") / F.col("n")
    # Bergsma (2013) bias correction; try_divide for the n=1 and
    # single-category corners (DuckDB renders NULL, and GREATEST/LEAST
    # skip NULLs identically on both engines — deg_one sweep)
    phi2c = F.greatest(
        F.lit(0.0),
        phi2
        - F.try_divide(
            (F.col("r") - 1) * (F.col("c") - 1), F.col("n") - 1
        ),
    )
    rc = F.col("r") - F.try_divide(
        (F.col("r") - 1) * (F.col("r") - 1), F.col("n") - 1
    )
    cc = F.col("c") - F.try_divide(
        (F.col("c") - 1) * (F.col("c") - 1), F.col("n") - 1
    )
    return stat.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("n_cols"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.try_divide(phi2, F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.round(
            F.sqrt(F.try_divide(phi2c, F.least(rc - 1, cc - 1))), 6
        ).alias("cramers_v_corrected"),
    )


Q301_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
  FROM documents GROUP BY 1, 2
), rowm AS (SELECT lang, SUM(o) AS rt FROM cells GROUP BY 1),
colm AS (SELECT source, SUM(o) AS ct FROM cells GROUP BY 1),
nn AS (
  SELECT SUM(o) AS n,
         CAST(COUNT(DISTINCT lang) AS DOUBLE) AS r,
         CAST(COUNT(DISTINCT source) AS DOUBLE) AS c
  FROM cells
), stat AS (
  SELECT SUM((o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n))
           AS chi2,
         MAX(n) AS n, MAX(r) AS r, MAX(c) AS c
  FROM cells JOIN rowm USING (lang) JOIN colm USING (source)
  CROSS JOIN nn
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(r AS BIGINT) AS n_rows, CAST(c AS BIGINT) AS n_cols,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       ROUND(chi2, 6) AS chi2,
       ROUND(SQRT((chi2 / n) / LEAST(r - 1, c - 1)), 6) AS cramers_v,
       ROUND(SQRT(GREATEST(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
             / LEAST(r - (r - 1) * (r - 1) / (n - 1) - 1,
                     c - (c - 1) * (c - 1) / (n - 1) - 1)), 6)
         AS cramers_v_corrected
FROM stat
"""


# --------------------------------------------------------------------------
# q302 — G-test (log-likelihood ratio) of weekday uniformity per event
# type: G = 2 Σ_d O_d ln(O_d / E_d) against the uniform E = n/7 — the
# day-of-week load-balance gate (q139 profiles the weekday shape; this
# renders the significance statistic, which dominates Pearson χ² for
# sparse cells). Wilson-Hilferty maps G to an approximate z-score so
# the gate needs no χ² CDF. One partial-agg shuffle to (type, weekday),
# a 7-row-per-type rollup after.
# --------------------------------------------------------------------------


def q302_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wd = F.pmod(
        F.floor(
            F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
        ).cast("long")
        + 4,
        F.lit(7),
    )  # 1970-01-01 was a Thursday → +4 makes 0 = Sunday
    cells = ev.groupBy("event_type", wd.alias("wd")).agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    tot = cells.groupBy("event_type").agg(F.sum("o").alias("n"))
    j = cells.join(tot, "event_type")
    e = F.col("n") / 7.0
    g = j.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (2.0 * F.sum(F.col("o") * F.log(F.col("o") / e))).alias("g_raw"),
    )
    dof = F.lit(6.0)
    # Wilson-Hilferty cube-root normal approximation of the χ²₆ tail
    z = (
        F.pow(F.col("g_raw") / dof, F.lit(1.0 / 3.0))
        - (1.0 - 2.0 / (9.0 * dof))
    ) / F.sqrt(2.0 / (9.0 * dof))
    return g.select(
        "event_type",
        "n",
        "n_cells",
        F.lit(6).cast("long").alias("dof"),
        F.round("g_raw", 6).alias("g_stat"),
        F.round(z, 6).alias("z_wh"),
        (z > 3.0).alias("nonuniform"),
    )


Q302_SQL = """
WITH cells AS (
  SELECT event_type,
         ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7 AS wd,
         CAST(COUNT(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
), tot AS (SELECT event_type, SUM(o) AS n FROM cells GROUP BY 1),
g AS (
  SELECT c.event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         2.0 * SUM(o * LN(o / (n / 7.0))) AS g_raw
  FROM cells c JOIN tot USING (event_type)
  GROUP BY 1
)
SELECT event_type, n, n_cells, CAST(6 AS BIGINT) AS dof,
       ROUND(g_raw, 6) AS g_stat,
       ROUND((POW(g_raw / 6.0, 1.0 / 3.0) - (1.0 - 2.0 / 54.0))
             / SQRT(2.0 / 54.0), 6) AS z_wh,
       (POW(g_raw / 6.0, 1.0 / 3.0) - (1.0 - 2.0 / 54.0))
         / SQRT(2.0 / 54.0) > 3.0 AS nonuniform
FROM g
"""


# --------------------------------------------------------------------------
# q303 — Theil inequality indices of order value per order priority,
# with the between/within decomposition (Theil 1967): per group the
# T index (1/n)Σ(x/μ_g)ln(x/μ_g) and L index (1/n)Σln(μ_g/x), plus
# each group's value share s_g and the global between-group component
# s_g·ln(μ_g/μ) — additive decomposability is WHY Theil (and not Gini,
# q133) is the index sharded pipelines aggregate. o_totalprice is
# strictly positive so the logs are total. One partial-agg pass for the
# group moments; the x-level log moments ride the same shuffle; the
# global mean is a broadcast 1-row aggregate.
# --------------------------------------------------------------------------


def q303_theil_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    g = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.log("x")).alias("sxlx"),
        F.sum(F.log("x")).alias("slx"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"), F.sum("sx").alias("sxt")
    )
    j = g.crossJoin(F.broadcast(tot))
    mu_g = F.col("sx") / F.col("n")
    mu = F.col("sxt") / F.col("nt")
    # T_g = (1/n)Σ(x/μg)ln(x/μg) = sxlx/(n·μg) − ln(μg)
    theil_t = F.col("sxlx") / (F.col("n") * mu_g) - F.log(mu_g)
    # L_g = ln(μg) − (1/n)Σln(x)
    theil_l = F.log(mu_g) - F.col("slx") / F.col("n")
    share = F.col("sx") / F.col("sxt")
    return j.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.round(mu_g, 6).alias("mean_value"),
        F.round(share, 6).alias("value_share"),
        F.round(theil_t, 6).alias("theil_t"),
        F.round(theil_l, 6).alias("theil_l"),
        F.round(share * F.log(mu_g / mu), 6).alias("between_component"),
    )


Q303_SQL = """
WITH g AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(o_totalprice) AS sx,
         SUM(o_totalprice * LN(o_totalprice)) AS sxlx,
         SUM(LN(o_totalprice)) AS slx
  FROM orders GROUP BY 1
), tot AS (SELECT SUM(n) AS nt, SUM(sx) AS sxt FROM g)
SELECT grp, CAST(n AS BIGINT) AS n,
       ROUND(sx / n, 6) AS mean_value,
       ROUND(sx / sxt, 6) AS value_share,
       ROUND(sxlx / (n * (sx / n)) - LN(sx / n), 6) AS theil_t,
       ROUND(LN(sx / n) - slx / n, 6) AS theil_l,
       ROUND((sx / sxt) * LN((sx / n) / (sxt / nt)), 6)
         AS between_component
FROM g CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q304 — t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) of
# the (lang, source) quasi-identifier groups against the ordered
# sensitive attribute n_chars: t = ordered-distance EMD between the
# group's distribution and the corpus distribution, computed on a
# FIXED-WIDTH 64-bin histogram of the attribute (EMD over an ordered
# grid = mean |cumulative p − cumulative q| over the first m−1 bins).
# Completes the privacy stack: k-anonymity (q151 family) bounds group
# size, l-diversity (q293) bounds sensitive variety, t-closeness bounds
# distributional leakage. Plan: corpus + group histograms are two
# partial-agg shuffles on bounded keys; the dense (group × bin) grid is
# a broadcast cross join of two aggregated dims; the cumulative windows
# are PARTITIONED per group over ≤64 rows.
# --------------------------------------------------------------------------

_TC_BIN_W = 256
_TC_BINS = 64
_TC_T = 0.3


def q304_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.least(
            F.lit(_TC_BINS - 1),
            F.floor(F.col("n_chars") / _TC_BIN_W).cast("long"),
        ).alias("bin"),
    )
    gh = d.groupBy("lang", "source", "bin").agg(
        F.count(F.lit(1)).cast("double").alias("gc")
    )
    gt = gh.groupBy("lang", "source").agg(F.sum("gc").alias("gn"))
    bh = d.groupBy("bin").agg(F.count(F.lit(1)).cast("double").alias("bc"))
    bt = bh.agg(F.sum("bc").alias("n"), F.count(F.lit(1)).alias("m"))
    grid = gt.crossJoin(F.broadcast(bh)).crossJoin(F.broadcast(bt))
    dense = grid.join(gh, ["lang", "source", "bin"], "left").withColumn(
        "gc", F.coalesce("gc", F.lit(0.0))
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.withColumn(
        "cdiff",
        F.sum(F.col("gc") / F.col("gn") - F.col("bc") / F.col("n")).over(w),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang", "source").orderBy("bin")
        ),
    )
    out = (
        cum.filter(F.col("rn") < F.col("m"))
        .groupBy("lang", "source")
        .agg(
            F.max("gn").cast("long").alias("n"),
            F.round(
                F.sum(F.abs("cdiff")) / (F.max("m") - 1), 6
            ).alias("t_closeness"),
        )
    )
    return out.withColumn("breach", F.col("t_closeness") > _TC_T)


Q304_SQL = f"""
WITH d AS (
  SELECT lang, source,
         LEAST({_TC_BINS - 1},
               CAST(FLOOR(n_chars / {_TC_BIN_W}) AS BIGINT)) AS bin
  FROM documents
), gh AS (
  SELECT lang, source, bin, CAST(COUNT(*) AS DOUBLE) AS gc
  FROM d GROUP BY 1, 2, 3
), gt AS (SELECT lang, source, SUM(gc) AS gn FROM gh GROUP BY 1, 2),
bh AS (SELECT bin, CAST(COUNT(*) AS DOUBLE) AS bc FROM d GROUP BY 1),
bt AS (SELECT SUM(bc) AS n, COUNT(*) AS m FROM bh),
dense AS (
  SELECT gt.lang, gt.source, bh.bin, gt.gn, bh.bc, bt.n, bt.m,
         COALESCE(gh.gc, 0.0) AS gc
  FROM gt CROSS JOIN bh CROSS JOIN bt
  LEFT JOIN gh ON gh.lang = gt.lang AND gh.source = gt.source
              AND gh.bin = bh.bin
), cum AS (
  SELECT lang, source, gn, m,
         SUM(gc / gn - bc / n) OVER w AS cdiff,
         ROW_NUMBER() OVER w2 AS rn
  FROM dense
  WINDOW w AS (PARTITION BY lang, source ORDER BY bin
               ROWS UNBOUNDED PRECEDING),
         w2 AS (PARTITION BY lang, source ORDER BY bin)
)
SELECT lang, source, CAST(MAX(gn) AS BIGINT) AS n,
       ROUND(SUM(ABS(cdiff)) / (MAX(m) - 1), 6) AS t_closeness,
       ROUND(SUM(ABS(cdiff)) / (MAX(m) - 1), 6) > {_TC_T} AS breach
FROM cum WHERE rn < m
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q305 — STL-lite decomposition strength (Hyndman & Athanasopoulos,
# FPP 3e §4.10) of the per-type daily series: trend = centered 7-day
# moving average (full windows only), detrended = y − trend, seasonal =
# weekday mean of the detrended series, remainder = detrended −
# seasonal. Trend strength F_T = max(0, 1 − Var(R)/Var(y − S)) and
# seasonal strength F_S = max(0, 1 − Var(R)/Var(detrended)) — the two
# scalars a forecasting pipeline screens thousands of series with.
# All windows are per-type over the bounded day grid; the weekday means
# join back as a broadcast 35-row dim.
# --------------------------------------------------------------------------


def q305_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    wma = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    t = daily.withColumn(
        "trend",
        F.when(F.count(F.lit(1)).over(wma) == 7, F.avg("y").over(wma)),
    ).withColumn("wd", F.pmod(F.col("day") + 4, F.lit(7)))
    det = t.filter(F.col("trend").isNotNull()).withColumn(
        "dt", F.col("y") - F.col("trend")
    )
    season = det.groupBy("event_type", "wd").agg(
        F.avg("dt").alias("s")
    )
    r = det.join(season, ["event_type", "wd"]).withColumn(
        "rem", F.col("dt") - F.col("s")
    )
    out = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.var_samp("rem").alias("vr"),
        F.var_samp("dt").alias("vdt"),
        F.var_samp(F.col("y") - F.col("s")).alias("vds"),
    )
    return out.select(
        "event_type",
        "n_days",
        F.round(
            F.greatest(F.lit(0.0), 1.0 - F.col("vr") / F.col("vds")), 6
        ).alias("trend_strength"),
        F.round(
            F.greatest(F.lit(0.0), 1.0 - F.col("vr") / F.col("vdt")), 6
        ).alias("seasonal_strength"),
        F.round("vr", 6).alias("var_remainder"),
    )


Q305_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, day, y,
         CASE WHEN COUNT(*) OVER w = 7 THEN AVG(y) OVER w END AS trend,
         (day + 4) % 7 AS wd
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT event_type, day, y, wd, y - trend AS dt
  FROM t WHERE trend IS NOT NULL
), season AS (
  SELECT event_type, wd, AVG(dt) AS s FROM det GROUP BY 1, 2
), r AS (
  SELECT d.event_type, d.y, d.dt, d.dt - se.s AS rem, d.y - se.s AS ds
  FROM det d JOIN season se ON se.event_type = d.event_type
                           AND se.wd = d.wd
), o AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         VAR_SAMP(rem) AS vr, VAR_SAMP(dt) AS vdt, VAR_SAMP(ds) AS vds
  FROM r GROUP BY 1
)
SELECT event_type, n_days,
       ROUND(GREATEST(0.0, 1.0 - vr / vds), 6) AS trend_strength,
       ROUND(GREATEST(0.0, 1.0 - vr / vdt), 6) AS seasonal_strength,
       ROUND(vr, 6) AS var_remainder
FROM o
"""


# --------------------------------------------------------------------------
# q306 — dedup yield curve: exact-duplicate rate measured on nested
# md5-bucket subsamples of the corpus (25/50/75/100%) — the scaling
# diagnostic that tells a dedup planner how duplicate yield grows with
# corpus size (sub-linear growth ⇒ duplicates are local; super-linear ⇒
# global near-universal templates, plan a full pass). Buckets nest
# (b < 25 ⊂ b < 50 ⊂ …) so the curve is monotone in docs by
# construction. One shuffle per (fraction, fingerprint) partial agg;
# the fraction dim is a broadcast 4-row literal.
# --------------------------------------------------------------------------

_YIELD_FRACS = [25, 50, 75, 100]


def q306_dedup_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    d = load(spark, sf_dir, "documents").select(
        F.pmod(md5long(F.col("doc_id").cast("string")), F.lit(100)).alias(
            "b"
        ),
        md5long(F.col("text")).alias("fp"),
    )
    fr = spark.createDataFrame(
        [(f,) for f in _YIELD_FRACS], "frac int"
    )
    j = d.crossJoin(F.broadcast(fr)).filter(F.col("b") < F.col("frac"))
    out = j.groupBy("frac").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("fp").cast("long").alias("n_distinct"),
    )
    return out.select(
        F.col("frac").cast("long").alias("frac"),
        "n_docs",
        "n_distinct",
        (F.col("n_docs") - F.col("n_distinct")).alias("n_dups"),
        F.round(
            (F.col("n_docs") - F.col("n_distinct"))
            / (F.lit(1.0) * F.col("n_docs")),
            6,
        ).alias("dup_rate"),
    )


Q306_SQL = f"""
WITH d AS (
  SELECT {MD5LONG_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS b,
         {MD5LONG_SQL.format(x="text")} AS fp
  FROM documents
), fr AS (SELECT UNNEST([{", ".join(str(f) for f in _YIELD_FRACS)}]) AS frac),
j AS (SELECT frac, fp FROM d CROSS JOIN fr WHERE b < frac)
SELECT CAST(frac AS BIGINT) AS frac,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dups,
       ROUND((COUNT(*) - COUNT(DISTINCT fp)) / (1.0 * COUNT(*)), 6)
         AS dup_rate
FROM j GROUP BY frac
"""


# --------------------------------------------------------------------------
# q307 — Hill tail-index estimator (Hill 1975) of the document-length
# distribution per source: α̂ = k / Σ_{i=1..k} ln(x_i / x_(k+1)) over
# the k = ⌈10% n⌉ largest lengths — the power-law-exponent audit that
# decides whether a feed's length tail is heavy enough to need
# length-capped packing (q71). ORDER STATISTICS WITHOUT A SORT: the
# per-source value histogram + a cumulative-from-top window over that
# small aggregate finds the (k+1)-th largest value v*; ties at v*
# contribute ln(v*/v*) = 0, so the top-k log-sum is exactly
# Σ_{v > v*} c_v (ln v − ln v*) — q166's histogram-rank scale path, no
# per-row window over raw docs. Oracle: the identical histogram logic.
# --------------------------------------------------------------------------

_HILL_FRAC = 0.10


def q307_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x")
    )
    hist = d.groupBy("source", "x").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = hist.groupBy("source").agg(
        F.sum("c").alias("n")
    ).withColumn("k", F.ceil(F.lit(_HILL_FRAC) * F.col("n")).cast("double"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cumc", F.sum("c").over(w)).join(tot, "source")
    # v* = largest value whose cumulative-from-top count reaches k+1
    vstar = (
        cum.filter(F.col("cumc") >= F.col("k") + 1)
        .groupBy("source")
        .agg(F.max("x").alias("v"))
    )
    s = (
        hist.join(vstar, "source")
        .filter(F.col("x") > F.col("v"))
        .groupBy("source")
        .agg(
            F.sum(
                F.col("c") * (F.log("x") - F.log("v"))
            ).alias("logsum")
        )
    )
    return (
        tot.join(vstar, "source")
        .join(s, "source", "left")
        .withColumn("logsum", F.coalesce("logsum", F.lit(0.0)))
        .filter(F.col("logsum") > 0)
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.col("v").alias("x_k1"),
            F.round(F.col("k") / F.col("logsum"), 6).alias("hill_alpha"),
        )
    )


Q307_SQL = f"""
WITH d AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents
), hist AS (
  SELECT source, x, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1, 2
), tot AS (
  SELECT source, SUM(c) AS n, CAST(CEIL({_HILL_FRAC} * SUM(c)) AS DOUBLE)
           AS k
  FROM hist GROUP BY 1
), cum AS (
  SELECT h.source, h.x, h.c,
         SUM(h.c) OVER (PARTITION BY h.source ORDER BY h.x DESC
                        ROWS UNBOUNDED PRECEDING) AS cumc,
         t.k
  FROM hist h JOIN tot t ON t.source = h.source
), vstar AS (
  SELECT source, MAX(x) AS v FROM cum WHERE cumc >= k + 1 GROUP BY 1
), s AS (
  SELECT h.source, SUM(h.c * (LN(h.x) - LN(v.v))) AS logsum
  FROM hist h JOIN vstar v ON v.source = h.source
  WHERE h.x > v.v GROUP BY 1
)
SELECT t.source, CAST(t.n AS BIGINT) AS n, CAST(t.k AS BIGINT) AS k,
       v.v AS x_k1, ROUND(t.k / s.logsum, 6) AS hill_alpha
FROM tot t JOIN vstar v ON v.source = t.source
JOIN s ON s.source = t.source
WHERE s.logsum > 0
"""


# --------------------------------------------------------------------------
# q308 — Atkinson inequality index (Atkinson 1970, ε = 0.5) of order
# value per customer market segment: A_ε = 1 − (EDE/μ) with the
# equally-distributed equivalent EDE = ((1/n)Σ x^{1−ε})^{1/(1−ε)} —
# the welfare-weighted cousin of Gini (q133) and Theil (q303), and the
# one with an explicit inequality-aversion knob. One orders⋈customer
# join (AQE picks broadcast vs shuffle on the custkey spine), then a
# single partial-agg pass per segment — x^0.5 rides the scan's codegen
# span.
# --------------------------------------------------------------------------

_ATK_EPS = 0.5


def q308_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    j = o.join(c, "o_custkey")
    g = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("o_totalprice").alias("mu"),
        F.avg(F.pow("o_totalprice", F.lit(1.0 - _ATK_EPS))).alias("mpow"),
    )
    ede = F.pow(F.col("mpow"), F.lit(1.0 / (1.0 - _ATK_EPS)))
    return g.select(
        "seg",
        F.col("n").cast("long").alias("n"),
        F.round("mu", 6).alias("mean_value"),
        F.round(ede, 6).alias("ede"),
        F.round(1.0 - ede / F.col("mu"), 6).alias("atkinson"),
    )


Q308_SQL = f"""
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), g AS (
  SELECT seg, CAST(COUNT(*) AS DOUBLE) AS n, AVG(x) AS mu,
         AVG(POW(x, {1.0 - _ATK_EPS})) AS mpow
  FROM j GROUP BY 1
)
SELECT seg, CAST(n AS BIGINT) AS n,
       ROUND(mu, 6) AS mean_value,
       ROUND(POW(mpow, {1.0 / (1.0 - _ATK_EPS)}), 6) AS ede,
       ROUND(1.0 - POW(mpow, {1.0 / (1.0 - _ATK_EPS)}) / mu, 6)
         AS atkinson
FROM g
"""


# --------------------------------------------------------------------------
# q309 — Gumbel extreme-value fit of weekly peak load per event type
# (block maxima, method of moments): σ̂ = s√6/π, μ̂ = m̄ − γσ̂ (Euler-
# Mascheroni γ), and the T-block return level μ̂ − σ̂·ln(−ln(1−1/T)) —
# the capacity-planning number ("the daily peak a 4-week horizon
# should survive") that a rate-anomaly stack (q89) sizes its buffers
# with. Two partial-agg shuffles (day grid → week maxima) + a per-type
# rollup; everything after the first agg is calendar-bounded.
# --------------------------------------------------------------------------

_EULER_G = 0.5772156649015329
_GUMBEL_T = 4


def q309_gumbel_evt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    weekly = daily.groupBy(
        "event_type", (F.floor(F.col("day") / 7)).alias("wk")
    ).agg(F.max("y").alias("mx"), F.count(F.lit(1)).alias("nd"))
    # only full 7-day blocks — partial weeks bias the maxima low
    g = (
        weekly.filter(F.col("nd") == 7)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.avg("mx").alias("m"),
            F.stddev_samp("mx").alias("s"),
        )
        .filter(F.col("n_blocks") >= 3)
    )
    import math

    sigma = F.col("s") * math.sqrt(6.0) / math.pi
    mu = F.col("m") - _EULER_G * sigma
    rl = mu - sigma * F.log(
        -F.log(F.lit(1.0 - 1.0 / _GUMBEL_T))
    )
    return g.select(
        "event_type",
        "n_blocks",
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(sigma, 6).alias("gumbel_sigma"),
        F.round(rl, 6).alias(f"return_level_{_GUMBEL_T}wk"),
    )


Q309_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), weekly AS (
  SELECT event_type, day // 7 AS wk, MAX(y) AS mx, COUNT(*) AS nd
  FROM daily GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         AVG(mx) AS m, STDDEV_SAMP(mx) AS s
  FROM weekly WHERE nd = 7 GROUP BY 1
  HAVING COUNT(*) >= 3
)
SELECT event_type, n_blocks,
       ROUND(m - {_EULER_G} * (s * SQRT(6.0) / PI()), 6) AS gumbel_mu,
       ROUND(s * SQRT(6.0) / PI(), 6) AS gumbel_sigma,
       ROUND((m - {_EULER_G} * (s * SQRT(6.0) / PI()))
             - (s * SQRT(6.0) / PI())
               * LN(-LN(1.0 - 1.0 / {_GUMBEL_T})), 6)
         AS return_level_{_GUMBEL_T}wk
FROM g
"""


# --------------------------------------------------------------------------
# q310 — split-conformal prediction intervals (Papadopoulos 2002,
# Vovk's inductive conformal): md5-hash 3-way split of orders into
# train/calibration/test; the predictor is the train-half per-segment
# mean, the conformal radius q̂ is the ⌈0.9(n+1)⌉-th smallest
# calibration residual read from a FIXED-WIDTH residual histogram
# (bin = ⌊r/100⌋, q̂ = the bin's upper edge — a deterministic, bounded
# discretization of the order statistic, never a global sort), and
# coverage is evaluated on the held-out test split (finite-sample
# guarantee ≥ 90% up to binning slack). One agg per split, histogram
# windows per segment over ≤ a few hundred bins.
# --------------------------------------------------------------------------

_CONF_ALPHA = 0.9
_CONF_BIN = 100.0


def q310_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.pmod(md5long(F.col("o_orderkey").cast("string")), F.lit(3)).alias(
            "split"
        ),
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    j = o.join(c, "o_custkey")
    mean = (
        j.filter(F.col("split") == 0)
        .groupBy("seg")
        .agg(
            F.avg("o_totalprice").alias("yhat"),
            F.count(F.lit(1)).cast("long").alias("n_train"),
        )
    )
    calib = (
        j.filter(F.col("split") == 1)
        .join(F.broadcast(mean), "seg")
        .select(
            "seg",
            F.floor(
                F.abs(F.col("o_totalprice") - F.col("yhat")) / _CONF_BIN
            ).alias("bin"),
        )
    )
    ch = calib.groupBy("seg", "bin").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    ct = ch.groupBy("seg").agg(F.sum("cnt").alias("n_c"))
    w = (
        Window.partitionBy("seg")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rank = F.ceil(F.lit(_CONF_ALPHA) * (F.col("n_c") + 1))
    qhat = (
        ch.join(ct, "seg")
        .withColumn("cum", F.sum("cnt").over(w))
        .filter(F.col("cum") >= rank)
        .groupBy("seg")
        .agg(
            ((F.min("bin") + 1) * _CONF_BIN).alias("q_hat"),
            F.max("n_c").cast("long").alias("n_calib"),
        )
    )
    test = (
        j.filter(F.col("split") == 2)
        .join(F.broadcast(mean), "seg")
        .join(F.broadcast(qhat), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.avg(
                    (
                        F.abs(F.col("o_totalprice") - F.col("yhat"))
                        <= F.col("q_hat")
                    ).cast("double")
                ),
                6,
            ).alias("coverage"),
        )
    )
    return (
        mean.join(qhat, "seg")
        .join(test, "seg")
        .select(
            "seg",
            "n_train",
            "n_calib",
            "n_test",
            F.round("yhat", 6).alias("yhat"),
            F.round("q_hat", 6).alias("q_hat"),
            F.round(2.0 * F.col("q_hat"), 6).alias("width"),
            "coverage",
        )
    )


Q310_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_totalprice,
         {MD5LONG_SQL.format(x="CAST(o_orderkey AS VARCHAR)")} % 3 AS split
  FROM orders
), j AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice, o.split
  FROM o JOIN customer c ON c.c_custkey = o.o_custkey
), mean AS (
  SELECT seg, AVG(o_totalprice) AS yhat,
         CAST(COUNT(*) AS BIGINT) AS n_train
  FROM j WHERE split = 0 GROUP BY 1
), ch AS (
  SELECT j.seg, FLOOR(ABS(j.o_totalprice - m.yhat) / {_CONF_BIN}) AS bin,
         CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM j JOIN mean m ON m.seg = j.seg WHERE j.split = 1
  GROUP BY 1, 2
), ct AS (SELECT seg, SUM(cnt) AS n_c FROM ch GROUP BY 1),
qhat AS (
  SELECT seg, (MIN(bin) + 1) * {_CONF_BIN} AS q_hat,
         CAST(MAX(n_c) AS BIGINT) AS n_calib
  FROM (
    SELECT ch.seg, ch.bin, ct.n_c,
           SUM(ch.cnt) OVER (PARTITION BY ch.seg ORDER BY ch.bin
                             ROWS UNBOUNDED PRECEDING) AS cum
    FROM ch JOIN ct ON ct.seg = ch.seg
  ) WHERE cum >= CEIL({_CONF_ALPHA} * (n_c + 1))
  GROUP BY 1
), test AS (
  SELECT j.seg, CAST(COUNT(*) AS BIGINT) AS n_test,
         ROUND(AVG(CASE WHEN ABS(j.o_totalprice - m.yhat) <= q.q_hat
                   THEN 1.0 ELSE 0.0 END), 6) AS coverage
  FROM j JOIN mean m ON m.seg = j.seg
  JOIN qhat q ON q.seg = j.seg
  WHERE j.split = 2 GROUP BY 1
)
SELECT m.seg, m.n_train, q.n_calib, t.n_test,
       ROUND(m.yhat, 6) AS yhat, ROUND(q.q_hat, 6) AS q_hat,
       ROUND(2.0 * q.q_hat, 6) AS width, t.coverage
FROM mean m JOIN qhat q ON q.seg = m.seg
JOIN test t ON t.seg = m.seg
"""


# --------------------------------------------------------------------------
# q311 — RFF-MMD two-sample drift test (Gretton et al. JMLR 2012 +
# Rahimi-Recht features): maximum mean discrepancy between the two
# md5-parity halves of the corpus over standardized document length,
# estimated as ‖mean_A φ(x) − mean_B φ(x)‖² with D=16 random Fourier
# features — the O(n) drift statistic that replaces the O(n²) kernel
# MMD at corpus scale. W and b derive from md5-hash Box-Muller draws
# (q260's engine-portable construction), so both twins build
# bit-identical features. One stats agg (broadcast back), one 16×
# long-form partial agg per half, one 16-row rollup.
# --------------------------------------------------------------------------

_MMD_D = 16
_MMD_GAMMA = 0.5
_MMD_DENOM = float(1 << 60)


def q311_mmd_rff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

    from .common import md5long

    d = load(spark, sf_dir, "documents").select(
        F.pmod(md5long(F.col("doc_id").cast("string")), F.lit(2)).alias(
            "half"
        ),
        F.col("n_chars").cast("double").alias("x"),
    )
    st = d.agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")
    )
    z = d.crossJoin(F.broadcast(st)).select(
        "half", ((F.col("x") - F.col("mu")) / F.col("sd")).alias("xs")
    )
    feats = spark.range(_MMD_D).select(F.col("id").cast("int").alias("j"))
    u = lambda tag: (  # noqa: E731 — md5 uniform in (0,1), both engines
        md5long(F.concat_ws("|", F.lit(tag), F.col("j"))) + 0.5
    ) / F.lit(_MMD_DENOM)
    wb = feats.select(
        "j",
        (
            F.sqrt(-2.0 * F.log(u("w1")))
            * F.cos(2.0 * _m.pi * u("w2"))
            * _m.sqrt(2.0 * _MMD_GAMMA)
        ).alias("w"),
        (2.0 * _m.pi * u("b")).alias("b"),
    )
    phi = (
        z.crossJoin(F.broadcast(wb))
        .groupBy("half", "j")
        .agg(
            F.avg(
                F.lit(_m.sqrt(2.0 / _MMD_D))
                * F.cos(F.col("w") * F.col("xs") + F.col("b"))
            ).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = phi.filter(F.col("half") == 0).select(
        "j", F.col("m").alias("ma"), F.col("n").alias("n_a")
    )
    b = phi.filter(F.col("half") == 1).select(
        "j", F.col("m").alias("mb"), F.col("n").alias("n_b")
    )
    out = a.join(b, "j").agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.lit(_MMD_D).cast("long").alias("d"),
        F.sum(
            (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))
        ).alias("mmd2_raw"),
    )
    return out.select(
        "n_a",
        "n_b",
        "d",
        F.round("mmd2_raw", 6).alias("mmd2"),
        F.round(F.sqrt(F.greatest(F.lit(0.0), F.col("mmd2_raw"))), 6).alias(
            "mmd"
        ),
    )


Q311_SQL = f"""
WITH d AS (
  SELECT {MD5LONG_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 2 AS half,
         CAST(n_chars AS DOUBLE) AS x
  FROM documents
), st AS (SELECT AVG(x) AS mu, STDDEV_SAMP(x) AS sd FROM d),
z AS (SELECT half, (x - mu) / sd AS xs FROM d CROSS JOIN st),
feats AS (SELECT CAST(range AS INT) AS j FROM range({_MMD_D})),
wb AS (
  SELECT j,
         SQRT(-2.0 * LN(({MD5LONG_SQL.format(x="'w1|' || j")} + 0.5)
                        / {_MMD_DENOM}))
         * COS(2 * PI() * ({MD5LONG_SQL.format(x="'w2|' || j")} + 0.5)
               / {_MMD_DENOM})
         * SQRT(2.0 * {_MMD_GAMMA}) AS w,
         2 * PI() * ({MD5LONG_SQL.format(x="'b|' || j")} + 0.5)
           / {_MMD_DENOM} AS b
  FROM feats
), phi AS (
  SELECT half, j,
         AVG(SQRT(2.0 / {_MMD_D}) * COS(w * xs + b)) AS m,
         COUNT(*) AS n
  FROM z CROSS JOIN wb GROUP BY 1, 2
), o AS (
  SELECT CAST(MAX(a.n) AS BIGINT) AS n_a,
         CAST(MAX(b.n) AS BIGINT) AS n_b,
         SUM((a.m - b.m) * (a.m - b.m)) AS mmd2_raw
  FROM phi a JOIN phi b ON a.j = b.j AND a.half = 0 AND b.half = 1
)
SELECT n_a, n_b, CAST({_MMD_D} AS BIGINT) AS d,
       ROUND(mmd2_raw, 6) AS mmd2,
       ROUND(SQRT(GREATEST(0.0, mmd2_raw)), 6) AS mmd
FROM o
"""


# --------------------------------------------------------------------------
# q312 — covariate-balance table (standardized mean differences) for
# q290's treatment assignment, raw vs IPW-weighted: SMD = (μ₁−μ₀)/
# √((σ₁²+σ₀²)/2) per covariate (acctbal, order count, total spend),
# and the same with q290's stabilized stratum weights — the diagnostic
# that certifies an IPW analysis actually balanced its strata (|SMD| <
# 0.1 is the conventional gate). Covariates stack into long form (3×
# corpus-linear), weights broadcast from the stratum propensity dim,
# and each covariate's moments are ONE partial agg keyed (cov, t).
# Weighted moments use the population form Σwx²/Σw − (Σwx/Σw)².
# --------------------------------------------------------------------------


def q312_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 2 == 1).cast("int").alias("t"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_nationkey") % 5).alias("nb"),
        F.col("c_acctbal").alias("x_acctbal"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x_norders"),
            F.sum("o_totalprice").alias("x_spend"),
        )
    )
    base = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left"
    ).select(
        "t",
        "seg",
        "nb",
        "x_acctbal",
        F.coalesce("x_norders", F.lit(0.0)).alias("x_norders"),
        F.coalesce("x_spend", F.lit(0.0)).alias("x_spend"),
    )
    prop = (
        base.groupBy("seg", "nb")
        .agg(F.avg(F.col("t").cast("double")).alias("e"))
        .filter((F.col("e") > 0) & (F.col("e") < 1))
    )
    j = base.join(F.broadcast(prop), ["seg", "nb"])
    pbar = j.agg(F.avg(F.col("t").cast("double")).alias("pbar"))
    j = j.crossJoin(F.broadcast(pbar)).withColumn(
        "wt",
        F.when(F.col("t") == 1, F.col("pbar") / F.col("e")).otherwise(
            (1 - F.col("pbar")) / (1 - F.col("e"))
        ),
    )
    lng = None
    for cov in ("x_acctbal", "x_norders", "x_spend"):
        part = j.select(
            F.lit(cov).alias("cov"),
            "t",
            F.col(cov).cast("double").alias("x"),
            "wt",
        )
        lng = part if lng is None else lng.union(part)
    mom = lng.groupBy("cov", "t").agg(
        F.avg("x").alias("mu"),
        F.var_pop("x").alias("v"),
        (F.sum(F.col("wt") * F.col("x")) / F.sum("wt")).alias("muw"),
        (
            F.sum(F.col("wt") * F.col("x") * F.col("x")) / F.sum("wt")
            - (F.sum(F.col("wt") * F.col("x")) / F.sum("wt"))
            * (F.sum(F.col("wt") * F.col("x")) / F.sum("wt"))
        ).alias("vw"),
    )
    t1 = mom.filter(F.col("t") == 1).select(
        "cov",
        F.col("mu").alias("mu1"),
        F.col("v").alias("v1"),
        F.col("muw").alias("muw1"),
        F.col("vw").alias("vw1"),
    )
    t0 = mom.filter(F.col("t") == 0).select(
        "cov",
        F.col("mu").alias("mu0"),
        F.col("v").alias("v0"),
        F.col("muw").alias("muw0"),
        F.col("vw").alias("vw0"),
    )
    g = t1.join(t0, "cov")
    smd = (F.col("mu1") - F.col("mu0")) / F.sqrt(
        (F.col("v1") + F.col("v0")) / 2.0
    )
    smdw = (F.col("muw1") - F.col("muw0")) / F.sqrt(
        (F.col("vw1") + F.col("vw0")) / 2.0
    )
    return g.select(
        "cov",
        F.round(smd, 6).alias("smd_raw"),
        F.round(smdw, 6).alias("smd_weighted"),
        (F.abs(smd) < 0.1).alias("balanced_raw"),
        (F.abs(smdw) < 0.1).alias("balanced_weighted"),
    )


Q312_SQL = """
WITH cust AS (
  SELECT c_custkey, CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END AS t,
         c_mktsegment AS seg, c_nationkey % 5 AS nb,
         c_acctbal AS x_acctbal
  FROM customer
), osum AS (
  SELECT o_custkey, CAST(COUNT(*) AS DOUBLE) AS x_norders,
         SUM(o_totalprice) AS x_spend
  FROM orders GROUP BY 1
), base AS (
  SELECT t, seg, nb, x_acctbal,
         COALESCE(x_norders, 0.0) AS x_norders,
         COALESCE(x_spend, 0.0) AS x_spend
  FROM cust LEFT JOIN osum ON osum.o_custkey = cust.c_custkey
), prop AS (
  SELECT seg, nb, AVG(CAST(t AS DOUBLE)) AS e FROM base GROUP BY 1, 2
  HAVING AVG(CAST(t AS DOUBLE)) > 0 AND AVG(CAST(t AS DOUBLE)) < 1
), jb AS (
  SELECT b.*, p.e,
         (SELECT AVG(CAST(b2.t AS DOUBLE)) FROM base b2
          JOIN prop p2 ON p2.seg = b2.seg AND p2.nb = b2.nb) AS pbar
  FROM base b JOIN prop p ON p.seg = b.seg AND p.nb = b.nb
), wts AS (
  SELECT *, CASE WHEN t = 1 THEN pbar / e
                 ELSE (1 - pbar) / (1 - e) END AS wt
  FROM jb
), lng AS (
  SELECT 'x_acctbal' AS cov, t, CAST(x_acctbal AS DOUBLE) AS x, wt
  FROM wts
  UNION ALL
  SELECT 'x_norders', t, x_norders, wt FROM wts
  UNION ALL
  SELECT 'x_spend', t, x_spend, wt FROM wts
), mom AS (
  SELECT cov, t, AVG(x) AS mu, VAR_POP(x) AS v,
         SUM(wt * x) / SUM(wt) AS muw,
         SUM(wt * x * x) / SUM(wt)
           - (SUM(wt * x) / SUM(wt)) * (SUM(wt * x) / SUM(wt)) AS vw
  FROM lng GROUP BY 1, 2
), g AS (
  SELECT a.cov, a.mu AS mu1, a.v AS v1, a.muw AS muw1, a.vw AS vw1,
         b.mu AS mu0, b.v AS v0, b.muw AS muw0, b.vw AS vw0
  FROM mom a JOIN mom b ON a.cov = b.cov AND a.t = 1 AND b.t = 0
)
SELECT cov,
       ROUND((mu1 - mu0) / SQRT((v1 + v0) / 2.0), 6) AS smd_raw,
       ROUND((muw1 - muw0) / SQRT((vw1 + vw0) / 2.0), 6) AS smd_weighted,
       ABS((mu1 - mu0) / SQRT((v1 + v0) / 2.0)) < 0.1 AS balanced_raw,
       ABS((muw1 - muw0) / SQRT((vw1 + vw0) / 2.0)) < 0.1
         AS balanced_weighted
FROM g
"""


# --------------------------------------------------------------------------
# q316 — Mann-Whitney U one-vs-rest screen (Mann & Whitney 1947): for
# each language, the tie-corrected normal-approximation U test of
# whether that language's document lengths are stochastically longer
# than the rest of the corpus, plus the rank-biserial effect size.
# Ranks are NEVER materialized per row: the global value histogram
# (one row per distinct n_chars) carries cumulative offsets and
# midranks — the only unpartitioned window runs over that aggregate —
# and per-group rank sums are Σ n_gv · midrank(v), one partial-agg
# shuffle on (lang, n_chars). All moment sums in double (rank sums
# reach ~N² — int64 overflows near 3e9 rows; the 6dp rendering makes
# double exact enough).
# --------------------------------------------------------------------------


def _midrank_hist(df: DataFrame, group: str, value: str):
    """(per-group histogram joined to global midranks, global totals).

    Returns ``(gh, tot)``: ``gh`` has one row per (group, value) with
    ``c`` (count), ``m`` (midrank), ``n_g`` implicit via later agg;
    ``tot`` is a 1-row frame with N and the tie term T = Σ(t³−t).
    """
    hist = df.groupBy(value).agg(
        F.count(F.lit(1)).cast("double").alias("t")
    )
    w = Window.orderBy(value).rowsBetween(
        Window.unboundedPreceding, -1
    )
    mid = hist.select(
        value,
        "t",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0.0))
            + (F.col("t") + 1.0) / 2.0
        ).alias("m"),
    )
    gh = (
        df.groupBy(group, value)
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .join(mid.select(value, "m"), value)
    )
    tot = hist.agg(
        F.sum("t").alias("n_all"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_t"
        ),
    )
    return gh, tot


def q316_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("v")
    )
    gh, tot = _midrank_hist(d, "lang", "v")
    g = gh.groupBy("lang").agg(
        F.sum("c").alias("n_g"),
        F.sum(F.col("c") * F.col("m")).alias("r_g"),
    )
    j = g.crossJoin(F.broadcast(tot))
    n1, n2 = F.col("n_g"), F.col("n_all") - F.col("n_g")
    u = F.col("r_g") - n1 * (n1 + 1.0) / 2.0
    mu = n1 * n2 / 2.0
    # try_divide: n=1 (tie correction 0/0) and one-group corpora
    # (n2 = 0) render NULL on both engines (deg_one sweep)
    var = (n1 * n2 / 12.0) * (
        (F.col("n_all") + 1.0)
        - F.try_divide(
            F.col("tie_t"), F.col("n_all") * (F.col("n_all") - 1.0)
        )
    )
    return j.select(
        "lang",
        F.col("n_g").cast("long").alias("n"),
        F.round(u, 2).alias("u_stat"),
        F.round(F.try_divide(u - mu, F.sqrt(var)), 6).alias("z"),
        F.round(
            1.0 - F.try_divide(2.0 * u, n1 * n2), 6
        ).alias("rank_biserial"),
    )


Q316_SQL = """
WITH d AS (
  SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents
), hist AS (
  SELECT v, CAST(COUNT(*) AS DOUBLE) AS t FROM d GROUP BY 1
), mid AS (
  SELECT v, t,
         COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
           + (t + 1.0) / 2.0 AS m
  FROM hist
), gh AS (
  SELECT lang, v, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1, 2
), g AS (
  SELECT gh.lang, SUM(gh.c) AS n_g, SUM(gh.c * mid.m) AS r_g
  FROM gh JOIN mid ON mid.v = gh.v GROUP BY 1
), tot AS (
  SELECT SUM(t) AS n_all, SUM(t * t * t - t) AS tie_t FROM hist
)
SELECT lang, CAST(n_g AS BIGINT) AS n,
       ROUND(r_g - n_g * (n_g + 1.0) / 2.0, 2) AS u_stat,
       ROUND((r_g - n_g * (n_g + 1.0) / 2.0
              - n_g * (n_all - n_g) / 2.0)
             / SQRT((n_g * (n_all - n_g) / 12.0)
                    * ((n_all + 1.0)
                       - tie_t / (n_all * (n_all - 1.0)))), 6) AS z,
       ROUND(1.0 - 2.0 * (r_g - n_g * (n_g + 1.0) / 2.0)
             / (n_g * (n_all - n_g)), 6) AS rank_biserial
FROM g CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q317 — Kruskal-Wallis H across sources (Kruskal & Wallis 1952) on
# document lengths, with the tie correction C = 1 − Σ(t³−t)/(N³−N):
# the k-sample generalization of q316 over the same midrank-histogram
# machinery — rank sums from the (source, value) partial agg, H from a
# k-row rollup. Never a global per-row sort.
# --------------------------------------------------------------------------


def q317_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("v")
    )
    gh, tot = _midrank_hist(d, "source", "v")
    g = gh.groupBy("source").agg(
        F.sum("c").alias("n_g"),
        F.sum(F.col("c") * F.col("m")).alias("r_g"),
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("sr"),
    ).crossJoin(F.broadcast(tot))
    n = F.col("n_all")
    h = 12.0 / (n * (n + 1.0)) * F.col("sr") - 3.0 * (n + 1.0)
    # try_divide: n=1 → tie term 0/0; all-tied values → C = 0
    c = 1.0 - F.try_divide(F.col("tie_t"), n * n * n - n)
    return agg.select(
        "k_groups",
        n.cast("long").alias("n"),
        F.round(h, 6).alias("h_stat"),
        F.round(F.try_divide(h, c), 6).alias("h_tie_corrected"),
    )


Q317_SQL = """
WITH d AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
), hist AS (
  SELECT v, CAST(COUNT(*) AS DOUBLE) AS t FROM d GROUP BY 1
), mid AS (
  SELECT v, t,
         COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
           + (t + 1.0) / 2.0 AS m
  FROM hist
), gh AS (
  SELECT source, v, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1, 2
), g AS (
  SELECT gh.source, SUM(gh.c) AS n_g, SUM(gh.c * mid.m) AS r_g
  FROM gh JOIN mid ON mid.v = gh.v GROUP BY 1
), tot AS (
  SELECT SUM(t) AS n_all, SUM(t * t * t - t) AS tie_t FROM hist
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         SUM(r_g * r_g / n_g) AS sr
  FROM g
)
SELECT k_groups, CAST(n_all AS BIGINT) AS n,
       ROUND(12.0 / (n_all * (n_all + 1.0)) * sr
             - 3.0 * (n_all + 1.0), 6) AS h_stat,
       ROUND((12.0 / (n_all * (n_all + 1.0)) * sr
              - 3.0 * (n_all + 1.0))
             / (1.0 - tie_t / (n_all * n_all * n_all - n_all)), 6)
         AS h_tie_corrected
FROM agg CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q318 — Brown-Forsythe robust variance-homogeneity test (Brown &
# Forsythe 1974): Levene's W computed on absolute deviations from the
# GROUP MEDIAN (robust to the heavy-tailed event values), i.e. a
# one-way ANOVA F over z_ij = |x_ij − med_j|. Group medians are one
# exact-percentile agg (Spark sorts within group partitions, never
# globally); the F reuses q146's two-level moment algebra. Guarded to
# groups with n > 1 so a single-row type cannot 0/0 the within-group
# term (the q182/q199 lesson).
# --------------------------------------------------------------------------


def q318_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    med = ev.groupBy("event_type").agg(
        F.median("v").alias("med"),
        F.count(F.lit(1)).alias("n_g"),
    ).filter(F.col("n_g") > 1)
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("z").alias("s"),
        F.sum(F.col("z") * F.col("z")).alias("ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").alias("n_all"),
        F.sum("s").alias("s_all"),
        F.sum("ss").alias("ss_all"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("s_all") * F.col("s_all") / F.col("n_all")
    ssw = F.col("ss_all") - F.col("sb")
    f_bf = (ssb / (F.col("k") - 1.0)) / (
        ssw / (F.col("n_all") - F.col("k"))
    )
    return tot.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_all").cast("long").alias("n"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(f_bf, 6).alias("f_bf"),
    )


Q318_SQL = """
WITH ev AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
), med AS (
  SELECT event_type, MEDIAN(v) AS med FROM ev
  GROUP BY 1 HAVING COUNT(*) > 1
), z AS (
  SELECT ev.event_type, ABS(ev.v - med.med) AS z
  FROM ev JOIN med ON med.event_type = ev.event_type
), g AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(z) AS s, SUM(z * z) AS ss
  FROM z GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(n) AS n_all,
         SUM(s) AS s_all, SUM(ss) AS ss_all,
         SUM(s * s / n) AS sb
  FROM g
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n_all AS BIGINT) AS n,
       ROUND(sb - s_all * s_all / n_all, 4) AS ss_between,
       ROUND(ss_all - sb, 4) AS ss_within,
       ROUND(((sb - s_all * s_all / n_all) / (k - 1.0))
             / ((ss_all - sb) / (n_all - k)), 6) AS f_bf
FROM tot
"""


# --------------------------------------------------------------------------
# q325 — temporal train/test leakage audit (Kaufman et al. TKDD 2012
# "leakage in data mining"): split the event stream at the 80% point
# of the observed time range; per event type, report what fraction of
# test-window users also appear in the train window — the identity
# overlap a time-based split is supposed to eliminate before a model
# is fit on per-user features. Plan: one (event_type, user) partial
# agg carrying min/max epoch, the global range as a broadcast 1-row
# frame, then a per-type rollup. Epoch arithmetic in double — both
# engines render parquet timestamps to the identical epoch seconds.
# --------------------------------------------------------------------------

_LEAK_SPLIT = 0.8


def q325_temporal_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.col("ts").cast("timestamp_ltz").cast("long")
        .cast("double").alias("ep"),
    )
    rng = ev.agg(
        F.min("ep").alias("t0"), F.max("ep").alias("t1")
    ).select(
        (F.col("t0") + _LEAK_SPLIT * (F.col("t1") - F.col("t0"))).alias(
            "cut"
        )
    )
    per_user = (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("event_type", "user_id")
        .agg(
            F.max((F.col("ep") < F.col("cut")).cast("int")).alias(
                "in_train"
            ),
            F.max((F.col("ep") >= F.col("cut")).cast("int")).alias(
                "in_test"
            ),
        )
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum("in_train").cast("long").alias("n_train_users"),
            F.sum("in_test").cast("long").alias("n_test_users"),
            F.sum(
                (F.col("in_train") * F.col("in_test"))
            ).cast("long").alias("n_leaked"),
        )
        .filter(F.col("n_test_users") > 0)
        .select(
            "event_type",
            "n_train_users",
            "n_test_users",
            "n_leaked",
            F.round(
                F.col("n_leaked") / F.col("n_test_users"), 6
            ).alias("leakage"),
        )
    )


Q325_SQL = f"""
WITH ev AS (
  SELECT event_type, user_id,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE) AS ep
  FROM events
), rng AS (
  SELECT MIN(ep) + {_LEAK_SPLIT} * (MAX(ep) - MIN(ep)) AS cut FROM ev
), per_user AS (
  SELECT event_type, user_id,
         MAX(CASE WHEN ep < rng.cut THEN 1 ELSE 0 END) AS in_train,
         MAX(CASE WHEN ep >= rng.cut THEN 1 ELSE 0 END) AS in_test
  FROM ev CROSS JOIN rng GROUP BY 1, 2
)
SELECT event_type,
       CAST(SUM(in_train) AS BIGINT) AS n_train_users,
       CAST(SUM(in_test) AS BIGINT) AS n_test_users,
       CAST(SUM(in_train * in_test) AS BIGINT) AS n_leaked,
       ROUND(SUM(in_train * in_test) / (1.0 * SUM(in_test)), 6)
         AS leakage
FROM per_user GROUP BY 1 HAVING SUM(in_test) > 0
"""


# --------------------------------------------------------------------------
# q327 — Weibull probability-plot fit of inter-arrival gaps (Weibull
# 1951; Bernard's median-rank regression, the standard reliability-
# engineering estimator): per event type, fit ln(−ln(1−F)) = k·ln g −
# k·ln λ over the empirical CDF of per-user arrival gaps, giving shape
# k (k < 1 = bursty/clustered arrivals, k ≈ 1 = memoryless Poisson,
# k > 1 = regular cadence) and scale λ. The CDF uses median ranks
# F = (r − 0.3)/(n + 0.4) computed from the per-type GAP HISTOGRAM —
# the cumulative window runs over distinct gap values per type, never
# per event. The per-user lag window is partitioned by (type, user):
# distributed. OLS via the 6-moment rollup, degenerate types guarded.
# --------------------------------------------------------------------------


def q327_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("ep"),
    )
    wl = Window.partitionBy("event_type", "user_id").orderBy(
        "ep", "event_id"
    )
    gaps = (
        ev.withColumn("gap", F.col("ep") - F.lag("ep").over(wl))
        .filter(F.col("gap") > 0)
        .select("event_type", F.col("gap").cast("double").alias("g"))
    )
    hist = gaps.groupBy("event_type", "g").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_t = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    pts = (
        hist.withColumn("r", F.sum("c").over(wc))
        .join(n_t, "event_type")
        .select(
            "event_type",
            "c",
            "n",
            F.log("g").alias("x"),
            F.log(
                -F.log(
                    1.0 - (F.col("r") - 0.3) / (F.col("n") + 0.4)
                )
            ).alias("y"),
        )
    )
    g = pts.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.sum("c").alias("np"),
        F.sum(F.col("c") * F.col("x")).alias("sx"),
        F.sum(F.col("c") * F.col("y")).alias("sy"),
        F.sum(F.col("c") * F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("c") * F.col("x") * F.col("x")).alias("sxx"),
    ).filter(
        (F.col("np") > 2)
        & (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("np") > 0)
    )
    k = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("np")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("np")
    )
    b = F.col("sy") / F.col("np") - k * F.col("sx") / F.col("np")
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(k, 6).alias("shape_k"),
        F.round(F.exp(-b / k), 4).alias("scale_lambda"),
    )


Q327_SQL = """
WITH ev AS (
  SELECT event_type, user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
), gaps AS (
  SELECT event_type, CAST(gap AS DOUBLE) AS g FROM (
    SELECT event_type,
           ep - LAG(ep) OVER (PARTITION BY event_type, user_id
                              ORDER BY ep, event_id) AS gap
    FROM ev)
  WHERE gap > 0
), hist AS (
  SELECT event_type, g, CAST(COUNT(*) AS DOUBLE) AS c
  FROM gaps GROUP BY 1, 2
), n_t AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n FROM gaps GROUP BY 1
), pts AS (
  SELECT h.event_type, h.c, n_t.n, LN(h.g) AS x,
         LN(-LN(1.0 - (SUM(h.c) OVER (PARTITION BY h.event_type
              ORDER BY h.g ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) - 0.3) / (n_t.n + 0.4))) AS y
  FROM hist h JOIN n_t ON n_t.event_type = h.event_type
), g AS (
  SELECT event_type, ANY_VALUE(n) AS n, SUM(c) AS np,
         SUM(c * x) AS sx, SUM(c * y) AS sy,
         SUM(c * x * y) AS sxy, SUM(c * x * x) AS sxx
  FROM pts GROUP BY 1
  HAVING SUM(c) > 2 AND SUM(c * x * x) - SUM(c * x) * SUM(c * x) / SUM(c) > 0
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       ROUND((sxy - sx * sy / np) / (sxx - sx * sx / np), 6) AS shape_k,
       ROUND(EXP(-(sy / np - (sxy - sx * sy / np) / (sxx - sx * sx / np)
                  * sx / np)
                 / ((sxy - sx * sy / np) / (sxx - sx * sx / np))), 4)
         AS scale_lambda
FROM g
"""


# --------------------------------------------------------------------------
# q330 — 1-D Wasserstein-1 (earth-mover) length drift, each source vs
# the rest of the corpus: W₁ = ∫|F_s(v) − F_rest(v)| dv computed
# EXACTLY from the value histogram — the area between the two
# empirical CDFs, summed over distinct-value gaps. Complements the
# sup-norm KS (q120) and the vocab-space JSD (q323): W₁ is the drift
# measure that weighs HOW FAR probability mass moved, the right
# trigger for re-fitting length-binned samplers. Plan: one (source,
# value) partial agg; the CDF walk is a cumulative window over the
# value histogram per source (aggregated input); the v-gap comes from
# a lead() on the same tiny frame.
# --------------------------------------------------------------------------


def q330_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("v")
    )
    sv = d.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    vt = sv.groupBy("v").agg(F.sum("c").alias("ct"))
    # dense per-source value grid: every source needs a CDF point at
    # every GLOBAL distinct value (the rest-CDF changes there)
    grid = sv.select("source").distinct().crossJoin(vt)
    dense = (
        grid.join(sv, ["source", "v"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0.0)))
    )
    stot = sv.groupBy("source").agg(F.sum("c").alias("n_s"))
    ntot = vt.agg(F.sum("ct").alias("n_all"))
    wcdf = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wlead = Window.partitionBy("source").orderBy("v")
    pts = (
        dense.join(stot, "source")
        .crossJoin(F.broadcast(ntot))
        .select(
            "source",
            "v",
            (F.sum("c").over(wcdf) / F.col("n_s")).alias("f_s"),
            (
                (F.sum("ct").over(wcdf) - F.sum("c").over(wcdf))
                / (F.col("n_all") - F.col("n_s"))
            ).alias("f_r"),
            (F.lead("v").over(wlead) - F.col("v")).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return pts.groupBy("source").agg(
        F.round(
            F.sum(F.abs(F.col("f_s") - F.col("f_r")) * F.col("gap")), 4
        ).alias("w1"),
        F.round(
            F.max(F.abs(F.col("f_s") - F.col("f_r"))), 6
        ).alias("ks_sup"),
    )


Q330_SQL = """
WITH d AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
), sv AS (
  SELECT source, v, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1, 2
), vt AS (SELECT v, SUM(c) AS ct FROM sv GROUP BY 1),
grid AS (
  SELECT s.source, vt.v, vt.ct FROM (SELECT DISTINCT source FROM sv) s
  CROSS JOIN vt
), dense AS (
  SELECT g.source, g.v, g.ct, COALESCE(sv.c, 0.0) AS c
  FROM grid g LEFT JOIN sv ON sv.source = g.source AND sv.v = g.v
), stot AS (SELECT source, SUM(c) AS n_s FROM sv GROUP BY 1),
ntot AS (SELECT SUM(ct) AS n_all FROM vt),
pts AS (
  SELECT d.source, d.v,
         SUM(d.c) OVER w / st.n_s AS f_s,
         (SUM(d.ct) OVER w - SUM(d.c) OVER w)
           / (ntot.n_all - st.n_s) AS f_r,
         LEAD(d.v) OVER (PARTITION BY d.source ORDER BY d.v) - d.v
           AS gap
  FROM dense d JOIN stot st ON st.source = d.source CROSS JOIN ntot
  WINDOW w AS (PARTITION BY d.source ORDER BY d.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT source,
       ROUND(SUM(ABS(f_s - f_r) * gap), 4) AS w1,
       ROUND(MAX(ABS(f_s - f_r)), 6) AS ks_sup
FROM pts WHERE gap IS NOT NULL GROUP BY 1
"""


# --------------------------------------------------------------------------
# q331 — diurnal concentration via circular statistics (Mardia & Jupp
# 2000; Rayleigh 1880): map each event's second-of-day onto the unit
# circle θ = 2π·s/86400 and report, per event type, the circular mean
# hour, the mean resultant length R̄ (0 = uniform over the day, 1 =
# a single spike), and the Rayleigh test statistic z = n·R̄² whose
# large-n null is Exp(1) — the right uniformity test for periodic
# data, where a linear histogram χ² ignores wrap-around. One partial
# agg of (Σcos, Σsin) per type; atan2 rendered identically by both
# libms at 6dp.
# --------------------------------------------------------------------------


def q331_circular_diurnal(spark: SparkSession, sf_dir: str) -> DataFrame:
    two_pi = 2.0 * math.pi
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (
            (F.col("ts").cast("timestamp_ltz").cast("long") % 86400)
            .cast("double")
            * (two_pi / 86400.0)
        ).alias("theta"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.cos("theta")).alias("sc"),
        F.sum(F.sin("theta")).alias("ss"),
    )
    rbar = F.sqrt(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / F.col(
        "n"
    )
    mean_hour = (
        F.atan2(F.col("ss"), F.col("sc")) / two_pi * 24.0 + 24.0
    ) % 24.0
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(rbar, 6).alias("resultant_r"),
        F.round(F.col("n") * rbar * rbar, 4).alias("rayleigh_z"),
    )


Q331_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS DOUBLE)
           * ({2.0 * math.pi} / 86400.0) AS theta
  FROM events
), g AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(COS(theta)) AS sc, SUM(SIN(theta)) AS ss
  FROM ev GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       ROUND((ATAN2(ss, sc) / {2.0 * math.pi} * 24.0 + 24.0) % 24.0, 4)
         AS mean_hour,
       ROUND(SQRT(sc * sc + ss * ss) / n, 6) AS resultant_r,
       ROUND(n * (SQRT(sc * sc + ss * ss) / n)
               * (SQRT(sc * sc + ss * ss) / n), 4) AS rayleigh_z
FROM g
"""


# --------------------------------------------------------------------------
# q332 — HAC / Newey-West (1987) robust standard error for the daily-
# mean trend: OLS of the daily mean event value on day index, then the
# Bartlett-kernel long-run variance of the residual score series with
# lag window L = 7 — the autocorrelation-consistent SE a metrics team
# needs before declaring a trend significant (naive OLS SEs overstate
# precision when daily shocks persist). Everything after the ONE
# (day) partial agg runs on the ≤ 90-row day grid: the lag terms are
# a bounded self-join of the residual grid on day offsets 1..7.
# Reports slope, naive SE, NW SE, and the inflation ratio.
# --------------------------------------------------------------------------

_NW_LAGS = 7


def q332_newey_west(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        (
            F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
        )
        .cast("long")
        .alias("day"),
        F.col("value").cast("double").alias("v"),
    )
    daily = ev.groupBy("day").agg(F.avg("v").alias("y")).persist()
    d0 = daily.agg(F.min("day").alias("d0"))
    pts = daily.crossJoin(F.broadcast(d0)).select(
        (F.col("day") - F.col("d0")).cast("double").alias("x"), "y"
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
    )
    # try_divide: a 0- or 1-day series has zero x-variance — DuckDB
    # renders the slope NULL where ANSI Spark would raise (deg sweeps)
    beta = F.try_divide(
        F.col("mxy") - F.col("mx") * F.col("my"),
        F.col("mxx") - F.col("mx") * F.col("mx"),
    )
    alpha = F.col("my") - beta * F.col("mx")
    mm = m.select(
        "n", "mx", "mxx", beta.alias("beta"), alpha.alias("alpha")
    )
    res = pts.crossJoin(F.broadcast(mm)).select(
        "x",
        "n",
        "mx",
        "mxx",
        "beta",
        (
            (F.col("x") - F.col("mx"))
            * (F.col("y") - F.col("alpha") - F.col("beta") * F.col("x"))
        ).alias("u"),
    ).persist()
    # n/mx/mxx/beta ride along from the aggregate frame mm, NOT via
    # first() over res rows — over an empty series first() is NULL
    # while the oracle's COUNT-derived n is 0 (deg_empty sweep)
    g0 = res.agg(F.sum(F.col("u") * F.col("u")).alias("g")).crossJoin(
        F.broadcast(mm.select("n", "mx", "mxx", "beta"))
    )
    lag = res.select(F.col("x").alias("xl"), F.col("u").alias("ul"))
    cross = (
        res.join(
            lag,
            (F.col("x") - F.col("xl") >= 1)
            & (F.col("x") - F.col("xl") <= _NW_LAGS),
        )
        .select(
            (F.col("x") - F.col("xl")).alias("l"),
            (F.col("u") * F.col("ul")).alias("uu"),
        )
        .groupBy("l")
        .agg(F.sum("uu").alias("gl"))
        .agg(
            F.sum(
                (1.0 - F.col("l") / (F.lit(_NW_LAGS) + 1.0)) * 2.0 * F.col("gl")
            ).alias("g_lags")
        )
    )
    out = g0.crossJoin(F.broadcast(cross))
    sxx = F.col("n") * (F.col("mxx") - F.col("mx") * F.col("mx"))
    var_naive = F.try_divide(
        F.try_divide(
            F.try_divide(F.col("g"), F.col("n") - 2.0),
            F.col("mxx") - F.col("mx") * F.col("mx"),
        ),
        F.col("n"),
    )
    var_nw = F.try_divide(
        F.col("g") + F.coalesce(F.col("g_lags"), F.lit(0.0)), sxx * sxx
    )
    r = out.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("beta"), 6).alias("slope"),
        F.round(F.sqrt(var_naive), 6).alias("se_naive"),
        F.round(F.sqrt(var_nw), 6).alias("se_newey_west"),
        F.round(F.sqrt(F.try_divide(var_nw, var_naive)), 4).alias(
            "se_inflation"
        ),
    )
    for c in (daily, res):
        c.unpersist()
    return r


Q332_SQL = f"""
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(value AS DOUBLE) AS v
  FROM events
), daily AS (SELECT day, AVG(v) AS y FROM ev GROUP BY 1),
d0 AS (SELECT MIN(day) AS d0 FROM daily),
pts AS (
  SELECT CAST(day - d0.d0 AS DOUBLE) AS x, y FROM daily CROSS JOIN d0
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(x) AS mx, AVG(y) AS my,
         AVG(x * y) AS mxy, AVG(x * x) AS mxx
  FROM pts
), mm AS (
  SELECT n, mx, mxx,
         (mxy - mx * my) / (mxx - mx * mx) AS beta,
         my - (mxy - mx * my) / (mxx - mx * mx) * mx AS alpha
  FROM m
), res AS (
  SELECT pts.x, (pts.x - mm.mx) * (pts.y - mm.alpha - mm.beta * pts.x)
           AS u
  FROM pts CROSS JOIN mm
), g0 AS (SELECT SUM(u * u) AS g FROM res),
cross_l AS (
  SELECT SUM((1.0 - l / ({_NW_LAGS} + 1.0)) * 2.0 * gl) AS g_lags
  FROM (
    SELECT a.x - b.x AS l, SUM(a.u * b.u) AS gl
    FROM res a JOIN res b
      ON a.x - b.x >= 1 AND a.x - b.x <= {_NW_LAGS}
    GROUP BY 1)
)
SELECT CAST(mm.n AS BIGINT) AS n_days,
       ROUND(mm.beta, 6) AS slope,
       ROUND(SQRT((g0.g / (mm.n - 2.0)) / (mm.mxx - mm.mx * mm.mx)
                  / mm.n), 6) AS se_naive,
       ROUND(SQRT((g0.g + COALESCE(cross_l.g_lags, 0.0))
                  / POW(mm.n * (mm.mxx - mm.mx * mm.mx), 2)), 6)
         AS se_newey_west,
       ROUND(SQRT(((g0.g + COALESCE(cross_l.g_lags, 0.0))
                   / POW(mm.n * (mm.mxx - mm.mx * mm.mx), 2))
                  / ((g0.g / (mm.n - 2.0))
                     / (mm.mxx - mm.mx * mm.mx) / mm.n)), 4)
         AS se_inflation
FROM mm CROSS JOIN g0 CROSS JOIN cross_l
"""


# --------------------------------------------------------------------------
# q347 — SAX SYMBOLIZATION + motif census per event type: the daily
# count series is PAA-compressed (4-day segment sums — exact integer
# arithmetic), z-normalized per type from the segment moments (integer
# sums → exact doubles), mapped to a 4-symbol alphabet at the standard
# N(0,1) quartile breakpoints (±0.6745, 0), and mined for trigram
# motifs (3 consecutive symbols). The top motif per type is the
# recurring shape an anomaly monitor alerts on when it STOPS
# appearing. Scale: everything after the one (type, day) partial agg
# lives on the tiny per-type segment grid — windows partition by type,
# never global; the alphabet map is a pure projection.
# --------------------------------------------------------------------------


def q347_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", _eday("ts").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    seg = (
        daily.join(d0, "event_type")
        .select(
            "event_type",
            F.floor((F.col("day") - F.col("d0")) / 4).alias("seg"),
            "c",
        )
        .groupBy("event_type", "seg")
        .agg(F.sum("c").alias("v"))
    )
    mom = seg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    mu = F.col("s1") / F.col("ns")
    sd = F.sqrt(F.col("s2") / F.col("ns") - mu * mu)
    z = (F.col("v") - mu) / sd
    sym = (
        F.when(z < -0.6745, F.lit("a"))
        .when(z < 0.0, F.lit("b"))
        .when(z < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    # a constant series has sd = 0 → NaN z; drop it rather than let the
    # two engines disagree on NaN comparisons (q163's c > 1 idiom)
    s = (
        seg.join(mom, "event_type")
        .filter(
            (F.col("ns") >= 3)
            & (F.col("s2") * F.col("ns") > F.col("s1") * F.col("s1"))
        )
        .select("event_type", "seg", sym.alias("sym"))
    )
    w = Window.partitionBy("event_type").orderBy("seg")
    tri = (
        s.select(
            "event_type",
            "seg",
            F.concat(
                F.col("sym"),
                F.lead("sym", 1).over(w),
                F.lead("sym", 2).over(w),
            ).alias("motif"),
        )
        .filter(F.col("motif").isNotNull())
        .groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("motif").asc()
    )
    return (
        tri.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("motif").alias("top_motif"),
            F.col("n").cast("long").alias("n_occurrences"),
        )
    )


Q347_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
), d0 AS (
  SELECT event_type, MIN(day) AS d0 FROM daily GROUP BY 1
), seg AS (
  SELECT daily.event_type,
         (daily.day - d0.d0) // 4 AS seg, SUM(c) AS v
  FROM daily JOIN d0 ON daily.event_type = d0.event_type
  GROUP BY 1, 2
), mom AS (
  SELECT event_type, COUNT(*) AS ns, SUM(v) AS s1, SUM(v * v) AS s2
  FROM seg GROUP BY 1
), s AS (
  SELECT seg.event_type, seg.seg,
         CASE
           WHEN (v - s1 / (1.0 * ns))
                / sqrt(s2 / (1.0 * ns) - (s1 / (1.0 * ns)) * (s1 / (1.0 * ns)))
                < -0.6745 THEN 'a'
           WHEN (v - s1 / (1.0 * ns))
                / sqrt(s2 / (1.0 * ns) - (s1 / (1.0 * ns)) * (s1 / (1.0 * ns)))
                < 0.0 THEN 'b'
           WHEN (v - s1 / (1.0 * ns))
                / sqrt(s2 / (1.0 * ns) - (s1 / (1.0 * ns)) * (s1 / (1.0 * ns)))
                < 0.6745 THEN 'c'
           ELSE 'd'
         END AS sym
  FROM seg JOIN mom ON seg.event_type = mom.event_type
  WHERE mom.ns >= 3 AND mom.s2 * mom.ns > mom.s1 * mom.s1
), tri AS (
  SELECT event_type,
         sym || lead(sym, 1) OVER (PARTITION BY event_type ORDER BY seg)
             || lead(sym, 2) OVER (PARTITION BY event_type ORDER BY seg)
           AS motif
  FROM s
), cnt AS (
  SELECT event_type, motif, COUNT(*) AS n
  FROM tri WHERE motif IS NOT NULL GROUP BY 1, 2
), top AS (
  SELECT event_type, motif, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, motif ASC) AS rn
  FROM cnt
)
SELECT event_type, motif AS top_motif, CAST(n AS BIGINT) AS n_occurrences
FROM top WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q353 — WATERMARK-LATENESS audit: before picking a streaming
# watermark delay, replay the batch feed in ARRIVAL order (event_id —
# the ingest sequence) and measure, per event type, how many events
# arrive with event-time older than the per-user high-water mark by
# more than each candidate delay (60 s / 600 s / 3600 s). This is the
# state-loss-vs-latency table `withWatermark` is tuned from (the
# streaming ingest in streamq.py uses exactly these semantics). The
# running max partitions by user_id — the keyed-state shape of the
# real stateful operator — never a global sequential scan.
# --------------------------------------------------------------------------

_WM_DELAYS = (60, 600, 3600)


def q353_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lag = F.coalesce(F.max("es").over(w) - F.col("es"), F.lit(0))
    flags = ev.select(
        "event_type",
        lag.alias("lateness"),
    )
    return flags.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        *[
            F.round(
                F.count_if(F.col("lateness") > d) / F.count(F.lit(1)), 6
            ).alias(f"late_frac_{d}s")
            for d in _WM_DELAYS
        ],
        F.max("lateness").cast("long").alias("max_lateness_s"),
    )


Q353_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), flags AS (
  SELECT event_type,
         COALESCE(MAX(es) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - es,
                  0) AS lateness
  FROM ev
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       {', '.join(f"ROUND(COUNT(*) FILTER (WHERE lateness > {d}) / (1.0 * COUNT(*)), 6) AS late_frac_{d}s" for d in _WM_DELAYS)},
       CAST(MAX(lateness) AS BIGINT) AS max_lateness_s
FROM flags GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q355 — LJUNG-BOX white-noise test per event type: the portmanteau
# statistic Q = n(n+2)·Σ_{k≤7} r_k²/(n−k) over the daily-count ACF
# (q272's recurrence, lags 1–7), vs the χ²₇ 95% critical value
# 14.0671. Q > crit ⇒ the series is NOT white noise (seasonality /
# trend structure worth modeling); a monitoring feed whose Q drops to
# ~χ² expectation lost its weekly signal. r_k is rounded at 6dp
# before squaring so both engines sum identical rationals (the
# ~90-element unrounded float sums are the only cross-engine risk).
# All joins live on the tiny (type, day) grid.
# --------------------------------------------------------------------------

_LB_LAGS = 7
_LB_CRIT = 14.0671  # chi^2_{0.95, 7}


def q355_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = e.groupBy(F.col("event_type"), day.alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    st = daily.groupBy("event_type").agg(
        F.avg("y").alias("mu"),
        (
            F.sum(F.col("y") * F.col("y"))
            - F.sum("y") * F.sum("y") / (F.lit(1.0) * F.count(F.lit(1)))
        ).alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    # Degenerate-series guard (same as q347's sd=0 gate): a constant
    # daily-count series has den=0, where Spark's divide yields NULL but
    # DuckDB float semantics can produce inf/NaN — drop it in BOTH
    # engines before the autocovariance divide.
    ).filter(F.col("den") > 0)
    lags = spark.range(1, _LB_LAGS + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    a, b = daily.alias("a"), daily.alias("b")
    acf = (
        a.join(F.broadcast(lags))
        .join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("lag")),
        )
        .join(st.alias("st"), F.col("a.event_type") == F.col("st.event_type"))
        .groupBy(F.col("a.event_type").alias("event_type"), "lag")
        .agg(
            F.max("n_days").alias("n"),
            F.round(
                F.sum(
                    (F.col("a.y") - F.col("mu"))
                    * (F.col("b.y") - F.col("mu"))
                )
                / F.max("den"),
                6,
            ).alias("r"),
        )
    )
    q = acf.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
        F.round(
            F.max("n") * (F.max("n") + 2)
            * F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))),
            4,
        ).alias("q_stat"),
    )
    return q.select(
        "event_type",
        "n_days",
        "n_lags",
        "q_stat",
        (F.col("q_stat") > _LB_CRIT).alias("reject_white_noise"),
    )


Q355_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, AVG(y) AS mu,
         SUM(y * y) - SUM(y) * SUM(y) / (1.0 * COUNT(*)) AS den,
         COUNT(*) AS n_days
  FROM daily GROUP BY 1
  HAVING SUM(y * y) - SUM(y) * SUM(y) / (1.0 * COUNT(*)) > 0
), lags AS (SELECT unnest(generate_series(1, {_LB_LAGS})) AS lag),
acf AS (
  SELECT a.event_type, lags.lag, MAX(st.n_days) AS n,
         ROUND(SUM((a.y - st.mu) * (b.y - st.mu)) / MAX(st.den), 6) AS r
  FROM daily a
  CROSS JOIN lags
  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + lags.lag
  JOIN st ON st.event_type = a.event_type
  GROUP BY 1, 2
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_lags,
       ROUND(MAX(n) * (MAX(n) + 2)
             * SUM(r * r / (n - lag)), 4) AS q_stat,
       ROUND(MAX(n) * (MAX(n) + 2)
             * SUM(r * r / (n - lag)), 4) > {_LB_CRIT}
         AS reject_white_noise
FROM acf GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q356 — FREEDMAN-DIACONIS bin sizing: the histogram-infrastructure
# audit — for each monitored metric, derive the FD bin width
# 2·IQR/n^(1/3) and the implied bin count from EXACT quartiles
# (inverted-CDF over the integer-cents value histogram — never a
# global sort). Dashboards and drift detectors (q117/q187) consume
# this to keep bin granularity stable as the corpus grows; a bin
# count that jumps an order of magnitude between snapshots means the
# value distribution's tails moved. Integer cents end-to-end until
# the final width division.
# --------------------------------------------------------------------------


def _fd_one(df: DataFrame, metric: str, cents: F.Column) -> DataFrame:
    hist = df.select(cents.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    q1 = cum.filter(F.col("cum") >= F.ceil(F.col("n") * 0.25)).agg(
        F.min("v").alias("q1")
    )
    q3 = cum.filter(F.col("cum") >= F.ceil(F.col("n") * 0.75)).agg(
        F.min("v").alias("q3")
    )
    ext = cum.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.max("n").alias("n"),
    )
    j = ext.crossJoin(F.broadcast(q1)).crossJoin(F.broadcast(q3))
    width = (
        2.0
        * (F.col("q3") - F.col("q1"))
        / F.pow(F.col("n").cast("double"), 1.0 / 3.0)
    )
    return j.select(
        F.lit(metric).alias("metric"),
        F.col("n").cast("long").alias("n"),
        F.col("q1").cast("long").alias("q1_cents"),
        F.col("q3").cast("long").alias("q3_cents"),
        F.round(width, 4).alias("fd_width_cents"),
        F.when(
            F.col("q3") > F.col("q1"),
            F.ceil((F.col("hi") - F.col("lo")) / width).cast("long"),
        ).alias("n_bins"),
    )


def q356_fd_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    a = _fd_one(
        o,
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long"),
    )
    b = _fd_one(
        ev, "event_value", F.round(F.col("value") * 100).cast("long")
    )
    return a.unionByName(b)


def _fd_sql(metric: str) -> str:
    return f"""
SELECT '{metric}' AS metric, CAST(MAX(n) AS BIGINT) AS n,
       CAST((SELECT MIN(v) FROM cum_{metric}
             WHERE cum >= ceil(n * 0.25)) AS BIGINT) AS q1_cents,
       CAST((SELECT MIN(v) FROM cum_{metric}
             WHERE cum >= ceil(n * 0.75)) AS BIGINT) AS q3_cents,
       ROUND(2.0 * ((SELECT MIN(v) FROM cum_{metric} WHERE cum >= ceil(n * 0.75))
                    - (SELECT MIN(v) FROM cum_{metric} WHERE cum >= ceil(n * 0.25)))
             / pow(MAX(n), 1.0 / 3.0), 4) AS fd_width_cents,
       CASE WHEN (SELECT MIN(v) FROM cum_{metric} WHERE cum >= ceil(n * 0.75))
                 > (SELECT MIN(v) FROM cum_{metric} WHERE cum >= ceil(n * 0.25))
       THEN CAST(ceil((MAX(v) - MIN(v))
            / (2.0 * ((SELECT MIN(v) FROM cum_{metric} WHERE cum >= ceil(n * 0.75))
                      - (SELECT MIN(v) FROM cum_{metric} WHERE cum >= ceil(n * 0.25)))
               / pow(MAX(n), 1.0 / 3.0))) AS BIGINT)
       END AS n_bins
FROM cum_{metric}
"""


Q356_SQL = f"""
WITH h_o_totalprice AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, COUNT(*) AS c
  FROM orders GROUP BY 1
), cum_o_totalprice AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n
  FROM h_o_totalprice
), h_event_value AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v, COUNT(*) AS c
  FROM events GROUP BY 1
), cum_event_value AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n
  FROM h_event_value
)
{_fd_sql('o_totalprice')}
UNION ALL
{_fd_sql('event_value')}
"""


# --------------------------------------------------------------------------
# q357 — BINARY-SEGMENTATION changepoint (one split) per event type:
# the level-shift locator that complements CUSUM (q265) and
# Page-Hinkley (q299) — for every candidate split of the daily-count
# series, the SSE reduction (total within-SS minus left+right
# within-SS) from prefix sums; the best split is the changepoint a
# full binseg recursion would take first. Prefix sums are windows
# PARTITIONED BY TYPE over the tiny day grid; sums are exact integer
# arithmetic until the final variance divisions, so both engines
# score splits identically. The argmax is a per-type rank window,
# never global.
# --------------------------------------------------------------------------


def q357_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = e.groupBy(F.col("event_type"), day.alias("d")).agg(
        F.count(F.lit(1)).alias("y")
    )
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("d")
    cum = daily.select(
        "event_type",
        "d",
        F.row_number().over(wo).alias("i"),
        F.sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "ci"
        ),
        F.sum(F.col("y") * F.col("y"))
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("qi"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("y").over(wt).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wt).alias("q"),
    )
    # q180 lesson: square in double — s² on a 10¹²-event feed would
    # overflow int64 (ANSI Spark throws, DuckDB promotes — divergence)
    s_d = F.col("s").cast("double")
    ci_d = F.col("ci").cast("double")
    sst = F.col("q") - s_d * s_d / F.col("n")
    ssl = F.col("qi") - ci_d * ci_d / F.col("i")
    ssr = (F.col("q") - F.col("qi")) - (s_d - ci_d) * (
        s_d - ci_d
    ) / (F.col("n") - F.col("i"))
    scored = cum.filter(F.col("i") < F.col("n")).select(
        "event_type",
        "d",
        F.col("n").cast("long").alias("n_days"),
        F.round(sst, 4).alias("sse_total"),
        F.round(sst - ssl - ssr, 4).alias("sse_reduction"),
    )
    top = Window.partitionBy("event_type").orderBy(
        F.col("sse_reduction").desc(), F.col("d").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_days",
            F.col("d").alias("split_day"),
            "sse_total",
            "sse_reduction",
        )
    )


Q357_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
         SUM(y) OVER (PARTITION BY event_type ORDER BY d) AS ci,
         SUM(y * y) OVER (PARTITION BY event_type ORDER BY d) AS qi,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(y) OVER (PARTITION BY event_type) AS s,
         SUM(y * y) OVER (PARTITION BY event_type) AS q
  FROM daily
), scored AS (
  SELECT event_type, d, n,
         ROUND(q - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 4)
           AS sse_total,
         ROUND((q - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
               - (qi - CAST(ci AS DOUBLE) * CAST(ci AS DOUBLE) / i)
               - ((q - qi) - (CAST(s AS DOUBLE) - CAST(ci AS DOUBLE))
                  * (CAST(s AS DOUBLE) - CAST(ci AS DOUBLE)) / (n - i)),
               4) AS sse_reduction
  FROM cum WHERE i < n
), top AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY sse_reduction DESC, d ASC) AS rn
  FROM scored
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, d AS split_day,
       sse_total, sse_reduction
FROM top WHERE rn = 1
"""


QUERIES = {
    "q357_binseg_changepoint": q357_binseg_changepoint,
    "q355_ljung_box": q355_ljung_box,
    "q356_fd_bins": q356_fd_bins,
    "q353_lateness_audit": q353_lateness_audit,
    "q347_sax_motifs": q347_sax_motifs,
    "q332_newey_west": q332_newey_west,
    "q330_wasserstein_drift": q330_wasserstein_drift,
    "q331_circular_diurnal": q331_circular_diurnal,
    "q327_weibull_fit": q327_weibull_fit,
    "q325_temporal_leakage": q325_temporal_leakage,
    "q316_mann_whitney": q316_mann_whitney,
    "q317_kruskal_wallis": q317_kruskal_wallis,
    "q318_brown_forsythe": q318_brown_forsythe,
    "q289_isotonic": q289_isotonic,
    "q310_conformal_interval": q310_conformal_interval,
    "q311_mmd_rff": q311_mmd_rff,
    "q312_smd_balance": q312_smd_balance,
    "q307_hill_tail_index": q307_hill_tail_index,
    "q308_atkinson_index": q308_atkinson_index,
    "q309_gumbel_evt": q309_gumbel_evt,
    "q304_t_closeness": q304_t_closeness,
    "q305_stl_strength": q305_stl_strength,
    "q306_dedup_yield_curve": q306_dedup_yield_curve,
    "q301_cramers_v": q301_cramers_v,
    "q302_g_test": q302_g_test,
    "q303_theil_inequality": q303_theil_inequality,
    "q298_holt_winters": q298_holt_winters,
    "q299_page_hinkley": q299_page_hinkley,
    "q300_yule_walker": q300_yule_walker,
    "q295_holt_linear": q295_holt_linear,
    "q296_negbin_fit": q296_negbin_fit,
    "q297_tost_equivalence": q297_tost_equivalence,
    "q292_ams_f2": q292_ams_f2,
    "q293_l_diversity": q293_l_diversity,
    "q294_dp_histogram": q294_dp_histogram,
    "q290_ipw_ate": q290_ipw_ate,
    "q291_power_mde": q291_power_mde,
    "q287_kleinberg_burst": q287_kleinberg_burst,
    "q284_markov_attribution": q284_markov_attribution,
    "q285_hhi": q285_hhi,
    "q281_msprt": q281_msprt,
    "q282_pacf": q282_pacf,
    "q274_logrank": q274_logrank,
    "q275_ratio_jackknife": q275_ratio_jackknife,
    "q276_cochran_armitage": q276_cochran_armitage,
    "q272_acf": q272_acf,
    "q273_gmm_em": q273_gmm_em,
    "q268_median_ci": q268_median_ci,
    "q269_adaptive_sessions": q269_adaptive_sessions,
    "q264_mann_kendall": q264_mann_kendall,
    "q265_cusum_changepoint": q265_cusum_changepoint,
    "q261_pinball_loss": q261_pinball_loss,
    "q258_diff_in_diff": q258_diff_in_diff,
    "q254_winsorized_stats": q254_winsorized_stats,
    "q255_bh_fdr": q255_bh_fdr,
    "q250_kaplan_meier": q250_kaplan_meier,
    "q252_eb_shrinkage": q252_eb_shrinkage,
    "q248_cuped": q248_cuped,
    "q249_theil_sen": q249_theil_sen,
    "q235_fd_violations": q235_fd_violations,
    "q230_poisson_bootstrap": q230_poisson_bootstrap,
    "q222_k_anonymity": q222_k_anonymity,
    "q224_temporal_reach": q224_temporal_reach,
    "q211_max_concurrency": q211_max_concurrency,
    "q214_entropy_rate": q214_entropy_rate,
    "q213_interval_union": q213_interval_union,
    "q205_velocity_flags": q205_velocity_flags,
    "q206_activity_bitmask": q206_activity_bitmask,
    "q198_naive_forecast_error": q198_naive_forecast_error,
    "q199_cohens_d": q199_cohens_d,
    "q196_delta_decomposition": q196_delta_decomposition,
    "q194_absorption_prob": q194_absorption_prob,
    "q195_longest_streak": q195_longest_streak,
    "q188_tukey_fences": q188_tukey_fences,
    "q189_decayed_engagement": q189_decayed_engagement,
    "q185_lag_features": q185_lag_features,
    "q187_psi": q187_psi,
    "q182_burstiness": q182_burstiness,
    "q183_js_divergence": q183_js_divergence,
    "q184_topk_with_other": q184_topk_with_other,
    "q180_spearman": q180_spearman,
    "q175_largest_remainder_alloc": q175_largest_remainder_alloc,
    "q177_wilson_interval": q177_wilson_interval,
    "q172_rfm_scores": q172_rfm_scores,
    "q173_share_of_parent": q173_share_of_parent,
    "q169_stl_decompose": q169_stl_decompose,
    "q164_markov_stationary": q164_markov_stationary,
    "q165_grid_smooth": q165_grid_smooth,
    "q161_funnel3_chained": q161_funnel3_chained,
    "q162_multigrain_rollup": q162_multigrain_rollup,
    "q163_seasonal_anomaly": q163_seasonal_anomaly,
    "q108_regr_ols": q108_regr_ols,
    "q113_ewma": q113_ewma,
    "q114_assoc_rules": q114_assoc_rules,
    "q116_linear_interp": q116_linear_interp,
    "q117_chi2_drift": q117_chi2_drift,
    "q120_ks_drift": q120_ks_drift,
    "q131_ab_ztest": q131_ab_ztest,
    "q132_histogram": q132_histogram,
    "q133_gini": q133_gini,
    "q138_ar1": q138_ar1,
    "q139_seasonality": q139_seasonality,
    "q141_interarrival": q141_interarrival,
    "q142_pareto_point": q142_pareto_point,
    "q143_rolling_corr": q143_rolling_corr,
    "q146_anova": q146_anova,
    "q147_benford": q147_benford,
    "q150_conversion_latency": q150_conversion_latency,
    "q99_gapfill_locf": q99_gapfill_locf,
    "q100_range_join": q100_range_join,
    "q101_chunk_containment": q101_chunk_containment,
    "q103_full_outer_reconcile": q103_full_outer_reconcile,
    "q104_incremental_agg": q104_incremental_agg,
    "q105_robust_zscore": q105_robust_zscore,
    "q106_weighted_quantiles": q106_weighted_quantiles,
    "q107_time_weighted_avg": q107_time_weighted_avg,
}

ORACLES = {
    "q357_binseg_changepoint": Q357_SQL,
    "q355_ljung_box": Q355_SQL,
    "q356_fd_bins": Q356_SQL,
    "q353_lateness_audit": Q353_SQL,
    "q347_sax_motifs": Q347_SQL,
    "q332_newey_west": Q332_SQL,
    "q330_wasserstein_drift": Q330_SQL,
    "q331_circular_diurnal": Q331_SQL,
    "q327_weibull_fit": Q327_SQL,
    "q325_temporal_leakage": Q325_SQL,
    "q316_mann_whitney": Q316_SQL,
    "q317_kruskal_wallis": Q317_SQL,
    "q318_brown_forsythe": Q318_SQL,
    "q310_conformal_interval": Q310_SQL,
    "q311_mmd_rff": Q311_SQL,
    "q312_smd_balance": Q312_SQL,
    "q307_hill_tail_index": Q307_SQL,
    "q308_atkinson_index": Q308_SQL,
    "q309_gumbel_evt": Q309_SQL,
    "q304_t_closeness": Q304_SQL,
    "q305_stl_strength": Q305_SQL,
    "q306_dedup_yield_curve": Q306_SQL,
    "q301_cramers_v": Q301_SQL,
    "q302_g_test": Q302_SQL,
    "q303_theil_inequality": Q303_SQL,
    "q298_holt_winters": Q298_SQL,
    "q299_page_hinkley": Q299_SQL,
    "q300_yule_walker": Q300_SQL,
    "q289_isotonic": Q289_SQL,
    "q295_holt_linear": Q295_SQL,
    "q296_negbin_fit": Q296_SQL,
    "q297_tost_equivalence": Q297_SQL,
    "q292_ams_f2": Q292_SQL,
    "q293_l_diversity": Q293_SQL,
    "q294_dp_histogram": Q294_SQL,
    "q290_ipw_ate": Q290_SQL,
    "q291_power_mde": Q291_SQL,
    "q287_kleinberg_burst": _q287_sql(),
    "q284_markov_attribution": _q284_sql(),
    "q285_hhi": Q285_SQL,
    "q281_msprt": Q281_SQL,
    "q282_pacf": Q282_SQL,
    "q274_logrank": Q274_SQL,
    "q275_ratio_jackknife": Q275_SQL,
    "q276_cochran_armitage": Q276_SQL,
    "q272_acf": Q272_SQL,
    "q273_gmm_em": _q273_sql(),
    "q268_median_ci": Q268_SQL,
    "q269_adaptive_sessions": Q269_SQL,
    "q264_mann_kendall": Q264_SQL,
    "q265_cusum_changepoint": Q265_SQL,
    "q261_pinball_loss": _q261_sql(),
    "q258_diff_in_diff": Q258_SQL,
    "q254_winsorized_stats": Q254_SQL,
    "q255_bh_fdr": Q255_SQL,
    "q250_kaplan_meier": Q250_SQL,
    "q252_eb_shrinkage": Q252_SQL,
    "q248_cuped": Q248_SQL,
    "q249_theil_sen": Q249_SQL,
    "q235_fd_violations": _q235_sql(),
    "q230_poisson_bootstrap": Q230_SQL,
    "q222_k_anonymity": Q222_SQL,
    "q224_temporal_reach": Q224_SQL,
    "q211_max_concurrency": Q211_SQL,
    "q213_interval_union": Q213_SQL,
    "q214_entropy_rate": _q214_sql(),
    "q205_velocity_flags": Q205_SQL,
    "q206_activity_bitmask": _q206_sql(),
    "q196_delta_decomposition": Q196_SQL,
    "q198_naive_forecast_error": Q198_SQL,
    "q199_cohens_d": Q199_SQL,
    "q194_absorption_prob": _q194_sql(),
    "q195_longest_streak": Q195_SQL,
    "q188_tukey_fences": Q188_SQL,
    "q189_decayed_engagement": Q189_SQL,
    "q185_lag_features": Q185_SQL,
    "q187_psi": Q187_SQL,
    "q182_burstiness": Q182_SQL,
    "q183_js_divergence": Q183_SQL,
    "q184_topk_with_other": Q184_SQL,
    "q180_spearman": Q180_SQL,
    "q175_largest_remainder_alloc": Q175_SQL,
    "q177_wilson_interval": Q177_SQL,
    "q172_rfm_scores": Q172_SQL,
    "q173_share_of_parent": Q173_SQL,
    "q169_stl_decompose": Q169_SQL,
    "q164_markov_stationary": _q164_sql(),
    "q165_grid_smooth": Q165_SQL,
    "q161_funnel3_chained": Q161_SQL,
    "q162_multigrain_rollup": Q162_SQL,
    "q163_seasonal_anomaly": Q163_SQL,
    "q108_regr_ols": Q108_SQL,
    "q113_ewma": Q113_SQL,
    "q114_assoc_rules": Q114_SQL,
    "q116_linear_interp": Q116_SQL,
    "q117_chi2_drift": Q117_SQL,
    "q120_ks_drift": Q120_SQL,
    "q131_ab_ztest": Q131_SQL,
    "q132_histogram": Q132_SQL,
    "q133_gini": Q133_SQL,
    "q138_ar1": Q138_SQL,
    "q139_seasonality": Q139_SQL,
    "q141_interarrival": Q141_SQL,
    "q142_pareto_point": Q142_SQL,
    "q143_rolling_corr": Q143_SQL,
    "q146_anova": Q146_SQL,
    "q147_benford": Q147_SQL,
    "q150_conversion_latency": Q150_SQL,
    "q99_gapfill_locf": Q99_SQL,
    "q100_range_join": Q100_SQL,
    "q101_chunk_containment": Q101_SQL,
    "q103_full_outer_reconcile": Q103_SQL,
    "q104_incremental_agg": Q104_SQL,
    "q105_robust_zscore": Q105_SQL,
    "q106_weighted_quantiles": Q106_SQL,
    "q107_time_weighted_avg": Q107_SQL,
}
