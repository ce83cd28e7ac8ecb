"""Model-evaluation and ranking operators for the training-data
pipeline: the stages that sit between "corpus is clean" (textops,
pipelineops) and "model is trained" — label-quality evaluation, simple
learned filters, term statistics, and retrieval scoring.

* q151 — AUC (Mann-Whitney) of a scalar score against a binary label,
  computed from grouped score counts so no global row-level sort is
  needed: group by score value (map-side partial agg does the heavy
  lifting), then one small window over the distinct-score table. All
  arithmetic is integer until the final division — exact.
* q152 — decision-stump induction: best single threshold on a numeric
  feature by weighted Gini impurity. Candidate thresholds are the
  distinct feature values, evaluated in one pass with cumulative
  windows over the (tiny) per-value contingency table.
* q153 — PMI co-occurrence of token pairs within documents. The
  doc-level self-join runs on per-document DISTINCT token sets, and a
  document-frequency floor prunes rare tokens before the join (the
  same hot-key discipline as q27's df-pruned n-gram join).
* q154 — skyline / Pareto frontier (maximize price AND recency) via
  two RANGE-frame windows instead of the quadratic dominance
  anti-join: a point is dominated iff some strictly-higher-price point
  is at least as recent, or an equal-price point is strictly more
  recent. One sort replaces O(n²) pairs.
* q155 — ridge regression (closed form, 2 features, λ=1) from five
  sufficient statistics: the normal equations are solved by Cramer's
  rule on aggregates, so the "training" is a single map-side-combined
  aggregation — no iteration, no driver-side math.
* q156 — inverted-index postings: token → document frequency + the
  first 10 posting doc_ids. The array is built sorted so the rendering
  is order-portable across engines.
* q157 — BM25 (k1=1.2, b=0.75) retrieval scoring for a fixed query
  against the corpus, assembled from the same tf/df/dl statistics an
  index build materializes; top-15 with rounded-score tie-breaks.

Every query has a DuckDB oracle twin. Determinism notes: integer
arithmetic wherever a comparison or rank depends on it; doubles only
flow into rendered columns (r4/r6) or into orderings where both engines
evaluate the identical expression on identical inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .common import TOKENS_SQL, exact_ntile, histogram_rank, load, tokens

# --------------------------------------------------------------------------
# q151 — AUC of score = first embedding component predicting the binary
# label (label < 5). Mann-Whitney formulation over grouped scores:
#   AUC = [ Σ_s pos_s · cumneg(<s) + ½ Σ_s pos_s · neg_s ] / (np·nn)
# doubled through to keep every term integral; ties get the ½ credit
# exactly. The window runs over DISTINCT scores (the aggregated table),
# not rows — at 100 TB the row-level work is one partial-agg shuffle on
# the score value; the cumulative window sees only the value histogram.
# --------------------------------------------------------------------------


def q151_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        F.element_at(F.col("embedding"), 1).cast("double").alias("s"),
        F.when(F.col("label") < 5, 1).otherwise(0).cast("long").alias("y"),
    )
    g = e.groupBy("s").agg(
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn("cumneg", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    out = g.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            2 * F.col("pos") * F.col("cumneg") + F.col("pos") * F.col("neg")
        ).alias("num2"),
    )
    return out.select(
        "n_pos",
        "n_neg",
        # try_divide: a one-class corpus has n_pos·n_neg = 0 (DuckDB:
        # NULL AUC — deg_one sweep)
        F.round(
            F.try_divide(
                F.col("num2"), 2.0 * F.col("n_pos") * F.col("n_neg")
            ),
            6,
        ).alias("auc"),
    )


Q151_SQL = """
WITH e AS (
  SELECT CAST(embedding[1] AS DOUBLE) AS s,
         CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
  FROM embeddings
), g AS (
  SELECT s, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
  FROM e GROUP BY s
), c AS (
  SELECT s, pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
  FROM g
)
SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(neg) AS BIGINT) AS n_neg,
       ROUND(SUM(2 * pos * cumneg + pos * neg)
             / (2.0 * SUM(pos) * SUM(neg)), 6) AS auc
FROM c
"""


# --------------------------------------------------------------------------
# q152 — decision stump: best n_chars threshold predicting lang='en'.
# Per distinct feature value v: contingency (pos, neg); cumulative sums
# give the left partition for threshold t = v ("go left if x ≤ t").
# Weighted Gini is assembled from integers:
#   nL·giniL = (nL² − l1² − l0²)/nL   (and symmetrically for the right)
# so both engines divide identical integers — identical doubles —
# making the argmin ordering engine-portable; ties break to the
# smallest threshold. The windows run over the distinct-value table
# (313 values here; bounded by feature cardinality at any scale).
# --------------------------------------------------------------------------


def q152_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )
    g = d.groupBy("x").agg(
        F.sum("y").alias("p"),
        (F.count(F.lit(1)) - F.sum("y")).alias("q"),
    )
    cum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = (
        g.withColumn("l1", F.sum("p").over(cum))
        .withColumn("l0", F.sum("q").over(cum))
        .withColumn("tp", F.sum("p").over(tot))
        .withColumn("tq", F.sum("q").over(tot))
    )
    nl = F.col("l1") + F.col("l0")
    r1 = F.col("tp") - F.col("l1")
    r0 = F.col("tq") - F.col("l0")
    nr = r1 + r0
    n = F.col("tp") + F.col("tq")
    wg = (
        (nl * nl - F.col("l1") * F.col("l1") - F.col("l0") * F.col("l0")) / nl
        + (nr * nr - r1 * r1 - r0 * r0) / nr
    ) / n
    parent = (
        n * n - F.col("tp") * F.col("tp") - F.col("tq") * F.col("tq")
    ) / (n * n)
    best = (
        g.filter(nr > 0)
        .select(
            F.col("x").alias("threshold"),
            nl.cast("long").alias("n_left"),
            nr.cast("long").alias("n_right"),
            F.col("l1").cast("long").alias("pos_left"),
            r1.cast("long").alias("pos_right"),
            wg.alias("_wg"),
            F.round(parent - wg, 6).alias("gini_gain"),
        )
        .orderBy("_wg", "threshold")
        .limit(1)
    )
    return best.drop("_wg")


Q152_SQL = """
WITH d AS (
  SELECT n_chars AS x, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), g AS (
  SELECT x, SUM(y) AS p, COUNT(*) - SUM(y) AS q FROM d GROUP BY x
), c AS (
  SELECT x,
         SUM(p) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS l1,
         SUM(q) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS l0,
         SUM(p) OVER () AS tp, SUM(q) OVER () AS tq
  FROM g
), s AS (
  SELECT x, l1, l0, tp, tq,
         l1 + l0 AS nl, (tp - l1) + (tq - l0) AS nr,
         tp - l1 AS r1, tq - l0 AS r0, tp + tq AS n
  FROM c
)
SELECT x AS threshold,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right,
       CAST(l1 AS BIGINT) AS pos_left,
       CAST(r1 AS BIGINT) AS pos_right,
       ROUND((n*n - tp*tp - tq*tq) / (1.0*n*n)
             - ((nl*nl - l1*l1 - l0*l0) / (1.0*nl)
                + (nr*nr - r1*r1 - r0*r0) / (1.0*nr)) / n, 6) AS gini_gain
FROM s
WHERE nr > 0
ORDER BY ((nl*nl - l1*l1 - l0*l0) / (1.0*nl)
          + (nr*nr - r1*r1 - r0*r0) / (1.0*nr)) / n, x
LIMIT 1
"""


# --------------------------------------------------------------------------
# q153 — PMI of token pairs co-occurring in a document. Document-level
# DISTINCT token sets (one explode + dedup), df floor of 25 before the
# self-join (prunes the long tail exactly like q27's gram pruning — at
# 100 TB the floor is what bounds the per-document pair fan-out), pair
# floor of 5 after. PMI = ln(N·c_ab / (c_a·c_b)); integer counts, one
# log at render time, rounded-score ordering with lexicographic
# tie-break.
# --------------------------------------------------------------------------

_PMI_MIN_DF = 25
_PMI_MIN_PAIR = 5


def q153_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .distinct()
    )
    df = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _PMI_MIN_DF)
    )
    dt = dt.join(F.broadcast(df), "tok").select("doc_id", "tok", "df")
    a = dt.select(
        "doc_id",
        F.col("tok").alias("tok_a"),
        F.col("df").alias("df_a"),
    )
    b = dt.select(
        "doc_id",
        F.col("tok").alias("tok_b"),
        F.col("df").alias("df_b"),
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_PAIR)
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    scored = pairs.crossJoin(F.broadcast(n_docs)).select(
        "tok_a",
        "tok_b",
        F.col("c_ab").cast("long").alias("c_ab"),
        F.round(
            F.log(
                F.col("n_docs")
                * F.col("c_ab")
                / (F.col("df_a") * F.col("df_b"))
            ),
            6,
        ).alias("pmi"),
    )
    return scored.orderBy(
        F.desc("pmi"), "tok_a", "tok_b"
    ).limit(20)


Q153_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
), df AS (
  SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok
  HAVING COUNT(*) >= {_PMI_MIN_DF}
), dd AS (
  SELECT dt.doc_id, dt.tok, df.df FROM dt JOIN df USING (tok)
), pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a, b.df AS df_b,
         COUNT(*) AS c_ab
  FROM dd a JOIN dd b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= {_PMI_MIN_PAIR}
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab,
       ROUND(ln(n.n_docs * c_ab / (1.0 * df_a * df_b)), 6) AS pmi
FROM pairs, n
ORDER BY pmi DESC, tok_a, tok_b
LIMIT 20
"""


# --------------------------------------------------------------------------
# q154 — skyline (Pareto frontier) of orders maximizing (price,
# recency). Dominance via two RANGE windows on integer cents:
#   dominated ⇔ max(es | cents' > cents) ≥ es  OR  max(es | cents' =
#   cents) > es
# The dominance test only needs per-value aggregates, so the scale form
# pre-aggregates max(es) per cents value and runs the suffix-max window
# over that VALUE HISTOGRAM (one row per distinct price), never over the
# raw order rows — then joins the (me, ma) pair back by price. No
# unpartitioned window touches row-cardinality data.
# --------------------------------------------------------------------------


def q154_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("o_orderdate").cast("timestamp_ltz").cast("long").alias("es"),
    )
    h = o.groupBy("price_cents").agg(F.max("es").alias("me"))
    w_above = Window.orderBy("price_cents").rangeBetween(
        1, Window.unboundedFollowing
    )
    h = h.withColumn("ma", F.max("me").over(w_above))
    o = o.join(h, "price_cents")
    dominated = (F.col("ma").isNotNull() & (F.col("ma") >= F.col("es"))) | (
        F.col("me") > F.col("es")
    )
    return (
        o.filter(~dominated)
        .select("o_orderkey", "price_cents", "es")
    )


Q154_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS es
  FROM orders
), w AS (
  SELECT o_orderkey, price_cents, es,
         MAX(es) OVER (ORDER BY price_cents
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ma,
         MAX(es) OVER (PARTITION BY price_cents) AS me
  FROM o
)
SELECT o_orderkey, price_cents, es
FROM w
WHERE NOT ((ma IS NOT NULL AND ma >= es) OR me > es)
"""


# --------------------------------------------------------------------------
# q155 — ridge regression, closed form: value ~ a·hour + b·dow with
# λ=1. Five sufficient statistics in one map-side-combined aggregation;
# Cramer's rule solves the 2×2 ridge system. Feature moments (s11, s12,
# s22) are pure integer sums — exact; the y cross-moments are double
# sums whose cross-engine ulp drift is ~1e-11 relative, invisible at
# the 6dp rendering of O(1) coefficients.
# --------------------------------------------------------------------------

_RIDGE_LAMBDA = 1.0


def q155_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        F.floor((es % 86400) / F.lit(3600)).cast("long").alias("x1"),
        ((F.floor(es / 86400) + 4) % 7).cast("long").alias("x2"),
        F.col("value").cast("double").alias("y"),
    )
    s = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    lam = F.lit(_RIDGE_LAMBDA)
    det = (F.col("s11") + lam) * (F.col("s22") + lam) - F.col("s12") * F.col(
        "s12"
    )
    a = (
        F.col("s1y") * (F.col("s22") + lam) - F.col("s2y") * F.col("s12")
    ) / det
    b = (
        (F.col("s11") + lam) * F.col("s2y") - F.col("s12") * F.col("s1y")
    ) / det
    return s.select(
        "n",
        F.round(a, 6).alias("coef_hour"),
        F.round(b, 6).alias("coef_dow"),
    )


Q155_SQL = f"""
WITH ev AS (
  SELECT CAST((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600
              AS BIGINT) AS x1,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7
              AS BIGINT) AS x2,
         CAST(value AS DOUBLE) AS y
  FROM events
), s AS (
  SELECT COUNT(*) AS n,
         SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
         SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y
  FROM ev
)
SELECT CAST(n AS BIGINT) AS n,
       ROUND((s1y * (s22 + {_RIDGE_LAMBDA}) - s2y * s12)
             / ((s11 + {_RIDGE_LAMBDA}) * (s22 + {_RIDGE_LAMBDA})
                - s12 * s12), 6) AS coef_hour,
       ROUND(((s11 + {_RIDGE_LAMBDA}) * s2y - s12 * s1y)
             / ((s11 + {_RIDGE_LAMBDA}) * (s22 + {_RIDGE_LAMBDA})
                - s12 * s12), 6) AS coef_dow
FROM s
"""


# --------------------------------------------------------------------------
# q156 — inverted-index postings: per token, document frequency and the
# first 10 posting doc_ids in ascending order. The postings array is
# sorted before slicing so the rendering is order-portable; df bounds
# (25 ≤ df) keep the output to index-worthy terms. At 100 TB the
# posting-list build is the canonical one-shuffle groupBy; the slice
# caps per-key memory (full lists would need the positional-delta
# encoding an index sink applies).
# --------------------------------------------------------------------------


def q156_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    dt = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    return (
        dt.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, 10
            ).alias("postings10"),
        )
        .filter(F.col("df") >= _PMI_MIN_DF)
    )


Q156_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
       (list(doc_id ORDER BY doc_id))[1:10] AS postings10
FROM dt GROUP BY tok
HAVING COUNT(*) >= {_PMI_MIN_DF}
"""


# --------------------------------------------------------------------------
# q157 — BM25 (k1=1.2, b=0.75) for a fixed 3-term query. tf/dl come
# from one token aggregation, df and avgdl from broadcastable rollups;
# idf uses the standard +1 smoothing so it is always positive. The
# query terms are a 3-row broadcast dimension — the corpus-side scan
# stays pruned to matching tokens. Top-15 orders by the ROUNDED score
# (ulp-stable) with doc_id tie-break.
# --------------------------------------------------------------------------

_BM25_QUERY = ("data", "model", "learning")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q157_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    j = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1.0) / denom
    scored = j.groupBy("doc_id").agg(
        F.round(F.sum(contrib), 6).alias("bm25"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(15)


_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_QUERY)

Q157_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok
), j AS (
  SELECT tf.doc_id, tf.tf, df.df, dl.dl, stats.n_docs, stats.avgdl
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
)
SELECT doc_id,
       ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                 * tf * ({_BM25_K1} + 1.0)
                 / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl / avgdl))), 6) AS bm25,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM j GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 15
"""


# --------------------------------------------------------------------------
# q171 — grouped OLS via applyInPandas: per event type, the slope and
# intercept of value vs day, fitted inside an Arrow-batched pandas
# function (one group per call — the "model per key" pattern a
# per-domain calibration or per-tenant forecast stage uses). Days are
# centered per group IN THE PLAN (JVM-side) so the UDF sees small
# integers; the oracle states the identical closed form over the same
# centered sums. numpy's pairwise summation and DuckDB's sequential
# fold differ at ~1e-16 relative — far below the 6dp rendering of
# O(1)-magnitude coefficients.
# --------------------------------------------------------------------------


def _ols_group(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["x"].to_numpy("float64")
    y = pdf["v"].to_numpy("float64")
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [int(n)],
            "slope": [round(slope, 6)],
            "intercept": [round((sy - slope * sx) / n, 6)],
        }
    )


def q171_grouped_ols_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(es / 86400).cast("long").alias("day"),
        F.col("value").cast("double").alias("v"),
    )
    w = Window.partitionBy("event_type")
    centered = ev.select(
        "event_type",
        (F.col("day") - F.min("day").over(w)).alias("x"),
        "v",
    )
    return centered.groupBy("event_type").applyInPandas(
        _ols_group, "event_type string, n long, slope double, intercept double"
    )


Q171_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(value AS DOUBLE) AS v
  FROM events
), c AS (
  SELECT event_type,
         day - MIN(day) OVER (PARTITION BY event_type) AS x, v
  FROM ev
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(v) AS sy,
         SUM(x * v) AS sxy, SUM(x * x) AS sxx
  FROM c GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept
FROM s
"""


# --------------------------------------------------------------------------
# q174 — cogrouped reconciliation via cogroup().applyInPandas: the
# orders ledger and the event stream meet per user in one Arrow call
# that sees BOTH sides' rows (the cross-system audit shape — neither a
# join nor two independent aggregates). Keys from either side appear
# (cogroup semantics = full outer); every output is an integer count
# or cents sum, so the full-outer-join oracle matches exactly.
# --------------------------------------------------------------------------


def _reconcile(key, odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_orders": [len(odf)],
            "order_cents": [int(odf["cents"].sum()) if len(odf) else 0],
            "n_events": [len(edf)],
            "n_purchases": [
                int((edf["event_type"] == "purchase").sum()) if len(edf) else 0
            ],
        }
    )


def q174_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "event_type"
    )
    return (
        orders.groupBy("uid")
        .cogroup(events.groupBy("uid"))
        .applyInPandas(
            _reconcile,
            "user_id long, n_orders long, order_cents long, "
            "n_events long, n_purchases long",
        )
    )


Q174_SQL = """
WITH o AS (
  SELECT o_custkey AS uid, COUNT(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS order_cents
  FROM orders GROUP BY 1
), e AS (
  SELECT user_id AS uid, COUNT(*) AS n_events,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
  FROM events GROUP BY 1
)
SELECT COALESCE(o.uid, e.uid) AS user_id,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(o.order_cents, 0) AS BIGINT) AS order_cents,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(e.n_purchases, 0) AS BIGINT) AS n_purchases
FROM o FULL OUTER JOIN e ON o.uid = e.uid
"""


# --------------------------------------------------------------------------
# q178 — grouped-aggregate pandas UDF (Series → scalar): geometric mean
# of event value per type. This is the third Arrow API shape the
# surface exercises (after grouped-map q171 and cogroup q174) — a
# custom UDAF that Catalyst plans as a first-class aggregate. The
# oracle is exp(avg(ln x)); numpy's vectorized log/pairwise mean and
# DuckDB's scalar fold differ at ~1e-15 relative, far under the 6dp
# render. Values are strictly positive in this feed (min 0.01).
# --------------------------------------------------------------------------


@pandas_udf(DoubleType())
def _geomean(v: pd.Series) -> float:
    # DataType object, not a string: module-level string return types
    # parse via the active session and crash before one exists
    return float(np.exp(np.log(v.to_numpy("float64")).mean()))


def q178_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    # Spark disallows mixing a group-agg pandas UDF with built-in
    # aggregates in one agg() — the count comes from a sibling agg
    # joined back on the (tiny) group key. The geometric mean is
    # defined over the POSITIVE values only (ln(0) is an error in
    # DuckDB and -inf in numpy — zeros appear from sf0.1 up); n stays
    # the full group count.
    geo = ev.filter(F.col("v") > 0).groupBy("event_type").agg(
        F.round(_geomean(F.col("v")), 6).alias("geo_mean")
    )
    cnt = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return cnt.join(geo, "event_type", "left").select(
        "event_type", "n", "geo_mean"
    )


Q178_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(exp(AVG(CASE WHEN value > 0
                          THEN ln(CAST(value AS DOUBLE)) END)), 6)
         AS geo_mean
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q193 — Cohen's kappa between two labelers: the quality model's keep
# decision (score > 0.45) vs the lang='en' pseudo-label — the
# chance-corrected agreement statistic an annotation-QA stage reports.
# Reuses q81's `_quality_score` verbatim (q167's discipline). The 2×2
# contingency is integer; kappa = (p_o − p_e)/(1 − p_e) divides
# identical doubles, rendered at 6dp. The 0.45 threshold carries the
# same (negligible) libm edge exposure as q81's 0.5 gate.
# --------------------------------------------------------------------------

_KAPPA_THRESH = 0.45


def q193_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelineops import _quality_score

    d = (
        load(spark, sf_dir, "documents")
        .select("lang", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    r = d.select(
        (_quality_score(F.col("t")) > _KAPPA_THRESH).alias("ra"),
        (F.col("lang") == "en").alias("rb"),
    )
    c = r.agg(
        F.count_if(F.col("ra") & F.col("rb")).alias("a"),
        F.count_if(F.col("ra") & ~F.col("rb")).alias("b"),
        F.count_if(~F.col("ra") & F.col("rb")).alias("c"),
        F.count_if(~F.col("ra") & ~F.col("rb")).alias("d"),
    )
    # try_divide throughout: an empty corpus (n = 0) or perfect chance
    # agreement (pe = 1) must render NULL, as DuckDB's x/0 does
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    po = F.try_divide(F.col("a") + F.col("d"), n)
    pe = F.try_divide(
        (F.col("a") + F.col("b")) * (F.col("a") + F.col("c"))
        + (F.col("c") + F.col("d")) * (F.col("b") + F.col("d")),
        n * n,
    )
    return c.select(
        n.cast("long").alias("n"),
        F.col("a").cast("long").alias("both_keep"),
        F.col("d").cast("long").alias("both_drop"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(F.try_divide(po - pe, 1.0 - pe), 6).alias("kappa"),
    )


def _q193_sql() -> str:
    from .pipelineops import _QSCORE_CTES

    return f"""
{_QSCORE_CTES}, r AS (
  SELECT s > {_KAPPA_THRESH} AS ra, lang = 'en' AS rb FROM s
), c AS (
  SELECT COUNT(*) FILTER (WHERE ra AND rb) AS a,
         COUNT(*) FILTER (WHERE ra AND NOT rb) AS b,
         COUNT(*) FILTER (WHERE NOT ra AND rb) AS c,
         COUNT(*) FILTER (WHERE NOT ra AND NOT rb) AS d
  FROM r
)
SELECT CAST(a + b + c + d AS BIGINT) AS n,
       CAST(a AS BIGINT) AS both_keep,
       CAST(d AS BIGINT) AS both_drop,
       ROUND((a + d) / (1.0 * (a + b + c + d)), 6) AS observed_agreement,
       ROUND(((a + d) / (1.0 * (a + b + c + d))
              - ((a + b) * (a + c) + (c + d) * (b + d))
                / (1.0 * (a + b + c + d) * (a + b + c + d)))
             / (1.0 - ((a + b) * (a + c) + (c + d) * (b + d))
                / (1.0 * (a + b + c + d) * (a + b + c + d))), 6) AS kappa
FROM c
"""


# --------------------------------------------------------------------------
# q207 — cumulative gains / lift table for the quality model against
# the lang='en' pseudo-label: documents ranked by score into NTILE(10)
# deciles (doc_id tie-break), each decile reporting its positives, the
# cumulative capture rate, and lift over the base rate — the
# model-triage chart that says "the top 20% of scores contains X% of
# the positives". Integer counts; divisions rendered at 6dp.
# --------------------------------------------------------------------------


def q207_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipelineops import _quality_score

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    scored = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        _quality_score(F.col("t")).alias("s"),
    )
    # Scale path (VERDICT r2): NTILE via histogram_rank — the only
    # unpartitioned window runs over the distinct-score histogram, not
    # the full scored corpus; exact_ntile reproduces NTILE bit-for-bit.
    dec = histogram_rank(
        scored, "s", "doc_id", descending=True, total="_n"
    ).withColumn("decile", exact_ntile(F.col("r"), F.col("_n"), 10))
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_pos = F.sum("pos").over(wc)
    cum_n = F.sum("n").over(wc)
    all_pos = F.sum("pos").over(tot)
    all_n = F.sum("n").over(tot)
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("n_positive"),
        # try_divide: zero positives anywhere → NULL gain/lift (DuckDB)
        F.round(F.try_divide(cum_pos, all_pos), 6).alias("cum_gain"),
        F.round(
            F.try_divide(cum_pos / cum_n, all_pos / all_n), 6
        ).alias("cum_lift"),
    )


def _q207_sql() -> str:
    from .pipelineops import _QSCORE_CTES

    return f"""
{_QSCORE_CTES}, dec AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         NTILE(10) OVER (ORDER BY s DESC, doc_id) AS decile
  FROM s
), g AS (
  SELECT decile, COUNT(*) AS n, SUM(y) AS pos FROM dec GROUP BY decile
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n AS BIGINT) AS n,
       CAST(pos AS BIGINT) AS n_positive,
       ROUND(SUM(pos) OVER w / (1.0 * SUM(pos) OVER ()), 6) AS cum_gain,
       ROUND((SUM(pos) OVER w / (1.0 * SUM(n) OVER w))
             / (SUM(pos) OVER () / (1.0 * SUM(n) OVER ())), 6)
         AS cum_lift
FROM g
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q208 — Python UDTF (Spark 4 user-defined TABLE function) invoked via
# SQL LATERAL: a row-to-rows tokenizer emitting (doc_id, pos, tok) —
# the UDTF API surface the grouped-pandas shapes don't cover. The
# Python regex mirrors the shared `tokens()` semantics (lowercase,
# [^a-z0-9]+ split, drop empties) and the oracle replays it with the
# indexed-unnest idiom; a 1-in-50 doc sample bounds the expansion.
# UDTFs run row-at-a-time Python — eval/inference surface only, never
# a hot-path operator (the audit's rowwise-python gate stays at 0 for
# everything else).
# --------------------------------------------------------------------------


def q208_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, tok: string")
    class _Tokenize:
        def eval(self, doc_id: int, text: str):
            toks = [
                t
                for t in re.split(r"[^a-z0-9]+", (text or "").lower())
                if t != ""
            ]
            for i, t in enumerate(toks):
                yield doc_id, i, t

    spark.udtf.register("q208_tokenize", _Tokenize)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).createOrReplaceTempView("q208_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.tok "
        "FROM q208_docs v, LATERAL q208_tokenize(v.doc_id, v.text) t"
    )


Q208_SQL = f"""
WITH d AS (
  SELECT doc_id, {TOKENS_SQL.format(x='text')} AS t
  FROM documents WHERE doc_id % 50 = 0
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] AS tok
FROM d, UNNEST(generate_series(1, len(t))) AS u(i)
"""


# --------------------------------------------------------------------------
# q210 — McNemar's test between two classifiers of "is this document
# English": the marker-token language-ID (q23's predictor) vs a
# fixed length rule (n_chars ≤ 150 → en). Only the DISAGREEMENT cells
# matter: b = langid right & rule wrong, c = the reverse; the statistic
# (b−c)²/(b+c) is the paired-classifier significance check an eval
# harness runs before swapping models. Pure integers until the final
# division; degenerate b+c=0 renders NULL, not an error.
# --------------------------------------------------------------------------

_MCNEMAR_LEN = 150


def q210_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textops import q23_langid

    base = q23_langid(spark, sf_dir).select(
        "doc_id", "lang_actual", "lang_pred"
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = base.join(docs, "doc_id")
    truth = F.col("lang_actual") == "en"
    a_ok = (F.col("lang_pred") == "en") == truth
    b_ok = (F.col("n_chars") <= _MCNEMAR_LEN) == truth
    c = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(a_ok & ~b_ok).alias("b"),
        F.count_if(~a_ok & b_ok).alias("c"),
    )
    stat = F.when(
        F.col("b") + F.col("c") > 0,
        F.round(
            (F.col("b") - F.col("c"))
            * (F.col("b") - F.col("c"))
            / (F.col("b") + F.col("c")),
            6,
        ),
    )
    return c.select(
        "n",
        F.col("b").cast("long").alias("langid_only_right"),
        F.col("c").cast("long").alias("rule_only_right"),
        stat.alias("mcnemar_stat"),
    )


def _q210_sql() -> str:
    from .textops import _langid_sql

    return f"""
WITH base AS ({_langid_sql()}),
j AS (
  SELECT b.lang_actual = 'en' AS truth,
         b.lang_pred = 'en' AS pa,
         d.n_chars <= {_MCNEMAR_LEN} AS pb
  FROM base b JOIN documents d ON b.doc_id = d.doc_id
), c AS (
  SELECT COUNT(*) AS n,
         COUNT(*) FILTER (WHERE (pa = truth) AND NOT (pb = truth)) AS b,
         COUNT(*) FILTER (WHERE NOT (pa = truth) AND (pb = truth)) AS c
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(b AS BIGINT) AS langid_only_right,
       CAST(c AS BIGINT) AS rule_only_right,
       CASE WHEN b + c > 0
            THEN ROUND((b - c) * (b - c) / (1.0 * (b + c)), 6)
       END AS mcnemar_stat
FROM c
"""


# --------------------------------------------------------------------------
# q234 — FELLEGI–SUNTER probabilistic record linkage (Fellegi & Sunter
# 1969): the statistical scoring layer the repo's ER stack (kg87
# blocking, kg88 canonicalization, q53 fuzzy pairs) sits under. Each
# candidate pair gets a log-likelihood weight Σ_f [agree_f ?
# log2(m_f/u_f) : log2((1−m_f)/(1−u_f))] where m_f is the prior
# agreement probability among matches and u_f — the part naive
# implementations hand-wave — is estimated EXACTLY from the data as
# the random-pair agreement rate u_f = Σ_v n_v(n_v−1) / N(N−1), a
# pure aggregate over the value histogram (no sampling, no Python).
# Candidates come from (nation, account-band) blocking, so the pair
# generation is block-quadratic, never corpus-quadratic — at
# production scale the block key is the knob, exactly like kg87's
# deletion-neighborhood blocks. Output: top-20 pairs by weight with
# their agreement pattern. Integer ratios → doubles → log2 are
# bit-identical across engines; the weight is rendered at 4dp before
# the ordering so the k-th boundary is engine-stable.
# --------------------------------------------------------------------------

_FS_M_SEG = 0.95  # P(segment agrees | same entity)
_FS_M_BAL = 0.90  # P(500-bucket acctbal agrees | same entity)


def q234_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 500).cast("long").alias("bal_b"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("blk_b"),
    )
    n = c.agg(F.count(F.lit(1)).cast("double").alias("n_tot"))

    def u_of(col: str):
        h = c.groupBy(col).agg(F.count(F.lit(1)).alias("nv"))
        # try_divide: a 1-row table has no pairs (n·(n−1) = 0) — NULL
        # agreement-by-chance, as DuckDB renders it (deg_one sweep)
        return h.crossJoin(F.broadcast(n)).agg(
            F.try_divide(
                F.sum(F.col("nv") * (F.col("nv") - 1)),
                F.first(F.col("n_tot") * (F.col("n_tot") - 1)),
            ).alias(f"u_{col}")
        )

    u = F.broadcast(u_of("c_mktsegment").crossJoin(u_of("bal_b")))
    a = c.select(
        F.col("c_custkey").alias("cust_a"),
        "c_nationkey",
        "blk_b",
        F.col("c_mktsegment").alias("seg_a"),
        F.col("bal_b").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("cust_b"),
        "c_nationkey",
        "blk_b",
        F.col("c_mktsegment").alias("seg_b"),
        F.col("bal_b").alias("bal_b2"),
    )
    pairs = a.join(b, ["c_nationkey", "blk_b"]).filter(
        F.col("cust_a") < F.col("cust_b")
    )
    scored = (
        pairs.crossJoin(u)
        .withColumn("agree_seg", F.col("seg_a") == F.col("seg_b"))
        .withColumn("agree_bal", F.col("bal_a") == F.col("bal_b2"))
        .withColumn(
            "weight",
            F.round(
                F.when(
                    F.col("agree_seg"),
                    F.log2(F.lit(_FS_M_SEG) / F.col("u_c_mktsegment")),
                ).otherwise(
                    F.log2(
                        F.lit(1 - _FS_M_SEG) / (1 - F.col("u_c_mktsegment"))
                    )
                )
                + F.when(
                    F.col("agree_bal"),
                    F.log2(F.lit(_FS_M_BAL) / F.col("u_bal_b")),
                ).otherwise(
                    F.log2(F.lit(1 - _FS_M_BAL) / (1 - F.col("u_bal_b")))
                ),
                4,
            ),
        )
    )
    return (
        scored.select("cust_a", "cust_b", "agree_seg", "agree_bal", "weight")
        .orderBy(F.desc("weight"), "cust_a", "cust_b")
        .limit(20)
    )


Q234_SQL = f"""
WITH c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS bal_b,
         CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS blk_b
  FROM customer
), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_tot FROM c),
useg AS (
  SELECT SUM(nv * (nv - 1)) / ANY_VALUE(n_tot * (n_tot - 1)) AS u_seg
  FROM (SELECT c_mktsegment, COUNT(*) AS nv FROM c GROUP BY 1), n
),
ubal AS (
  SELECT SUM(nv * (nv - 1)) / ANY_VALUE(n_tot * (n_tot - 1)) AS u_bal
  FROM (SELECT bal_b, COUNT(*) AS nv FROM c GROUP BY 1), n
),
pairs AS (
  SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
         a.c_mktsegment = b.c_mktsegment AS agree_seg,
         a.bal_b = b.bal_b AS agree_bal
  FROM c a JOIN c b
    ON a.c_nationkey = b.c_nationkey AND a.blk_b = b.blk_b
   AND a.c_custkey < b.c_custkey
),
scored AS (
  SELECT cust_a, cust_b, agree_seg, agree_bal,
         ROUND(
           CASE WHEN agree_seg THEN log2({_FS_M_SEG} / u_seg)
                ELSE log2({1 - _FS_M_SEG!r} / (1 - u_seg)) END
           + CASE WHEN agree_bal THEN log2({_FS_M_BAL} / u_bal)
                  ELSE log2({1 - _FS_M_BAL!r} / (1 - u_bal)) END, 4)
           AS weight
  FROM pairs, useg, ubal
)
SELECT * FROM scored
ORDER BY weight DESC, cust_a, cust_b
LIMIT 20
"""


# --------------------------------------------------------------------------
# q253 — RECIPROCAL-RANK FUSION of two retrieval rankings (Cormack,
# Clarke & Büttcher SIGIR 2009): the standard hybrid-search combiner —
# RRF(d) = Σ_lists 1/(k + rank_list(d)), k = 60 — fusing q157's BM25
# list with a TF-IDF cosine list for the same query. Both lists are
# truncated at depth 50 (ranked by ROUNDED score with doc_id tiebreak,
# q157's ulp-stable idiom), full-outer-joined, and the fused top-15
# returned with both source ranks (0 = absent from that list).
#
# Scale posture: each list is a TakeOrderedAndProject (distributed
# top-k — never a global sort); the rank windows run over the
# 50-row truncated lists (limit-covered); doc norms and df come from
# partial-aggregable rollups; the query dimension is a 3-row
# broadcast.
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 50


def q253_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf_all = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_all = tf_all.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    # ---- list 1: BM25 (q157's exact formulation) --------------------
    tf_q = tf_all.filter(F.col("tok").isin(*_BM25_QUERY))
    j = (
        tf_q.join(F.broadcast(df_all), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    bm = j.groupBy("doc_id").agg(
        F.round(F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom), 6).alias(
            "bm25"
        )
    )
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    bm_rank = (
        bm.orderBy(F.desc("bm25"), "doc_id")
        .limit(_RRF_DEPTH)
        .select("doc_id", F.row_number().over(wb).alias("rb"))
    )
    # ---- list 2: TF-IDF cosine --------------------------------------
    w_dt = (
        tf_all.join(F.broadcast(df_all), "tok")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(1.0 + F.col("n_docs") / F.col("df"))).alias(
                "w"
            ),
        )
    )
    norm_d = w_dt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nd")
    )
    wq = (
        df_all.filter(F.col("tok").isin(*_BM25_QUERY))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "tok",
            F.log(1.0 + F.col("n_docs") / F.col("df")).alias("wq"),
        )
    )
    nq = wq.agg(F.sqrt(F.sum(F.col("wq") * F.col("wq"))).alias("nq"))
    cos = (
        w_dt.join(F.broadcast(wq), "tok")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("wq")).alias("dot"))
        .join(norm_d, "doc_id")
        .crossJoin(F.broadcast(nq))
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.col("nd") * F.col("nq")), 6
            ).alias("cos"),
        )
    )
    wc = Window.orderBy(F.desc("cos"), "doc_id")
    cos_rank = (
        cos.orderBy(F.desc("cos"), "doc_id")
        .limit(_RRF_DEPTH)
        .select("doc_id", F.row_number().over(wc).alias("rc"))
    )
    # ---- fuse --------------------------------------------------------
    fused = (
        bm_rank.join(cos_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rb", F.lit(0)).cast("long").alias("rank_bm25"),
            F.coalesce("rc", F.lit(0)).cast("long").alias("rank_cos"),
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("rc")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(15)


Q253_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), tf_all AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), df_all AS (
  SELECT tok, COUNT(*) AS df FROM tf_all GROUP BY tok
), bm AS (
  SELECT tf.doc_id,
         ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * ({_BM25_K1} + 1.0)
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / avgdl))), 6) AS bm25
  FROM tf_all tf JOIN df_all USING (tok) JOIN dl ON tf.doc_id = dl.doc_id,
       stats
  WHERE tok IN ({_BM25_IN})
  GROUP BY tf.doc_id
), bm_top AS (
  SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id
  LIMIT {_RRF_DEPTH}
), bm_rank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rb
  FROM bm_top
), w_dt AS (
  SELECT doc_id, tok, tf * ln(1.0 + n_docs / (1.0 * df)) AS w
  FROM tf_all JOIN df_all USING (tok), stats
), norm_d AS (
  SELECT doc_id, sqrt(SUM(w * w)) AS nd FROM w_dt GROUP BY doc_id
), wq AS (
  SELECT tok, ln(1.0 + n_docs / (1.0 * df)) AS wq
  FROM df_all, stats WHERE tok IN ({_BM25_IN})
), nq AS (SELECT sqrt(SUM(wq * wq)) AS nq FROM wq),
cos AS (
  SELECT d.doc_id,
         ROUND(SUM(d.w * q.wq) / (ANY_VALUE(n.nd) * ANY_VALUE(nq.nq)), 6)
           AS cos
  FROM w_dt d JOIN wq q USING (tok)
  JOIN norm_d n ON d.doc_id = n.doc_id, nq
  GROUP BY d.doc_id
), cos_top AS (
  SELECT doc_id, cos FROM cos ORDER BY cos DESC, doc_id
  LIMIT {_RRF_DEPTH}
), cos_rank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rc
  FROM cos_top
)
SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
       CAST(COALESCE(rb, 0) AS BIGINT) AS rank_bm25,
       CAST(COALESCE(rc, 0) AS BIGINT) AS rank_cos,
       ROUND(COALESCE(1.0 / ({_RRF_K} + rb), 0)
             + COALESCE(1.0 / ({_RRF_K} + rc), 0), 6) AS rrf
FROM bm_rank b FULL OUTER JOIN cos_rank c ON b.doc_id = c.doc_id
ORDER BY rrf DESC, doc_id
LIMIT 15
"""


# --------------------------------------------------------------------------
# q270 — PSEUDO-RELEVANCE-FEEDBACK query expansion (Rocchio 1971;
# RM1 of Lavrenko & Croft 2001): run q157's BM25 for the base 3-term
# query, take the top-10 feedback docs, mine the 3 strongest expansion
# terms by feedback-tf × idf (base terms excluded), and re-run BM25
# with the 6-term query — the two-phase retrieval loop behind every
# "searches related to" feature. Reports the expanded top-15 with
# each doc's rank and whether the BASE query would have surfaced it.
#
# Scale posture: both retrieval phases are the q157 shape (broadcast
# term dimension, partial-agg tf/df, TakeOrderedAndProject top-k);
# the feedback set is 10 rows, the expansion mining a vocab-bounded
# aggregate over it; rank windows run over limit-covered lists.
# --------------------------------------------------------------------------

_PRF_FEEDBACK = 10
_PRF_EXPAND = 3


def q270_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf_all = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_all = tf_all.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    def bm25_topk(term_dim: DataFrame, k: int) -> DataFrame:
        j = (
            tf_all.join(F.broadcast(term_dim), "tok")
            .join(F.broadcast(df_all), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
        )
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        denom = F.col("tf") + _BM25_K1 * (
            1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
        )
        scored = j.groupBy("doc_id").agg(
            F.round(
                F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom), 6
            ).alias("bm25")
        )
        return scored.orderBy(F.desc("bm25"), "doc_id").limit(k)

    base_terms = spark.createDataFrame(
        [(t,) for t in _BM25_QUERY], "tok string"
    )
    base15 = bm25_topk(base_terms, 15).localCheckpoint()
    feedback = (
        base15.orderBy(F.desc("bm25"), "doc_id")
        .limit(_PRF_FEEDBACK)
        .select("doc_id")
    )
    cand = (
        tf_all.join(F.broadcast(feedback), "doc_id")
        .filter(~F.col("tok").isin(*_BM25_QUERY))
        .groupBy("tok")
        .agg(F.sum("tf").alias("fb_tf"))
        .join(F.broadcast(df_all), "tok")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "tok",
            F.round(
                F.col("fb_tf")
                * F.log(1.0 + F.col("n_docs") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    expansion = (
        cand.orderBy(F.desc("score"), "tok")
        .limit(_PRF_EXPAND)
        .select("tok")
        .localCheckpoint()
    )
    all_terms = base_terms.union(expansion)
    exp15 = bm25_topk(all_terms, 15)
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    return (
        exp15.withColumn("rank", F.row_number().over(w).cast("long"))
        .join(
            base15.select(F.col("doc_id").alias("_bd")),
            exp15.doc_id == F.col("_bd"),
            "left",
        )
        .select(
            "doc_id",
            "rank",
            F.col("bm25").alias("bm25_expanded"),
            F.col("_bd").isNotNull().cast("int").alias("in_base_top15"),
        )
    )


Q270_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
), tf_all AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), df_all AS (
  SELECT tok, COUNT(*) AS df FROM tf_all GROUP BY tok
), base15 AS (
  SELECT tf.doc_id,
         ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * ({_BM25_K1} + 1.0)
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / avgdl))), 6) AS bm25
  FROM tf_all tf JOIN df_all USING (tok) JOIN dl ON tf.doc_id = dl.doc_id,
       stats
  WHERE tok IN ({_BM25_IN})
  GROUP BY tf.doc_id
  ORDER BY bm25 DESC, tf.doc_id LIMIT 15
), feedback AS (
  SELECT doc_id FROM base15 ORDER BY bm25 DESC, doc_id
  LIMIT {_PRF_FEEDBACK}
), expansion AS (
  SELECT tok FROM (
    SELECT t.tok,
           ROUND(SUM(t.tf) * ln(1.0 + n_docs / (1.0 * d.df)), 6)
             AS score
    FROM tf_all t JOIN feedback f ON t.doc_id = f.doc_id
    JOIN df_all d ON t.tok = d.tok, stats
    WHERE t.tok NOT IN ({_BM25_IN})
    GROUP BY t.tok, d.df, n_docs
  ) ORDER BY score DESC, tok LIMIT {_PRF_EXPAND}
), qterms AS (
  SELECT tok FROM expansion
  UNION ALL
  SELECT * FROM (VALUES {', '.join(f"('{t}')" for t in _BM25_QUERY)})
    AS b(tok)
), exp15 AS (
  SELECT tf.doc_id,
         ROUND(SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * ({_BM25_K1} + 1.0)
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / avgdl))), 6) AS bm25
  FROM tf_all tf
  JOIN qterms q ON tf.tok = q.tok
  JOIN df_all da ON tf.tok = da.tok
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY tf.doc_id
  ORDER BY bm25 DESC, tf.doc_id LIMIT 15
)
SELECT e.doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY e.bm25 DESC, e.doc_id)
            AS BIGINT) AS rank,
       e.bm25 AS bm25_expanded,
       CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS in_base_top15
FROM exp15 e LEFT JOIN base15 b ON e.doc_id = b.doc_id
"""


# --------------------------------------------------------------------------
# q271 — DISTRIBUTED LOGISTIC REGRESSION (Newton / IRLS, fixed 3
# rounds): P(urgent-or-high priority | price) with an intercept and one
# scaled feature. Each round is ONE map-side-combined aggregation of
# five sufficient statistics (gradient 2-vector + symmetric 2×2
# Hessian); the Newton step solves the 2×2 system by Cramer's rule
# inside the same 1-row select — no driver-side math, no collect. This
# is exactly how a GLM trains on a 10¹²-row table: K passes over the
# data, each a partial-aggregable scan, with the K-round parameter
# chain expressed as broadcast joins of 1-row frames.
#
# Scale posture: the corpus is scanned once per round with the 2-column
# projection pushed to parquet; nothing corpus-sized ever shuffles (the
# aggregation is partial → 1 row). Parameters flow between rounds as a
# broadcast 1-row frame, so the whole 3-round train + final log-loss
# eval is a single lazy plan. Cross-engine drift: sigmoid/exp of O(1)
# arguments, sums over n rows → ~1e-14 relative; coefficients rendered
# at 6dp are far from the boundary.
# --------------------------------------------------------------------------

_LOGIT_ROUNDS = 3


def q271_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") / F.lit(100000.0)).alias("x"),
        F.when(F.col("o_orderpriority") < "3", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )

    params = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    for _ in range(_LOGIT_ROUNDS):
        j = o.crossJoin(F.broadcast(params))
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-(F.col("b0") + F.col("b1") * F.col("x")))
        )
        g = F.col("y") - p
        wgt = p * (F.lit(1.0) - p)
        s = j.agg(
            F.max("b0").alias("pb0"),
            F.max("b1").alias("pb1"),
            F.sum(g).alias("g0"),
            F.sum(g * F.col("x")).alias("g1"),
            F.sum(wgt).alias("h00"),
            F.sum(wgt * F.col("x")).alias("h01"),
            F.sum(wgt * F.col("x") * F.col("x")).alias("h11"),
        )
        # try_divide: a single observation makes the Hessian singular
        # (det = 0) — DuckDB renders the step NULL (deg_one sweep)
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        params = s.select(
            (
                F.col("pb0")
                + F.try_divide(
                    F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1"),
                    det,
                )
            ).alias("b0"),
            (
                F.col("pb1")
                + F.try_divide(
                    F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0"),
                    det,
                )
            ).alias("b1"),
        )

    j = o.crossJoin(F.broadcast(params))
    p = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.col("b0") + F.col("b1") * F.col("x")))
    )
    nll = -(
        F.col("y") * F.log(p) + (F.lit(1.0) - F.col("y")) * F.log(1.0 - p)
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.max("b0"), 6).alias("b0"),
        F.round(F.max("b1"), 6).alias("b1"),
        F.round(F.avg(nll), 6).alias("log_loss"),
    )


def _q271_sql() -> str:
    ctes = [
        """d AS (
  SELECT o_totalprice / 100000.0 AS x,
         CASE WHEN o_orderpriority < '3' THEN 1.0 ELSE 0.0 END AS y
  FROM orders
)""",
        "p0 AS (SELECT 0.0 AS b0, 0.0 AS b1)",
    ]
    for r in range(1, _LOGIT_ROUNDS + 1):
        ctes.append(f"""s{r} AS (
  SELECT MAX(b0) AS pb0, MAX(b1) AS pb1,
         SUM(y - p) AS g0, SUM((y - p) * x) AS g1,
         SUM(p * (1.0 - p)) AS h00, SUM(p * (1.0 - p) * x) AS h01,
         SUM(p * (1.0 - p) * x * x) AS h11
  FROM (SELECT x, y, b0, b1,
               1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p
        FROM d, p{r - 1}) t
)""")
        ctes.append(f"""p{r} AS (
  SELECT pb0 + (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
         pb1 + (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
  FROM s{r}
)""")
    return f"""
WITH {', '.join(ctes)}
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(b0), 6) AS b0, ROUND(MAX(b1), 6) AS b1,
       ROUND(AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS log_loss
FROM (SELECT y, b0, b1, 1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p
      FROM d, p{_LOGIT_ROUNDS}) t
"""


# --------------------------------------------------------------------------
# q286 — WEIGHT-OF-EVIDENCE / INFORMATION VALUE (the credit-scoring
# feature-screening standard, e.g. Siddiqi 2006): bin the price feature
# into exact deciles and score how well each bin separates the binary
# priority label. WoE_i = ln(((pos_i+0.5)/G)/((neg_i+0.5)/B)) (0.5
# smoothing so empty cells stay finite), IV_i = (pos_i/G − neg_i/B)·
# WoE_i; Σ IV_i is the feature's screening score (<0.02 useless,
# >0.3 strong). Complements q152 (single best split) and q207 (decile
# lift on a model score — here the raw feature is screened pre-model).
#
# Scale posture: deciles come from histogram_rank + exact_ntile (the
# global window sees only the distinct-price histogram); the per-decile
# contingency is one partial-agg rollup. Counts integer; doubles only
# in the rendered WoE/IV.
# --------------------------------------------------------------------------


def q286_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL prices rank LAST (coalesce to +inf): histogram_rank's
    # equi-join drops NULL ranking values by contract, but the oracle's
    # NTILE ranks them NULLS-LAST (deg_nulls sweep). The CASE-mirror on
    # y counts NULL priority as 0, as the oracle does.
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.coalesce(
            F.col("o_totalprice"), F.lit(float("inf"))
        ).alias("x"),
        F.when(F.col("o_orderpriority") < "3", 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
    )
    ranked = histogram_rank(o, "x", "o_orderkey", out="r", total="n")
    dec = ranked.withColumn(
        "decile", exact_ntile(F.col("r"), F.col("n"), 10)
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    tot = g.agg(
        F.sum("pos").cast("double").alias("gg"),
        F.sum("neg").cast("double").alias("bb"),
    )
    j = g.crossJoin(F.broadcast(tot))
    # try_divide: a one-class corpus has G or B = 0 (DuckDB: NULL WoE)
    woe = F.log(
        F.try_divide(
            F.try_divide(F.col("pos") + 0.5, F.col("gg")),
            F.try_divide(F.col("neg") + 0.5, F.col("bb")),
        )
    )
    iv = (
        F.try_divide("pos", "gg") - F.try_divide("neg", "bb")
    ) * woe
    return j.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("pos"),
        F.round(woe, 6).alias("woe"),
        F.round(iv, 6).alias("iv"),
    )


Q286_SQL = """
WITH o AS (
  SELECT o_orderkey, o_totalprice AS x,
         CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END AS y
  FROM orders
), dec AS (
  SELECT y, NTILE(10) OVER (ORDER BY x, o_orderkey) AS decile
  FROM o
), g AS (
  SELECT decile, COUNT(*) AS n, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
  FROM dec GROUP BY decile
), tot AS (
  SELECT CAST(SUM(pos) AS DOUBLE) AS gg, CAST(SUM(neg) AS DOUBLE) AS bb
  FROM g
)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
       CAST(pos AS BIGINT) AS pos,
       ROUND(ln(((pos + 0.5) / gg) / ((neg + 0.5) / bb)), 6) AS woe,
       ROUND((pos / gg - neg / bb)
             * ln(((pos + 0.5) / gg) / ((neg + 0.5) / bb)), 6) AS iv
FROM g CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q351 — QUERY-LIKELIHOOD retrieval with Dirichlet smoothing: the
# other classic lexical ranker next to BM25 (q157), same 3-term query
# for comparability. score(q,d) = Σ_t log((tf_td + μ·p(t|C)) /
# (dl_d + μ)) with μ = 100 and collection model p(t|C) = ctf_t / |C|.
# Unlike BM25 the sum runs over ALL query terms (a missing term
# contributes the smoothed log), so the join is per-doc × 3 query
# terms via a broadcast term table + left join on the tf stream —
# never a corpus-wide explode beyond the one tf aggregation both
# rankers share. Top-15 by score; logs of exact rationals, identical
# in both engines.
# --------------------------------------------------------------------------

_QL_MU = 100.0


def q351_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    coll = toks.agg(F.count(F.lit(1)).alias("ctot"))
    ctf = (
        toks.filter(F.col("tok").isin(*_BM25_QUERY))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ctf"))
    )
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # every (doc, query-term) cell, including tf = 0 cells: docs × the
    # broadcast 3-row term table, left-joined against the tf stream
    cells = (
        dl.crossJoin(F.broadcast(ctf))
        .join(tf, ["doc_id", "tok"], "left")
        .crossJoin(F.broadcast(coll))
    )
    contrib = F.log(
        (F.coalesce(F.col("tf"), F.lit(0)) +
         _QL_MU * F.col("ctf") / F.col("ctot"))
        / (F.col("dl") + _QL_MU)
    )
    scored = cells.groupBy("doc_id").agg(
        F.round(F.sum(contrib), 6).alias("ql_score"),
        F.count_if(F.col("tf").isNotNull()).cast("long").alias(
            "n_terms_present"
        ),
    )
    return scored.orderBy(F.desc("ql_score"), "doc_id").limit(15)


_QL_IN = ", ".join(f"'{t}'" for t in _BM25_QUERY)

Q351_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({{t}}) AS tok FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), coll AS (SELECT COUNT(*) AS ctot FROM toks),
ctf AS (
  SELECT tok, COUNT(*) AS ctf FROM toks WHERE tok IN ({_QL_IN})
  GROUP BY tok
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_QL_IN}) GROUP BY doc_id, tok
), cells AS (
  SELECT dl.doc_id, dl.dl, ctf.tok, ctf.ctf, tf.tf, coll.ctot
  FROM dl CROSS JOIN ctf
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.tok = ctf.tok
  CROSS JOIN coll
)
SELECT doc_id,
       ROUND(SUM(ln((COALESCE(tf, 0) + {_QL_MU} * ctf / (1.0 * ctot))
                    / (dl + {_QL_MU}))), 6) AS ql_score,
       CAST(COUNT(tf) AS BIGINT) AS n_terms_present
FROM cells GROUP BY doc_id
ORDER BY ql_score DESC, doc_id LIMIT 15
""".format(t=TOKENS_SQL.format(x="text"))


QUERIES = {
    "q351_query_likelihood": q351_query_likelihood,
    "q271_logistic_irls": q271_logistic_irls,
    "q286_woe_iv": q286_woe_iv,
    "q270_prf_expansion": q270_prf_expansion,
    "q253_rrf_fusion": q253_rrf_fusion,
    "q234_fellegi_sunter": q234_fellegi_sunter,
    "q193_cohens_kappa": q193_cohens_kappa,
    "q207_decile_lift": q207_decile_lift,
    "q208_udtf_tokenize": q208_udtf_tokenize,
    "q210_mcnemar": q210_mcnemar,
    "q178_grouped_agg_udf": q178_grouped_agg_udf,
    "q171_grouped_ols_pandas": q171_grouped_ols_pandas,
    "q174_cogroup_reconcile": q174_cogroup_reconcile,
    "q151_auc_rank": q151_auc_rank,
    "q152_decision_stump": q152_decision_stump,
    "q153_pmi_cooccur": q153_pmi_cooccur,
    "q154_skyline": q154_skyline,
    "q155_ridge_regression": q155_ridge_regression,
    "q156_postings": q156_postings,
    "q157_bm25": q157_bm25,
}

ORACLES = {
    "q351_query_likelihood": Q351_SQL,
    "q271_logistic_irls": _q271_sql(),
    "q286_woe_iv": Q286_SQL,
    "q270_prf_expansion": Q270_SQL,
    "q253_rrf_fusion": Q253_SQL,
    "q234_fellegi_sunter": Q234_SQL,
    "q193_cohens_kappa": _q193_sql(),
    "q207_decile_lift": _q207_sql(),
    "q208_udtf_tokenize": Q208_SQL,
    "q210_mcnemar": _q210_sql(),
    "q178_grouped_agg_udf": Q178_SQL,
    "q171_grouped_ols_pandas": Q171_SQL,
    "q174_cogroup_reconcile": Q174_SQL,
    "q151_auc_rank": Q151_SQL,
    "q152_decision_stump": Q152_SQL,
    "q153_pmi_cooccur": Q153_SQL,
    "q154_skyline": Q154_SQL,
    "q155_ridge_regression": Q155_SQL,
    "q156_postings": Q156_SQL,
    "q157_bm25": Q157_SQL,
}
