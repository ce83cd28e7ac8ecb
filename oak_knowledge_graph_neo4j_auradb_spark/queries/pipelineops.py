"""Training-data pipeline operators, batch 3: corpus hygiene and
feature-preparation stages a 100-TB LLM-data pipeline runs between raw
ingest and training-shard write.

Covers: block-level boilerplate removal (q70), offset-based sequence
packing (q71), pattern scrubbing/redaction (q72), z-score outlier
detection (q73), int8 embedding quantization (q74), ordered funnel
analysis (q75), bigram collocation mining (q76), novelty anti-join
dedup against a seen-corpus (q77), min-max feature scaling (q78).

Every query has a DuckDB oracle twin; float outputs are rounded to a
shared decimal rendering (see ``common.r4``) and quantization avoids
decimal rounding entirely (raw IEEE ``floor`` — both engines compute
bit-identical doubles from the same float32 inputs).

Scale notes per query are inline; the common posture: tokenization and
array work stay inside Catalyst (no explode unless a corpus-wide
aggregate needs rows), every groupBy is a partial-agg shuffle on a
well-distributed key, and anti-joins/lookups lean on AQE rather than
driver-side collection.
"""

from __future__ import annotations

import os
import re

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
# q70 — block-level boilerplate removal. Web-crawl pipelines drop
# repeated spans (nav bars, cookie banners) that recur across many
# documents. Granularity here: consecutive 3-token blocks; a block
# string seen in > DF_K distinct documents is boilerplate. Spark plan:
# tokens→blocks entirely inside the array (one transform, no per-token
# explode), one explode to block rows, document-frequency as a partial
# agg on the block hash, then a join back marks drops — two shuffles
# total, both on well-distributed hash keys. At 100 TB the df table is
# orders smaller than the corpus (distinct blocks) and the join is
# AQE-broadcastable per partition.
# --------------------------------------------------------------------------

_BLOCK = 3
_DF_K = 20


def q70_block_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    )
    blocks = d.filter(F.size("t") > 0).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(t) / {_BLOCK}.0) AS INT) - 1), "
                f"b -> concat_ws(' ', slice(t, b * {_BLOCK} + 1, {_BLOCK})))"
            )
        ).alias("blk"),
    )
    df = (
        blocks.groupBy("blk")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > _DF_K)
        .select("blk", F.lit(True).alias("boiler"))
    )
    return (
        blocks.join(df, on="blk", how="left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("blocks"),
            F.count_if(F.col("boiler").isNull()).cast("long").alias("kept"),
        )
    )


Q70_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), blk AS (
  SELECT doc_id, lang, b, string_agg(tok, ' ' ORDER BY i) AS blk
  FROM (
    SELECT doc_id, lang, u.tok AS tok, u.i AS i,
           CAST(floor((u.i - 1) / {_BLOCK}) AS INT) AS b
    FROM (
      SELECT doc_id, lang,
             unnest(list_transform(t, (x, i) -> {{'tok': x, 'i': i}})) AS u
      FROM tok WHERE len(t) > 0
    )
  ) GROUP BY doc_id, lang, b
), df AS (
  SELECT blk FROM (
    SELECT blk, COUNT(DISTINCT doc_id) AS df FROM blk GROUP BY blk
  ) WHERE df > {_DF_K}
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS blocks,
       CAST(COUNT(*) FILTER (WHERE blk.blk NOT IN (SELECT blk FROM df))
            AS BIGINT) AS kept
FROM blk GROUP BY lang
"""


# --------------------------------------------------------------------------
# q71 — offset-based sequence packing: documents are laid out
# back-to-back in deterministic (lang, doc_id) order and cut into
# fixed-token-budget bins (bin = floor(start_offset / budget)) — the
# streaming-pack layout used to build fixed-length training shards
# (documents may straddle a boundary; the tokenizer's EOD handles it).
# One window cumsum per lang partition, one groupBy — and at cluster
# scale the window partitions by lang, so packing parallelizes per
# shard-group with no global sort.
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048


def q71_pack_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("tok_n")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum", F.sum("tok_n").over(w))
        .withColumn(
            "bin",
            F.floor((F.col("cum") - F.col("tok_n")) / _PACK_BUDGET).cast("long"),
        )
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tok_n").cast("long").alias("toks"),
        )
    )


Q71_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, len({TOKENS_SQL.format(x='text')}) AS tok_n
  FROM documents
), c AS (
  SELECT lang, tok_n,
         SUM(tok_n) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT lang, CAST(floor((cum - tok_n) / {_PACK_BUDGET}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok_n) AS BIGINT) AS toks
FROM c GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q358 — PACK-BOUNDARY SPLIT stats: over q71's streaming-pack layout,
# how many documents straddle a context-window boundary per shard
# group (lang)? A straddled document gets its tail attention-masked or
# truncated by the trainer, so the straddle fraction and the worst
# span (bins one document crosses) are the knobs a pretraining-data
# owner tunes (budget vs document length distribution) before cutting
# shards. Reuses q71's cumsum layout VERBATIM (q119 reuse discipline);
# the window partitions by lang, so at cluster scale packing
# parallelizes per shard group — no global sort, no raw global window.
# --------------------------------------------------------------------------


def q358_pack_boundary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("tok_n")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("tok_n").over(w))
    first_b = F.floor((F.col("cum") - F.col("tok_n")) / _PACK_BUDGET)
    last_b = F.floor((F.col("cum") - 1) / _PACK_BUDGET)
    span = F.when(F.col("tok_n") > 0, last_b - first_b + 1).otherwise(
        F.lit(1)
    )
    c = c.withColumn("span", span)
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.col("span") > 1).cast("long").alias("n_straddle"),
        F.round(F.count_if(F.col("span") > 1) / F.count(F.lit(1)), 6).alias(
            "straddle_frac"
        ),
        F.max("span").cast("long").alias("max_bins_spanned"),
    )


Q358_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, len({TOKENS_SQL.format(x='text')}) AS tok_n
  FROM documents
), c AS (
  SELECT lang, tok_n,
         SUM(tok_n) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
), s AS (
  SELECT lang,
         CASE WHEN tok_n > 0
              THEN floor((cum - 1) / {_PACK_BUDGET})
                   - floor((cum - tok_n) / {_PACK_BUDGET}) + 1
              ELSE 1 END AS span
  FROM c
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE span > 1) AS BIGINT) AS n_straddle,
       ROUND(COUNT(*) FILTER (WHERE span > 1) / (1.0 * COUNT(*)), 6)
         AS straddle_frac,
       CAST(MAX(span) AS BIGINT) AS max_bins_spanned
FROM s GROUP BY 1
"""


# --------------------------------------------------------------------------
# q72 — pattern scrubbing / redaction: count sensitive-pattern matches
# (digit runs stand in for phone/ID patterns in the synthetic corpus)
# and measure the redacted payload. The regex runs JVM-side
# (regexp_count / regexp_replace inside whole-stage codegen); the only
# shuffle is the final per-type partial agg. At 100 TB this is the
# cheapest possible shape: scan → map → one small agg.
# --------------------------------------------------------------------------


def q72_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    red = F.regexp_replace(F.col("props"), "[0-9]+", "#")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.regexp_count(F.col("props"), F.lit("[0-9]+")))
            .cast("long")
            .alias("n_matches"),
            F.sum(F.length(red)).cast("long").alias("redacted_chars"),
        )
    )


Q72_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
         AS n_matches,
       CAST(SUM(len(regexp_replace(props, '[0-9]+', '#', 'g'))) AS BIGINT)
         AS redacted_chars
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q73 — z-score outlier detection on document length per language: the
# quality-filter stage that drops statistical outliers before training.
# Two-pass (agg stats, join back) rather than a window — at 100 TB the
# per-lang stats table is tiny and broadcast, so the corpus is scanned
# twice but never shuffled on a skewed key.
# --------------------------------------------------------------------------


def q73_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    stats = d.groupBy("lang").agg(
        F.avg("n_chars").alias("mu"), F.stddev_pop("n_chars").alias("sd")
    )
    z = F.col("n_chars").cast("double") - F.col("mu")
    return (
        d.join(F.broadcast(stats), on="lang")
        .withColumn("is_out", F.abs(z) > 2 * F.col("sd"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("is_out")).cast("long").alias("n_outliers"),
            F.min(F.when(F.col("is_out"), F.col("n_chars"))).alias("out_min"),
            F.max(F.when(F.col("is_out"), F.col("n_chars"))).alias("out_max"),
            r4(F.first("mu")).alias("mu"),
            r4(F.first("sd")).alias("sd"),
        )
    )


Q73_SQL = """
WITH s AS (
  SELECT lang, AVG(n_chars) AS mu, STDDEV_POP(n_chars) AS sd
  FROM documents GROUP BY lang
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE abs(d.n_chars - s.mu) > 2 * s.sd)
            AS BIGINT) AS n_outliers,
       MIN(d.n_chars) FILTER (WHERE abs(d.n_chars - s.mu) > 2 * s.sd)
         AS out_min,
       MAX(d.n_chars) FILTER (WHERE abs(d.n_chars - s.mu) > 2 * s.sd)
         AS out_max,
       ROUND(ANY_VALUE(s.mu), 4) AS mu,
       ROUND(ANY_VALUE(s.sd), 4) AS sd
FROM documents d JOIN s ON d.lang = s.lang
GROUP BY d.lang
"""


# --------------------------------------------------------------------------
# q74 — int8 embedding quantization: per-vector affine quantization to
# [0, 255] (the storage-compression step before writing an ANN index or
# training shard). Narrow scan of (vec_id, embedding), all math inside
# one Catalyst projection — transform + aggregate fold, zero shuffles,
# zero Python. Determinism: NO decimal rounding inside the quantizer —
# (x−mn)/rng is the same IEEE double in both engines (float32 inputs
# cast exactly), so floor() agrees bit-for-bit; only the *reported*
# scale is display-rounded.
# --------------------------------------------------------------------------


def q74_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    quants = F.expr(
        "transform(embedding, x -> least(255, CAST(floor("
        "(CAST(x AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE)) /"
        " (CAST(array_max(embedding) AS DOUBLE) - CAST(array_min(embedding) AS DOUBLE))"
        " * 256) AS BIGINT)))"
    )
    return (
        e.filter(mx > mn)
        .select(
            "vec_id",
            F.aggregate(
                quants, F.lit(0).cast("long"), lambda acc, q: acc + q
            ).alias("qsum"),
            F.round((mx - mn) / 255, 6).alias("scale"),
        )
    )


Q74_SQL = """
WITH e AS (
  SELECT vec_id, embedding,
         CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
         CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
  FROM embeddings
)
SELECT vec_id,
       CAST(list_sum(list_transform(embedding, x ->
         least(255, CAST(floor((CAST(x AS DOUBLE) - mn) / (mx - mn) * 256)
                         AS BIGINT)))) AS BIGINT) AS qsum,
       ROUND((mx - mn) / 255, 6) AS scale
FROM e WHERE mx > mn
"""


# --------------------------------------------------------------------------
# q75 — ordered funnel: users who signed up, then viewed, then
# purchased — each stage's timestamp strictly after the previous
# stage's first occurrence. Three sequential-min aggregations (stage
# k+1 aggregates only events after the user's stage-k time); each is a
# partial agg on user_id. At scale the three shuffles share the
# user_id partitioning, so AQE reuses the exchange.
# --------------------------------------------------------------------------


def q75_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("sec"),
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("sec").alias("s_sec"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, on="user_id")
        .filter(F.col("sec") > F.col("s_sec"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("v_sec"), F.first("s_sec").alias("s_sec"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, on="user_id")
        .filter(F.col("sec") > F.col("v_sec"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("p_sec"), F.first("s_sec").alias("s_sec"))
    )
    # GLOBAL aggregates (not groupBy on the literal stage): SQL's
    # aggregate-without-GROUP-BY renders one row per stage even over an
    # empty corpus, exactly as the oracle's per-stage SELECTs do — a
    # grouped agg over empty input would render nothing (deg_empty
    # sweep). Also one shuffle fewer per stage.
    def stage_row(df, name, dt=None):
        aggs = [F.count(F.lit(1)).cast("long").alias("n_users")]
        if dt is None:
            aggs.append(
                F.lit(None).cast("double").alias("avg_secs_to_here")
            )
        else:
            aggs.append(r4(F.avg(dt)).alias("avg_secs_to_here"))
        return df.agg(*aggs).select(
            F.lit(name).alias("stage"), "n_users", "avg_secs_to_here"
        )

    return (
        stage_row(s, "signup")
        .unionByName(
            stage_row(
                v.select((F.col("v_sec") - F.col("s_sec")).alias("dt")),
                "view_after_signup",
                "dt",
            )
        )
        .unionByName(
            stage_row(
                p.select((F.col("p_sec") - F.col("s_sec")).alias("dt")),
                "purchase_after_view",
                "dt",
            )
        )
    )


Q75_SQL = """
WITH ev AS (
  -- floor(epoch) truncates to whole seconds exactly like Spark's
  -- timestamp→long cast (bare CAST would round-half-even sub-second
  -- fractions the other way — the q19 lesson)
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
), s AS (
  SELECT user_id, MIN(sec) AS s_sec FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT ev.user_id, MIN(ev.sec) AS v_sec, ANY_VALUE(s.s_sec) AS s_sec
  FROM ev JOIN s ON ev.user_id = s.user_id
  WHERE ev.event_type = 'view' AND ev.sec > s.s_sec
  GROUP BY ev.user_id
), p AS (
  SELECT ev.user_id, MIN(ev.sec) AS p_sec, ANY_VALUE(v.s_sec) AS s_sec
  FROM ev JOIN v ON ev.user_id = v.user_id
  WHERE ev.event_type = 'purchase' AND ev.sec > v.v_sec
  GROUP BY ev.user_id
)
SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(NULL AS DOUBLE) AS avg_secs_to_here FROM s
UNION ALL
SELECT 'view_after_signup', CAST(COUNT(*) AS BIGINT),
       ROUND(AVG(v_sec - s_sec), 4) FROM v
UNION ALL
SELECT 'purchase_after_view', CAST(COUNT(*) AS BIGINT),
       ROUND(AVG(p_sec - s_sec), 4) FROM p
"""


# --------------------------------------------------------------------------
# q76 — bigram collocation mining: top-5 bigrams per language by
# (count desc, bigram asc) — the n-gram frequency table a tokenizer-
# training / contamination-check stage builds. Bigrams are formed
# inside the token array (indexed transform, no self-join), exploded
# once, counted with a partial agg, ranked with one per-lang window.
# --------------------------------------------------------------------------

_TOPK_BIGRAM = 5


def q76_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang", tokens(F.col("text")).alias("t")
    )
    bigrams = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
        "(x, i) -> concat(x, ' ', element_at(t, i + 2)))"
    )
    cnt = (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK_BIGRAM)
        .select("lang", "bigram", "cnt", F.col("rank").cast("int").alias("rank"))
    )


Q76_SQL = f"""
WITH tok AS (
  SELECT lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), bg AS (
  SELECT lang, unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
    ELSE list_transform(t[1:len(t) - 1], (x, i) -> x || ' ' || t[i + 1])
    END) AS bigram
  FROM tok
), cnt AS (
  SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bg GROUP BY lang, bigram
)
SELECT lang, bigram, cnt, CAST(rank AS INT) AS rank FROM (
  SELECT lang, bigram, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, bigram) AS rank
  FROM cnt
) WHERE rank <= {_TOPK_BIGRAM}
"""


# --------------------------------------------------------------------------
# q77 — novelty anti-join dedup: keep only documents whose content hash
# is NOT present in an already-seen corpus (here: the doc_id%3==0
# slice stands in for the previous crawl). The incremental-ingest
# primitive: new shard LEFT ANTI JOIN seen-hash table on content hash.
# At 100 TB the seen-hash table is a compact Bloom/real table; Spark's
# shuffled anti-join with AQE (or a broadcast when the seen side is
# small) is exactly the right physical plan — never a driver collect.
# --------------------------------------------------------------------------


def q77_novelty_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", md5long(F.col("text")).alias("h")
    )
    seen = d.filter(F.col("doc_id") % 3 == 0).select("h").distinct()
    return (
        d.filter(F.col("doc_id") % 3 != 0)
        .join(seen, on="h", how="left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_novel"),
            F.min("doc_id").alias("first_novel_doc"),
        )
    )


Q77_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, {MD5LONG_SQL.format(x='text')} AS h FROM documents
), seen AS (SELECT DISTINCT h FROM d WHERE doc_id % 3 = 0)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_novel,
       MIN(doc_id) AS first_novel_doc
FROM d
WHERE doc_id % 3 <> 0 AND NOT EXISTS (SELECT 1 FROM seen WHERE seen.h = d.h)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q78 — min-max feature scaling: normalize a numeric feature to [0, 1]
# per group (the feature-prep step before quality-classifier training).
# Stats aggregate is tiny → broadcast back; corpus scanned twice, never
# shuffled on the full key.
# --------------------------------------------------------------------------


def q78_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    # try_divide: a single-row (or constant) group has mx == mn
    scaled = F.try_divide(
        F.col("l_extendedprice") - F.col("mn"), F.col("mx") - F.col("mn")
    )
    return (
        li.join(F.broadcast(stats), on="l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            r4(F.avg(scaled)).alias("avg_scaled"),
            r4(F.first("mn")).alias("mn"),
            r4(F.first("mx")).alias("mx"),
        )
    )


Q78_SQL = """
WITH s AS (
  SELECT l_returnflag, MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
  FROM lineitem GROUP BY l_returnflag
)
SELECT li.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG((li.l_extendedprice - s.mn) / (s.mx - s.mn)), 4)
         AS avg_scaled,
       ROUND(ANY_VALUE(s.mn), 4) AS mn,
       ROUND(ANY_VALUE(s.mx), 4) AS mx
FROM lineitem li JOIN s ON li.l_returnflag = s.l_returnflag
GROUP BY li.l_returnflag
"""


# --------------------------------------------------------------------------
# q79 — benchmark decontamination: flag training documents sharing any
# 5-token shingle with a held-out benchmark set (here: the doc_id%97
# slice). The eval-contamination sweep every serious pretraining corpus
# runs. Spark plan: shingles form inside the token array (indexed
# transform), the benchmark side collapses to DISTINCT grams (tiny vs
# corpus), and the flag is one left-semi join on the gram string —
# at 100 TB the benchmark gram set broadcasts and the corpus never
# shuffles; here AQE decides.
# --------------------------------------------------------------------------

_DECON_N = 5
_DECON_MOD = 97


def _shingles(col: str = "t", n: int = _DECON_N) -> "F.Column":
    return F.expr(
        f"transform(slice({col}, 1, greatest(size({col}) - {n - 1}, 0)), "
        f"(x, i) -> concat_ws(' ', slice({col}, i + 1, {n})))"
    )


def q79_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    )
    grams = d.select(
        "doc_id", "lang", F.explode(_shingles()).alias("gram")
    )
    bench = (
        grams.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("gram")
        .distinct()
    )
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    contaminated = (
        grams.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(bench, on="gram", how="left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        train.select("doc_id", "lang")
        .join(
            contaminated.select("doc_id", F.lit(True).alias("hit")),
            on="doc_id",
            how="left",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train"),
            F.count_if(F.col("hit")).cast("long").alias("n_contaminated"),
        )
    )


Q79_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), grams AS (
  SELECT doc_id, lang, unnest(
    CASE WHEN len(t) < {_DECON_N} THEN []::VARCHAR[]
    ELSE list_transform(t[1:len(t) - {_DECON_N - 1}],
                        (x, i) -> array_to_string(t[i:i + {_DECON_N - 1}], ' '))
    END) AS gram
  FROM tok
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {_DECON_MOD} = 0
), hits AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % {_DECON_MOD} <> 0 AND gram IN (SELECT gram FROM bench)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train,
       CAST(COUNT(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM hits))
            AS BIGINT) AS n_contaminated
FROM documents WHERE doc_id % {_DECON_MOD} <> 0
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q80 — unigram-LM negative log-likelihood scoring (the KenLM-style
# perplexity-filter analog): corpus unigram probabilities, then each
# document scores avg −ln p(token). Two-pass: the unigram table is a
# partial agg over tokens (small — vocab-sized), joined back to the
# exploded corpus; per-lang rollup. At 100 TB the unigram table
# broadcasts and the corpus shuffles once on doc_id for the per-doc avg
# (here the groupBy doc_id is that shuffle).
# --------------------------------------------------------------------------


def q80_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    uni = d.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.sum("c").alias("tot"))
    scored = (
        d.join(F.broadcast(uni), on="tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "lang",
            (-F.log(F.col("c") / F.col("tot"))).alias("nll"),
        )
        .groupBy("doc_id", "lang")
        .agg(F.avg("nll").alias("doc_nll"))
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        r4(F.avg("doc_nll")).alias("avg_nll"),
        r4(F.min("doc_nll")).alias("min_nll"),
        r4(F.max("doc_nll")).alias("max_nll"),
    )


Q80_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({TOKENS_SQL.format(x='text')}) AS tok
  FROM documents
), uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT SUM(c) AS tot FROM uni),
doc AS (
  SELECT t.doc_id, t.lang,
         AVG(-ln(CAST(u.c AS DOUBLE) / tot.tot)) AS doc_nll
  FROM tok t JOIN uni u ON t.tok = u.tok CROSS JOIN tot
  GROUP BY t.doc_id, t.lang
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(doc_nll), 4) AS avg_nll,
       ROUND(MIN(doc_nll), 4) AS min_nll,
       ROUND(MAX(doc_nll), 4) AS max_nll
FROM doc GROUP BY lang
"""


# --------------------------------------------------------------------------
# q81 — model-based quality scoring: a fixed-weight logistic model over
# cheap lexical features (stopword ratio, mean token length,
# log-length) — the shape of a fastText/classifier quality-filter
# stage with the model weights baked in. Single projection + one agg;
# the real-model variant swaps the linear expression for a broadcast
# weight vector or an Arrow-UDF inference call, same plan.
# --------------------------------------------------------------------------

_QW = {"b": -2.0, "stop": 3.0, "wlen": 0.2, "loglen": 0.15}


def _quality_score(t) -> F.Column:
    """Fixed-weight logistic quality score over token-list features —
    shared verbatim by q81 (per-lang rollup) and q167 (calibration
    bins) so the two stages can never drift apart."""
    stop = F.size(
        F.filter(t, lambda x: x.isin("the", "a", "and", "of", "to"))
    ) / F.size(t)
    wlen = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / F.size(t)
    z = (
        F.lit(_QW["b"])
        + _QW["stop"] * stop
        + _QW["wlen"] * wlen
        + _QW["loglen"] * F.log(F.lit(1.0) + F.size(t))
    )
    return 1.0 / (1.0 + F.exp(-z))


def q81_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") > 0)
    score = _quality_score(F.col("t"))
    return d.select("lang", score.alias("s")).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        r4(F.avg("s")).alias("avg_score"),
        F.count_if(F.col("s") > 0.5).cast("long").alias("n_keep"),
    )


_QSCORE_CTES = f"""
WITH d AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), f AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to')))
              AS DOUBLE) / len(t) AS stop,
         CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
           / len(t) AS wlen,
         ln(1.0 + len(t)) AS loglen
  FROM d WHERE len(t) > 0
), s AS (
  SELECT doc_id, lang, 1.0 / (1.0 + exp(-({_QW['b']} + {_QW['stop']} * stop +
         {_QW['wlen']} * wlen + {_QW['loglen']} * loglen))) AS s
  FROM f
)"""

Q81_SQL = f"""
{_QSCORE_CTES}
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(s), 4) AS avg_score,
       CAST(COUNT(*) FILTER (WHERE s > 0.5) AS BIGINT) AS n_keep
FROM s GROUP BY lang
"""


# --------------------------------------------------------------------------
# q82 — within-document repetition ratio (Gopher-style quality rule):
# 1 − distinct_bigrams/total_bigrams per document; documents above the
# repetition threshold are the drop set. All array-native (transform +
# array_distinct), zero Python, one final agg. The threshold compare
# runs on an exact integer ratio, so both engines agree bit-for-bit.
# --------------------------------------------------------------------------

_REP_THRESH = 0.5


def q82_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang", tokens(F.col("text")).alias("t")
    )
    bigrams = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
        "(x, i) -> concat(x, ' ', element_at(t, i + 2)))"
    )
    rep = 1.0 - F.size(F.array_distinct(bigrams)) / F.size(bigrams)
    return (
        d.filter(F.size("t") >= 2)
        .select("lang", rep.alias("rep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            r4(F.avg("rep")).alias("avg_rep"),
            F.count_if(F.col("rep") > _REP_THRESH).cast("long").alias("n_drop"),
        )
    )


Q82_SQL = f"""
WITH d AS (
  SELECT lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), b AS (
  SELECT lang,
         list_transform(t[1:len(t) - 1], (x, i) -> x || ' ' || t[i + 1]) AS bg
  FROM d WHERE len(t) >= 2
), r AS (
  SELECT lang,
         1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) AS rep
  FROM b
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(rep), 4) AS avg_rep,
       CAST(COUNT(*) FILTER (WHERE rep > {_REP_THRESH}) AS BIGINT) AS n_drop
FROM r GROUP BY lang
"""


# --------------------------------------------------------------------------
# q85 — out-of-vocabulary rate against a learned top-K vocabulary: the
# tokenizer-coverage check run before committing a vocab. Vocab = top
# 1000 corpus tokens by (count desc, token asc); per-lang OOV rate =
# exploded-token anti-join. The vocab is bounded (K rows) so at any
# scale it broadcasts; the corpus explodes once and aggregates once.
# --------------------------------------------------------------------------

#: sized below the synthetic corpus's ~31 distinct tokens so the OOV
#: tail is non-empty; a production vocab would be 32k–256k
_VOCAB_K = 15


def q85_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _VOCAB_K)
        .select("tok")
    )
    return (
        toks.join(
            F.broadcast(vocab.select("tok", F.lit(True).alias("iv"))),
            on="tok",
            how="left",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.count_if(F.col("iv").isNull()).cast("long").alias("n_oov"),
            r4(F.count_if(F.col("iv").isNull()) / F.count(F.lit(1))).alias(
                "oov_rate"
            ),
        )
    )


Q85_SQL = f"""
WITH toks AS (
  SELECT lang, unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rn
    FROM toks GROUP BY tok
  ) WHERE rn <= {_VOCAB_K}
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE tok NOT IN (SELECT tok FROM vocab))
            AS BIGINT) AS n_oov,
       ROUND(CAST(COUNT(*) FILTER (WHERE tok NOT IN (SELECT tok FROM vocab))
                  AS DOUBLE) / COUNT(*), 4) AS oov_rate
FROM toks GROUP BY lang
"""


# --------------------------------------------------------------------------
# q86 — cross-partition (here: cross-language) duplicate detection:
# documents whose leading-5-token fingerprint appears under more than
# one language — the "same document filed under two shards" audit an
# incremental-dedup pass runs before choosing a canonical shard (the
# prefix fingerprint is the cheap first-stage key; exact-hash dedup is
# q20/q77 and is empty on this corpus by construction). One partial agg
# on the fingerprint, one semi-join back.
# --------------------------------------------------------------------------


def q86_crosslang_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tokens(F.col("text"))
    d = (
        load(spark, sf_dir, "documents")
        .select("lang", t.alias("t"))
        .filter(F.size("t") >= 5)
        .select(
            "lang", md5long(F.concat_ws(" ", F.slice("t", 1, 5))).alias("h")
        )
    )
    multi = (
        d.groupBy("h")
        .agg(F.count_distinct("lang").alias("nl"))
        .filter(F.col("nl") > 1)
        .select("h")
    )
    return (
        d.join(multi, on="h", how="left_semi")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_crosslang"),
            F.count_distinct("h").cast("long").alias("n_fingerprints"),
        )
    )


Q86_SQL = f"""
WITH tok AS (
  SELECT lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), d AS (
  SELECT lang,
         {MD5LONG_SQL.format(x="array_to_string(t[1:5], ' ')")} AS h
  FROM tok WHERE len(t) >= 5
), multi AS (
  SELECT h FROM d GROUP BY h HAVING COUNT(DISTINCT lang) > 1
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_crosslang,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_fingerprints
FROM d WHERE h IN (SELECT h FROM multi)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q90 — SCD2 interval construction (gaps-and-islands): collapse each
# user's event stream into validity intervals of consecutive equal
# event_type — the slowly-changing-dimension versioning step a
# warehouse ingest runs on attribute streams. Island id = the classic
# rn_all − rn_per_type difference; total order pinned by (ts,
# event_id) so ties can't reorder across engines. One window shuffle
# on user_id, one partial agg on the island key.
# --------------------------------------------------------------------------


def q90_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.col("ts").cast("timestamp_ltz").cast("long").alias("sec"),
        )
    )
    w_all = Window.partitionBy("user_id").orderBy("sec", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "sec", "event_id"
    )
    return (
        ev.withColumn(
            "grp", F.row_number().over(w_all) - F.row_number().over(w_typ)
        )
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("sec").alias("valid_from"),
            F.max("sec").alias("valid_to"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select("user_id", "event_type", "valid_from", "valid_to", "n_events")
    )


Q90_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events WHERE user_id % 10 = 0
), g AS (
  SELECT user_id, event_type, sec,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY sec, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY sec, event_id) AS grp
  FROM ev
)
SELECT user_id, event_type,
       MIN(sec) AS valid_from, MAX(sec) AS valid_to,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, event_type, grp
"""


# --------------------------------------------------------------------------
# q87 — deterministic importance sampling by model score: keep a
# document iff hash-uniform(doc_id) < quality score — the
# quality-weighted downsampling step (higher-scoring docs survive with
# higher probability), reproducible across runs/engines because the
# "random" draw is the md5 of the id. Zero shuffles before the final
# agg; the filter runs inside the scan's codegen span.
# --------------------------------------------------------------------------

_HASH_DENOM = float(1 << 60)  # md5long yields 60-bit non-negative ints


def q87_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") > 0)
    stop = F.size(
        F.filter(F.col("t"), lambda x: x.isin("the", "a", "and", "of", "to"))
    ) / F.size("t")
    score = 1.0 / (1.0 + F.exp(-(F.lit(-2.0) + 6.0 * stop)))
    u = md5long(F.col("doc_id").cast("string")) / F.lit(_HASH_DENOM)
    return (
        d.select("lang", score.alias("s"), u.alias("u"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_if(F.col("u") < F.col("s")).cast("long").alias("n_kept"),
            r4(F.avg(F.when(F.col("u") < F.col("s"), F.col("s")))).alias(
                "avg_kept_score"
            ),
        )
    )


Q87_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), s AS (
  SELECT lang,
         1.0 / (1.0 + exp(-(-2.0 + 6.0 *
           (CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to')))
                 AS DOUBLE) / len(t))))) AS s,
         {MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')}
           / {_HASH_DENOM} AS u
  FROM d WHERE len(t) > 0
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE u < s) AS BIGINT) AS n_kept,
       ROUND(AVG(s) FILTER (WHERE u < s), 4) AS avg_kept_score
FROM s GROUP BY lang
"""


# --------------------------------------------------------------------------
# q88 — corpus-mix rebalancing weights: per (lang, source) shard, the
# sampling multiplier that moves the observed mix to a uniform target
# (weight = target_share / observed_share) — the domain-mixing stage
# that decides how often each shard is drawn during training. Two tiny
# aggregates; the shard table is dimension-sized at any corpus scale.
# --------------------------------------------------------------------------


def q88_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("lang", "source")
    shard = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    # totals derive from the (tiny) shard table as a lazy broadcast
    # 1-row agg — no driver-side count, no second corpus scan
    g = shard.agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_n_shards")
    )
    return shard.crossJoin(F.broadcast(g)).select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_docs"),
        r4(
            (F.col("_tot").cast("double") / F.col("_n_shards")) / F.col("n")
        ).alias("weight"),
    )


Q88_SQL = """
WITH shard AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
), g AS (
  SELECT SUM(n) AS tot, COUNT(*) AS n_shards FROM shard
)
SELECT lang, source, CAST(n AS BIGINT) AS n_docs,
       ROUND((CAST(tot AS DOUBLE) / n_shards) / n, 4) AS weight
FROM shard CROSS JOIN g
"""


# --------------------------------------------------------------------------
# q89 — sliding-window rate anomaly detection: per (event_type, hour),
# flag hours whose event count exceeds 2× the trailing 3-hour mean —
# the ingest-monitoring rule a production feed runs. One agg to the
# hourly grid, one window over it (the windowed table is
# hours × types — tiny at any corpus scale, so the window never sees
# raw data).
# --------------------------------------------------------------------------


def q89_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts").cast("timestamp_ltz"))
        .cast("long")
        .alias("hour_sec"),
    )
    hourly = ev.groupBy("event_type", "hour_sec").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_sec")
        .rowsBetween(-3, -1)
    )
    return (
        hourly.withColumn("trail", F.avg("n").over(w))
        .filter(F.col("trail").isNotNull())
        .select(
            "event_type",
            "hour_sec",
            F.col("n").cast("long").alias("n"),
            r4(F.col("trail")).alias("trailing_mean"),
            (F.col("n") > 2 * F.col("trail")).alias("is_anomaly"),
        )
    )


Q89_SQL = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_sec,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, hour_sec, n,
         AVG(n) OVER (PARTITION BY event_type ORDER BY hour_sec
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS trail
  FROM hourly
)
SELECT event_type, hour_sec, CAST(n AS BIGINT) AS n,
       ROUND(trail, 4) AS trailing_mean,
       n > 2 * trail AS is_anomaly
FROM t WHERE trail IS NOT NULL
"""


# --------------------------------------------------------------------------
# q93 — last-touch attribution: each purchase is attributed to the
# user's most recent STRICTLY PRIOR click within a 7-day lookback —
# the marketing-attribution / event-linkage primitive. One window per
# user carries the running last-click time (rows-frame ending at the
# previous row, so same-timestamp ties can't self-attribute); total
# order pinned by (sec, event_id). Single shuffle on user_id.
# --------------------------------------------------------------------------

_ATTR_WINDOW_SEC = 7 * 86400


def q93_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("sec"))
    ).over(w)
    p = ev.withColumn("lc", last_click).filter(
        F.col("event_type") == "purchase"
    )
    attributed = F.col("lc").isNotNull() & (
        F.col("sec") - F.col("lc") <= _ATTR_WINDOW_SEC
    )
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.count_if(attributed).cast("long").alias("n_attributed"),
        r4(F.avg(F.when(attributed, F.col("sec") - F.col("lc")))).alias(
            "avg_gap_sec"
        ),
    )


Q93_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), p AS (
  SELECT event_type, sec,
         MAX(CASE WHEN event_type = 'click' THEN sec END)
           OVER (PARTITION BY user_id ORDER BY sec, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc
  FROM ev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(*) FILTER (WHERE lc IS NOT NULL
                             AND sec - lc <= {_ATTR_WINDOW_SEC})
            AS BIGINT) AS n_attributed,
       ROUND(AVG(sec - lc) FILTER (WHERE lc IS NOT NULL
                                   AND sec - lc <= {_ATTR_WINDOW_SEC}), 4)
         AS avg_gap_sec
FROM p WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# q94 — retention cohorts: users grouped by first-signup week, counted
# as retained in each subsequent activity week — the cohort matrix.
# First-touch is a partial agg, the matrix one distinct-count agg over
# the (cohort, offset) grid; the user×week table is the only shuffle.
# --------------------------------------------------------------------------

_WEEK = 7 * 86400


def q94_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (F.col("ts").cast("timestamp_ltz").cast("long") / _WEEK)
        .cast("long")
        .alias("week"),
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("week").alias("w0"))
    )
    return (
        ev.join(cohort, on="user_id")
        .filter(F.col("week") >= F.col("w0"))
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("week") - F.col("w0")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


Q94_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // {_WEEK} AS week
  FROM events
), cohort AS (
  SELECT user_id, MIN(week) AS w0 FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT c.w0 AS cohort_week, e.week - c.w0 AS week_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM ev e JOIN cohort c ON e.user_id = c.user_id
WHERE e.week >= c.w0
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q95 — rolling 7-day unique users per day (the DAU/WAU overlap
# metric). Sliding distinct counts don't compose in a window frame, so
# the plan is day-grid × trailing-range join over the DISTINCT
# (day, user) table — which is already orders smaller than the raw
# stream; the range join fans out ≤7× before the final distinct-count
# agg. (The approximate alternative at extreme scale is per-day HLL
# sketch union — q44 demonstrates the sketch machinery.)
# --------------------------------------------------------------------------


def q95_rolling_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        load(spark, sf_dir, "events")
        .select(
            (F.col("ts").cast("timestamp_ltz").cast("long") / 86400)
            .cast("long")
            .alias("day"),
            "user_id",
        )
        .distinct()
    )
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    return (
        days.join(
            du,
            (F.col("day") <= F.col("d")) & (F.col("day") > F.col("d") - 7),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
        .select(F.col("d").alias("day"), "wau")
    )


Q95_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id
  FROM events
), days AS (SELECT DISTINCT day AS d FROM du)
SELECT d AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM days JOIN du ON du.day <= days.d AND du.day > days.d - 7
GROUP BY d
"""


# --------------------------------------------------------------------------
# q96 — behavioral sequence mining: the top-10 event-type trigrams
# across all user streams (total order per user pinned by (ts,
# event_id)) — the session-pattern discovery op. Two LEADs share one
# user_id window sort, then one count agg and one global top-k window
# over the tiny (≤ |types|³) trigram table.
# --------------------------------------------------------------------------


def q96_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    tri = (
        ev.withColumn("b", F.lead("event_type", 1).over(w))
        .withColumn("c", F.lead("event_type", 2).over(w))
        .filter(F.col("c").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "b", "c").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wr = Window.orderBy(F.desc("cnt"), F.asc("trigram"))
    return (
        tri.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 10)
        .select("trigram", "cnt", F.col("rank").cast("int").alias("rank"))
    )


Q96_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events
), tri AS (
  SELECT event_type || '>' ||
         LEAD(event_type, 1) OVER w || '>' ||
         LEAD(event_type, 2) OVER w AS trigram
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
), cnt AS (
  SELECT trigram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tri WHERE trigram IS NOT NULL GROUP BY trigram
)
SELECT trigram, cnt, CAST(rank AS INT) AS rank FROM (
  SELECT trigram, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, trigram) AS rank
  FROM cnt
) WHERE rank <= 10
"""


# --------------------------------------------------------------------------
# q97 — token-distribution entropy per document (vocabulary-richness
# quality signal; degenerate low-entropy docs are the repetition/spam
# tail q82's bigram ratio also catches, measured information-
# theoretically here). Explode → per-(doc, token) partial agg →
# per-doc entropy fold → per-lang rollup; the (doc, token) shuffle is
# the only data-proportional exchange.
# --------------------------------------------------------------------------


def q97_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    per_tok = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = (
        per_tok.withColumn(
            "n", F.sum("c").over(Window.partitionBy("doc_id"))
        )
        .select(
            "doc_id",
            "lang",
            (-(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("term").alias("h"))
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        r4(F.avg("h")).alias("avg_entropy"),
        r4(F.max("h")).alias("max_entropy"),
    )


Q97_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({TOKENS_SQL.format(x='text')}) AS tok
  FROM documents
), per_tok AS (
  SELECT doc_id, lang, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3
), per_doc AS (
  SELECT doc_id, lang,
         SUM(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h
  FROM (SELECT *, SUM(c) OVER (PARTITION BY doc_id) AS n FROM per_tok)
  GROUP BY doc_id, lang
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(h), 4) AS avg_entropy,
       ROUND(MAX(h), 4) AS max_entropy
FROM per_doc GROUP BY lang
"""


# --------------------------------------------------------------------------
# q109 — the hashing trick (feature hashing): tokens map to a fixed
# 64-bucket feature space via an engine-portable md5 hash — the
# vocabulary-free vectorization stage (HashingTF) that needs no fitted
# dictionary and therefore no extra pass or broadcast at 100 TB. One
# explode + one partial-agg shuffle on the bucket id; per-document
# vectors would group by (doc_id, bucket) with the same plan shape.
# --------------------------------------------------------------------------

_FH_BUCKETS = 64


def q109_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    return (
        d.select(
            "doc_id", (md5long(F.col("tok")) % _FH_BUCKETS).alias("feature_idx")
        )
        .groupBy("feature_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
    )


Q109_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
)
SELECT {MD5LONG_SQL.format(x='tok')} % {_FH_BUCKETS} AS feature_idx,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM tok GROUP BY 1
"""


# --------------------------------------------------------------------------
# q110 — heavy hitters via per-partition Misra-Gries summaries: each
# partition keeps k=64 decrementing counters over its token stream
# (mapInPandas, one pass, O(k) state — the mergeable-summaries pattern
# from Agarwal et al., "Mergeable Summaries", PODS'12), the per-
# partition candidate sets merge with a k-bounded groupBy, and the
# guarantee — every token with global count > N/k survives the merge —
# is ASSERTED against the exact top-10: the emitted `in_sketch` flag
# must be uniformly true, and the oracle twin hardcodes TRUE (the same
# error-bound-boolean trick as the HLL/approx-percentile queries).
# On this corpus vocab < k, so the sketch is exact; at web scale k is
# sized 1/θ for support threshold θ and the exact-count branch drops.
# --------------------------------------------------------------------------

_MG_K = 64


def _mg_partition(it):
    import pandas as pd

    counters: dict = {}
    for pdf in it:
        for tok in pdf["tok"]:
            if tok in counters:
                counters[tok] += 1
            elif len(counters) < _MG_K:
                counters[tok] = 1
            else:
                dead = [t for t, c in counters.items() if c == 1]
                for t in counters:
                    counters[t] -= 1
                for t in dead:
                    del counters[t]
    yield pd.DataFrame(
        {"tok": list(counters), "mg_cnt": [counters[t] for t in counters]}
    )


def q110_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    sketch = (
        d.mapInPandas(_mg_partition, "tok string, mg_cnt long")
        .groupBy("tok")
        .agg(F.sum("mg_cnt").alias("mg_cnt"))
    )
    exact = d.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    top = exact.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 10
    )
    return (
        top.join(sketch.withColumnRenamed("tok", "stok"),
                 top.tok == F.col("stok"), "left")
        .select(
            "tok", "cnt", F.col("stok").isNotNull().alias("in_sketch")
        )
    )


Q110_SQL = f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
), exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY tok
)
SELECT tok, cnt, TRUE AS in_sketch FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn FROM exact
) WHERE rn <= 10
"""


# --------------------------------------------------------------------------
# q111 — bloom-filter-pruned semi-join: the runtime-filter pattern
# (Spark's InjectRuntimeFilter / DPP made explicit). The small filtered
# dimension builds a 2-hash md5 bit set, broadcast as ONE array row;
# the fact side drops non-members BEFORE the exact semi-join, so at
# 100 TB the shuffle carries only probable matches. False positives are
# killed by the exact join — the oracle twin is the plain semi-join,
# and equality proves the bloom stage admits every true match (no
# false negatives, the bloom invariant). In production the array
# becomes a real BloomFilter via bloom_filter_agg; the plan shape —
# build-broadcast-prefilter-join — is identical.
# --------------------------------------------------------------------------

_BLOOM_M = 4096


def _bloom_hashes(keycol):
    k = keycol.cast("string")
    return (
        md5long(k) % _BLOOM_M,
        md5long(F.concat(k, F.lit("#2"))) % _BLOOM_M,
    )


def q111_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    h1, h2 = _bloom_hashes(F.col("c_custkey"))
    bits = (
        cust.select(F.explode(F.array(h1, h2)).alias("pos"))
        .distinct()
        .agg(F.array_sort(F.collect_set("pos")).alias("bits"))
    )
    orders = load(spark, sf_dir, "orders")
    o1, o2 = _bloom_hashes(F.col("o_custkey"))
    pruned = (
        orders.crossJoin(F.broadcast(bits))
        .filter(
            F.array_contains("bits", o1) & F.array_contains("bits", o2)
        )
        .drop("bits")
    )
    return (
        pruned.join(
            F.broadcast(cust.select("c_custkey")),
            pruned.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


Q111_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q112 — bigram language-model scoring with add-one smoothing: corpus
# bigram/unigram tables, then each document's mean −ln p(b|a) where
# p(b|a) = (C(a b)+1)/(C(a)+V) — the n-gram upgrade of q80's KenLM-
# style perplexity filter. The count tables are vocab-sized (broadcast
# at any corpus scale); the corpus shuffles once on doc_id for the
# per-document mean. Bigrams are built array-side (zip of two slices)
# so the explode happens exactly once.
# --------------------------------------------------------------------------


def q112_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", tokens(F.col("text")).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    pairs = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", "lang", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            "lang",
            F.col("p.a").alias("a"),
            F.concat("p.a", F.lit(" "), "p.b").alias("bg"),
        )
    )
    c2 = bg.groupBy(F.col("bg").alias("bg2")).agg(
        F.count(F.lit(1)).alias("c2")
    )
    nll = -F.log(
        (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    doc = (
        bg.join(F.broadcast(c2), bg.bg == F.col("bg2"))
        .join(F.broadcast(uni.withColumnRenamed("tok", "a")), on="a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "lang", nll.alias("nll"))
        .groupBy("doc_id", "lang")
        .agg(F.avg("nll").alias("doc_nll"))
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        r4(F.avg("doc_nll")).alias("avg_nll"),
        r4(F.min("doc_nll")).alias("min_nll"),
        r4(F.max("doc_nll")).alias("max_nll"),
    )


Q112_SQL = f"""
WITH tokd AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), tok AS (
  SELECT doc_id, unnest(t) AS tok FROM tokd
), uni AS (SELECT tok, COUNT(*) AS c1 FROM tok GROUP BY tok),
v AS (SELECT COUNT(*) AS v FROM uni),
bgt AS (
  SELECT doc_id, lang, t[i] AS a, t[i] || ' ' || t[i + 1] AS bg
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
), c2 AS (SELECT bg, COUNT(*) AS c2 FROM bgt GROUP BY bg),
doc AS (
  SELECT b.doc_id, b.lang,
         AVG(-ln((c2.c2 + 1.0) / (u.c1 + v.v))) AS doc_nll
  FROM bgt b JOIN c2 ON b.bg = c2.bg JOIN uni u ON b.a = u.tok CROSS JOIN v
  GROUP BY 1, 2
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(doc_nll), 4) AS avg_nll,
       ROUND(MIN(doc_nll), 4) AS min_nll,
       ROUND(MAX(doc_nll), 4) AS max_nll
FROM doc GROUP BY lang
"""


# --------------------------------------------------------------------------
# q118 — vocabulary-growth curve across ingestion shards: 5-gram
# fingerprints are attributed to the FIRST shard (doc_id mod 8,
# ordered) that contains them, giving per-shard new-gram counts and the
# cumulative gram vocabulary — the corpus-growth / dedup-payoff audit
# run while ingesting a crawl (grams, not unigrams: this corpus's token
# vocab is ~31 words, saturating in shard 0, while the gram space keeps
# growing — the regime real crawls are in). Plan: one explode + one
# (gram-fingerprint → min shard) agg — the vocabulary-sized shuffle on
# 8-byte keys — then a tiny per-shard rollup + running sum.
# --------------------------------------------------------------------------

_VG_SHARDS = 8


def q118_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _VG_SHARDS).alias("shard"),
        tokens(F.col("text")).alias("t"),
    ).select("shard", F.explode(_shingles()).alias("gram"))
    first = d.select("shard", md5long(F.col("gram")).alias("tok")).groupBy(
        "tok"
    ).agg(F.min("shard").alias("shard"))
    per = first.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_new_tokens")
    )
    w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "shard",
        "n_new_tokens",
        F.sum("n_new_tokens").over(w).cast("long").alias("cum_vocab"),
    )


Q118_SQL = f"""
WITH tokd AS (
  SELECT doc_id % {_VG_SHARDS} AS shard,
         {TOKENS_SQL.format(x='text')} AS t
  FROM documents
), tok AS (
  SELECT shard, {MD5LONG_SQL.format(x='gram')} AS tok FROM (
    SELECT shard, unnest(
      CASE WHEN len(t) < {_DECON_N} THEN []::VARCHAR[]
      ELSE list_transform(t[1:len(t) - {_DECON_N - 1}],
                          (x, i) -> array_to_string(t[i:i + {_DECON_N - 1}], ' '))
      END) AS gram
    FROM tokd)
), first AS (SELECT tok, MIN(shard) AS shard FROM tok GROUP BY tok),
per AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_new_tokens
        FROM first GROUP BY shard)
SELECT shard, n_new_tokens,
       CAST(SUM(n_new_tokens) OVER (ORDER BY shard
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab
FROM per
"""


# --------------------------------------------------------------------------
# q119 — cross-source contamination matrix: for every source pair, how
# many distinct 5-gram fingerprints they share, and the gram-level
# Jaccard — the pairwise generalization of q79's benchmark
# decontamination (which checks one held-out source against the rest).
# The self-join key is the 60-bit gram fingerprint (8-byte shuffle keys
# at any scale); per-gram fan-out is bounded by the number of sources
# carrying the gram (≤ 20 here — at web scale hot boilerplate grams get
# the q27/q70-style df cap before the join). All counts integer; the
# Jaccard divides identical integers, rendered at 6dp.
# --------------------------------------------------------------------------


def q119_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", tokens(F.col("text")).alias("t")
    )
    grams = (
        d.select("source", F.explode(_shingles()).alias("gram"))
        .select("source", md5long(F.col("gram")).alias("g"))
        .distinct()
    )
    per_src = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(F.col("source").alias("s1"), "g")
    b = grams.select(F.col("source").alias("s2"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    n1 = per_src.select(F.col("source").alias("s1"), F.col("n_grams").alias("g1"))
    n2 = per_src.select(F.col("source").alias("s2"), F.col("n_grams").alias("g2"))
    return (
        shared.join(F.broadcast(n1), "s1")
        .join(F.broadcast(n2), "s2")
        .select(
            "s1",
            "s2",
            F.col("shared").cast("long").alias("shared_grams"),
            F.round(
                F.col("shared") / (F.col("g1") + F.col("g2") - F.col("shared")),
                6,
            ).alias("gram_jaccard"),
        )
    )


Q119_SQL = f"""
WITH tokd AS (
  SELECT source, {TOKENS_SQL.format(x='text')} AS t FROM documents
), gramtxt AS (
  SELECT source, unnest(
    CASE WHEN len(t) < {_DECON_N} THEN []::VARCHAR[]
    ELSE list_transform(t[1:len(t) - {_DECON_N - 1}],
                        (x, i) -> array_to_string(t[i:i + {_DECON_N - 1}], ' '))
    END) AS gram
  FROM tokd
), grams AS (
  SELECT DISTINCT source, {MD5LONG_SQL.format(x='gram')} AS g FROM gramtxt
), per_src AS (SELECT source, COUNT(*) AS n_grams FROM grams GROUP BY 1)
SELECT a.source AS s1, b.source AS s2,
       CAST(COUNT(*) AS BIGINT) AS shared_grams,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / (MIN(p1.n_grams) + MIN(p2.n_grams) - COUNT(*)), 6)
         AS gram_jaccard
FROM grams a
JOIN grams b ON a.g = b.g AND a.source < b.source
JOIN per_src p1 ON a.source = p1.source
JOIN per_src p2 ON b.source = p2.source
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q126 — the corpus-prep PIPELINE's stage accounting
# (plans/corpus_prep.py): benchmark hold-out → prefix near-dup →
# quality → decontamination → packing, each dropped doc attributed to
# its first failing stage. The oracle replays the entire multi-stage
# plan as one SQL chain (the stage flags are order-independent
# per-document predicates, so a CASE with the same priority reproduces
# the attribution exactly) — a value-hash check over the WHOLE pipeline
# composition, not just its pieces.
# --------------------------------------------------------------------------


def q126_corpus_prep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.corpus_prep import prepare_corpus

    prep = prepare_corpus(spark, load(spark, sf_dir, "documents"))
    # the driver contract returns a lazy DataFrame; release the plan's
    # cache immediately (GraphBuild-style caller-managed lifetime isn't
    # available here, and recomputing the one base scan is cheap)
    prep.unpersist()
    return prep.stats


Q126_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), f AS (
  SELECT doc_id, lang, len(t) AS tok_n,
         doc_id % 20 = 0 AS is_bench,
         {MD5LONG_SQL.format(x="array_to_string(t[1:5], ' ')")} AS fp,
         CASE WHEN len(t) > 0 THEN 1.0 / (1.0 + exp(-({_QW['b']}
              + {_QW['stop']} * (CAST(len(list_filter(t,
                  x -> x IN ('the','a','and','of','to'))) AS DOUBLE) / len(t))
              + {_QW['wlen']} * (CAST(list_sum(list_transform(t,
                  x -> len(x))) AS DOUBLE) / len(t))
              + {_QW['loglen']} * ln(1.0 + len(t)))))
         ELSE 0.0 END AS score
  FROM d
), flag AS (
  SELECT *,
         (NOT is_bench) AND doc_id <> MIN(CASE WHEN NOT is_bench
             THEN doc_id END) OVER (PARTITION BY fp) AS is_dup
  FROM f
), grams AS (
  SELECT doc_id, {MD5LONG_SQL.format(x='gram')} AS g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(t) < {_DECON_N} THEN []::VARCHAR[]
      ELSE list_transform(t[1:len(t) - {_DECON_N - 1}],
                          (x, i) -> array_to_string(t[i:i + {_DECON_N - 1}], ' '))
      END) AS gram
    FROM d)
), bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
contam AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % 20 <> 0 AND g IN (SELECT g FROM bg)
), lab AS (
  SELECT doc_id, lang, tok_n,
         CASE WHEN is_bench THEN 'benchmark_heldout'
              WHEN is_dup THEN 'near_dup_prefix'
              WHEN score <= 0.40 THEN 'low_quality'
              WHEN doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
              ELSE 'kept' END AS stage
  FROM flag
)
SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok_n) AS BIGINT) AS n_tokens
FROM lab GROUP BY stage
"""


# --------------------------------------------------------------------------
# q136 — weighted sampling WITHOUT replacement (Efraimidis-Spirakis):
# each doc gets key = −ln(u)/w with u the md5-uniform draw and w =
# n_chars (longer docs proportionally likelier); the k smallest keys
# ARE a weighted sample without replacement — one pass, one global
# top-k, no sequential draws (the property that makes E-S the
# distributed answer; q87 is the with-replacement Bernoulli form).
# Deterministic: u is the hash draw, ln on identical doubles, ties
# impossible (distinct u). Emits the per-lang composition of the
# sample, which is the quantity a corpus-mix designer reads.
# --------------------------------------------------------------------------

_ES_K = 100


def q136_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("w")
    )
    u = md5long(F.col("doc_id").cast("string")) / F.lit(_HASH_DENOM)
    key = -F.log(u) / F.col("w")
    # orderBy().limit(K) plans as a distributed TakeOrderedAndProject
    # (per-partition top-K + driver merge of K·P rows) — never the
    # single-partition global row_number window.
    return (
        d.select("doc_id", "lang", key.alias("key"))
        .orderBy(F.asc("key"), F.asc("doc_id"))
        .limit(_ES_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


Q136_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang,
         -ln(({MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')})
             / {_HASH_DENOM}) / CAST(n_chars AS DOUBLE) AS key
  FROM documents
), top AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rn FROM keyed
  ) WHERE rn <= {_ES_K}
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM top GROUP BY lang
"""


# --------------------------------------------------------------------------
# q148 — Zipf fit of the token rank-frequency curve: the OLS slope of
# ln(freq) on ln(rank) — the corpus-sanity exponent (natural text ≈ −1;
# synthetic/templated corpora flatten or steepen it). Counts are
# integers, ranks come from one global sort with a count+token
# tie-break, and REGR_SLOPE over identical doubles renders at 6dp.
# --------------------------------------------------------------------------


def q148_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    cnt = d.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = cnt.withColumn("rank", F.row_number().over(w))
    lr = F.log(F.col("rank").cast("double"))
    lf = F.log(F.col("n").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
        F.max("n").cast("long").alias("top_freq"),
    )


Q148_SQL = f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
), cnt AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
ranked AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank FROM cnt
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
       ROUND(REGR_SLOPE(ln(CAST(n AS DOUBLE)),
                        ln(CAST(rank AS DOUBLE))), 6) AS zipf_slope,
       ROUND(REGR_R2(ln(CAST(n AS DOUBLE)),
                     ln(CAST(rank AS DOUBLE))), 6) AS r2,
       CAST(MAX(n) AS BIGINT) AS top_freq
FROM ranked
"""


# --------------------------------------------------------------------------
# q149 — referential-integrity audit across the fact's three foreign
# keys: orphan counts and coverage for lineitem→orders/part/supplier —
# the FK health check a pipeline runs before joining (kg67 is the graph
# flavor; this is the relational one). Each check is one anti-join
# against a key-distinct dimension; the three results melt to one
# (fk, n_rows, n_orphans, coverage) table.
# --------------------------------------------------------------------------


def q149_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    checks = [
        ("l_orderkey->orders", "l_orderkey", "orders", "o_orderkey"),
        ("l_partkey->part", "l_partkey", "part", "p_partkey"),
        ("l_suppkey->supplier", "l_suppkey", "supplier", "s_suppkey"),
    ]
    outs = []
    for name, fk, dim, pk in checks:
        d = load(spark, sf_dir, dim).select(F.col(pk).alias(fk)).distinct()
        orphans = li.select(fk).join(F.broadcast(d), fk, "left_anti")
        outs.append(
            li.agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            ).crossJoin(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_orphans")
                )
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "fk",
        "n_rows",
        "n_orphans",
        # try_divide: empty lineitem → NULL coverage (DuckDB x/0)
        F.round(
            1.0 - F.try_divide("n_orphans", "n_rows"), 6
        ).alias("coverage"),
    )


Q149_SQL = """
WITH checks AS (
  SELECT 'l_orderkey->orders' AS fk,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
           AS n_orphans
  UNION ALL
  SELECT 'l_partkey->part',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
          WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
  UNION ALL
  SELECT 'l_suppkey->supplier',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
          WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
)
SELECT fk, n_rows, n_orphans,
       ROUND(1.0 - CAST(n_orphans AS DOUBLE) / n_rows, 6) AS coverage
FROM checks
"""


# --------------------------------------------------------------------------
# q160 — snapshot diff: classify every row across two table versions as
# added / removed / changed / unchanged by comparing row fingerprints
# under a full-outer join on the key. v2 is derived deterministically
# from v1 (md5-bucket: bucket 1 dropped, bucket 0 edited, bucket 2
# duplicated under a shifted key) so both engines diff the same pair.
# The fingerprint travels as one md5 string — at 100 TB the diff
# shuffles 16-byte digests, never the payload columns; the same shape
# backs a snapshot-to-snapshot Iceberg audit.
# --------------------------------------------------------------------------

_DIFF_KEY_SHIFT = 100_000_000


def q160_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    v1 = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    h = v1.withColumn("h", md5long(F.col("text")) % 10)
    v2 = (
        h.filter(F.col("h") != 1)
        .select(
            "doc_id",
            "text",
            "lang",
            F.when(F.col("h") == 0, F.lit("edited"))
            .otherwise(F.col("source"))
            .alias("source"),
            "n_chars",
        )
        .unionByName(
            h.filter(F.col("h") == 2).select(
                (F.col("doc_id") + _DIFF_KEY_SHIFT).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    )

    def fp(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(f"id{name}"),
            F.md5(
                F.concat_ws("|", "text", "lang", "source", "n_chars")
            ).alias(f"fp{name}"),
        )

    d = fp(v1, "1").join(
        fp(v2, "2"), F.col("id1") == F.col("id2"), "full_outer"
    )
    status = (
        F.when(F.col("id1").isNull(), F.lit("added"))
        .when(F.col("id2").isNull(), F.lit("removed"))
        .when(F.col("fp1") != F.col("fp2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        d.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


Q160_SQL = f"""
WITH h AS (
  SELECT doc_id, text, lang, source, n_chars,
         {MD5LONG_SQL.format(x='text')} % 10 AS h
  FROM documents
), v2 AS (
  SELECT doc_id, text, lang,
         CASE WHEN h = 0 THEN 'edited' ELSE source END AS source, n_chars
  FROM h WHERE h <> 1
  UNION ALL
  SELECT doc_id + {_DIFF_KEY_SHIFT}, text, lang, source, n_chars
  FROM h WHERE h = 2
), f1 AS (
  SELECT doc_id, md5(concat_ws('|', text, lang, source, n_chars)) AS fp
  FROM documents
), f2 AS (
  SELECT doc_id, md5(concat_ws('|', text, lang, source, n_chars)) AS fp
  FROM v2
), d AS (
  SELECT CASE WHEN f1.doc_id IS NULL THEN 'added'
              WHEN f2.doc_id IS NULL THEN 'removed'
              WHEN f1.fp <> f2.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM f1 FULL OUTER JOIN f2 ON f1.doc_id = f2.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY status
"""


# --------------------------------------------------------------------------
# q166 — quantile normalization across sources: each document's length
# is replaced by the GLOBAL length at the same relative rank, so every
# source's length distribution maps onto the corpus-wide one (the
# batch-effect correction genomics pipelines run, applied to corpus
# length skew). All index arithmetic is integer:
# idx = ceil(r·N / n_s) = (r·N + n_s − 1) // n_s, ties broken by
# doc_id. Scale path (VERDICT r2): the q37-style pre-aggregated value
# histogram replaces every row-cardinality sort — per-source ranks come
# from a (source, value) histogram with windows PARTITIONED by source,
# and the global rank→value map is the value histogram's [lo, hi] rank
# ranges, joined to each row's idx by a bucketed (equi-join + residual
# range predicate) broadcast join — never a rank-per-row table.
# --------------------------------------------------------------------------

_Q166_BUCKETS = 4096


def q166_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # per-source rank via per-(source, value) histogram: offset windows
    # are partitioned by source and run over the histogram only; the
    # per-row tie-break window is partitioned by (source, value).
    hist_s = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = hist_s.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy("source")).alias("n_s"),
    )
    w_tie = Window.partitionBy("source", "n_chars").orderBy("doc_id")
    # null-safe histogram join: the oracle ranks via ROW_NUMBER windows
    # (which treat NULL as an ordinary partition value), so a NULL
    # (source, n_chars) row must keep its rank instead of falling out
    # of the equi-join (deg_nulls sweep)
    offs_r = offs.select(
        F.col("source").alias("_src"),
        F.col("n_chars").alias("_nc"),
        "_off",
        "n_s",
    )
    s = d.join(
        offs_r,
        F.col("source").eqNullSafe(F.col("_src"))
        & F.col("n_chars").eqNullSafe(F.col("_nc")),
    ).withColumn("r", F.col("_off") + F.row_number().over(w_tie))
    # global rank→value map: value v owns global ranks [lo, hi]; join
    # idx into the ranges via fixed-width rank buckets (equi-join key)
    # so the broadcast join stays an equi-join, not a nested loop.
    n_total = d.count()
    width = max(1, n_total // _Q166_BUCKETS)
    w_g = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    hist_g = (
        d.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            F.col("n_chars").alias("gval"),
            (F.sum("_cnt").over(w_g) - F.col("_cnt") + 1).alias("lo"),
            F.sum("_cnt").over(w_g).alias("hi"),
        )
    )
    gh = hist_g.select(
        "gval",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor((F.col("lo") - 1) / width),
                F.floor((F.col("hi") - 1) / width),
            )
        ).alias("gb"),
    )
    idx = F.floor(
        (F.col("r") * F.lit(n_total) + F.col("n_s") - 1) / F.col("n_s")
    ).cast("long")
    s = s.withColumn("gr", idx).withColumn(
        "b", F.floor((F.col("gr") - 1) / width)
    )
    return (
        s.join(
            F.broadcast(gh),
            (s["b"] == gh["gb"])
            & (s["gr"] >= gh["lo"])
            & (s["gr"] <= gh["hi"]),
        )
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("gval").cast("long").alias("normalized"),
        )
    )


Q166_SQL = """
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
g AS (
  SELECT n_chars AS gval,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gr
  FROM d
), nt AS (SELECT COUNT(*) AS n FROM d),
s AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM d
)
SELECT s.doc_id, s.source, CAST(s.n_chars AS BIGINT) AS n_chars,
       CAST(g.gval AS BIGINT) AS normalized
FROM s CROSS JOIN nt
JOIN g ON g.gr = (s.r * nt.n + s.n_s - 1) // s.n_s
"""


# --------------------------------------------------------------------------
# q167 — calibration bins (reliability diagram) for q81's quality
# model against the lang='en' pseudo-label: decile bins of the score,
# each with its count, mean predicted score, and observed positive
# rate. Reuses q81's `_quality_score` / `_QSCORE_CTES` VERBATIM so the
# two stages score identically; the bin edge clamp mirrors q132's
# histogram idiom. Bin membership compares a libm-computed double to a
# decile edge — a 1-ulp engine divergence exactly on an edge is the
# only (astronomically unlikely) mismatch channel, same exposure q81's
# 0.5 keep-threshold already carries.
# --------------------------------------------------------------------------


def q167_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select("lang", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    scored = d.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        _quality_score(F.col("t")).alias("s"),
    )
    b = F.least(F.floor(F.col("s") * 10), F.lit(9)).cast("long")
    return (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("s"), 6).alias("mean_score"),
            F.round(F.avg("y"), 6).alias("frac_positive"),
        )
    )


Q167_SQL = f"""
{_QSCORE_CTES}
SELECT LEAST(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(s), 6) AS mean_score,
       ROUND(AVG(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 6)
         AS frac_positive
FROM s GROUP BY 1
"""


# --------------------------------------------------------------------------
# q179 — snapshot time travel through the engine's snapshot store
# (plans/snapshots.py — the Iceberg-semantics layer): create v0 from a
# deterministic subset of documents, MERGE a deterministic update+insert
# batch to make v1, then read BOTH versions back via `read(as_of=...)`
# and report each version's row count and edited-row count. The same
# md5-bucket derivation as q160, but routed through create/merge/
# time-travel so the commit protocol itself sits inside the value-hash
# gate (the pytest suite checks the store's mechanics; this checks its
# arithmetic end to end against DuckDB's replay of the derivation).
# --------------------------------------------------------------------------


def q179_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..plans.snapshots import SnapshotTable

    v1 = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    h = v1.withColumn("h", md5long(F.col("text")) % 10)
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="q179_"))
    t.create(h.filter(F.col("h") != 1).drop("h"), keys="doc_id", n_buckets=8)
    updates = (
        h.filter(F.col("h") == 0)
        .select(
            "doc_id", "text", "lang", F.lit("edited").alias("source"),
            "n_chars",
        )
        .unionByName(
            h.filter(F.col("h") == 2).select(
                (F.col("doc_id") + _DIFF_KEY_SHIFT).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    )
    t.merge(updates)

    def stats(version: int) -> DataFrame:
        return t.read(as_of=version).agg(
            F.lit(version).cast("long").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_if(F.col("source") == "edited")
            .cast("long")
            .alias("n_edited"),
        )

    return stats(0).unionByName(stats(1))


Q179_SQL = f"""
WITH h AS (
  SELECT {MD5LONG_SQL.format(x='text')} % 10 AS h FROM documents
)
SELECT CAST(0 AS BIGINT) AS version,
       CAST(COUNT(*) FILTER (WHERE h <> 1) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS n_edited
FROM h
UNION ALL
SELECT 1,
       CAST(COUNT(*) FILTER (WHERE h <> 1)
            + COUNT(*) FILTER (WHERE h = 2) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE h = 0) AS BIGINT)
FROM h
"""


# --------------------------------------------------------------------------
# q181 — CSV sink→source round trip with byte-integrity proof: write
# the documents table through the CSV writer (quoteAll + multiLine so
# embedded quotes/newlines survive), read it back with an explicit
# schema, and emit count / Σn_chars / bit_xor(md5long(text)) — the
# text-hash XOR matches the oracle's direct parquet scan ONLY if every
# byte of every document survived the quote/escape cycle. This puts
# the CSV format surface (S6/S8's sink family) inside the value-hash
# gate instead of pytest alone.
# --------------------------------------------------------------------------


def q181_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="q181_"), "docs_csv")
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, text string, lang string, n_chars long")
        .option("header", True)
        .option("multiLine", True)
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10)"
            " as bigint))"
        ).alias("text_xor"),
    )


Q181_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       bit_xor({MD5LONG_SQL.format(x='text')}) AS text_xor
FROM documents
"""


# --------------------------------------------------------------------------
# q190 — data-contract audit (expectations-lite): one scan of the fact
# table evaluates the whole rule book — not-null, key-uniqueness,
# timestamp-range, enum-membership, and non-negativity — as conditional
# counts in a single aggregate, then melts the wide result to
# (col_name, rule, n_violations) rows with stack(). The per-rule
# quarantine variant routes failing ROWS to plans/sinks.py's
# quarantine side-output; this is the summary face. All counts exact.
# --------------------------------------------------------------------------

_CONTRACT_TYPES = ("click", "view", "purchase", "signup", "error")
_TS_LO, _TS_HI = 1_577_836_800, 1_893_456_000  # [2020-01-01, 2030-01-01)


def q190_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    es = F.col("ts").cast("timestamp_ltz").cast("long")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", es.alias("es")
    )
    a = ev.agg(
        F.count_if(F.col("event_id").isNull()).alias("id_null"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("id_dup"),
        F.count_if(F.col("es").isNull()).alias("ts_null"),
        F.count_if(
            (F.col("es") < _TS_LO) | (F.col("es") >= _TS_HI)
        ).alias("ts_range"),
        F.count_if(
            ~F.col("event_type").isin(*_CONTRACT_TYPES)
        ).alias("type_enum"),
        F.count_if(F.col("value").isNull()).alias("val_null"),
        F.count_if(F.col("value") < 0).alias("val_neg"),
        F.count_if(F.col("user_id").isNull()).alias("uid_null"),
    )
    return a.selectExpr(
        "stack(8, "
        "'event_id', 'not_null', id_null, "
        "'event_id', 'unique', id_dup, "
        "'ts', 'not_null', ts_null, "
        "'ts', 'in_range', ts_range, "
        "'event_type', 'in_enum', type_enum, "
        "'value', 'not_null', val_null, "
        "'value', 'non_negative', val_neg, "
        "'user_id', 'not_null', uid_null"
        ") as (col_name, rule, n_violations)"
    ).selectExpr(
        "col_name", "rule", "CAST(n_violations AS BIGINT) AS n_violations"
    )


_CONTRACT_IN = ", ".join(f"'{t}'" for t in _CONTRACT_TYPES)

Q190_SQL = f"""
WITH a AS (
  SELECT
    COUNT(*) FILTER (WHERE event_id IS NULL) AS id_null,
    COUNT(*) - COUNT(DISTINCT event_id) AS id_dup,
    COUNT(*) FILTER (WHERE ts IS NULL) AS ts_null,
    COUNT(*) FILTER (WHERE CAST(floor(epoch(ts)) AS BIGINT) < {_TS_LO}
                        OR CAST(floor(epoch(ts)) AS BIGINT) >= {_TS_HI})
      AS ts_range,
    COUNT(*) FILTER (WHERE event_type NOT IN ({_CONTRACT_IN}))
      AS type_enum,
    COUNT(*) FILTER (WHERE value IS NULL) AS val_null,
    COUNT(*) FILTER (WHERE value < 0) AS val_neg,
    COUNT(*) FILTER (WHERE user_id IS NULL) AS uid_null
  FROM events
)
SELECT 'event_id' AS col_name, 'not_null' AS rule,
       CAST(id_null AS BIGINT) AS n_violations FROM a
UNION ALL SELECT 'event_id', 'unique', CAST(id_dup AS BIGINT) FROM a
UNION ALL SELECT 'ts', 'not_null', CAST(ts_null AS BIGINT) FROM a
UNION ALL SELECT 'ts', 'in_range', CAST(ts_range AS BIGINT) FROM a
UNION ALL SELECT 'event_type', 'in_enum', CAST(type_enum AS BIGINT) FROM a
UNION ALL SELECT 'value', 'not_null', CAST(val_null AS BIGINT) FROM a
UNION ALL SELECT 'value', 'non_negative', CAST(val_neg AS BIGINT) FROM a
UNION ALL SELECT 'user_id', 'not_null', CAST(uid_null AS BIGINT) FROM a
"""


# --------------------------------------------------------------------------
# q191 — overlapping-window chunking (RAG/retrieval prep): each document
# split into 50-token windows at stride 40 (10-token overlap), emitting
# per-chunk token counts and a 60-bit fingerprint. The chunk grid is a
# `sequence()` explode over start offsets — array-native, no Python —
# and the fingerprint reuses the md5long idiom so chunk-level dedup
# (q101's containment audit) can run directly on this table. A trailing
# window is dropped only when the previous chunk already covers all of
# it (n_tokens ≤ width − stride AND a previous chunk exists — the first
# chunk is exempt so short documents keep their single chunk), so the
# kept chunks cover EVERY token of every document and every tokenized
# document appears — the invariants tests/test_analytics_invariants.py
# pins (a half-width drop rule measurably lost document tails; the
# unexempted first chunk lost ≤10-token documents entirely).
# --------------------------------------------------------------------------

_CHUNK_W, _CHUNK_STRIDE = 50, 40


def q191_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("t") - _CHUNK_W + _CHUNK_STRIDE, F.lit(1)),
        F.lit(_CHUNK_STRIDE),
    )
    c = d.select("doc_id", "t", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("t"), F.col("start"), _CHUNK_W)
    return (
        c.select(
            "doc_id",
            # chunk_idx derivable from the stride — no ordinality needed
            ((F.col("start") - 1) / _CHUNK_STRIDE)
            .cast("long")
            .alias("chunk_idx"),
            F.col("start").cast("long").alias("start_tok"),
            F.size(chunk).cast("long").alias("n_tokens"),
            md5long(F.array_join(chunk, " ")).alias("chunk_fp"),
        )
        .filter(
            ((F.col("start_tok") == 1) & (F.col("n_tokens") > 0))
            | (F.col("n_tokens") > _CHUNK_W - _CHUNK_STRIDE)
        )
    )


Q191_SQL = f"""
WITH d AS (
  SELECT doc_id, {TOKENS_SQL.format(x='text')} AS t FROM documents
), c AS (
  SELECT doc_id, t, CAST(u.s AS BIGINT) AS start_tok
  FROM d, UNNEST(generate_series(1,
         greatest(len(t) - {_CHUNK_W} + {_CHUNK_STRIDE}, 1),
         {_CHUNK_STRIDE})) AS u(s)
)
SELECT doc_id, (start_tok - 1) // {_CHUNK_STRIDE} AS chunk_idx, start_tok,
       CAST(len(t[start_tok:start_tok + {_CHUNK_W} - 1]) AS BIGINT)
         AS n_tokens,
       {MD5LONG_SQL.format(
           x=f"array_to_string(t[start_tok:start_tok + {_CHUNK_W} - 1], ' ')"
       )} AS chunk_fp
FROM c
WHERE (start_tok = 1 AND len(t[start_tok:start_tok + {_CHUNK_W} - 1]) > 0)
   OR len(t[start_tok:start_tok + {_CHUNK_W} - 1])
      > {_CHUNK_W} - {_CHUNK_STRIDE}
"""


# --------------------------------------------------------------------------
# q192 — stable train/val/test split assignment: split = md5(doc_id)
# mod 10 → 8/1/1, stratification REPORTED per (lang, split) with each
# stratum's achieved fraction. Hash-based assignment is reproducible
# across runs/engines and independent of row order — the property a
# resumable pipeline needs so re-runs never migrate a document across
# splits. Counts exact; fractions divide integers.
# --------------------------------------------------------------------------


def q192_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    b = md5long(F.col("doc_id").cast("string")) % 10
    split = (
        F.when(b <= 7, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    g = d.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wl = Window.partitionBy("lang")
    return g.select(
        "lang",
        "split",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wl), 6).alias("frac_of_lang"),
    )


Q192_SQL = f"""
WITH d AS (
  SELECT lang,
         CASE WHEN {MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 10 <= 7
              THEN 'train'
              WHEN {MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 10 = 8
              THEN 'val' ELSE 'test' END AS split
  FROM documents
), g AS (
  SELECT lang, split, COUNT(*) AS n FROM d GROUP BY 1, 2
)
SELECT lang, split, CAST(n AS BIGINT) AS n,
       ROUND(n / (1.0 * SUM(n) OVER (PARTITION BY lang)), 6)
         AS frac_of_lang
FROM g
"""


# --------------------------------------------------------------------------
# q220 — DSIR importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document
# by the log-likelihood ratio of a hashed-bigram bag-of-ngrams model of
# the TARGET distribution (here: the English slice) vs the RAW corpus.
# weight(d) = Σ_b n_db · (ln p̂_t[b] − ln p̂_r[b]) over d's bigram
# buckets, with add-0.5 smoothing over B=256 md5 buckets. Scale shape:
# two global bucket histograms (256 rows each — broadcast-joined back),
# one per-(doc,bucket) partial-agg count, one weighted sum per doc; the
# feature space is FIXED-width however large the corpus, which is the
# whole point of hashed DSIR at 100 TB. Oracle: identical hashing +
# smoothing in SQL.
# --------------------------------------------------------------------------

_DSIR_B = 256


def q220_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    pairs = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = toks.select(
        "doc_id", "lang", F.explode(pairs).alias("bg")
    ).withColumn("b", md5long(F.col("bg")) % _DSIR_B)
    db = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("n_db"))
    raw = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        bg.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = bg.agg(
        F.count(F.lit(1)).alias("R"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("T"),
    )
    hist = (
        raw.join(tgt, "b", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.col("ct") + 0.5) / (F.col("T") + 0.5 * _DSIR_B))
                - F.log((F.col("cr") + 0.5) / (F.col("R") + 0.5 * _DSIR_B))
            ).alias("llr"),
        )
    )
    return (
        db.join(F.broadcast(hist), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n_db").cast("long").alias("n_bigrams"),
            r4(F.sum(F.col("n_db") * F.col("llr"))).alias("dsir"),
        )
    )


Q220_SQL = f"""
WITH tokd AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x="text")} AS t FROM documents
), bg AS (
  SELECT doc_id, lang,
         {MD5LONG_SQL.format(x="t[i] || ' ' || t[i + 1]")} % {_DSIR_B} AS b
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
), db AS (
  SELECT doc_id, b, COUNT(*) AS n_db FROM bg GROUP BY 1, 2
), raw AS (SELECT b, COUNT(*) AS cr FROM bg GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS ct FROM bg WHERE lang = 'en' GROUP BY b),
tot AS (
  SELECT COUNT(*) AS R,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS T
  FROM bg
), hist AS (
  SELECT raw.b,
         ln((COALESCE(tgt.ct, 0) + 0.5) / (tot.T + 0.5 * {_DSIR_B}))
         - ln((raw.cr + 0.5) / (tot.R + 0.5 * {_DSIR_B})) AS llr
  FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot
)
SELECT db.doc_id, CAST(SUM(db.n_db) AS BIGINT) AS n_bigrams,
       ROUND(SUM(db.n_db * hist.llr), 4) AS dsir
FROM db JOIN hist ON hist.b = db.b
GROUP BY db.doc_id
"""


# --------------------------------------------------------------------------
# q223 — count-min sketch (Cormode & Muthukrishnan 2005): d=3 hash rows
# × w=64 buckets over the token stream; the estimate for a probe token
# is the MIN over its d bucket counters. The sketch IS a groupBy —
# per-partition partial counts merge associatively, which is the whole
# point (mergeable across executors/days with fixed 3×64 footprint no
# matter the corpus size). Probes: the top-20 true-count tokens
# (deterministic count-desc/token tiebreak). The one-sided error
# guarantee est ≥ true is pinned by pytest. Oracle: identical rows,
# salts, widths in SQL.
# --------------------------------------------------------------------------

_CMS_D, _CMS_W = 3, 64


def q223_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    true = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
    rows = []
    for i in range(_CMS_D):
        rows.append(
            tok.select(
                F.lit(i).alias("row"),
                (
                    md5long(F.concat(F.col("tok"), F.lit(f"#{i}")))
                    % _CMS_W
                ).alias("bucket"),
            )
        )
    stream = rows[0]
    for r in rows[1:]:
        stream = stream.unionByName(r)
    cms = stream.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    probes = true.orderBy(F.desc("true_c"), F.asc("tok")).limit(20)
    probe_cells = probes.select(
        "tok",
        "true_c",
        *[
            (
                md5long(F.concat(F.col("tok"), F.lit(f"#{i}")))
                % _CMS_W
            ).alias(f"b{i}")
            for i in range(_CMS_D)
        ],
    )
    est = probe_cells
    for i in range(_CMS_D):
        cmsr = cms.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("c").alias(f"c{i}")
        )
        est = est.join(F.broadcast(cmsr), f"b{i}")
    return est.select(
        "tok",
        F.col("true_c").cast("long").alias("true_c"),
        F.least(*[F.col(f"c{i}") for i in range(_CMS_D)])
        .cast("long")
        .alias("cms_est"),
    )


def _q223_sql() -> str:
    cells = "\nUNION ALL\n".join(
        f"SELECT {i} AS row, "
        + MD5LONG_SQL.format(x=f"tok || '#{i}'")
        + f" % {_CMS_W} AS bucket FROM tok"
        for i in range(_CMS_D)
    )
    joins = "\n".join(
        f"JOIN cms c{i} ON c{i}.row = {i} AND c{i}.bucket = "
        + MD5LONG_SQL.format(x=f"p.tok || '#{i}'")
        + f" % {_CMS_W}"
        for i in range(_CMS_D)
    )
    least = ", ".join(f"c{i}.c" for i in range(_CMS_D))
    return f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL.format(x="text")}) AS tok FROM documents
), truec AS (
  SELECT tok, COUNT(*) AS true_c FROM tok GROUP BY tok
), cells AS ({cells}),
cms AS (SELECT row, bucket, COUNT(*) AS c FROM cells GROUP BY 1, 2),
probes AS (
  SELECT tok, true_c FROM truec ORDER BY true_c DESC, tok LIMIT 20
)
SELECT p.tok, CAST(p.true_c AS BIGINT) AS true_c,
       CAST(LEAST({least}) AS BIGINT) AS cms_est
FROM probes p
{joins}
"""


# --------------------------------------------------------------------------
# q228 — ITERATED BPE merge training (Sennrich et al. 2016): q127 stops
# at the pair-frequency table the FIRST merge maximizes; this runs the
# actual training loop for _BPE_ROUNDS rounds — per round, count
# adjacent symbol pairs over the (distinct-word, count) vocabulary,
# pick the global argmax under the total order (count DESC, a, b), and
# apply the merge greedily left-to-right non-overlapping to every
# word's symbol sequence. The apply step is a pure JVM-side
# ``F.aggregate`` fold (replace-last-when-pair-matches ≡ greedy
# non-overlapping scan: the merged symbol a||b can never re-match as
# 'a' within the round since b is non-empty), so each round costs ONE
# pair-count shuffle + a 1-row broadcast argmax — zero shuffles for
# the rewrite itself, and the vocabulary table is corpus-sublinear.
# The SQL twin replays greedy via match-islands (a run of consecutive
# matched positions only happens when a==b; greedy keeps the odd
# offsets within each island) + a LAG drop of consumed successors —
# a different formulation of the same rewrite, which is exactly the
# cross-check the fold needs.
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_apply(s, a, b):
    """Greedy left-to-right non-overlapping (a,b)→a||b on array s."""
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def q228_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("word")
    )
    v = (
        d.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "word",
            "c",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ).alias("s"),
        )
    )
    outs = []
    for r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            v.filter(F.size("s") >= 2)
            .select(
                "c",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("s"), i).alias("a"),
                            F.element_at(F.col("s"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("c").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
        outs.append(
            best.select(
                F.lit(r).cast("int").alias("round"),
                F.col("a").alias("merge_a"),
                F.col("b").alias("merge_b"),
                "cnt",
            )
        )
        bb = F.broadcast(
            best.select(F.col("a").alias("_ma"), F.col("b").alias("_mb"))
        )
        v = v.crossJoin(bb).select(
            "word",
            "c",
            _bpe_apply(F.col("s"), F.col("_ma"), F.col("_mb")).alias("s"),
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _q228_sql() -> str:
    ctes = [
        f"""v0 AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS c,
         list_transform(generate_series(1, len(tok)),
                        i -> substr(tok, i, 1)) AS s
  FROM (SELECT unnest({TOKENS_SQL.format(x='text')}) AS tok
        FROM documents)
  GROUP BY tok
)"""
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""p{r} AS (
  SELECT s[i] AS a, s[i + 1] AS b, CAST(SUM(c) AS BIGINT) AS cnt
  FROM v{p}, unnest(generate_series(1, len(s) - 1)) AS u(i)
  WHERE len(s) >= 2 GROUP BY 1, 2
),
best{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
sym{r} AS (
  SELECT word, c, i AS pos, s[i] AS sym
  FROM v{p}, unnest(generate_series(1, len(s))) AS u(i)
),
m{r} AS (
  SELECT word, c, pos, sym,
         CASE WHEN sym = (SELECT a FROM best{r})
                   AND LEAD(sym) OVER (PARTITION BY word ORDER BY pos)
                       = (SELECT b FROM best{r})
              THEN 1 ELSE 0 END AS mt
  FROM sym{r}
),
isl{r} AS (
  SELECT *, CASE WHEN mt = 1 THEN
    pos - ROW_NUMBER() OVER (PARTITION BY word, mt ORDER BY pos)
  END AS isl
  FROM m{r}
),
sel{r} AS (
  SELECT word, c, pos, sym,
         CASE WHEN mt = 1 AND
           ROW_NUMBER() OVER (PARTITION BY word, mt, isl ORDER BY pos)
             % 2 = 1
         THEN 1 ELSE 0 END AS keepm
  FROM isl{r}
),
fin{r} AS (
  SELECT word, c, pos, keepm, sym,
         COALESCE(LAG(keepm) OVER (PARTITION BY word ORDER BY pos), 0)
           AS prevk
  FROM sel{r}
),
v{r} AS (
  SELECT word, MIN(c) AS c,
         list(CASE WHEN keepm = 1
                   THEN (SELECT a || b FROM best{r}) ELSE sym END
              ORDER BY pos) AS s
  FROM fin{r} WHERE prevk = 0
  GROUP BY word
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS round, a AS merge_a, b AS merge_b,"
        f" cnt FROM best{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


# --------------------------------------------------------------------------
# q236 — RENDEZVOUS (highest-random-weight) SHARDING audit (Thaler &
# Ravishankar 1996; the assignment rule behind consistent shard maps in
# storage systems and the natural deterministic doc→training-shard
# map): doc d goes to shard argmax_k md5long(d | k). The defining
# property — adding a shard moves ONLY the documents that win for the
# new shard (≈ N/(K+1)); nothing reshuffles among existing shards —
# falls out exactly and is asserted per shard: moved_in = 0 for every
# old shard. The argmax is array-native on the Spark side (transform →
# array_max over (h, k) structs — zero shuffle for the assignment,
# one partial agg for the audit); the twin unnests and arg_max's.
# 60-bit hashes make argmax ties impossible in practice; the struct
# tie-break pins determinism even then.
# --------------------------------------------------------------------------

_HRW_K = 8


def _hrw_shard(doc: str, n_shards: int):
    return F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda k: F.struct(
                md5long(
                    F.concat_ws("|", F.col(doc), k.cast("string"))
                ).alias("h"),
                k.alias("k"),
            ),
        )
    )["k"].cast("int")


def q236_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc")
    )
    a = d.select(
        "doc",
        _hrw_shard("doc", _HRW_K).alias("s8"),
        _hrw_shard("doc", _HRW_K + 1).alias("s9"),
    )
    n9 = a.groupBy(F.col("s9").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_9"),
        F.sum(
            (F.col("s8") != F.col("s9")).cast("long")
        ).cast("long").alias("moved_in"),
    )
    n8 = a.groupBy(F.col("s8").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_8")
    )
    return n9.join(n8, "shard", "full").select(
        F.col("shard").cast("int").alias("shard"),
        F.coalesce("n_8", F.lit(0)).cast("long").alias("n_8"),
        F.coalesce("n_9", F.lit(0)).cast("long").alias("n_9"),
        F.coalesce("moved_in", F.lit(0)).cast("long").alias("moved_in"),
    )


_Q236_H = MD5LONG_SQL.format(
    x="CAST(doc_id AS VARCHAR) || '|' || CAST(k AS VARCHAR)"
)

Q236_SQL = f"""
WITH a8 AS (
  SELECT doc_id, arg_max(k, {_Q236_H}) AS s8
  FROM documents, unnest(generate_series(0, {_HRW_K - 1})) AS t(k)
  GROUP BY doc_id
), a9 AS (
  SELECT doc_id, arg_max(k, {_Q236_H}) AS s9
  FROM documents, unnest(generate_series(0, {_HRW_K})) AS t(k)
  GROUP BY doc_id
), a AS (SELECT a8.doc_id, s8, s9 FROM a8 JOIN a9 USING (doc_id)),
n9 AS (
  SELECT s9 AS shard, CAST(COUNT(*) AS BIGINT) AS n_9,
         CAST(SUM(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
           AS moved_in
  FROM a GROUP BY 1
), n8 AS (
  SELECT s8 AS shard, CAST(COUNT(*) AS BIGINT) AS n_8 FROM a GROUP BY 1
)
SELECT CAST(shard AS INTEGER) AS shard,
       CAST(COALESCE(n_8, 0) AS BIGINT) AS n_8,
       CAST(COALESCE(n_9, 0) AS BIGINT) AS n_9,
       CAST(COALESCE(moved_in, 0) AS BIGINT) AS moved_in
FROM n9 FULL OUTER JOIN n8 USING (shard)
"""


# --------------------------------------------------------------------------
# q241 — Z-ORDER (Morton curve) layout audit: the multi-dimensional
# data-clustering rule behind Delta/Iceberg `OPTIMIZE ZORDER` and
# parquet row-group min-max skipping. Interleaving the bits of two
# key columns and chunking on the curve bounds EVERY dimension's
# min-max span per file, so point/range predicates on ANY z-column
# prune files; a linear layout (partition by one key) prunes only its
# own key. The query materializes both layouts' per-bucket min-max
# envelopes and reports the measurable contract: avg per-bucket span
# per dim and the expected fraction of buckets a uniform point query
# on each dim must touch (Σ(span+1)/(domain·n_buckets)). The z-order
# bucket (zkey >> 6) fixes 5 high bits of each dim, so both spans are
# ≤ 7 by construction while the linear control's y-span is unbounded
# — the audit a table-layout job runs before rewriting 100 TB. All
# bit math is int64 shifts/masks inside codegen; one groupBy per
# layout; no UDFs, no sorts.
# --------------------------------------------------------------------------

_Z_BITS = 8  # per-dim bits (256-value grid)
_Z_SHIFT = 6  # bucket = zkey >> 6 → 1024 z-buckets


def q241_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).cast("long").alias("x"),
        (F.col("l_orderkey") % 256).cast("long").alias("y"),
    )
    zkey = None
    for b in range(_Z_BITS):
        xt = F.shiftleft(F.shiftright(F.col("x"), b).bitwiseAND(F.lit(1)), 2 * b)
        yt = F.shiftleft(
            F.shiftright(F.col("y"), b).bitwiseAND(F.lit(1)), 2 * b + 1
        )
        zkey = xt + yt if zkey is None else zkey + xt + yt
    keyed = li.select(
        "x",
        "y",
        F.shiftright(zkey, _Z_SHIFT).alias("zb"),
    )

    def envelope(df: DataFrame, bucket, layout: str) -> DataFrame:
        dom = float(1 << _Z_BITS)
        per = df.groupBy(bucket.alias("b")).agg(
            F.count(F.lit(1)).alias("rows"),
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        return per.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            r4(F.avg("rows")).alias("avg_rows"),
            r4(F.avg("xs")).alias("avg_x_span"),
            r4(F.avg("ys")).alias("avg_y_span"),
            r4(F.sum(F.col("xs") + 1) / (F.count(F.lit(1)) * dom)).alias(
                "x_touch_frac"
            ),
            r4(F.sum(F.col("ys") + 1) / (F.count(F.lit(1)) * dom)).alias(
                "y_touch_frac"
            ),
        )
    lin = envelope(keyed, F.col("x"), "linear_x")
    zor = envelope(keyed, F.col("zb"), "zorder")
    return lin.unionAll(zor)


def _q241_sql() -> str:
    zexpr = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
        for b in range(_Z_BITS)
    )
    dom = 1 << _Z_BITS
    body = """
  SELECT '{name}' AS layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         ROUND(AVG(rows), 4) AS avg_rows,
         ROUND(AVG(xs), 4) AS avg_x_span,
         ROUND(AVG(ys), 4) AS avg_y_span,
         ROUND(SUM(xs + 1) / (COUNT(*) * {dom}.0), 4) AS x_touch_frac,
         ROUND(SUM(ys + 1) / (COUNT(*) * {dom}.0), 4) AS y_touch_frac
  FROM (
    SELECT {bucket} AS b, COUNT(*) AS rows,
           MAX(x) - MIN(x) AS xs, MAX(y) - MIN(y) AS ys
    FROM keyed GROUP BY 1)"""
    return f"""
WITH keyed AS (
  SELECT x, y, ({zexpr}) >> {_Z_SHIFT} AS zb
  FROM (
    SELECT l_partkey % 256 AS x, l_orderkey % 256 AS y FROM lineitem)
)
{body.format(name="linear_x", bucket="x", dom=dom)}
UNION ALL
{body.format(name="zorder", bucket="zb", dom=dom)}
"""


# --------------------------------------------------------------------------
# q242 — TEMPERATURE-SCALED sampling mix (α-sampling, the multilingual
# mixing rule of mBERT/XLM-R/mT5): sampling share p_i ∝ n_i^α with
# α < 1 upweights low-resource shards relative to their natural share.
# Complements q88 (uniform-target rebalancing) with the standard
# smooth interpolation between natural (α=1) and uniform (α=0), and
# reports the per-shard REPEAT FACTOR — expected epochs of each shard
# under a one-natural-epoch token budget, the number that flags
# overfitting risk on small shards when α is pushed too low. Shard
# table is dimension-sized at any corpus scale: one partial-agg
# groupBy over the corpus, then broadcast 1-row totals.
# --------------------------------------------------------------------------

_TEMP_ALPHA = 0.3


def q242_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("lang", "n_chars")
    shard = d.groupBy("lang").agg(F.sum("n_chars").alias("n_tok"))
    g = shard.agg(
        F.sum("n_tok").alias("_tot"),
        F.sum(F.pow(F.col("n_tok").cast("double"), _TEMP_ALPHA)).alias(
            "_pow_tot"
        ),
    )
    return shard.crossJoin(F.broadcast(g)).select(
        "lang",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.round(F.col("n_tok") / F.col("_tot"), 6).alias("nat_share"),
        F.round(
            F.pow(F.col("n_tok").cast("double"), _TEMP_ALPHA)
            / F.col("_pow_tot"),
            6,
        ).alias("temp_share"),
        F.round(
            F.pow(F.col("n_tok").cast("double"), _TEMP_ALPHA)
            / F.col("_pow_tot")
            * F.col("_tot")
            / F.col("n_tok"),
            6,
        ).alias("repeat_factor"),
    )


Q242_SQL = f"""
WITH shard AS (
  SELECT lang, SUM(n_chars) AS n_tok FROM documents GROUP BY lang
), g AS (
  SELECT SUM(n_tok) AS tot,
         SUM(POWER(CAST(n_tok AS DOUBLE), {_TEMP_ALPHA})) AS pow_tot
  FROM shard
)
SELECT lang, CAST(n_tok AS BIGINT) AS n_tokens,
       ROUND(n_tok / (1.0 * tot), 6) AS nat_share,
       ROUND(POWER(CAST(n_tok AS DOUBLE), {_TEMP_ALPHA}) / pow_tot, 6)
         AS temp_share,
       ROUND(POWER(CAST(n_tok AS DOUBLE), {_TEMP_ALPHA}) / pow_tot
             * tot / n_tok, 6) AS repeat_factor
FROM shard CROSS JOIN g
"""


# --------------------------------------------------------------------------
# q244 — INTERPOLATED KNESER-NEY bigram LM (Kneser & Ney 1995; Chen &
# Goodman 1999's benchmark winner): the smoothing a real n-gram
# quality filter uses where q112's add-one is the baseline.
# p(b|a) = (C(ab)−D)/C(a) + D·N1+(a·)/C(a) · N1+(·b)/N1+(··),
# D = 0.75 — the continuation probability N1+(·b)/T scores a word by
# how many DISTINCT contexts it follows (the "San Francisco" fix:
# 'francisco' is frequent but predictable, so its continuation mass
# is tiny). Every table is a count aggregate: bigram counts, context
# totals, distinct-successor and distinct-predecessor counts, one
# global type count — all vocab-sized (broadcast posture identical to
# q112); the corpus shuffles once on doc_id for the per-doc mean NLL.
# Trained-on-corpus scoring means every scored bigram has C(ab) ≥ 1 >
# D, so no max(−,0) clamp is needed and the probability is strictly
# positive.
# --------------------------------------------------------------------------

_KN_D = 0.75


def q244_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", tokens(F.col("text")).alias("t"))
    pairs = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", "lang", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            "lang",
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.concat("p.a", F.lit(" "), "p.b").alias("bg"),
        )
    )
    c2 = bg.groupBy(F.col("bg").alias("bg2")).agg(
        F.count(F.lit(1)).alias("c2")
    )
    ctx = bg.groupBy(F.col("a").alias("a2")).agg(
        F.count(F.lit(1)).alias("c1"),
        F.countDistinct("b").alias("n1f"),
    )
    cont = bg.groupBy(F.col("b").alias("b2")).agg(
        F.countDistinct("a").alias("n1r")
    )
    types = c2.agg(F.count(F.lit(1)).alias("tt"))
    p_kn = (F.col("c2") - F.lit(_KN_D)) / F.col("c1") + F.lit(
        _KN_D
    ) * F.col("n1f") / F.col("c1") * (F.col("n1r") / F.col("tt"))
    doc = (
        bg.join(F.broadcast(c2), bg.bg == F.col("bg2"))
        .join(F.broadcast(ctx), bg.a == F.col("a2"))
        .join(F.broadcast(cont), bg.b == F.col("b2"))
        .crossJoin(F.broadcast(types))
        .select("doc_id", "lang", (-F.log(p_kn)).alias("nll"))
        .groupBy("doc_id", "lang")
        .agg(F.avg("nll").alias("doc_nll"))
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        r4(F.avg("doc_nll")).alias("avg_nll"),
        r4(F.min("doc_nll")).alias("min_nll"),
        r4(F.max("doc_nll")).alias("max_nll"),
    )


Q244_SQL = f"""
WITH tokd AS (
  SELECT doc_id, lang, {TOKENS_SQL.format(x='text')} AS t FROM documents
), bgt AS (
  SELECT doc_id, lang, t[i] AS a, t[i + 1] AS b,
         t[i] || ' ' || t[i + 1] AS bg
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
), c2 AS (SELECT bg, COUNT(*) AS c2 FROM bgt GROUP BY bg),
ctx AS (
  SELECT a, COUNT(*) AS c1, COUNT(DISTINCT b) AS n1f FROM bgt GROUP BY a
), cont AS (SELECT b, COUNT(DISTINCT a) AS n1r FROM bgt GROUP BY b),
types AS (SELECT COUNT(*) AS tt FROM c2),
doc AS (
  SELECT g.doc_id, g.lang,
         AVG(-ln((c2.c2 - {_KN_D}) / ctx.c1
                 + {_KN_D} * ctx.n1f / ctx.c1 * (cont.n1r / (1.0 * tt))))
           AS doc_nll
  FROM bgt g
  JOIN c2 ON g.bg = c2.bg
  JOIN ctx ON g.a = ctx.a
  JOIN cont ON g.b = cont.b
  CROSS JOIN types
  GROUP BY 1, 2
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(doc_nll), 4) AS avg_nll,
       ROUND(MIN(doc_nll), 4) AS min_nll,
       ROUND(MAX(doc_nll), 4) AS max_nll
FROM doc GROUP BY lang
"""


# --------------------------------------------------------------------------
# q247 — KMV (k-minimum-values / theta-sketch) DISTINCT SET ALGEBRA
# across sources (Bar-Yossef et al. 2002; Beyer et al. 2007's unbiased
# (k-1)/u_k estimator; the Theta sketch in Apache DataSketches): each
# source keeps only its k=64 SMALLEST 60-bit bigram hashes; merging two
# sketches (k smallest of the union) estimates |A∪B|, and the fraction
# of merged entries present in BOTH input sketches estimates Jaccard —
# so |A∩B| ≈ ρ̂·Û without ever joining the raw sets. q44/q128 cover
# HLL (union-only); KMV is what a pipeline uses when it also needs
# intersections (cross-source contamination overlap, shared-shard
# audits). Exact per-pair Jaccard rides along as the accuracy audit
# (q144's pattern).
#
# Scale posture: the corpus is read once (narrow bigram explode →
# partial-agg distinct on (source, hash)); the per-source top-k window
# runs over DISTINCT hashes (vocabulary-bounded, partitioned by
# source); after that everything operates on 64-entry arrays — one row
# per source, pairs bounded by (#sources choose 2). Sources with fewer
# than k distinct bigrams are excluded (documented guard — their
# sketch IS the exact set and the estimator switches form). md5-derived
# hashes make both engines' sketches bit-identical.
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_DOMAIN = float(1 << 60)


def q247_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("source", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    bigrams = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    sets = (
        toks.select("source", F.explode(bigrams).alias("b"))
        .distinct()
        .persist()
    )
    hashes = sets.select("source", md5long(F.col("b")).alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("source")
        .agg(
            F.sort_array(F.collect_list("h")).alias("sk"),
            F.count(F.lit(1)).alias("n_sk"),
        )
        .filter(F.col("n_sk") >= _KMV_K)
    )
    a = sk.select(
        F.col("source").alias("src_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("source").alias("src_b"), F.col("sk").alias("sk_b")
    )
    merged = F.slice(
        F.array_sort(F.array_union("sk_a", "sk_b")), 1, _KMV_K
    )
    pairs = (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .withColumn("m", merged)
        .withColumn("theta", F.element_at("m", _KMV_K).cast("double"))
        .withColumn(
            "rho",
            F.size(
                F.array_intersect(F.array_intersect("m", "sk_a"), "sk_b")
            ).cast("double")
            / F.lit(float(_KMV_K)),
        )
        .withColumn(
            "union_est",
            F.lit(float(_KMV_K - 1)) * F.lit(_KMV_DOMAIN) / F.col("theta"),
        )
    )
    est = pairs.select(
        "src_a",
        "src_b",
        F.round("rho", 6).alias("jaccard_est"),
        F.round("union_est", 2).alias("union_est"),
        F.round(F.col("rho") * F.col("union_est"), 2).alias("inter_est"),
    )
    na = sets.groupBy(F.col("source").alias("_sa")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    nb = sets.groupBy(F.col("source").alias("_sb")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    inter = (
        sets.alias("x")
        .join(sets.alias("y"), F.col("x.b") == F.col("y.b"))
        .filter(F.col("x.source") < F.col("y.source"))
        .groupBy(
            F.col("x.source").alias("_ia"), F.col("y.source").alias("_ib")
        )
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    exact = (
        inter.join(na, F.col("_ia") == F.col("_sa"))
        .join(nb, F.col("_ib") == F.col("_sb"))
        .select(
            F.col("_ia").alias("_ea"),
            F.col("_ib").alias("_eb"),
            (
                F.col("n_i")
                / (F.col("n_a") + F.col("n_b") - F.col("n_i")).cast(
                    "double"
                )
            ).alias("jac_x"),
        )
    )
    out = (
        est.join(
            exact,
            (est.src_a == F.col("_ea")) & (est.src_b == F.col("_eb")),
        )
        .select(
            "src_a",
            "src_b",
            "jaccard_est",
            "union_est",
            "inter_est",
            F.round("jac_x", 6).alias("jaccard_exact"),
            F.round(
                F.abs(F.col("jaccard_est") - F.col("jac_x")), 6
            ).alias("abs_err"),
        )
    )
    out = out.localCheckpoint()
    sets.unpersist()
    return out


Q247_SQL = f"""
WITH tokd AS (
  SELECT source, {TOKENS_SQL.format(x='text')} AS t FROM documents
), sets AS MATERIALIZED (
  SELECT DISTINCT source, t[i] || ' ' || t[i + 1] AS b
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS q(i)
  WHERE len(t) >= 2
), hashes AS (
  SELECT DISTINCT source, {MD5LONG_SQL.format(x='b')} AS h FROM sets
), ranked AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hashes
), sk AS MATERIALIZED (
  SELECT source, list_sort(list(h)) AS sk, COUNT(*) AS n_sk
  FROM ranked WHERE rn <= {_KMV_K}
  GROUP BY source HAVING COUNT(*) >= {_KMV_K}
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         (list_sort(list_distinct(list_concat(a.sk, b.sk))))[1:{_KMV_K}]
           AS m,
         a.sk AS sk_a, b.sk AS sk_b
  FROM sk a JOIN sk b ON a.source < b.source
), est AS (
  SELECT src_a, src_b,
         CAST(len(list_intersect(list_intersect(m, sk_a), sk_b)) AS DOUBLE)
           / {_KMV_K} AS rho,
         CAST({_KMV_K - 1} AS DOUBLE) * {_KMV_DOMAIN!r}
           / CAST(m[{_KMV_K}] AS DOUBLE) AS union_est
  FROM pairs
), nsrc AS (
  SELECT source, COUNT(*) AS n FROM sets GROUP BY source
), inter AS (
  SELECT x.source AS ia, y.source AS ib, COUNT(*) AS n_i
  FROM sets x JOIN sets y ON x.b = y.b AND x.source < y.source
  GROUP BY 1, 2
), exact AS (
  SELECT ia, ib,
         n_i / CAST(na.n + nb.n - n_i AS DOUBLE) AS jac_x
  FROM inter
  JOIN nsrc na ON na.source = ia
  JOIN nsrc nb ON nb.source = ib
)
SELECT src_a, src_b,
       ROUND(rho, 6) AS jaccard_est,
       ROUND(union_est, 2) AS union_est,
       ROUND(rho * union_est, 2) AS inter_est,
       ROUND(jac_x, 6) AS jaccard_exact,
       ROUND(ABS(ROUND(rho, 6) - jac_x), 6) AS abs_err
FROM est JOIN exact ON src_a = ia AND src_b = ib
"""


# --------------------------------------------------------------------------
# q267 — GREEDY MAX-COVERAGE data selection (Nemhauser, Wolsey &
# Fisher 1978's (1−1/e) guarantee; the facility-location/coverage
# objective behind submodular training-data subset selection): 5
# rounds, each adding the document whose 3-gram fingerprints cover the
# most NOT-YET-COVERED grams — ties on doc_id. Reports per round the
# picked doc, its marginal gain, and cumulative corpus coverage — the
# diminishing-returns curve that tells a curator when to stop.
#
# Scale posture: the (doc, gram) incidence is built once (one narrow
# explode + distinct); each round is one anti-join against the covered
# set + a partial-agg count + a distributed TakeOrderedAndProject
# argmax; the covered set grows by one doc's grams per round and is
# localCheckpointed. The DuckDB twin unrolls the same 5 rounds.
# --------------------------------------------------------------------------

_MC_ROUNDS = 5
_MC_K = 3


def q267_greedy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= _MC_K
    )
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size("t") - (_MC_K - 1)),
        lambda i: md5long(
            F.concat_ws(" ", F.slice(F.col("t"), i, _MC_K))
        ),
    )
    inc = (
        toks.select("doc_id", F.explode(grams_arr).alias("g"))
        .distinct()
        .persist()
    )
    total = inc.select("g").distinct().count()
    covered = None
    rows = []
    cum = 0
    for r in range(1, _MC_ROUNDS + 1):
        remaining = (
            inc if covered is None else inc.join(covered, "g", "left_anti")
        )
        picked = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        if not picked:
            # everything already covered (or empty corpus): the oracle's
            # LIMIT-1 CTE is empty, so later rounds render no row
            break
        pick = picked[0]
        cum += pick["gain"]
        rows.append(
            (r, pick["doc_id"], pick["gain"], round(cum / total, 6))
        )
        newly = inc.filter(F.col("doc_id") == pick["doc_id"]).select("g")
        covered = (
            newly if covered is None else covered.union(newly).distinct()
        ).localCheckpoint()
    inc.unpersist()
    if not rows:  # empty corpus (oracle: 0 rows)
        return spark.createDataFrame(
            [], "round long, doc_id long, gain long, coverage double"
        )
    return spark.createDataFrame(
        rows, "round int, doc_id long, gain long, coverage double"
    ).select(
        F.col("round").cast("long").alias("round"),
        "doc_id",
        "gain",
        "coverage",
    )


def _q267_sql(rounds: int = _MC_ROUNDS) -> str:
    gram = MD5LONG_SQL.format(
        x=f"array_to_string(t[i:i + {_MC_K - 1}], ' ')"
    )
    steps = [
        f"""
tokd AS (SELECT doc_id, {TOKENS_SQL.format(x='text')} AS t FROM documents),
inc AS MATERIALIZED (
  SELECT DISTINCT doc_id, {gram} AS g
  FROM tokd, unnest(generate_series(1, len(t) - {_MC_K - 1})) AS u(i)
  WHERE len(t) >= {_MC_K}
),
total AS (SELECT CAST(COUNT(DISTINCT g) AS DOUBLE) AS n FROM inc)"""
    ]
    prev_cov = None
    for r in range(1, rounds + 1):
        rem = (
            "inc"
            if prev_cov is None
            else f"(SELECT i.* FROM inc i LEFT JOIN {prev_cov} c"
            f" ON i.g = c.g WHERE c.g IS NULL)"
        )
        steps.append(
            f"""
p{r} AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS gain FROM {rem} r
  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
),
cov{r} AS MATERIALIZED (
  SELECT DISTINCT g FROM inc WHERE doc_id IN (SELECT doc_id FROM p{r})
  {f'UNION SELECT g FROM {prev_cov}' if prev_cov else ''}
)"""
        )
        prev_cov = f"cov{r}"
    finals = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS round, doc_id,
       CAST(gain AS BIGINT) AS gain,
       ROUND((SELECT COUNT(*) FROM cov{r}) / (SELECT n FROM total), 6)
         AS coverage
FROM p{r}"""
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",".join(steps) + "\n" + finals


# --------------------------------------------------------------------------
# q277 — PERPLEXITY BUCKETS (the CCNet recipe, Wenzek et al. 2020):
# score every document by its per-token cross-entropy under the
# corpus-level unigram LM, then cut the corpus into head/middle/tail
# TERCILES — the standard quality-stratification step before sampling
# training data (head = most LM-like). Cross-entropy is rounded to 6dp
# BEFORE ranking (q157's rounded-score discipline) so the tercile
# boundary is ulp-stable across engines; doc_id breaks exact ties.
#
# Scale posture: one shuffle to the token LM (partial-agg), one to
# per-doc CE; the tercile cut uses histogram_rank + exact_ntile, so the
# only unpartitioned window runs over the distinct-CE histogram, never
# raw docs. LM join is unhinted — AQE broadcasts the vocab when small.
# --------------------------------------------------------------------------


def q277_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = lm.agg(F.sum("cnt").cast("double").alias("t"))
    ce = (
        toks.join(lm, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(
                -F.avg(F.log(F.col("cnt") / F.col("t"))), 6
            ).alias("ce"),
        )
    )
    ranked = histogram_rank(ce, "ce", "doc_id", out="r", total="n")
    b = ranked.withColumn(
        "bucket", exact_ntile(F.col("r"), F.col("n"), 3)
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("ce"), 4).alias("mean_ce"),
        F.round(F.avg("n_tok"), 4).alias("mean_tokens"),
        F.round(F.min("ce"), 4).alias("ce_lo"),
        F.round(F.max("ce"), 4).alias("ce_hi"),
    )


Q277_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(x='text')}) AS tok
  FROM documents
), lm AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
), tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM lm),
ce AS (
  SELECT doc_id, COUNT(*) AS n_tok,
         ROUND(-AVG(ln(cnt / t)), 6) AS ce
  FROM toks JOIN lm USING (tok) CROSS JOIN tot
  GROUP BY doc_id
), b AS (
  SELECT n_tok, ce, NTILE(3) OVER (ORDER BY ce, doc_id) AS bucket
  FROM ce
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(ce), 4) AS mean_ce,
       ROUND(AVG(n_tok), 4) AS mean_tokens,
       ROUND(MIN(ce), 4) AS ce_lo,
       ROUND(MAX(ce), 4) AS ce_hi
FROM b GROUP BY bucket
"""


# --------------------------------------------------------------------------
# q279 — SAMPLE-RATIO-MISMATCH CHECK: the first gate every experiment
# readout runs — do q192's hash-assigned 8/1/1 splits actually hold the
# design ratio? χ² = Σ(o−e)²/e against the design fractions, df = 2,
# flagged at the 0.05 critical value 5.991. A failed SRM invalidates
# every downstream metric comparison (the assignment itself is biased),
# which is why it rides before q131/q248/q258 in a readout pipeline.
# Counts are exact integers; doubles enter only in the rendered χ².
#
# Scale posture: one partial-agg pass to the 3-row split contingency
# (same md5 bucketing as q192, so the check audits the REAL assignment
# path); the χ² is 1-row arithmetic.
# --------------------------------------------------------------------------

_SRM_CRIT = 5.991


def q279_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    b = md5long(F.col("doc_id").cast("string")) % 10
    split = (
        F.when(b <= 7, F.lit("train"))
        .when(b == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    g = d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("o")
    )
    e = (
        F.when(F.col("split") == "train", 0.8).otherwise(0.1)
        * F.sum("o").over(Window.partitionBy())
    )
    t = g.withColumn("chi_term", (F.col("o") - e) * (F.col("o") - e) / e)
    chi2 = F.sum("chi_term")
    return t.agg(
        F.sum("o").cast("long").alias("n"),
        F.sum(F.when(F.col("split") == "train", F.col("o")).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", F.col("o")).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", F.col("o")).otherwise(0))
        .cast("long")
        .alias("n_test"),
        F.round(chi2, 6).alias("chi2"),
        # CASE-WHEN (not a bare boolean cast): on an empty corpus chi2
        # is NULL, and the oracle's CASE renders 0 where NULL>crit
        # would propagate NULL (deg_empty sweep)
        F.when(chi2 > _SRM_CRIT, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("srm_detected"),
    )


Q279_SQL = f"""
WITH d AS (
  SELECT CASE WHEN {MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')}
                   % 10 <= 7 THEN 'train'
              WHEN {MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')}
                   % 10 = 8 THEN 'val' ELSE 'test' END AS split
  FROM documents
), g AS (
  SELECT split, COUNT(*) AS o FROM d GROUP BY split
), t AS (
  SELECT split, o,
         (o - e) * (o - e) / e AS chi_term
  FROM (
    SELECT split, o,
           CASE WHEN split = 'train' THEN 0.8 ELSE 0.1 END
             * SUM(o) OVER () AS e
    FROM g
  ) q
)
SELECT CAST(SUM(o) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN split = 'train' THEN o ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(SUM(CASE WHEN split = 'val' THEN o ELSE 0 END) AS BIGINT)
         AS n_val,
       CAST(SUM(CASE WHEN split = 'test' THEN o ELSE 0 END) AS BIGINT)
         AS n_test,
       ROUND(SUM(chi_term), 6) AS chi2,
       CAST(CASE WHEN SUM(chi_term) > {_SRM_CRIT} THEN 1 ELSE 0 END
            AS BIGINT) AS srm_detected
FROM t
"""


# --------------------------------------------------------------------------
# q280 — NEYMAN ALLOCATION (Neyman 1934): variance-optimal stratified
# sample design — a fixed budget of B=1000 draws split across
# (lang, source) strata proportional to N_h·S_h (stratum size × its
# n_chars standard deviation), so high-variance strata get oversampled
# relative to q52's proportional allocation. Fractional seats settle by
# LARGEST REMAINDER (q175's rule) so the integer allocations sum to
# exactly B; remainders are rounded to 9dp before ranking so the seat
# order is ulp-stable across engines, with the stratum key as the tie
# break.
#
# Scale posture: one partial-agg pass to the strata moment table
# (bounded: #langs × #sources); the seat assignment's global window
# runs over that aggregate only.
# --------------------------------------------------------------------------

_NEYMAN_B = 1000


def q280_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang", "source", F.col("n_chars").cast("double").alias("x")
    )
    st = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"),
                F.lit(0.0),
            )
        ).alias("s_h"),
    )
    w_all = Window.partitionBy()
    real = st.withColumn(
        "alloc_real",
        # try_divide: all-constant strata have Σ n_h·s_h = 0 (DuckDB:
        # NULL allocation — deg_one sweep)
        F.try_divide(
            F.lit(_NEYMAN_B) * F.col("n_h") * F.col("s_h"),
            F.sum(F.col("n_h") * F.col("s_h")).over(w_all),
        ),
    )
    base = real.withColumn("base", F.floor("alloc_real").cast("long"))
    seats = base.withColumn(
        "leftover", F.lit(_NEYMAN_B) - F.sum("base").over(w_all)
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(
                F.desc(F.round(F.col("alloc_real") - F.col("base"), 9)),
                "lang",
                "source",
            )
        ),
    )
    return seats.select(
        "lang",
        "source",
        F.col("n_h").cast("long").alias("n_docs"),
        F.round("s_h", 4).alias("s_h"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


Q280_SQL = f"""
WITH st AS (
  SELECT lang, source, COUNT(*) AS n_h,
         sqrt(GREATEST(AVG(1.0 * n_chars * n_chars)
               - AVG(1.0 * n_chars) * AVG(1.0 * n_chars), 0.0)) AS s_h
  FROM documents GROUP BY 1, 2
), real AS (
  SELECT lang, source, n_h, s_h,
         {_NEYMAN_B} * (n_h * s_h) / SUM(n_h * s_h) OVER () AS alloc_real
  FROM st
), base AS (
  SELECT lang, source, n_h, s_h, alloc_real,
         CAST(FLOOR(alloc_real) AS BIGINT) AS base
  FROM real
), seats AS (
  SELECT lang, source, n_h, s_h, base,
         {_NEYMAN_B} - SUM(base) OVER () AS leftover,
         ROW_NUMBER() OVER (
           ORDER BY ROUND(alloc_real - base, 9) DESC, lang, source) AS rk
  FROM base
)
SELECT lang, source, CAST(n_h AS BIGINT) AS n_docs,
       ROUND(s_h, 4) AS s_h,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM seats
"""


# --------------------------------------------------------------------------
# q283 — IPF / RAKING (Deming & Stephan 1940): calibrate the train
# split's (lang, source) cell weights so its weighted margins match the
# FULL corpus margins on both axes — the standard survey-reweighting
# fix for a subsample whose hash assignment left small marginal
# imbalances (q279 detects them; this repairs them). Three full IPF
# rounds, each a row-scaling half-step (match lang targets) then a
# column-scaling half-step (match source targets); after a source
# half-step the weighted total equals the train size EXACTLY, which the
# test pins.
#
# Scale posture: the corpus is scanned once for the split-flagged
# margin/cell tables; every IPF half-step is a partial-agg margin
# rollup + a join back on the BOUNDED cell table (langs × sources).
# The DuckDB twin unrolls the identical six half-steps.
# --------------------------------------------------------------------------

_IPF_ROUNDS = 3


def q283_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        (md5long(F.col("doc_id").cast("string")) % 10 <= 7)
        .cast("long")
        .alias("tr"),
    )
    tots = d.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum("tr").cast("double").alias("tt"),
    )
    tgt_l = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_l"))
        .crossJoin(F.broadcast(tots))
        .select(
            "lang", (F.col("n_l") * F.col("tt") / F.col("nn")).alias("tgt")
        )
    )
    tgt_s = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .crossJoin(F.broadcast(tots))
        .select(
            "source",
            (F.col("n_s") * F.col("tt") / F.col("nn")).alias("tgt"),
        )
    )
    w = (
        d.filter(F.col("tr") == 1)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", F.lit(1.0))
    )
    for _ in range(_IPF_ROUNDS):
        rs = w.groupBy("lang").agg(
            F.sum(F.col("w") * F.col("n")).alias("cur")
        )
        w = (
            w.join(rs, "lang")
            .join(tgt_l, "lang")
            .select(
                "lang",
                "source",
                "n",
                (F.col("w") * F.col("tgt") / F.col("cur")).alias("w"),
            )
        )
        cs = w.groupBy("source").agg(
            F.sum(F.col("w") * F.col("n")).alias("cur")
        )
        w = (
            w.join(cs, "source")
            .join(tgt_s, "source")
            .select(
                "lang",
                "source",
                "n",
                (F.col("w") * F.col("tgt") / F.col("cur")).alias("w"),
            )
            .localCheckpoint()
        )
    return w.select(
        "lang",
        "source",
        F.col("n").cast("long").alias("n_train"),
        F.round("w", 6).alias("weight"),
    )


def _q283_sql() -> str:
    split = (
        MD5LONG_SQL.format(x="CAST(doc_id AS VARCHAR)") + " % 10 <= 7"
    )
    ctes = [
        f"""d AS (
  SELECT lang, source,
         CASE WHEN {split} THEN 1 ELSE 0 END AS tr
  FROM documents
)""",
        """tots AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
         CAST(SUM(tr) AS DOUBLE) AS tt
  FROM d
)""",
        """tgt_l AS (
  SELECT lang, COUNT(*) * tt / nn AS tgt
  FROM d CROSS JOIN tots GROUP BY lang, tt, nn
)""",
        """tgt_s AS (
  SELECT source, COUNT(*) * tt / nn AS tgt
  FROM d CROSS JOIN tots GROUP BY source, tt, nn
)""",
        """w0 AS (
  SELECT lang, source, COUNT(*) AS n, 1.0 AS w
  FROM d WHERE tr = 1 GROUP BY lang, source
)""",
    ]
    prev = "w0"
    for r in range(1, _IPF_ROUNDS + 1):
        ctes.append(f"""w{r}a AS (
  SELECT c.lang, c.source, c.n, c.w * t.tgt / rs.cur AS w
  FROM {prev} c
  JOIN (SELECT lang, SUM(w * n) AS cur FROM {prev} GROUP BY lang) rs
    USING (lang)
  JOIN tgt_l t USING (lang)
)""")
        ctes.append(f"""w{r}b AS (
  SELECT c.lang, c.source, c.n, c.w * t.tgt / cs.cur AS w
  FROM w{r}a c
  JOIN (SELECT source, SUM(w * n) AS cur FROM w{r}a GROUP BY source) cs
    USING (source)
  JOIN tgt_s t USING (source)
)""")
        prev = f"w{r}b"
    return f"""
WITH {', '.join(ctes)}
SELECT lang, source, CAST(n AS BIGINT) AS n_train,
       ROUND(w, 6) AS weight
FROM {prev}
"""


# --------------------------------------------------------------------------
# q288 — POSITION-BASED (U-SHAPED) ATTRIBUTION: the 40/20/40 rule —
# for every converting journey (a user's channel touches strictly
# before their first purchase), the first touch gets 40%, the last
# touch 40%, and the middle touches split 20% evenly; 1-touch journeys
# get 100%, 2-touch journeys 50/50. Sits between q93 (last-touch) and
# q284 (Markov removal effect) — the three standard attribution models
# over one journey table. Credit weights are exact rationals rendered
# once at the end.
#
# Scale posture: one user-partitioned window pass orders each journey
# (the same shuffle q93/q194 ride); credit assignment is pure row
# arithmetic and the rollup is a partial agg onto ≤3 channel rows.
# --------------------------------------------------------------------------


def q288_positional_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp_ltz").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    rn = ev.withColumn("rn", F.row_number().over(w))
    prn = rn.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("rn").alias("prn"))
    j = (
        rn.join(prn, "user_id")
        .filter(
            (F.col("rn") < F.col("prn"))
            & F.col("event_type").isin("click", "signup", "view")
        )
        .select("user_id", "event_id", "es", "event_type")
    )
    wj = Window.partitionBy("user_id").orderBy("es", "event_id")
    wl = Window.partitionBy("user_id")
    t = (
        j.withColumn("jrn", F.row_number().over(wj))
        .withColumn("len", F.count(F.lit(1)).over(wl))
    )
    credit = (
        F.when(F.col("len") == 1, 1.0)
        .when(F.col("len") == 2, 0.5)
        .when(F.col("jrn") == 1, 0.4)
        .when(F.col("jrn") == F.col("len"), 0.4)
        .otherwise(0.2 / (F.col("len") - 2))
    )
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("touches"),
        F.sum(credit).alias("credit"),
    )
    tot = g.agg(F.sum("credit").alias("tc"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("event_type").alias("channel"),
            "touches",
            F.round("credit", 4).alias("credit"),
            F.round(F.col("credit") / F.col("tc"), 6).alias("share"),
        )
    )


Q288_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                     event_id) AS rn
  FROM events
), prn AS (
  SELECT user_id, MIN(rn) AS prn
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id
), j AS (
  SELECT ev.user_id, ev.event_id, ev.es, ev.event_type
  FROM ev JOIN prn USING (user_id)
  WHERE ev.rn < prn.prn
    AND ev.event_type IN ('click', 'signup', 'view')
), t AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY es, event_id) AS jrn,
         COUNT(*) OVER (PARTITION BY user_id) AS len
  FROM j
), g AS (
  SELECT event_type, COUNT(*) AS touches,
         SUM(CASE WHEN len = 1 THEN 1.0
                  WHEN len = 2 THEN 0.5
                  WHEN jrn = 1 THEN 0.4
                  WHEN jrn = len THEN 0.4
                  ELSE 0.2 / (len - 2) END) AS credit
  FROM t GROUP BY event_type
)
SELECT event_type AS channel, CAST(touches AS BIGINT) AS touches,
       ROUND(credit, 4) AS credit,
       ROUND(credit / SUM(credit) OVER (), 6) AS share
FROM g
"""


# --------------------------------------------------------------------------
# q319 — Heaps'-law exponent fit per source (Heaps 1978, V = k·N^β):
# shard each source's token stream into 16 deterministic doc_id
# buckets, count cumulative tokens N and cumulative NEW vocabulary V
# at each shard boundary (first-occurrence shard = min shard per
# distinct token — one partial agg on the hashed token, never a
# per-token window), then OLS-fit ln V on ln N over the ≤16 points per
# source. β well below 1 is the healthy sublinear vocab growth; β ≈ 1
# flags template/ID-heavy sources whose "vocabulary" never saturates.
# Plan: two (source-keyed) partial-agg shuffles + a 16-row-per-source
# cumulative window over the aggregate — corpus-linear.
# --------------------------------------------------------------------------

_HEAPS_SHARDS = 16


def q319_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source",
        # hash-shard: doc_id mod N correlates with source in the feed
        # (round-robin assignment), which would leave each source only
        # a few distinct shards; the md5 bucket is uniform everywhere
        F.pmod(md5long(F.col("doc_id").cast("string")), F.lit(_HEAPS_SHARDS)).alias(
            "shard"
        ),
        F.explode(tokens(F.col("text"))).alias("w"),
    ).select("source", "shard", md5long(F.col("w")).alias("tok"))
    toks = d.groupBy("source", "shard").agg(
        F.count(F.lit(1)).cast("double").alias("n_tok")
    )
    first = d.groupBy("source", "tok").agg(F.min("shard").alias("shard"))
    new = first.groupBy("source", "shard").agg(
        F.count(F.lit(1)).cast("double").alias("n_new")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = (
        # left join: a shard can add tokens but no NEW vocabulary —
        # it must still advance cumulative N (inner join would silently
        # drop its token mass from every later point)
        toks.join(new, ["source", "shard"], "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0.0)))
        .select(
            "source",
            "shard",
            F.log(F.sum("n_tok").over(w)).alias("ln_n"),
            F.log(F.sum("n_new").over(w)).alias("ln_v"),
        )
    )
    g = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.avg("ln_n").alias("mx"),
        F.avg("ln_v").alias("my"),
        F.avg(F.col("ln_n") * F.col("ln_v")).alias("mxy"),
        F.avg(F.col("ln_n") * F.col("ln_n")).alias("mxx"),
        F.avg(F.col("ln_v") * F.col("ln_v")).alias("myy"),
        F.countDistinct("ln_n").alias("dx"),
        F.countDistinct("ln_v").alias("dy"),
    ).filter(
        # degenerate-fit guard: a source confined to one shard, or with
        # a flat cumulative-N or cumulative-V series, has no slope to
        # fit. The guard is on EXACT distinct counts, not the computed
        # variance — avg(y²)−avg(y)² of a constant series rounds to
        # ±1e-16 with an engine-dependent SIGN, so a variance>0 guard
        # keeps the row in one engine and drops it in the other.
        (F.col("n_points") > 2) & (F.col("dx") > 1) & (F.col("dy") > 1)
    )
    beta = (F.col("mxy") - F.col("mx") * F.col("my")) / (
        F.col("mxx") - F.col("mx") * F.col("mx")
    )
    r2 = (
        (F.col("mxy") - F.col("mx") * F.col("my"))
        * (F.col("mxy") - F.col("mx") * F.col("my"))
        / (
            (F.col("mxx") - F.col("mx") * F.col("mx"))
            * (F.col("myy") - F.col("my") * F.col("my"))
        )
    )
    return g.select(
        "source",
        "n_points",
        # + 0.0 canonicalizes IEEE negative zero (a flat fit rounds to
        # -0.0 in one engine and 0.0 in the other)
        (F.round(beta, 6) + 0.0).alias("beta"),
        F.round(F.exp(F.col("my") - beta * F.col("mx")), 6).alias("k"),
        (F.round(r2, 6) + 0.0).alias("r2"),
    )


Q319_SQL = f"""
WITH d AS (
  SELECT source,
         {MD5LONG_SQL.format(x="CAST(doc_id AS VARCHAR)")}
           % {_HEAPS_SHARDS} AS shard,
         {MD5LONG_SQL.format(x="t.w")} AS tok
  FROM documents, unnest({TOKENS_SQL.format(x='text')}) AS t(w)
), toks AS (
  SELECT source, shard, CAST(COUNT(*) AS DOUBLE) AS n_tok
  FROM d GROUP BY 1, 2
), first AS (
  SELECT source, tok, MIN(shard) AS shard FROM d GROUP BY 1, 2
), nw AS (
  SELECT source, shard, CAST(COUNT(*) AS DOUBLE) AS n_new
  FROM first GROUP BY 1, 2
), pts AS (
  SELECT t.source, t.shard,
         LN(SUM(t.n_tok) OVER (PARTITION BY t.source ORDER BY t.shard
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS ln_n,
         LN(SUM(COALESCE(nw.n_new, 0.0)) OVER (PARTITION BY t.source
            ORDER BY t.shard
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS ln_v
  FROM toks t LEFT JOIN nw ON nw.source = t.source AND nw.shard = t.shard
), g AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_points,
         AVG(ln_n) AS mx, AVG(ln_v) AS my,
         AVG(ln_n * ln_v) AS mxy, AVG(ln_n * ln_n) AS mxx,
         AVG(ln_v * ln_v) AS myy
  FROM pts GROUP BY 1
  HAVING COUNT(*) > 2 AND COUNT(DISTINCT ln_n) > 1
     AND COUNT(DISTINCT ln_v) > 1
)
SELECT source, n_points,
       ROUND((mxy - mx * my) / (mxx - mx * mx), 6) + 0.0 AS beta,
       ROUND(EXP(my - (mxy - mx * my) / (mxx - mx * mx) * mx), 6) AS k,
       ROUND((mxy - mx * my) * (mxy - mx * my)
             / ((mxx - mx * mx) * (myy - my * my)), 6) + 0.0 AS r2
FROM g
"""


# --------------------------------------------------------------------------
# q320 — Brier score with the Murphy (1973) three-term decomposition
# over q81/q167's quality score vs the lang='en' pseudo-label:
# Brier = reliability − resolution + uncertainty holds exactly only
# for forecasts constant within each bin, so the residual of the
# identity is reported too — a nonzero residual IS the within-bin
# forecast variance, itself a useful calibration diagnostic. Reuses
# `_quality_score`/`_QSCORE_CTES` verbatim (the q167 contract). One
# 10-bin partial agg + a 1-row rollup.
# --------------------------------------------------------------------------


def q320_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select("lang", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    scored = d.select(
        (F.col("lang") == "en").cast("double").alias("y"),
        _quality_score(F.col("t")).alias("s"),
    )
    b = F.least(F.floor(F.col("s") * 10), F.lit(9)).cast("long")
    bins = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("s").alias("sbar"),
        F.avg("y").alias("ybar"),
        F.sum(
            (F.col("s") - F.col("y")) * (F.col("s") - F.col("y"))
        ).alias("sq"),
    )
    g = bins.agg(
        F.sum("n").alias("n_all"),
        F.sum("sq").alias("sq_all"),
        F.sum(
            F.col("n")
            * (F.col("sbar") - F.col("ybar"))
            * (F.col("sbar") - F.col("ybar"))
        ).alias("rel_n"),
        F.sum(F.col("n") * F.col("ybar")).alias("y_n"),
        F.sum(
            F.col("n") * F.col("ybar") * F.col("ybar")
        ).alias("yy_n"),
    )
    ybar = F.col("y_n") / F.col("n_all")
    brier = F.col("sq_all") / F.col("n_all")
    rel = F.col("rel_n") / F.col("n_all")
    res = F.col("yy_n") / F.col("n_all") - ybar * ybar
    unc = ybar * (1.0 - ybar)
    return g.select(
        F.col("n_all").cast("long").alias("n"),
        F.round(brier, 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(brier - (rel - res + unc), 6).alias("decomp_residual"),
    )


Q320_SQL = f"""
{_QSCORE_CTES},
sc AS (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, s FROM s
), bins AS (
  SELECT LEAST(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
         CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(s) AS sbar, AVG(y) AS ybar,
         SUM((s - y) * (s - y)) AS sq
  FROM sc GROUP BY 1
), g AS (
  SELECT SUM(n) AS n_all, SUM(sq) AS sq_all,
         SUM(n * (sbar - ybar) * (sbar - ybar)) AS rel_n,
         SUM(n * ybar) AS y_n, SUM(n * ybar * ybar) AS yy_n
  FROM bins
)
SELECT CAST(n_all AS BIGINT) AS n,
       ROUND(sq_all / n_all, 6) AS brier,
       ROUND(rel_n / n_all, 6) AS reliability,
       ROUND(yy_n / n_all - (y_n / n_all) * (y_n / n_all), 6)
         AS resolution,
       ROUND((y_n / n_all) * (1.0 - y_n / n_all), 6) AS uncertainty,
       ROUND(sq_all / n_all
             - (rel_n / n_all
                - (yy_n / n_all - (y_n / n_all) * (y_n / n_all))
                + (y_n / n_all) * (1.0 - y_n / n_all)), 6)
         AS decomp_residual
FROM g
"""


# --------------------------------------------------------------------------
# q324 — n-gram novelty curve (the memorization audit of Carlini et al.
# 2023 / the "novel n-gram fraction" reported for LLM train-test
# splits): hash-split documents 80/20 into train/test, then for
# n ∈ {1,2,3} report the fraction of DISTINCT test n-grams never seen
# in train. Novelty rising with n is the healthy signature; a low
# trigram novelty flags the test shard as near-duplicated from train.
# Plan: token arrays once, per-n grams via JVM HOF transform (no
# Python), distinct gram sets keyed by (n, 60-bit gram hash), ONE
# left-anti join — never a per-n rescan of the corpus.
# --------------------------------------------------------------------------

_NOVELTY_NS = (1, 2, 3)


def q324_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        (F.pmod(md5long(F.col("doc_id").cast("string")), F.lit(10)) < 8)
        .alias("is_train"),
        tokens(F.col("text")).alias("t"),
    )
    per_n = []
    for n in _NOVELTY_NS:
        grams = F.expr(
            f"transform(sequence(1, size(t) - {n} + 1),"
            f" i -> concat_ws(' ', slice(t, i, {n})))"
        )
        per_n.append(
            d.filter(F.size("t") >= n).select(
                "is_train",
                F.lit(n).alias("n"),
                F.explode(grams).alias("g"),
            )
        )
    g = per_n[0]
    for f2 in per_n[1:]:
        g = g.unionByName(f2)
    g = g.select("is_train", "n", md5long(F.col("g")).alias("h"))
    train = g.filter("is_train").select("n", "h").distinct()
    test = g.filter(~F.col("is_train")).select("n", "h").distinct()
    novel = (
        test.join(train, ["n", "h"], "left_anti")
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    base = test.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_test")
    )
    return (
        base.join(novel, "n", "left")
        .withColumn("n_novel", F.coalesce("n_novel", F.lit(0)))
        .select(
            "n",
            "n_test",
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_test"), 6).alias(
                "novelty"
            ),
        )
    )


def _q324_sql() -> str:
    parts = []
    for n in _NOVELTY_NS:
        parts.append(f"""
  SELECT is_train, {n} AS n,
         {MD5LONG_SQL.format(
             x=" || ' ' || ".join(f"t[i + {k}]" for k in range(n))
         )} AS h
  FROM tokd, unnest(generate_series(1, len(t) - {n} + 1)) AS u(i)
  WHERE len(t) >= {n}""")
    union = "\n  UNION ALL".join(parts)
    return f"""
WITH tokd AS (
  SELECT {MD5LONG_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 10 < 8
           AS is_train,
         {TOKENS_SQL.format(x='text')} AS t
  FROM documents
), g AS ({union}
), train AS (SELECT DISTINCT n, h FROM g WHERE is_train),
test AS (SELECT DISTINCT n, h FROM g WHERE NOT is_train),
novel AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS n_novel
  FROM test WHERE NOT EXISTS (
    SELECT 1 FROM train WHERE train.n = test.n AND train.h = test.h)
  GROUP BY 1
), base AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS n_test FROM test GROUP BY 1
)
SELECT base.n, base.n_test,
       CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel,
       ROUND(COALESCE(novel.n_novel, 0) / (1.0 * base.n_test), 6)
         AS novelty
FROM base LEFT JOIN novel ON novel.n = base.n
"""


# --------------------------------------------------------------------------
# q335 — Kish effective sample size & design effect (Kish 1965) for a
# length-weighted corpus draw: with importance weights w ∝ n_chars
# (the "sample long documents proportionally more" policy), the
# per-source n_eff = (Σw)²/Σw² and deff = n/n_eff quantify how much
# statistical power the weighting burns — deff ≫ 1 flags a source
# whose heavy-tailed lengths make weighted estimates unstable (the
# q136/q87 samplers' companion diagnostic). One partial agg per
# source; moments in double.
# --------------------------------------------------------------------------


def q335_kish_neff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("w")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
    )
    neff = F.col("sw") * F.col("sw") / F.col("sww")
    return g.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(neff, 4).alias("n_eff"),
        F.round(F.col("n") / neff, 6).alias("design_effect"),
        F.round(neff / F.col("n"), 6).alias("efficiency"),
    )


Q335_SQL = """
WITH d AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS w FROM documents
), g AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(w) AS sw, SUM(w * w) AS sww
  FROM d GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       ROUND(sw * sw / sww, 4) AS n_eff,
       ROUND(n / (sw * sw / sww), 6) AS design_effect,
       ROUND((sw * sw / sww) / n, 6) AS efficiency
FROM g
"""


# --------------------------------------------------------------------------
# q337 — expected / maximum calibration error (Naeini et al. AAAI 2015;
# the ECE/MCE pair every LLM eval reports): over q81/q167's quality
# score vs the lang='en' pseudo-label, ECE = Σ (n_k/N)·|s̄_k − ȳ_k| and
# MCE = max_k |s̄_k − ȳ_k| on the 10 equal-width bins, with the
# per-bin gap table folded in as the count-weighted mean absolute gap.
# Complements q320 (Brier decomposition = the squared-error view; ECE
# is the L1 view regulators and eval harnesses quote). Same verbatim
# `_quality_score`; one 10-bin partial agg + a 1-row rollup.
# --------------------------------------------------------------------------


def q337_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select("lang", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") > 0)
    )
    scored = d.select(
        (F.col("lang") == "en").cast("double").alias("y"),
        _quality_score(F.col("t")).alias("s"),
    )
    b = F.least(F.floor(F.col("s") * 10), F.lit(9)).cast("long")
    bins = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("s").alias("sbar"),
        F.avg("y").alias("ybar"),
    )
    gap = F.abs(F.col("sbar") - F.col("ybar"))
    return bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(
            F.sum(F.col("n") * gap) / F.sum("n"), 6
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )


Q337_SQL = f"""
{_QSCORE_CTES},
sc AS (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, s FROM s
), bins AS (
  SELECT LEAST(CAST(floor(s * 10) AS BIGINT), 9) AS bin,
         CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(s) AS sbar, AVG(y) AS ybar
  FROM sc GROUP BY 1
)
SELECT CAST(SUM(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(SUM(n * ABS(sbar - ybar)) / SUM(n), 6) AS ece,
       ROUND(MAX(ABS(sbar - ybar)), 6) AS mce
FROM bins
"""


# --------------------------------------------------------------------------
# q339 — duplicate token-mass share (the "how much of my compute goes
# to repeated text" number, cf. Lee et al. ACL 2022 on dedup and LLM
# quality): group documents by exact content hash; report, per
# source, the fraction of DOCUMENTS in >1-member groups and the
# fraction of TOKENS those documents carry — token mass is what the
# training loop pays, and it routinely exceeds the doc fraction when
# duplicated docs are long. One (hash) agg + one join-back + a
# 20-row rollup; the hash is 60-bit md5 (q20's idiom).
# --------------------------------------------------------------------------


def q339_dup_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source",
        md5long(F.col("text")).alias("h"),
        F.size(tokens(F.col("text"))).cast("double").alias("n_tok"),
    )
    dup = d.groupBy("h").agg(F.count(F.lit(1)).alias("grp"))
    j = d.join(dup, "h").withColumn(
        "is_dup", (F.col("grp") > 1).cast("double")
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        F.round(F.avg("is_dup"), 6).alias("dup_doc_frac"),
        F.round(
            F.sum(F.col("is_dup") * F.col("n_tok")) / F.sum("n_tok"), 6
        ).alias("dup_token_frac"),
    )


Q339_SQL = f"""
WITH d AS (
  SELECT source, {MD5LONG_SQL.format(x='text')} AS h,
         CAST(len({TOKENS_SQL.format(x='text')}) AS DOUBLE) AS n_tok
  FROM documents
), dup AS (SELECT h, COUNT(*) AS grp FROM d GROUP BY 1)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       ROUND(AVG(CASE WHEN grp > 1 THEN 1.0 ELSE 0.0 END), 6)
         AS dup_doc_frac,
       ROUND(SUM(CASE WHEN grp > 1 THEN n_tok ELSE 0.0 END)
             / SUM(n_tok), 6) AS dup_token_frac
FROM d JOIN dup ON dup.h = d.h
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q342 — ORC ROUNDTRIP: write the document slice as ORC (Spark's
# second built-in columnar format), read it back, and checksum —
# format-portability proof for the source layer (S-family): the same
# narrow projection + checksums q181 pins for CSV, here over a binary
# columnar format with its own reader/writer stack (predicate pushdown
# and column pruning work identically — Catalyst treats both as
# FileFormat scans). The oracle computes the identical checksums from
# the original parquet, so a pass certifies byte-faithful values
# through the ORC encode/decode path. Scale: the write is one narrow
# job (no shuffle), the read-back aggregate is partial-aggregable.
# --------------------------------------------------------------------------


def q342_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    # Deterministic scratch path keyed on (sf_dir, pid): repeated calls
    # within one process (bench warm blocks, the sweep) overwrite one
    # directory instead of leaking a fresh mkdtemp copy per call, while
    # the pid keeps concurrent processes (a sweep beside a bench, or
    # parallel pytest workers) from clobbering each other's directory
    # mid-read (round-4 ADVICE).
    out = os.path.join(
        tempfile.gettempdir(),
        "q342_orc_%s_p%d" % (re.sub(r"\W", "_", sf_dir), os.getpid()),
        "docs_orc",
    )
    d.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "doc_id long, text string, lang string, n_chars long"
    ).orc(out)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10)"
            " as bigint))"
        ).alias("text_xor"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(lang), 1, 15), 16, 10)"
            " as bigint))"
        ).alias("lang_xor"),
    )


Q342_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       bit_xor({MD5LONG_SQL.format(x='text')}) AS text_xor,
       bit_xor({MD5LONG_SQL.format(x='lang')}) AS lang_xor
FROM documents
"""


# --------------------------------------------------------------------------
# q343 — OUTPUT-SHARD BALANCE audit: before a 100-TB corpus export,
# verify the planned shard assignment (hash(doc_id) % n_shards)
# balances BYTES, not just row counts — a skewed shard is the straggler
# that holds the whole write barrier. Per-shard byte totals come from
# one partial-agg shuffle on the 64-key shard id; the balance metrics
# (max/mean ratio, coefficient of variation, mean absolute difference
# Gini) are computed on the 64-row aggregate — the all-pairs |xi−xj|
# Gini form is O(shards²) on that aggregate, never on docs. Output is
# a single summary row both engines derive from identical integer
# sums.
# --------------------------------------------------------------------------

_N_SHARDS = 64


def q343_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    shard = (
        md5long(F.col("doc_id").cast("string")) % _N_SHARDS
    ).alias("shard")
    per = d.select(shard, "n_chars").groupBy("shard").agg(
        F.sum("n_chars").alias("bytes")
    )
    a = per.select(F.col("shard").alias("sa"), F.col("bytes").alias("xa"))
    b = per.select(F.col("shard").alias("sb"), F.col("bytes").alias("xb"))
    pair = a.crossJoin(b)
    g = pair.agg(
        F.countDistinct("sa").cast("long").alias("n_shards"),
        # try_divide: a corpus too small to populate shard 0 zeroes
        # the normalizer (DuckDB: NULL gini — deg_one sweep)
        F.try_divide(
            F.sum(F.abs(F.col("xa") - F.col("xb"))),
            2 * F.countDistinct("sa") * F.sum(
                F.when(F.col("sb") == 0, F.col("xa")).otherwise(0)
            ),
        ).alias("gini"),
    )
    stats = per.agg(
        F.min("bytes").cast("long").alias("min_bytes"),
        F.max("bytes").cast("long").alias("max_bytes"),
        F.avg("bytes").alias("mean_bytes"),
        F.stddev_pop("bytes").alias("sd"),
    )
    return stats.crossJoin(g).select(
        "n_shards",
        "min_bytes",
        "max_bytes",
        F.round("mean_bytes", 4).alias("mean_bytes"),
        F.round(F.col("max_bytes") / F.col("mean_bytes"), 6).alias(
            "max_over_mean"
        ),
        F.round(F.col("sd") / F.col("mean_bytes"), 6).alias("cv"),
        F.round("gini", 6).alias("gini"),
    )


Q343_SQL = f"""
WITH per AS (
  SELECT {MD5LONG_SQL.format(x='CAST(doc_id AS VARCHAR)')} % {_N_SHARDS}
           AS shard,
         SUM(n_chars) AS bytes
  FROM documents GROUP BY 1
), pair AS (
  SELECT a.shard AS sa, a.bytes AS xa, b.shard AS sb, b.bytes AS xb
  FROM per a CROSS JOIN per b
), g AS (
  SELECT COUNT(DISTINCT sa) AS n_shards,
         SUM(abs(xa - xb))
           / (2.0 * COUNT(DISTINCT sa)
              * SUM(CASE WHEN sb = 0 THEN xa ELSE 0 END)) AS gini
  FROM pair
), stats AS (
  SELECT MIN(bytes) AS min_bytes, MAX(bytes) AS max_bytes,
         AVG(bytes) AS mean_bytes, stddev_pop(bytes) AS sd
  FROM per
)
SELECT CAST(n_shards AS BIGINT) AS n_shards,
       CAST(min_bytes AS BIGINT) AS min_bytes,
       CAST(max_bytes AS BIGINT) AS max_bytes,
       ROUND(mean_bytes, 4) AS mean_bytes,
       ROUND(max_bytes / mean_bytes, 6) AS max_over_mean,
       ROUND(sd / mean_bytes, 6) AS cv,
       ROUND(gini, 6) AS gini
FROM stats CROSS JOIN g
"""


# --------------------------------------------------------------------------
# q344 — QUALITY-QUANTILE PARITY by source: the curation-bias audit —
# does any source contribute disproportionately to the TOP quality
# quartile the pipeline keeps? Global p75 of the q22-style composite
# quality score is derived EXACTLY from the rounded-score histogram
# (inverted-CDF rule: smallest value with cum ≥ ceil(0.75·n)) — the
# only unpartitioned window runs over distinct score values, never
# docs. Per-source above-p75 shares and the parity gap vs the corpus
# share follow from one partial-agg groupBy. A |gap| that drifts
# across snapshots means the quality model started favoring a source.
# --------------------------------------------------------------------------


def q344_quantile_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n = F.greatest(F.length("text"), F.lit(1))
    ntok = F.greatest(F.size(tok), F.lit(1))
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?'\"()-]", ""))
    digit = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    alpha = F.length(F.regexp_replace("text", r"[^a-zA-Z]", ""))
    score = F.round(
        F.lit(0.6) * (alpha / n)
        + F.lit(0.2) * (1 - F.least(punct / n * 10, F.lit(1.0)))
        + F.lit(0.2) * (1 - F.least(digit / n * 10, F.lit(1.0))),
        4,
    )
    scored = d.select("source", score.alias("s"))
    hist = scored.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "s",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    p75 = cum.filter(
        F.col("cum") >= F.ceil(F.col("n") * 0.75)
    ).agg(F.min("s").alias("p75"))
    j = scored.crossJoin(F.broadcast(p75))
    per = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.col("s") > F.col("p75")).cast("long").alias("n_top"),
        F.first("p75").alias("p75"),
    )
    tot = per.agg(
        (F.sum("n_top") / F.sum("n_docs")).alias("overall_share")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_top",
        F.round("p75", 4).alias("p75"),
        F.round(F.col("n_top") / F.col("n_docs"), 6).alias("top_share"),
        F.round(
            F.col("n_top") / F.col("n_docs") - F.col("overall_share"), 6
        ).alias("parity_gap"),
    )


Q344_SQL = f"""
WITH scored AS (
  SELECT source,
         ROUND(0.6 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      / (1.0 * greatest(length(text), 1)))
             + 0.2 * (1 - least(length(regexp_replace(text,
                        '[^.,;:!?''"()-]', '', 'g'))
                      / (1.0 * greatest(length(text), 1)) * 10, 1.0))
             + 0.2 * (1 - least(length(regexp_replace(text, '[^0-9]', '', 'g'))
                      / (1.0 * greatest(length(text), 1)) * 10, 1.0)),
           4) AS s
  FROM documents
), hist AS (
  SELECT s, COUNT(*) AS c FROM scored GROUP BY s
), cum AS (
  SELECT s, SUM(c) OVER (ORDER BY s) AS cum, SUM(c) OVER () AS n
  FROM hist
), p75 AS (
  SELECT MIN(s) AS p75 FROM cum WHERE cum >= ceil(n * 0.75)
), per AS (
  SELECT source, COUNT(*) AS n_docs,
         COUNT(*) FILTER (WHERE s > (SELECT p75 FROM p75)) AS n_top
  FROM scored GROUP BY source
), tot AS (
  SELECT SUM(n_top) / (1.0 * SUM(n_docs)) AS overall_share FROM per
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_top AS BIGINT) AS n_top,
       ROUND((SELECT p75 FROM p75), 4) AS p75,
       ROUND(n_top / (1.0 * n_docs), 6) AS top_share,
       ROUND(n_top / (1.0 * n_docs) - overall_share, 6) AS parity_gap
FROM per CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# q349 — TOKEN-BUDGET EPOCH ALLOCATOR: the planning table a
# pretraining run derives before launch — given a total token budget
# (here 3× the corpus) and temperature-smoothed source weights
# (α = 0.3 over available mass, q242's scheme), how many tokens and
# epochs does each source contribute once epoch caps bite? Sources
# whose raw target exceeds the 4-epoch cap are clipped to 4·available
# and their surplus is redistributed to the unclipped sources
# proportionally to weight (ONE redistribution round, documented —
# the fixed-point iteration is a driver-side loop over a ≤thousands-
# row source table in production). All inputs are integer sums; the
# weights and allocations are exact-rational doubles both engines
# derive identically. One partial-agg shuffle on the source key.
# --------------------------------------------------------------------------

_BUDGET_X = 3.0  # total budget as a multiple of available corpus mass
_EPOCH_CAP = 4.0


def q349_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    avail = d.groupBy("source").agg(F.sum("n_chars").alias("avail"))
    g = avail.agg(
        F.sum("avail").alias("tot"),
        F.sum(F.pow(F.col("avail").cast("double"), 0.3)).alias("ptot"),
    )
    w = avail.crossJoin(F.broadcast(g)).select(
        "source",
        "avail",
        (F.pow(F.col("avail").cast("double"), 0.3) / F.col("ptot")).alias(
            "weight"
        ),
        (F.col("tot") * _BUDGET_X).alias("budget"),
    )
    raw = w.withColumn("raw_target", F.col("weight") * F.col("budget"))
    clipped = raw.withColumn(
        "is_clipped", F.col("raw_target") > _EPOCH_CAP * F.col("avail")
    )
    sums = clipped.agg(
        F.sum(
            F.when(F.col("is_clipped"), _EPOCH_CAP * F.col("avail"))
            .otherwise(0.0)
        ).alias("clip_alloc"),
        F.sum(
            F.when(~F.col("is_clipped"), F.col("weight")).otherwise(0.0)
        ).alias("free_w"),
    )
    out = clipped.crossJoin(F.broadcast(sums)).withColumn(
        "alloc",
        F.when(F.col("is_clipped"), _EPOCH_CAP * F.col("avail")).otherwise(
            (F.col("budget") - F.col("clip_alloc"))
            * F.col("weight")
            / F.col("free_w")
        ),
    )
    return out.select(
        "source",
        F.col("avail").cast("long").alias("avail_tokens"),
        F.round("weight", 6).alias("weight"),
        F.round("raw_target", 2).alias("raw_target"),
        "is_clipped",
        F.round("alloc", 2).alias("alloc_tokens"),
        F.round(F.col("alloc") / F.col("avail"), 4).alias("epochs"),
    )


Q349_SQL = f"""
WITH avail AS (
  SELECT source, SUM(n_chars) AS avail FROM documents GROUP BY source
), g AS (
  SELECT SUM(avail) AS tot, SUM(pow(avail, 0.3)) AS ptot FROM avail
), w AS (
  SELECT source, avail, pow(avail, 0.3) / ptot AS weight,
         tot * {_BUDGET_X} AS budget
  FROM avail CROSS JOIN g
), clipped AS (
  SELECT *, weight * budget AS raw_target,
         weight * budget > {_EPOCH_CAP} * avail AS is_clipped
  FROM w
), sums AS (
  SELECT SUM(CASE WHEN is_clipped THEN {_EPOCH_CAP} * avail ELSE 0.0 END)
           AS clip_alloc,
         SUM(CASE WHEN is_clipped THEN 0.0 ELSE weight END) AS free_w
  FROM clipped
), out AS (
  SELECT c.*, CASE WHEN is_clipped THEN {_EPOCH_CAP} * avail
                   ELSE (budget - clip_alloc) * weight / free_w END AS alloc
  FROM clipped c CROSS JOIN sums
)
SELECT source, CAST(avail AS BIGINT) AS avail_tokens,
       ROUND(weight, 6) AS weight,
       ROUND(raw_target, 2) AS raw_target,
       is_clipped,
       ROUND(alloc, 2) AS alloc_tokens,
       ROUND(alloc / avail, 4) AS epochs
FROM out
"""


QUERIES = {
    "q349_token_budget": q349_token_budget,
    "q342_orc_roundtrip": q342_orc_roundtrip,
    "q343_shard_balance": q343_shard_balance,
    "q344_quantile_parity": q344_quantile_parity,
    "q337_calibration_error": q337_calibration_error,
    "q339_dup_token_mass": q339_dup_token_mass,
    "q335_kish_neff": q335_kish_neff,
    "q324_ngram_novelty": q324_ngram_novelty,
    "q319_heaps_fit": q319_heaps_fit,
    "q320_brier_decomposition": q320_brier_decomposition,
    "q277_perplexity_buckets": q277_perplexity_buckets,
    "q280_neyman_allocation": q280_neyman_allocation,
    "q283_ipf_raking": q283_ipf_raking,
    "q288_positional_attribution": q288_positional_attribution,
    "q279_srm_check": q279_srm_check,
    "q267_greedy_coverage": q267_greedy_coverage,
    "q247_kmv_setops": q247_kmv_setops,
    "q244_kneser_ney": q244_kneser_ney,
    "q242_temperature_mix": q242_temperature_mix,
    "q241_zorder_layout": q241_zorder_layout,
    "q236_rendezvous_shards": q236_rendezvous_shards,
    "q228_bpe_merges": q228_bpe_merges,
    "q220_dsir_weights": q220_dsir_weights,
    "q223_cms_estimate": q223_cms_estimate,
    "q160_snapshot_diff": q160_snapshot_diff,
    "q179_snapshot_timetravel": q179_snapshot_timetravel,
    "q181_csv_roundtrip": q181_csv_roundtrip,
    "q190_data_contract": q190_data_contract,
    "q191_chunk_overlap": q191_chunk_overlap,
    "q192_split_assign": q192_split_assign,
    "q166_quantile_normalize": q166_quantile_normalize,
    "q167_calibration": q167_calibration,
    "q136_weighted_sample": q136_weighted_sample,
    "q148_zipf_fit": q148_zipf_fit,
    "q149_fk_audit": q149_fk_audit,
    "q126_corpus_prep_stats": q126_corpus_prep_stats,
    "q118_vocab_growth": q118_vocab_growth,
    "q119_source_overlap": q119_source_overlap,
    "q109_feature_hashing": q109_feature_hashing,
    "q110_heavy_hitters": q110_heavy_hitters,
    "q111_bloom_prune": q111_bloom_prune,
    "q112_bigram_lm": q112_bigram_lm,
    "q70_block_boilerplate": q70_block_boilerplate,
    "q71_pack_offset": q71_pack_offset,
    "q358_pack_boundary_stats": q358_pack_boundary_stats,
    "q72_pattern_scrub": q72_pattern_scrub,
    "q73_zscore_outliers": q73_zscore_outliers,
    "q74_int8_quantize": q74_int8_quantize,
    "q75_funnel": q75_funnel,
    "q76_bigram_topk": q76_bigram_topk,
    "q77_novelty_antijoin": q77_novelty_antijoin,
    "q78_minmax_scale": q78_minmax_scale,
    "q79_decontaminate": q79_decontaminate,
    "q80_unigram_logprob": q80_unigram_logprob,
    "q81_quality_model": q81_quality_model,
    "q82_repetition_ratio": q82_repetition_ratio,
    "q85_oov_rate": q85_oov_rate,
    "q86_crosslang_dups": q86_crosslang_dups,
    "q90_scd2_intervals": q90_scd2_intervals,
    "q93_attribution": q93_attribution,
    "q94_retention_cohorts": q94_retention_cohorts,
    "q95_rolling_uniques": q95_rolling_uniques,
    "q96_event_trigrams": q96_event_trigrams,
    "q97_token_entropy": q97_token_entropy,
    "q87_importance_sample": q87_importance_sample,
    "q88_mix_weights": q88_mix_weights,
    "q89_rate_anomaly": q89_rate_anomaly,
}

ORACLES = {
    "q349_token_budget": Q349_SQL,
    "q342_orc_roundtrip": Q342_SQL,
    "q343_shard_balance": Q343_SQL,
    "q344_quantile_parity": Q344_SQL,
    "q337_calibration_error": Q337_SQL,
    "q339_dup_token_mass": Q339_SQL,
    "q335_kish_neff": Q335_SQL,
    "q324_ngram_novelty": _q324_sql(),
    "q319_heaps_fit": Q319_SQL,
    "q320_brier_decomposition": Q320_SQL,
    "q277_perplexity_buckets": Q277_SQL,
    "q280_neyman_allocation": Q280_SQL,
    "q283_ipf_raking": _q283_sql(),
    "q288_positional_attribution": Q288_SQL,
    "q279_srm_check": Q279_SQL,
    "q267_greedy_coverage": _q267_sql(),
    "q247_kmv_setops": Q247_SQL,
    "q244_kneser_ney": Q244_SQL,
    "q242_temperature_mix": Q242_SQL,
    "q241_zorder_layout": _q241_sql(),
    "q236_rendezvous_shards": Q236_SQL,
    "q228_bpe_merges": _q228_sql(),
    "q220_dsir_weights": Q220_SQL,
    "q223_cms_estimate": _q223_sql(),
    "q160_snapshot_diff": Q160_SQL,
    "q179_snapshot_timetravel": Q179_SQL,
    "q181_csv_roundtrip": Q181_SQL,
    "q190_data_contract": Q190_SQL,
    "q191_chunk_overlap": Q191_SQL,
    "q192_split_assign": Q192_SQL,
    "q166_quantile_normalize": Q166_SQL,
    "q167_calibration": Q167_SQL,
    "q126_corpus_prep_stats": Q126_SQL,
    "q136_weighted_sample": Q136_SQL,
    "q148_zipf_fit": Q148_SQL,
    "q149_fk_audit": Q149_SQL,
    "q118_vocab_growth": Q118_SQL,
    "q119_source_overlap": Q119_SQL,
    "q109_feature_hashing": Q109_SQL,
    "q110_heavy_hitters": Q110_SQL,
    "q111_bloom_prune": Q111_SQL,
    "q112_bigram_lm": Q112_SQL,
    "q70_block_boilerplate": Q70_SQL,
    "q71_pack_offset": Q71_SQL,
    "q358_pack_boundary_stats": Q358_SQL,
    "q72_pattern_scrub": Q72_SQL,
    "q73_zscore_outliers": Q73_SQL,
    "q74_int8_quantize": Q74_SQL,
    "q75_funnel": Q75_SQL,
    "q76_bigram_topk": Q76_SQL,
    "q77_novelty_antijoin": Q77_SQL,
    "q78_minmax_scale": Q78_SQL,
    "q79_decontaminate": Q79_SQL,
    "q80_unigram_logprob": Q80_SQL,
    "q81_quality_model": Q81_SQL,
    "q82_repetition_ratio": Q82_SQL,
    "q85_oov_rate": Q85_SQL,
    "q86_crosslang_dups": Q86_SQL,
    "q90_scd2_intervals": Q90_SQL,
    "q93_attribution": Q93_SQL,
    "q94_retention_cohorts": Q94_SQL,
    "q95_rolling_uniques": Q95_SQL,
    "q96_event_trigrams": Q96_SQL,
    "q97_token_entropy": Q97_SQL,
    "q87_importance_sample": Q87_SQL,
    "q88_mix_weights": Q88_SQL,
    "q89_rate_anomaly": Q89_SQL,
}
