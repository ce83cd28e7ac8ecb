"""Training-data text operators over the `documents` table: exact and
near deduplication (MinHash+LSH, SimHash, n-gram Jaccard), language ID,
quality scoring, token statistics, document fingerprinting.

Engine-parity design: every hash is md5-derived (engine-independent),
every float is rounded at the output boundary, and each DataFrame plan
has a DuckDB twin in this file.

Scale design (100 TB posture):
* All per-document feature extraction (tokens, shingles, signatures) is
  a narrow projection — one scan stage, WholeStageCodegen, no Python.
* Near-dup candidate generation is the LSH band trick: explode signature
  bands → shuffle on (band, key) → per-bucket pairs. The only shuffle is
  on the band key; exact Jaccard verification runs map-side on the
  joined rows. Brute-force O(n²) never happens.
* Hot buckets (a viral duplicate cluster) are bounded by the band hash
  width; AQE skew-join splits any residual hot bucket.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import MD5LONG_SQL, TOKENS_SQL, load, md5long, r4, tokens

# --------------------------------------------------------------------------
# shared feature expressions (Spark) and their DuckDB twins
# --------------------------------------------------------------------------


def shingles(tok: Column) -> Column:
    """3-word shingles (whole text if < 3 tokens), distinct.

    The token array is BOUND to a lambda variable via the
    ``transform(array(x), t -> …)[0]`` trick: referencing the raw
    ``tok`` expression from every ``element_at`` lets Catalyst inline
    the whole split+filter into each of the 3 lookups × every shingle
    position — O(tokens²) re-tokenization, measured 10.5 s vs 0.4 s for
    the bound form on 5k docs (the same alias-inlining pitfall as the
    wide pivot, operators/reconstruct.py)."""

    def tri(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i),
                F.element_at(t, i + 1),
                F.element_at(t, i + 2),
            ),
        )

    return F.transform(
        F.array(tok),
        # the null-filter mirrors DuckDB's list_distinct, which drops
        # NULL elements as well as duplicates — an all-NULL text column
        # must shingle to [] on both engines (deg_nulls sweep)
        lambda t: F.filter(
            F.array_distinct(
                F.when(F.size(t) >= 3, tri(t)).otherwise(
                    F.array(F.array_join(t, " "))
                )
            ),
            lambda s: s.isNotNull(),
        ),
    )[0]


SHINGLES_SQL = """list_distinct(CASE WHEN len({t}) >= 3
  THEN list_transform(generate_series(1, len({t})-2),
                      i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2])
  ELSE [array_to_string({t}, ' ')] END)"""

#: MinHash permutation parameters h_i(x) = (a_i * (x mod P) + b_i) mod P.
#: P < 2^31 and a_i < 2^31 keep a_i * (x mod P) < 2^62 — no int64
#: overflow in either engine.
MINHASH_P = 1_000_000_007
MINHASH_PERMS = (
    (1215467041, 12345),
    (824386243, 67890),
    (530342041, 13579),
    (966447217, 24680),
    (711667523, 11223),
    (340147331, 44556),
    (255608161, 77889),
    (896755559, 99001),
)


def shingle_hashes(sh: Column) -> Column:
    """Each shingle hashed once: md5 → 60-bit int → mod P. Factoring
    this out of the per-permutation lambdas keeps the expression tree
    small (one md5 per shingle instead of 8 — the naive nesting made
    codegen explode to ~160 s for 500 docs; this form runs in ~2 s)."""
    return F.transform(sh, lambda s: md5long(s) % MINHASH_P)


def minhash_sig(hx: Column) -> list[Column]:
    """8-permutation MinHash signature over pre-hashed shingles
    (:func:`shingle_hashes`). Prefer :func:`minhash_struct` when ``hx``
    is an expression rather than a materialized column — 8 references
    to an expensive alias invite projection-collapse re-inlining."""
    out = []
    for a, b in MINHASH_PERMS:
        out.append(
            F.array_min(
                F.transform(hx, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
            )
        )
    return out


def minhash_struct(hx: Column) -> Column:
    """All 8 permutation minima inside ONE lambda binding of the hash
    array (``struct(mh0..mh7)``): projecting 8 :func:`minhash_sig`
    columns off an ``hx`` expression lets projection collapse inline
    the shingle-hashing chain 8× (the alias-inlining pitfall,
    cf. :func:`shingles`); binding it to a lambda variable evaluates it
    exactly once per row."""
    return F.transform(
        F.array(hx),
        lambda h: F.struct(
            *[
                F.array_min(
                    F.transform(
                        h, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P
                    )
                ).alias(f"mh{i}")
                for i, (a, b) in enumerate(MINHASH_PERMS)
            ]
        ),
    )[0]


def minhash_sig_sql(sh_expr: str) -> list[str]:
    out = []
    x = MD5LONG_SQL.format(x="s")
    for a, b in MINHASH_PERMS:
        out.append(
            f"list_min(list_transform({sh_expr}, "
            f"s -> ({a} * ({x} % {MINHASH_P}) + {b}) % {MINHASH_P}))"
        )
    return out


# --------------------------------------------------------------------------
# q20 — exact dedup groups (hash-groupBy; the baseline dedup)
# --------------------------------------------------------------------------
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text hash groups with a deterministic canonical doc
    (min doc_id = first-seen under the natural order). One partial-agg
    shuffle on the 128-bit content hash — the standard exact-dedup plan
    at any scale."""
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return (
        d.select(F.md5(norm).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


Q20_SQL = r"""
SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_hash,
       COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------------------
# q21 — token statistics (token counting for budget accounting)
# --------------------------------------------------------------------------
def q21_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
        r4(
            F.aggregate(tok, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(tok), F.lit(1))
        ).alias("avg_token_len"),
    )


Q21_SQL = f"""
SELECT doc_id, length(text) AS n_chars_actual,
       len(t) AS n_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       ROUND(list_sum(list_transform(t, x -> length(x)))
             / greatest(len(t), 1), 4) AS avg_token_len
FROM (SELECT doc_id, text, {TOKENS_SQL.format(x='text')} AS t FROM documents)
"""


# --------------------------------------------------------------------------
# q22 — quality scoring (length / punct / digit / stopword ratios)
# --------------------------------------------------------------------------
_STOPWORDS = (
    "the a and of to in is for on with as at by an be this that from or "
    "it its are was"
).split()


def q22_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features + a composite score — the
    filter stage every pretraining pipeline runs before tokenization.
    Pure narrow projection: survives any scale unchanged.

    The composite is assembled in EXACT integer arithmetic (one
    numerator over the common denominator 10·n·ntok) and divided once:
    a floating sum of the four weighted terms differs between engines
    at rounding boundaries — DuckDB's vectorized path contracts
    multiply-adds to FMA (score 0.90375 exactly) while the JVM does not
    (0.9037499…9), flipping the 4dp rendering; caught by the sf0.1
    strict sweep, round 4. Integer sums are associativity-free."""
    d = load(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n = F.greatest(F.length("text"), F.lit(1)).cast("long")
    ntok = F.greatest(F.size(tok), F.lit(1)).cast("long")
    punct = F.length(
        F.regexp_replace("text", r"[^.,;:!?'\"()-]", "")
    ).cast("long")
    digit = F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long")
    alpha = F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")).cast("long")
    stop = F.size(
        F.filter(tok, lambda t: t.isin(*[F.lit(s) for s in _STOPWORDS]))
    ).cast("long")
    num = (
        4 * alpha * ntok
        + 3 * F.least(5 * stop, ntok) * n
        + 2 * (n - F.least(10 * punct, n)) * ntok
        + (n - F.least(10 * digit, n)) * ntok
    )
    # 4dp half-up rounding done in EXACT integer space:
    # round(num/denom, 4) = (2·10⁴·num + denom) ÷ (2·denom). A float
    # round of the quotient double is engine-divergent at exact .xxxx5
    # rationals (Spark's Round rounds the shortest decimal rendering of
    # the double — 0.72624999…9 reads "0.72625" → up — while DuckDB
    # rounds the binary value → down). Integer div sidesteps the class.
    denom = 10 * n * ntok
    a = 20000 * num + denom
    b = 2 * denom
    # True long division via the SQL `div` operator — no double
    # intermediate anywhere. The earlier (a - pmod(a,b)) / b form
    # promoted the exact quotient to double before the long cast; past
    # 2^53 (n·ntok ≳ 4.5e11, megabyte-scale docs) the double can land
    # one ulp low and truncate to q-1 while DuckDB's `//` stays exact.
    score_i = F.expr("_q22_a div _q22_b")
    return d.withColumn("_q22_a", a).withColumn("_q22_b", b).select(
        "doc_id",
        r4(punct / n).alias("punct_ratio"),
        r4(digit / n).alias("digit_ratio"),
        r4(alpha / n).alias("alpha_ratio"),
        r4(stop / ntok).alias("stopword_ratio"),
        (score_i / F.lit(10000.0)).alias("quality_score"),
    )


_SW_SQL = "[" + ",".join(f"'{s}'" for s in _STOPWORDS) + "]"
Q22_SQL = f"""
WITH f AS (
  SELECT doc_id,
         greatest(length(text), 1) AS n,
         greatest(len({TOKENS_SQL.format(x='text')}), 1) AS ntok,
         length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
         len(list_filter({TOKENS_SQL.format(x='text')},
                         t -> list_contains({_SW_SQL}, t))) AS stop
  FROM documents)
SELECT doc_id,
       ROUND(punct * 1.0 / n, 4) AS punct_ratio,
       ROUND(digit * 1.0 / n, 4) AS digit_ratio,
       ROUND(alpha * 1.0 / n, 4) AS alpha_ratio,
       ROUND(stop * 1.0 / ntok, 4) AS stopword_ratio,
       ((20000 * (4 * alpha * ntok
                  + 3 * least(5 * stop, ntok) * n
                  + 2 * (n - least(10 * punct, n)) * ntok
                  + (n - least(10 * digit, n)) * ntok)
         + 10 * n * ntok) // (20 * n * ntok))
       / CAST(10000 AS DOUBLE) AS quality_score
FROM f
"""


# --------------------------------------------------------------------------
# q23 — language ID (stopword-hit n-gram heuristic)
# --------------------------------------------------------------------------
_LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "es": ["el", "la", "y", "es", "los", "que", "un"],
    "fr": ["le", "la", "et", "est", "les", "une", "des"],
}


def q23_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language scores + argmax prediction (deterministic
    tiebreak: higher hits, then lexicographic lang code)."""
    d = load(spark, sf_dir, "documents")
    tok = F.array_distinct(tokens(F.col("text")))
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        hits = F.size(
            F.filter(tok, lambda t: t.isin(*[F.lit(m) for m in markers]))
        )
        scores.append((lang, hits))
    # argmax via greatest-of-structs: (hits, reversed-lang) so the max
    # struct is the winner with lexicographic-smallest lang on ties
    best = F.greatest(
        *[
            F.struct(h.alias("h"), F.lit(-i).alias("ri"), F.lit(lang).alias("lang"))
            for i, (lang, h) in enumerate(scores)
        ]
    )
    sel = [F.col("doc_id"), F.col("lang").alias("lang_actual")]
    for lang, h in scores:
        sel.append(h.alias(f"hits_{lang}"))
    sel.append(best["lang"].alias("lang_pred"))
    return d.select(*sel)


def _langid_sql() -> str:
    t = TOKENS_SQL.format(x="text")
    hit_cols = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = "[" + ",".join(f"'{m}'" for m in markers) + "]"
        hit_cols.append(
            f"len(list_filter(list_distinct({t}), t -> list_contains({arr}, t)))"
            f" AS hits_{lang}"
        )
    langs = sorted(_LANG_MARKERS)
    structs = ", ".join(
        f"{{'h': hits_{lang}, 'ri': {-i}, 'lang': '{lang}'}}"
        for i, lang in enumerate(langs)
    )
    return f"""
WITH h AS (
  SELECT doc_id, lang AS lang_actual, {', '.join(hit_cols)}
  FROM documents)
SELECT doc_id, lang_actual, hits_de, hits_en, hits_es, hits_fr,
       list_max([{structs}]).lang AS lang_pred
FROM h
"""


Q23_SQL = _langid_sql()


# --------------------------------------------------------------------------
# q197 — language-ID confusion matrix: q23's marker-token classifier
# evaluated against the true lang label, as (actual, predicted) counts
# with per-actual recall shares — the eval half that closes the loop on
# the classifier (every per-class error mode visible, not just
# accuracy). Reuses q23's predictor and its SQL twin VERBATIM (q119's
# reuse discipline); counts integer, shares divide integers.
# --------------------------------------------------------------------------


def q197_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q23_langid(spark, sf_dir)
    g = base.groupBy("lang_actual", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    wa = Window.partitionBy("lang_actual")
    return g.select(
        "lang_actual",
        "lang_pred",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wa), 6).alias(
            "share_of_actual"
        ),
    )


def _q197_sql() -> str:
    return f"""
WITH base AS ({_langid_sql()})
SELECT lang_actual, lang_pred, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) / (1.0 * SUM(COUNT(*))
             OVER (PARTITION BY lang_actual)), 6) AS share_of_actual
FROM base GROUP BY lang_actual, lang_pred
"""


# --------------------------------------------------------------------------
# q201 — knee detection on the rank-frequency curve ("kneedle"-lite):
# the rank whose log-log point lies farthest from the chord between
# the curve's endpoints — the cutoff-picking step after q148's Zipf
# fit (how many head tokens to treat specially). Distance is the
# unnormalized cross-product magnitude; both engines evaluate it on
# identical ln(rank)/ln(count) doubles, so the argmax (rank tie-break)
# is engine-portable.
# --------------------------------------------------------------------------


def q201_zipf_knee(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = d.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    r = vocab.withColumn("rank", F.row_number().over(w))
    b = r.agg(
        F.max("rank").alias("rn"),
        F.max(F.when(F.col("rank") == 1, F.log("cnt"))).alias("ly1"),
        F.min(F.when(F.col("rank") == 1, F.lit(0.0))).alias("lx1"),
    )
    j = r.crossJoin(F.broadcast(b))
    lx = F.log("rank")
    ly = F.log("cnt")
    lyn = F.max(F.when(F.col("rank") == F.col("rn"), F.log("cnt")))
    # second pass carries ln(cnt) at rank rn via a window over the tiny
    # vocab table (one partition of |vocab| rows)
    wv = Window.partitionBy(F.lit(1))
    j = j.withColumn("lyn", lyn.over(wv)).withColumn(
        "lxn", F.log(F.col("rn"))
    )
    dist = F.abs(
        (F.col("lxn") - F.col("lx1")) * (F.col("ly1") - ly)
        - (F.col("lx1") - lx) * (F.col("lyn") - F.col("ly1"))
    )
    return (
        j.select(
            "tok",
            F.col("rank").cast("long").alias("rank"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(dist, 6).alias("chord_dist"),
        )
        .orderBy(F.desc("chord_dist"), "rank")
        .limit(1)
    )


Q201_SQL = f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
), vocab AS (
  SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
), r AS (
  SELECT tok, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
  FROM vocab
), b AS (
  SELECT MAX(rank) AS rn,
         MAX(CASE WHEN rank = 1 THEN ln(cnt) END) AS ly1,
         MAX(CASE WHEN rank = (SELECT MAX(rank) FROM r)
                  THEN ln(cnt) END) AS lyn
  FROM r
)
SELECT tok, CAST(rank AS BIGINT) AS rank, CAST(cnt AS BIGINT) AS cnt,
       ROUND(abs((ln(b.rn) - 0.0) * (b.ly1 - ln(cnt))
                 - (0.0 - ln(rank)) * (b.lyn - b.ly1)), 6) AS chord_dist
FROM r, b
ORDER BY ROUND(abs((ln(b.rn) - 0.0) * (b.ly1 - ln(cnt))
               - (0.0 - ln(rank)) * (b.lyn - b.ly1)), 6) DESC, rank
LIMIT 1
"""


# --------------------------------------------------------------------------
# q209 — weighted (multiset) Jaccard between sources on their token
# COUNT vectors: Σ min(cₐ,c_b) / Σ max(cₐ,c_b) over the vocab — the
# multiplicity-aware similarity q119's set-overlap matrix ignores
# (a source that repeats the same tokens 10× is NOT identical to one
# that uses them once). Full-outer join per source pair on the token
# key, missing side counts as 0; all integers, exact ratio.
# --------------------------------------------------------------------------


def q209_weighted_jaccard_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    c = d.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    a = c.select(
        F.col("source").alias("src_a"), "tok", F.col("c").alias("ca")
    )
    b = c.select(
        F.col("source").alias("src_b"), "tok", F.col("c").alias("cb")
    )
    tot = c.groupBy("source").agg(F.sum("c").alias("tot"))
    # Σ max over the vocab UNION = Σ max over common tokens
    #   + (tot_a − Σ ca over common) + (tot_b − Σ cb over common);
    # one pair join carries all four sums
    common = (
        a.join(b, "tok", "inner")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.least("ca", "cb")).alias("s_min"),
            F.sum(F.greatest("ca", "cb")).alias("s_max_common"),
            F.sum("ca").alias("ca_c"),
            F.sum("cb").alias("cb_c"),
        )
    )
    j = (
        common.join(tot.withColumnRenamed("source", "src_a"), "src_a")
        .withColumnRenamed("tot", "tot_a")
        .join(tot.withColumnRenamed("source", "src_b"), "src_b")
        .withColumnRenamed("tot", "tot_b")
    )
    s_max = (
        F.col("s_max_common")
        + (F.col("tot_a") - F.col("ca_c"))
        + (F.col("tot_b") - F.col("cb_c"))
    )
    return j.select(
        "src_a",
        "src_b",
        F.col("s_min").cast("long").alias("sum_min"),
        s_max.cast("long").alias("sum_max"),
        F.round(F.col("s_min") / s_max, 6).alias("weighted_jaccard"),
    )


Q209_SQL = f"""
WITH tok AS (
  SELECT source, unnest({TOKENS_SQL.format(x='text')}) AS tok
  FROM documents
), c AS (
  SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2
), tot AS (SELECT source, SUM(c) AS tot FROM c GROUP BY 1),
common AS (
  SELECT a.source AS src_a, b.source AS src_b,
         SUM(LEAST(a.c, b.c)) AS s_min,
         SUM(GREATEST(a.c, b.c)) AS s_max_common,
         SUM(a.c) AS ca_c, SUM(b.c) AS cb_c
  FROM c a JOIN c b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       CAST(s_min AS BIGINT) AS sum_min,
       CAST(s_max_common + (ta.tot - ca_c) + (tb.tot - cb_c) AS BIGINT)
         AS sum_max,
       ROUND(s_min / (1.0 * (s_max_common + (ta.tot - ca_c)
                             + (tb.tot - cb_c))), 6) AS weighted_jaccard
FROM common
JOIN tot ta ON ta.source = common.src_a
JOIN tot tb ON tb.source = common.src_b
"""


# --------------------------------------------------------------------------
# q212 — per-class precision/recall/F1 + macro-F1 for the language-ID
# classifier: the metric rollup over q197's confusion matrix (reusing
# q23's predictor verbatim). Per class c: P = tp/(tp+fp), R =
# tp/(tp+fn); macro-F1 averages the per-class F1s. All integer counts;
# classes never predicted render NULL precision rather than erroring.
# --------------------------------------------------------------------------


def q212_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q23_langid(spark, sf_dir).select("lang_actual", "lang_pred")
    per = base.groupBy(F.col("lang_actual").alias("cls")).agg(
        F.count(F.lit(1)).alias("support"),
        F.count_if(F.col("lang_pred") == F.col("lang_actual")).alias("tp"),
    )
    pred = base.groupBy(F.col("lang_pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = per.join(pred, "cls", "left").select(
        "cls",
        "support",
        "tp",
        F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.col("tp") / F.col("support")
    f1 = F.when(
        F.col("tp") > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return j.select(
        "cls",
        F.col("support").cast("long").alias("support"),
        F.col("tp").cast("long").alias("tp"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def _q212_sql() -> str:
    return f"""
WITH base AS ({_langid_sql()}),
per AS (
  SELECT lang_actual AS cls, COUNT(*) AS support,
         COUNT(*) FILTER (WHERE lang_pred = lang_actual) AS tp
  FROM base GROUP BY 1
), pred AS (
  SELECT lang_pred AS cls, COUNT(*) AS n_pred FROM base GROUP BY 1
), j AS (
  SELECT per.cls, per.support, per.tp,
         COALESCE(pred.n_pred, 0) AS n_pred
  FROM per LEFT JOIN pred USING (cls)
)
SELECT cls, CAST(support AS BIGINT) AS support, CAST(tp AS BIGINT) AS tp,
       ROUND(CASE WHEN n_pred > 0 THEN tp / (1.0 * n_pred) END, 6)
         AS precision,
       ROUND(tp / (1.0 * support), 6) AS recall,
       ROUND(CASE WHEN tp > 0 THEN
         2 * (tp / (1.0 * n_pred)) * (tp / (1.0 * support))
         / (tp / (1.0 * n_pred) + tp / (1.0 * support))
       ELSE 0.0 END, 6) AS f1
FROM j
"""


# --------------------------------------------------------------------------
# q24 — MinHash signatures (the scale path to near-dedup)
# --------------------------------------------------------------------------
def q24_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    hx = shingle_hashes(shingles(tokens(F.col("text"))))
    return d.select("doc_id", minhash_struct(hx).alias("m")).select(
        "doc_id", "m.*"
    )


Q24_SQL = f"""
SELECT doc_id, {', '.join(f'{s} AS mh{i}' for i, s in enumerate(minhash_sig_sql('sh')))}
FROM (SELECT doc_id, {SHINGLES_SQL.format(t=TOKENS_SQL.format(x='text'))} AS sh
      FROM documents)
"""


# --------------------------------------------------------------------------
# q25 — MinHash + LSH near-dup pairs (band trick + exact verify)
# --------------------------------------------------------------------------
#: the previous invocation's persisted MinHash feature table — released
#: on the next call (the returned DF is lazy, so unpersisting inside
#: q25 itself would force recomputation before the caller collects).
#: Callers wanting immediate release can pop+unpersist it themselves.
_Q25_FEATS_CACHE: list[DataFrame] = []


def q25_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4 bands × 2 rows over the 8-perm signature: docs sharing any band
    key become candidates (shuffle on the band key only); candidates are
    verified with exact shingle Jaccard ≥ 0.4. This is the linear-cost
    near-dedup plan — the O(n²) comparison never materializes."""
    from pyspark.storagelevel import StorageLevel

    while _Q25_FEATS_CACHE:
        _Q25_FEATS_CACHE.pop().unpersist()
    d = load(spark, sf_dir, "documents")
    sh = shingles(tokens(F.col("text")))
    staged = d.select("doc_id", sh.alias("sh")).withColumn(
        "hx", shingle_hashes(F.col("sh"))
    )
    # The signature table is materialized ONCE (in production: written to
    # its own table — the standard LSH pipeline shape); shingling + 8-perm
    # MinHash is the CPU-dominant stage and must not re-run per consumer.
    feats = (
        staged.select("doc_id", "sh", minhash_struct(F.col("hx")).alias("m"))
        .select("doc_id", "sh", "m.*")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _Q25_FEATS_CACHE.append(feats)
    # band join carries ONLY (doc_id, band, key) — never the shingle
    # arrays. Carrying the full shingle set through the candidate join
    # shuffles every doc's payload 4× per side; at 100 TB the band
    # exchange would be dominated by bytes no comparator ever reads.
    # Shingles are joined back per *candidate pair* (candidates ≪ docs).
    bands = feats.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # F.concat (NULL-propagating, like the
                        # oracle's ||): an all-NULL doc has NULL minima
                        # and must form NO band key — concat_ws would
                        # skip the NULLs and bucket every null doc
                        # together (deg_nulls sweep)
                        F.concat(
                            F.col(f"mh{2 * b}").cast("string"),
                            F.lit("_"),
                            F.col(f"mh{2 * b + 1}").cast("string"),
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    pairs = (
        a.join(b, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = pairs.join(
        feats.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        on="doc_a",
    ).join(
        feats.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        on="doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return (
        cand.select("doc_a", "doc_b", r4(jac).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.4)
    )


Q25_SQL = f"""
WITH feats AS (
  SELECT doc_id, sh,
         {', '.join(f'{s} AS mh{i}' for i, s in enumerate(minhash_sig_sql('sh')))}
  FROM (SELECT doc_id, {SHINGLES_SQL.format(t=TOKENS_SQL.format(x='text'))} AS sh
        FROM documents)
), bands AS (
  SELECT doc_id, sh, b.band,
         CASE b.band WHEN 0 THEN mh0 || '_' || mh1
                     WHEN 1 THEN mh2 || '_' || mh3
                     WHEN 2 THEN mh4 || '_' || mh5
                     ELSE mh6 || '_' || mh7 END AS key
  FROM feats, (SELECT unnest([0,1,2,3]) AS band) b
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(len(list_intersect(sh_a, sh_b)) * 1.0
             / len(list_distinct(sh_a || sh_b)), 4) AS jaccard
FROM cand
WHERE len(list_intersect(sh_a, sh_b)) * 1.0
      / len(list_distinct(sh_a || sh_b)) >= 0.4
"""


# --------------------------------------------------------------------------
# q26 — SimHash (16-bit) per document
# --------------------------------------------------------------------------
def q26_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over distinct-token md5 hashes — bitwise majority
    vote, computed as 16 aggregate expressions in one narrow projection
    (no explode, no shuffle)."""
    d = load(spark, sf_dir, "documents")
    tok = F.array_distinct(tokens(F.col("text")))
    h = F.transform(tok, lambda t: md5long(t))

    # all 16 votes inside ONE lambda binding of the hash array —
    # referencing `h` from each vote would re-inline the
    # tokenize+distinct+md5 chain 16× per row (cf. shingles())
    def sim_of(hh: Column) -> Column:
        bits = []
        for bpos in range(16):
            vote = F.aggregate(
                hh,
                F.lit(0),
                lambda acc, x: acc
                + F.when(
                    F.shiftright(x, bpos).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1),
            )
            bits.append(F.when(vote > 0, F.lit(1 << bpos)).otherwise(F.lit(0)))
        out = bits[0]
        for bcol in bits[1:]:
            out = out + bcol
        return out

    simhash = F.transform(F.array(h), sim_of)[0]
    return d.select("doc_id", simhash.cast("long").alias("simhash"))


def _simhash_sql() -> str:
    x = MD5LONG_SQL.format(x="t")
    bit_terms = []
    for bpos in range(16):
        vote = (
            f"list_sum(list_transform(tok, t -> CASE WHEN "
            f"(({x} >> {bpos}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        bit_terms.append(f"CASE WHEN {vote} > 0 THEN {1 << bpos} ELSE 0 END")
    return f"""
SELECT doc_id, CAST({' + '.join(bit_terms)} AS BIGINT) AS simhash
FROM (SELECT doc_id, list_distinct({TOKENS_SQL.format(x='text')}) AS tok
      FROM documents)
"""


Q26_SQL = _simhash_sql()


# --------------------------------------------------------------------------
# q27 — blocked n-gram Jaccard near-dup (explode-join formulation)
# --------------------------------------------------------------------------
#: document-frequency cutoff: a gram appearing in more than this many
#: docs within a (lang, source) block is stopword-like — it contributes
#: no discriminative signal and is exactly the hot key that makes the
#: self-join quadratic. With the cutoff, the worst-case pair fan-out per
#: gram is bounded at DF_MAX² regardless of corpus size (vs N²).
DF_MAX = 100


def q27_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard via the distributed formulation: explode
    grams → prune high-document-frequency grams → self-join on gram
    within a (lang, source) block → count shared grams per pair →
    Jaccard over the pruned vocabulary. Unlike the array-intersect form
    this never needs both full gram sets on one row, so it scales to
    arbitrarily long documents.

    Scale shape: the hot-gram exclusion list (df > DF_MAX) is tiny by
    construction — it is removed with a broadcast anti-join, so no
    single gram key can fan out more than DF_MAX² pairs in the
    candidate join."""
    d = load(spark, sf_dir, "documents")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 3, F.lit(1))),
            lambda i: F.substring(F.col("text"), i, 4),
        )
    )
    e = d.select("doc_id", "lang", "source", grams.alias("g")).select(
        "doc_id", "lang", "source", F.explode("g").alias("gram")
    )
    hot = (
        e.groupBy("lang", "source", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_MAX)
        .select("lang", "source", "gram")
    )
    kept = e.join(
        F.broadcast(hot), on=["lang", "source", "gram"], how="left_anti"
    )
    # per-doc pruned-vocabulary size (grams are distinct per doc)
    ng = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ng"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "lang", "source", "gram")
    b = kept.select(F.col("doc_id").alias("doc_b"), "lang", "source", "gram")
    shared = (
        a.join(b, on=["lang", "source", "gram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pairs = shared.join(
        ng.select(F.col("doc_id").alias("doc_a"), F.col("ng").alias("ng_a")),
        on="doc_a",
    ).join(
        ng.select(F.col("doc_id").alias("doc_b"), F.col("ng").alias("ng_b")),
        on="doc_b",
    )
    jac = F.col("n_shared") / (F.col("ng_a") + F.col("ng_b") - F.col("n_shared"))
    return (
        pairs.select("doc_a", "doc_b", r4(jac).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
    )


Q27_SQL = f"""
WITH g AS (
  SELECT doc_id, lang, source,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - 3, 1)),
           i -> substr(text, i, 4))) AS grams
  FROM documents
), e AS (
  SELECT doc_id, lang, source, unnest(grams) AS gram FROM g
), dfreq AS (
  SELECT lang, source, gram, COUNT(*) AS df FROM e GROUP BY 1, 2, 3
), kept AS (
  SELECT e.doc_id, e.lang, e.source, e.gram
  FROM e JOIN dfreq USING (lang, source, gram)
  WHERE dfreq.df <= {DF_MAX}
), ng AS (
  SELECT doc_id, COUNT(*) AS ng FROM kept GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b
    ON a.lang = b.lang AND a.source = b.source AND a.gram = b.gram
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_shared * 1.0 / (na.ng + nb.ng - n_shared), 4) AS jaccard
FROM shared
JOIN ng na ON na.doc_id = shared.doc_a
JOIN ng nb ON nb.doc_id = shared.doc_b
WHERE n_shared * 1.0 / (na.ng + nb.ng - n_shared) >= 0.6
"""


# --------------------------------------------------------------------------
# q28 — document fingerprint (min-hash sketch + content hash)
# --------------------------------------------------------------------------
def q28_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact per-doc fingerprint: lexicographic min/max shingle hash
    (a 2-value MinHash sketch) + shingle count + full content hash.
    Equal fingerprints ⇒ near-certain duplicates; used as the cheap
    pre-filter before LSH."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(tokens(F.col("text")))
    hashed = F.transform(sh, lambda s: F.md5(s))
    return d.select(
        "doc_id",
        F.array_min(hashed).alias("fp_min"),
        F.array_max(hashed).alias("fp_max"),
        F.size(sh).alias("n_shingles"),
        F.md5("text").alias("content_hash"),
    )


Q28_SQL = f"""
SELECT doc_id,
       list_min(list_transform(sh, s -> md5(s))) AS fp_min,
       list_max(list_transform(sh, s -> md5(s))) AS fp_max,
       len(sh) AS n_shingles,
       md5(text) AS content_hash
FROM (SELECT doc_id, text,
             {SHINGLES_SQL.format(t=TOKENS_SQL.format(x='text'))} AS sh
      FROM documents)
"""


# --------------------------------------------------------------------------
# q34 — BPE-style token counting (pretraining budget estimation)
# --------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer pattern, restricted to the ASCII classes
#: both regex engines (Java in Spark, RE2 in DuckDB) treat identically:
#: contraction suffixes, space-prefixed letter runs, digit runs,
#: punctuation runs, residual whitespace.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def q34_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer token counting — the budget estimate every
    pretraining pipeline needs before the real BPE merge table is
    applied (the merge step only splits pre-tokens further, so this is
    a deterministic lower bound). regexp-based, whole-stage codegen,
    no Python; narrow projection that survives any scale unchanged."""
    d = load(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    ws = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(pieces).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
        r4(
            F.size(pieces)
            / F.greatest(F.size(ws), F.lit(1)).cast("double")
        ).alias("bpe_per_word"),
    )


_BPE_RE_SQL = _BPE_RE.replace("'", "''")  # SQL string-literal quoting

Q34_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS n_bpe_tokens,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       ROUND(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))
             / greatest(len(string_split_regex(trim(text), '\\s+')), 1)::DOUBLE,
             4) AS bpe_per_word
FROM documents
"""


# --------------------------------------------------------------------------
# q41 — TF-IDF top keyword per document. Corpus-statistics join shape:
# term frequencies aggregate per (doc, term) map-side; document
# frequencies are a second partial agg over distinct (doc, term); idf
# joins back BROADCAST (the term dictionary is tiny relative to the
# corpus — vocabulary grows ~O(corpus^0.5), Heaps' law). One wide
# shuffle total at any scale; top-1 per doc is a min-struct aggregate,
# not a window, so the final shuffle carries one row per (doc, term).
# --------------------------------------------------------------------------


def q41_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar; one cheap count-star job (metadata-sized)
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
    ).filter(F.length("term") >= 3)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.select("term", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.col("idf")).alias("score"),
    )
    # top-1 per doc, deterministic: max struct of (score, reversed-term)
    # won't tie-break lexicographically-smallest term, so use a struct
    # of (score, negated rank) — simplest exact form: min over
    # (-score, term), which orders by score desc then term asc.
    best = (
        scored.groupBy("doc_id")
        .agg(F.min(F.struct(F.negate(F.col("score")).alias("ns"), "term")).alias("b"))
        .select(
            "doc_id",
            F.col("b.term").alias("term"),
            r4(-F.col("b.ns")).alias("score"),
        )
    )
    return best


Q41_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE length(term) >= 3 GROUP BY doc_id, term
),
idf AS (
  SELECT term,
         ln((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / COUNT(*)) AS idf
  FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS score
  FROM tf JOIN idf ON tf.term = idf.term
)
SELECT doc_id, term, ROUND(score, 4) AS score FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q42 — deterministic hash sampling: reproducible corpus subsets
# without a random seed dependency (md5 of the key is identical across
# engines, runs, and cluster sizes — the property `rand(seed)` does NOT
# have under repartitioning). Filter sits on the scan; the aggregate is
# partial. Rate here = 0x28/0x100 = 15.6%.
# --------------------------------------------------------------------------


def q42_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        d.filter(bucket < "28")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


Q42_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q50 — near-dup CLUSTER dedup: the operator a training pipeline
# actually runs. q25's LSH pairs are only the edge stream — transitive
# duplicates (A~B, B~C but A!~C) must collapse into ONE cluster with
# ONE kept representative, or the dedup either under-removes or keeps
# two "canonicals" that are near-dups of each other. Pipeline:
# LSH candidate pairs → connected components (operators/components.py,
# the same salted min-label propagation stage K uses) → per cluster
# keep the longest doc (tie-break min doc_id) and account the chars
# removed. Every cluster here has ≥ 2 members by construction (only
# docs with a near-dup edge enter the component graph).
# Oracle: the q25 pair SQL verbatim as a subquery, a recursive-CTE
# transitive closure (small-graph oracle for the iterative Spark
# algorithm, as in q32/kg66), and a min-list argmax for the keeper.
# --------------------------------------------------------------------------


def q50_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    pairs = q25_lsh_neardup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b", max_iter=20)
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    member = comp.join(d, comp.id == d.doc_id).select(
        F.col("canonical_id").alias("cluster_id"), "doc_id", "n_chars"
    )
    # keeper = min over (-n_chars, doc_id): longest doc, then smallest id
    keep = F.min(
        F.struct((-F.col("n_chars")).alias("nn"), F.col("doc_id").alias("d"))
    )
    return member.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        keep["d"].alias("keep_doc"),
        (F.sum("n_chars") + keep["nn"]).cast("long").alias("chars_removed"),
    )


Q50_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({Q25_SQL})
), edges AS (
  SELECT doc_a AS n, doc_b AS m FROM pairs
  UNION
  SELECT doc_b AS n, doc_a AS m FROM pairs
), reach(n, m) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n
), comp AS (
  SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
), member AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       (min([-n_chars, doc_id]))[2] AS keep_doc,
       CAST(SUM(n_chars) + (min([-n_chars, doc_id]))[1] AS BIGINT)
           AS chars_removed
FROM member GROUP BY cluster_id
"""


# --------------------------------------------------------------------------
# q53 — blocked fuzzy matching (edit-distance near-dup over short
# strings — entity-name dedup, the string analogue of q25). All-pairs
# levenshtein is O(n²·len²) and never runs: candidates are generated
# inside BLOCKS (here p_brand; in entity resolution: a cheap canopy
# key), with a length prefilter |len(a)-len(b)| ≤ k — a lower bound on
# edit distance — applied as a join predicate so the expensive
# levenshtein only evaluates on survivors. Per-block pair fan-out is
# bounded by the block size the blocking key guarantees; a skewed
# block is an AQE skew-join split. Both engines implement classic
# Levenshtein (unit costs), so the oracle is the same expression.
# --------------------------------------------------------------------------

_FUZZY_K = 2


def q53_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    pairs = a.join(b, on="brand").filter(
        (F.col("key_a") < F.col("key_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= _FUZZY_K
        )
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        pairs.select(
            "brand",
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            dist.cast("long").alias("edit_dist"),
        )
        .filter((F.col("edit_dist") >= 1) & (F.col("edit_dist") <= _FUZZY_K))
    )


Q53_SQL = f"""
SELECT a.p_brand AS brand,
       a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_partkey < b.p_partkey
 AND abs(len(a.p_name) - len(b.p_name)) <= {_FUZZY_K}
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {_FUZZY_K}
"""


# --------------------------------------------------------------------------
# q52 — stratified deterministic sampling: keep ~10% of documents PER
# (lang, source) stratum, not 10% overall — the sampler a training mix
# actually needs (uniform sampling starves small languages). Selection
# is by md5(doc_id) rank inside the stratum, so it is reproducible
# across runs/engines and needs no RNG state. The quota is computed in
# INTEGER arithmetic (10*rank <= n+9 ⟺ rank <= ceil(n/10)) because
# DuckDB parses `0.1` as DECIMAL while Spark uses DOUBLE — a float
# quota can round differently at exact multiples. One window over one
# shuffle on the stratum key; at scale the rank/count windows share
# the same partitioning so Catalyst plans a single exchange.
# --------------------------------------------------------------------------


def q52_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    key = F.md5(F.col("doc_id").cast("string"))
    strat = Window.partitionBy("lang", "source")
    rn = F.row_number().over(strat.orderBy(key.asc(), F.col("doc_id").asc()))
    n = F.count(F.lit(1)).over(strat)
    return (
        d.select(
            "lang",
            "source",
            "doc_id",
            rn.cast("long").alias("sample_rank"),
            n.alias("_n"),
        )
        .filter(F.lit(10) * F.col("sample_rank") <= F.col("_n") + F.lit(9))
        .drop("_n")
    )


Q52_SQL = """
WITH ranked AS (
  SELECT lang, source, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS sample_rank,
         COUNT(*) OVER (PARTITION BY lang, source) AS n
  FROM documents
)
SELECT lang, source, doc_id, sample_rank
FROM ranked WHERE 10 * sample_rank <= n + 9
"""


# --------------------------------------------------------------------------
# q137 — SimHash near-dup RETRIEVAL via the pigeonhole band index: q26
# computes the fingerprints; this finds the pairs. The 16-bit simhash
# splits into 4 bands of 4 bits — any two hashes within Hamming
# distance 3 agree on at least one whole band (pigeonhole), so the
# candidate join is per-(band, value) bucket, never all-pairs; the
# exact bit_count(xor) check then trims bucket false positives. At web
# scale the fingerprint widens (64/128 bits) and the band count tracks
# the distance bound — same plan, bigger keys. One shuffle on the
# band key + the exact-verify projection.
# --------------------------------------------------------------------------

_SH_BANDS, _SH_BITS, _SH_MAXHAM = 4, 4, 3


def q137_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = q26_simhash(spark, sf_dir)
    keys = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(b) for b in range(_SH_BANDS)])
        ).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(f"shiftright(simhash, {_SH_BITS} * band)")
        .bitwiseAND(F.lit((1 << _SH_BITS) - 1))
        .alias("bval"),
    )
    a = keys.select(
        "band", "bval", F.col("doc_id").alias("id1"), F.col("simhash").alias("h1")
    )
    b = keys.select(
        "band", "bval", F.col("doc_id").alias("id2"), F.col("simhash").alias("h2")
    )
    pairs = (
        a.join(b, ["band", "bval"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "h1", "h2")
        .distinct()
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("ham"),
        )
        .filter(F.col("ham") <= _SH_MAXHAM)
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("ham"), 6).alias("avg_hamming"),
        F.min(F.concat_ws(">", "id1", "id2")).alias("min_pair"),
        F.max(F.concat_ws(">", "id1", "id2")).alias("max_pair"),
    )


def _q137_sql() -> str:
    return f"""
WITH sim AS ({Q26_SQL}),
keys AS (
  SELECT doc_id, simhash, u.band,
         (simhash >> ({_SH_BITS} * u.band)) & {(1 << _SH_BITS) - 1} AS bval
  FROM sim, unnest(generate_series(0, {_SH_BANDS - 1})) AS u(band)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
         a.simhash AS h1, b.simhash AS h2
  FROM keys a JOIN keys b
    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
),
ok AS (
  SELECT id1, id2, bit_count(xor(h1, h2)) AS ham FROM pairs
  WHERE bit_count(xor(h1, h2)) <= {_SH_MAXHAM}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ham), 6) AS avg_hamming,
       MIN(CAST(id1 AS VARCHAR) || '>' || CAST(id2 AS VARCHAR)) AS min_pair,
       MAX(CAST(id1 AS VARCHAR) || '>' || CAST(id2 AS VARCHAR)) AS max_pair
FROM ok
"""


# --------------------------------------------------------------------------
# q144 — MinHash ESTIMATE-ACCURACY audit: for every LSH candidate pair,
# the sketch's Jaccard estimate (fraction of agreeing signature
# components) against the exact shingle Jaccard — the calibration
# check a dedup pipeline runs before trusting sketch thresholds at
# scale (8 perms → σ ≈ √(J(1−J)/8); the audit MEASURES the realized
# error instead of assuming it). Everything is deterministic: the
# signatures are the q24/q25 integer minhashes, the estimate divides
# integers, and the summary renders at 6dp.
# --------------------------------------------------------------------------


def q144_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = shingles(tokens(F.col("text")))
    feats = (
        d.select("doc_id", sh.alias("sh"))
        .withColumn("hx", shingle_hashes(F.col("sh")))
        .select("doc_id", "sh", minhash_struct(F.col("hx")).alias("m"))
        .select("doc_id", "sh", "m.*")
    )
    bands = feats.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # F.concat (NULL-propagating, like the
                        # oracle's ||): an all-NULL doc has NULL minima
                        # and must form NO band key — concat_ws would
                        # skip the NULLs and bucket every null doc
                        # together (deg_nulls sweep)
                        F.concat(
                            F.col(f"mh{2 * b}").cast("string"),
                            F.lit("_"),
                            F.col(f"mh{2 * b + 1}").cast("string"),
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    pairs = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band", "key"),
            ["band", "key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)],
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)],
    )
    cand = pairs.join(fa, "doc_a").join(fb, "doc_b")
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    est = agree / F.lit(8.0)
    exact = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    scored = cand.select(est.alias("est"), exact.alias("exact"))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("est"), 6).alias("avg_est"),
        F.round(F.avg("exact"), 6).alias("avg_exact"),
        F.round(F.avg(F.abs(F.col("est") - F.col("exact"))), 6).alias(
            "avg_abs_err"
        ),
        F.count_if(F.abs(F.col("est") - F.col("exact")) <= 0.25)
        .cast("long")
        .alias("n_within_2sigma"),
    )


def _q144_sql() -> str:
    sig = ", ".join(
        f"{s} AS mh{i}" for i, s in enumerate(minhash_sig_sql("sh"))
    )
    agree = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return f"""
WITH feats AS (
  SELECT doc_id, sh, {sig}
  FROM (SELECT doc_id, {SHINGLES_SQL.format(t=TOKENS_SQL.format(x='text'))} AS sh
        FROM documents)
), bands AS (
  SELECT doc_id, b.band,
         CASE b.band WHEN 0 THEN mh0 || '_' || mh1
                     WHEN 1 THEN mh2 || '_' || mh3
                     WHEN 2 THEN mh4 || '_' || mh5
                     ELSE mh6 || '_' || mh7 END AS key
  FROM feats, (SELECT unnest([0,1,2,3]) AS band) b
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), scored AS (
  SELECT ({agree}) / 8.0 AS est,
         len(list_intersect(a.sh, b.sh)) * 1.0
           / len(list_distinct(a.sh || b.sh)) AS exact
  FROM pairs p
  JOIN feats a ON p.doc_a = a.doc_id
  JOIN feats b ON p.doc_b = b.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(est), 6) AS avg_est,
       ROUND(AVG(exact), 6) AS avg_exact,
       ROUND(AVG(ABS(est - exact)), 6) AS avg_abs_err,
       CAST(COUNT(*) FILTER (WHERE ABS(est - exact) <= 0.25) AS BIGINT)
         AS n_within_2sigma
FROM scored
"""


# --------------------------------------------------------------------------
# q186 — sorted-neighborhood dedup (the classic entity-resolution
# blocking alternative to LSH): sort the corpus by a normalized sort
# key (first 3 tokens), compare each document only to its immediate
# neighbor in that order, and score the pair by exact token-set
# Jaccard. O(n log n + n) comparisons instead of O(n²); the window
# scan over the sorted order replaces any pair join. ALL adjacent
# pairs are emitted with their score (this corpus has no near-dups —
# a threshold-only output would be vacuously green). Jaccard counts
# are distinct-token integers, so the ratio is exact. Scale path
# (VERDICT r2): range-partitioned sort with w−1 = 1 boundary rows per
# partition instead of the single global lead window —
# repartitionByRange gives contiguous ordered key ranges, so the global
# adjacency set is exactly (within-partition adjacents) ∪ (last row of
# each partition paired with the first row of the next non-empty one);
# the only unpartitioned window runs over the ≤ 2·P boundary rows.
# Range boundaries are sample-derived but deterministic per plan (fixed
# per-partition seeds), and both branches read the same exchange.
# --------------------------------------------------------------------------


def q186_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    d = d.select(
        "doc_id",
        F.array_distinct("t").alias("dt"),
        F.array_join(F.slice("t", 1, 3), " ").alias("skey"),
    )
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t = d.repartitionByRange(
        parts, F.asc("skey"), F.asc("doc_id")
    ).withColumn("_pid", F.spark_partition_id())
    wp = Window.partitionBy("_pid").orderBy("skey", "doc_id")
    within = (
        t.withColumn("nid", F.lead("doc_id").over(wp))
        .withColumn("nt", F.lead("dt").over(wp))
        .filter(F.col("nid").isNotNull())
        .select("doc_id", "dt", "nid", "nt")
    )
    row = F.struct("skey", "doc_id", "dt")
    key = F.struct("skey", "doc_id")
    edge = t.groupBy("_pid").agg(
        F.min_by(row, key).alias("f"), F.max_by(row, key).alias("l")
    )
    bnd = (
        edge.select("_pid", F.col("f").alias("s"))
        .unionByName(
            edge.filter(F.col("l") != F.col("f")).select(
                "_pid", F.col("l").alias("s")
            )
        )
        .select("_pid", "s.skey", "s.doc_id", "s.dt")
    )
    wb = Window.orderBy("skey", "doc_id")
    cross = (
        bnd.withColumn("nid", F.lead("doc_id").over(wb))
        .withColumn("nt", F.lead("dt").over(wb))
        .withColumn("_npid", F.lead("_pid").over(wb))
        .filter(
            F.col("nid").isNotNull() & (F.col("_npid") != F.col("_pid"))
        )
        .select("doc_id", "dt", "nid", "nt")
    )
    pairs = within.unionByName(cross)
    inter = F.size(F.array_intersect("dt", "nt"))
    union = F.size(F.array_union("dt", "nt"))
    return pairs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("nid").alias("doc_b"),
        inter.cast("long").alias("n_common"),
        F.round(inter / union, 6).alias("jaccard"),
    )


Q186_SQL = f"""
WITH d AS (
  SELECT doc_id,
         list_distinct({TOKENS_SQL.format(x='text')}) AS dt,
         array_to_string(({TOKENS_SQL.format(x='text')})[1:3], ' ')
           AS skey
  FROM documents
), p AS (
  SELECT doc_id AS doc_a, dt,
         LEAD(doc_id) OVER w AS doc_b,
         LEAD(dt) OVER w AS nt
  FROM d
  WINDOW w AS (ORDER BY skey, doc_id)
)
SELECT doc_a, doc_b,
       CAST(len(list_intersect(dt, nt)) AS BIGINT) AS n_common,
       ROUND(len(list_intersect(dt, nt))
             / (1.0 * (len(dt) + len(nt) - len(list_intersect(dt, nt)))),
             6) AS jaccard
FROM p WHERE doc_b IS NOT NULL
"""


# --------------------------------------------------------------------------
# q221 — winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003, the
# MOSS local document fingerprinting scheme): hash every token 3-gram,
# slide a w=4 window over the positions, keep each window's MINIMUM
# hash — guaranteeing any shared run of ≥ w+k-1 tokens yields a shared
# fingerprint — then report document pairs by shared-fingerprint count.
# Scale shape: the window min is PARTITIONED BY doc (never global);
# pair generation groups by fingerprint with a df ≤ 20 guard so a
# boilerplate fingerprint cannot fan out quadratically (the q27/q25
# hot-gram rule). Oracle: identical grams, hashes, window frame and
# guard in SQL.
# --------------------------------------------------------------------------

_WIN_W = 4  # winnow window (positions per window)
_WIN_DF = 20  # fingerprint document-frequency guard


def q221_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 3 + _WIN_W - 1)
    grams = toks.select(
        "doc_id",
        (F.size("t") - 2).alias("ng"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.struct(
                    i.alias("pos"),
                    md5long(
                        F.concat_ws(
                            " ",
                            F.element_at("t", i),
                            F.element_at("t", i + 1),
                            F.element_at("t", i + 2),
                        )
                    ).alias("h"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "ng", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WIN_W - 1)
    )
    fps = (
        grams.withColumn("fp", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("ng") - (_WIN_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    df_ok = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _WIN_DF
    )
    f2 = fps.join(df_ok.select("fp"), "fp")
    a = f2.select(F.col("doc_id").alias("doc_a"), "fp")
    b = f2.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


Q221_SQL = f"""
WITH tokd AS (
  SELECT doc_id, {TOKENS_SQL.format(x="text")} AS t FROM documents
), g AS (
  SELECT doc_id, len(t) - 2 AS ng, i AS pos,
         {MD5LONG_SQL.format(x="t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]")}
           AS h
  FROM tokd, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3 + {_WIN_W} - 1
), w AS (
  SELECT doc_id, ng, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
           AS fp
  FROM g
), fps AS (
  SELECT DISTINCT doc_id, fp FROM w WHERE pos <= ng - {_WIN_W - 1}
), ok AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {_WIN_DF}
), f2 AS (SELECT f.doc_id, f.fp FROM fps f JOIN ok ON ok.fp = f.fp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


# --------------------------------------------------------------------------
# q229 — MAXIMAL EXACT DUPLICATED SPANS across document pairs (the
# exact-substring dedup of Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better", re-expressed relationally):
# winnowing (q221) SAMPLES fingerprints and chunk containment (q101)
# works at coarse chunk granularity; this finds every shared token
# span of ≥ _DS_K + _DS_MIN_RUN - 1 tokens exactly, with its position
# in both documents. Method: positioned _DS_K-gram fingerprints →
# df-bounded gram join (2 ≤ doc-df ≤ _DS_DF_MAX, the q27 fan-out
# bound) → within each (doc_a, doc_b) pair, consecutive matches on
# the same DIAGONAL (pos_a − pos_b constant) are one shared substring;
# gaps-and-islands over (pair, diag) merges them into maximal runs.
# Every window is keyed by (doc pair, diag) — never global — and the
# join fan-out is ≤ DF_MAX² per gram, so the shape survives 100 TB.
# The suffix-array formulation is sequential; the diagonal-islands
# formulation is the shuffle-native equivalent.
# --------------------------------------------------------------------------

_DS_K = 8  # gram width (tokens)
_DS_DF_MAX = 8  # max docs sharing a gram (fan-out bound)
_DS_MIN_RUN = 3  # min consecutive grams → span ≥ K + MIN_RUN - 1 tokens


def q229_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    grams = (
        d.filter(F.size("t") >= _DS_K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (_DS_K - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        md5long(
                            F.array_join(F.slice("t", i, _DS_K), " ")
                        ).alias("h"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )
    df_ok = (
        grams.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _DS_DF_MAX))
        .select("h")
    )
    g2 = grams.join(df_ok, "h")
    a = g2.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "h"
    )
    b = g2.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "h"
    )
    hits = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        hits.withColumn("isl", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            F.count(F.lit(1)).alias("run"),
        )
        .filter(F.col("run") >= _DS_MIN_RUN)
        .select(
            "doc_a",
            "doc_b",
            "start_a",
            "start_b",
            (F.col("run") + _DS_K - 1).cast("long").alias("span_tokens"),
        )
    )
    return runs


Q229_SQL = f"""
WITH tokd AS (
  SELECT doc_id, {TOKENS_SQL.format(x="text")} AS t FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         {MD5LONG_SQL.format(x=f"array_to_string(t[i:i + {_DS_K - 1}], ' ')")}
           AS h
  FROM tokd, unnest(generate_series(1, len(t) - {_DS_K - 1})) AS u(i)
  WHERE len(t) >= {_DS_K}
), df_ok AS (
  SELECT h FROM (SELECT DISTINCT doc_id, h FROM grams)
  GROUP BY h HAVING COUNT(*) BETWEEN 2 AND {_DS_DF_MAX}
), g2 AS (
  SELECT g.doc_id, g.pos, g.h FROM grams g JOIN df_ok USING (h)
), hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
         a.pos - b.pos AS diag
  FROM g2 a JOIN g2 b ON a.h = b.h AND a.doc_id < b.doc_id
), isl AS (
  SELECT *, pa - ROW_NUMBER() OVER (
    PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS isl
  FROM hits
)
SELECT doc_a, doc_b, MIN(pa) AS start_a, MIN(pb) AS start_b,
       CAST(COUNT(*) + {_DS_K - 1} AS BIGINT) AS span_tokens
FROM isl
GROUP BY doc_a, doc_b, diag, isl
HAVING COUNT(*) >= {_DS_MIN_RUN}
"""


# --------------------------------------------------------------------------
# q246 — TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
# PageRank over the window-2 token co-occurrence graph, the classic
# unsupervised keyword scorer (q41's TF-IDF is the frequency baseline;
# TextRank ranks by graph centrality instead). Undirected edges between
# ADJACENT tokens weighted by corpus-wide co-occurrence count;
# r(v) = (1-d) + d·Σ_u w(u,v)/deg(u)·r(u), d=0.85, 4 fixed rounds, the
# original paper's unnormalized formulation (no dangling mass: every
# vertex comes from an edge, so deg ≥ 1).
#
# Scale posture: after the pair-count aggregate the graph is
# VOCABULARY-bounded — |V| = distinct tokens, |E| = distinct adjacent
# pairs — independent of corpus row count. The corpus is touched once
# (narrow token explode → one shuffle on the unordered pair key);
# every iteration joins vocab-sized tables repartitioned once on the
# join key, mirroring kg65's Pregel-on-DataFrames shape. The DuckDB
# twin unrolls the same recurrence one CTE pair per round.
# --------------------------------------------------------------------------

_TR_ITERS = 4
_TR_D = 0.85


def q246_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    adj = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        ),
    )
    und = (
        toks.select(F.explode(adj).alias("p"))
        .filter(F.col("p.u") != F.col("p.v"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    edges = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .union(und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
        .repartition("src")
        .persist()
    )
    deg = edges.groupBy(F.col("src").alias("_did")).agg(
        F.sum("w").alias("deg")
    )
    base = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .repartition("id")
        .persist()
    )
    ranks = base.select("id", F.lit(1.0).alias("rank"))
    for _ in range(_TR_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("id").alias("_sid"), "rank"),
                edges.src == F.col("_sid"),
            )
            .join(deg, edges.src == F.col("_did"))
            .groupBy(F.col("dst").alias("_cid"))
            .agg(F.sum(F.col("w") / F.col("deg") * F.col("rank")).alias("c"))
        )
        ranks = (
            base.join(contrib, base.id == F.col("_cid"), "left")
            .select(
                base.id,
                (
                    F.lit(1.0 - _TR_D)
                    + F.lit(_TR_D) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    out = ranks.select(
        F.col("id").alias("token"), F.round("rank", 6).alias("rank")
    )
    edges.unpersist()
    base.unpersist()
    return out


def _q246_sql(iters: int = _TR_ITERS, d: float = _TR_D) -> str:
    steps = [
        f"""
tokd AS (SELECT {TOKENS_SQL.format(x='text')} AS t FROM documents),
und AS MATERIALIZED (
  SELECT least(t[i], t[i + 1]) AS u, greatest(t[i], t[i + 1]) AS v,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS q(i)
  WHERE len(t) >= 2 AND t[i] <> t[i + 1]
  GROUP BY 1, 2
),
e AS MATERIALIZED (
  SELECT u AS src, v AS dst, w FROM und
  UNION ALL SELECT v, u, w FROM und
),
deg AS MATERIALIZED (SELECT src AS id, SUM(w) AS deg FROM e GROUP BY src),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
r0 AS MATERIALIZED (SELECT id, 1.0 AS r FROM verts)"""
    ]
    dd = f"CAST({d} AS DOUBLE)"
    for k in range(1, iters + 1):
        p = k - 1
        steps.append(
            f"""
c{k} AS (SELECT e.dst AS id, SUM(e.w / deg.deg * p.r) AS c
         FROM e JOIN r{p} p ON e.src = p.id JOIN deg ON deg.id = p.id
         GROUP BY e.dst),
r{k} AS MATERIALIZED (
  SELECT v.id, (1 - {dd}) + {dd} * COALESCE(c.c, 0) AS r
  FROM verts v LEFT JOIN c{k} c ON c.id = v.id)"""
        )
    return (
        "WITH "
        + ",".join(steps)
        + f"\nSELECT id AS token, round(r, 6) AS rank FROM r{iters}"
    )


# --------------------------------------------------------------------------
# q262 — LEXICAL DIVERSITY profile per language (the corpus-QC bundle
# a data curator reads next to q22's quality score): per-doc type-token
# ratio (TTR), Herdan's C = ln V / ln N (the log-log TTR that, unlike
# raw TTR, is stable under document length), and the corpus-level
# hapax-legomena share (fraction of vocabulary seen exactly once —
# Zipf's tail mass, a dedup/boilerplate tell when it collapses).
#
# Scale posture: per-doc stats are one narrow explode + partial-agg
# groupBy(doc); the hapax share is a vocab-bounded second aggregate.
# No windows, no Python.
# --------------------------------------------------------------------------


def q262_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    per_doc = toks.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("tok").alias("v"),
    ).filter(F.col("n") > 1)
    doc_stats = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(F.col("v") / F.col("n")), 6).alias("mean_ttr"),
        F.round(
            F.avg(F.log("v") / F.log("n")), 6
        ).alias("mean_herdan_c"),
    )
    vocab = (
        toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum((F.col("tf") == 1).cast("long")).alias("hapax"),
        )
        .select(
            "lang",
            F.col("vocab").cast("long").alias("vocab"),
            F.round(F.col("hapax") / F.col("vocab"), 6).alias(
                "hapax_share"
            ),
        )
    )
    return doc_stats.join(vocab, "lang")


Q262_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
), per_doc AS (
  SELECT doc_id, lang, COUNT(*) AS n, COUNT(DISTINCT tok) AS v
  FROM toks GROUP BY 1, 2 HAVING COUNT(*) > 1
), doc_stats AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(AVG(v / (1.0 * n)), 6) AS mean_ttr,
         ROUND(AVG(ln(v) / ln(n)), 6) AS mean_herdan_c
  FROM per_doc GROUP BY lang
), vocab AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
         ROUND(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
               / (1.0 * COUNT(*)), 6) AS hapax_share
  FROM (SELECT lang, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2)
  GROUP BY lang
)
SELECT d.lang, d.n_docs, d.mean_ttr, d.mean_herdan_c,
       v.vocab, v.hapax_share
FROM doc_stats d JOIN vocab v ON d.lang = v.lang
"""


# --------------------------------------------------------------------------
# q266 — PPMI POWER-ITERATION word embedding (Levy & Goldberg NIPS
# 2014: skip-gram-with-negative-sampling implicitly factorizes the
# shifted PMI matrix): the leading eigenvector of the positive-PMI
# word-word co-occurrence matrix is a 1-dimensional distributional
# embedding — computed here with 4 fixed power-iteration rounds
# (q168's method, on a graph-shaped operand like kg65). Co-occurrence
# is document-level distinct pairs; PPMI = max(0, ln(c12·N/(c1·c2))).
#
# Scale posture: the PPMI operand is VOCABULARY²-bounded and sparse
# (only observed pairs), built in one corpus pass; each round is a
# vocab-sized join + partial-agg, the normalizer a 1-row broadcast.
# The DuckDB twin unrolls the same 4 rounds.
# --------------------------------------------------------------------------

_PPMI_ROUNDS = 4


def q266_ppmi_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).distinct()
    n_docs = d.select("doc_id").distinct().count()
    cnt = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    a = dt.select(F.col("doc_id").alias("d1"), F.col("tok").alias("w1"))
    b = dt.select(F.col("doc_id").alias("d2"), F.col("tok").alias("w2"))
    co = (
        a.join(b, (F.col("d1") == F.col("d2")) & (F.col("w1") != F.col("w2")))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    m = (
        co.join(
            F.broadcast(cnt.select(F.col("tok").alias("_t1"), F.col("c").alias("c1"))),
            co.w1 == F.col("_t1"),
        )
        .join(
            F.broadcast(cnt.select(F.col("tok").alias("_t2"), F.col("c").alias("c2"))),
            co.w2 == F.col("_t2"),
        )
        .select(
            "w1",
            "w2",
            F.greatest(
                F.lit(0.0),
                F.log(
                    F.col("c12") * F.lit(float(n_docs))
                    / (F.col("c1") * F.col("c2"))
                ),
            ).alias("ppmi"),
        )
        .filter(F.col("ppmi") > 0)
        .repartition("w1")
        .persist()
    )
    verts = m.select(F.col("w1").alias("id")).distinct().persist()
    n_v = verts.count()
    if n_v == 0:  # no positive-PPMI pairs (oracle: 0 rows)
        m.unpersist()
        verts.unpersist()
        return spark.createDataFrame([], "token string, loading double")
    x = verts.select("id", F.lit(1.0 / math.sqrt(n_v)).alias("x"))
    for _ in range(_PPMI_ROUNDS):
        y = (
            m.join(x.select(F.col("id").alias("_xid"), "x"), m.w2 == F.col("_xid"))
            .groupBy(F.col("w1").alias("id"))
            .agg(F.sum(F.col("ppmi") * F.col("x")).alias("y"))
        )
        nrm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nn"))
        x = (
            y.crossJoin(F.broadcast(nrm))
            .select("id", (F.col("y") / F.col("nn")).alias("x"))
            .localCheckpoint()
        )
    out = x.select(
        F.col("id").alias("token"), F.round(F.abs("x"), 6).alias("loading")
    )
    m.unpersist()
    verts.unpersist()
    return out


def _q266_sql(rounds: int = _PPMI_ROUNDS) -> str:
    steps = [
        f"""
dt AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok
  FROM documents, UNNEST({TOKENS_SQL.format(x='text')}) AS u(tok)
),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
cnt AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY tok),
m AS MATERIALIZED (
  SELECT w1, w2, ppmi FROM (
    SELECT a.tok AS w1, b.tok AS w2,
           GREATEST(0.0, ln(COUNT(*) * (SELECT n FROM nd)
             / (ANY_VALUE(c1.c) * ANY_VALUE(c2.c)))) AS ppmi
    FROM dt a
    JOIN dt b ON a.doc_id = b.doc_id AND a.tok <> b.tok
    JOIN cnt c1 ON a.tok = c1.tok
    JOIN cnt c2 ON b.tok = c2.tok
    GROUP BY a.tok, b.tok
  ) WHERE ppmi > 0
),
verts AS MATERIALIZED (SELECT DISTINCT w1 AS id FROM m),
nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM verts),
x0 AS MATERIALIZED (
  SELECT id, 1.0 / sqrt((SELECT v FROM nv)) AS x FROM verts)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(
            f"""
y{k} AS (SELECT m.w1 AS id, SUM(m.ppmi * x.x) AS y
         FROM m JOIN x{p} x ON m.w2 = x.id GROUP BY m.w1),
n{k} AS (SELECT sqrt(SUM(y * y)) AS nn FROM y{k}),
x{k} AS MATERIALIZED (
  SELECT id, y / (SELECT nn FROM n{k}) AS x FROM y{k})"""
        )
    return (
        "WITH "
        + ",".join(steps)
        + f"\nSELECT id AS token, ROUND(ABS(x), 6) AS loading FROM x{rounds}"
    )


# --------------------------------------------------------------------------
# q278 — ROUGE-2 pair scoring (Lin 2004): clipped-bigram precision/
# recall/F1 for candidate duplicate pairs — the summarization-eval
# metric repurposed as a graded near-dup score (q27's Jaccard is
# set-valued; ROUGE is multiset CLIPPED, so a doc that repeats a
# borrowed passage 3× only gets credit for the copies the other doc
# actually has). Two-phase: candidates come from the df-pruned blocked
# bigram self-join (q27's hot-key discipline — no gram key fans out
# more than DF_MAX² pairs); the EXACT clipped overlap Σ min(c_a, c_b)
# is then recomputed over the candidates' FULL bigram multisets, so
# pruning bounds the join without biasing the reported metric.
#
# Scale posture: candidate volume is bounded analytically (df cap ×
# shared-bigram floor); the exact-overlap join touches only candidate
# pairs × their bigram rows. All counts integer; doubles only in the
# rendered P/R/F.
# --------------------------------------------------------------------------

_ROUGE_MIN_SHARED = 5
_ROUGE_MIN_F = 0.2


def q278_rouge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang", "source", tokens(F.col("text")).alias("t")
        )
        .filter(F.size("t") >= 2)
    )
    bigrams = F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
        "(x, i) -> concat(x, ' ', element_at(t, i + 2)))"
    )
    cnts = (
        d.select(
            "doc_id", "lang", "source", F.explode(bigrams).alias("bigram")
        )
        .groupBy("doc_id", "lang", "source", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = cnts.groupBy("doc_id").agg(F.sum("c").alias("m"))
    hot = (
        cnts.groupBy("lang", "source", "bigram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > DF_MAX)
        .select("lang", "source", "bigram")
    )
    kept = cnts.join(
        F.broadcast(hot), on=["lang", "source", "bigram"], how="left_anti"
    )
    a = kept.select(
        F.col("doc_id").alias("doc_a"), "lang", "source", "bigram"
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "lang", "source", "bigram"
    )
    cand = (
        a.join(b, on=["lang", "source", "bigram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _ROUGE_MIN_SHARED)
        .select("doc_a", "doc_b")
    )
    fa = cnts.select(
        F.col("doc_id").alias("doc_a"), "bigram", F.col("c").alias("ca")
    )
    fb = cnts.select(
        F.col("doc_id").alias("doc_b"), "bigram", F.col("c").alias("cb")
    )
    ov = (
        cand.join(fa, "doc_a")
        .join(fb, ["doc_b", "bigram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).alias("overlap"))
    )
    pairs = ov.join(
        m.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("m_a")),
        "doc_a",
    ).join(
        m.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("m_b")),
        "doc_b",
    )
    p = F.col("overlap") / F.col("m_b").cast("double")
    r = F.col("overlap") / F.col("m_a").cast("double")
    f1 = 2 * p * r / (p + r)
    return pairs.select(
        "doc_a",
        "doc_b",
        F.col("overlap").cast("long").alias("overlap"),
        r4(p).alias("rouge2_p"),
        r4(r).alias("rouge2_r"),
        r4(f1).alias("rouge2_f"),
    ).filter(r4(f1) >= _ROUGE_MIN_F)


Q278_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, source, {TOKENS_SQL.format(x='text')} AS t
  FROM documents
), bg AS (
  SELECT doc_id, lang, source,
         unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
           ELSE list_transform(t[1:len(t) - 1],
                               (x, i) -> x || ' ' || t[i + 1]) END)
           AS bigram
  FROM tok WHERE len(t) >= 2
), cnts AS (
  SELECT doc_id, lang, source, bigram, COUNT(*) AS c
  FROM bg GROUP BY 1, 2, 3, 4
), m AS (
  SELECT doc_id, SUM(c) AS m FROM cnts GROUP BY doc_id
), dfreq AS (
  SELECT lang, source, bigram, COUNT(*) AS df
  FROM cnts GROUP BY 1, 2, 3
), kept AS (
  SELECT c.doc_id, c.lang, c.source, c.bigram
  FROM cnts c JOIN dfreq USING (lang, source, bigram)
  WHERE dfreq.df <= {DF_MAX}
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b
    ON a.lang = b.lang AND a.source = b.source
   AND a.bigram = b.bigram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_ROUGE_MIN_SHARED}
), ov AS (
  SELECT cand.doc_a, cand.doc_b, SUM(LEAST(fa.c, fb.c)) AS overlap
  FROM cand
  JOIN cnts fa ON fa.doc_id = cand.doc_a
  JOIN cnts fb ON fb.doc_id = cand.doc_b AND fb.bigram = fa.bigram
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(overlap AS BIGINT) AS overlap,
       rouge2_p, rouge2_r, rouge2_f
FROM (
  SELECT ov.doc_a, ov.doc_b, ov.overlap,
         ROUND(ov.overlap / CAST(mb.m AS DOUBLE), 4) AS rouge2_p,
         ROUND(ov.overlap / CAST(ma.m AS DOUBLE), 4) AS rouge2_r,
         ROUND(2 * (ov.overlap / CAST(mb.m AS DOUBLE))
                 * (ov.overlap / CAST(ma.m AS DOUBLE))
               / (ov.overlap / CAST(mb.m AS DOUBLE)
                  + ov.overlap / CAST(ma.m AS DOUBLE)), 4) AS rouge2_f
  FROM ov
  JOIN m ma ON ma.doc_id = ov.doc_a
  JOIN m mb ON mb.doc_id = ov.doc_b
) t
WHERE rouge2_f >= {_ROUGE_MIN_F}
"""


# --------------------------------------------------------------------------
# q313 — Burrows' Delta stylometry (Burrows 2002): per source, the mean
# |z-score| of its relative frequencies of the K=50 most common corpus
# words, standardized ACROSS sources — the authorship-attribution
# distance that here flags sources whose function-word profile deviates
# from the corpus norm (a style-drift / synthetic-contamination audit).
# Plan: token counts collapse to (source, word) in one partial-agg
# shuffle; the top-K vocabulary is a 50-row TakeOrderedAndProject over
# the aggregated global counts (never a raw-doc sort); the cross-source
# μ/σ per word is a 50-row × 20-source agg. Oracle: identical counts in
# DuckDB with the same deterministic (count DESC, word) tie-break.
# --------------------------------------------------------------------------

_DELTA_K = 50


def q313_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    sw = d.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    stot = sw.groupBy("source").agg(F.sum("c").alias("n"))
    vocab = (
        sw.groupBy("w")
        .agg(F.sum("c").alias("gc"))
        .orderBy(F.desc("gc"), "w")
        .limit(_DELTA_K)
        .select("w")
    )
    f = (
        sw.join(F.broadcast(vocab), "w")
        .join(stot, "source")
        .select("source", "w", (F.col("c") / F.col("n")).alias("f"))
    )
    # dense (source × vocab) grid so absent words contribute f = 0
    grid = stot.select("source").crossJoin(F.broadcast(vocab))
    dense = grid.join(f, ["source", "w"], "left").withColumn(
        "f", F.coalesce("f", F.lit(0.0))
    )
    stats = dense.groupBy("w").agg(
        F.avg("f").alias("mu"), F.stddev_samp("f").alias("sd")
    )
    z = (
        dense.join(F.broadcast(stats), "w")
        .filter(F.col("sd") > 0)
        .select(
            "source",
            "w",
            ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z"),
        )
    )
    # tie-safe arg-max: zero-padded |z| then word, lexicographic MAX —
    # identical in both engines (DuckDB arg_max has no composite key)
    key = F.format_string("%020.12f|%s", F.abs("z"), F.col("w"))
    return z.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("k_words"),
        F.round(F.avg(F.abs("z")), 6).alias("delta"),
        F.round(F.max(F.abs("z")), 6).alias("max_abs_z"),
        F.substring(F.max(key), 22, 10_000).alias("top_marker_word"),
    )


Q313_SQL = f"""
WITH tok AS (
  SELECT source, unnest({TOKENS_SQL.format(x="text")}) AS w FROM documents
), sw AS (
  SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2
), stot AS (SELECT source, SUM(c) AS n FROM sw GROUP BY 1),
vocab AS (
  SELECT w FROM (SELECT w, SUM(c) AS gc FROM sw GROUP BY 1)
  ORDER BY gc DESC, w LIMIT {_DELTA_K}
), dense AS (
  SELECT st.source, v.w,
         COALESCE(sw.c / st.n, 0.0) AS f
  FROM stot st CROSS JOIN vocab v
  LEFT JOIN sw ON sw.source = st.source AND sw.w = v.w
), stats AS (
  SELECT w, AVG(f) AS mu, STDDEV_SAMP(f) AS sd FROM dense GROUP BY 1
), z AS (
  SELECT d.source, d.w, (d.f - s.mu) / s.sd AS z
  FROM dense d JOIN stats s ON s.w = d.w WHERE s.sd > 0
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS k_words,
       ROUND(AVG(ABS(z)), 6) AS delta,
       ROUND(MAX(ABS(z)), 6) AS max_abs_z,
       substr(MAX(printf('%020.12f|%s', ABS(z), w)), 22)
         AS top_marker_word
FROM z GROUP BY 1
"""


# --------------------------------------------------------------------------
# q321 — log-likelihood-ratio keyness (Dunning 1993): for each source,
# the top-3 terms most over-represented vs the rest of the corpus by
# the G² statistic over the 2×2 contingency (term-in-source,
# term-elsewhere, other-in-source, other-elsewhere), restricted to
# terms with corpus frequency ≥ 5 and enrichment a > E[a] — the
# distinctive-vocabulary screen a corpus linguist (or a contamination
# hunter) runs per shard. Plan: ONE (source, word) partial-agg
# shuffle; margins are a broadcast word dim + a 20-row source dim; the
# top-3 window is partitioned by source OVER THE AGGREGATE. G² is
# rendered at 4dp and ranked on the rounded value with a word
# tie-break so engine ulp noise cannot flip ranks.
# --------------------------------------------------------------------------

_KEYNESS_MIN_GW = 5
_KEYNESS_TOP = 3


def q321_llr_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    sw = d.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("a")
    )
    rs = sw.groupBy("source").agg(F.sum("a").alias("rs"))
    gw = (
        sw.groupBy("w")
        .agg(F.sum("a").alias("gw"))
        .filter(F.col("gw") >= _KEYNESS_MIN_GW)
    )
    n = sw.agg(F.sum("a").alias("n_all"))
    j = (
        sw.join(F.broadcast(gw), "w")
        .join(F.broadcast(rs), "source")
        .crossJoin(F.broadcast(n))
    )

    def term(x, e):
        return F.when(x > 0, x * F.log(x / e)).otherwise(F.lit(0.0))

    a = F.col("a")
    b = F.col("gw") - a
    c = F.col("rs") - a
    dd = F.col("n_all") - F.col("gw") - F.col("rs") + a
    ea = F.col("rs") * F.col("gw") / F.col("n_all")
    eb = (F.col("n_all") - F.col("rs")) * F.col("gw") / F.col("n_all")
    ec = F.col("rs") * (F.col("n_all") - F.col("gw")) / F.col("n_all")
    ed = (
        (F.col("n_all") - F.col("rs"))
        * (F.col("n_all") - F.col("gw"))
        / F.col("n_all")
    )
    g2 = 2.0 * (term(a, ea) + term(b, eb) + term(c, ec) + term(dd, ed))
    scored = j.filter(a > ea).select(
        "source", "w", a.cast("long").alias("count"),
        F.round(g2, 4).alias("g2"),
    )
    win = Window.partitionBy("source").orderBy(
        F.desc("g2"), F.asc("w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _KEYNESS_TOP)
        .select("source", "rank", F.col("w").alias("word"), "count", "g2")
    )


Q321_SQL = f"""
WITH tok AS (
  SELECT source, unnest({TOKENS_SQL.format(x="text")}) AS w FROM documents
), sw AS (
  SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS a FROM tok GROUP BY 1, 2
), rs AS (SELECT source, SUM(a) AS rs FROM sw GROUP BY 1),
gw AS (
  SELECT w, SUM(a) AS gw FROM sw GROUP BY 1
  HAVING SUM(a) >= {_KEYNESS_MIN_GW}
), n AS (SELECT SUM(a) AS n_all FROM sw),
j AS (
  SELECT sw.source, sw.w, sw.a, gw.gw, rs.rs, n.n_all
  FROM sw JOIN gw ON gw.w = sw.w JOIN rs ON rs.source = sw.source
  CROSS JOIN n
), scored AS (
  SELECT source, w, CAST(a AS BIGINT) AS count,
         ROUND(2.0 * (
           CASE WHEN a > 0
                THEN a * LN(a / (rs * gw / n_all)) ELSE 0.0 END
         + CASE WHEN gw - a > 0
                THEN (gw - a) * LN((gw - a)
                     / ((n_all - rs) * gw / n_all)) ELSE 0.0 END
         + CASE WHEN rs - a > 0
                THEN (rs - a) * LN((rs - a)
                     / (rs * (n_all - gw) / n_all)) ELSE 0.0 END
         + CASE WHEN n_all - gw - rs + a > 0
                THEN (n_all - gw - rs + a) * LN((n_all - gw - rs + a)
                     / ((n_all - rs) * (n_all - gw) / n_all))
                ELSE 0.0 END), 4) AS g2
  FROM j WHERE a > rs * gw / n_all
)
SELECT source, rank, word, count, g2 FROM (
  SELECT source, w AS word, count, g2,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY g2 DESC, w) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {_KEYNESS_TOP}
"""


# --------------------------------------------------------------------------
# q322 — NPMI collocation mining (Church & Hanks 1990 PMI; Bouma 2009
# normalization): the top-20 bigram collocations by normalized PMI
# npmi = ln(p(ab)/(p(a)p(b))) / −ln p(ab), restricted to bigrams seen
# ≥ 5 times — the multiword-expression extractor a tokenizer team runs
# before merging units into the vocab. Plan: one bigram partial agg +
# two unigram-margin broadcasts over the array-native zip (no Python);
# the global top-20 is orderBy().limit() — a distributed
# TakeOrderedAndProject, never a single-partition sort. Ranked on the
# 6dp-rounded score with a bigram tie-break so ulp noise cannot flip
# ranks.
# --------------------------------------------------------------------------

_NPMI_MIN_C = 5
_NPMI_TOP = 20


def q322_npmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        tokens(F.col("text")).alias("t")
    )
    pairs = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    c2 = (
        bg.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
        .filter(F.col("c2") >= _NPMI_MIN_C)
    )
    left = bg.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("ca"))
    right = bg.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cb"))
    n = bg.agg(F.count(F.lit(1)).cast("double").alias("n_bg"))
    j = (
        c2.join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(n))
    )
    p_ab = F.col("c2") / F.col("n_bg")
    pmi = F.log(
        p_ab / ((F.col("ca") / F.col("n_bg")) * (F.col("cb") / F.col("n_bg")))
    )
    npmi = pmi / -F.log(p_ab)
    return (
        j.select(
            F.concat("a", F.lit(" "), "b").alias("bigram"),
            F.col("c2").cast("long").alias("count"),
            F.round(npmi, 6).alias("npmi"),
        )
        .orderBy(F.desc("npmi"), F.asc("bigram"))
        .limit(_NPMI_TOP)
    )


Q322_SQL = f"""
WITH tokd AS (
  SELECT {TOKENS_SQL.format(x='text')} AS t FROM documents
), bgt AS (
  SELECT t[i] AS a, t[i + 1] AS b
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
), c2 AS (
  SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS c2 FROM bgt GROUP BY 1, 2
  HAVING COUNT(*) >= {_NPMI_MIN_C}
), l AS (SELECT a, CAST(COUNT(*) AS DOUBLE) AS ca FROM bgt GROUP BY 1),
r AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS cb FROM bgt GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_bg FROM bgt)
SELECT c2.a || ' ' || c2.b AS bigram,
       CAST(c2.c2 AS BIGINT) AS count,
       ROUND(LN((c2.c2 / n.n_bg) / ((l.ca / n.n_bg) * (r.cb / n.n_bg)))
             / -LN(c2.c2 / n.n_bg), 6) AS npmi
FROM c2 JOIN l ON l.a = c2.a JOIN r ON r.b = c2.b CROSS JOIN n
ORDER BY npmi DESC, bigram ASC
LIMIT {_NPMI_TOP}
"""


# --------------------------------------------------------------------------
# q323 — pairwise Jensen-Shannon divergence between source unigram
# distributions (Lin 1991): the 20×20 source-similarity half-matrix a
# corpus-mixing planner reads before setting sampling weights. The
# matched-vocabulary sum comes from ONE self-join of the (source,
# word) relative-frequency table on word (s1 < s2); the unmatched-mass
# contribution has the closed form (P_unm + Q_unm)·ln2/2, recovered
# from each pair's matched probability mass — so the full JSD needs NO
# dense source × vocab grid and no per-pair rescan. Natural log; JSD
# is reported in nats, bounded by ln 2.
# --------------------------------------------------------------------------


def q323_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    sw = d.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = sw.groupBy("source").agg(F.sum("c").alias("n"))
    f = sw.join(tot, "source").select(
        "source", "w", (F.col("c") / F.col("n")).alias("p")
    )
    a = f.select(
        F.col("source").alias("s1"), "w", F.col("p").alias("pa")
    )
    b = f.select(
        F.col("source").alias("s2"), "w", F.col("p").alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / 2.0
    pairs = (
        a.join(b, "w")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum(
                F.col("pa") / 2.0 * F.log(F.col("pa") / m)
                + F.col("pb") / 2.0 * F.log(F.col("pb") / m)
            ).alias("matched"),
            F.sum("pa").alias("pm1"),
            F.sum("pb").alias("pm2"),
        )
    )
    ln2 = math.log(2.0)
    return pairs.select(
        "s1",
        "s2",
        F.round(
            F.col("matched")
            + ((1.0 - F.col("pm1")) + (1.0 - F.col("pm2")))
            * (ln2 / 2.0),
            6,
        ).alias("jsd"),
    )


Q323_SQL = f"""
WITH tok AS (
  SELECT source, unnest({TOKENS_SQL.format(x="text")}) AS w FROM documents
), sw AS (
  SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2
), tot AS (SELECT source, SUM(c) AS n FROM sw GROUP BY 1),
f AS (
  SELECT sw.source, sw.w, sw.c / tot.n AS p
  FROM sw JOIN tot ON tot.source = sw.source
), pairs AS (
  SELECT a.source AS s1, b.source AS s2,
         SUM(a.p / 2.0 * LN(a.p / ((a.p + b.p) / 2.0))
             + b.p / 2.0 * LN(b.p / ((a.p + b.p) / 2.0))) AS matched,
         SUM(a.p) AS pm1, SUM(b.p) AS pm2
  FROM f a JOIN f b ON b.w = a.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s1, s2,
       ROUND(matched
             + ((1.0 - pm1) + (1.0 - pm2)) * (LN(2.0) / 2.0), 6) AS jsd
FROM pairs
"""


# --------------------------------------------------------------------------
# q326 — Good-Turing unseen mass + lexical-concentration profile per
# source (Good 1953; Yule 1944; Simpson 1949): from the frequency-of-
# frequency table — P(unseen) ≈ n₁/N (the Good-Turing leave-one-out
# estimate of how much probability mass the NEXT document will spend
# on never-seen words), Yule's K = 10⁴·(Σ f²·V_f − N)/N², and
# Simpson's repeat-rate D = Σ f(f−1)/(N(N−1)). High unseen mass marks
# an open vocabulary still growing (cf. q319's Heaps β); high K marks
# template repetition. Plan: (source, word) partial agg → (source,
# freq) freq-of-freq agg → 20-row rollup; all corpus-linear, moments
# in double (f² sums overflow int64 past ~10⁹-token hapax-heavy
# sources).
# --------------------------------------------------------------------------


def q326_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    )
    sw = d.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    fof = sw.groupBy("source", "f").agg(
        F.count(F.lit(1)).cast("double").alias("vf")
    )
    g = fof.groupBy("source").agg(
        F.sum(F.col("f") * F.col("vf")).alias("n"),
        F.sum("vf").alias("v"),
        F.sum(F.when(F.col("f") == 1, F.col("vf")).otherwise(0.0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("f") == 2, F.col("vf")).otherwise(0.0)).alias(
            "n2"
        ),
        F.sum(F.col("f") * F.col("f") * F.col("vf")).alias("sf2"),
        F.sum(F.col("f") * (F.col("f") - 1.0) * F.col("vf")).alias(
            "sff"
        ),
    )
    return g.select(
        "source",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("v").cast("long").alias("n_types"),
        F.col("n1").cast("long").alias("hapax"),
        F.col("n2").cast("long").alias("dis_legomena"),
        F.round(F.col("n1") / F.col("n"), 6).alias("p_unseen"),
        F.round(
            1.0e4 * (F.col("sf2") - F.col("n")) / (F.col("n") * F.col("n")),
            6,
        ).alias("yule_k"),
        F.round(
            F.col("sff") / (F.col("n") * (F.col("n") - 1.0)), 6
        ).alias("simpson_d"),
    )


Q326_SQL = f"""
WITH tok AS (
  SELECT source, unnest({TOKENS_SQL.format(x="text")}) AS w FROM documents
), sw AS (
  SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS f FROM tok GROUP BY 1, 2
), fof AS (
  SELECT source, f, CAST(COUNT(*) AS DOUBLE) AS vf FROM sw GROUP BY 1, 2
), g AS (
  SELECT source,
         SUM(f * vf) AS n, SUM(vf) AS v,
         SUM(CASE WHEN f = 1 THEN vf ELSE 0.0 END) AS n1,
         SUM(CASE WHEN f = 2 THEN vf ELSE 0.0 END) AS n2,
         SUM(f * f * vf) AS sf2,
         SUM(f * (f - 1.0) * vf) AS sff
  FROM fof GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(v AS BIGINT) AS n_types,
       CAST(n1 AS BIGINT) AS hapax,
       CAST(n2 AS BIGINT) AS dis_legomena,
       ROUND(n1 / n, 6) AS p_unseen,
       ROUND(1.0e4 * (sf2 - n) / (n * n), 6) AS yule_k,
       ROUND(sff / (n * (n - 1.0)), 6) AS simpson_d
FROM g
"""


# --------------------------------------------------------------------------
# q333 — token-level bigram mutual information per source (Shannon
# 1948; the "information gain of one word of context"): I(W₁;W₂) =
# H(W) − H(W₂|W₁), estimated from the source's bigram and unigram
# tables. Near-zero MI = the next token is as unpredictable with
# context as without (noise / shuffled text); high MI relative to
# H(W) = rigid templates. Reported with both entropies so the ratio
# MI/H is readable directly. Plan: array-native bigrams (no Python),
# one (source, bigram) and one (source, unigram) partial agg, entropy
# as Σ p ln p over each aggregate, a 20-row rollup join. Natural log.
# --------------------------------------------------------------------------


def q333_token_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load(spark, sf_dir, "documents").select(
        "source", tokens(F.col("text")).alias("t")
    )
    pairs = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select("source", F.explode(pairs).alias("p"))
        .select("source", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    c2 = bg.groupBy("source", "a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    c1 = bg.groupBy("source", "a").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    n = bg.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    h2 = (
        c2.join(n, "source")
        .groupBy("source")
        .agg(
            (
                -F.sum(
                    F.col("c") / F.col("n") * F.log(F.col("c") / F.col("n"))
                )
            ).alias("h_joint")
        )
    )
    h1 = (
        c1.join(n, "source")
        .groupBy("source")
        .agg(
            (
                -F.sum(
                    F.col("c") / F.col("n") * F.log(F.col("c") / F.col("n"))
                )
            ).alias("h_uni")
        )
    )
    return (
        h1.join(h2, "source")
        .join(n, "source")
        .select(
            "source",
            F.col("n").cast("long").alias("n_bigrams"),
            F.round("h_uni", 6).alias("h_unigram"),
            F.round(
                F.col("h_joint") - F.col("h_uni"), 6
            ).alias("h_conditional"),
            F.round(
                2.0 * F.col("h_uni") - F.col("h_joint"), 6
            ).alias("mutual_info"),
            F.round(
                (2.0 * F.col("h_uni") - F.col("h_joint")) / F.col("h_uni"),
                6,
            ).alias("mi_ratio"),
        )
    )


Q333_SQL = f"""
WITH tokd AS (
  SELECT source, {TOKENS_SQL.format(x='text')} AS t FROM documents
), bgt AS (
  SELECT source, t[i] AS a, t[i + 1] AS b
  FROM tokd, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
), n AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM bgt GROUP BY 1
), h2 AS (
  SELECT c2.source,
         -SUM(c2.c / n.n * LN(c2.c / n.n)) AS h_joint
  FROM (SELECT source, a, b, CAST(COUNT(*) AS DOUBLE) AS c
        FROM bgt GROUP BY 1, 2, 3) c2
  JOIN n ON n.source = c2.source GROUP BY 1
), h1 AS (
  SELECT c1.source,
         -SUM(c1.c / n.n * LN(c1.c / n.n)) AS h_uni
  FROM (SELECT source, a, CAST(COUNT(*) AS DOUBLE) AS c
        FROM bgt GROUP BY 1, 2) c1
  JOIN n ON n.source = c1.source GROUP BY 1
)
SELECT h1.source, CAST(n.n AS BIGINT) AS n_bigrams,
       ROUND(h1.h_uni, 6) AS h_unigram,
       ROUND(h2.h_joint - h1.h_uni, 6) AS h_conditional,
       ROUND(2.0 * h1.h_uni - h2.h_joint, 6) AS mutual_info,
       ROUND((2.0 * h1.h_uni - h2.h_joint) / h1.h_uni, 6) AS mi_ratio
FROM h1 JOIN h2 ON h2.source = h1.source JOIN n ON n.source = h1.source
"""


# --------------------------------------------------------------------------
# q334 — near-dup threshold coherence via triangle closure (the
# transitivity audit behind cluster-dedup correctness, cf. Broder
# 1997's similarity-graph clustering): among wedges A~B~C in the
# verified q25 pair graph, how often does the closing pair A~C also
# verify? Low closure means the Jaccard threshold sits in a regime
# where connected-components dedup (q50) chains through borderline
# pairs — the knob a dedup owner tunes before trusting CC clusters.
# Plan: reuses q25's banded-LSH pair plan verbatim (one shared
# candidate build), symmetrize, ONE wedge self-join keyed on the
# shared endpoint, one semi-join against the pair set — all bounded by
# the sparse near-dup graph, never corpus-quadratic.
# --------------------------------------------------------------------------


def q334_neardup_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q25_lsh_neardup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    und = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    w1 = und.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    w2 = und.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    wedges = (
        w1.join(w2, "b")
        .filter(F.col("a") < F.col("c"))
        .select("a", "b", "c")
    )
    closed = wedges.join(
        pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("c"),
            F.lit(1).alias("is_closed"),
        ),
        ["a", "c"],
        "left",
    )
    # COUNT-style semantics on empty input: SUM over nothing is NULL
    # but the oracle's COUNT(p.doc_a) is 0; the rate divides by zero
    # wedges → NULL on both engines via try_divide (deg_empty sweep)
    n_closed = F.coalesce(
        F.sum(F.coalesce("is_closed", F.lit(0))), F.lit(0)
    )
    return closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_wedges"),
        n_closed.cast("long").alias("n_closed"),
        F.round(
            F.try_divide(n_closed, F.count(F.lit(1))), 6
        ).alias("closure_rate"),
    )


def _q334_sql() -> str:
    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({Q25_SQL})
), und AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
), wedges AS (
  SELECT w1.doc_a AS a, w1.doc_b AS b, w2.doc_b AS c
  FROM und w1 JOIN und w2 ON w2.doc_a = w1.doc_b
  WHERE w1.doc_a < w2.doc_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges,
       CAST(COUNT(p.doc_a) AS BIGINT) AS n_closed,
       ROUND(COUNT(p.doc_a) / (1.0 * COUNT(*)), 6) AS closure_rate
FROM wedges w
LEFT JOIN pairs p ON p.doc_a = w.a AND p.doc_b = w.c
"""


# --------------------------------------------------------------------------
# q340 — ASYMMETRIC CONTAINMENT near-dup detection: C(A,B) =
# |A∩B| / min(|A|,|B|) over shingle sets. Symmetric Jaccard misses
# subset-style duplication (a short doc quoted whole inside a long
# one has high containment but low Jaccard — the union term drowns
# it); training-data pipelines dedup on BOTH. Candidates come from
# the SAME 4-band × 2-row MinHash LSH as q25 — band keys are minima
# over the full shingle set, so a contained doc still collides with
# its container whenever a band's two minima fall inside the shared
# region — and the exact intersection runs only on candidate pairs
# (candidates ≪ docs²; no all-pairs join). `subset_only` marks pairs
# q25's Jaccard ≥ 0.4 gate would have missed. Scale: identical plan
# family to q25 (band-key shuffle + per-pair verify), audit-pinned.
# --------------------------------------------------------------------------


def q340_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = shingles(tokens(F.col("text")))
    feats = (
        d.select("doc_id", sh.alias("sh"))
        .withColumn("hx", shingle_hashes(F.col("sh")))
        .select("doc_id", "sh", minhash_struct(F.col("hx")).alias("m"))
        .select("doc_id", "sh", "m.*")
    )
    bands = feats.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # F.concat (NULL-propagating, like the
                        # oracle's ||): an all-NULL doc has NULL minima
                        # and must form NO band key — concat_ws would
                        # skip the NULLs and bucket every null doc
                        # together (deg_nulls sweep)
                        F.concat(
                            F.col(f"mh{2 * b}").cast("string"),
                            F.lit("_"),
                            F.col(f"mh{2 * b + 1}").cast("string"),
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    pairs = (
        a.join(b, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = pairs.join(
        feats.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        on="doc_a",
    ).join(
        feats.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        on="doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    cont = inter / F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
    jac = inter / F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.select(
            "doc_a",
            "doc_b",
            r4(cont).alias("containment"),
            r4(jac).alias("jaccard"),
            (F.round(jac, 4) < 0.4).alias("subset_only"),
        )
        .filter(F.col("containment") >= 0.6)
    )


Q340_SQL = f"""
WITH feats AS (
  SELECT doc_id, sh,
         {', '.join(f'{s} AS mh{i}' for i, s in enumerate(minhash_sig_sql('sh')))}
  FROM (SELECT doc_id, {SHINGLES_SQL.format(t=TOKENS_SQL.format(x='text'))} AS sh
        FROM documents)
), bands AS (
  SELECT doc_id, sh, b.band,
         CASE b.band WHEN 0 THEN mh0 || '_' || mh1
                     WHEN 1 THEN mh2 || '_' || mh3
                     WHEN 2 THEN mh4 || '_' || mh5
                     ELSE mh6 || '_' || mh7 END AS key
  FROM feats, (SELECT unnest([0,1,2,3]) AS band) b
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.sh AS sh_a, b.sh AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), scored AS (
  SELECT doc_a, doc_b,
         ROUND(len(list_intersect(sh_a, sh_b))
               / (1.0 * least(len(sh_a), len(sh_b))), 4) AS containment,
         ROUND(len(list_intersect(sh_a, sh_b))
               / (1.0 * (len(sh_a) + len(sh_b)
                         - len(list_intersect(sh_a, sh_b)))), 4) AS jaccard
  FROM cand
)
SELECT doc_a, doc_b, containment, jaccard,
       jaccard < 0.4 AS subset_only
FROM scored WHERE containment >= 0.6
"""


# --------------------------------------------------------------------------
# q341 — TOKENIZER FERTILITY per (source, lang): the corpus-level
# budget table a pretraining run costs out with — BPE-pretoken count
# per whitespace word (fertility), chars per token (compression), and
# the digit-run / punctuation-run token shares (high shares flag
# sources that will waste context window on number-heavy or
# markup-heavy text). q34 is the per-document stream; this is the
# per-source rollup with composition shares. One partial-aggregable
# groupBy over regexp counts — whole-stage codegen, no Python, one
# exchange on the tiny (source, lang) key space.
# --------------------------------------------------------------------------


def q341_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    ws = F.split(F.trim(F.col("text")), r"\s+")
    per = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(pieces).alias("nt"),
        F.size(ws).alias("nw"),
        F.size(
            F.filter(pieces, lambda t: t.rlike("^ ?[0-9]+$"))
        ).alias("ndig"),
        F.size(
            F.filter(pieces, lambda t: t.rlike(r"^ ?[^\sa-zA-Z0-9]+$"))
        ).alias("npunct"),
    )
    g = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("ndig").alias("ndig"),
        F.sum("npunct").alias("npunct"),
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        r4(F.col("n_tokens") / F.col("n_words")).alias("fertility"),
        r4(F.col("n_chars") / F.col("n_tokens")).alias("chars_per_token"),
        r4(F.col("ndig") / F.col("n_tokens")).alias("digit_tok_share"),
        r4(F.col("npunct") / F.col("n_tokens")).alias("punct_tok_share"),
    )


Q341_SQL = f"""
WITH per AS (
  SELECT source, lang, n_chars,
         len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS nt,
         len(string_split_regex(trim(text), '\\s+')) AS nw,
         len(list_filter(regexp_extract_all(text, '{_BPE_RE_SQL}'),
                         t -> regexp_full_match(t, ' ?[0-9]+'))) AS ndig,
         len(list_filter(regexp_extract_all(text, '{_BPE_RE_SQL}'),
                         t -> regexp_full_match(t, ' ?[^\\sa-zA-Z0-9]+')))
           AS npunct
  FROM documents
), g AS (
  SELECT source, lang, COUNT(*) AS n_docs, SUM(nt) AS n_tokens,
         SUM(nw) AS n_words, SUM(n_chars) AS n_chars,
         SUM(ndig) AS ndig, SUM(npunct) AS npunct
  FROM per GROUP BY source, lang
)
SELECT source, lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_tokens / (1.0 * n_words), 4) AS fertility,
       ROUND(n_chars / (1.0 * n_tokens), 4) AS chars_per_token,
       ROUND(ndig / (1.0 * n_tokens), 4) AS digit_tok_share,
       ROUND(npunct / (1.0 * n_tokens), 4) AS punct_tok_share
FROM g
"""


# --------------------------------------------------------------------------
# q346 — b-BIT MINHASH (b=1) estimator accuracy: store only the low
# bit of each of the 8 MinHash values (64× signature compression vs
# 64-bit values — the Li–König trick that makes billion-doc signature
# tables fit in memory) and estimate Jaccard from bit agreement:
# E[agree] = 0.5 + J/2, so Ĵ₁ = clamp(2·agree/8 − 1, 0). The audit
# compares, on the SAME LSH candidate pairs as q25/q144, the mean
# absolute error of the full-value estimator (matches/8) vs the 1-bit
# estimator against exact shingle Jaccard — the table that prices the
# memory/accuracy trade before switching the dedup fleet to b-bit
# sketches. Scale: candidate generation is the banded plan (no
# all-pairs); the estimators are per-pair integer arithmetic.
# --------------------------------------------------------------------------


def q346_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = shingles(tokens(F.col("text")))
    feats = (
        d.select("doc_id", sh.alias("sh"))
        .withColumn("hx", shingle_hashes(F.col("sh")))
        .select("doc_id", "sh", minhash_struct(F.col("hx")).alias("m"))
        .select("doc_id", "sh", "m.*")
    )
    bands = feats.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # F.concat (NULL-propagating, like the
                        # oracle's ||): an all-NULL doc has NULL minima
                        # and must form NO band key — concat_ws would
                        # skip the NULLs and bucket every null doc
                        # together (deg_nulls sweep)
                        F.concat(
                            F.col(f"mh{2 * b}").cast("string"),
                            F.lit("_"),
                            F.col(f"mh{2 * b + 1}").cast("string"),
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    pairs = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band", "key"),
            ["band", "key"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)],
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)],
    )
    cand = pairs.join(fa, "doc_a").join(fb, "doc_b")
    full_match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(8)
    )
    bit_match = sum(
        F.when(F.col(f"a{i}") % 2 == F.col(f"b{i}") % 2, 1).otherwise(0)
        for i in range(8)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union.cast("double")
    per = cand.select(
        (full_match / F.lit(8.0) - jac).alias("err_full"),
        (
            F.greatest(2 * bit_match / F.lit(8.0) - 1, F.lit(0.0)) - jac
        ).alias("err_1bit"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("err_full"))), 6).alias("mae_full"),
        F.round(F.avg(F.abs(F.col("err_1bit"))), 6).alias("mae_1bit"),
        F.round(F.avg("err_full"), 6).alias("bias_full"),
        F.round(F.avg("err_1bit"), 6).alias("bias_1bit"),
    )


Q346_SQL = f"""
WITH feats AS (
  SELECT doc_id, sh,
         {', '.join(f'{s} AS mh{i}' for i, s in enumerate(minhash_sig_sql('sh')))}
  FROM (SELECT doc_id, {SHINGLES_SQL.format(t=TOKENS_SQL.format(x='text'))} AS sh
        FROM documents)
), bands AS (
  SELECT doc_id, b.band,
         CASE b.band WHEN 0 THEN mh0 || '_' || mh1
                     WHEN 1 THEN mh2 || '_' || mh3
                     WHEN 2 THEN mh4 || '_' || mh5
                     ELSE mh6 || '_' || mh7 END AS key
  FROM feats, (SELECT unnest([0,1,2,3]) AS band) b
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), cand AS (
  SELECT p.doc_a, p.doc_b, fa.sh AS sh_a, fb.sh AS sh_b,
         {' + '.join(f'(CASE WHEN fa.mh{i} = fb.mh{i} THEN 1 ELSE 0 END)' for i in range(8))}
           AS full_match,
         {' + '.join(f'(CASE WHEN fa.mh{i} % 2 = fb.mh{i} % 2 THEN 1 ELSE 0 END)' for i in range(8))}
           AS bit_match
  FROM pairs p
  JOIN feats fa ON fa.doc_id = p.doc_a
  JOIN feats fb ON fb.doc_id = p.doc_b
), per AS (
  SELECT full_match / 8.0
           - len(list_intersect(sh_a, sh_b))
             / (1.0 * (len(sh_a) + len(sh_b)
                       - len(list_intersect(sh_a, sh_b)))) AS err_full,
         greatest(2 * bit_match / 8.0 - 1, 0.0)
           - len(list_intersect(sh_a, sh_b))
             / (1.0 * (len(sh_a) + len(sh_b)
                       - len(list_intersect(sh_a, sh_b)))) AS err_1bit
  FROM cand
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(abs(err_full)), 6) AS mae_full,
       ROUND(AVG(abs(err_1bit)), 6) AS mae_1bit,
       ROUND(AVG(err_full), 6) AS bias_full,
       ROUND(AVG(err_1bit), 6) AS bias_1bit
FROM per
"""


# --------------------------------------------------------------------------
# q350 — CHARACTER-CLASS PROFILE per source: the byte-level hygiene
# scan run before any tokenizer decision — shares of lowercase
# letters, uppercase, digits, whitespace and other (punctuation /
# control / non-ASCII) characters, plus mean token length. A source
# whose "other" share jumps between snapshots has a scraping or
# encoding regression; uppercase and digit shares feed the
# lowercasing / number-masking decisions. Pure regexp_replace length
# arithmetic in whole-stage codegen + one partial-agg shuffle on the
# tiny source key.
# --------------------------------------------------------------------------


def q350_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lower = F.length(F.regexp_replace("text", "[^a-z]", ""))
    upper = F.length(F.regexp_replace("text", "[^A-Z]", ""))
    digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    space = F.length(F.regexp_replace("text", r"[^\s]", ""))
    total = F.length("text")
    ntok = F.size(tokens(F.col("text")))
    per = d.select(
        "source",
        total.alias("nc"),
        lower.alias("lo"),
        upper.alias("up"),
        digit.alias("di"),
        space.alias("sp"),
        ntok.alias("nt"),
    )
    g = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nc").alias("nc"),
        F.sum("lo").alias("lo"),
        F.sum("up").alias("up"),
        F.sum("di").alias("di"),
        F.sum("sp").alias("sp"),
        F.sum("nt").alias("nt"),
    )
    other = F.col("nc") - F.col("lo") - F.col("up") - F.col("di") - F.col("sp")
    return g.select(
        "source",
        "n_docs",
        F.col("nc").cast("long").alias("n_chars"),
        r4(F.col("lo") / F.col("nc")).alias("lower_share"),
        r4(F.col("up") / F.col("nc")).alias("upper_share"),
        r4(F.col("di") / F.col("nc")).alias("digit_share"),
        r4(F.col("sp") / F.col("nc")).alias("space_share"),
        r4(other / F.col("nc")).alias("other_share"),
        r4(
            (F.col("lo") + F.col("up") + F.col("di")) / F.col("nt")
        ).alias("mean_token_len"),
    )


Q350_SQL = f"""
WITH per AS (
  SELECT source, length(text) AS nc,
         length(regexp_replace(text, '[^a-z]', '', 'g')) AS lo,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS up,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS di,
         length(regexp_replace(text, '[^\\s]', '', 'g')) AS sp,
         len({TOKENS_SQL.format(x='text')}) AS nt
  FROM documents
), g AS (
  SELECT source, COUNT(*) AS n_docs, SUM(nc) AS nc, SUM(lo) AS lo,
         SUM(up) AS up, SUM(di) AS di, SUM(sp) AS sp, SUM(nt) AS nt
  FROM per GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(nc AS BIGINT) AS n_chars,
       ROUND(lo / (1.0 * nc), 4) AS lower_share,
       ROUND(up / (1.0 * nc), 4) AS upper_share,
       ROUND(di / (1.0 * nc), 4) AS digit_share,
       ROUND(sp / (1.0 * nc), 4) AS space_share,
       ROUND((nc - lo - up - di - sp) / (1.0 * nc), 4) AS other_share,
       ROUND((lo + up + di) / (1.0 * nt), 4) AS mean_token_len
FROM g
"""


# --------------------------------------------------------------------------
# q352 — VOCABULARY COVERAGE curve: what fraction of total token mass
# do the top-K vocabulary types cover, for K ∈ {1, 10, 100, 1000,
# 10000}? The sizing table for vocab truncation / embedding-table
# memory: Zipf says coverage grows ~log K, and the K where coverage
# crosses ~99% is the OOV budget (q85) in reverse. Scale: type counts
# are one partial-agg shuffle; ranking runs on the COUNT HISTOGRAM
# (one row per distinct frequency — the q37 scale idiom), so no
# global row window ever touches the vocabulary itself; the five K
# thresholds read the cumulative curve.
# --------------------------------------------------------------------------

_COV_KS = (1, 10, 100, 1000, 10000)


def q352_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    types = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # frequency histogram: one row per distinct count value
    hist = types.groupBy("c").agg(F.count(F.lit(1)).alias("n_types"))
    w = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "c",
        "n_types",
        F.sum("n_types").over(w).alias("cum_types"),
        F.sum(F.col("c") * F.col("n_types")).over(w).alias("cum_mass"),
        F.sum(F.col("c") * F.col("n_types")).over(w_all).alias("tot_mass"),
    )
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k long")
    # for each K: full histogram rows below the cut + a partial row —
    # coverage(K) = (mass of rows with cum_types ≤ K) + (K − types
    # already taken) · c of the boundary row
    j = F.broadcast(ks).join(
        cum,
        cum.cum_types - cum.n_types < ks.k,  # rows that contribute
    )
    per = j.groupBy("k").agg(
        F.sum(
            F.when(
                F.col("cum_types") <= F.col("k"),
                F.col("c") * F.col("n_types"),
            ).otherwise(
                (F.col("k") - (F.col("cum_types") - F.col("n_types")))
                * F.col("c")
            )
        ).alias("mass"),
        F.min("tot_mass").alias("tot"),
        F.max(F.least(F.col("cum_types"), F.col("k"))).alias("k_eff"),
    )
    return per.select(
        "k",
        F.col("k_eff").cast("long").alias("types_used"),
        F.col("mass").cast("long").alias("covered_tokens"),
        F.round(F.col("mass") / F.col("tot"), 6).alias("coverage"),
    )


Q352_SQL = f"""
WITH tok AS (
  SELECT unnest({TOKENS_SQL.format(x='text')}) AS tok FROM documents
), types AS (
  SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
), hist AS (
  SELECT c, COUNT(*) AS n_types FROM types GROUP BY c
), cum AS (
  SELECT c, n_types,
         SUM(n_types) OVER (ORDER BY c DESC) AS cum_types,
         SUM(c * n_types) OVER (ORDER BY c DESC) AS cum_mass,
         SUM(c * n_types) OVER () AS tot_mass
  FROM hist
), ks AS (SELECT unnest([{', '.join(str(k) for k in _COV_KS)}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(MAX(least(cum.cum_types, ks.k)) AS BIGINT) AS types_used,
       CAST(SUM(CASE WHEN cum.cum_types <= ks.k THEN cum.c * cum.n_types
                ELSE (ks.k - (cum.cum_types - cum.n_types)) * cum.c END)
            AS BIGINT) AS covered_tokens,
       ROUND(SUM(CASE WHEN cum.cum_types <= ks.k THEN cum.c * cum.n_types
                 ELSE (ks.k - (cum.cum_types - cum.n_types)) * cum.c END)
             / (1.0 * MIN(cum.tot_mass)), 6) AS coverage
FROM ks JOIN cum ON cum.cum_types - cum.n_types < ks.k
GROUP BY ks.k
"""


# --------------------------------------------------------------------------
# q359 — EXACT-SUBSTRING duplicate spans (Lee et al. 2022's exact
#-match complement to MinHash): hash every W=20-token window at stride
# S=10 and report document pairs sharing ≥2 window hashes — catching
# verbatim copied passages that near-dup similarity smooths over (two
# long documents sharing one paragraph have low Jaccard but must still
# be caught for decontamination). Plan: per-doc window hashing is one
# narrow codegen'd projection (slice + md5, no Python); the inverted
# index (whash → docs) is one partial agg; window hashes with df > 50
# are dropped as boilerplate BEFORE the pair join, which analytically
# bounds candidate volume to Σ df² over surviving hashes — never
# all-pairs. Stride 2× halves index size at ≥1-window-overlap recall
# for spans ≥ W+S tokens.
# --------------------------------------------------------------------------

_XW, _XS, _XDF = 20, 10, 50


def q359_exact_substring_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    wins = d.selectExpr(
        "doc_id",
        f"""explode(transform(
              CASE WHEN size({_TOK_EXPR}) >= {_XW}
                   THEN sequence(0, size({_TOK_EXPR}) - {_XW}, {_XS})
                   ELSE array() END,
              i -> md5(array_join(slice({_TOK_EXPR}, i + 1, {_XW}),
                                  char(31))))) AS whash""",
    ).distinct()
    df_ok = (
        wins.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= _XDF))
        .select("whash")
    )
    keyed = wins.join(df_ok, "whash")
    a = keyed.select("whash", F.col("doc_id").alias("doc_a"))
    b = keyed.select("whash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "whash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_windows"))
        .filter(F.col("n_shared_windows") >= 2)
    )


_TOK_EXPR = "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"

Q359_SQL = f"""
WITH t AS (
  SELECT doc_id, {TOKENS_SQL.format(x='text')} AS tok FROM documents
), wins AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           CASE WHEN len(tok) >= {_XW}
                THEN generate_series(0, len(tok) - {_XW}, {_XS})
                ELSE [] END,
           i -> md5(array_to_string(tok[i + 1 : i + {_XW}], chr(31)))))
           AS whash
  FROM t
), ok AS (
  SELECT whash FROM wins GROUP BY whash
  HAVING COUNT(*) BETWEEN 2 AND {_XDF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_windows
FROM wins a
JOIN ok USING (whash)
JOIN wins b ON b.whash = a.whash AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


QUERIES = {
    "q359_exact_substring_dups": q359_exact_substring_dups,
    "q352_vocab_coverage": q352_vocab_coverage,
    "q350_charclass_profile": q350_charclass_profile,
    "q346_bbit_minhash": q346_bbit_minhash,
    "q340_containment_dedup": q340_containment_dedup,
    "q341_tokenizer_fertility": q341_tokenizer_fertility,
    "q334_neardup_closure": q334_neardup_closure,
    "q333_token_mi": q333_token_mi,
    "q326_good_turing": q326_good_turing,
    "q322_npmi_collocations": q322_npmi_collocations,
    "q323_source_jsd": q323_source_jsd,
    "q321_llr_keyness": q321_llr_keyness,
    "q313_burrows_delta": q313_burrows_delta,
    "q278_rouge2": q278_rouge2,
    "q266_ppmi_embedding": q266_ppmi_embedding,
    "q262_lexical_diversity": q262_lexical_diversity,
    "q246_textrank": q246_textrank,
    "q229_dup_spans": q229_dup_spans,
    "q221_winnowing": q221_winnowing,
    "q186_sorted_neighborhood": q186_sorted_neighborhood,
    "q197_langid_confusion": q197_langid_confusion,
    "q201_zipf_knee": q201_zipf_knee,
    "q209_weighted_jaccard_sources": q209_weighted_jaccard_sources,
    "q212_macro_f1": q212_macro_f1,
    "q137_simhash_pairs": q137_simhash_pairs,
    "q144_minhash_accuracy": q144_minhash_accuracy,
    "q20_exact_dedup": q20_exact_dedup,
    "q21_token_stats": q21_token_stats,
    "q22_quality_score": q22_quality_score,
    "q23_langid": q23_langid,
    "q24_minhash_signature": q24_minhash_signature,
    "q25_lsh_neardup_pairs": q25_lsh_neardup_pairs,
    "q26_simhash": q26_simhash,
    "q27_ngram_jaccard": q27_ngram_jaccard,
    "q28_fingerprint": q28_fingerprint,
    "q34_bpe_token_count": q34_bpe_token_count,
    "q41_tfidf_keywords": q41_tfidf_keywords,
    "q42_hash_sample": q42_hash_sample,
    "q50_neardup_clusters": q50_neardup_clusters,
    "q52_stratified_sample": q52_stratified_sample,
    "q53_fuzzy_name_pairs": q53_fuzzy_name_pairs,
}

ORACLES = {
    "q359_exact_substring_dups": Q359_SQL,
    "q352_vocab_coverage": Q352_SQL,
    "q350_charclass_profile": Q350_SQL,
    "q346_bbit_minhash": Q346_SQL,
    "q340_containment_dedup": Q340_SQL,
    "q341_tokenizer_fertility": Q341_SQL,
    "q334_neardup_closure": _q334_sql(),
    "q333_token_mi": Q333_SQL,
    "q326_good_turing": Q326_SQL,
    "q322_npmi_collocations": Q322_SQL,
    "q323_source_jsd": Q323_SQL,
    "q321_llr_keyness": Q321_SQL,
    "q313_burrows_delta": Q313_SQL,
    "q278_rouge2": Q278_SQL,
    "q266_ppmi_embedding": _q266_sql(),
    "q262_lexical_diversity": Q262_SQL,
    "q246_textrank": _q246_sql(),
    "q229_dup_spans": Q229_SQL,
    "q221_winnowing": Q221_SQL,
    "q186_sorted_neighborhood": Q186_SQL,
    "q197_langid_confusion": _q197_sql(),
    "q201_zipf_knee": Q201_SQL,
    "q209_weighted_jaccard_sources": Q209_SQL,
    "q212_macro_f1": _q212_sql(),
    "q20_exact_dedup": Q20_SQL,
    "q21_token_stats": Q21_SQL,
    "q22_quality_score": Q22_SQL,
    "q23_langid": Q23_SQL,
    "q24_minhash_signature": Q24_SQL,
    "q25_lsh_neardup_pairs": Q25_SQL,
    "q26_simhash": Q26_SQL,
    "q137_simhash_pairs": _q137_sql(),
    "q144_minhash_accuracy": _q144_sql(),
    "q27_ngram_jaccard": Q27_SQL,
    "q28_fingerprint": Q28_SQL,
    "q34_bpe_token_count": Q34_SQL,
    "q41_tfidf_keywords": Q41_SQL,
    "q42_hash_sample": Q42_SQL,
    "q50_neardup_clusters": Q50_SQL,
    "q52_stratified_sample": Q52_SQL,
    "q53_fuzzy_name_pairs": Q53_SQL,
}
