"""KG-construction query surface over the synthetic interleaved-document
corpus (BASELINE.json input_hint).

The corpus is generated deterministically per scale factor (seed=42,
`sources/docgen.py`) and cached under ``/root/repo/_data_cache`` — the
engine's only input is the ``documents(doc_id, spans[])`` table, exactly
the input_hint shape. Each query below exercises one stage of the
pipeline (reference lifecycle: hasura_extractor.py → data_cleaner.py →
schema_mapper.py); the DuckDB oracle replays the same stage in ANSI-ish
SQL over the *same parquet file*, so the driver's value-hash compare is a
genuine independent re-derivation. Full-pipeline outputs (node/edge
histograms kg36/kg37 and the complete flagship resolved-triple stream
kg99, props included) are ALSO SQL-twinned — generated from the same
configs the Spark plans compile from (`_kg99_sql` et al.) — and
additionally pinned by exact golden-triple equality against the
pure-Python reference oracle in `tests/test_golden_graph.py`
(P/R = 1.0). 452/452 queries carry a strict DuckDB twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.reconstruct import media_assets, reconstruct_wide
from ..sources.docgen import ensure_documents

DOC_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "_data_cache")

#: docs per driver scale factor — 10× per step, matching the testdata
#: ratios. The deg_* entries are the adversarial corpora from
#: tools/make_degenerate.py (make_universe(n) emits n lesson docs plus
#: 2 static docs, so deg_empty still exercises the static-node path).
N_DOCS_BY_SF = {
    "sf0.001": 400,
    "sf0.01": 4000,
    "sf0.1": 40000,
    "sf1": 400000,
    "deg_empty": 0,
    "deg_one": 1,
    "deg_nulls": 2,
    "deg_extreme": 3,
}
#: corpus the DuckDB oracle SQL is generated against (the driver's
#: correctness gate runs at sf0.01 = 4000 docs). The env override lets
#: the 10×-scale sweep (`SPARK_GRAFT_ORACLE_NDOCS=40000 check_entry
#: --strict /root/testdata/sf0.1`) regenerate every kg oracle against
#: the same corpus the Spark side reads at that scale factor.
ORACLE_SF_NDOCS = int(os.environ.get("SPARK_GRAFT_ORACLE_NDOCS", "4000"))


def n_docs_for(sf_dir: str) -> int:
    base = os.path.basename(os.path.normpath(sf_dir))
    return N_DOCS_BY_SF.get(base, ORACLE_SF_NDOCS)


def docs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input table: documents(doc_id, spans[]) at this scale factor."""
    path = ensure_documents(DOC_CACHE, n_docs_for(sf_dir))
    return spark.read.parquet(path)


#: literal path the DuckDB oracle reads (driver compares at sf0.01 only);
#: generated at import so the oracle file exists before either side runs
ORACLE_DOCS = ensure_documents(DOC_CACHE, ORACLE_SF_NDOCS)

# shared SQL fragments ------------------------------------------------------

#: spans → (doc_id, kind, k, v, off): name before the first '=', value the
#: remainder (media spans carry the value in media_ref)
_KV_SQL = f"""
  WITH sp AS (
    SELECT doc_id, unnest(spans) AS s FROM '{ORACLE_DOCS}'
  ), kv AS (
    SELECT doc_id,
           s.kind AS kind,
           split_part(s.text, '=', 1) AS k,
           CASE WHEN s.kind = 'media' THEN s.media_ref
                ELSE substring(s.text, length(split_part(s.text, '=', 1)) + 2)
           END AS v,
           s."offset" AS off
    FROM sp
  )
"""

#: pivot helper — one wide row per doc from the kv stream
def _piv(col: str) -> str:
    return f"MAX(CASE WHEN k = '{col}' THEN v END)"


def _wide_sql(cols: list[str], mv: str) -> str:
    """kv → one row per doc of the requested columns, filtered to one MV,
    with row_seq = the extraction order embedded in doc_id."""
    sel = ",\n           ".join(f"{_piv(c)} AS {c}" for c in cols)
    return f"""
  wide AS (
    SELECT doc_id,
           CAST(substring(doc_id, 5) AS BIGINT) AS row_seq,
           {sel}
    FROM kv
    GROUP BY doc_id
    HAVING MAX(CASE WHEN k = '_mv' THEN v END) = '{mv}'
  )
"""


# --------------------------------------------------------------------------
# kg30 — stage S: span-sequence → wide-table reconstruction
# (hasura_extractor.py:249-258; pure-Catalyst path, no shuffle)
# --------------------------------------------------------------------------


def kg30_reconstruct_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = reconstruct_wide(docs_df(spark, sf_dir), "primary")
    return wide.select(
        "doc_id",
        F.col("lesson_slug"),
        F.col("unit_slug"),
        F.col("lesson_id").alias("lesson_id"),
        F.col("order_in_unit").cast("long").alias("order_in_unit"),
        F.col("programme_keystage_slug").alias("keystage_slug"),
    )


KG30_SQL = f"""
{_KV_SQL},
{_wide_sql(["lesson_slug", "unit_slug", "lesson_id", "order_in_unit", "programme_keystage_slug"], "primary")}
SELECT doc_id,
       lesson_slug,
       unit_slug,
       CAST(lesson_id AS BIGINT) AS lesson_id,
       CAST(CAST(order_in_unit AS DOUBLE) AS BIGINT) AS order_in_unit,
       programme_keystage_slug AS keystage_slug
FROM wide
"""


# --------------------------------------------------------------------------
# kg31 — the per-row invariant: span-sequence fingerprint on
# (kind, text, media_ref, rank(offset)) (BASELINE.json input_hint)
# --------------------------------------------------------------------------


def kg31_span_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = docs_df(spark, sf_dir)
    # md5 (engine-portable, unlike xxhash64) over the ordered span tuples
    seq = F.expr(
        "array_join(transform(array_sort(spans, (l, r) -> CASE WHEN l.offset < r.offset"
        " THEN -1 WHEN l.offset > r.offset THEN 1 ELSE 0 END),"
        " s -> concat_ws(chr(31), s.kind, s.text, s.media_ref)), chr(30))"
    )
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.md5(seq).alias("fp"),
    )


KG31_SQL = f"""
{_KV_SQL}
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_spans,
       md5(string_agg(kind || chr(31) || (k || '=' ||
             CASE WHEN kind = 'media' THEN '' ELSE v END) || chr(31) ||
             CASE WHEN kind = 'media' THEN v ELSE '' END,
           chr(30) ORDER BY off)) AS fp
FROM kv
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# kg32 — multimodal span table: every media span as a typed asset row
# (operators/reconstruct.py:media_assets; SURVEY.md §2.5)
# --------------------------------------------------------------------------


def kg32_media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_assets(docs_df(spark, sf_dir)).withColumnRenamed("order", "ord")


KG32_SQL = f"""
{_KV_SQL}
SELECT doc_id, k AS field, v AS media_ref, off AS ord
FROM kv WHERE kind = 'media'
"""


def kg94_media_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media→caption ALIGNMENT over the interleaved span sequence — the
    image/caption pairing a multimodal training pipeline derives from
    interleaved documents (north_star's "interleaved text + media"):
    each media span takes the nearest PRECEDING prose span (kind='text')
    in offset order as its caption; leading media with no prose before
    it stays uncaptioned (``has_caption=false`` is the curation signal).
    One spans explode + one window PARTITIONED BY doc_id (per-document
    groups — never global), `last(..., ignorenulls)` over the strictly-
    preceding frame; offsets are unique within a document so the order
    is total."""
    docs = docs_df(spark, sf_dir)
    sp = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").cast("long").alias("off"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = F.last(
        F.when(F.col("kind") == "text", F.col("text")), ignorenulls=True
    ).over(w)
    return (
        sp.withColumn("caption", cap)
        .filter(F.col("kind") == "media")
        .select(
            "doc_id",
            "media_ref",
            F.col("off").alias("media_off"),
            "caption",
            F.col("caption").isNotNull().alias("has_caption"),
        )
    )


KG94_SQL = f"""
WITH sp AS (
  SELECT doc_id, unnest(spans) AS s FROM '{ORACLE_DOCS}'
), seq AS (
  SELECT doc_id, s.kind AS kind, s."text" AS text, s.media_ref AS media_ref,
         CAST(s."offset" AS BIGINT) AS off
  FROM sp
), ann AS (
  SELECT doc_id, kind, media_ref, off,
         last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY off
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS caption
  FROM seq
)
SELECT doc_id, media_ref, off AS media_off, caption,
       caption IS NOT NULL AS has_caption
FROM ann WHERE kind = 'media'
"""


# --------------------------------------------------------------------------
# kg33 — node extraction with first-seen dedup (schema_mapper.py:86,172-176):
# Unit nodes' numeric properties, winner = lowest extraction order among
# non-filtered rows (data_cleaner filter is_legacy=False runs first)
# --------------------------------------------------------------------------


def _wide(spark: SparkSession, sf_dir: str):
    """One GraphBuild per (session, sf): the consolidated wide table is
    persisted once and fanned out to all 25 extraction plans — without
    this the doc-scan → reconstruct → join → clean prefix re-executes
    per plan (≈40× redundant work at flagship scale)."""
    from ..plans.pipeline import build_graph

    key = (id(spark), os.path.normpath(sf_dir))
    cached = _BUILDS.get(key)
    if cached is None:
        cached = build_graph(spark, docs_df(spark, sf_dir), persist_wide=True)
        # the resolved triple stream IS the materialized edge table — in
        # production it is written to Iceberg once and every traversal
        # query reads the table. Persisting it here gives the same shape:
        # the graph-query layer (kg50-kg54) joins 3-4 edge slices each,
        # and without this every slice re-runs the fused extraction +
        # resolution shuffles.
        from pyspark.storagelevel import StorageLevel

        cached.resolved = cached.resolved.persist(StorageLevel.MEMORY_AND_DISK)
        _BUILDS[key] = cached
    return cached


_BUILDS: dict = {}

#: ad-hoc (non-memoized) GraphBuilds whose persisted dims must outlive
#: the building function (the result DataFrame is lazy) — drained by
#: clear_builds(). Round-5 leak audit caught kg118's diff build here.
_ADHOC_BUILDS: list = []


def clear_builds() -> None:
    """Unpersist and drop every memoized GraphBuild — used by bench.py
    between the warm-up pass and the timed pass so the timed flagship
    rebuilds from scratch (and the warm-up's cached blocks don't
    compete for executor memory)."""
    for gb in _BUILDS.values():
        gb.resolved.unpersist()
        gb.unpersist()
    _BUILDS.clear()
    while _ADHOC_BUILDS:
        _ADHOC_BUILDS.pop().unpersist()


def kg33_unit_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    return gb.nodes["Unit"].select(
        F.col("id"),
        F.col("unitId").alias("unit_id"),
        F.col("nullUnitVariantId").alias("null_unitvariant_id"),
    )


KG33_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "unit_slug", "unit_id", "null_unitvariant_id"], "primary")}
SELECT unit_slug AS id,
       CAST(CAST(arg_min(unit_id, row_seq) AS DOUBLE) AS BIGINT) AS unit_id,
       CAST(CAST(NULLIF(arg_min(COALESCE(null_unitvariant_id, chr(0)), row_seq), chr(0))
            AS DOUBLE) AS BIGINT) AS null_unitvariant_id
FROM wide
WHERE is_legacy = 'False' AND unit_slug IS NOT NULL AND trim(unit_slug) <> ''
GROUP BY unit_slug
"""


# --------------------------------------------------------------------------
# kg34 — triple extraction: HAS_LESSON (Unitvariant)-[:HAS_LESSON]->(Lesson)
# with typed edge property lessonOrder (schema_mapper.py:249-386; config
# unitvariant_has_lesson, ...alpha.json:700-720)
# --------------------------------------------------------------------------


def kg34_has_lesson_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    t = gb.triples.filter(F.col("config_key") == "unitvariant_has_lesson")
    return t.select(
        F.col("subj"),
        F.col("obj"),
        F.element_at("props", "lessonOrder").cast("long").alias("lesson_order"),
    )


KG34_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "unitvariant_id", "lesson_slug", "order_in_unit"], "primary")}
SELECT DISTINCT
       unitvariant_id AS subj,
       lesson_slug AS obj,
       CAST(CAST(order_in_unit AS DOUBLE) AS BIGINT) AS lesson_order
FROM wide
WHERE is_legacy = 'False'
  AND unitvariant_id IS NOT NULL AND trim(unitvariant_id) <> ''
  AND lesson_slug IS NOT NULL AND trim(lesson_slug) <> ''
"""


# --------------------------------------------------------------------------
# kg35 — the full join + expand_list path: supplementary threads that
# survive the composite join (unit_slug normalized, programme_slug_by_year
# exploded both sides, hasura_extractor.py:100-258) expand into Thread
# nodes (schema_mapper.py:633-787), dual JSON/py-literal dialect parsing
# --------------------------------------------------------------------------


def kg35_thread_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    return gb.nodes["Thread"].select(
        F.col("id"),
        F.col("threadId").alias("thread_id"),
        F.col("threadTitle").alias("thread_title"),
    )


KG35_SQL = f"""
{_KV_SQL},
{_wide_sql(["is_legacy", "unit_slug", "programme_slug_by_year"], "primary")},
  prim_x AS (
    SELECT unit_slug,
           unnest(CASE WHEN programme_slug_by_year LIKE '[%'
                       THEN json_transform(programme_slug_by_year, '["VARCHAR"]')
                       ELSE [programme_slug_by_year] END) AS psby
    FROM wide WHERE is_legacy = 'False'
  ),
  supw AS (
    SELECT doc_id,
           {_piv("unit_slug")} AS unit_slug,
           {_piv("programme_slug_by_year")} AS psby_raw,
           {_piv("threads")} AS threads
    FROM kv GROUP BY doc_id
    HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'supplementary'
  ),
  sup_x AS (
    SELECT COALESCE(NULLIF(regexp_extract(unit_slug, '^(.+)-[0-9]+$', 1), ''),
                    unit_slug) AS unit_slug,
           unnest(CASE WHEN psby_raw LIKE '[%'
                       THEN json_transform(psby_raw, '["VARCHAR"]')
                       ELSE [psby_raw] END) AS psby,
           threads
    FROM supw
  ),
  matched AS (
    SELECT DISTINCT s.threads
    FROM sup_x s JOIN prim_x p ON s.unit_slug = p.unit_slug AND s.psby = p.psby
    WHERE s.threads IS NOT NULL AND s.threads LIKE '[%' AND s.threads <> '[]'
  ),
  items AS (
    SELECT unnest(json_transform(replace(threads, chr(39), chr(34)),
      '[{{"thread_slug":"VARCHAR","thread_id":"BIGINT","thread_title":"VARCHAR"}}]')) AS it
    FROM matched
  )
SELECT DISTINCT it.thread_slug AS id,
       it.thread_id AS thread_id,
       it.thread_title AS thread_title
FROM items
WHERE it.thread_slug IS NOT NULL AND trim(it.thread_slug) <> ''
"""


# --------------------------------------------------------------------------
# kg40/kg41 — multimodal plumbing: media spans → binary payloads →
# Arrow-batched feature extraction / frame sampling
# (operators/multimodal.py; decode stubbed deterministically — the
# DuckDB twin re-derives the same features from the ref bytes)
# --------------------------------------------------------------------------


def kg40_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_media, fetch_payload

    assets = media_assets(docs_df(spark, sf_dir))
    return decode_media(fetch_payload(assets))


KG40_SQL = f"""
{_KV_SQL}
SELECT doc_id, k AS field, v AS media_ref,
       CAST(strlen(v) AS BIGINT) AS n_bytes,
       md5(v) AS content_md5,
       CAST(CAST('0x' || substr(md5(v), 1, 8) AS BIGINT) % 1920 AS INT) AS width,
       CAST(CAST('0x' || substr(md5(v), 9, 8) AS BIGINT) % 1080 AS INT) AS height
FROM kv WHERE kind = 'media'
"""


def kg41_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import fetch_payload, sample_frames

    assets = media_assets(docs_df(spark, sf_dir)).filter(
        F.col("field") == "lesson_video_id"
    )
    return sample_frames(fetch_payload(assets), n_frames=3)


KG41_SQL = f"""
{_KV_SQL}
SELECT doc_id, v AS media_ref,
       CAST(f AS INT) AS frame_idx,
       md5(v || CAST(f AS VARCHAR)) AS frame_md5
FROM kv, range(3) AS t(f)
WHERE kind = 'media' AND k = 'lesson_video_id'
"""


def kg83_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-difference scene-cut detection over sampled video frames:
    per media asset, sample 8 frames (Arrow mapInPandas expansion —
    decode stubbed deterministically like kg41), reduce each frame to a
    60-bit signature, and mark a cut wherever adjacent frames' Hamming
    distance exceeds the threshold. The real-codec variant swaps the
    hash for a perceptual frame hash; the plumbing — UDTF-shaped
    expansion, per-asset ordered window, integer Hamming gate — is the
    production shape. All arithmetic integer ⇒ exact."""
    from ..operators.multimodal import fetch_payload, sample_frames

    refs = (
        media_assets(docs_df(spark, sf_dir))
        .select("media_ref")
        .distinct()
        .select(
            F.col("media_ref").alias("doc_id"),
            F.lit("").alias("field"),
            "media_ref",
        )
    )
    frames = sample_frames(fetch_payload(refs), n_frames=8)
    sig = F.conv(F.substring("frame_md5", 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("media_ref").orderBy("frame_idx")
    d = (
        frames.select("media_ref", "frame_idx", sig.alias("sig"))
        .withColumn("prev", F.lag("sig").over(w))
        .filter(F.col("prev").isNotNull())
    )
    ham = F.bit_count(F.col("sig").bitwiseXOR(F.col("prev")))
    return d.select(
        "media_ref",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        ham.cast("long").alias("hamming"),
        (ham > 34).alias("is_cut"),
    )


KG83_SQL = f"""
{_KV_SQL},
refs AS (SELECT DISTINCT v AS media_ref FROM kv WHERE kind = 'media'),
fr AS (
  SELECT media_ref, CAST(f AS INT) AS frame_idx,
         CAST('0x' || substr(md5(media_ref || CAST(f AS VARCHAR)), 1, 15)
              AS BIGINT) AS sig
  FROM refs, range(8) AS t(f)
), d AS (
  SELECT media_ref, frame_idx, sig,
         LAG(sig) OVER (PARTITION BY media_ref ORDER BY frame_idx) AS prev
  FROM fr
)
SELECT media_ref, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(bit_count(xor(sig, prev)) AS BIGINT) AS hamming,
       bit_count(xor(sig, prev)) > 34 AS is_cut
FROM d WHERE prev IS NOT NULL
"""


def kg85_subset_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-growth audit: rebuild the graph over the 80%
    document subset (doc sequence number % 5 ≠ 0) and diff per-label
    node counts against the full build — the checkpoint/backfill sanity
    check 'how much graph does the next 20% of the feed add'. Node
    counts can only grow with more documents (first-seen dedup is
    monotone), which the delta column witnesses. The oracle re-derives
    both histograms by injecting the same subset predicate into the
    node-histogram SQL's span CTE."""
    from ..plans.pipeline import build_graph

    docs = docs_df(spark, sf_dir)
    subset = docs.filter(
        F.substring("doc_id", 5, 20).cast("long") % 5 != 0
    )
    full_n = {
        label: df.count() for label, df in _wide(spark, sf_dir).nodes.items()
    }
    gb_sub = build_graph(spark, subset)
    rows = []
    for label, df in gb_sub.nodes.items():
        rows.append((label, full_n.get(label, 0), df.count()))
    # eager counts above already materialized everything this build
    # caches — release it before returning (round-5 leak audit)
    gb_sub.unpersist()
    out = spark.createDataFrame(
        rows, "label string, n_full long, n_subset long"
    )
    return out.select(
        "label",
        "n_full",
        "n_subset",
        (F.col("n_full") - F.col("n_subset")).alias("delta"),
    ).filter(F.col("n_full") > 0)


def _kg85_sql() -> str:
    # the subset histogram = the SAME generated node-histogram SQL with
    # the subset predicate injected into its span CTE (one anchored
    # replace on the generated string — both variants stay derived from
    # the single config-driven generator)
    full = _node_hist_sql()
    anchor = "unnest(spans) AS s FROM"
    sub = full.replace(
        anchor,
        "unnest(spans) AS s FROM (SELECT * FROM",
        1,
    ).replace(
        f"FROM (SELECT * FROM '{ORACLE_DOCS}'",
        f"FROM (SELECT * FROM '{ORACLE_DOCS}' "
        "WHERE CAST(substring(doc_id, 5) AS BIGINT) % 5 <> 0)",
        1,
    )
    return f"""
WITH f AS ({full}), s AS ({sub})
SELECT f.label, f.n_nodes AS n_full,
       COALESCE(s.n_nodes, 0) AS n_subset,
       f.n_nodes - COALESCE(s.n_nodes, 0) AS delta
FROM f LEFT JOIN s ON f.label = s.label
WHERE f.n_nodes > 0
"""


def kg42_media_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal → ANN integration: distinct media assets → Arrow
    embedding stage (`operators/multimodal.py:embed_media`) → banded
    SRP-LSH near-dup over the embedding column (2 bands × 8 bits,
    16-dim) → exact cosine on candidates. The full image-dedup path a
    training pipeline runs, with the encoder stubbed deterministically
    so the DuckDB twin re-derives identical vectors from the ref bytes."""
    from ..operators.multimodal import EMBED_DIM, embed_media, fetch_payload
    from .similarity import band_signature, dot, norm

    n_bands, bits = 2, 12
    refs = (
        media_assets(docs_df(spark, sf_dir))
        .select("media_ref")
        .distinct()
        .select(
            F.col("media_ref").alias("doc_id"),
            F.lit("").alias("field"),
            "media_ref",
        )
    )
    emb = embed_media(fetch_payload(refs))
    sigs = emb.select(
        "media_ref",
        *[
            band_signature(F.col("embedding"), b, bits, EMBED_DIM).alias(
                f"sig{b}"
            )
            for b in range(n_bands)
        ],
    )
    keys = sigs.select(
        "media_ref",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"sig{b}").alias("sig")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("k"),
    ).select("media_ref", F.col("k.band").alias("band"), F.col("k.sig").alias("sig"))
    a = keys.select("band", "sig", F.col("media_ref").alias("ref1"))
    b = keys.select("band", "sig", F.col("media_ref").alias("ref2"))
    cand = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("ref1") < F.col("ref2"))
        .select("ref1", "ref2")
        .distinct()
    )
    withn = emb.select(
        "media_ref", "embedding", norm(F.col("embedding")).alias("n")
    )
    v1 = withn.select(
        F.col("media_ref").alias("ref1"),
        F.col("embedding").alias("v1"),
        F.col("n").alias("n1"),
    )
    v2 = withn.select(
        F.col("media_ref").alias("ref2"),
        F.col("embedding").alias("v2"),
        F.col("n").alias("n2"),
    )
    sim = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    return (
        cand.join(v1, on="ref1")
        .join(v2, on="ref2")
        .select("ref1", "ref2", sim.alias("sim"))
        .filter(F.col("sim") >= 0.75)
        .select("ref1", "ref2", F.round("sim", 4).alias("sim"))
    )


def _kg42_sql() -> str:
    from .similarity import _band_sig_sql, _cos_sql

    sig_cols = ", ".join(
        f"{_band_sig_sql(b, bits=12)} AS sig{b}" for b in range(2)
    )
    cand_union = "\n  UNION\n".join(
        f"  SELECT a.media_ref AS ref1, b.media_ref AS ref2\n"
        f"  FROM hashed a JOIN hashed b "
        f"ON a.sig{b} = b.sig{b} AND a.media_ref < b.media_ref"
        for b in range(2)
    )
    embed = (
        "list_transform(generate_series(0, 15), i -> "
        "CAST(CAST('0x' || substr(md5(media_ref), i*2+1, 2) AS INT) AS DOUBLE)"
        " / 255.0 - 0.5)"
    )
    return f"""
{_KV_SQL},
refs AS (SELECT DISTINCT v AS media_ref FROM kv WHERE kind = 'media'),
e AS (SELECT media_ref, {embed} AS v FROM refs),
hashed AS (SELECT media_ref, {sig_cols} FROM e),
cand AS (
{cand_union}
), scored AS (
  SELECT cand.ref1, cand.ref2, {_cos_sql('ea.v', 'eb.v')} AS sim
  FROM cand
  JOIN e ea ON ea.media_ref = cand.ref1
  JOIN e eb ON eb.media_ref = cand.ref2
)
SELECT ref1, ref2, round(sim, 4) AS sim FROM scored WHERE sim >= 0.75
"""


# --------------------------------------------------------------------------
# full-pipeline surfaces (golden-tested vs the pure-Python reference
# oracle in tests/test_golden_graph.py; rows-only driver check here)
# --------------------------------------------------------------------------


def kg36_node_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes per label (introspect_schema.py:43-98 A7; this is also
    documented Cypher Example 1, oak_curriculum_graph_documentation.md
    :936-957 — `CALL db.labels() … RETURN label, count` — modulo sort
    order, which the driver compares order-insensitively).

    Counts over the fused node-ID dimension (ONE scan of the persisted
    melt, already distinct per (label, nid) — node_dims' ID set equals
    extract_node's by construction) instead of unioning 13 per-label
    count jobs, which re-scans the wide table per label."""
    gb = _wide(spark, sf_dir)
    return (
        gb.extras["dims"]
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("label")
    )


def kg37_edge_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolved edges per (subj_label, pred, obj_label) pattern triple
    (schema_introspection_output.txt:133-213)."""
    gb = _wide(spark, sf_dir)
    return (
        gb.resolved.groupBy("subj_label", "pred", "obj_label")
        .agg(F.count("*").alias("n_edges"))
        .orderBy("subj_label", "pred", "obj_label")
    )


def kg_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline pipeline: documents → reconstruct → join → clean →
    extract → resolve; returns the resolved (subj, pred, obj) stream."""
    gb = _wide(spark, sf_dir)
    return gb.resolved.select(
        "config_key",
        "pred",
        "subj",
        "obj",
        "subj_label",
        "obj_label",
        F.to_json(F.col("props")).alias("props_json"),
    )


# --------------------------------------------------------------------------
# kg114 — SLUG-NORMALIZATION COLLAPSE audit: how many raw
# supplementary unit_slug surface forms does the J2 suffix rule
# (strip trailing -<digits>, functions/scalars.py:normalize_unit_slug)
# merge per normalized id? The histogram (collapse factor k →
# n_normalized_ids) is the ER-impact statement of the normalization
# stage: k = 1 ids gained nothing, large k means the rule is doing
# real entity resolution — and a sudden k-profile shift flags an
# upstream slug-format change. One distinct + one two-level agg over
# the supplementary reconstruction, no joins.
# --------------------------------------------------------------------------


def kg114_slug_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import normalize_unit_slug

    sup = reconstruct_wide(docs_df(spark, sf_dir), "supplementary")
    raw = (
        sup.select(F.col("unit_slug").alias("raw"))
        .filter(F.col("raw").isNotNull() & (F.trim("raw") != ""))
        .distinct()
    )
    per = raw.select(
        normalize_unit_slug(F.col("raw")).alias("nid"), "raw"
    ).groupBy("nid").agg(F.count(F.lit(1)).alias("k"))
    return (
        per.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_normalized_ids"),
            F.min("nid").alias("example_nid"),
        )
        .select(F.col("k").cast("long").alias("k_raw_forms"),
                "n_normalized_ids", "example_nid")
    )


KG114_SQL = f"""
{_KV_SQL},
supw AS (
  SELECT doc_id, MAX(CASE WHEN k = 'unit_slug' THEN v END) AS unit_slug
  FROM kv GROUP BY doc_id
  HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'supplementary'
),
raw AS (
  SELECT DISTINCT unit_slug AS raw FROM supw
  WHERE unit_slug IS NOT NULL AND trim(unit_slug) <> ''
),
per AS (
  SELECT COALESCE(NULLIF(regexp_extract(raw, '^(.+)-[0-9]+$', 1), ''), raw)
           AS nid,
         COUNT(*) AS k
  FROM raw GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k_raw_forms,
       CAST(COUNT(*) AS BIGINT) AS n_normalized_ids,
       MIN(nid) AS example_nid
FROM per GROUP BY k
"""


# --------------------------------------------------------------------------
# kg116 — CROSS-MODAL CONSISTENCY audit: do near-duplicate media
# assets (kg42's embedding-LSH pairs) carry near-duplicate CAPTIONS
# (kg94's preceding-text alignment)? For every kg42 pair the audit
# reports the token Jaccard between the two assets' captions (each
# asset's canonical caption = the lexicographic min across its
# placements — deterministic) and flags agreement at ≥ 0.5. Pairs
# where visually-identical media carry unrelated captions are exactly
# the mislabeled-media candidates a multimodal training set must
# quarantine. Composes two audited plans; the join-back is per
# candidate pair (pairs ≪ assets²).
# --------------------------------------------------------------------------


def kg116_crossmodal_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import tokens as _tok

    pairs = kg42_media_embedding_neardup(spark, sf_dir)
    caps = (
        kg94_media_alignment(spark, sf_dir)
        .filter(F.col("caption").isNotNull())
        .groupBy("media_ref")
        .agg(F.min("caption").alias("caption"))
    )
    j = (
        pairs.join(
            caps.select(F.col("media_ref").alias("ref1"),
                        F.col("caption").alias("cap1")),
            "ref1",
            "left",
        )
        .join(
            caps.select(F.col("media_ref").alias("ref2"),
                        F.col("caption").alias("cap2")),
            "ref2",
            "left",
        )
    )
    ta, tb = _tok(F.col("cap1")), _tok(F.col("cap2"))
    inter = F.size(F.array_intersect(F.array_distinct(ta),
                                     F.array_distinct(tb)))
    union = F.size(F.array_union(ta, tb))
    jac = F.when(
        F.col("cap1").isNotNull() & F.col("cap2").isNotNull(),
        F.round(inter / union.cast("double"), 4),
    )
    return j.select(
        "ref1",
        "ref2",
        F.col("sim").alias("embed_sim"),
        jac.alias("caption_jaccard"),
        (F.coalesce(jac >= 0.5, F.lit(False))).alias("captions_agree"),
    )


def _kg116_sql() -> str:
    from .common import TOKENS_SQL as _TSQL

    kg42 = _kg42_sql()
    kg94 = KG94_SQL
    ta = _TSQL.format(x="c1.caption")
    tb = _TSQL.format(x="c2.caption")
    return f"""
WITH pairs AS ({kg42}),
align AS ({kg94}),
caps AS (
  SELECT media_ref, MIN(caption) AS caption
  FROM align WHERE caption IS NOT NULL GROUP BY media_ref
)
SELECT p.ref1, p.ref2, p.sim AS embed_sim,
       CASE WHEN c1.caption IS NOT NULL AND c2.caption IS NOT NULL THEN
         ROUND(len(list_intersect(list_distinct({ta}), list_distinct({tb})))
               / (1.0 * len(list_distinct({ta} || {tb}))), 4)
       END AS caption_jaccard,
       COALESCE(
         CASE WHEN c1.caption IS NOT NULL AND c2.caption IS NOT NULL THEN
           ROUND(len(list_intersect(list_distinct({ta}), list_distinct({tb})))
                 / (1.0 * len(list_distinct({ta} || {tb}))), 4) >= 0.5
         END, FALSE) AS captions_agree
FROM pairs p
LEFT JOIN caps c1 ON c1.media_ref = p.ref1
LEFT JOIN caps c2 ON c2.media_ref = p.ref2
"""


# --------------------------------------------------------------------------
# kg117 — PER-LABEL ISOLATION audit: which node labels carry nodes no
# resolved edge ever touches? kg67 reports the overall orphan count;
# this is the per-label breakdown a graph-completeness review works
# from — a Lesson isolation rate above ~0 means HAS_LESSON endpoints
# failed resolution (or the source feed dropped the join keys), while
# Schemaversion is EXPECTED to be 100% isolated (it is a metadata
# node no relationship config targets). One anti-join of the fused
# node dimension against the distinct endpoint set — both already
# built by the flagship plan; label is the partition-friendly 13-key
# rollup.
# --------------------------------------------------------------------------


def kg117_label_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    dims = gb.extras["dims"].select(
        "label", F.col("nid").cast("string").alias("nid")
    )
    r = gb.resolved
    conn = (
        r.select(
            F.col("subj_label").alias("label"),
            F.col("subj").cast("string").alias("nid"),
        )
        .unionByName(
            r.select(
                F.col("obj_label").alias("label"),
                F.col("obj").cast("string").alias("nid"),
            )
        )
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    j = dims.join(conn, ["label", "nid"], "left")
    return j.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.count_if(F.col("_c").isNull()).cast("long").alias("n_isolated"),
        F.round(
            F.count_if(F.col("_c").isNull()) / F.count(F.lit(1)), 6
        ).alias("isolation_rate"),
    )


def _kg117_sql() -> str:
    dims_union = "\n  UNION ALL\n".join(
        f"  SELECT '{label}' AS label, id AS nid FROM dim_{label}"
        for label in [*_LABEL_ID_SQL, "Thread"]
    )
    return f"""
{_edges_union_sql()},
alln AS (
{dims_union}
  UNION ALL
  SELECT 'Schemaversion' AS label, 'v0.1.0-alpha' AS nid
),
conn AS (
  SELECT DISTINCT subj_label AS label, subj AS nid FROM edges
  UNION
  SELECT DISTINCT obj_label AS label, obj AS nid FROM edges
)
SELECT a.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(COUNT(*) FILTER (WHERE c.nid IS NULL) AS BIGINT) AS n_isolated,
       ROUND(COUNT(*) FILTER (WHERE c.nid IS NULL) / (1.0 * COUNT(*)), 6)
         AS isolation_rate
FROM alln a
LEFT JOIN conn c ON c.label = a.label AND c.nid = a.nid
GROUP BY a.label
"""


# --------------------------------------------------------------------------
# kg118 — LEGACY-INCLUSION GRAPH DIFF: the what-if audit for the
# data_cleaner's is_legacy filter — per (subj_label, pred, obj_label)
# pattern, how many resolved edge identities would the graph GAIN if
# legacy rows were kept, and (as a monotonicity proof) how many it
# would LOSE (must be 0: adding source rows can only add first-seen
# candidates and dim members). This is the impact statement a schema
# owner reads before changing a config filter — the graph-version diff
# operator every KG maintenance cycle needs. Scale: both edge sets are
# the audited flagship plan; the diff is one EXCEPT per direction on
# (labels, pred, subj, obj) — partial-aggregable, no all-pairs.
# --------------------------------------------------------------------------

_EDGE5 = ("subj_label", "pred", "obj_label", "subj", "obj")


def kg118_legacy_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.pipeline import build_graph

    cur = _wide(spark, sf_dir).resolved.select(*_EDGE5).distinct()
    gb_unf = build_graph(
        spark, docs_df(spark, sf_dir), filters={}, persist_wide=False
    )
    # build_graph always persists its dims table; the diff result is
    # lazy, so the release rides the clear_builds() drain (round-5
    # sweep-wide leak audit)
    _ADHOC_BUILDS.append(gb_unf)
    unf = gb_unf.resolved.select(*_EDGE5).distinct()
    added = (
        unf.subtract(cur)
        .groupBy("subj_label", "pred", "obj_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .withColumn("direction", F.lit("added"))
    )
    removed = (
        cur.subtract(unf)
        .groupBy("subj_label", "pred", "obj_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .withColumn("direction", F.lit("removed"))
    )
    return added.unionByName(removed).select(
        "direction", "subj_label", "pred", "obj_label", "n_edges"
    )


def _kg118_sql() -> str:
    def q(flag: bool) -> str:
        return (
            _edges_union_sql(legacy_filter=flag)
            + "\nSELECT subj_label, pred, obj_label, subj, obj FROM edges"
        )

    return f"""
WITH cur AS ({q(True)}),
unf AS ({q(False)}),
added AS (SELECT * FROM unf EXCEPT SELECT * FROM cur),
removed AS (SELECT * FROM cur EXCEPT SELECT * FROM unf)
SELECT 'added' AS direction, subj_label, pred, obj_label,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM added GROUP BY 2, 3, 4
UNION ALL
SELECT 'removed' AS direction, subj_label, pred, obj_label,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM removed GROUP BY 2, 3, 4
"""


# --------------------------------------------------------------------------
# kg120 — PREDICATE CO-OCCURRENCE over shared subjects: for every pair
# of relationship types, how many subject nodes carry BOTH — the graph-
# schema drift monitor (a Unit suddenly losing its HAS_THREAD while
# keeping HAS_UNITVARIANT shows up as a pair-count shift before any
# downstream query breaks). Plan: distinct (subj, pred) — one partial
# agg — self-joined on subj; the join fan-out per subject is bounded by
# the predicate-type count (≤12), never by corpus size.
# --------------------------------------------------------------------------


def kg120_pred_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    sp = gb.resolved.select("subj", "pred").distinct()
    a = sp.select(F.col("subj"), F.col("pred").alias("pred_a"))
    b = sp.select(F.col("subj"), F.col("pred").alias("pred_b"))
    return (
        a.join(b, "subj")
        .filter(F.col("pred_a") < F.col("pred_b"))
        .groupBy("pred_a", "pred_b")
        .agg(F.count_distinct("subj").cast("long").alias("n_subjects"))
    )


def _kg120_sql() -> str:
    return f"""
{_edges_union_sql()},
subj_pred AS (SELECT DISTINCT subj, pred FROM edges)
SELECT a.pred AS pred_a, b.pred AS pred_b,
       CAST(COUNT(DISTINCT a.subj) AS BIGINT) AS n_subjects
FROM subj_pred a JOIN subj_pred b ON a.subj = b.subj AND a.pred < b.pred
GROUP BY 1, 2
"""


QUERIES = {
    "kg118_legacy_graph_diff": kg118_legacy_graph_diff,
    "kg120_pred_cooccurrence": kg120_pred_cooccurrence,
    "kg117_label_isolation": kg117_label_isolation,
    "kg114_slug_collapse": kg114_slug_collapse,
    "kg116_crossmodal_consistency": kg116_crossmodal_consistency,
    "kg30_reconstruct_wide": kg30_reconstruct_wide,
    "kg31_span_fingerprint": kg31_span_fingerprint,
    "kg32_media_assets": kg32_media_assets,
    "kg94_media_alignment": kg94_media_alignment,
    "kg33_unit_nodes": kg33_unit_nodes,
    "kg34_has_lesson_triples": kg34_has_lesson_triples,
    "kg35_thread_nodes": kg35_thread_nodes,
    "kg40_media_features": kg40_media_features,
    "kg41_frame_samples": kg41_frame_samples,
    "kg42_media_embedding_neardup": kg42_media_embedding_neardup,
    "kg83_scene_cuts": kg83_scene_cuts,
    "kg85_subset_growth": kg85_subset_growth,
    "kg36_node_histogram": kg36_node_histogram,
    "kg37_edge_histogram": kg37_edge_histogram,
    "kg99_flagship": kg_flagship,
}

# --------------------------------------------------------------------------
# kg36/kg37 DuckDB oracles — the ENTIRE pipeline (consolidate → clean →
# extract → resolve) re-derived in SQL, generated from the same configs
# the Spark plans compile from. This is a genuinely independent second
# derivation: the SQL path never touches the Spark code, so a value-hash
# match on the histograms checks the whole construction stack.
# --------------------------------------------------------------------------

#: raw-string nullish-ID guard (schema_mapper.py:156-170)
def _ok(x: str) -> str:
    return (
        f"{x} IS NOT NULL AND trim({x}) <> '' "
        f"AND lower(trim({x})) NOT IN ('nan','null','none')"
    )


#: synthetic Unitoffering ID (data_cleaner.py:337-358): string fields
#: substitute 'nan' when null
_UO_SQL = (
    "(COALESCE(trim(programme_year_slug), 'nan') || '-' || "
    "COALESCE(trim(programme_subject_slug), 'nan'))"
)

_THREAD_STRUCT = (
    '\'[{"thread_slug":"VARCHAR","thread_id":"BIGINT",'
    '"thread_title":"VARCHAR"}]\''
)


def _hist_base_sql(legacy_filter: bool = True) -> str:
    """CTEs reproducing the consolidated exploded wide table: pivot both
    MVs, explode programme_slug_by_year on both sides, normalize the
    supplementary unit_slug suffix, left-join on the composite key
    (hasura_extractor.py:100-258), filter is_legacy (data_cleaner).
    ``legacy_filter=False`` keeps legacy rows — the kg118 what-if
    variant."""
    prim_cols = [
        "is_legacy", "programme_subject_slug", "programme_phase_slug",
        "programme_keystage_slug", "programme_year_slug", "unit_slug",
        "programme_slug_by_year", "programme_tier_slug",
        "programme_examboard_slug", "unitvariant_id", "lesson_slug",
    ]
    piv = ",\n           ".join(f"{_piv(c)} AS {c}" for c in prim_cols)
    unn = (
        "unnest(CASE WHEN {0} LIKE '[%' "
        "THEN json_transform({0}, '[\"VARCHAR\"]') ELSE [{0}] END)"
    )
    return f"""
{_KV_SQL},
primw AS (
  SELECT doc_id, {piv}
  FROM kv GROUP BY doc_id
  HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'primary'
),
supw AS (
  SELECT doc_id, {_piv("unit_slug")} AS unit_slug,
         {_piv("programme_slug_by_year")} AS psby_raw,
         {_piv("threads")} AS threads
  FROM kv GROUP BY doc_id
  HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'supplementary'
),
prim_x AS (
  SELECT *, {unn.format("programme_slug_by_year")} AS psby
  FROM primw{" WHERE is_legacy = 'False'" if legacy_filter else ""}
),
sup_x AS (
  SELECT COALESCE(NULLIF(regexp_extract(unit_slug, '^(.+)-[0-9]+$', 1), ''),
                  unit_slug) AS unit_slug,
         {unn.format("psby_raw")} AS psby,
         threads
  FROM supw
),
widex AS (
  SELECT p.*, s.threads
  FROM prim_x p LEFT JOIN sup_x s
    ON p.unit_slug = s.unit_slug AND p.psby = s.psby
),
titems AS (
  SELECT unnest(json_transform(replace(t.threads, chr(39), chr(34)),
         {_THREAD_STRUCT})) AS it
  FROM (SELECT DISTINCT threads FROM widex
        WHERE threads IS NOT NULL AND threads LIKE '[%'
          AND threads <> '[]') t
)
"""


#: label → distinct-ID SQL expression over `widex` (node dedup is on the
#: raw endpoint string, schema_mapper.py:86,172-176)
_LABEL_ID_SQL = {
    "Subject": "trim(programme_subject_slug)",
    "Phase": "trim(programme_phase_slug)",
    "Keystage": "trim(programme_keystage_slug)",
    "Year": "trim(programme_year_slug)",
    "Unit": "trim(unit_slug)",
    "Programme": "trim(psby)",
    "Tier": "trim(programme_tier_slug)",
    "Examboard": "trim(programme_examboard_slug)",
    "Lesson": "trim(lesson_slug)",
    "Unitoffering": _UO_SQL,
    "Unitvariant":
        "CAST(CAST(TRY_CAST(unitvariant_id AS DOUBLE) AS BIGINT) AS VARCHAR)",
}


def _node_hist_sql() -> str:
    parts = []
    for label, expr in _LABEL_ID_SQL.items():
        parts.append(
            f"SELECT '{label}' AS label, COUNT(DISTINCT {expr}) AS n_nodes "
            f"FROM widex WHERE {_ok(expr)}"
        )
    parts.append(
        "SELECT 'Thread' AS label, COUNT(DISTINCT it.thread_slug) AS n_nodes "
        f"FROM titems WHERE {_ok('it.thread_slug')}"
    )
    parts.append("SELECT 'Schemaversion' AS label, 1 AS n_nodes")
    u = "\nUNION ALL\n".join(parts)
    return (
        f"{_hist_base_sql()}\n"
        f"SELECT label, CAST(n_nodes AS BIGINT) AS n_nodes FROM ({u}) "
        "WHERE n_nodes > 0 ORDER BY label"
    )


def _edges_union_sql(legacy_filter: bool = True) -> str:
    """The full resolved edge set re-derived in SQL: CTE preamble +
    ``edges`` = UNION ALL over every relationship config of its
    distinct, endpoint-resolved (subj_label, pred, obj_label, subj, obj)
    rows. Shared by the kg37 histogram oracle and the graph-analytics
    oracles (degree distribution, PageRank) so all three check the SAME
    independent derivation of the graph."""
    from ..config.curriculum_schema import RELATIONSHIPS as _R

    dims = []
    for label, expr in _LABEL_ID_SQL.items():
        dims.append(
            f"dim_{label} AS (SELECT DISTINCT {expr} AS id FROM widex "
            f"WHERE {_ok(expr)})"
        )
    dims.append(
        "dim_Thread AS (SELECT DISTINCT it.thread_slug AS id FROM titems "
        f"WHERE {_ok('it.thread_slug')})"
    )

    def end_expr(field: str) -> str:
        if field == "unitOfferingSlug":
            return _UO_SQL
        if field == "unitvariant_id":
            return _LABEL_ID_SQL["Unitvariant"]
        if field == "programme_slug_by_year":
            return "trim(psby)"
        return f"trim({field})"

    parts = []
    for key, cfg in _R.items():
        sf, ef = cfg["start_csv_field"], cfg["end_csv_field"]
        pred = cfg.get("relationship_type", key)
        slbl, elbl = cfg["start_node_type"], cfg["end_node_type"]
        if ef == "threads":
            # array endpoint: per-row cross product unit × thread ids
            cand = (
                f"SELECT DISTINCT s, it.thread_slug AS e FROM ("
                f"SELECT {end_expr(sf)} AS s, "
                f"unnest(json_transform(replace(threads, chr(39), chr(34)), "
                f"{_THREAD_STRUCT})) AS it "
                f"FROM widex WHERE threads IS NOT NULL AND threads LIKE '[%' "
                f"AND {end_expr(sf)} IS NOT NULL AND trim({end_expr(sf)}) <> '') "
                f"WHERE it.thread_slug IS NOT NULL AND trim(it.thread_slug) <> ''"
            )
        else:
            s, e = end_expr(sf), end_expr(ef)
            cand = (
                f"SELECT DISTINCT {s} AS s, {e} AS e FROM widex "
                f"WHERE {s} IS NOT NULL AND trim({s}) <> '' "
                f"AND {e} IS NOT NULL AND trim({e}) <> ''"
            )
        parts.append(
            f"SELECT '{slbl}' AS subj_label, '{pred}' AS pred, "
            f"'{elbl}' AS obj_label, c.s AS subj, c.e AS obj FROM ({cand}) c "
            f"WHERE c.s IN (SELECT id FROM dim_{slbl}) "
            f"AND c.e IN (SELECT id FROM dim_{elbl})"
        )
    u = "\nUNION ALL\n".join(parts)
    return (
        f"{_hist_base_sql(legacy_filter)},\n" + ",\n".join(dims) + ",\n"
        f"edges AS (\n{u}\n)"
    )


def _edge_hist_sql() -> str:
    return (
        f"{_edges_union_sql()}\n"
        "SELECT subj_label, pred, obj_label, "
        "CAST(COUNT(*) AS BIGINT) AS n_edges "
        "FROM edges GROUP BY subj_label, pred, obj_label "
        "ORDER BY subj_label, pred, obj_label"
    )


KG36_SQL = _node_hist_sql()
KG37_SQL = _edge_hist_sql()


# --------------------------------------------------------------------------
# kg99 DuckDB oracle — the COMPLETE flagship output (config_key, pred,
# subj, obj, subj_label, obj_label, props_json) re-derived in SQL. This
# extends the kg36/kg37 generator with the two pieces the histograms
# don't need:
#   1. ORDER — first-seen dedup per (subj, obj) within each config
#      follows the reference's consolidated row order (_row_seq from
#      doc_id, psby explode position, supplementary doc order, sup psby
#      position), reproduced here as a row_number() QUALIFY instead of
#      Spark's min-struct aggregate (operators/mapper.py:431-434);
#   2. PROPS — the winning row's property map rendered exactly as
#      Spark's to_json(map): entries in config order, null values
#      omitted, int props round-tripped double→bigint, computed
#      is_not_null booleans 'true'/'false', lastUpdated pinned to the
#      deterministic RUN_TS (plans/pipeline.py:45).
# --------------------------------------------------------------------------


def _kg99_base_sql() -> str:
    """Order-carrying variant of the consolidated wide table: widex plus
    (_row_seq, _psby_pos, _sup_seq, _sup_pos) — the exact total order
    `consolidate` emits as ``_ord`` (operators/joins.py:67-84)."""
    prim_cols = [
        "is_legacy", "programme_subject_slug", "programme_phase_slug",
        "programme_keystage_slug", "programme_year_slug", "unit_slug",
        "programme_slug_by_year", "programme_tier_slug",
        "programme_examboard_slug", "unitvariant_id", "lesson_slug",
        "order_in_unit", "programme_optionality",
    ]
    piv = ",\n           ".join(f"{_piv(c)} AS {c}" for c in prim_cols)
    arr = (
        "CASE WHEN {0} LIKE '[%' "
        "THEN json_transform({0}, '[\"VARCHAR\"]') ELSE [{0}] END"
    )
    pos_unnest = (
        "LATERAL unnest(list_transform({0}._l, (e, i) -> "
        "{{'e': e, 'i': i}})) AS t(u)"
    )
    return f"""
{_KV_SQL},
primw AS (
  SELECT doc_id, CAST(substring(doc_id, 5) AS BIGINT) AS _row_seq, {piv}
  FROM kv GROUP BY doc_id
  HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'primary'
),
supw AS (
  SELECT doc_id, CAST(substring(doc_id, 5) AS BIGINT) AS _sup_seq,
         {_piv("unit_slug")} AS unit_slug,
         {_piv("programme_slug_by_year")} AS psby_raw,
         {_piv("unit_order")} AS unit_order,
         {_piv("threads")} AS threads
  FROM kv GROUP BY doc_id
  HAVING MAX(CASE WHEN k = '_mv' THEN v END) = 'supplementary'
),
prim_x AS (
  SELECT p.* EXCLUDE (_l), t.u.i - 1 AS _psby_pos, t.u.e AS psby
  FROM (SELECT *, {arr.format("programme_slug_by_year")} AS _l
        FROM primw WHERE is_legacy = 'False') p,
  {pos_unnest.format("p")}
),
sup_x AS (
  SELECT COALESCE(NULLIF(regexp_extract(s.unit_slug, '^(.+)-[0-9]+$', 1),
                         ''), s.unit_slug) AS unit_slug,
         t.u.i - 1 AS _sup_pos, t.u.e AS psby,
         s._sup_seq, s.unit_order AS sup_unit_order, s.threads
  FROM (SELECT *, {arr.format("psby_raw")} AS _l FROM supw) s,
  {pos_unnest.format("s")}
),
widex AS (
  SELECT p.*, COALESCE(s._sup_seq, -1) AS _sup_seq,
         COALESCE(s._sup_pos, -1) AS _sup_pos,
         s.sup_unit_order, s.threads
  FROM prim_x p LEFT JOIN sup_x s
    ON p.unit_slug = s.unit_slug AND p.psby = s.psby
),
titems AS (
  SELECT unnest(json_transform(replace(t.threads, chr(39), chr(34)),
         {_THREAD_STRUCT})) AS it
  FROM (SELECT DISTINCT threads FROM widex
        WHERE threads IS NOT NULL AND threads LIKE '[%'
          AND threads <> '[]') t
)
"""


#: hasura_col → widex column for relationship property sources
_PROP_COL_SQL = {
    "unit_order": "sup_unit_order",
    "order_in_unit": "order_in_unit",
    "programme_optionality": "programme_optionality",
}

_PY_WS_SQL = (
    "\\s\\x{001c}-\\x{001f}\\x{0085}\\x{00a0}\\x{1680}"
    "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}"
)


def _props_json_sql(cfg: dict) -> tuple[str, list[str]]:
    """(json_expr, prop_source_columns): the to_json(map) rendering of a
    relationship config's props — entries in config order, nulls omitted
    (operators/mapper.py:436-464)."""
    from ..plans.pipeline import RUN_TS

    parts, src_cols = [], []
    for pname, pcfg in cfg.get("properties", {}).items():
        hcol = pcfg.get("hasura_col")
        if hcol == "current_timestamp":
            parts.append(f"'\"{pname}\":\"{RUN_TS}\"'")
            continue
        col = _PROP_COL_SQL[hcol]
        src_cols.append(col)
        if pcfg.get("computed") == "is_not_null":
            # string source: present iff non-null, non-blank, non-empty-
            # struct (functions/scalars.py:is_empty_str)
            t = (
                f"regexp_replace({col}, "
                f"'^[{_PY_WS_SQL}]+|[{_PY_WS_SQL}]+$', '')"
            )
            val = (
                f"CASE WHEN {col} IS NOT NULL AND {t} <> '' "
                f"AND NOT regexp_matches({t}, "
                "'^(\\[[ \\t\\n\\r]*\\]|\\{[ \\t\\n\\r]*\\})$') "
                "THEN 'true' ELSE 'false' END"
            )
            parts.append(f"'\"{pname}\":\"' || ({val}) || '\"'")
        elif pcfg.get("type") == "int":
            v = f"CAST(CAST(TRY_CAST({col} AS DOUBLE) AS BIGINT) AS VARCHAR)"
            parts.append(
                f"CASE WHEN {v} IS NOT NULL "
                f"THEN '\"{pname}\":\"' || {v} || '\"' END"
            )
        else:  # plain string prop
            parts.append(
                f"CASE WHEN {col} IS NOT NULL "
                f"THEN '\"{pname}\":' || to_json({col}) END"
            )
    return "'{' || concat_ws(',', " + ", ".join(parts) + ") || '}'", src_cols


def _kg99_sql() -> str:
    from ..config.curriculum_schema import RELATIONSHIPS as _R

    dims = []
    for label, expr in _LABEL_ID_SQL.items():
        dims.append(
            f"dim_{label} AS (SELECT DISTINCT {expr} AS id FROM widex "
            f"WHERE {_ok(expr)})"
        )
    dims.append(
        "dim_Thread AS (SELECT DISTINCT it.thread_slug AS id FROM titems "
        f"WHERE {_ok('it.thread_slug')})"
    )

    def end_expr(field: str) -> str:
        if field == "unitOfferingSlug":
            return _UO_SQL
        if field == "unitvariant_id":
            return _LABEL_ID_SQL["Unitvariant"]
        if field == "programme_slug_by_year":
            return "trim(psby)"
        return f"trim({field})"

    parts = []
    for key, cfg in _R.items():
        sf, ef = cfg["start_csv_field"], cfg["end_csv_field"]
        pred = cfg.get("relationship_type", key)
        slbl, elbl = cfg["start_node_type"], cfg["end_node_type"]
        pj, src_cols = _props_json_sql(cfg)
        if ef == "threads":
            # array endpoint; props are constant → DISTINCT suffices
            cand = (
                f"SELECT DISTINCT s, it.thread_slug AS e, {pj} AS props_json "
                f"FROM ("
                f"SELECT {end_expr(sf)} AS s, "
                f"unnest(json_transform(replace(threads, chr(39), chr(34)), "
                f"{_THREAD_STRUCT})) AS it "
                f"FROM widex WHERE threads IS NOT NULL AND threads LIKE '[%' "
                f"AND {end_expr(sf)} IS NOT NULL AND trim({end_expr(sf)}) <> '') "
                f"WHERE it.thread_slug IS NOT NULL AND trim(it.thread_slug) <> ''"
            )
        else:
            s, e = end_expr(sf), end_expr(ef)
            if src_cols:
                # first-seen winner per (s, e) in consolidated row order
                sel_srcs = ", ".join(sorted(set(src_cols)))
                cand = (
                    f"SELECT s, e, {pj} AS props_json FROM ("
                    f"SELECT {s} AS s, {e} AS e, {sel_srcs}, "
                    f"row_number() OVER (PARTITION BY {s}, {e} "
                    f"ORDER BY _row_seq, _psby_pos, _sup_seq, _sup_pos) AS rn "
                    f"FROM widex "
                    f"WHERE {s} IS NOT NULL AND trim({s}) <> '' "
                    f"AND {e} IS NOT NULL AND trim({e}) <> '') "
                    f"WHERE rn = 1"
                )
            else:
                cand = (
                    f"SELECT DISTINCT {s} AS s, {e} AS e, {pj} AS props_json "
                    f"FROM widex "
                    f"WHERE {s} IS NOT NULL AND trim({s}) <> '' "
                    f"AND {e} IS NOT NULL AND trim({e}) <> ''"
                )
        parts.append(
            f"SELECT '{key}' AS config_key, '{pred}' AS pred, "
            f"c.s AS subj, c.e AS obj, "
            f"'{slbl}' AS subj_label, '{elbl}' AS obj_label, "
            f"c.props_json FROM ({cand}) c "
            f"WHERE c.s IN (SELECT id FROM dim_{slbl}) "
            f"AND c.e IN (SELECT id FROM dim_{elbl})"
        )
    u = "\nUNION ALL\n".join(parts)
    return (
        f"{_kg99_base_sql()},\n" + ",\n".join(dims) + f"\n{u}"
    )


KG99_SQL = _kg99_sql()

ORACLES = {
    "kg118_legacy_graph_diff": _kg118_sql(),
    "kg120_pred_cooccurrence": _kg120_sql(),
    "kg117_label_isolation": _kg117_sql(),
    "kg114_slug_collapse": KG114_SQL,
    "kg116_crossmodal_consistency": _kg116_sql(),
    "kg30_reconstruct_wide": KG30_SQL,
    "kg31_span_fingerprint": KG31_SQL,
    "kg32_media_assets": KG32_SQL,
    "kg94_media_alignment": KG94_SQL,
    "kg33_unit_nodes": KG33_SQL,
    "kg34_has_lesson_triples": KG34_SQL,
    "kg35_thread_nodes": KG35_SQL,
    "kg36_node_histogram": KG36_SQL,
    "kg37_edge_histogram": KG37_SQL,
    "kg40_media_features": KG40_SQL,
    "kg41_frame_samples": KG41_SQL,
    "kg42_media_embedding_neardup": _kg42_sql(),
    "kg83_scene_cuts": KG83_SQL,
    "kg85_subset_growth": _kg85_sql(),
    # kg99: the COMPLETE flagship stream incl. rendered props — also
    # golden-tested against the pure-Python reference oracle
    # (tests/test_golden_graph.py, exact equality / P=R=1.0)
    "kg99_flagship": KG99_SQL,
}
