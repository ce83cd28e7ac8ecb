"""Graph-analytics query surface: connected-components canonicalization
and mention linking (north_rule stages K and L).

DuckDB oracles re-derive each result independently — the CC oracle is a
recursive-CTE transitive closure (small graphs only; the Spark side is
the scale path), the linking oracle re-extracts mentions with DuckDB's
regexp engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.components import (
    connected_components,
    strongly_connected_components,
)
from ..operators.linking import (
    extract_mentions,
    link_candidates,
    link_mentions,
)
from ..operators.mapper import node_dims
from .common import load, r4
from .kg import _KV_SQL, ORACLE_DOCS, _wide, docs_df

# --------------------------------------------------------------------------
# q32 — generic connected components over a lineitem-derived bipartite
# graph (order ↔ part). Oracle: recursive-CTE transitive closure.
# --------------------------------------------------------------------------


def q32_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return connected_components(e0, max_iter=30)


Q32_SQL = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
                  'p' || CAST(l_partkey AS VARCHAR) AS dst
  FROM lineitem WHERE l_partkey % 50 = 0
), edges AS (
  SELECT src AS n, dst AS m FROM e0
  UNION
  SELECT dst AS n, src AS m FROM e0
), reach(n, m) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n
)
SELECT n AS id, min(m) AS canonical_id FROM reach GROUP BY n
"""


# --------------------------------------------------------------------------
# kg38 — entity canonicalization over the co-mention similarity graph:
# units and threads mentioned in the same document are similarity-linked;
# connected components give each cluster one canonical id (north_rule
# stage K over a real similarity-edge DataFrame).
# --------------------------------------------------------------------------


def kg38_comention_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = extract_mentions(docs_df(spark, sf_dir))
    units = m.filter(F.col("label") == "Unit").select(
        "doc_id", F.col("mention").alias("src")
    )
    threads = m.filter(F.col("label") == "Thread").select(
        "doc_id", F.col("mention").alias("dst")
    )
    edges = units.join(threads, on="doc_id").select("src", "dst").distinct()
    return connected_components(edges, max_iter=30)


KG38_SQL = (
    _KV_SQL.replace("\n  WITH sp AS", "\nWITH RECURSIVE sp AS")
    + """,
um AS (
  SELECT doc_id, unnest(regexp_extract_all(v, 'unit-[a-z]+-[0-9]{4}')) AS u
  FROM kv WHERE kind = 'text'
), tm AS (
  SELECT doc_id, unnest(regexp_extract_all(v, 'thread-[0-9]{3}')) AS t
  FROM kv WHERE kind = 'text'
), e0 AS (
  SELECT DISTINCT um.u AS src, tm.t AS dst FROM um JOIN tm USING (doc_id)
), edges AS (
  SELECT src AS n, dst AS m FROM e0
  UNION
  SELECT dst AS n, src AS m FROM e0
), reach(n, m) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n
)
SELECT n AS id, min(m) AS canonical_id FROM reach GROUP BY n
"""
)


# --------------------------------------------------------------------------
# kg39 — mention detection + broadcast-dictionary linking: every unit /
# thread mention in prose spans, flagged by whether the KG's entity
# dictionary resolves it (north_rule stage L).
# --------------------------------------------------------------------------


def kg39_mention_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..config.curriculum_schema import NODES

    gb = _wide(spark, sf_dir)
    m = extract_mentions(docs_df(spark, sf_dir))
    dims = node_dims(gb.wide, NODES, spark).filter(
        F.col("label").isin("Unit", "Thread")
    )
    return link_mentions(m, dims)


def _mention_dict_sql() -> str:
    """Shared oracle chain: spans → kv → wide → mention stream +
    (Unit ∪ Thread) entity dictionary. Ends at the ``dict`` CTE so
    kg39 (exact links) and kg87 (fuzzy candidates) twin from the same
    independently-derived dictionary."""
    from .kg import _wide_sql

    wide = _wide_sql(
        ["is_legacy", "unit_slug", "programme_slug_by_year"], "primary"
    )
    return f"""
{_KV_SQL},
{wide},
mention AS (
  SELECT doc_id, 'Unit' AS label,
         unnest(regexp_extract_all(v, 'unit-[a-z]+-[0-9]{{4}}')) AS mention
  FROM kv WHERE kind = 'text'
  UNION ALL
  SELECT doc_id, 'Thread' AS label,
         unnest(regexp_extract_all(v, 'thread-[0-9]{{3}}')) AS mention
  FROM kv WHERE kind = 'text'
),
unit_dict AS (
  SELECT DISTINCT 'Unit' AS label, unit_slug AS nid FROM wide
  WHERE is_legacy = 'False' AND unit_slug IS NOT NULL AND trim(unit_slug) <> ''
),
prim_x AS (
  SELECT unit_slug,
         unnest(CASE WHEN programme_slug_by_year LIKE '[%'
                     THEN json_transform(programme_slug_by_year, '["VARCHAR"]')
                     ELSE [programme_slug_by_year] END) AS psby
  FROM wide WHERE is_legacy = 'False'
),
supw AS (
  SELECT doc_id,
         MAX(CASE WHEN k = 'unit_slug' THEN v END) AS unit_slug,
         MAX(CASE WHEN k = 'programme_slug_by_year' THEN v END) AS psby_raw,
         MAX(CASE WHEN k = 'threads' THEN v END) AS threads
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
thread_dict AS (
  SELECT DISTINCT 'Thread' AS label, it.thread_slug AS nid
  FROM (
    SELECT unnest(json_transform(replace(threads, chr(39), chr(34)),
      '[{{"thread_slug":"VARCHAR","thread_id":"BIGINT","thread_title":"VARCHAR"}}]')) AS it
    FROM matched
  )
  WHERE it.thread_slug IS NOT NULL AND trim(it.thread_slug) <> ''
),
dict AS (SELECT * FROM unit_dict UNION ALL SELECT * FROM thread_dict)"""


def _kg39_sql() -> str:
    return (
        _mention_dict_sql()
        + """
SELECT m.doc_id, m.label, m.mention,
       (d.nid IS NOT NULL) AS linked
FROM mention m LEFT JOIN dict d ON m.label = d.label AND m.mention = d.nid
"""
    )


def kg87_candidate_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy candidate entity linking (north_star stage L, the
    "candidate" half): every distinct prose mention is corrupted by a
    deterministic single-character deletion at position
    (length % 5) + 2 — a reproducible typo model both engines can
    derive — then re-linked against the broadcast entity dictionary
    via the SymSpell deletion-neighborhood join + levenshtein rerank
    (operators/linking.py:link_candidates). Output is each noisy
    mention's best candidate (ties by nid); a value match checks the
    blocking is complete AND the rerank is exact."""
    from ..config.curriculum_schema import NODES

    gb = _wide(spark, sf_dir)
    m = (
        extract_mentions(docs_df(spark, sf_dir))
        .select("doc_id", "label", "mention")
        .distinct()
    )
    p = (F.length("mention") % F.lit(5)) + F.lit(2)
    noisy = m.select(
        "doc_id",
        "label",
        F.concat(
            F.substr(F.col("mention"), F.lit(1), p - 1),
            F.substr(F.col("mention"), p + 1, F.length("mention")),
        ).alias("mention"),
    ).distinct()
    dims = node_dims(gb.wide, NODES, spark).filter(
        F.col("label").isin("Unit", "Thread")
    )
    return link_candidates(noisy, dims, max_edit=1, top_k=1).select(
        "doc_id", "label", "mention", "nid", "dist"
    )


def _noisy_cand_sql(top_k: int) -> str:
    """Shared fuzzy-candidate oracle chain: dictionary → deterministic
    single-deletion noisy mentions → deletion-variant block join →
    levenshtein rerank. Ends at the ``ranked`` CTE (rn ≤ top_k) so kg87
    (best candidate per mention) and kg88 (similarity-edge
    canonicalization) twin from the same candidate stream."""
    return (
        _mention_dict_sql()
        + f""",
noisy AS (
  SELECT DISTINCT doc_id, label,
         substr(mention, 1, (length(mention) % 5) + 1)
           || substr(mention, (length(mention) % 5) + 3) AS mention
  FROM (SELECT DISTINCT doc_id, label, mention FROM mention)
),
ser AS (
  -- DuckDB's generate_series table function rejects lateral column
  -- args and subquery bounds; cross-join a constant-bounded series
  -- (slug mentions are far shorter than 512) and filter per-row
  SELECT g.i FROM generate_series(1, 512) AS g(i)
),
mvar AS (
  SELECT doc_id, label, mention, mention AS variant FROM noisy
  UNION
  SELECT n.doc_id, n.label, n.mention,
         substr(n.mention, 1, g.i - 1) || substr(n.mention, g.i + 1)
  FROM noisy n JOIN ser g ON g.i <= length(n.mention)
),
dvar AS (
  SELECT label, nid, nid AS variant FROM dict
  UNION
  SELECT d.label, d.nid,
         substr(d.nid, 1, g.i - 1) || substr(d.nid, g.i + 1)
  FROM dict d JOIN ser g ON g.i <= length(d.nid)
),
cand AS (
  SELECT DISTINCT m.doc_id, m.label, m.mention, d.nid
  FROM mvar m JOIN dvar d ON m.label = d.label AND m.variant = d.variant
),
scored AS (
  SELECT doc_id, label, mention, nid,
         CAST(levenshtein(mention, nid) AS BIGINT) AS dist
  FROM cand WHERE levenshtein(mention, nid) <= 1
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id, label, mention ORDER BY dist, nid) AS rn
    FROM scored
  ) WHERE rn <= {top_k}
)"""
    )


def _kg87_sql() -> str:
    return (
        _noisy_cand_sql(1)
        + """
SELECT doc_id, label, mention, nid, dist FROM topk
"""
    )


def kg88_er_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity canonicalization over the fuzzy-candidate similarity
    graph — the north_star's stage-L→K composition end-to-end: noisy
    mentions (kg87's deterministic typo model) link to their ≤10 best
    dictionary candidates at edit distance ≤ 1; each (mention, entry)
    candidate pair becomes an undirected similarity edge; salted
    connected components assign every surface form and dictionary
    entry in a cluster one canonical id. Near-identical dictionary
    entries (e.g. thread slugs one deletion apart) collapse into the
    same component via shared noisy surface forms — exactly the
    duplicate-entity absorption ER needs. Node ids are prefixed m:/e:
    so surface forms and entries stay distinguishable in the output."""
    from ..config.curriculum_schema import NODES

    gb = _wide(spark, sf_dir)
    m = (
        extract_mentions(docs_df(spark, sf_dir))
        .select("label", "mention")
        .distinct()
    )
    p = (F.length("mention") % F.lit(5)) + F.lit(2)
    noisy = m.select(
        F.lit("x").alias("doc_id"),
        "label",
        F.concat(
            F.substr(F.col("mention"), F.lit(1), p - 1),
            F.substr(F.col("mention"), p + 1, F.length("mention")),
        ).alias("mention"),
    ).distinct()
    dims = node_dims(gb.wide, NODES, spark).filter(
        F.col("label").isin("Unit", "Thread")
    )
    edges = (
        link_candidates(noisy, dims, max_edit=1, top_k=10)
        .select(
            F.concat(F.lit("m:"), "mention").alias("src"),
            F.concat(F.lit("e:"), "nid").alias("dst"),
        )
        .distinct()
    )
    return connected_components(edges, max_iter=30, salt=4)


def _kg88_sql() -> str:
    return (
        _noisy_cand_sql(10).replace(
            "  WITH sp AS", "WITH RECURSIVE sp AS", 1
        )
        + """,
e0 AS (
  SELECT DISTINCT 'm:' || mention AS src, 'e:' || nid AS dst FROM topk
),
edges AS (
  SELECT src AS n, dst AS m FROM e0
  UNION
  SELECT dst AS n, src AS m FROM e0
),
reach(n, m) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM edges)
  UNION
  SELECT e.n, r.m FROM edges e JOIN reach r ON e.m = r.n
)
SELECT n AS id, min(m) AS canonical_id FROM reach GROUP BY n
"""
    )


def kg89_linking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-linking QUALITY eval — the tuning loop for stage L: every
    gold surface form (a prose mention that exactly matches a dictionary
    entry) is corrupted by kg87's deterministic single-deletion typo
    model, fuzzy-linked back (top-10 candidates), and scored by whether
    / where the original entry ranks: per label hits@1/3/10 and MRR
    (missed golds contribute 0). The candidate group key is the gold
    form itself, so each gold ranks against exactly its own noisy
    form's candidates. All joins are against the broadcast dictionary;
    the per-gold rank window partitions on the gold key (never global).
    MRR is an average of small rationals rounded at 6dp (sum-order
    tolerant, same rendering as kg80).

    On slug vocabularies the expected score IS saturation (hits@1 ==
    n_gold, MRR 1.0): no other entry sits within edit distance 1 of a
    corrupted slug. That makes this a recall CERTIFICATE — any value
    below 1.0 means the deletion-neighborhood blocking dropped a true
    candidate or the rerank misordered an exact tie (q111's
    no-false-negative bloom proof is the same pattern); kg90 is the
    discriminative ranking eval."""
    from ..config.curriculum_schema import NODES

    gb = _wide(spark, sf_dir)
    dims = node_dims(gb.wide, NODES, spark).filter(
        F.col("label").isin("Unit", "Thread")
    )
    m = (
        extract_mentions(docs_df(spark, sf_dir))
        .select("label", "mention")
        .distinct()
    )
    gold = m.join(
        dims.select("label", F.col("nid").alias("mention")).distinct(),
        ["label", "mention"],
    )
    p = (F.length("mention") % F.lit(5)) + F.lit(2)
    noisy = gold.select(
        F.col("mention").alias("doc_id"),
        "label",
        F.concat(
            F.substr(F.col("mention"), F.lit(1), p - 1),
            F.substr(F.col("mention"), p + 1, F.length("mention")),
        ).alias("mention"),
    )
    correct = (
        link_candidates(noisy, dims, max_edit=1, top_k=10)
        .filter(F.col("nid") == F.col("doc_id"))
        .select(F.col("doc_id").alias("gold_nid"), "label", "rank")
    )
    ev = gold.select(F.col("mention").alias("gold_nid"), "label").join(
        correct, ["gold_nid", "label"], "left"
    )
    return ev.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"),
        F.count_if(F.col("rank") == 1).cast("long").alias("hits1"),
        F.count_if(F.col("rank") <= 3).cast("long").alias("hits3"),
        F.count_if(F.col("rank").isNotNull()).cast("long").alias("hits10"),
        F.round(
            F.avg(F.coalesce(F.lit(1.0) / F.col("rank"), F.lit(0.0))), 6
        ).alias("mrr"),
    )


def _kg89_sql() -> str:
    return (
        _mention_dict_sql()
        + """,
orig AS (SELECT DISTINCT label, mention FROM mention),
gold AS (
  SELECT o.label, o.mention
  FROM orig o JOIN dict d ON o.label = d.label AND o.mention = d.nid
),
noisy AS (
  SELECT label, mention AS gold_nid,
         substr(mention, 1, (length(mention) % 5) + 1)
           || substr(mention, (length(mention) % 5) + 3) AS mention
  FROM gold
),
ser AS (SELECT g.i FROM generate_series(1, 512) AS g(i)),
mvar AS (
  SELECT gold_nid, label, mention, mention AS variant FROM noisy
  UNION
  SELECT n.gold_nid, n.label, n.mention,
         substr(n.mention, 1, g.i - 1) || substr(n.mention, g.i + 1)
  FROM noisy n JOIN ser g ON g.i <= length(n.mention)
),
dvar AS (
  SELECT label, nid, nid AS variant FROM dict
  UNION
  SELECT d.label, d.nid,
         substr(d.nid, 1, g.i - 1) || substr(d.nid, g.i + 1)
  FROM dict d JOIN ser g ON g.i <= length(d.nid)
),
cand AS (
  SELECT DISTINCT m.gold_nid, m.label, m.mention, d.nid
  FROM mvar m JOIN dvar d ON m.label = d.label AND m.variant = d.variant
),
scored AS (
  SELECT gold_nid, label, mention, nid,
         CAST(levenshtein(mention, nid) AS BIGINT) AS dist
  FROM cand WHERE levenshtein(mention, nid) <= 1
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY gold_nid, label, mention ORDER BY dist, nid) AS rn
    FROM scored
  ) WHERE rn <= 10
),
correct AS (
  SELECT g.label, g.mention AS gold_nid, t.rn
  FROM gold g LEFT JOIN topk t
    ON t.gold_nid = g.mention AND t.label = g.label AND t.nid = g.mention
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_gold,
       CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS hits1,
       CAST(COUNT(*) FILTER (WHERE rn <= 3) AS BIGINT) AS hits3,
       CAST(COUNT(*) FILTER (WHERE rn IS NOT NULL) AS BIGINT) AS hits10,
       ROUND(AVG(COALESCE(CAST(1 AS DOUBLE) / rn, 0)), 6) AS mrr
FROM correct GROUP BY label
"""
    )


def kg93_blocking_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER BLOCKING-QUALITY metrics (Christen's pair measures) — the
    complement of kg89: where kg89 certifies pair COMPLETENESS (the
    deletion-neighborhood block never misses a true candidate), this
    measures pair EFFICIENCY — per label, how much of the naive
    |mentions| × |entries| theta-join the block eliminates
    (reduction_ratio) and what fraction of surviving pairs the exact
    levenshtein rerank keeps (block_precision). These two numbers ARE
    the blocking-tuning loop a production linker runs: a block with
    low reduction ratio shuffles too many candidates at 10^12 rows; a
    block with low precision wastes rerank compute. All counts are
    exact integers; the two ratios are single divisions of identical
    longs, so the 6dp rendering is bit-portable."""
    from ..config.curriculum_schema import NODES
    from ..operators.linking import block_candidates

    gb = _wide(spark, sf_dir)
    dims = node_dims(gb.wide, NODES, spark).filter(
        F.col("label").isin("Unit", "Thread")
    )
    m = (
        extract_mentions(docs_df(spark, sf_dir))
        .select("label", "mention")
        .distinct()
    )
    p = (F.length("mention") % F.lit(5)) + F.lit(2)
    noisy = m.select(
        "label",
        F.concat(
            F.substr(F.col("mention"), F.lit(1), p - 1),
            F.substr(F.col("mention"), p + 1, F.length("mention")),
        ).alias("mention"),
    ).distinct()
    blk = block_candidates(
        noisy.withColumn("doc_id", F.lit("x")), dims
    )
    mm = noisy.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions")
    )
    dd = (
        dims.select("label", "nid")
        .distinct()
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_entries"))
    )
    bb = blk.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_block_pairs"),
        F.count_if(F.levenshtein("mention", "nid") <= 1)
        .cast("long")
        .alias("n_true_pairs"),
    )
    return (
        mm.join(dd, "label")
        .join(bb, "label")
        .select(
            "label",
            "n_mentions",
            "n_entries",
            (F.col("n_mentions") * F.col("n_entries"))
            .cast("long")
            .alias("n_cross_pairs"),
            "n_block_pairs",
            "n_true_pairs",
            F.round(
                1
                - F.col("n_block_pairs")
                / (F.col("n_mentions") * F.col("n_entries")),
                6,
            ).alias("reduction_ratio"),
            F.round(
                F.col("n_true_pairs") / F.col("n_block_pairs"), 6
            ).alias("block_precision"),
        )
    )


def _kg93_sql() -> str:
    return (
        _mention_dict_sql()
        + """,
orig AS (SELECT DISTINCT label, mention FROM mention),
noisy AS (
  SELECT DISTINCT label,
         substr(mention, 1, (length(mention) % 5) + 1)
           || substr(mention, (length(mention) % 5) + 3) AS mention
  FROM orig
),
ser AS (SELECT g.i FROM generate_series(1, 512) AS g(i)),
mvar AS (
  SELECT label, mention, mention AS variant FROM noisy
  UNION
  SELECT n.label, n.mention,
         substr(n.mention, 1, g.i - 1) || substr(n.mention, g.i + 1)
  FROM noisy n JOIN ser g ON g.i <= length(n.mention)
),
dvar AS (
  SELECT label, nid, nid AS variant FROM dict
  UNION
  SELECT d.label, d.nid,
         substr(d.nid, 1, g.i - 1) || substr(d.nid, g.i + 1)
  FROM dict d JOIN ser g ON g.i <= length(d.nid)
),
blk AS (
  SELECT DISTINCT m.label, m.mention, d.nid
  FROM mvar m JOIN dvar d ON m.label = d.label AND m.variant = d.variant
),
mm AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_mentions
  FROM noisy GROUP BY label
),
dd AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_entries
  FROM dict GROUP BY label
),
bb AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_block_pairs,
         CAST(COUNT(*) FILTER (WHERE levenshtein(mention, nid) <= 1)
              AS BIGINT) AS n_true_pairs
  FROM blk GROUP BY label
)
SELECT mm.label, n_mentions, n_entries,
       n_mentions * n_entries AS n_cross_pairs,
       n_block_pairs, n_true_pairs,
       ROUND(1 - CAST(n_block_pairs AS DOUBLE)
                 / CAST(n_mentions * n_entries AS DOUBLE), 6)
         AS reduction_ratio,
       ROUND(CAST(n_true_pairs AS DOUBLE) / CAST(n_block_pairs AS DOUBLE), 6)
         AS block_precision
FROM mm JOIN dd ON mm.label = dd.label JOIN bb ON mm.label = bb.label
"""
    )


# --------------------------------------------------------------------------
# kg64 — out-degree distribution of the resolved curriculum graph, per
# relationship type (documented "Analysis Queries" family,
# oak_curriculum_graph_documentation.md:1193+). Oracle shares kg37's
# independently-derived `edges` union, so a value match re-checks the
# whole construction stack at per-node granularity.
# --------------------------------------------------------------------------


def kg64_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    deg = gb.resolved.groupBy("pred", "subj").agg(
        F.count("*").alias("outdeg")
    )
    return (
        deg.groupBy("pred", "outdeg")
        .agg(F.count("*").alias("n_nodes"))
        .select("pred", F.col("outdeg").cast("long").alias("outdeg"), "n_nodes")
    )


def _kg64_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
deg AS (
  SELECT pred, subj, CAST(COUNT(*) AS BIGINT) AS outdeg
  FROM edges GROUP BY pred, subj
)
SELECT pred, outdeg, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY pred, outdeg
"""


# --------------------------------------------------------------------------
# kg65 — PageRank over the resolved curriculum graph: fixed 8 iterations,
# damping 0.85, dangling mass redistributed uniformly (the full classic
# formulation, not the no-dangling shortcut). Spark side is the standard
# Pregel-on-DataFrames shape; the oracle is the same recurrence unrolled
# into one CTE pair per iteration over kg37's independent `edges` union.
# --------------------------------------------------------------------------

_PR_ITERS = 8
_PR_D = 0.85


def kg65_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale posture: `base` (vertex, outdeg) and `edges` are each
    repartitioned ON THE JOIN KEY once and persisted, so every
    iteration's contribution join and rank rebuild reuse the same
    partitioning — per iteration the only new exchange is the
    groupBy(obj) combine. Lineage is cut every round with an eager
    localCheckpoint (components.py does the same); the dangling-mass
    scalar stays a lazy broadcast 1-row aggregate, never a driver
    collect."""
    gb = _wide(spark, sf_dir)
    edges = (
        gb.resolved.select("subj", "obj")
        .distinct()
        .repartition("subj")
        .persist()
    )
    verts = (
        edges.select(F.col("subj").alias("id"))
        .union(edges.select(F.col("obj").alias("id")))
        .distinct()
    )
    outdeg = edges.groupBy("subj").agg(F.count("*").alias("outdeg"))
    base = (
        verts.join(outdeg, verts.id == outdeg.subj, "left")
        .select("id", "outdeg")
        .repartition("id")
        .persist()
    )
    n = base.count()
    if n == 0:  # empty graph: no vertices, no ranks (oracle: 0 rows)
        edges.unpersist()
        base.unpersist()
        return spark.createDataFrame([], "id string, rank double")
    ranks = base.select("id", "outdeg", (F.lit(1.0) / n).alias("rank"))
    for _ in range(_PR_ITERS):
        dang = ranks.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            edges.join(
                ranks.select(F.col("id").alias("_sid"), "rank", "outdeg"),
                edges.subj == F.col("_sid"),
            )
            .groupBy(F.col("obj").alias("_cid"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            base.join(contrib, base.id == F.col("_cid"), "left")
            .crossJoin(F.broadcast(dang))
            .select(
                base.id,
                base.outdeg,
                (
                    F.lit((1.0 - _PR_D) / n)
                    + _PR_D * (F.coalesce("c", F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    out = ranks.select("id", F.round("rank", 8).alias("rank"))
    edges.unpersist()
    base.unpersist()
    return out


def _kg65_sql(iters: int = _PR_ITERS, d: float = _PR_D) -> str:
    from .kg import _edges_union_sql

    steps = [
        """
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
verts AS MATERIALIZED (SELECT subj AS id FROM e UNION SELECT obj FROM e),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
deg AS MATERIALIZED (SELECT subj AS id, CAST(COUNT(*) AS DOUBLE) AS outdeg
        FROM e GROUP BY subj),
r0 AS MATERIALIZED (SELECT id, (SELECT 1.0/n FROM nn) AS r FROM verts)"""
    ]
    dd = f"CAST({d} AS DOUBLE)"
    for k in range(1, iters + 1):
        p = k - 1
        steps.append(
            f"""
d{k} AS (SELECT COALESCE(SUM(r), 0) AS m FROM r{p}
         WHERE id NOT IN (SELECT id FROM deg)),
c{k} AS (SELECT e.obj AS id, SUM(p.r / deg.outdeg) AS c
         FROM e JOIN r{p} p ON e.subj = p.id JOIN deg ON deg.id = p.id
         GROUP BY e.obj),
r{k} AS MATERIALIZED (SELECT v.id,
                (SELECT (1 - {dd})/n FROM nn)
                + {dd} * (COALESCE(c.c, 0)
                          + (SELECT m FROM d{k}) / (SELECT n FROM nn)) AS r
         FROM verts v LEFT JOIN c{k} c ON c.id = v.id)"""
        )
    return (
        f"{_edges_union_sql()},\n"
        + ",".join(steps)
        + f"\nSELECT id, round(r, 8) AS rank FROM r{iters}"
    )


# --------------------------------------------------------------------------
# kg66 — BFS depth: minimum hop distance of every reachable node from
# the graph's source nodes (nodes with no in-edge — Phase/Subject/Tier/
# Examboard in the curriculum hierarchy). The Spark side is a frontier
# loop: per round ONE join frontier⋈edges + an anti-join against the
# settled set; first visit = minimum depth by BFS order, so no
# per-round min-aggregate is needed. Rounds are bounded by graph depth
# (~7 here), each round localCheckpoints to cut lineage, and the empty
# check is limit(1)-guarded. The DuckDB twin is a WITH RECURSIVE
# unfolding over the independently-derived `edges` union — checking an
# iterative DataFrame algorithm against a recursive-SQL engine.
# --------------------------------------------------------------------------

_BFS_MAX_DEPTH = 20


def kg66_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    roots = (
        e.select("subj")
        .distinct()
        .join(e.select(F.col("obj").alias("subj")).distinct(), "subj", "left_anti")
        .select(F.col("subj").alias("id"))
    )
    dist = roots.select("id", F.lit(0).cast("long").alias("depth")).localCheckpoint()
    frontier = dist.select("id")
    for d in range(1, _BFS_MAX_DEPTH + 1):
        nxt = (
            e.join(frontier, e.subj == frontier.id)
            .select(F.col("obj").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(
            nxt.select("id", F.lit(d).cast("long").alias("depth"))
        ).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return dist


def _kg66_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
roots AS (SELECT DISTINCT subj AS id FROM e
          WHERE subj NOT IN (SELECT obj FROM e)),
bfs AS (
  SELECT id, 0 AS depth FROM roots
  UNION
  SELECT e.obj, b.depth + 1 FROM e JOIN bfs b ON e.subj = b.id
  WHERE b.depth < {_BFS_MAX_DEPTH}
)
SELECT id, CAST(MIN(depth) AS BIGINT) AS depth FROM bfs GROUP BY id
"""


# --------------------------------------------------------------------------
# kg67 — orphan-node detection per label: the reference's post-import
# integrity check (scripts/validate_neo4j_import.py:236-319 counts
# nodes with no relationships). A node is an orphan when its (label,
# id) appears at neither end of any resolved edge. Spark: the node set
# comes from gb.nodes (13 extraction plans), endpoints from the
# resolved triple stream — one union + one anti-join + one count agg,
# a single pass regardless of label count. The oracle re-derives node
# sets from the per-label distinct-ID SQL and endpoints from the edges
# union, so a value match cross-checks node extraction AND edge
# resolution against each other.
# --------------------------------------------------------------------------


def kg67_orphan_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    nodes_all = None
    for label, df in gb.nodes.items():
        part = df.select(
            F.lit(label).alias("label"), F.col("id").cast("string").alias("id")
        )
        nodes_all = part if nodes_all is None else nodes_all.unionByName(part)
    endp = (
        gb.resolved.select(
            F.col("subj_label").alias("label"), F.col("subj").alias("id")
        )
        .unionByName(
            gb.resolved.select(
                F.col("obj_label").alias("label"), F.col("obj").alias("id")
            )
        )
        .distinct()
    )
    return (
        nodes_all.join(endp, ["label", "id"], "left_anti")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def _kg67_sql() -> str:
    from .kg import _LABEL_ID_SQL, _edges_union_sql, _ok

    parts = [
        f"SELECT '{label}' AS label, {expr} AS id FROM widex WHERE {_ok(expr)}"
        for label, expr in _LABEL_ID_SQL.items()
    ]
    parts.append(
        "SELECT 'Thread' AS label, it.thread_slug AS id FROM titems "
        f"WHERE {_ok('it.thread_slug')}"
    )
    parts.append("SELECT 'Schemaversion' AS label, 'v0.1.0-alpha' AS id")
    u = "\nUNION ALL\n".join(parts)
    return f"""
{_edges_union_sql()},
nodes_all AS (SELECT DISTINCT label, id FROM ({u})),
endp AS (
  SELECT subj_label AS label, subj AS id FROM edges
  UNION
  SELECT obj_label, obj FROM edges
)
SELECT n.label, CAST(COUNT(*) AS BIGINT) AS n_orphans
FROM nodes_all n
WHERE NOT EXISTS (SELECT 1 FROM endp e
                  WHERE e.label = n.label AND e.id = n.id)
GROUP BY n.label
"""


# --------------------------------------------------------------------------
# q51 — per-node triangle counting over the part co-occurrence graph
# (parts appearing in the same order are linked; the same shape as a
# doc co-citation or entity co-mention graph). The naive wedge join
# explodes quadratically at hub nodes — sum(deg²) — so the Spark side
# uses the standard degree-ordered orientation: every undirected edge
# is directed from its lower-(degree, id) endpoint to the higher one,
# which bounds every node's OUT-degree by O(sqrt(|E|)) and makes the
# wedge join sum(outdeg²) = O(|E|^1.5) worst-case — the plan that
# survives a hub-skewed graph at 100×. Each triangle {x,y,z} is then
# generated exactly once (as a wedge at its smallest-key vertex), no
# dedup pass needed. The oracle is the naive a<b<c three-way self-join
# — same triangles derived a completely different way.
# --------------------------------------------------------------------------


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-occurrence graph (canonical u < v): parts
    appearing in the same order are linked. One self-join on the order
    key; per-order fan-out is bounded by order size (≤ 7 lineitems)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    return (
        li.alias("a")
        .join(li.alias("b"), on="o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )


def q51_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_counts(_copurchase_edges(spark, sf_dir)).select(
        F.col("n").alias("part"), "n_triangles"
    )


def _orient(e: DataFrame) -> DataFrame:
    """Direct each canonical undirected edge (u < v) from its lower
    (deg, id) endpoint to the higher, keeping the dst's total-order key
    — the degree-ordered orientation that bounds out-degree by
    O(sqrt(|E|))."""
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    return (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(ku < kv, kv).otherwise(ku).alias("dst_key"),
        )
    )


def _tri(oriented: DataFrame) -> DataFrame:
    """Enumerate each triangle exactly once (as a wedge at its
    smallest-(deg, id) vertex, closed by an oriented edge)."""
    w1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("dst_key").alias("kb"),
    )
    w2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c"),
        F.col("dst_key").alias("kc"),
    )
    wedges = w1.join(w2, "a").filter(F.col("kb") < F.col("kc"))
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    return wedges.join(closing, ["b", "c"]).select("a", "b", "c")


def triangle_counts(e: DataFrame) -> DataFrame:
    """Per-node triangle counts over undirected canonical edges (u < v),
    as (n, n_triangles). Nodes in no triangle are absent."""
    oriented = _orient(e).persist()
    tri = _tri(oriented)
    nodes = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
    )
    out = nodes.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    oriented.unpersist()
    return out


Q51_SQL = """
WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS u, b.p AS v
      FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
nodes AS (
  SELECT a AS part FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY part
"""


# --------------------------------------------------------------------------
# q54 — k-core decomposition (fixed-round peeling): repeatedly strip
# nodes of degree < k until the k-core remains — the standard dense-
# subgraph extractor (spam rings, community seeds). Exact k-core is an
# iterate-to-fixpoint algorithm; both engines run the SAME fixed round
# count so the comparison is exact whether or not the fixpoint is
# reached (it is, within 10 rounds, at every tested SF — peeling depth
# grows like the graph's degeneracy ordering, not its size). Spark
# side: per round ONE degree agg + two semi-join filters, lineage cut
# with an eager localCheckpoint (the 10-round loop would otherwise
# stack 30 joins into one Catalyst tree). Oracle: the peeling
# recurrence unrolled into one CTE pair per round (kg65's PageRank
# pattern).
# --------------------------------------------------------------------------

# k picked where peeling actually cascades at the compare SF (sf0.01:
# min raw degree 42, 143 nodes peel at k=80, total collapse by k=85);
# both engines run the same fixed rounds so equality is exact even at
# SFs where the core is empty or nothing peels.
_KCORE_K = 80
_KCORE_ROUNDS = 10


def q54_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore(_copurchase_edges(spark, sf_dir)).select(
        F.col("n").alias("part"), "core_deg"
    )


def kcore(
    e: DataFrame, k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS
) -> DataFrame:
    """Fixed-round k-core peeling over undirected canonical edges
    (u < v), as (n, core_deg) for surviving nodes."""
    e = e.localCheckpoint()
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        good = deg.filter(F.col("deg") >= k).select("n")
        e = (
            e.join(good.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(good.withColumnRenamed("n", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
    return (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
    )


def _q54_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    steps = [
        """e0 AS MATERIALIZED (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) b
    ON a.o = b.o AND a.p < b.p)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        steps.append(
            f"""
d{r} AS (SELECT n, COUNT(*) AS deg
         FROM (SELECT u AS n FROM e{p} UNION ALL SELECT v FROM e{p})
         GROUP BY n),
g{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE deg >= {k}),
e{r} AS MATERIALIZED (SELECT u, v FROM e{p}
        WHERE u IN (SELECT n FROM g{r}) AND v IN (SELECT n FROM g{r}))"""
        )
    return (
        "WITH " + ",".join(steps) + f"""
SELECT part, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT u AS part FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
GROUP BY part
"""
    )


# --------------------------------------------------------------------------
# q55 — link prediction by Adamic-Adar score: for every non-adjacent
# node pair with ≥ 2 common neighbors, score = Σ_w 1/ln(deg(w)) over
# common neighbors w (rare shared neighbors count more). The wedge
# enumeration is quadratic in neighbor degree — sum(deg²) — so the
# graph is sparsified up front (parts ≡ 0 mod 5: ~1/25 of the edges)
# and at production scale the same op runs after a max-degree cap or
# on the degree-ordered orientation like q51. Scores are rounded to 6
# decimals on BOTH engines: the sum's addition order differs between
# Spark partial aggregation and DuckDB, so bit-exact equality is not
# defined — 6 decimals is far coarser than the ~1e-15 reordering
# noise. deg(w)=1 nodes cannot appear as common neighbors (a wedge
# needs two incident edges), so ln(deg) is never 0 in a scored row.
# --------------------------------------------------------------------------

_AA_MOD = 5


def q55_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % _AA_MOD == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(li.alias("y"), on="o")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
        .persist()
    )
    adj = e.select(F.col("u").alias("w"), F.col("v").alias("n")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    wa = adj.join(deg, "w")
    pairs = (
        wa.alias("x")
        .join(wa.alias("y"), on="w")
        .filter(F.col("x.n") < F.col("y.n"))
        .select(
            F.col("x.n").alias("a"),
            F.col("y.n").alias("c"),
            (F.lit(1.0) / F.log(F.col("x.d"))).alias("contrib"),
        )
    )
    cand = pairs.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")),
        ["a", "c"],
        "left_anti",
    )
    out = (
        cand.groupBy("a", "c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.round(F.sum("contrib"), 6).alias("aa_score"),
        )
        .filter(F.col("n_common") >= 2)
    )
    e.unpersist()
    return out


Q55_SQL = f"""
WITH pr AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_partkey % {_AA_MOD} = 0
), e AS (
  SELECT DISTINCT x.p AS u, y.p AS v
  FROM pr x JOIN pr y ON x.o = y.o AND x.p < y.p
), adj AS (
  SELECT u AS w, v AS n FROM e UNION ALL SELECT v AS w, u AS n FROM e
), deg AS (
  SELECT w, COUNT(*) AS d FROM adj GROUP BY w
), pairs AS (
  SELECT x.n AS a, y.n AS c,
         CAST(1 AS DOUBLE) / ln(deg.d) AS contrib
  FROM adj x
  JOIN adj y ON x.w = y.w AND x.n < y.n
  JOIN deg ON deg.w = x.w
)
SELECT a, c, CAST(COUNT(*) AS BIGINT) AS n_common,
       round(SUM(contrib), 6) AS aa_score
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = p.a AND e.v = p.c)
GROUP BY a, c
HAVING COUNT(*) >= 2
"""


# --------------------------------------------------------------------------
# q62 — weighted shortest paths (multi-source Bellman-Ford): min-cost
# distance from a source set over the sparsified co-occurrence graph,
# deterministic integer weights w = 1 + (u+v) mod 7. Both engines run
# the SAME fixed round count (8 relaxations), so results are exactly
# equal whether or not all shortest paths have converged — kg66's BFS
# contract generalized to weighted edges, and integer weights make
# every path cost exact (no float summation-order concern). Spark side:
# per round ONE join frontier-candidates + min-combine, lineage cut
# with localCheckpoint (components.py / q54 pattern). The oracle
# unrolls the relaxation recurrence d_k(v) = min(d_{k-1}(v),
# min_{(u,v)∈E} d_{k-1}(u) + w) into one CTE pair per round.
# --------------------------------------------------------------------------

_SP_MOD = 4  # sparsifier: parts ≡ 0 mod 4 participate (~1/16 of edges)
_SP_SRC = 100  # sources: parts ≡ 0 mod 100
_SP_ROUNDS = 8


def q62_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % _SP_MOD == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e0 = (
        li.alias("x")
        .join(li.alias("y"), on="o")
        .filter(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
    )
    w = (F.lit(1) + (F.col("u") + F.col("v")) % 7).cast("long").alias("w")
    edges = (
        e0.select("u", "v", w)
        .unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v"), w))
        .localCheckpoint()
    )
    dist = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
        .filter(F.col("id") % _SP_SRC == 0)
        .select("id", F.lit(0).cast("long").alias("d"))
        .localCheckpoint()
    )
    for _ in range(_SP_ROUNDS):
        cand = (
            edges.join(dist, edges.u == dist.id)
            .select(F.col("v").alias("id"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    return dist.select(F.col("id").alias("part"), F.col("d").alias("dist"))


def _q62_sql(rounds: int = _SP_ROUNDS) -> str:
    steps = [
        f"""li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
  WHERE l_partkey % {_SP_MOD} = 0
), e0 AS (
  SELECT DISTINCT x.p AS u, y.p AS v
  FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
), edges AS MATERIALIZED (
  SELECT u, v, CAST(1 + (u + v) % 7 AS BIGINT) AS w FROM e0
  UNION ALL
  SELECT v AS u, u AS v, CAST(1 + (u + v) % 7 AS BIGINT) AS w FROM e0
), d0 AS (
  SELECT id, CAST(0 AS BIGINT) AS d
  FROM (SELECT u AS id FROM edges UNION SELECT v FROM edges)
  WHERE id % {_SP_SRC} = 0
)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(
            f"""
d{k} AS MATERIALIZED (
  SELECT id, MIN(d) AS d FROM (
    SELECT id, d FROM d{p}
    UNION ALL
    SELECT e.v AS id, d{p}.d + e.w AS d
    FROM edges e JOIN d{p} ON e.u = d{p}.id
  ) GROUP BY id
)"""
        )
    return (
        "WITH " + ",".join(steps)
        + f"\nSELECT id AS part, d AS dist FROM d{rounds}"
    )


# --------------------------------------------------------------------------
# kg68 — span kind-transition matrix: bigram counts of span kinds in
# OFFSET order across the interleaved documents (text→media, media→
# field, …). This is the query that breaks if span ordering is ever
# lost — the per-row span-sequence invariant (kind, text, media_ref,
# order) the north_rule pins, aggregated corpus-wide. Spark side stays
# entirely inside the array: array_sort by offset + an index-zip
# transform produce the bigrams WITHOUT exploding to a per-span table
# or shuffling per doc_id — the only exchange is the final 9-cell
# groupBy. The oracle derives the same matrix the opposite way:
# unnest to rows, window LEAD over (doc_id ORDER BY offset).
# --------------------------------------------------------------------------


def kg68_span_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs_df(spark, sf_dir)
    sorted_spans = F.expr(
        "array_sort(spans, (l, r) -> CASE WHEN l.offset < r.offset THEN -1 "
        "WHEN l.offset > r.offset THEN 1 ELSE 0 END)"
    )
    pairs = F.expr(
        "transform(sequence(1, size(sp) - 1), "
        "i -> struct(sp[i-1].kind AS a, sp[i].kind AS b))"
    )
    return (
        d.select("doc_id", sorted_spans.alias("sp"))
        .filter(F.size("sp") >= 2)
        .select(F.explode(pairs).alias("t"))
        .groupBy(
            F.col("t.a").alias("kind_from"), F.col("t.b").alias("kind_to")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


def _kg68_sql() -> str:
    return f"""
WITH sp AS (
  SELECT doc_id, unnest(spans) AS s FROM '{ORACLE_DOCS}'
), seq AS (
  SELECT doc_id, s.kind AS kind,
         LEAD(s.kind) OVER (PARTITION BY doc_id ORDER BY s."offset") AS nxt
  FROM sp
)
SELECT kind AS kind_from, nxt AS kind_to,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE nxt IS NOT NULL GROUP BY kind, nxt
"""


# --------------------------------------------------------------------------
# q68 — label-propagation communities (synchronous LPA, fixed rounds).
# Complements connected components (q32) and PageRank (kg65) as the
# third canonicalization primitive the north_rule's stage-K family
# needs: where CC merges anything reachable, LPA splits dense regions
# into majority-vote communities. Deterministic variant: every round,
# each node adopts the most frequent label among its neighbours, ties
# broken by MIN label — so a fixed round count gives bit-identical
# results on any engine. Spark runs the rounds as hash-join + count +
# row_number plans with a localCheckpoint per round to cut lineage (the
# same posture as kcore/Bellman-Ford); at cluster scale each round is
# one shuffle on the node key and AQE handles hot labels. The oracle
# unrolls the identical recurrence as per-round CTEs.
# --------------------------------------------------------------------------

_LPA_ROUNDS = 4


def label_propagation(e0: DataFrame, rounds: int = _LPA_ROUNDS) -> DataFrame:
    """Synchronous deterministic LPA over undirected edges (src, dst):
    initial label = own id; each round every node adopts the most
    frequent neighbour label, ties broken by MIN label. Returns
    (id, community)."""
    from pyspark.sql import Window

    edges = (
        e0.select(F.col("src").alias("n"), F.col("dst").alias("m"))
        .unionAll(e0.select(F.col("dst").alias("n"), F.col("src").alias("m")))
        .localCheckpoint()
    )
    lab = edges.select("n").distinct().select("n", F.col("n").alias("lab"))
    w = Window.partitionBy("n").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(rounds):
        cnt = (
            edges.join(lab.select(F.col("n").alias("m"), "lab"), on="m")
            .groupBy("n", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("n", "lab")
            .localCheckpoint()
        )
    return lab.select(F.col("n").alias("id"), F.col("lab").alias("community"))


def q68_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return label_propagation(e0)


def _lpa_cte(rounds: int = _LPA_ROUNDS) -> str:
    """The LPA recurrence as a WITH-body (shared by q68 and q91)."""
    steps = [
        """e0 AS MATERIALIZED (
  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
                  'p' || CAST(l_partkey AS VARCHAR) AS dst
  FROM lineitem WHERE l_partkey % 50 = 0
), edges AS MATERIALIZED (
  SELECT src AS n, dst AS m FROM e0
  UNION ALL
  SELECT dst AS n, src AS m FROM e0
), l0 AS (SELECT DISTINCT n, n AS lab FROM edges)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        steps.append(
            f"""
c{r} AS (SELECT e.n AS n, l.lab AS lab, COUNT(*) AS c
         FROM edges e JOIN l{p} l ON e.m = l.n GROUP BY 1, 2),
l{r} AS MATERIALIZED (
  SELECT n, lab FROM (
    SELECT n, lab,
           ROW_NUMBER() OVER (PARTITION BY n ORDER BY c DESC, lab) AS rn
    FROM c{r}) WHERE rn = 1)"""
        )
    return "WITH " + ",".join(steps)


def _q68_sql(rounds: int = _LPA_ROUNDS) -> str:
    return (
        _lpa_cte(rounds)
        + f"\nSELECT n AS id, lab AS community FROM l{rounds}"
    )


# --------------------------------------------------------------------------
# q69 — neighbourhood Jaccard similarity: for part pairs co-occurring in
# at least one order, |orders(a) ∩ orders(b)| / |orders(a) ∪ orders(b)|.
# The entity-resolution scoring primitive behind the similarity-edge
# DataFrame stage-K consumes: candidate pairs come from the co-order
# self-join (never all-pairs — blocking by shared order), degrees join
# back from a one-pass aggregate. At scale the self-join shuffles on the
# order key (bounded fan-out per order) and degrees broadcast-join if
# the part dimension is small, else AQE shuffles.
# --------------------------------------------------------------------------


def q69_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 50 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = li.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    common = (
        li.alias("a")
        .join(li.alias("b"), on="o")
        .filter(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(deg.select(F.col("p").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("p").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            "u",
            "v",
            F.round(
                F.col("c") / (F.col("du") + F.col("dv") - F.col("c")), 6
            ).alias("jaccard"),
        )
    )


Q69_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 50 = 0
), deg AS (SELECT p, COUNT(*) AS d FROM op GROUP BY p),
com AS (
  SELECT a.p AS u, b.p AS v, COUNT(*) AS c
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
)
SELECT u, v,
       ROUND(CAST(c AS DOUBLE) / (du.d + dv.d - c), 6) AS jaccard
FROM com JOIN deg du ON com.u = du.p JOIN deg dv ON com.v = dv.p
"""


# --------------------------------------------------------------------------
# q91 — modularity of the LPA communities (the quantitative companion
# to q68: did the propagation find real structure?). Per community c:
# contribution = e_c/m − (Σdeg_c / 2m)², where e_c = edges inside c and
# m = total undirected edges. Pure integer bookkeeping until the final
# division, so both engines agree exactly; 6dp display rounding. At
# scale: two joins of the edge list against the (node→community) map —
# the same shuffle key as every LPA round, so the exchange is reused.
# --------------------------------------------------------------------------


def q91_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    lab = label_propagation(e0).withColumnRenamed("id", "n")
    edges_sym = e0.select(F.col("src").alias("n")).unionAll(
        e0.select(F.col("dst").alias("n"))
    )
    deg_sum = (
        edges_sym.join(lab, on="n")
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("deg_sum"))
    )
    internal = (
        e0.join(lab.select(F.col("n").alias("src"), F.col("community").alias("cs")), "src")
        .join(lab.select(F.col("n").alias("dst"), F.col("community").alias("cd")), "dst")
        .filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal"))
    )
    m = e0.agg(F.count(F.lit(1)).alias("_m"))
    sizes = lab.groupBy("community").agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        sizes.join(deg_sum, "community")
        .join(internal, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("internal", F.lit(0)).cast("long").alias("internal_edges"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            # + 0.0 collapses IEEE negative zero (a tiny negative
            # contribution rounds to -0.0 in DuckDB's float round while
            # Spark's BigDecimal round yields +0.0 — caught at sf0.1)
            (
                F.round(
                    F.coalesce("internal", F.lit(0)) / F.col("_m")
                    - F.pow(F.col("deg_sum") / (2.0 * F.col("_m")), 2),
                    6,
                )
                + F.lit(0.0)
            ).alias("contribution"),
        )
    )


def _q91_sql(rounds: int = _LPA_ROUNDS) -> str:
    return (
        _lpa_cte(rounds)
        + f""",
lab AS (SELECT n, lab AS community FROM l{rounds}),
mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM e0),
sizes AS (SELECT community, COUNT(*) AS n_nodes FROM lab GROUP BY 1),
ds AS (
  SELECT l.community, COUNT(*) AS deg_sum
  FROM (SELECT src AS n FROM e0 UNION ALL SELECT dst FROM e0) s
  JOIN lab l ON s.n = l.n GROUP BY 1),
intr AS (
  SELECT a.community, COUNT(*) AS internal
  FROM e0
  JOIN lab a ON e0.src = a.n
  JOIN lab b ON e0.dst = b.n AND a.community = b.community
  GROUP BY 1)
SELECT sizes.community,
       CAST(sizes.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(intr.internal, 0) AS BIGINT) AS internal_edges,
       CAST(ds.deg_sum AS BIGINT) AS deg_sum,
       ROUND(COALESCE(intr.internal, 0) / mm.m
             - POW(ds.deg_sum / (2.0 * mm.m), 2), 6) + 0.0 AS contribution
FROM sizes
JOIN ds ON sizes.community = ds.community
LEFT JOIN intr ON sizes.community = intr.community
CROSS JOIN mm
"""
    )


# --------------------------------------------------------------------------
# kg71 — PERSONALIZED PageRank: teleportation restricted to a seed set
# (the keystage nodes) instead of uniform — "importance relative to
# keystages", the recommendation/expansion primitive (seed a query's
# entities, rank the graph around them). Same plan posture as kg65
# (repartitioned+persisted base/edges reused every round, lazy
# broadcast dangling-mass scalar, per-round localCheckpoint); only the
# teleport vector changes: (1−d)·1_S/|S| + d·dang/|S| lands on seeds
# only. Seeds that are curriculum hubs make the mass concentrate
# downstream of keystages — kg65's uniform variant is the control.
# --------------------------------------------------------------------------


def kg71_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    edges = (
        gb.resolved.select("subj", "obj")
        .distinct()
        .repartition("subj")
        .persist()
    )
    verts = (
        edges.select(F.col("subj").alias("id"))
        .union(edges.select(F.col("obj").alias("id")))
        .distinct()
    )
    outdeg = edges.groupBy("subj").agg(F.count("*").alias("outdeg"))
    is_seed = F.col("id").startswith("ks")
    base = (
        verts.join(outdeg, verts.id == outdeg.subj, "left")
        .select("id", "outdeg", is_seed.alias("seed"))
        .repartition("id")
        .persist()
    )
    n_seed = base.filter("seed").count()
    # seedless graph (or empty input): the seed WHEN branch never
    # matches, so the divisor is never read — clamping it to 1 avoids
    # the driver-side ZeroDivisionError (deg_empty sweep, round 5)
    # while keeping the exact division form the oracle computes.
    ns = n_seed or 1
    ranks = base.select(
        "id",
        "outdeg",
        "seed",
        F.when(F.col("seed"), 1.0 / ns).otherwise(0.0).alias("rank"),
    )
    for _ in range(_PR_ITERS):
        dang = ranks.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            edges.join(
                ranks.select(F.col("id").alias("_sid"), "rank", "outdeg"),
                edges.subj == F.col("_sid"),
            )
            .groupBy(F.col("obj").alias("_cid"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        teleport = F.when(
            F.col("seed"),
            (1.0 - _PR_D) / ns + _PR_D * F.col("_dm") / ns,
        ).otherwise(0.0)
        ranks = (
            base.join(contrib, base.id == F.col("_cid"), "left")
            .crossJoin(F.broadcast(dang))
            .select(
                base.id,
                base.outdeg,
                base.seed,
                (
                    teleport + _PR_D * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    out = ranks.select("id", F.round("rank", 8).alias("rank"))
    edges.unpersist()
    base.unpersist()
    return out


def _kg71_sql(iters: int = _PR_ITERS, d: float = _PR_D) -> str:
    from .kg import _edges_union_sql

    steps = [
        """
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
verts AS MATERIALIZED (SELECT subj AS id FROM e UNION SELECT obj FROM e),
seeds AS MATERIALIZED (SELECT id FROM verts WHERE id LIKE 'ks%'),
ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM seeds),
deg AS MATERIALIZED (SELECT subj AS id, CAST(COUNT(*) AS DOUBLE) AS outdeg
        FROM e GROUP BY subj),
r0 AS MATERIALIZED (
  SELECT id, CASE WHEN id IN (SELECT id FROM seeds)
                  THEN (SELECT 1.0/k FROM ns) ELSE 0.0 END AS r
  FROM verts)"""
    ]
    dd = f"CAST({d} AS DOUBLE)"
    for k in range(1, iters + 1):
        p = k - 1
        steps.append(
            f"""
d{k} AS (SELECT COALESCE(SUM(r), 0) AS m FROM r{p}
         WHERE id NOT IN (SELECT id FROM deg)),
c{k} AS (SELECT e.obj AS id, SUM(p.r / deg.outdeg) AS c
         FROM e JOIN r{p} p ON e.subj = p.id JOIN deg ON deg.id = p.id
         GROUP BY e.obj),
r{k} AS MATERIALIZED (SELECT v.id,
        CASE WHEN v.id IN (SELECT id FROM seeds)
             THEN (1 - {dd}) / (SELECT k FROM ns)
                  + {dd} * (SELECT m FROM d{k}) / (SELECT k FROM ns)
             ELSE 0.0 END
        + {dd} * COALESCE(c.c, 0) AS r
        FROM verts v LEFT JOIN c{k} c ON c.id = v.id)"""
        )
    return (
        f"{_edges_union_sql()},\n"
        + ",".join(steps)
        + f"\nSELECT id, round(r, 8) AS rank FROM r{iters}"
    )


# --------------------------------------------------------------------------
# kg69 — HITS hubs/authorities over the resolved curriculum edge set
# (the directed companion to kg65's PageRank: aggregation hubs like
# keystages score as hubs, terminal content like unitvariants as
# authorities). Deterministic posture mirrors kg65: fixed 3 rounds,
# max-normalization, 6dp rounding after every normalize so engine float
# order can't leak across rounds. Per round: two partial-agg joins over
# the persisted edge table (same partitioning reused), max as a lazy
# broadcast 1-row agg — never a driver collect; localCheckpoint cuts
# lineage.
# --------------------------------------------------------------------------

_HITS_ROUNDS = 3


def kg69_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    edges = (
        gb.resolved.select("subj", "obj").distinct().repartition("subj").persist()
    )
    verts = (
        edges.select(F.col("subj").alias("id"))
        .union(edges.select(F.col("obj").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    h = verts.select("id", F.lit(1.0).alias("h"))
    a = None
    for _ in range(_HITS_ROUNDS):
        araw = (
            edges.join(h.select(F.col("id").alias("subj"), "h"), "subj")
            .groupBy("obj")
            .agg(F.sum("h").alias("s"))
        )
        amax = araw.agg(F.max("s").alias("_mx"))
        a = (
            verts.join(araw.select(F.col("obj").alias("id"), "s"), "id", "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "id",
                F.round(F.coalesce("s", F.lit(0.0)) / F.col("_mx"), 6).alias("a"),
            )
            .localCheckpoint()
        )
        hraw = (
            edges.join(a.select(F.col("id").alias("obj"), "a"), "obj")
            .groupBy("subj")
            .agg(F.sum("a").alias("s"))
        )
        hmax = hraw.agg(F.max("s").alias("_mx"))
        h = (
            verts.join(hraw.select(F.col("subj").alias("id"), "s"), "id", "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "id",
                F.round(F.coalesce("s", F.lit(0.0)) / F.col("_mx"), 6).alias("h"),
            )
            .localCheckpoint()
        )
    out = (
        h.join(a.select("id", "a"), "id")
        .select("id", F.col("h").alias("hub"), F.col("a").alias("auth"))
    )
    edges.unpersist()
    return out


def _kg69_sql(rounds: int = _HITS_ROUNDS) -> str:
    from .kg import _edges_union_sql

    steps = [
        """
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
verts AS MATERIALIZED (SELECT subj AS id FROM e UNION SELECT obj FROM e),
h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM verts)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(
            f"""
ar{k} AS (SELECT e.obj AS id, SUM(h.h) AS s
          FROM e JOIN h{p} h ON e.subj = h.id GROUP BY e.obj),
a{k} AS MATERIALIZED (
  SELECT v.id, round(COALESCE(ar.s, 0) / (SELECT MAX(s) FROM ar{k}), 6) AS a
  FROM verts v LEFT JOIN ar{k} ar ON ar.id = v.id),
hr{k} AS (SELECT e.subj AS id, SUM(a.a) AS s
          FROM e JOIN a{k} a ON e.obj = a.id GROUP BY e.subj),
h{k} AS MATERIALIZED (
  SELECT v.id, round(COALESCE(hr.s, 0) / (SELECT MAX(s) FROM hr{k}), 6) AS h
  FROM verts v LEFT JOIN hr{k} hr ON hr.id = v.id)"""
        )
    return (
        f"{_edges_union_sql()},\n"
        + ",".join(steps)
        + f"""
SELECT h.id, h.h AS hub, a.a AS auth
FROM h{rounds} h JOIN a{rounds} a ON h.id = a.id
"""
    )


# --------------------------------------------------------------------------
# kg70 — neighborhood feature extraction (GNN feature-prep pattern):
# per node of the resolved curriculum graph, out-degree, in-degree,
# mean out-degree of out-neighbors, and distinct 2-hop successor count.
# Two self-joins on the persisted edge table + partial aggs — the
# standard message-passing-as-join shape; at scale both joins shuffle
# on the shared endpoint key and AQE handles hub skew (keystage/year
# hubs are exactly the hot keys the north_rule calls out).
# --------------------------------------------------------------------------


def kg70_neighbor_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    # eager localCheckpoint, not persist: all four feature joins reuse
    # the materialized edge table without pinning cache blocks for the
    # session lifetime (the q25-cache lesson)
    e = gb.resolved.select("subj", "obj").distinct().localCheckpoint()
    outdeg = e.groupBy("subj").agg(F.count(F.lit(1)).alias("outdeg"))
    indeg = e.groupBy("obj").agg(F.count(F.lit(1)).alias("indeg"))
    nbr_out = (
        e.join(outdeg.withColumnRenamed("subj", "obj"), on="obj", how="left")
        .groupBy("subj")
        .agg(
            F.round(F.avg(F.coalesce("outdeg", F.lit(0))), 6).alias(
                "avg_nbr_outdeg"
            )
        )
    )
    hop2 = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.obj") == F.col("b.subj"))
        .select(F.col("a.subj").alias("subj"), F.col("b.obj").alias("o2"))
        .groupBy("subj")
        .agg(F.count_distinct("o2").alias("n_2hop"))
    )
    verts = (
        e.select(F.col("subj").alias("id"))
        .union(e.select(F.col("obj").alias("id")))
        .distinct()
    )
    out = (
        verts.join(outdeg.withColumnRenamed("subj", "id"), "id", "left")
        .join(indeg.withColumnRenamed("obj", "id"), "id", "left")
        .join(nbr_out.withColumnRenamed("subj", "id"), "id", "left")
        .join(hop2.withColumnRenamed("subj", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.coalesce("avg_nbr_outdeg", F.lit(0.0)).alias("avg_nbr_outdeg"),
            F.coalesce("n_2hop", F.lit(0)).cast("long").alias("n_2hop"),
        )
    )
    return out


def _kg70_sql() -> str:
    from .kg import _edges_union_sql

    return (
        _edges_union_sql()
        + """,
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
verts AS (SELECT subj AS id FROM e UNION SELECT obj FROM e),
od AS (SELECT subj, COUNT(*) AS outdeg FROM e GROUP BY subj),
idg AS (SELECT obj, COUNT(*) AS indeg FROM e GROUP BY obj),
nbo AS (
  SELECT e.subj, round(AVG(COALESCE(od.outdeg, 0)), 6) AS avg_nbr_outdeg
  FROM e LEFT JOIN od ON e.obj = od.subj GROUP BY e.subj),
h2 AS (
  SELECT a.subj, COUNT(DISTINCT b.obj) AS n_2hop
  FROM e a JOIN e b ON a.obj = b.subj GROUP BY a.subj)
SELECT v.id,
       CAST(COALESCE(od.outdeg, 0) AS BIGINT) AS outdeg,
       CAST(COALESCE(idg.indeg, 0) AS BIGINT) AS indeg,
       COALESCE(nbo.avg_nbr_outdeg, 0.0) AS avg_nbr_outdeg,
       CAST(COALESCE(h2.n_2hop, 0) AS BIGINT) AS n_2hop
FROM verts v
LEFT JOIN od ON v.id = od.subj
LEFT JOIN idg ON v.id = idg.obj
LEFT JOIN nbo ON v.id = nbo.subj
LEFT JOIN h2 ON v.id = h2.subj
"""
    )


# --------------------------------------------------------------------------
# kg72 — bipartite projection of the unit↔thread incidence onto units:
# unit pairs weighted by the number of threads they share (the standard
# co-membership projection — "which units travel together through the
# curriculum's threads"). Spark plan: one self-join keyed on the thread
# id, then a partial-agg shuffle on the unit pair. Per-thread fan-out is
# quadratic in the thread's unit count, so at web scale hot threads get
# the q27 treatment — df-prune (a thread touching >k units contributes
# no discriminative co-membership) or salt the self-join; the curriculum
# graph's thread degree is bounded (~units-per-thread is a schema
# property), so the plain keyed self-join is the right plan here.
# Oracle: the same projection over kg37's independently derived `edges`
# union — a value match re-checks endpoint resolution through one more
# composition level.
# --------------------------------------------------------------------------


def kg72_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    ut = (
        gb.resolved.filter(F.col("pred") == "HAS_THREAD")
        .select("subj", "obj")
        .distinct()
    )
    a = ut.select(F.col("obj").alias("t"), F.col("subj").alias("u1"))
    b = ut.select(F.col("obj").alias("t"), F.col("subj").alias("u2"))
    return (
        a.join(b, on="t")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_threads"))
        .select(
            F.col("u1").alias("unit1"),
            F.col("u2").alias("unit2"),
            "n_shared_threads",
        )
    )


def _kg72_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
ut AS (
  SELECT DISTINCT subj AS u, obj AS t FROM edges WHERE pred = 'HAS_THREAD'
)
SELECT a.u AS unit1, b.u AS unit2, CAST(COUNT(*) AS BIGINT) AS n_shared_threads
FROM ut a JOIN ut b ON a.t = b.t AND a.u < b.u
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# kg73 — root-to-node PATH ENUMERATION over the resolved curriculum DAG
# (the `MATCH path = (root)-[*]->(n) RETURN path` graph-DB feature, per
# depth): every directed path from an in-degree-0 root, rendered as a
# `node/PRED>node/...` string. Spark: frontier-join rounds like kg66's
# BFS, but carrying the accumulated path string instead of min-depth —
# each round is one key-colocated join + localCheckpoint (lineage cut).
# Path count is polynomial here (fan-in multiplies routes, the schema
# bounds depth at 6); at web scale path enumeration is capped by depth
# and, where needed, by per-node route sampling — stated in the depth
# parameter. Output: per-depth histogram + lexicographic min/max path
# (stable, order-free evidence over ~25k paths). Oracle: recursive CTE
# building the identical strings over the independent edge union.
# --------------------------------------------------------------------------

_PATH_MAX_DEPTH = 8


def kg73_root_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "pred", "obj").distinct().persist()
    roots = (
        e.select("subj")
        .distinct()
        .join(e.select(F.col("obj").alias("subj")).distinct(), "subj", "left_anti")
    )
    frontier = roots.select(
        F.col("subj").alias("node"),
        F.col("subj").alias("path"),
        F.lit(0).cast("long").alias("depth"),
    ).localCheckpoint()
    all_paths = frontier
    for d in range(1, _PATH_MAX_DEPTH + 1):
        nxt = (
            e.join(frontier, e.subj == frontier.node)
            .select(
                F.col("obj").alias("node"),
                F.concat(
                    F.col("path"), F.lit("/"), F.col("pred"), F.lit(">"), F.col("obj")
                ).alias("path"),
                F.lit(d).cast("long").alias("depth"),
            )
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        all_paths = all_paths.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return all_paths.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.min("path").alias("min_path"),
        F.max("path").alias("max_path"),
    )


def _kg73_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM edges),
roots AS (SELECT DISTINCT subj AS node FROM e
          WHERE subj NOT IN (SELECT obj FROM e)),
p AS (
  SELECT node, node AS path, 0 AS depth FROM roots
  UNION ALL
  SELECT e.obj, p.path || '/' || e.pred || '>' || e.obj, p.depth + 1
  FROM e JOIN p ON e.subj = p.node WHERE p.depth < {_PATH_MAX_DEPTH}
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_paths,
       MIN(path) AS min_path, MAX(path) AS max_path
FROM p GROUP BY depth
"""


# --------------------------------------------------------------------------
# kg74 — TOPOLOGICAL LEVELS of the curriculum DAG: each node's layer is
# its LONGEST path length from any in-degree-0 root (the scheduling /
# dependency-layering primitive; contrast kg66's BFS = shortest). Spark:
# kg73's frontier rounds carrying only (node, depth) with a per-round
# distinct — frontier size is bounded by |V| instead of path count, so
# this scales where enumeration wouldn't; depth ≤ 8 bounds the rounds.
# The final max-depth groupBy is the one |V|-sized shuffle. Oracle:
# recursive CTE over the same edge union, MAX(depth) per node.
# --------------------------------------------------------------------------


def kg74_topo_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    roots = (
        e.select("subj")
        .distinct()
        .join(e.select(F.col("obj").alias("subj")).distinct(), "subj", "left_anti")
    )
    frontier = roots.select(
        F.col("subj").alias("node"), F.lit(0).cast("long").alias("depth")
    ).localCheckpoint()
    reached = frontier
    for d in range(1, _PATH_MAX_DEPTH + 1):
        nxt = (
            e.join(frontier, e.subj == frontier.node)
            .select(
                F.col("obj").alias("node"),
                F.lit(d).cast("long").alias("depth"),
            )
            .distinct()
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        reached = reached.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    levels = reached.groupBy("node").agg(F.max("depth").alias("level"))
    return levels.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


def _kg74_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
roots AS (SELECT DISTINCT subj AS node FROM e
          WHERE subj NOT IN (SELECT obj FROM e)),
p AS (
  SELECT node, 0 AS depth FROM roots
  UNION
  SELECT e.obj, p.depth + 1
  FROM e JOIN p ON e.subj = p.node WHERE p.depth < {_PATH_MAX_DEPTH}
),
lvl AS (SELECT node, MAX(depth) AS level FROM p GROUP BY node)
SELECT CAST(level AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(node) AS min_node, MAX(node) AS max_node
FROM lvl GROUP BY level
"""


# --------------------------------------------------------------------------
# kg75 — PATH CENTRALITY over the curriculum DAG: for each node, the
# number of complete root→leaf paths passing through it, computed as
# down(v)·up(v) where down(v) = #(root→v paths) and up(v) = #(v→leaf
# paths). This is DAG betweenness-by-path-count, and — unlike kg73's
# enumeration — it runs as two COUNTING DPs: each frontier round
# aggregates path counts per node (one key-colocated join + one partial
# agg), so frontier size is |V| even where the path count is
# exponential. That is the scale posture: centrality over 10^12-node
# DAGs never materializes a path. All counts are integers (exact).
# Oracle: the kg73-style recursive CTE run forward from roots and
# backward from leaves; a path-row ending at v IS a root→v (resp.
# v→leaf) path, so COUNT(*) per end node equals each DP.
# --------------------------------------------------------------------------


def _count_paths_from(e: DataFrame, sources: DataFrame) -> DataFrame:
    """DP over frontier rounds: returns (node, cnt) where cnt = number
    of directed paths (any length ≥ 0) from `sources` to node, edge set
    `e` with columns (subj, obj)."""
    frontier = sources.select(
        F.col("node"), F.lit(1).cast("long").alias("cnt")
    ).localCheckpoint()
    total = frontier
    for _ in range(_PATH_MAX_DEPTH):
        nxt = (
            e.join(frontier, e.subj == frontier.node)
            .groupBy(F.col("obj").alias("node"))
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        total = total.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return total.groupBy("node").agg(F.sum("cnt").alias("cnt"))


def kg75_path_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    roots = (
        e.select(F.col("subj").alias("node"))
        .distinct()
        .join(e.select(F.col("obj").alias("node")).distinct(), "node", "left_anti")
    )
    leaves = (
        e.select(F.col("obj").alias("node"))
        .distinct()
        .join(e.select(F.col("subj").alias("node")).distinct(), "node", "left_anti")
    )
    down = _count_paths_from(e, roots).withColumnRenamed("cnt", "down")
    rev = e.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    up = _count_paths_from(rev, leaves).withColumnRenamed("cnt", "up")
    cent = (
        down.join(up, "node")
        .select(
            "node",
            "down",
            "up",
            (F.col("down") * F.col("up")).alias("centrality"),
        )
    )
    e.unpersist()
    w = Window.orderBy(F.desc("centrality"), F.asc("node"))
    return (
        cent.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("node", "down", "up", "centrality")
    )


def _kg75_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
roots AS (SELECT DISTINCT subj AS node FROM e
          WHERE subj NOT IN (SELECT obj FROM e)),
leaves AS (SELECT DISTINCT obj AS node FROM e
           WHERE obj NOT IN (SELECT subj FROM e)),
fwd AS (
  SELECT node, 0 AS depth FROM roots
  UNION ALL
  SELECT e.obj, fwd.depth + 1 FROM e JOIN fwd ON e.subj = fwd.node
  WHERE fwd.depth < {_PATH_MAX_DEPTH}
),
bwd AS (
  SELECT node, 0 AS depth FROM leaves
  UNION ALL
  SELECT e.subj, bwd.depth + 1 FROM e JOIN bwd ON e.obj = bwd.node
  WHERE bwd.depth < {_PATH_MAX_DEPTH}
),
down AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS down FROM fwd GROUP BY node),
up AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS up FROM bwd GROUP BY node)
SELECT node, down, up, centrality FROM (
  SELECT d.node, d.down, u.up, d.down * u.up AS centrality,
         ROW_NUMBER() OVER (ORDER BY d.down * u.up DESC, d.node) AS rn
  FROM down d JOIN up u ON d.node = u.node
) WHERE rn <= 20
"""


# --------------------------------------------------------------------------
# kg76 — DETERMINISTIC RANDOM WALKS over the curriculum graph: one
# fixed-length walk per start node, where step d from node v follows
# the neighbor at index md5(walk_id '|' d) mod degree(v) in v's SORTED
# neighbor list — the DeepWalk/node2vec corpus-generation stage with
# the RNG replaced by a content hash, so the "random" walks are
# bit-identical across engines, partitionings, and cluster sizes
# (the same trick as the md5-uniform sampling family, q42/q87).
# Plan: each of the L rounds is a plain equi-join walk⋈nbrs on the
# current node — NO explicit broadcast hint: node count grows linearly
# with the corpus (Lesson/Unitvariant nodes ∝ docs), so at 10^12 docs
# the adjacency table exceeds any executor's memory.  AQE broadcasts
# it at small SF where it genuinely fits and falls back to a shuffled
# hash join at scale; walks that reach a sink stop early.  Oracle: the
# identical hash arithmetic over DuckDB's sorted list() with unrolled
# steps.
# --------------------------------------------------------------------------

_WALK_LEN = 4


def kg76_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct()
    nbrs = e.groupBy(F.col("subj").alias("nb_node")).agg(
        F.array_sort(F.collect_set("obj")).alias("nbrs")
    ).persist()
    nodes = (
        e.select(F.col("subj").alias("node"))
        .unionByName(e.select(F.col("obj").alias("node")))
        .distinct()
    )
    walk = nodes.select(
        F.col("node").alias("walk_id"),
        F.col("node"),
        F.col("node").alias("path"),
        F.lit(0).cast("long").alias("depth"),
    ).localCheckpoint()
    done = walk.limit(0)
    for d in range(1, _WALK_LEN + 1):
        j = walk.join(nbrs, walk.node == F.col("nb_node"), "left")
        stopped = j.filter(F.col("nb_node").isNull()).select(
            "walk_id", "node", "path", "depth"
        )
        idx = md5long(
            F.concat(F.col("walk_id"), F.lit("|"), F.lit(str(d)))
        ) % F.size("nbrs")
        stepped = (
            j.filter(F.col("nb_node").isNotNull())
            .select(
                "walk_id",
                F.element_at("nbrs", (idx + 1).cast("int")).alias("node"),
                F.concat(
                    F.col("path"),
                    F.lit(">"),
                    F.element_at("nbrs", (idx + 1).cast("int")),
                ).alias("path"),
                F.lit(d).cast("long").alias("depth"),
            )
            .localCheckpoint()
        )
        done = done.unionByName(stopped).localCheckpoint()
        walk = stepped
    done = done.unionByName(walk)
    nbrs.unpersist()
    return done.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_walks"),
        F.min("path").alias("min_walk"),
        F.max("path").alias("max_walk"),
    )


def _kg76_sql() -> str:
    from .common import MD5LONG_SQL
    from .kg import _edges_union_sql

    step_exprs = []
    prev = "w0"
    for d in range(1, _WALK_LEN + 1):
        pick = MD5LONG_SQL.format(x=f"{prev}.walk_id || '|' || '{d}'")
        step_exprs.append(
            f"""w{d} AS (
  SELECT {prev}.walk_id,
         nb.nbrs[CAST({pick} % len(nb.nbrs) AS BIGINT) + 1] AS node,
         {prev}.path || '>' ||
           nb.nbrs[CAST({pick} % len(nb.nbrs) AS BIGINT) + 1] AS path,
         {d} AS depth
  FROM {prev} JOIN nbrs nb ON {prev}.node = nb.nb_node
)"""
        )
        prev = f"w{d}"
    stopped = []
    for d in range(0, _WALK_LEN):
        stopped.append(
            f"SELECT walk_id, node, path, depth FROM w{d} "
            f"WHERE node NOT IN (SELECT nb_node FROM nbrs)"
        )
    stopped.append(f"SELECT walk_id, node, path, depth FROM w{_WALK_LEN}")
    return f"""
{_edges_union_sql()},
e AS (SELECT DISTINCT subj, obj FROM edges),
nbrs AS (SELECT subj AS nb_node, list_sort(list(DISTINCT obj)) AS nbrs
         FROM e GROUP BY subj),
allnodes AS (SELECT subj AS node FROM e UNION SELECT obj FROM e),
w0 AS (SELECT node AS walk_id, node, node AS path, 0 AS depth FROM allnodes),
{",".join(step_exprs)},
done AS ({" UNION ALL ".join(stopped)})
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_walks,
       MIN(path) AS min_walk, MAX(path) AS max_walk
FROM done GROUP BY depth
"""


# --------------------------------------------------------------------------
# kg77 — METAPATH CENSUS: the histogram of 2-hop predicate pairs
# (pred₁ → pred₂) over the resolved graph — the metapath statistic
# heterogeneous-graph embeddings (metapath2vec) and schema-drift audits
# are built on. Plan: ONE self-join of the deduped edge table on the
# shared endpoint (shuffle on that key, AQE-skew-safe since hub nodes
# like 'keystage' are the hot keys) + one tiny pair agg; counts are
# integers. Oracle: identical self-join over the edge-union CTE.
# --------------------------------------------------------------------------


def kg77_metapath_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "pred", "obj").distinct()
    e1 = e.select(
        F.col("subj").alias("start"),
        F.col("pred").alias("pred1"),
        F.col("obj").alias("mid"),
    )
    e2 = e.select(
        F.col("subj").alias("mid"),
        F.col("pred").alias("pred2"),
        F.col("obj").alias("end"),
    )
    return (
        e1.join(e2, "mid")
        .groupBy("pred1", "pred2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paths"),
            F.countDistinct("start", "end").cast("long").alias("n_pairs"),
            F.countDistinct("mid").cast("long").alias("n_mids"),
        )
    )


def _kg77_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
e AS (SELECT DISTINCT subj, pred, obj FROM edges)
SELECT e1.pred AS pred1, e2.pred AS pred2,
       CAST(COUNT(*) AS BIGINT) AS n_paths,
       CAST(COUNT(DISTINCT (e1.subj, e2.obj)) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT e1.obj) AS BIGINT) AS n_mids
FROM e e1 JOIN e e2 ON e1.obj = e2.subj
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# kg78 — RELATIONSHIP-CARDINALITY AUDIT: per predicate, the edge/
# endpoint counts and the max fan-out/fan-in, classifying each relation
# as functional (1:N with fan-out 1), inverse-functional, or M:N — the
# schema-QA profile a KG pipeline runs before load (the reference's
# validate_neo4j_import checks orphans, kg67; this checks arity). One
# edge scan, two keyed aggs per predicate — all partial-agg shuffles.
# --------------------------------------------------------------------------


def kg78_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "pred", "obj").distinct()
    out_deg = e.groupBy("pred", "subj").agg(F.count(F.lit(1)).alias("d"))
    in_deg = e.groupBy("pred", "obj").agg(F.count(F.lit(1)).alias("d"))
    base = e.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )
    mo = out_deg.groupBy("pred").agg(F.max("d").cast("long").alias("max_out"))
    mi = in_deg.groupBy("pred").agg(F.max("d").cast("long").alias("max_in"))
    return (
        base.join(mo, "pred")
        .join(mi, "pred")
        .select(
            "pred",
            "n_edges",
            "n_subj",
            "n_obj",
            "max_out",
            "max_in",
            (F.col("max_out") == 1).alias("functional"),
            (F.col("max_in") == 1).alias("inverse_functional"),
        )
    )


def _kg78_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
e AS (SELECT DISTINCT subj, pred, obj FROM edges),
od AS (SELECT pred, subj, COUNT(*) AS d FROM e GROUP BY 1, 2),
idg AS (SELECT pred, obj, COUNT(*) AS d FROM e GROUP BY 1, 2),
base AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj,
         CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
  FROM e GROUP BY pred
)
SELECT b.pred, b.n_edges, b.n_subj, b.n_obj,
       CAST(mo.max_out AS BIGINT) AS max_out,
       CAST(mi.max_in AS BIGINT) AS max_in,
       mo.max_out = 1 AS functional,
       mi.max_in = 1 AS inverse_functional
FROM base b
JOIN (SELECT pred, MAX(d) AS max_out FROM od GROUP BY pred) mo USING (pred)
JOIN (SELECT pred, MAX(d) AS max_in FROM idg GROUP BY pred) mi USING (pred)
"""


# --------------------------------------------------------------------------
# kg79 — NEGATIVE SAMPLING for link-prediction training data: for each
# (subj, pred) the graph asserts, draw K corruption candidates from the
# global node list by a DETERMINISTIC hash (md5(subj|pred|i) mod |V| —
# the kg76 trick again, so samples are identical across engines and
# cluster sizes) and anti-join the true edges away — the
# (positive, negatives) construction every KG-embedding trainer (TransE
# et al.) runs. The draw indexes a NUMBERED node dimension (sorted_rank
# — distributed zipWithIndex, no single-row array, no global sort) via
# an equi-join on idx = hash % |V| + 1, so at 10^12 edges the candidate
# stream is an ordinary hash join against the node table. Output:
# per-pred accounting of drawn vs collided-with-true vs kept, integers.
# --------------------------------------------------------------------------

_NEG_K = 4


def _draw_negatives(e: DataFrame):
    """(drawn, kept): K deterministic corruption candidates per
    (subj, pred), and those that are not true edges.

    Scale path (VERDICT r2): the node vocabulary is a NUMBERED node
    dimension — ``sorted_rank`` gives each distinct node its 1-based
    rank in sorted order without any single-row array or global sort —
    and the draw is ``idx = md5long(subj|pred|i) % |V| + 1`` equi-joined
    against that dimension. Identical candidates to indexing a sorted
    array (rank r IS the sorted position), so the DuckDB twin is
    unchanged; no collect_list-of-all-nodes anywhere in the plan.
    """
    from .common import md5long, sorted_rank

    nodes = (
        e.select(F.col("subj").alias("n"))
        .unionByName(e.select(F.col("obj").alias("n")))
        .distinct()
    )
    ndim = sorted_rank(nodes, "n", out="idx")
    nv = nodes.agg(F.count(F.lit(1)).alias("_nv"))
    pairs = e.select("subj", "pred").distinct()
    drawn = (
        pairs.crossJoin(F.broadcast(nv))
        .select(
            "subj",
            "pred",
            "_nv",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("i"),
        )
        .select(
            "subj",
            "pred",
            (
                md5long(
                    F.concat(
                        F.col("subj"),
                        F.lit("|"),
                        F.col("pred"),
                        F.lit("|"),
                        F.col("i").cast("string"),
                    )
                )
                % F.col("_nv")
                + 1
            ).alias("idx"),
        )
        .join(ndim, "idx")
        .select("subj", "pred", F.col("n").alias("cand"))
    )
    kept = drawn.join(
        e.select("subj", "pred", F.col("obj").alias("cand")),
        ["subj", "pred", "cand"],
        "left_anti",
    )
    return drawn, kept


def kg79_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "pred", "obj").distinct().persist()
    drawn, kept = _draw_negatives(e)
    out = (
        drawn.groupBy("pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_drawn"))
        .join(
            kept.groupBy("pred").agg(
                F.count(F.lit(1)).cast("long").alias("n_kept"),
                F.min("cand").alias("min_cand"),
                F.max("cand").alias("max_cand"),
            ),
            "pred",
        )
        .select(
            "pred",
            "n_drawn",
            "n_kept",
            (F.col("n_drawn") - F.col("n_kept")).alias("n_collided"),
            "min_cand",
            "max_cand",
        )
    )
    e.unpersist()
    return out


def _kg79_sql() -> str:
    from .common import MD5LONG_SQL
    from .kg import _edges_union_sql

    pick = MD5LONG_SQL.format(x="p.subj || '|' || p.pred || '|' || CAST(u.i AS VARCHAR)")
    return f"""
{_edges_union_sql()},
e AS (SELECT DISTINCT subj, pred, obj FROM edges),
nodes AS (
  SELECT list_sort(list(DISTINCT n)) AS arr FROM (
    SELECT subj AS n FROM e UNION SELECT obj FROM e)
),
drawn AS (
  SELECT p.subj, p.pred,
         arr[CAST({pick} % len(arr) AS BIGINT) + 1] AS cand
  FROM (SELECT DISTINCT subj, pred FROM e) p
  CROSS JOIN nodes
  CROSS JOIN unnest(generate_series(0, {_NEG_K - 1})) AS u(i)
),
kept AS (
  SELECT d.* FROM drawn d
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.subj = d.subj
                    AND e.pred = d.pred AND e.obj = d.cand)
)
SELECT d.pred,
       CAST(COUNT(*) AS BIGINT) AS n_drawn,
       CAST(MIN(k.n_kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - MIN(k.n_kept) AS BIGINT) AS n_collided,
       MIN(k.min_cand) AS min_cand,
       MIN(k.max_cand) AS max_cand
FROM drawn d
JOIN (SELECT pred, COUNT(*) AS n_kept, MIN(cand) AS min_cand,
             MAX(cand) AS max_cand
      FROM kept GROUP BY pred) k ON d.pred = k.pred
GROUP BY d.pred
"""


# --------------------------------------------------------------------------
# kg80 — TransE-style TRIPLE SCORING over positives and kg79's
# negatives: every node/relation gets a deterministic 16-dim hash
# embedding (md5-byte encoder — the same stub family as
# multimodal.embed_media, so the DuckDB twin re-derives identical
# vectors), and each triple scores energy = ‖h + r − t‖₂. This is the
# batch-scoring pass of a KG-embedding training loop with the learned
# weights replaced by the deterministic stub: the data flow — positive
# edges ⋈ negative corruptions → per-relation energy margins — is the
# real one, all JVM-side HOF arithmetic (no UDF). Per-pred averages
# rendered at 6dp.
# --------------------------------------------------------------------------

_EMB_D = 16


def _hash_vec(col):
    """16-dim embedding from md5 bytes: dim i = byte_i/255 − 0.5."""
    h = F.md5(col)
    return F.transform(
        F.sequence(F.lit(1), F.lit(_EMB_D)),
        lambda i: F.conv(F.substring(h, (i - 1) * 2 + 1, 2), 16, 10).cast(
            "double"
        )
        / 255.0
        - 0.5,
    )


def _transe_energy(h, r, t):
    diff = F.zip_with(
        F.zip_with(h, r, lambda a, b: a + b), t, lambda s, c: s - c
    )
    return F.sqrt(
        F.aggregate(
            diff, F.lit(0.0), lambda acc, v: acc + v * v
        )
    )


def kg80_transe_energies(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "pred", "obj").distinct().persist()
    _, neg = _draw_negatives(e)
    pos_en = _transe_energy(
        _hash_vec(F.col("subj")), _hash_vec(F.col("pred")), _hash_vec(F.col("obj"))
    )
    neg_en = _transe_energy(
        _hash_vec(F.col("subj")), _hash_vec(F.col("pred")), _hash_vec(F.col("cand"))
    )
    pos = e.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.round(F.avg(pos_en), 6).alias("avg_pos_energy"),
    )
    negs = neg.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_neg"),
        F.round(F.avg(neg_en), 6).alias("avg_neg_energy"),
    )
    out = pos.join(negs, "pred")
    e.unpersist()
    return out


def _kg80_sql() -> str:
    from .common import MD5LONG_SQL
    from .kg import _edges_union_sql

    def vec(x):
        return (
            f"list_transform(generate_series(1, {_EMB_D}), i -> "
            f"CAST(CAST('0x' || substr(md5({x}), (i - 1) * 2 + 1, 2) AS INT)"
            f" AS DOUBLE) / 255.0 - 0.5)"
        )

    def energy(h, r, t):
        return (
            f"sqrt(list_sum(list_transform("
            f"list_zip({vec(h)}, {vec(r)}, {vec(t)}), "
            f"z -> (z[1] + z[2] - z[3]) * (z[1] + z[2] - z[3]))))"
        )

    pick = MD5LONG_SQL.format(
        x="p.subj || '|' || p.pred || '|' || CAST(u.i AS VARCHAR)"
    )
    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM edges),
nodes AS (
  SELECT list_sort(list(DISTINCT n)) AS arr FROM (
    SELECT subj AS n FROM e UNION SELECT obj FROM e)
),
drawn AS (
  SELECT p.subj, p.pred,
         arr[CAST({pick} % len(arr) AS BIGINT) + 1] AS cand
  FROM (SELECT DISTINCT subj, pred FROM e) p
  CROSS JOIN nodes
  CROSS JOIN unnest(generate_series(0, {_NEG_K - 1})) AS u(i)
),
kept AS (
  SELECT d.* FROM drawn d
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.subj = d.subj
                    AND e.pred = d.pred AND e.obj = d.cand)
),
pos AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_pos,
         ROUND(AVG({energy('subj', 'pred', 'obj')}), 6) AS avg_pos_energy
  FROM e GROUP BY pred
),
neg AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_neg,
         ROUND(AVG({energy('subj', 'pred', 'cand')}), 6) AS avg_neg_energy
  FROM kept GROUP BY pred
)
SELECT pos.pred, pos.n_pos, pos.avg_pos_energy, neg.n_neg, neg.avg_neg_energy
FROM pos JOIN neg ON pos.pred = neg.pred
"""


def kg90_kgc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG-completion LINK-PREDICTION eval over the TransE energies —
    the ranking pass that closes the embedding loop (kg79 negatives →
    kg80 energies → kg90 metrics): each positive (subj, pred, obj)
    ranks its true object against that pair's kept corruption
    candidates by energy (filtered setting — ``kept`` already excludes
    every true edge), rank = 1 + |{better-scoring negatives}|, ties
    broken by candidate id. Per pred: mean rank, MRR, hits@1.

    Energies are rounded to 6dp BEFORE comparison in both engines so
    the rank counts never hinge on last-ulp fold-order differences
    (kg80 rounds only the averages; a < compare needs the operands
    themselves pinned). Scale shape: the pos ⋈ kept join fans out at
    most K=4 rows per positive on the (subj, pred) key, the rank is a
    bounded per-positive aggregate, per-pred metrics are partial-agg —
    no window, no global sort anywhere."""
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "pred", "obj").distinct().persist()
    _, kept = _draw_negatives(e)
    pos = e.withColumn(
        "pen",
        F.round(
            _transe_energy(
                _hash_vec(F.col("subj")),
                _hash_vec(F.col("pred")),
                _hash_vec(F.col("obj")),
            ),
            6,
        ),
    )
    neg = kept.withColumn(
        "nen",
        F.round(
            _transe_energy(
                _hash_vec(F.col("subj")),
                _hash_vec(F.col("pred")),
                _hash_vec(F.col("cand")),
            ),
            6,
        ),
    )
    ranked = (
        pos.join(neg, ["subj", "pred"], "left")
        .groupBy("subj", "pred", "obj", "pen")
        .agg(
            (
                1
                + F.count_if(
                    (F.col("nen") < F.col("pen"))
                    | (
                        (F.col("nen") == F.col("pen"))
                        & (F.col("cand") < F.col("obj"))
                    )
                )
            )
            .cast("long")
            .alias("rnk")
        )
    )
    out = ranked.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.count_if(F.col("rnk") == 1).cast("long").alias("hits1"),
        F.round(F.avg("rnk"), 4).alias("mean_rank"),
        F.round(F.avg(F.lit(1.0) / F.col("rnk")), 6).alias("mrr"),
    )
    e.unpersist()
    return out


def _kg90_sql() -> str:
    from .common import MD5LONG_SQL
    from .kg import _edges_union_sql

    def vec(x):
        return (
            f"list_transform(generate_series(1, {_EMB_D}), i -> "
            f"CAST(CAST('0x' || substr(md5({x}), (i - 1) * 2 + 1, 2) AS INT)"
            f" AS DOUBLE) / 255.0 - 0.5)"
        )

    def energy(h, r, t):
        return (
            f"sqrt(list_sum(list_transform("
            f"list_zip({vec(h)}, {vec(r)}, {vec(t)}), "
            f"z -> (z[1] + z[2] - z[3]) * (z[1] + z[2] - z[3]))))"
        )

    pick = MD5LONG_SQL.format(
        x="p.subj || '|' || p.pred || '|' || CAST(u.i AS VARCHAR)"
    )
    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM edges),
nodes AS (
  SELECT list_sort(list(DISTINCT n)) AS arr FROM (
    SELECT subj AS n FROM e UNION SELECT obj FROM e)
),
drawn AS (
  SELECT p.subj, p.pred,
         arr[CAST({pick} % len(arr) AS BIGINT) + 1] AS cand
  FROM (SELECT DISTINCT subj, pred FROM e) p
  CROSS JOIN nodes
  CROSS JOIN unnest(generate_series(0, {_NEG_K - 1})) AS u(i)
),
kept AS (
  SELECT d.* FROM drawn d
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.subj = d.subj
                    AND e.pred = d.pred AND e.obj = d.cand)
),
pe AS (
  SELECT subj, pred, obj,
         ROUND({energy('subj', 'pred', 'obj')}, 6) AS pen
  FROM e
),
ne AS (
  SELECT subj, pred, cand,
         ROUND({energy('subj', 'pred', 'cand')}, 6) AS nen
  FROM kept
),
ranked AS (
  SELECT p.pred, p.subj, p.obj,
         1 + COUNT(*) FILTER (
           WHERE n.nen < p.pen
              OR (n.nen = p.pen AND n.cand < p.obj)) AS rnk
  FROM pe p LEFT JOIN ne n ON p.subj = n.subj AND p.pred = n.pred
  GROUP BY p.pred, p.subj, p.obj, p.pen
)
SELECT pred,
       CAST(COUNT(*) AS BIGINT) AS n_pos,
       CAST(COUNT(*) FILTER (WHERE rnk = 1) AS BIGINT) AS hits1,
       ROUND(AVG(rnk), 4) AS mean_rank,
       ROUND(AVG(CAST(1 AS DOUBLE) / rnk), 6) AS mrr
FROM ranked GROUP BY pred
"""


def kg91_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key SKEW audit — the diagnostic that decides where the
    north_star's salted-key treatment is needed ("hot curriculum units
    like 'lesson' and 'keystage'"): per relationship type, the top-5
    hottest object endpoints by row count, each with its skew ratio
    (rows on this key ÷ per-key average for the pred) and a
    ``needs_salt`` flag at the 10× threshold the engine's salted joins
    use (q125's replicate factor). One partial-agg groupBy over the
    edge stream, a broadcast join against the tiny per-pred totals,
    and a per-pred (bounded-group) top-5 window — no global sort.
    Ratio arithmetic is double (exact below 2^53 rows·keys; at larger
    products the 0.5×/10× threshold compares are approximate, which an
    audit tolerates)."""
    gb = _wide(spark, sf_dir)
    per = gb.resolved.groupBy("pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = per.groupBy("pred").agg(
        F.sum("n_rows").alias("_tot"), F.count(F.lit(1)).alias("_nkeys")
    )
    ratio = (
        F.col("n_rows").cast("double")
        * F.col("_nkeys").cast("double")
        / F.col("_tot").cast("double")
    )
    w = Window.partitionBy("pred").orderBy(F.desc("n_rows"), F.asc("obj"))
    return (
        per.join(F.broadcast(tot), "pred")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(
            "pred",
            "obj",
            "n_rows",
            "rk",
            F.round(ratio, 4).alias("skew_ratio"),
            (ratio > 10.0).alias("needs_salt"),
        )
    )


def _kg91_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
per AS (
  SELECT pred, obj, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM edges GROUP BY pred, obj
),
tot AS (
  SELECT pred, SUM(n_rows) AS _tot, COUNT(*) AS _nkeys
  FROM per GROUP BY pred
),
ranked AS (
  SELECT p.pred, p.obj, p.n_rows,
         CAST(row_number() OVER (
           PARTITION BY p.pred ORDER BY p.n_rows DESC, p.obj) AS BIGINT)
           AS rk,
         CAST(p.n_rows AS DOUBLE) * CAST(t._nkeys AS DOUBLE)
           / CAST(t._tot AS DOUBLE) AS ratio
  FROM per p JOIN tot t ON p.pred = t.pred
)
SELECT pred, obj, n_rows, rk,
       ROUND(ratio, 4) AS skew_ratio,
       ratio > 10.0 AS needs_salt
FROM ranked WHERE rk <= 5
"""


_ANF_ROUNDS = 3
_ANF_LGK = 14


def kg92_neighborhood_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF-style NEIGHBORHOOD FUNCTION — the classic web-scale
    graph-distance estimator (Boldi/Rosa/Vigna WWW'11; the ANF/HLL
    counting idea from Palmer et al. KDD'02): every node carries an HLL
    sketch of its ≤t-hop out-reachable set, one round is
    sketch_{t+1}(v) = sketch_t(v) ∪ ⋃_{(v,u)∈E} sketch_t(u) — a join
    on the edge key + hll_union_agg (register-max, so the result is
    SET-deterministic regardless of arrival order) — and
    N(t) = Σ_v |sketch_t(v)| estimates the number of node pairs within
    distance t. Per-round cost is one bounded join + one partial-agg
    combine on |V|·(sketch bytes) state: THE scale path where exact
    pairwise reachability is quadratic.

    Output uses q44's error-bound-boolean trick: an exact pair-count
    branch (iterated distinct frontier joins — the small-scale
    verification harness, quadratic by design) runs beside the sketch
    branch, and the query emits (t, n_pairs_exact, within_10pct) where
    the boolean pins the HLL estimate to ±10% of exact. Both branches
    are deterministic, so the DuckDB twin re-derives the exact counts
    with a recursive CTE and asserts the boolean TRUE."""
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    nodes = (
        e.select(F.col("subj").alias("id"))
        .unionByName(e.select(F.col("obj").alias("id")))
        .distinct()
    )
    reach = nodes.select(
        F.col("id").alias("src"), F.col("id").alias("node")
    ).localCheckpoint()
    sk = nodes.groupBy("id").agg(
        F.hll_sketch_agg("id", F.lit(_ANF_LGK)).alias("sk")
    ).localCheckpoint()
    exact_rounds = [
        reach.agg(F.count(F.lit(1)).cast("long").alias("n_pairs_exact"))
        .withColumn("t", F.lit(0).cast("long"))
    ]
    est_rounds = [
        sk.agg(
            F.coalesce(
                F.sum(F.hll_sketch_estimate("sk")), F.lit(0.0)
            ).alias("n_est")
        )
        .withColumn("t", F.lit(0).cast("long"))
    ]
    for t in range(1, _ANF_ROUNDS + 1):
        reach = (
            reach.unionByName(
                reach.join(e, reach.node == e.subj).select(
                    "src", F.col("obj").alias("node")
                )
            )
            .distinct()
            .localCheckpoint()
        )
        nb = sk.select(F.col("id").alias("_nb"), "sk")
        sk = (
            e.join(nb, e.obj == nb._nb)
            .select(F.col("subj").alias("id"), "sk")
            .unionByName(sk)
            .groupBy("id")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .localCheckpoint()
        )
        exact_rounds.append(
            reach.agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs_exact")
            ).withColumn("t", F.lit(t).cast("long"))
        )
        est_rounds.append(
            sk.agg(
            F.coalesce(
                F.sum(F.hll_sketch_estimate("sk")), F.lit(0.0)
            ).alias("n_est")
        )
            .withColumn("t", F.lit(t).cast("long"))
        )
    exact = exact_rounds[0]
    for x in exact_rounds[1:]:
        exact = exact.unionByName(x)
    est = est_rounds[0]
    for x in est_rounds[1:]:
        est = est.unionByName(x)
    out = exact.join(est, "t").select(
        "t",
        "n_pairs_exact",
        (
            F.abs(F.col("n_est") - F.col("n_pairs_exact"))
            <= 0.10 * F.col("n_pairs_exact")
        ).alias("within_10pct"),
    )
    e.unpersist()
    return out


def _kg92_sql() -> str:
    from .kg import _edges_union_sql

    rounds = "".join(
        f""",
r{t} AS (
  SELECT DISTINCT src, node FROM (
    SELECT src, node FROM r{t - 1}
    UNION ALL
    SELECT r.src, e.obj FROM r{t - 1} r JOIN e ON r.node = e.subj)
)"""
        for t in range(1, _ANF_ROUNDS + 1)
    )
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT)"
        f" AS n_pairs_exact, TRUE AS within_10pct FROM r{t}"
        for t in range(_ANF_ROUNDS + 1)
    )
    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
nodes AS (
  SELECT DISTINCT id FROM (SELECT subj AS id FROM e UNION SELECT obj FROM e)
),
r0 AS (SELECT id AS src, id AS node FROM nodes){rounds}
{selects}
"""


# --------------------------------------------------------------------------
# kg81 — DEGREE ASSORTATIVITY of the curriculum graph: the Pearson
# correlation between the total degrees of edge endpoints — the one-
# number network-science diagnostic (do hubs link to hubs?). Degrees
# come from one edge scan (out ∪ in, summed per node), join back to
# both endpoints (the degree table is node-scale → broadcast), one
# CORR aggregate; 6dp rendering.
# --------------------------------------------------------------------------


def kg81_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct()
    deg = (
        e.select(F.col("subj").alias("node"))
        .unionByName(e.select(F.col("obj").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ds = deg.select(F.col("node").alias("subj"), F.col("deg").alias("dsub"))
    do = deg.select(F.col("node").alias("obj"), F.col("deg").alias("dobj"))
    j = e.join(F.broadcast(ds), "subj").join(F.broadcast(do), "obj")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.round(
            F.corr(F.col("dsub").cast("double"), F.col("dobj").cast("double")),
            6,
        ).alias("assortativity"),
        F.round(F.avg(F.col("dsub").cast("double")), 4).alias("avg_src_deg"),
        F.round(F.avg(F.col("dobj").cast("double")), 4).alias("avg_dst_deg"),
    )


def _kg81_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT subj AS node FROM e UNION ALL SELECT obj FROM e)
  GROUP BY node
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       ROUND(CORR(CAST(ds.deg AS DOUBLE), CAST(dd.deg AS DOUBLE)), 6)
         AS assortativity,
       ROUND(AVG(CAST(ds.deg AS DOUBLE)), 4) AS avg_src_deg,
       ROUND(AVG(CAST(dd.deg AS DOUBLE)), 4) AS avg_dst_deg
FROM e JOIN deg ds ON e.subj = ds.node JOIN deg dd ON e.obj = dd.node
"""


# --------------------------------------------------------------------------
# q158 — local clustering coefficient over the part co-occurrence
# graph: lcc(n) = 2·tri(n) / (deg(n)·(deg(n)−1)) for deg ≥ 2. Reuses
# q51's degree-ordered triangle enumeration (the O(|E|^1.5) plan);
# the coefficient itself is one integer division rendered at 6dp, so
# both engines divide identical integers. Zero-triangle nodes appear
# with lcc 0 (left join), not absent — the audit wants the full
# denominator population.
# --------------------------------------------------------------------------


def q158_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("part"))
        .unionAll(e.select(F.col("v").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(e).withColumnRenamed("n", "part")
    nt = F.coalesce("n_triangles", F.lit(0))
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "part", "left")
        .select(
            "part",
            F.col("degree").cast("long").alias("degree"),
            nt.cast("long").alias("n_triangles"),
            F.round(
                2.0 * nt / (F.col("degree") * (F.col("degree") - 1)), 6
            ).alias("lcc"),
        )
    )


Q158_SQL = """
WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS u, b.p AS v
      FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p),
deg AS (
  SELECT part, COUNT(*) AS degree
  FROM (SELECT u AS part FROM e UNION ALL SELECT v FROM e)
  GROUP BY part
),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
tn AS (
  SELECT part, COUNT(*) AS nt
  FROM (SELECT a AS part FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY part
)
SELECT d.part, CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(tn.nt, 0) AS BIGINT) AS n_triangles,
       ROUND(CAST(2 AS DOUBLE) * COALESCE(tn.nt, 0)
             / (d.degree * (d.degree - 1)), 6) AS lcc
FROM deg d LEFT JOIN tn USING (part)
WHERE d.degree >= 2
"""


# --------------------------------------------------------------------------
# q159 — k-truss decomposition (k=12, 3 peeling rounds): repeatedly
# drop edges supporting fewer than k−2 triangles. Each round reuses the
# degree-ordered triangle enumeration, canonicalizes each triangle's
# three edges by (least, greatest), and inner-joins the support table
# back (zero-support edges drop by the join itself). Fixed round count
# keeps the Spark loop and the unrolled DuckDB CTE on identical
# semantics whether or not the peeling has converged. Output is the
# per-node degree within the surviving truss.
# --------------------------------------------------------------------------

_TRUSS_K = 12
_TRUSS_ROUNDS = 3


def ktruss(e: DataFrame, k: int = _TRUSS_K, rounds: int = _TRUSS_ROUNDS) -> DataFrame:
    """Edges (u < v) surviving `rounds` support-peeling passes."""
    e = e.localCheckpoint()
    for _ in range(rounds):
        oriented = _orient(e).persist()
        tri = _tri(oriented)
        edges3 = (
            tri.select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .unionAll(
                tri.select(
                    F.least("a", "c").alias("u"),
                    F.greatest("a", "c").alias("v"),
                )
            )
            .unionAll(
                tri.select(
                    F.least("b", "c").alias("u"),
                    F.greatest("b", "c").alias("v"),
                )
            )
        )
        sup = edges3.groupBy("u", "v").agg(F.count(F.lit(1)).alias("sup"))
        e = e.join(
            sup.filter(F.col("sup") >= k - 2).select("u", "v"), ["u", "v"]
        ).localCheckpoint()
        oriented.unpersist()
    return e


def q159_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ktruss(_copurchase_edges(spark, sf_dir))
    return (
        t.select(F.col("u").alias("part"))
        .unionAll(t.select(F.col("v").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("truss_deg"))
    )


def _q159_sql(k: int = _TRUSS_K, rounds: int = _TRUSS_ROUNDS) -> str:
    steps = [
        """
WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
      FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        # naive-orientation triangles have a<b<c, so the three edges
        # (a,b), (b,c), (a,c) are already canonical
        steps.append(
            f"""
t{r} AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e{p} e1
        JOIN e{p} e2 ON e2.u = e1.v
        JOIN e{p} e3 ON e3.u = e1.u AND e3.v = e2.v),
s{r} AS (SELECT u, v, COUNT(*) AS c FROM (
          SELECT a AS u, b AS v FROM t{r}
          UNION ALL SELECT b, c FROM t{r}
          UNION ALL SELECT a, c FROM t{r}) GROUP BY u, v),
e{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{p} e
        JOIN s{r} s ON s.u = e.u AND s.v = e.v WHERE s.c >= {k - 2})"""
        )
    return (
        ",".join(steps)
        + f"""
SELECT part, CAST(COUNT(*) AS BIGINT) AS truss_deg
FROM (SELECT u AS part FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
GROUP BY part"""
    )


# --------------------------------------------------------------------------
# kg82 — harmonic closeness of the keystage nodes over the resolved
# curriculum graph: per seed, BFS out to depth ≤ 10 and sum 1/depth
# over reached nodes (harmonic centrality — defined even when
# reachability is partial, unlike classic closeness). The Spark side is
# kg66's frontier loop carrying a src column (multi-source labeled
# BFS: one join per round, anti-join on the settled (src, id) set);
# the oracle is a WITH RECURSIVE unfolding with MIN-depth collapse.
# --------------------------------------------------------------------------

_CLOSE_DEPTH = 10


def kg82_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    seeds = (
        e.select(F.col("subj").alias("id"))
        .union(e.select(F.col("obj").alias("id")))
        .distinct()
        .filter(F.col("id").startswith("ks"))
    )
    dist = seeds.select(
        F.col("id").alias("src"), "id", F.lit(0).cast("long").alias("depth")
    ).localCheckpoint()
    frontier = dist.select("src", "id")
    for d in range(1, _CLOSE_DEPTH + 1):
        nxt = (
            e.join(frontier, e.subj == frontier.id)
            .select("src", F.col("obj").alias("id"))
            .distinct()
            .join(dist, ["src", "id"], "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(
            nxt.select("src", "id", F.lit(d).cast("long").alias("depth"))
        ).localCheckpoint()
        frontier = nxt
    out = (
        dist.filter(F.col("depth") > 0)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.round(F.sum(F.lit(1.0) / F.col("depth")), 6).alias("harmonic"),
        )
    )
    e.unpersist()
    return out


def _kg82_sql(max_depth: int = _CLOSE_DEPTH) -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
verts AS (SELECT subj AS id FROM e UNION SELECT obj FROM e),
seeds AS (SELECT id FROM verts WHERE id LIKE 'ks%'),
bfs AS (
  SELECT id AS src, id, 0 AS depth FROM seeds
  UNION
  SELECT b.src, e.obj, b.depth + 1 FROM e JOIN bfs b ON e.subj = b.id
  WHERE b.depth < {max_depth}
),
md AS (SELECT src, id, MIN(depth) AS d FROM bfs GROUP BY src, id)
SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reached,
       ROUND(SUM(CAST(1 AS DOUBLE) / d), 6) AS harmonic
FROM md WHERE d > 0 GROUP BY src
"""


# --------------------------------------------------------------------------
# kg84 — endpoint label-contract audit: for every (subj_label, pred,
# obj_label) edge type, check that each endpoint id is a member of the
# TYPED node table of its declared label. The engine resolves endpoints
# against the global id dimension (one semi-join, mapper.resolve_
# triples) — this audit proves the per-label (stricter) property holds,
# i.e. no cross-label id collision slipped an edge through. The oracle
# derives edges with per-label IN-dim filters, so its ok-counts equal
# n_edges and endpoint_clean is TRUE by construction — the Spark side
# must EARN the same numbers through real per-label membership joins
# (the q44/q110 asserted-invariant oracle pattern).
# --------------------------------------------------------------------------


def kg84_endpoint_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    # the fused (label, nid) melt the resolver itself consumes — ONE
    # scan/exchange for all 13 labels (and already persisted by the
    # build) instead of re-deriving 13 typed node tables; node_dims'
    # distinct→clean→distinct contract makes its per-label ID set
    # exactly the typed tables' id set (operators/mapper.py:node_dims)
    nodes_all = gb.extras["dims"].select(
        "label", F.col("nid").cast("string").alias("id")
    )
    e = gb.resolved.select(
        "subj_label", "pred", "obj_label", "subj", "obj"
    ).distinct()
    sdim = nodes_all.select(
        F.col("label").alias("subj_label"), F.col("id").alias("subj")
    ).withColumn("s_ok", F.lit(1))
    odim = nodes_all.select(
        F.col("label").alias("obj_label"), F.col("id").alias("obj")
    ).withColumn("o_ok", F.lit(1))
    j = e.join(sdim, ["subj_label", "subj"], "left").join(
        odim, ["obj_label", "obj"], "left"
    )
    g = j.groupBy("subj_label", "pred", "obj_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.coalesce("s_ok", F.lit(0))).cast("long").alias("n_subj_ok"),
        F.sum(F.coalesce("o_ok", F.lit(0))).cast("long").alias("n_obj_ok"),
    )
    clean = (F.col("n_subj_ok") == F.col("n_edges")) & (
        F.col("n_obj_ok") == F.col("n_edges")
    )
    return g.withColumn("endpoint_clean", clean)


def _kg84_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()}
SELECT subj_label, pred, obj_label,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_subj_ok,
       CAST(COUNT(*) AS BIGINT) AS n_obj_ok,
       TRUE AS endpoint_clean
FROM edges GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q200 — graph connectivity fraction: from q32's connected components,
# the share of node pairs that are connected = Σ c·(c−1) / (n·(n−1))
# over component sizes c — the single scalar a percolation/fragmentation
# monitor tracks. Pure integers until the final division; the oracle
# wraps q32's recursive-CTE closure.
# --------------------------------------------------------------------------


def q200_connectivity_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    cc = connected_components(e0, max_iter=30)
    sizes = cc.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("c"))
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum("c").cast("long").alias("n_nodes"),
        F.max("c").cast("long").alias("max_component"),
        F.round(
            F.sum(F.col("c") * (F.col("c") - 1))
            / (F.sum("c") * (F.sum("c") - 1)),
            6,
        ).alias("connected_pair_frac"),
    )


Q200_SQL = f"""
WITH cc AS ({Q32_SQL}),
sizes AS (SELECT canonical_id, COUNT(*) AS c FROM cc GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(c) AS BIGINT) AS n_nodes,
       CAST(MAX(c) AS BIGINT) AS max_component,
       ROUND(SUM(c * (c - 1)) / (1.0 * SUM(c) * (SUM(c) - 1)), 6)
         AS connected_pair_frac
FROM sizes
"""


# --------------------------------------------------------------------------
# kg86 — incremental-maintenance convergence audit: split the corpus
# 3:1 on a doc-id hash, batch-build a GraphStore from the base, absorb
# the remainder as a delta MERGE commit (plans/graph_store.py), and
# prove the incrementally-maintained graph equals one batch build over
# the union — edge identity set and per-label node-id set both earned
# through real two-sided anti-joins, with the update committing as ONE
# aligned snapshot version. Also gates the maintenance surface: every
# commit's per-table metrics rows (manifest footer counts) match the
# real tables, and a graph-level compact() advances every table by one
# aligned version leaving reads identical. The oracle asserts the invariants hold
# (the q44/kg84 asserted-TRUE pattern — GraphStore's mechanics aren't
# SQL-replayable, but the convergence contract is checkable).
# --------------------------------------------------------------------------


def kg86_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..plans.graph_store import EDGE_KEYS, GraphStore, join_group_key
    from .kg import _wide, docs_df

    docs = docs_df(spark, sf_dir)
    # join-group-aligned split (graph_store.py caller contract): every
    # document of a consolidation join group ships in the same segment,
    # so the primary⋈supplementary join never straddles the boundary
    is_delta = F.pmod(F.xxhash64(join_group_key()), F.lit(4)) == 0
    store = GraphStore(
        spark, os.path.join(tempfile.mkdtemp(prefix="kg86_"), "g")
    )
    store.init(docs.filter(~is_delta), n_buckets=8)
    upd = store.update(docs.filter(is_delta))

    gb = _wide(spark, sf_dir)  # memoized batch build over the union
    inc_e = store.edges().select(*EDGE_KEYS)
    full_e = gb.resolved.select(*EDGE_KEYS)
    edges_converge = (
        inc_e.exceptAll(full_e).count() == 0
        and full_e.exceptAll(inc_e).count() == 0
    )
    inc_n = None
    for label in store.labels():
        part = store.nodes(label).select(
            F.lit(label).alias("label"), F.col("id").cast("string").alias("id")
        )
        inc_n = part if inc_n is None else inc_n.unionByName(part)
    full_n = gb.extras["dims"].select(
        "label", F.col("nid").cast("string").alias("id")
    )
    nodes_converge = (
        inc_n.exceptAll(full_n).count() == 0
        and full_n.exceptAll(inc_n).count() == 0
    )
    # maintenance surface: every commit wrote one metrics row per table
    # with manifest-derived totals matching the real tables, and a
    # graph-level compact advances EVERY table by one aligned version
    # while leaving reads identical (plans/graph_store.py)
    all_tables = {f"nodes/{lb}" for lb in store.labels()} | {
        "edges",
        "dangling",
    }
    mrows = store.metrics().collect()
    per_v = {}
    for r in mrows:
        per_v.setdefault(r["graph_version"], {})[r["table"]] = r
    metrics_complete = all(
        set(per_v.get(g, {})) == all_tables for g in (0, 1)
    )
    metrics_match = (
        per_v[1]["edges"]["rows_total"] == inc_e.count()
        and per_v[0]["edges"]["rows_total"] == store.edges(as_of=0).count()
    )
    pre_compact = store.version()
    aligned_update = upd["version"] == 1 == pre_compact
    store.compact()
    post_e = store.edges().select(*EDGE_KEYS)
    pre_e = store.edges(as_of=pre_compact).select(*EDGE_KEYS)
    compact_ok = (
        store.version() == pre_compact + 1
        and post_e.exceptAll(pre_e).count() == 0
        and store.edges().count() == store.edges(as_of=pre_compact).count()
        and all(
            store._table(t).current_version() == pre_compact + 1
            for t in all_tables
        )
    )
    # "the update added edges" is vacuously true when the delta carried
    # no new edge content (degenerate corpora): then v0 == v1 == the
    # full batch build, which the convergence checks pin independently
    v0_count = store.edges(as_of=0).count()
    v1_count = inc_e.count()
    rows = [
        ("edges_converge_to_batch", bool(edges_converge)),
        ("nodes_converge_to_batch", bool(nodes_converge)),
        (
            "update_added_edges",
            bool(
                v0_count < v1_count
                or (v0_count == v1_count == full_e.count())
            ),
        ),
        ("one_aligned_commit", bool(aligned_update)),
        ("metrics_row_per_table", bool(metrics_complete)),
        ("metrics_totals_match", bool(metrics_match)),
        ("compact_aligned_identical", bool(compact_ok)),
    ]
    return spark.createDataFrame(rows, "chk string, ok boolean")


KG86_SQL = """
SELECT * FROM (VALUES
  ('edges_converge_to_batch', TRUE),
  ('nodes_converge_to_batch', TRUE),
  ('update_added_edges', TRUE),
  ('one_aligned_commit', TRUE),
  ('metrics_row_per_table', TRUE),
  ('metrics_totals_match', TRUE),
  ('compact_aligned_identical', TRUE)
) AS t(chk, ok)
"""


# --------------------------------------------------------------------------
# q215 — strongly connected components over a DIRECTED lineitem-derived
# graph: odd-suppkey lineitems point order→part, even-suppkey lineitems
# point part→order, so alternating o→p→o'→p'→o chains close real cycles
# (one giant SCC plus small ones — the web-graph bowtie shape). Engine:
# FW-BW-Trim coloring (operators/components.py:strongly_connected_
# components) — trim dissolves the DAG fringe, forward max-coloring +
# backward containment settle the cyclic core; every step a partitioned
# join/aggregate, no global sort. Oracle: recursive-CTE transitive
# closure, SCC(v) = min{w : reach(v,w) ∧ reach(w,v)} — exact but
# O(closure) memory, small graphs only; the Spark side is the scale
# path. Output: one row per SCC (scc_id = min member id, size).
# --------------------------------------------------------------------------


def q215_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 20 == 0)
    o_id = (F.col("l_orderkey") * 2).cast("long")
    p_id = (F.col("l_partkey") * 2 + 1).cast("long")
    odd = F.col("l_suppkey") % 2 == 1
    edges = li.select(
        F.when(odd, o_id).otherwise(p_id).alias("src"),
        F.when(odd, p_id).otherwise(o_id).alias("dst"),
    ).distinct()
    scc = strongly_connected_components(edges)
    return scc.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )


Q215_SQL = """
WITH RECURSIVE
li AS (
  SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
  WHERE l_partkey % 20 = 0
),
e AS (
  SELECT DISTINCT
    CASE WHEN l_suppkey % 2 = 1 THEN l_orderkey * 2
         ELSE l_partkey * 2 + 1 END AS src,
    CASE WHEN l_suppkey % 2 = 1 THEN l_partkey * 2 + 1
         ELSE l_orderkey * 2 END AS dst
  FROM li
),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
),
pairs AS (
  SELECT r1.src AS v, r1.dst AS w
  FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src
),
scc AS (SELECT v, MIN(w) AS scc_id FROM pairs GROUP BY v)
SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS size FROM scc GROUP BY 1
"""


# --------------------------------------------------------------------------
# q216 — native Spark 4 recursive CTE (SPARK-24497): multi-hop
# reachability from the keystage roots expressed as WITH RECURSIVE ...
# UNION ALL and executed by Catalyst's iterative UnionLoop — no Python
# driver loop at all. Both engines run the IDENTICAL recursive core
# (_Q216_CORE below, depth-guarded UNION ALL walks + MIN(depth)
# regroup, the standard cycle-safe min-depth idiom since neither engine
# allows UNION-dedup recursion); they differ only in the prologue that
# derives the edge set (Spark: a temp view over the resolved KG edge
# table; DuckDB: the shared docs-parquet edge reconstruction). Output:
# per keystage root, the number of nodes first reached at each depth —
# the BFS level profile. Scale: the recursion carries (src, id, depth)
# keys through hash joins; walk counts stay near pair counts on the
# curriculum DAG (measured 2402 walks vs 1072 pairs at depth 4), and
# the depth guard bounds the iteration count statically.
# --------------------------------------------------------------------------

_Q216_CORE = """
walk(src, id, depth) AS (
  SELECT id, id, 0 FROM q216_seeds
  UNION ALL
  SELECT w.src, g.obj, w.depth + 1
  FROM walk w JOIN q216_edges g ON g.subj = w.id
  WHERE w.depth < 4
),
md AS (SELECT src, id, MIN(depth) AS d FROM walk GROUP BY src, id)
SELECT src, d AS depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM md WHERE d > 0 GROUP BY src, d
"""


def q216_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct()
    e.createOrReplaceTempView("q216_edges")
    e.filter(F.col("subj").startswith("ks")).select(
        F.col("subj").alias("id")
    ).distinct().createOrReplaceTempView("q216_seeds")
    return spark.sql("WITH RECURSIVE " + _Q216_CORE)


def _q216_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
q216_edges AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
q216_seeds AS (
  SELECT DISTINCT subj AS id FROM q216_edges WHERE subj LIKE 'ks%'
),
{_Q216_CORE}
"""


# --------------------------------------------------------------------------
# q217 — Luby maximal independent set over the q32 order↔part bipartite
# graph. Engine: operators/components.py:luby_mis — per round ONE
# adjacency⋈priority join + min-aggregate (map-side combined), an
# anti-join retire, two semi-join shrinks; priorities are the shared
# engine-portable md5 hash so the rounds replay bit-identically in the
# oracle. Oracle: the identical algorithm unrolled round-by-round in
# SQL (_q217_sql) — same graph, same hash, same strict-< winner rule.
# Scale: every step is keyed on node id; no global sort, no broadcast
# of anything data-proportional; O(log n) expected rounds (Luby 1986).
# --------------------------------------------------------------------------

_MIS_ROUNDS = 12


def _bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )


def q217_luby_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import luby_mis
    from .common import md5long

    return luby_mis(
        _bipartite_edges(spark, sf_dir),
        priority=md5long,
        max_rounds=_MIS_ROUNDS,
    )


_Q_BIPARTITE_SQL = """
e0 AS (
  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
                  'p' || CAST(l_partkey AS VARCHAR) AS dst
  FROM lineitem WHERE l_partkey % 50 = 0
)"""


def _q217_sql(rounds: int = _MIS_ROUNDS) -> str:
    from .common import MD5LONG_SQL

    parts = [
        _Q_BIPARTITE_SQL,
        """
sym0 AS MATERIALIZED (
  SELECT src AS n, dst AS m FROM e0
  UNION
  SELECT dst AS n, src AS m FROM e0
),
act0 AS MATERIALIZED (
  SELECT n, {p} AS p FROM (SELECT DISTINCT n FROM sym0)
)""".format(p=MD5LONG_SQL.format(x="n")),
    ]
    for r in range(rounds):
        parts.append(f"""
mn{r} AS MATERIALIZED (
  SELECT s.n, MIN(a.p) AS mn
  FROM sym{r} s JOIN act{r} a ON a.n = s.m GROUP BY s.n
),
mis{r} AS MATERIALIZED (
  SELECT a.n, CAST({r} AS INT) AS round
  FROM act{r} a LEFT JOIN mn{r} m ON m.n = a.n
  WHERE m.mn IS NULL OR a.p < m.mn
),
rem{r} AS MATERIALIZED (
  SELECT n FROM mis{r}
  UNION
  SELECT s.n FROM sym{r} s JOIN mis{r} w ON w.n = s.m
),
act{r + 1} AS MATERIALIZED (
  SELECT a.n, a.p FROM act{r} a
  WHERE NOT EXISTS (SELECT 1 FROM rem{r} x WHERE x.n = a.n)
),
sym{r + 1} AS MATERIALIZED (
  SELECT s.n, s.m FROM sym{r} s
  WHERE EXISTS (SELECT 1 FROM act{r + 1} x WHERE x.n = s.n)
    AND EXISTS (SELECT 1 FROM act{r + 1} y WHERE y.n = s.m)
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT n, round FROM mis{r}" for r in range(rounds)
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"\nSELECT n AS id, round FROM ({union})"
    )


# --------------------------------------------------------------------------
# q218 — deterministic distributed maximal matching over the same
# bipartite graph (Hoepman-style mutual-proposal rounds). Engine:
# operators/components.py:maximal_matching — the per-vertex argmin is a
# ROW_NUMBER window PARTITIONED BY VERTEX (never global), the mutual
# check a count-2 aggregate on the edge key, retirement an anti-join.
# The globally minimum-priority surviving edge is matched every round,
# so progress is guaranteed and rounds are O(log n) in practice.
# Oracle: the identical rounds unrolled in SQL with the same md5 edge
# priority.
# --------------------------------------------------------------------------

_MATCH_ROUNDS = 12


def q218_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import maximal_matching
    from .common import md5long

    return maximal_matching(
        _bipartite_edges(spark, sf_dir),
        priority=md5long,
        max_rounds=_MATCH_ROUNDS,
    )


def _q218_sql(rounds: int = _MATCH_ROUNDS) -> str:
    from .common import MD5LONG_SQL

    parts = [
        _Q_BIPARTITE_SQL,
        """
canon0 AS MATERIALIZED (
  SELECT s, d, {q} AS q FROM (
    SELECT DISTINCT LEAST(src, dst) AS s, GREATEST(src, dst) AS d
    FROM e0 WHERE src <> dst
  )
)""".format(q=MD5LONG_SQL.format(x="s || '|' || d")),
    ]
    for r in range(rounds):
        parts.append(f"""
inc{r} AS MATERIALIZED (
  SELECT s AS v, s, d, q FROM canon{r}
  UNION ALL
  SELECT d AS v, s, d, q FROM canon{r}
),
prop{r} AS MATERIALIZED (
  SELECT v, s, d FROM (
    SELECT v, s, d,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY q, s, d) AS rn
    FROM inc{r}
  ) WHERE rn = 1
),
mat{r} AS MATERIALIZED (
  SELECT s, d, CAST({r} AS INT) AS round
  FROM prop{r} GROUP BY s, d HAVING COUNT(*) = 2
),
gone{r} AS MATERIALIZED (SELECT s AS v FROM mat{r} UNION SELECT d FROM mat{r}),
canon{r + 1} AS MATERIALIZED (
  SELECT c.s, c.d, c.q FROM canon{r} c
  WHERE NOT EXISTS (SELECT 1 FROM gone{r} g WHERE g.v = c.s)
    AND NOT EXISTS (SELECT 1 FROM gone{r} g WHERE g.v = c.d)
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT s, d, round FROM mat{r}" for r in range(rounds)
    )
    return "WITH " + ",".join(parts) + f"\nSELECT s, d, round FROM ({union})"


# --------------------------------------------------------------------------
# q219 — Brandes betweenness + Shimbel stress centrality from the
# keystage roots over the curriculum DAG, exact within a fixed BFS
# horizon (depth 4 = the curriculum hierarchy's height). Forward pass:
# level-synchronous BFS carrying INTEGER shortest-path counts sigma
# (one join + one partial-agg sum per level, visited maintained by
# anti-join). Backward pass: Brandes dependency accumulation
# delta(v) = sum_w sigma_v/sigma_w * (1 + delta_w) over shortest-DAG
# successors, plus the integer continuation count c(v) = sum_w (1+c_w)
# giving stress(v) = sigma_v * c(v) — stress is integer-exact, so the
# oracle comparison does not rest on float summation order; bc renders
# at 4dp. Every step is keyed on (source, node): no global sort, no
# driver-side state, O(depth) rounds. Oracle: the identical recurrence
# unrolled level-by-level in SQL over the independently re-derived
# edge set (same prologue as q216/kg65).
# --------------------------------------------------------------------------

_BC_DEPTH = 4


def q219_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import source_betweenness

    gb = _wide(spark, sf_dir)
    e = gb.resolved.select(
        F.col("subj").alias("eu"), F.col("obj").alias("ev")
    ).distinct()
    seeds = (
        e.filter(F.col("eu").startswith("ks"))
        .select(F.col("eu").alias("s"))
        .distinct()
    )
    bc = source_betweenness(e, seeds, depth=_BC_DEPTH)
    return bc.select(
        F.col("v").alias("id"),
        r4(F.col("delta_sum")).alias("bc"),
        "stress",
    )


def _q219_sql(depth: int = _BC_DEPTH) -> str:
    from .kg import _edges_union_sql

    parts = [
        """
ed AS MATERIALIZED (SELECT DISTINCT subj AS eu, obj AS ev FROM edges),
seeds AS (SELECT DISTINCT eu AS s FROM ed WHERE eu LIKE 'ks%'),
f0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS BIGINT) AS sigma FROM seeds),
vis0 AS MATERIALIZED (SELECT s, v FROM f0)"""
    ]
    for lv in range(depth):
        parts.append(f"""
f{lv + 1} AS MATERIALIZED (
  SELECT m.s, m.v, CAST(SUM(m.sigma) AS BIGINT) AS sigma FROM (
    SELECT fr.s AS s, e.ev AS v, fr.sigma
    FROM f{lv} fr JOIN ed e ON e.eu = fr.v
  ) m
  WHERE NOT EXISTS (SELECT 1 FROM vis{lv} x WHERE x.s = m.s AND x.v = m.v)
  GROUP BY m.s, m.v
),
vis{lv + 1} AS MATERIALIZED (
  SELECT s, v FROM vis{lv} UNION ALL SELECT s, v FROM f{lv + 1}
)""")
    parts.append(f"""
d{depth} AS MATERIALIZED (
  SELECT s, v, sigma, CAST(0 AS DOUBLE) AS delta, CAST(0 AS BIGINT) AS c
  FROM f{depth}
)""")
    for lv in range(depth - 1, 0, -1):
        parts.append(f"""
d{lv} AS MATERIALIZED (
  SELECT f.s, f.v, f.sigma,
         COALESCE(SUM(CAST(f.sigma AS DOUBLE) / w.sigma * (1 + w.delta)),
                  0) AS delta,
         CAST(COALESCE(SUM(1 + w.c), 0) AS BIGINT) AS c
  FROM f{lv} f
  LEFT JOIN ed e ON e.eu = f.v
  LEFT JOIN d{lv + 1} w ON w.s = f.s AND w.v = e.ev
  GROUP BY f.s, f.v, f.sigma
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT v, delta, sigma * c AS st FROM d{lv}"
        for lv in range(1, depth + 1)
    )
    base = _edges_union_sql()
    return f"""
{base},
{",".join(parts)}
SELECT v AS id, ROUND(SUM(delta), 4) AS bc,
       CAST(SUM(st) AS BIGINT) AS stress
FROM ({union}) GROUP BY v
"""


# --------------------------------------------------------------------------
# q225 — minimum spanning forest by distributed Borůvka over a
# hash-weighted order↔part graph. Engine: operators/components.py:
# boruvka_forest — per round a per-component argmin (ROW_NUMBER window
# PARTITIONED BY component) hooks each component's minimum outgoing
# edge under the total order (w, s, d); component count halves per
# round (O(log n) rounds), relabeling via connected_components. With a
# total order on edges the MSF is unique, so the oracle can be a
# SEQUENTIAL Kruskal — expressed as a DuckDB recursive CTE whose state
# row carries the (node → component) list and the kept-edge list, one
# edge per step in (w, s, d) order. Different algorithm, same unique
# answer: exactly the cross-check you want for an MSF at scale.
# The edge SAMPLE is scale-aware (modulus grows with sf so the sampled
# graph stays ~600 edges): the serial Kruskal oracle is O(E·V) in list
# ops — at sf0.1 a fixed modulus made the ORACLE the bottleneck (>45
# min) while the distributed Borůvka side finished in seconds. The
# correctness statement is per-edge-sample exact, at every sf.
# --------------------------------------------------------------------------


def _msf_modulus(n_docs: int) -> int:
    return 100 * max(1, n_docs // 4000)


def q225_boruvka_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import boruvka_forest
    from .common import md5long
    from .kg import n_docs_for

    li = load(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_partkey") % _msf_modulus(n_docs_for(sf_dir)) == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
        .withColumn("w", md5long(F.concat_ws("|", "src", "dst")))
    )
    return boruvka_forest(e)


def _q225_sql() -> str:
    from .common import MD5LONG_SQL
    from .kg import ORACLE_SF_NDOCS

    w = MD5LONG_SQL.format(x="src || '|' || dst")
    m = _msf_modulus(ORACLE_SF_NDOCS)
    return f"""
WITH RECURSIVE
e0 AS (
  SELECT src, dst, {w} AS w FROM (
    SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
                    'p' || CAST(l_partkey AS VARCHAR) AS dst
    FROM lineitem WHERE l_partkey % {m} = 0
  )
),
ec AS (
  SELECT LEAST(src, dst) AS s, GREATEST(src, dst) AS d, MIN(w) AS w
  FROM e0 WHERE src <> dst GROUP BY 1, 2
),
nodes AS (SELECT DISTINCT s AS id FROM ec UNION SELECT d FROM ec),
ranked AS (
  SELECT s, d, w, ROW_NUMBER() OVER (ORDER BY w, s, d) AS i FROM ec
),
nmax AS (SELECT COUNT(*) AS n FROM ranked),
st(i, comps, kept) AS (
  SELECT 0,
         (SELECT list(struct_pack(node := id, comp := id) ORDER BY id)
          FROM nodes),
         CAST([] AS STRUCT(s VARCHAR, d VARCHAR, w BIGINT)[])
  UNION ALL
  SELECT st.i + 1,
         CASE WHEN
           list_filter(st.comps, x -> x.node = r.s)[1].comp
           <> list_filter(st.comps, x -> x.node = r.d)[1].comp
         THEN list_transform(st.comps, x ->
            CASE WHEN x.comp = list_filter(st.comps, y -> y.node = r.d)[1].comp
                 THEN struct_pack(node := x.node,
                      comp := list_filter(st.comps, y -> y.node = r.s)[1].comp)
                 ELSE x END)
         ELSE st.comps END,
         CASE WHEN
           list_filter(st.comps, x -> x.node = r.s)[1].comp
           <> list_filter(st.comps, x -> x.node = r.d)[1].comp
         THEN list_append(st.kept, struct_pack(s := r.s, d := r.d, w := r.w))
         ELSE st.kept END
  FROM st JOIN ranked r ON r.i = st.i + 1
),
fin AS (SELECT kept FROM st, nmax WHERE st.i = nmax.n)
SELECT k.s, k.d, k.w FROM (SELECT unnest(kept) AS k FROM fin)
"""


# --------------------------------------------------------------------------
# q232 — BUTTERFLY COUNTING (2×2 bicliques; Sanei-Mehri et al. 2018,
# "Butterfly Counting in Bipartite Networks"): the bipartite analogue
# of triangle counting — the motif that defines bipartite clustering
# coefficient and k-bitruss decompositions. Triangles don't exist in a
# bipartite graph, so q51's census says nothing about the order↔part
# graph; butterflies do. Method: wedges through the PART side (for a
# part of degree d there are C(d,2) order pairs), aggregated per
# (order, order) pair — a pair co-supported by m parts contributes
# C(m,2) butterflies. Σ wedges and Σ C(m,2) are exact integer
# aggregates. The part-side wedge fan-out is bounded by a degree cap
# (parts above _BFC_DEG_CAP are excluded and REPORTED — the q27 df
# bound; at production scale the cap is the hub-mitigation knob, and
# the capped hubs get the exact per-hub treatment triangles give
# their skew). One summary row: wedges, co-support pairs, butterflies,
# capped parts.
# --------------------------------------------------------------------------

_BFC_DEG_CAP = 256


def q232_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _bipartite_edges(spark, sf_dir)
    deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    ok = deg.filter(F.col("d") <= _BFC_DEG_CAP).select("dst", "d")
    n_capped = deg.filter(F.col("d") > _BFC_DEG_CAP).agg(
        F.count(F.lit(1)).cast("long").alias("capped_parts")
    )
    e2 = e.join(ok.select("dst"), "dst")
    a = e2.select(F.col("src").alias("o1"), "dst")
    b = e2.select(F.col("src").alias("o2"), "dst")
    pairs = (
        a.join(b, "dst")
        .filter(F.col("o1") < F.col("o2"))
        .groupBy("o1", "o2")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    stats = pairs.agg(
        F.sum("m").cast("long").alias("wedges"),
        F.count(F.lit(1)).cast("long").alias("cosupport_pairs"),
        F.sum(F.col("m") * (F.col("m") - 1) / 2)
        .cast("long")
        .alias("butterflies"),
    )
    return stats.crossJoin(n_capped)


_Q232_SQL = f"""
WITH {_Q_BIPARTITE_SQL.lstrip()},
deg AS (SELECT dst, COUNT(*) AS d FROM e0 GROUP BY dst),
ok AS (SELECT dst FROM deg WHERE d <= {_BFC_DEG_CAP}),
capped AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS capped_parts
  FROM deg WHERE d > {_BFC_DEG_CAP}
),
e2 AS (SELECT src, dst FROM e0 JOIN ok USING (dst)),
pairs AS (
  SELECT a.src AS o1, b.src AS o2, COUNT(*) AS m
  FROM e2 a JOIN e2 b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
),
stats AS (
  SELECT CAST(SUM(m) AS BIGINT) AS wedges,
         CAST(COUNT(*) AS BIGINT) AS cosupport_pairs,
         CAST(SUM(m * (m - 1) / 2) AS BIGINT) AS butterflies
  FROM pairs
)
SELECT stats.*, capped.capped_parts FROM stats, capped
"""


# --------------------------------------------------------------------------
# q240 — WEISFEILER-LEHMAN color refinement (1-WL / canonical color
# refinement): the structural node-fingerprinting primitive behind
# graph-isomorphism tests, WL graph kernels, and structure-based
# entity canonicalization — two nodes share a round-r color iff their
# r-hop neighborhood trees are identical. Recurrence: c_{r}(v) =
# H(c_{r-1}(v) | sorted multiset of neighbor colors), H the engine-
# portable md5long. Spark shape per round: ONE hash join of the edge
# list against the (node, color) table plus one groupBy(node) —
# identical to the LPA/PageRank Pregel-on-DataFrames posture; colors
# are fixed-width 60-bit ints so signatures never grow with rounds
# (the string-concat naive form explodes; hashing each round is the
# distributed-WL standard). Output: the refinement trajectory —
# per-round color-class counts — whose stabilization (n_colors flat)
# is the convergence certificate. Oracle: the same recurrence
# unrolled, string_agg(... ORDER BY lab) matching Spark's numeric
# array_sort for the multiset canonical order.
# --------------------------------------------------------------------------

_WL_ROUNDS = 3


def q240_wl_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = e0.select(F.col("src").alias("n"), F.col("dst").alias("m")).unionAll(
        e0.select(F.col("dst").alias("n"), F.col("src").alias("m"))
    )
    # round-0 color: the node's type tag — WL starts from node labels
    cur = (
        edges.select("n")
        .distinct()
        .select("n", md5long(F.substring("n", 1, 1)).alias("lab"))
    )

    def stats(df: DataFrame, rnd: int) -> DataFrame:
        return (
            df.groupBy("lab")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.lit(rnd).cast("int").alias("rnd"),
                F.count(F.lit(1)).cast("long").alias("n_colors"),
                F.max("c").cast("long").alias("largest_class"),
            )
        )

    out = stats(cur, 0)
    for _ in range(1, _WL_ROUNDS + 1):
        nb = edges.join(
            cur.select(F.col("n").alias("m"), F.col("lab").alias("nlab")), "m"
        ).join(cur, "n")
        sig = nb.groupBy("n", "lab").agg(
            F.concat(
                F.col("lab").cast("string"),
                F.lit("|"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("nlab")),
                        lambda x: x.cast("string"),
                    ),
                ),
            ).alias("sig")
        )
        cur = sig.select("n", md5long(F.col("sig")).alias("lab"))
        out = out.unionAll(stats(cur, _))
    return out


def _q240_sql() -> str:
    from .common import MD5LONG_SQL

    ctes = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
                  'p' || CAST(l_partkey AS VARCHAR) AS dst
  FROM lineitem WHERE l_partkey % 50 = 0
), edges AS MATERIALIZED (
  SELECT src AS n, dst AS m FROM e0
  UNION ALL
  SELECT dst AS n, src AS m FROM e0
), l0 AS (
  SELECT DISTINCT n,
         {MD5LONG_SQL.format(x="substring(n, 1, 1)")} AS lab
  FROM edges)"""
    ]
    for r in range(1, _WL_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""s{r} AS (
  SELECT e.n,
         CAST(l.lab AS VARCHAR) || '|' ||
         string_agg(CAST(c.lab AS VARCHAR), ',' ORDER BY c.lab) AS sig
  FROM edges e
  JOIN l{p} c ON c.n = e.m
  JOIN l{p} l ON l.n = e.n
  GROUP BY e.n, l.lab
), l{r} AS MATERIALIZED (
  SELECT n, {MD5LONG_SQL.format(x="sig")} AS lab FROM s{r})"""
        )
    unions = "\nUNION ALL\n".join(
        f"""SELECT {t} AS rnd, CAST(COUNT(*) AS BIGINT) AS n_colors,
       CAST(MAX(c) AS BIGINT) AS largest_class
FROM (SELECT lab, COUNT(*) AS c FROM l{t} GROUP BY lab)"""
        for t in range(_WL_ROUNDS + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(rnd AS INTEGER) AS rnd, n_colors, largest_class
FROM ({unions})
"""
    )


# --------------------------------------------------------------------------
# q245 — per-community CONDUCTANCE φ(S) = cut(S) / min(vol(S), 2m −
# vol(S)): the community-quality metric that complements q91's global
# modularity — a low-conductance community has few escaping edges
# relative to its volume, the certificate that a partition is usable
# for locality-aware sharding (place a community on one executor and
# the cut IS the cross-node traffic). Communities come from the same
# deterministic LPA as q68; conductance is then two groupBys over the
# label-joined directed edge list (vol = directed-from-S count, cut =
# directed-from-S-leaving count, so the undirected cut is counted
# once per side exactly as the definition wants) plus a broadcast
# 1-row 2m total. Degenerate communities (vol = 0 or the whole graph)
# are excluded — min(vol, 2m − vol) = 0 has no defined conductance.
# --------------------------------------------------------------------------


def q245_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    comm = label_propagation(e0)  # (id, community)
    edges = e0.select(F.col("src").alias("n"), F.col("dst").alias("m")).unionAll(
        e0.select(F.col("dst").alias("n"), F.col("src").alias("m"))
    )
    lbl = comm.select(F.col("id").alias("n"), F.col("community").alias("cn"))
    e2 = (
        edges.join(lbl, "n")
        .join(
            comm.select(
                F.col("id").alias("m"), F.col("community").alias("cm")
            ),
            "m",
        )
        .select("cn", "cm")
    )
    per = e2.groupBy("cn").agg(
        F.count(F.lit(1)).alias("vol"),
        F.count(F.when(F.col("cn") != F.col("cm"), 1)).alias("cut"),
    )
    m2 = e2.agg(F.count(F.lit(1)).alias("m2"))
    sz = comm.groupBy(F.col("community").alias("cn")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    return (
        per.join(sz, "cn")
        .crossJoin(F.broadcast(m2))
        .filter((F.col("vol") > 0) & (F.col("vol") < F.col("m2")))
        .select(
            F.col("cn").alias("community"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("vol").cast("long").alias("volume"),
            F.col("cut").cast("long").alias("cut_edges"),
            F.round(
                F.col("cut")
                / F.least(F.col("vol"), F.col("m2") - F.col("vol")),
                6,
            ).alias("conductance"),
        )
    )


def _q245_sql(rounds: int = _LPA_ROUNDS) -> str:
    return (
        _lpa_cte(rounds)
        + f""",
lbl AS (SELECT n, lab FROM l{rounds}),
e2 AS (
  SELECT a.lab AS cn, b.lab AS cm
  FROM edges e JOIN lbl a ON e.n = a.n JOIN lbl b ON e.m = b.n
), per AS (
  SELECT cn, COUNT(*) AS vol,
         COUNT(*) FILTER (WHERE cn <> cm) AS cut
  FROM e2 GROUP BY cn
), m2 AS (SELECT COUNT(*) AS m2 FROM e2),
sz AS (SELECT lab AS cn, COUNT(*) AS n_nodes FROM lbl GROUP BY lab)
SELECT per.cn AS community,
       CAST(sz.n_nodes AS BIGINT) AS n_nodes,
       CAST(per.vol AS BIGINT) AS volume,
       CAST(per.cut AS BIGINT) AS cut_edges,
       ROUND(per.cut / (1.0 * LEAST(per.vol, m2.m2 - per.vol)), 6)
         AS conductance
FROM per JOIN sz ON per.cn = sz.cn CROSS JOIN m2
WHERE per.vol > 0 AND per.vol < m2.m2
"""
    )


# --------------------------------------------------------------------------
# kg95 — Katz centrality over the resolved curriculum graph: x⁰ = 1,
# x^{k+1}(i) = 1 + α·Σ_{j→i} x^k(j), fixed 6 iterations, α = 0.05 (well
# under 1/λmax for this shallow DAG). Unlike PageRank there is no
# out-degree normalization and no damping redistribution — Katz counts
# attenuated in-paths of every length, so hub scores grow with the full
# upstream path census. Scale posture: `edges` is repartitioned on the
# join key once and persisted; every iteration reuses that partitioning
# and adds only the groupBy(obj) combine exchange; lineage is cut per
# round with localCheckpoint. The oracle unrolls the same recurrence
# into one CTE per iteration over the independent `edges` union.
# --------------------------------------------------------------------------

_KATZ_ITERS = 6
_KATZ_A = 0.05


def kg95_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    edges = (
        gb.resolved.select("subj", "obj")
        .distinct()
        .repartition("subj")
        .persist()
    )
    verts = (
        edges.select(F.col("subj").alias("id"))
        .union(edges.select(F.col("obj").alias("id")))
        .distinct()
        .repartition("id")
        .persist()
    )
    x = verts.select("id", F.lit(1.0).alias("x"))
    for _ in range(_KATZ_ITERS):
        contrib = (
            edges.join(
                x.select(F.col("id").alias("_sid"), "x"),
                edges.subj == F.col("_sid"),
            )
            .groupBy(F.col("obj").alias("_cid"))
            .agg(F.sum("x").alias("c"))
        )
        x = (
            verts.join(contrib, verts.id == F.col("_cid"), "left")
            .select(
                verts.id,
                (
                    F.lit(1.0)
                    + F.lit(_KATZ_A) * F.coalesce("c", F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint()
        )
    out = x.select("id", F.round("x", 8).alias("katz"))
    edges.unpersist()
    verts.unpersist()
    return out


def _kg95_sql(iters: int = _KATZ_ITERS, a: float = _KATZ_A) -> str:
    from .kg import _edges_union_sql

    steps = [
        """
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
verts AS MATERIALIZED (SELECT subj AS id FROM e UNION SELECT obj FROM e),
x0 AS MATERIALIZED (SELECT id, 1.0 AS x FROM verts)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        steps.append(
            f"""
c{k} AS (SELECT e.obj AS id, SUM(p.x) AS c
         FROM e JOIN x{p} p ON e.subj = p.id GROUP BY e.obj),
x{k} AS MATERIALIZED (SELECT v.id,
         1.0 + CAST({a} AS DOUBLE) * COALESCE(c.c, 0) AS x
         FROM verts v LEFT JOIN c{k} c ON c.id = v.id)"""
        )
    return (
        f"{_edges_union_sql()},\n"
        + ",".join(steps)
        + f"\nSELECT id, round(x, 8) AS katz FROM x{iters}"
    )


# --------------------------------------------------------------------------
# kg96 — Wu-Palmer taxonomic similarity (Wu & Palmer 1994) for unit
# pairs that share a curriculum thread: sim(a,b) = 2·depth(LCA) /
# (depth(a)+depth(b)) with depth(root)=1 (kg66's BFS min-depth + 1) and
# LCA = the deepest common ancestor in the hierarchy DAG. Ancestor sets
# come from an upward transitive closure seeded only at the (bounded)
# unit set — 8 fixed join rounds cover the ≤5-hop unit→root chains —
# so the closure is |units|·|chain|, never a full-graph closure. The
# pair set is bounded per thread (thread-sibling units), the LCA join
# fans out at ≤ |anc(a)|·|anc(b)| ≈ 10×10 per pair, and the per-thread
# rollup keeps the result compact. Oracle: two recursive CTEs (BFS
# depth + ancestor closure) over the independent `edges` union.
# --------------------------------------------------------------------------

_LCA_ROUNDS = 8


def kg96_lca_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    depth = kg66_bfs_depth(spark, sf_dir).withColumnRenamed("depth", "d")

    tu = (
        gb.resolved.filter(F.col("pred") == "HAS_THREAD")
        .select(F.col("subj").alias("unit"), F.col("obj").alias("thread"))
        .distinct()
        .persist()
    )
    units = tu.select("unit").distinct()

    # Upward closure: (unit, ancestor) incl. self; frontier-at-distance-k
    # expansion, duplicates collapsed per round by distinct.
    up = e.select(F.col("subj").alias("_p"), F.col("obj").alias("_c"))
    anc = units.select("unit", F.col("unit").alias("a"))
    frontier = anc
    for _ in range(_LCA_ROUNDS):
        frontier = (
            frontier.join(up, frontier.a == up._c)
            .select("unit", F.col("_p").alias("a"))
            .distinct()
            .localCheckpoint()
        )
        anc = anc.union(frontier)
    anc = anc.distinct().persist()

    pairs = (
        tu.alias("t1")
        .join(tu.alias("t2"), "thread")
        .filter(F.col("t1.unit") < F.col("t2.unit"))
        .select(
            "thread",
            F.col("t1.unit").alias("ua"),
            F.col("t2.unit").alias("ub"),
        )
    )
    a1 = anc.select(F.col("unit").alias("ua"), "a")
    a2 = anc.select(F.col("unit").alias("ub"), "a")
    lca = (
        pairs.join(a1, "ua")
        .join(a2, ["ub", "a"])
        .join(depth.select(F.col("id").alias("a"), "d"), "a")
        .groupBy("thread", "ua", "ub")
        .agg(F.max("d").alias("dl"))
    )
    da = depth.select(F.col("id").alias("ua"), F.col("d").alias("da"))
    db = depth.select(F.col("id").alias("ub"), F.col("d").alias("db"))
    sims = (
        lca.join(da, "ua")
        .join(db, "ub")
        .select(
            "thread",
            (
                2.0
                * (F.col("dl") + 1)
                / ((F.col("da") + 1) + (F.col("db") + 1))
            ).alias("sim"),
        )
    )
    out = sims.groupBy("thread").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("sim"), 6).alias("avg_sim"),
        F.round(F.min("sim"), 6).alias("min_sim"),
        F.round(F.max("sim"), 6).alias("max_sim"),
    )
    for c in (e, tu, anc):
        c.unpersist()
    return out


def _kg96_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
roots AS (SELECT DISTINCT subj AS id FROM e
          WHERE subj NOT IN (SELECT obj FROM e)),
bfs AS (
  SELECT id, 0 AS depth FROM roots
  UNION
  SELECT e.obj, b.depth + 1 FROM e JOIN bfs b ON e.subj = b.id
  WHERE b.depth < {_BFS_MAX_DEPTH}
),
dep AS MATERIALIZED (SELECT id, MIN(depth) AS d FROM bfs GROUP BY id),
tu AS MATERIALIZED (SELECT DISTINCT subj AS unit, obj AS thread
                    FROM edges WHERE pred = 'HAS_THREAD'),
units AS (SELECT DISTINCT unit FROM tu),
anc AS (
  SELECT unit, unit AS a FROM units
  UNION
  SELECT anc.unit, e.subj FROM anc JOIN e ON e.obj = anc.a
),
pairs AS (
  SELECT t1.thread, t1.unit AS ua, t2.unit AS ub
  FROM tu t1 JOIN tu t2 ON t1.thread = t2.thread AND t1.unit < t2.unit
),
lca AS (
  SELECT p.thread, p.ua, p.ub, MAX(d.d) AS dl
  FROM pairs p
  JOIN anc a1 ON a1.unit = p.ua
  JOIN anc a2 ON a2.unit = p.ub AND a2.a = a1.a
  JOIN dep d ON d.id = a1.a
  GROUP BY 1, 2, 3
),
sims AS (
  SELECT l.thread,
         2.0 * (l.dl + 1) / ((da.d + 1) + (db.d + 1)) AS sim
  FROM lca l JOIN dep da ON da.id = l.ua JOIN dep db ON db.id = l.ub
)
SELECT thread, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(sim), 6) AS avg_sim,
       ROUND(MIN(sim), 6) AS min_sim,
       ROUND(MAX(sim), 6) AS max_sim
FROM sims GROUP BY thread
"""


# --------------------------------------------------------------------------
# kg97 — densest-subgraph peeling (Charikar 2000 greedy, Bahmani/
# Kumar/Vassilvitskii VLDB 2012 MapReduce variant): per round compute
# the density ρ = |E|/|V| of the surviving undirected graph, then drop
# every node with degree < 2(1+ε)ρ. With ε = 1 the loop needs only
# O(log₂ n) rounds and the best surviving round is a 2(1+ε)-approx of
# the densest subgraph. The threshold scalar stays a lazy broadcast
# 1-row aggregate (PageRank's dangling-mass pattern — never a driver
# collect), each round localCheckpoints, and rounds after the graph
# empties render no row on either engine. Output: one row per surviving
# round + is_best marking the densest round (tiny aggregated table, so
# the unpartitioned max-window is exempt). Oracle: the same peel
# unrolled round-by-round in SQL.
# --------------------------------------------------------------------------

_DSG_ROUNDS = 16
_DSG_EPS = 1.0


def kg97_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = (
        gb.resolved.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    thr = 2.0 * (1.0 + _DSG_EPS)
    per_round = None
    for k in range(_DSG_ROUNDS):
        # Empty-graph early exit. Rounds past emptiness render no row on
        # either engine (n_nodes > 0 filters them), so breaking here never
        # changes the result — it only avoids piling checkpoint rounds on
        # a 0-partition RDD, where localCheckpoint cannot truncate lineage
        # and per-round planning cost compounds (measured: 0.2s → 188s by
        # round 14 on an empty graph).
        if not e.take(1):
            break
        deg = (
            e.select(F.col("a").alias("id"))
            .union(e.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist()
        )
        stats = deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.coalesce(F.sum("deg"), F.lit(0)) / 2).cast("long").alias("n_edges"),
        )
        row = stats.filter(F.col("n_nodes") > 0).select(
            F.lit(k).cast("long").alias("round"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            "n_edges",
            F.round(F.col("n_edges") / F.col("n_nodes"), 6).alias("density"),
        )
        per_round = row if per_round is None else per_round.union(row)
        kept = (
            deg.crossJoin(F.broadcast(stats))
            .filter(
                F.col("deg")
                >= F.lit(thr) * F.col("n_edges") / F.col("n_nodes")
            )
            .select("id")
        )
        e = (
            e.join(kept.withColumnRenamed("id", "a"), "a")
            .join(kept.withColumnRenamed("id", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
        deg.unpersist()
    if per_round is None:  # empty graph: no rounds rendered (oracle: 0 rows)
        return spark.createDataFrame(
            [],
            "round long, n_nodes long, n_edges long, density double, "
            "is_best boolean",
        )
    w = Window.orderBy(F.lit(1))
    return per_round.withColumn(
        "is_best",
        (F.col("density") == F.max("density").over(w)).cast("boolean"),
    )


def _kg97_sql(rounds: int = _DSG_ROUNDS, eps: float = _DSG_EPS) -> str:
    from .kg import _edges_union_sql

    steps = [
        """
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
  FROM edges WHERE subj <> obj)"""
    ]
    rows = []
    thr = 2.0 * (1.0 + eps)
    for k in range(rounds):
        steps.append(
            f"""
deg{k} AS (SELECT id, COUNT(*) AS deg FROM (
  SELECT a AS id FROM e{k} UNION ALL SELECT b FROM e{k}) GROUP BY id),
st{k} AS MATERIALIZED (SELECT COUNT(*) AS n_nodes,
  CAST(COALESCE(SUM(deg), 0) / 2 AS BIGINT) AS n_edges FROM deg{k}),
e{k + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{k} e
  JOIN deg{k} da ON da.id = e.a
  JOIN deg{k} db ON db.id = e.b
  CROSS JOIN st{k} s
  WHERE da.deg >= {thr} * s.n_edges / s.n_nodes
    AND db.deg >= {thr} * s.n_edges / s.n_nodes)"""
        )
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS round, "
            f"CAST(n_nodes AS BIGINT) AS n_nodes, n_edges, "
            f"ROUND(n_edges / (1.0 * n_nodes), 6) AS density "
            f"FROM st{k} WHERE n_nodes > 0"
        )
    union = " UNION ALL ".join(rows)
    return (
        f"{_edges_union_sql()},\n"
        + ",".join(steps)
        + f""",
per_round AS ({union})
SELECT round, n_nodes, n_edges, density,
       density = (SELECT MAX(density) FROM per_round) AS is_best
FROM per_round
"""
    )


# --------------------------------------------------------------------------
# kg98 — SHACL-style shape validation: declared cardinality constraints
# per (focus label, outgoing predicate) — sh:minCount / sh:maxCount of
# a property shape — validated against EVERY node of the focus label,
# including nodes with zero edges (which kg78's edge-only profile can
# never see). The node universe is the fused (label, nid) melt the
# resolver itself consumes (ONE exchange for all labels, kg84's
# pattern), edge counts are one partial-agg shuffle, and the constraint
# table is a broadcast literal — the shape a SHACL engine compiles to
# at 10⁹ nodes. Output: per constraint, node/conformance/violation
# counts. Oracle: the same constraints as a VALUES table joined to the
# independent dim_* / edges CTEs.
# --------------------------------------------------------------------------

_SHACL_CONSTRAINTS = [
    # (focus label, predicate, sh:minCount, sh:maxCount or None)
    ("Phase", "HAS_KEY_STAGE", 1, 4),
    ("Keystage", "HAS_YEAR", 1, 6),
    ("Unitoffering", "HAS_PROGRAMME", 1, None),
    ("Unit", "HAS_UNITVARIANT", 1, None),
    ("Unit", "HAS_THREAD", 0, 10),
    ("Unitvariant", "HAS_LESSON", 1, None),
]


def kg98_shacl_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    cons = spark.createDataFrame(
        _SHACL_CONSTRAINTS, "label string, pred string, min_c int, max_c int"
    )
    nodes = gb.extras["dims"].select(
        "label", F.col("nid").cast("string").alias("id")
    )
    focus = nodes.join(F.broadcast(cons), "label")
    cnt = (
        gb.resolved.select(
            F.col("subj_label").alias("label"),
            "pred",
            F.col("subj").alias("id"),
            "obj",
        )
        .distinct()
        .groupBy("label", "pred", "id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = focus.join(cnt, ["label", "pred", "id"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0))
    )
    v_min = (F.col("c") < F.col("min_c")).cast("int")
    v_max = (
        F.col("max_c").isNotNull() & (F.col("c") > F.col("max_c"))
    ).cast("int")
    return (
        j.groupBy("label", "pred", "min_c", "max_c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(v_min).cast("long").alias("n_viol_min"),
            F.sum(v_max).cast("long").alias("n_viol_max"),
            F.sum(
                ((v_min == 0) & (v_max == 0)).cast("int")
            ).cast("long").alias("n_conforming"),
        )
        .withColumn(
            "conformance",
            F.round(F.col("n_conforming") / F.col("n_nodes"), 6),
        )
    )


def _kg98_sql() -> str:
    from .kg import _edges_union_sql

    vals = ", ".join(
        f"('{lbl}', '{pred}', {mn}, {'NULL' if mx is None else mx})"
        for lbl, pred, mn, mx in _SHACL_CONSTRAINTS
    )
    labels = sorted({lbl for lbl, _, _, _ in _SHACL_CONSTRAINTS})
    nodes_all = " UNION ALL ".join(
        f"SELECT '{lbl}' AS label, id FROM dim_{lbl}" for lbl in labels
    )
    return f"""
{_edges_union_sql()},
cons AS (SELECT label, pred, CAST(min_c AS INTEGER) AS min_c,
                CAST(max_c AS INTEGER) AS max_c
         FROM (VALUES {vals}) t(label, pred, min_c, max_c)),
nodes_all AS ({nodes_all}),
cnts AS (SELECT subj_label AS label, pred, subj AS id, COUNT(*) AS c
         FROM edges GROUP BY 1, 2, 3),
per_node AS (
  SELECT co.label, co.pred, co.min_c, co.max_c, n.id,
         COALESCE(ct.c, 0) AS c
  FROM cons co
  JOIN nodes_all n ON n.label = co.label
  LEFT JOIN cnts ct
    ON ct.label = co.label AND ct.pred = co.pred AND ct.id = n.id
)
SELECT label, pred, min_c, max_c,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CASE WHEN c < min_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_viol_min,
       CAST(SUM(CASE WHEN max_c IS NOT NULL AND c > max_c
                THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_max,
       CAST(SUM(CASE WHEN c >= min_c
                AND (max_c IS NULL OR c <= max_c)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_conforming,
       ROUND(SUM(CASE WHEN c >= min_c AND (max_c IS NULL OR c <= max_c)
                 THEN 1 ELSE 0 END) / (1.0 * COUNT(*)), 6) AS conformance
FROM per_node GROUP BY 1, 2, 3, 4
"""


# --------------------------------------------------------------------------
# kg100 — SNAP graph summarization (Tian, Hankins & Patel, SIGMOD 2008
# "Efficient Aggregation for Graph Summarization", the A-compatible
# grouping): nodes collapse into supernodes keyed by (label, sorted set
# of outgoing (pred → neighbor label) kinds, sorted set of incoming
# (source label → pred) kinds). The summary is the compressed schema-
# level view a KG QA pass reads instead of 10⁹ rows. Plan: the edge
# table aggregates once per direction (two partial-agg shuffles on
# subj / obj), the signature group-by is a third — no joins wider than
# the node table, no per-node Python. Oracle: DuckDB string_agg with
# DISTINCT + ORDER BY rebuilds the identical signatures.
# --------------------------------------------------------------------------


def kg100_snap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    # Schemaversion is the synthetic run-metadata singleton — not part
    # of the instance graph the summary describes.
    nodes = gb.extras["dims"].filter(
        F.col("label") != "Schemaversion"
    ).select("label", F.col("nid").cast("string").alias("id"))
    e = gb.resolved.select(
        "subj_label", "pred", "obj_label", "subj", "obj"
    ).distinct()
    outs = (
        e.select(
            F.col("subj_label").alias("label"),
            F.col("subj").alias("id"),
            F.concat_ws(">", "pred", "obj_label").alias("k"),
        )
        .groupBy("label", "id")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("k"))).alias(
                "out_sig"
            )
        )
    )
    ins = (
        e.select(
            F.col("obj_label").alias("label"),
            F.col("obj").alias("id"),
            F.concat_ws(">", "subj_label", "pred").alias("k"),
        )
        .groupBy("label", "id")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("k"))).alias(
                "in_sig"
            )
        )
    )
    sig = (
        nodes.join(outs, ["label", "id"], "left")
        .join(ins, ["label", "id"], "left")
        .withColumn("out_sig", F.coalesce("out_sig", F.lit("")))
        .withColumn("in_sig", F.coalesce("in_sig", F.lit("")))
    )
    return sig.groupBy("label", "out_sig", "in_sig").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("id").alias("sample_id"),
    )


def _kg100_sql() -> str:
    from .kg import _LABEL_ID_SQL, _edges_union_sql

    labels = sorted(_LABEL_ID_SQL) + ["Thread"]
    nodes_all = " UNION ALL ".join(
        f"SELECT '{lbl}' AS label, id FROM dim_{lbl}" for lbl in labels
    )
    return f"""
{_edges_union_sql()},
nodes_all AS ({nodes_all}),
outs AS (
  SELECT subj_label AS label, subj AS id,
         string_agg(DISTINCT pred || '>' || obj_label, '|'
                    ORDER BY pred || '>' || obj_label) AS out_sig
  FROM edges GROUP BY 1, 2
),
ins AS (
  SELECT obj_label AS label, obj AS id,
         string_agg(DISTINCT subj_label || '>' || pred, '|'
                    ORDER BY subj_label || '>' || pred) AS in_sig
  FROM edges GROUP BY 1, 2
),
sig AS (
  SELECT n.label, n.id,
         COALESCE(o.out_sig, '') AS out_sig,
         COALESCE(i.in_sig, '') AS in_sig
  FROM nodes_all n
  LEFT JOIN outs o ON o.label = n.label AND o.id = n.id
  LEFT JOIN ins i ON i.label = n.label AND i.id = n.id
)
SELECT label, out_sig, in_sig,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(id) AS sample_id
FROM sig GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# kg101 — transitive-reduction audit of the curriculum DAG: an edge
# (u, v) is REDUNDANT when some alternative path u →⁺ v of length ≥ 2
# already implies it (Aho, Garey & Ullman 1972) — for prerequisite-style
# graphs these are the edges a minimal KG drops. Reachability-at-2-plus
# is built by ≤ 8 frontier-join rounds seeded at the edge tails (the
# kg96 bounded-closure pattern: per-round distinct + localCheckpoint,
# never a full all-pairs closure), then one semi-join flags redundant
# edges and a per-predicate rollup renders the reduction rate. Oracle:
# recursive-CTE paths with depth ≥ 2 over the independent edges union.
# --------------------------------------------------------------------------

_TR_ROUNDS = 8


def kg101_transitive_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    hop = e.select(F.col("subj").alias("u"), F.col("obj").alias("m"))
    cur = hop
    reach2: DataFrame | None = None
    for _ in range(_TR_ROUNDS - 1):
        cur = (
            cur.join(e, cur.m == e.subj)
            .select("u", F.col("obj").alias("m"))
            .distinct()
            .localCheckpoint()
        )
        if not cur.take(1):
            break
        reach2 = cur if reach2 is None else reach2.union(cur)
    ep = gb.resolved.select("pred", "subj", "obj").distinct()
    if reach2 is not None:
        red = ep.join(
            reach2.select(
                F.col("u").alias("subj"), F.col("m").alias("obj")
            ).distinct(),
            ["subj", "obj"],
            "left_semi",
        )
    else:  # pragma: no cover — every real build has 2-hop paths
        red = ep.limit(0)
    n_red = red.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_redundant")
    )
    out = (
        ep.groupBy("pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .join(n_red, "pred", "left")
        .withColumn("n_redundant", F.coalesce("n_redundant", F.lit(0)))
        .withColumn(
            "reduction_rate",
            F.round(F.col("n_redundant") / F.col("n_edges"), 6),
        )
    )
    e.unpersist()
    return out


def _kg101_sql() -> str:
    from .kg import _edges_union_sql

    base = _edges_union_sql().replace("WITH sp AS", "WITH RECURSIVE sp AS", 1)
    return f"""
{base},
e AS MATERIALIZED (SELECT DISTINCT subj, obj FROM edges),
paths AS (
  SELECT subj AS u, obj AS m, 1 AS depth FROM e
  UNION
  SELECT p.u, e.obj, p.depth + 1 FROM paths p
  JOIN e ON e.subj = p.m WHERE p.depth < {_TR_ROUNDS}
),
reach2 AS MATERIALIZED (SELECT DISTINCT u, m FROM paths WHERE depth >= 2),
ep AS (SELECT DISTINCT pred, subj, obj FROM edges),
red AS (
  SELECT ep.pred, COUNT(*) AS n_redundant
  FROM ep JOIN reach2 r ON r.u = ep.subj AND r.m = ep.obj
  GROUP BY 1
)
SELECT ep.pred, CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COALESCE(MAX(red.n_redundant), 0) AS BIGINT) AS n_redundant,
       ROUND(COALESCE(MAX(red.n_redundant), 0) / (1.0 * COUNT(*)), 6)
         AS reduction_rate
FROM ep LEFT JOIN red ON red.pred = ep.pred
GROUP BY 1
"""


# --------------------------------------------------------------------------
# kg102 — DAG audit by Kahn source peeling: per round, remove every
# node with in-degree 0 and its outgoing edges; a graph is a DAG iff
# the peel empties it, and the number of productive rounds is the DAG
# depth + 1 (kg74's topological levels are this peel's round indices).
# Any edges surviving all rounds sit in or downstream of a CYCLE — the
# corruption a prerequisite KG must reject before load. Each round is
# one distinct + one anti-join (kg97's checkpointed-peel shape); the
# per-round profile (sources peeled, edges remaining) is the output.
# Oracle: the identical peel unrolled round-by-round in SQL.
# --------------------------------------------------------------------------

_KAHN_ROUNDS = 12


def kg102_dag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = (
        gb.resolved.select("subj", "obj")
        .filter(F.col("subj") != F.col("obj"))
        .distinct()
        .localCheckpoint()
    )
    rows = None
    for k in range(_KAHN_ROUNDS):
        srcs = (
            e.select("subj")
            .distinct()
            .join(
                e.select(F.col("obj").alias("subj")).distinct(),
                "subj",
                "left_anti",
            )
            .localCheckpoint()
        )
        n_src = srcs.count()
        if n_src == 0:
            break
        e = e.join(srcs, "subj", "left_anti").localCheckpoint()
        row = spark.createDataFrame(
            [(k, n_src, e.count())],
            "round long, n_sources_peeled long, n_edges_remaining long",
        )
        rows = row if rows is None else rows.union(row)
    if rows is None:  # empty edge set: no peel rounds (oracle: 0 rows)
        return spark.createDataFrame(
            [],
            "round long, n_sources_peeled long, n_edges_remaining long, "
            "is_dag_so_far boolean",
        )
    return rows.withColumn(
        "is_dag_so_far", F.col("n_edges_remaining") == 0
    )


def _kg102_sql(rounds: int = _KAHN_ROUNDS) -> str:
    from .kg import _edges_union_sql

    steps = [
        """
e0 AS MATERIALIZED (
  SELECT DISTINCT subj, obj FROM edges WHERE subj <> obj)"""
    ]
    rows = []
    for k in range(rounds):
        steps.append(
            f"""
src{k} AS MATERIALIZED (
  SELECT DISTINCT subj FROM e{k}
  WHERE subj NOT IN (SELECT obj FROM e{k})),
e{k + 1} AS MATERIALIZED (
  SELECT * FROM e{k} WHERE subj NOT IN (SELECT subj FROM src{k}))"""
        )
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS round, "
            f"CAST((SELECT COUNT(*) FROM src{k}) AS BIGINT)"
            f" AS n_sources_peeled, "
            f"CAST((SELECT COUNT(*) FROM e{k + 1}) AS BIGINT)"
            f" AS n_edges_remaining"
        )
    union = " UNION ALL ".join(rows)
    return (
        f"{_edges_union_sql()},\n"
        + ",".join(steps)
        + f""",
profile AS ({union})
SELECT round, n_sources_peeled, n_edges_remaining,
       n_edges_remaining = 0 AS is_dag_so_far
FROM profile WHERE n_sources_peeled > 0
"""
    )


# --------------------------------------------------------------------------
# kg103 — metapath-equivalence rule mining (AMIE-style, Galárraga et al.
# WWW 2013, with composed heads; the PRA path-feature view of Lao &
# Cohen 2010): the layered curriculum KG has NO direct predicate whose
# label signature matches any 2-hop composition (verified — a
# predicate-headed AMIE pass is structurally empty here), so the
# meaningful rules are equivalences between 2-hop metapaths: does
# p1(x,y) ∧ p2(y,z) reach the same (x,z) pairs as q1(x,y') ∧ q2(y',z)?
# E.g. Unitoffering→Unit→Unitvariant vs Unitoffering→Programme→
# Unitvariant. Score: support = |instance overlap| (distinct (x,z)),
# confidence = support / n_paths(lhs); candidate pairs with support 0
# are the negative evidence a rule pruner consumes. Plan: one mid-key
# self-join builds the composition table (shuffle on the shared
# endpoint, AQE skew-safe on hub nodes), a distinct, then a self-join
# keyed on the FULL (xl, zl, x, z) instance — partial-agg friendly,
# never label-pair fan-out; output is bounded by rule-pair cardinality.
# Oracle: identical joins over the independent edges union.
# --------------------------------------------------------------------------


#: previous invocation's persisted composition table — pop-released on
#: the next call (q25 pattern: the returned DF is lazy, so unpersisting
#: inside the builder would force recomputation before collect).
_KG103_CACHE: list[DataFrame] = []


def kg103_amie_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    while _KG103_CACHE:
        _KG103_CACHE.pop().unpersist()
    gb = _wide(spark, sf_dir)
    e = (
        gb.resolved.select(
            "pred", "subj_label", "obj_label", "subj", "obj"
        )
        .distinct()
    )
    e1 = e.select(
        F.col("pred").alias("p1"),
        F.col("subj_label").alias("xl"),
        F.col("subj").alias("x"),
        F.col("obj").alias("y"),
        F.col("obj_label").alias("ml"),
    )
    e2 = e.select(
        F.col("pred").alias("p2"),
        F.col("subj").alias("y"),
        F.col("subj_label").alias("ml"),
        F.col("obj").alias("z"),
        F.col("obj_label").alias("zl"),
    )
    comp = (
        e1.join(e2, ["y", "ml"])
        .select("p1", "p2", "ml", "xl", "zl", "x", "z")
        .distinct()
        .persist()
    )
    _KG103_CACHE.append(comp)
    n_paths = comp.groupBy("p1", "p2", "ml", "xl", "zl").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rhs = comp.select(
        F.col("p1").alias("q1"),
        F.col("p2").alias("q2"),
        F.col("ml").alias("qml"),
        "xl",
        "zl",
        "x",
        "z",
    )
    sup = (
        comp.join(rhs, ["xl", "zl", "x", "z"])
        .filter(
            (F.col("p1") != F.col("q1"))
            | (F.col("p2") != F.col("q2"))
            | (F.col("ml") != F.col("qml"))
        )
        .groupBy("p1", "p2", "ml", "q1", "q2", "qml", "xl", "zl")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    rn = n_paths.select(
        F.col("p1").alias("q1"),
        F.col("p2").alias("q2"),
        F.col("ml").alias("qml"),
        "xl",
        "zl",
        F.col("n").alias("n_rhs"),
    )
    cand = (
        n_paths.join(rn, ["xl", "zl"])
        .filter(
            (F.col("p1") != F.col("q1"))
            | (F.col("p2") != F.col("q2"))
            | (F.col("ml") != F.col("qml"))
        )
    )
    out = (
        cand.join(
            sup, ["p1", "p2", "ml", "q1", "q2", "qml", "xl", "zl"], "left"
        )
        .withColumn("support", F.coalesce("support", F.lit(0)))
        .select(
            "p1",
            "p2",
            "ml",
            "q1",
            "q2",
            "qml",
            "xl",
            "zl",
            F.col("n").alias("n_lhs"),
            "n_rhs",
            F.col("support").cast("long").alias("support"),
            F.round(F.col("support") / F.col("n"), 6).alias("confidence"),
            F.round(
                F.col("support")
                / (F.col("n") + F.col("n_rhs") - F.col("support")),
                6,
            ).alias("jaccard"),
        )
    )
    return out


def _kg103_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (
  SELECT DISTINCT pred, subj_label, obj_label, subj, obj FROM edges),
comp AS MATERIALIZED (
  SELECT DISTINCT a.pred AS p1, b.pred AS p2, a.obj_label AS ml,
         a.subj_label AS xl, b.obj_label AS zl,
         a.subj AS x, b.obj AS z
  FROM e a JOIN e b ON b.subj = a.obj
                   AND b.subj_label = a.obj_label
), n_paths AS (
  SELECT p1, p2, ml, xl, zl, CAST(COUNT(*) AS BIGINT) AS n
  FROM comp GROUP BY 1, 2, 3, 4, 5
), sup AS (
  SELECT a.p1, a.p2, a.ml, b.p1 AS q1, b.p2 AS q2, b.ml AS qml,
         a.xl, a.zl, CAST(COUNT(*) AS BIGINT) AS support
  FROM comp a JOIN comp b
    ON b.xl = a.xl AND b.zl = a.zl AND b.x = a.x AND b.z = a.z
  WHERE a.p1 <> b.p1 OR a.p2 <> b.p2 OR a.ml <> b.ml
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8
), cand AS (
  SELECT l.p1, l.p2, l.ml, r.p1 AS q1, r.p2 AS q2, r.ml AS qml,
         l.xl, l.zl, l.n AS n_lhs, r.n AS n_rhs
  FROM n_paths l JOIN n_paths r ON r.xl = l.xl AND r.zl = l.zl
  WHERE l.p1 <> r.p1 OR l.p2 <> r.p2 OR l.ml <> r.ml
)
SELECT c.p1, c.p2, c.ml, c.q1, c.q2, c.qml, c.xl, c.zl,
       c.n_lhs, c.n_rhs,
       CAST(COALESCE(s.support, 0) AS BIGINT) AS support,
       ROUND(COALESCE(s.support, 0) / (1.0 * c.n_lhs), 6) AS confidence,
       ROUND(COALESCE(s.support, 0)
             / (1.0 * (c.n_lhs + c.n_rhs - COALESCE(s.support, 0))), 6)
         AS jaccard
FROM cand c
LEFT JOIN sup s ON s.p1 = c.p1 AND s.p2 = c.p2 AND s.ml = c.ml
               AND s.q1 = c.q1 AND s.q2 = c.q2 AND s.qml = c.qml
               AND s.xl = c.xl AND s.zl = c.zl
"""


# --------------------------------------------------------------------------
# kg104 — rich-club coefficient (Zhou & Mondragón 2004; Colizza et al.
# 2006 normalization left to the caller): for each degree threshold k,
# the density φ(k) = 2·E_k / (N_k·(N_k−1)) of the subgraph induced by
# nodes with degree > k on the UNDIRECTED distinct edge set — the
# hub-interconnection audit that flags whether high-degree curriculum
# entities (programmes, units) form a tightly wired core. Plan: degree
# table (one agg), per-edge min-endpoint degree (two joins, AQE
# broadcast), then BOTH tails come from degree HISTOGRAMS × the 6-row
# threshold grid — never a per-k rescan of the edge set.
# --------------------------------------------------------------------------

_RC_GRID = (1, 2, 4, 8, 16, 32)


def kg104_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = (
        gb.resolved.select("subj", "obj")
        .filter(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("u"),
            F.greatest("subj", "obj").alias("v"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    md_hist = (
        e.join(du, "u")
        .join(dv, "v")
        .groupBy(F.least("du", "dv").alias("md"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_e"))
    )
    deg_hist = deg.groupBy("deg").agg(
        F.count(F.lit(1)).cast("long").alias("n_n")
    )
    grid = spark.createDataFrame(
        [(k,) for k in _RC_GRID], "k int"
    )
    nk = (
        grid.crossJoin(deg_hist)
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.sum("n_n").alias("n_nodes"))
    )
    ek = (
        grid.crossJoin(md_hist)
        .filter(F.col("md") > F.col("k"))
        .groupBy("k")
        .agg(F.sum("n_e").alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .withColumn("n_edges", F.coalesce("n_edges", F.lit(0)))
        .filter(F.col("n_nodes") > 1)
        .select(
            "k",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.round(
                2.0
                * F.col("n_edges")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1.0)),
                6,
            ).alias("phi"),
        )
    )


def _kg104_sql() -> str:
    from .kg import _edges_union_sql

    grid = ", ".join(f"({k})" for k in _RC_GRID)
    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(subj, obj) AS u, GREATEST(subj, obj) AS v
  FROM edges WHERE subj <> obj
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
), md_hist AS (
  SELECT LEAST(du.deg, dv.deg) AS md, CAST(COUNT(*) AS BIGINT) AS n_e
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
  GROUP BY 1
), deg_hist AS (
  SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_n FROM deg GROUP BY 1
), grid(k) AS (VALUES {grid}),
nk AS (
  SELECT k, SUM(n_n) AS n_nodes FROM grid JOIN deg_hist ON deg > k
  GROUP BY 1
), ek AS (
  SELECT k, SUM(n_e) AS n_edges FROM grid JOIN md_hist ON md > k
  GROUP BY 1
)
SELECT nk.k, CAST(nk.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(ek.n_edges, 0) AS BIGINT) AS n_edges,
       ROUND(2.0 * COALESCE(ek.n_edges, 0)
             / (nk.n_nodes * (nk.n_nodes - 1.0)), 6) AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
WHERE nk.n_nodes > 1
"""


# --------------------------------------------------------------------------
# kg105 — predicate functionality / inverse-functionality audit
# (Galárraga et al. WWW 2013 §4.2, Suchanek et al. PARIS VLDB 2012):
# per predicate, fun(p) = #distinct subjects / #triples and
# ifun(p) = #distinct objects / #triples, plus the out-degree
# cardinality profile (min / max objects per subject). fun ≈ 1 marks a
# functional property (each subject has one object — candidate UNIQUE
# constraint and the denominator of AMIE's PCA confidence); ifun ≈ 1
# marks an inverse-functional property (the entity-resolution join
# key). Plan: one (pred, subj) partial agg feeding both the triple
# totals and the cardinality profile, one distinct-object agg — all
# predicate-bounded rollups.
# --------------------------------------------------------------------------


def kg105_functionality(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("pred", "subj", "obj").distinct()
    per_subj = e.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).cast("long").alias("n_obj")
    )
    s = per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subj"),
        F.sum("n_obj").cast("long").alias("n_triples"),
        F.min("n_obj").alias("min_out"),
        F.max("n_obj").alias("max_out"),
    )
    o = e.groupBy("pred").agg(
        F.countDistinct("obj").cast("long").alias("n_obj")
    )
    return s.join(o, "pred").select(
        "pred",
        "n_triples",
        "n_subj",
        "n_obj",
        F.round(F.col("n_subj") / F.col("n_triples"), 6).alias("fun"),
        F.round(F.col("n_obj") / F.col("n_triples"), 6).alias("ifun"),
        F.col("min_out").cast("long").alias("min_out"),
        F.col("max_out").cast("long").alias("max_out"),
        (F.col("n_subj") == F.col("n_triples")).alias("is_functional"),
        (F.col("n_obj") == F.col("n_triples")).alias(
            "is_inverse_functional"
        ),
    )


def _kg105_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (SELECT DISTINCT pred, subj, obj FROM edges),
per_subj AS (
  SELECT pred, subj, CAST(COUNT(*) AS BIGINT) AS n_obj
  FROM e GROUP BY 1, 2
), s AS (
  SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_subj,
         CAST(SUM(n_obj) AS BIGINT) AS n_triples,
         CAST(MIN(n_obj) AS BIGINT) AS min_out,
         CAST(MAX(n_obj) AS BIGINT) AS max_out
  FROM per_subj GROUP BY 1
), o AS (
  SELECT pred, CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
  FROM e GROUP BY 1
)
SELECT s.pred, s.n_triples, s.n_subj, o.n_obj,
       ROUND(s.n_subj / (1.0 * s.n_triples), 6) AS fun,
       ROUND(o.n_obj / (1.0 * s.n_triples), 6) AS ifun,
       s.min_out, s.max_out,
       s.n_subj = s.n_triples AS is_functional,
       o.n_obj = s.n_triples AS is_inverse_functional
FROM s JOIN o ON o.pred = s.pred
"""


# --------------------------------------------------------------------------
# kg106 — ER-cluster robustness under hub-mention removal (the
# targeted-attack curve of Albert, Jeong & Barabási 2000, applied to
# entity-resolution quality per Christen 2012 §6: hub mentions that
# glue many clusters together are the over-merge risk): on the kg38
# co-mention similarity graph, remove the top-k highest-degree
# mentions (k ∈ {0,1,2,4,8}, degree-desc/name-asc deterministic) and
# report how the component structure decomposes — n_components rising
# sharply with k means canonicalization hinges on a few ambiguous
# mentions. Plan: the edge list and degree table build once; the hub
# list is a bounded 8-row collect; each k runs the salted min-label CC
# on the filtered edges (5 bounded runs, NOT a per-k corpus rescan).
# Components are defined over edge-bearing nodes, matching the
# recursive-closure twins.
# --------------------------------------------------------------------------

_ATTACK_KS = (0, 1, 2, 4, 8)


def kg106_er_attack_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = extract_mentions(docs_df(spark, sf_dir))
    units = m.filter(F.col("label") == "Unit").select(
        "doc_id", F.col("mention").alias("src")
    )
    threads = m.filter(F.col("label") == "Thread").select(
        "doc_id", F.col("mention").alias("dst")
    )
    edges = (
        units.join(threads, on="doc_id").select("src", "dst").distinct()
        .persist()
    )
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    hubs = [
        r["node"]
        for r in deg.orderBy(F.desc("deg"), F.asc("node"))
        .limit(max(_ATTACK_KS))
        .collect()
    ]
    outs = []
    for k in _ATTACK_KS:
        drop = hubs[:k]
        e_k = edges.filter(
            ~F.col("src").isin(drop) & ~F.col("dst").isin(drop)
        )
        cc = connected_components(e_k, max_iter=30)
        per = cc.groupBy("canonical_id").agg(
            F.count(F.lit(1)).alias("sz")
        )
        outs.append(
            per.agg(
                F.lit(k).alias("k_removed"),
                F.sum("sz").cast("long").alias("n_nodes"),
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.max("sz").cast("long").alias("max_component"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    edges.unpersist()
    return out.select(
        "k_removed",
        "n_nodes",
        "n_components",
        "max_component",
        F.round(F.col("max_component") / F.col("n_nodes"), 6).alias(
            "frac_largest"
        ),
    )


def _kg106_sql() -> str:
    base = (
        _KV_SQL.replace("\n  WITH sp AS", "\nWITH RECURSIVE sp AS")
        + """,
um AS (
  SELECT doc_id, unnest(regexp_extract_all(v, 'unit-[a-z]+-[0-9]{4}')) AS u
  FROM kv WHERE kind = 'text'
), tm AS (
  SELECT doc_id, unnest(regexp_extract_all(v, 'thread-[0-9]{3}')) AS t
  FROM kv WHERE kind = 'text'
), e0 AS (
  SELECT DISTINCT um.u AS src, tm.t AS dst FROM um JOIN tm USING (doc_id)
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)
  GROUP BY node
), hubs AS (
  SELECT node, ROW_NUMBER() OVER (ORDER BY deg DESC, node) AS rk
  FROM deg
)"""
    )
    parts = []
    for k in _ATTACK_KS:
        parts.append(f""",
ek{k} AS (
  SELECT src, dst FROM e0
  WHERE src NOT IN (SELECT node FROM hubs WHERE rk <= {k})
    AND dst NOT IN (SELECT node FROM hubs WHERE rk <= {k})
), sym{k} AS (
  SELECT src AS n, dst AS m FROM ek{k}
  UNION
  SELECT dst AS n, src AS m FROM ek{k}
), reach{k}(n, m) AS (
  SELECT n, n FROM (SELECT DISTINCT n FROM sym{k})
  UNION
  SELECT e.n, r.m FROM sym{k} e JOIN reach{k} r ON e.m = r.n
), comp{k} AS (
  SELECT n, MIN(m) AS c FROM reach{k} GROUP BY n
), stat{k} AS (
  SELECT {k} AS k_removed,
         CAST(SUM(sz) AS BIGINT) AS n_nodes,
         CAST(COUNT(*) AS BIGINT) AS n_components,
         CAST(MAX(sz) AS BIGINT) AS max_component
  FROM (SELECT c, COUNT(*) AS sz FROM comp{k} GROUP BY c) s
)""")
    union = " UNION ALL ".join(f"SELECT * FROM stat{k}" for k in _ATTACK_KS)
    return (
        base
        + "".join(parts)
        + f"""
SELECT k_removed, n_nodes, n_components, max_component,
       ROUND(max_component / (1.0 * n_nodes), 6) AS frac_largest
FROM ({union})
"""
    )


# --------------------------------------------------------------------------
# kg107 — NODF nestedness of the unit × thread incidence (Almeida-Neto
# et al. Oikos 2008): are the thread sets of narrower units nested
# inside broader units' thread sets? Per unordered unit pair {i, j},
# paired nestedness = 100·|T_i ∩ T_j| / min(|T_i|, |T_j|) when degrees
# differ, 0 on degree ties; NODF_rows = mean over all n(n−1)/2 pairs.
# The thread-side NODF comes from the transposed incidence the same
# way. High NODF = the curriculum forms a spine of threads that
# broader units extend — the structure a sequencing planner exploits.
# Plan: overlaps from the SHARED-KEY co-occurrence self-join (fan-out
# bounded by per-thread unit counts, the kg72 projection shape);
# non-sharing pairs contribute 0 and never materialize — the
# denominator is n(n−1)/2 from the degree table alone.
# --------------------------------------------------------------------------


def kg107_nestedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    inc = (
        gb.resolved.filter(F.col("pred") == "HAS_THREAD")
        .select(F.col("subj").alias("u"), F.col("obj").alias("t"))
        .distinct()
        .persist()
    )

    def nodf(df, row, col):
        deg = df.groupBy(row).agg(F.count(F.lit(1)).alias("deg"))
        a = df.select(F.col(row).alias("i"), col)
        b = df.select(F.col(row).alias("j"), col)
        ov = (
            a.join(b, col)
            .filter(F.col("i") < F.col("j"))
            .groupBy("i", "j")
            .agg(F.count(F.lit(1)).cast("double").alias("ov"))
        )
        di = deg.select(F.col(row).alias("i"), F.col("deg").alias("d_i"))
        dj = deg.select(F.col(row).alias("j"), F.col("deg").alias("d_j"))
        num = (
            ov.join(di, "i")
            .join(dj, "j")
            .filter(F.col("d_i") != F.col("d_j"))
            .agg(
                F.sum(
                    100.0 * F.col("ov") / F.least("d_i", "d_j")
                ).alias("num")
            )
        )
        n = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
        return num.crossJoin(n).select(
            F.col("n").cast("long").alias("n"),
            # try_divide: n ≤ 1 makes the pair count 0 — DuckDB renders
            # x/0 as NULL, ANSI Spark would raise (deg_empty sweep)
            F.round(
                F.try_divide(
                    F.coalesce(F.col("num"), F.lit(0.0)),
                    F.col("n") * (F.col("n") - 1.0) / 2.0,
                ),
                6,
            ).alias("nodf"),
        )

    rows = nodf(inc, "u", "t").select(
        F.lit("units").alias("axis"), "n", "nodf"
    )
    cols = nodf(inc, "t", "u").select(
        F.lit("threads").alias("axis"), "n", "nodf"
    )
    out = rows.unionByName(cols)
    inc.unpersist()
    return out


def _kg107_sql() -> str:
    from .kg import _edges_union_sql

    def side(row, col, axis):
        return f"""
  SELECT '{axis}' AS axis, CAST(n.n AS BIGINT) AS n,
         ROUND(COALESCE(num.s, 0.0) / (n.n * (n.n - 1.0) / 2.0), 6)
           AS nodf
  FROM (
    SELECT SUM(100.0 * ov.ov / LEAST(di.deg, dj.deg)) AS s
    FROM (
      SELECT a.{row} AS i, b.{row} AS j,
             CAST(COUNT(*) AS DOUBLE) AS ov
      FROM inc a JOIN inc b ON b.{col} = a.{col} AND a.{row} < b.{row}
      GROUP BY 1, 2) ov
    JOIN (SELECT {row} AS i, COUNT(*) AS deg FROM inc GROUP BY 1) di
      ON di.i = ov.i
    JOIN (SELECT {row} AS j, COUNT(*) AS deg FROM inc GROUP BY 1) dj
      ON dj.j = ov.j
    WHERE di.deg <> dj.deg) num
  CROSS JOIN (
    SELECT CAST(COUNT(DISTINCT {row}) AS DOUBLE) AS n FROM inc) n"""

    return f"""
{_edges_union_sql()},
inc AS MATERIALIZED (
  SELECT DISTINCT subj AS u, obj AS t FROM edges
  WHERE pred = 'HAS_THREAD'
)
{side('u', 't', 'units')}
UNION ALL
{side('t', 'u', 'threads')}
"""


# --------------------------------------------------------------------------
# kg108 — degree power-law exponent via the Clauset-Shalizi-Newman
# (SIAM Rev. 2009) continuous-approximation MLE on the tail d ≥ d_min:
# α̂ = 1 + n_tail / Σ ln(d / (d_min − ½)), with the tail fraction and
# max degree alongside — the summary a capacity planner reads to size
# skew handling (α near 2 = heavy hubs, salting mandatory; α > 3 =
# light tail). Computed entirely from the degree HISTOGRAM (weighted
# log-sum over distinct degree values), d_min = 2 fixed; undirected
# distinct edges. One degree agg + one histogram rollup.
# --------------------------------------------------------------------------

_PL_DMIN = 2


def kg108_powerlaw_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = (
        gb.resolved.select("subj", "obj")
        .filter(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("u"),
            F.greatest("subj", "obj").alias("v"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    hist = deg.groupBy("deg").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tail = hist.filter(F.col("deg") >= _PL_DMIN)
    g = tail.agg(
        F.sum("c").alias("n_tail"),
        F.sum(
            F.col("c") * F.log(F.col("deg") / (_PL_DMIN - 0.5))
        ).alias("sl"),
        F.max("deg").cast("long").alias("max_deg"),
    ).crossJoin(
        F.broadcast(hist.agg(F.sum("c").alias("n_all")))
    )
    return g.select(
        F.col("n_all").cast("long").alias("n_nodes"),
        F.col("n_tail").cast("long").alias("n_tail"),
        F.lit(_PL_DMIN).alias("d_min"),
        "max_deg",
        F.round(1.0 + F.col("n_tail") / F.col("sl"), 6).alias("alpha"),
        F.round(F.col("n_tail") / F.col("n_all"), 6).alias(
            "tail_fraction"
        ),
    )


def _kg108_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
e AS MATERIALIZED (
  SELECT DISTINCT LEAST(subj, obj) AS u, GREATEST(subj, obj) AS v
  FROM edges WHERE subj <> obj
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
), hist AS (
  SELECT deg, CAST(COUNT(*) AS DOUBLE) AS c FROM deg GROUP BY 1
), t AS (
  SELECT SUM(c) AS n_tail,
         SUM(c * LN(deg / ({_PL_DMIN} - 0.5))) AS sl,
         CAST(MAX(deg) AS BIGINT) AS max_deg
  FROM hist WHERE deg >= {_PL_DMIN}
), a AS (SELECT SUM(c) AS n_all FROM hist)
SELECT CAST(a.n_all AS BIGINT) AS n_nodes,
       CAST(t.n_tail AS BIGINT) AS n_tail,
       {_PL_DMIN} AS d_min,
       t.max_deg,
       ROUND(1.0 + t.n_tail / t.sl, 6) AS alpha,
       ROUND(t.n_tail / a.n_all, 6) AS tail_fraction
FROM t CROSS JOIN a
"""


# --------------------------------------------------------------------------
# kg109 — nominal (label) assortativity from the edge mixing matrix
# (Newman PRE 67, 026126 (2003), eq. 2): r = (Σᵢeᵢᵢ − Σᵢaᵢbᵢ) /
# (1 − Σᵢaᵢbᵢ) over the subj-label × obj-label mixing matrix of the
# resolved edge set — the one-number answer to "do edges stay inside a
# label class or bridge classes?". A layered curriculum KG is maximally
# DISassortative (every predicate bridges two different labels, the
# diagonal is empty), so r < 0 is itself the schema-sanity assertion.
# Complements kg81 (degree assortativity). Plan: one (subj_label,
# obj_label) partial agg → the ≤13×13 mixing matrix; margins and the
# trace are rollups of that tiny frame.
# --------------------------------------------------------------------------


def kg109_label_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj_label", "obj_label")
    mix = e.groupBy("subj_label", "obj_label").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = mix.agg(F.sum("c").alias("m"))
    p = mix.crossJoin(F.broadcast(tot)).select(
        "subj_label", "obj_label", (F.col("c") / F.col("m")).alias("e")
    )
    a = p.groupBy(F.col("subj_label").alias("lab")).agg(
        F.sum("e").alias("a_i")
    )
    b = p.groupBy(F.col("obj_label").alias("lab")).agg(
        F.sum("e").alias("b_i")
    )
    ab = (
        a.join(b, "lab", "full")
        .select(
            (
                F.coalesce("a_i", F.lit(0.0))
                * F.coalesce("b_i", F.lit(0.0))
            ).alias("ab")
        )
        .agg(F.sum("ab").alias("sum_ab"))
    )
    tr = p.filter(F.col("subj_label") == F.col("obj_label")).agg(
        F.coalesce(F.sum("e"), F.lit(0.0)).alias("trace")
    )
    n_lab = (
        e.select(F.col("subj_label").alias("lab"))
        .unionByName(e.select(F.col("obj_label").alias("lab")))
        .distinct()
        .count()
    )
    return (
        tr.crossJoin(F.broadcast(ab))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("m").cast("long").alias("n_edges"),
            F.lit(n_lab).alias("n_labels"),
            F.round("trace", 6).alias("trace"),
            F.round("sum_ab", 6).alias("sum_ab"),
            F.round(
                (F.col("trace") - F.col("sum_ab"))
                / (1.0 - F.col("sum_ab")),
                6,
            ).alias("assortativity"),
        )
    )


def _kg109_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
mix AS MATERIALIZED (
  SELECT subj_label, obj_label, CAST(COUNT(*) AS DOUBLE) AS c
  FROM edges GROUP BY 1, 2
), tot AS (SELECT SUM(c) AS m FROM mix),
p AS (
  SELECT subj_label, obj_label, c / tot.m AS e
  FROM mix CROSS JOIN tot
), a AS (SELECT subj_label AS lab, SUM(e) AS a_i FROM p GROUP BY 1),
b AS (SELECT obj_label AS lab, SUM(e) AS b_i FROM p GROUP BY 1),
ab AS (
  SELECT SUM(COALESCE(a.a_i, 0.0) * COALESCE(b.b_i, 0.0)) AS sum_ab
  FROM a FULL JOIN b ON b.lab = a.lab
), tr AS (
  SELECT COALESCE(SUM(e), 0.0) AS trace FROM p
  WHERE subj_label = obj_label
), nl AS (
  SELECT CAST(COUNT(*) AS INT) AS n_labels FROM (
    SELECT subj_label AS lab FROM mix
    UNION SELECT obj_label FROM mix)
)
SELECT CAST(tot.m AS BIGINT) AS n_edges, nl.n_labels,
       ROUND(tr.trace, 6) AS trace,
       ROUND(ab.sum_ab, 6) AS sum_ab,
       ROUND((tr.trace - ab.sum_ab) / (1.0 - ab.sum_ab), 6)
         AS assortativity
FROM tr CROSS JOIN ab CROSS JOIN tot CROSS JOIN nl
"""


# --------------------------------------------------------------------------
# kg110 — LINKING-AMBIGUITY audit: the candidate fan-out distribution
# of the fuzzy entity linker, per label. Every distinct noisy surface
# form (kg87's deterministic single-deletion typo model) is linked to
# its ≤10 best dictionary candidates at edit distance ≤ 1; per label
# the audit reports how many forms resolve at all, how many are
# AMBIGUOUS (≥ 2 candidates — the forms that need a context-aware
# disambiguator rather than the dictionary alone), the max fan-out,
# and the mean fan-out among linked forms. This is the sizing table
# for the disambiguation stage: ambiguous_share × mention volume is
# exactly the workload a cross-encoder reranker would take at 100 TB.
# Scale: the dictionary side broadcasts (node-scale); surface forms
# dedup with one partial-agg shuffle; the per-form candidate count
# partitions on the form key — never a global window.
# --------------------------------------------------------------------------


def kg110_linking_ambiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..config.curriculum_schema import NODES

    gb = _wide(spark, sf_dir)
    m = (
        extract_mentions(docs_df(spark, sf_dir))
        .select("label", "mention")
        .distinct()
    )
    p = (F.length("mention") % F.lit(5)) + F.lit(2)
    noisy = m.select(
        F.lit("x").alias("doc_id"),
        "label",
        F.concat(
            F.substr(F.col("mention"), F.lit(1), p - 1),
            F.substr(F.col("mention"), p + 1, F.length("mention")),
        ).alias("mention"),
    ).distinct()
    dims = node_dims(gb.wide, NODES, spark).filter(
        F.col("label").isin("Unit", "Thread")
    )
    cand = (
        link_candidates(noisy, dims, max_edit=1, top_k=10)
        .select("label", "mention", "nid")
        .distinct()
    )
    fan = cand.groupBy("label", "mention").agg(
        F.count(F.lit(1)).alias("n_cand")
    )
    base = noisy.select("label", "mention").join(
        fan, ["label", "mention"], "left"
    )
    return base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_forms"),
        F.count("n_cand").cast("long").alias("n_linked"),
        F.count_if(F.col("n_cand") >= 2).cast("long").alias("n_ambiguous"),
        F.coalesce(F.max("n_cand"), F.lit(0)).cast("long").alias(
            "max_fanout"
        ),
        F.round(F.avg("n_cand"), 6).alias("mean_fanout_linked"),
    )


def _kg110_sql() -> str:
    return (
        _noisy_cand_sql(10)
        + """,
cand_d AS (SELECT DISTINCT label, mention, nid FROM topk),
fan AS (
  SELECT label, mention, COUNT(*) AS n_cand
  FROM cand_d GROUP BY label, mention
),
forms AS (SELECT DISTINCT label, mention FROM noisy)
SELECT f.label, CAST(COUNT(*) AS BIGINT) AS n_forms,
       CAST(COUNT(fan.n_cand) AS BIGINT) AS n_linked,
       CAST(COUNT(*) FILTER (WHERE fan.n_cand >= 2) AS BIGINT)
         AS n_ambiguous,
       CAST(COALESCE(MAX(fan.n_cand), 0) AS BIGINT) AS max_fanout,
       ROUND(AVG(fan.n_cand), 6) AS mean_fanout_linked
FROM forms f LEFT JOIN fan ON f.label = fan.label AND f.mention = fan.mention
GROUP BY f.label
"""
    )


# --------------------------------------------------------------------------
# kg111 — HUB EDGE-MASS concentration: what share of all resolved
# edges touches the top-1%-degree nodes? The number that decides
# whether skew handling is optional or existential — if 40% of edge
# mass rides on 1% of nodes (curriculum graphs: 'keystage'/'year'
# hubs), every join keyed on the endpoint needs AQE skew splitting or
# salting (exactly what the flagship does), and GNN-style neighbor
# sampling needs hub caps. The p99 degree cutoff is derived EXACTLY
# from the degree histogram (inverted-CDF over the small (degree,
# n_nodes) aggregate — the only unpartitioned window in the plan);
# edge shares follow from one semi-join of edges against the hub set.
# Reported per direction (out/in) since functional predicates make the
# two profiles asymmetric.
# --------------------------------------------------------------------------


def kg111_hub_edge_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct().persist()
    try:
        rows = []
        for direction, key in (("out", "subj"), ("in", "obj")):
            deg = e.groupBy(F.col(key).alias("node")).agg(
                F.count(F.lit(1)).alias("deg")
            )
            hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("c"))
            w = Window.orderBy("deg").rowsBetween(
                Window.unboundedPreceding, 0
            )
            w_all = Window.orderBy("deg").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            cum = hist.select(
                "deg",
                F.sum("c").over(w).alias("cum"),
                F.sum("c").over(w_all).alias("n"),
            )
            cut = cum.filter(
                F.col("cum") >= F.ceil(F.col("n") * 0.99)
            ).agg(F.min("deg").alias("cutoff"))
            hubs = deg.crossJoin(F.broadcast(cut)).filter(
                F.col("deg") >= F.col("cutoff")
            )
            stats = (
                e.join(
                    hubs.select(F.col("node").alias(key), F.lit(1).alias("_h")),
                    key,
                    "left",
                )
                .agg(
                    F.count(F.lit(1)).alias("n_edges"),
                    F.count("_h").alias("n_hub_edges"),
                )
                .crossJoin(F.broadcast(hubs.agg(
                    F.count(F.lit(1)).alias("n_hubs"),
                    F.min("cutoff").alias("cutoff"),
                )))
                .select(
                    F.lit(direction).alias("direction"),
                    F.col("cutoff").cast("long").alias("p99_degree"),
                    F.col("n_hubs").cast("long").alias("n_hubs"),
                    F.col("n_edges").cast("long").alias("n_edges"),
                    F.col("n_hub_edges").cast("long").alias("n_hub_edges"),
                    # try_divide: 0 edges → NULL share (DuckDB x/0)
                    F.round(
                        F.try_divide("n_hub_edges", "n_edges"), 6
                    ).alias("hub_edge_share"),
                )
            )
            rows.append(stats)
        out = rows[0].unionByName(rows[1])
        return out
    finally:
        e.unpersist()


def _kg111_sql() -> str:
    from .kg import _edges_union_sql

    parts = []
    for direction, key in (("out", "subj"), ("in", "obj")):
        parts.append(f"""
SELECT '{direction}' AS direction,
       CAST((SELECT cutoff FROM cut_{direction}) AS BIGINT) AS p99_degree,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg_{direction}
        WHERE deg >= (SELECT cutoff FROM cut_{direction})) AS n_hubs,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(*) FILTER (WHERE d.deg >= (SELECT cutoff
            FROM cut_{direction})) AS BIGINT) AS n_hub_edges,
       ROUND(COUNT(*) FILTER (WHERE d.deg >= (SELECT cutoff
            FROM cut_{direction})) / (1.0 * COUNT(*)), 6)
         AS hub_edge_share
FROM e JOIN deg_{direction} d ON e.{key} = d.node""")
    degs = []
    for direction, key in (("out", "subj"), ("in", "obj")):
        degs.append(f"""
deg_{direction} AS (
  SELECT {key} AS node, COUNT(*) AS deg FROM e GROUP BY {key}
),
cum_{direction} AS (
  SELECT deg, SUM(c) OVER (ORDER BY deg) AS cum, SUM(c) OVER () AS n
  FROM (SELECT deg, COUNT(*) AS c FROM deg_{direction} GROUP BY deg)
),
cut_{direction} AS (
  SELECT MIN(deg) AS cutoff FROM cum_{direction} WHERE cum >= ceil(n * 0.99)
)""")
    return (
        _edges_union_sql()
        + ", e AS (SELECT DISTINCT subj, obj FROM edges),"
        + ",".join(degs)
        + parts[0]
        + "\nUNION ALL\n"
        + parts[1]
    )


# --------------------------------------------------------------------------
# kg113 — ENTITY CO-MENTION PMI: association strength between entity
# surface forms that appear in the same document — the statistic that
# turns raw co-occurrence (kg38 clusters on it) into RANKED candidate
# edges for KG augmentation: PMI = ln(c_ab·N / (c_a·c_b)) over
# doc-level co-mentions, support ≥ 2. High-PMI pairs are the
# "these two units are discussed together far more than chance"
# signals a curriculum-graph editor reviews for missing prerequisite
# or thread edges. Scale: the pair stream is a self-join on doc_id
# with per-doc fan-out bounded by mentions-per-doc² (single-digit
# here; capped by extraction in any corpus), then one partial-agg
# shuffle per pair key; the marginals join back broadcast (entity
# vocabulary ≪ corpus). Integer counts inside the log — both engines
# compute identical doubles.
# --------------------------------------------------------------------------


def kg113_comention_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        extract_mentions(docs_df(spark, sf_dir))
        .select(
            "doc_id",
            F.concat_ws(":", "label", "mention").alias("ent"),
        )
        .distinct()
    )
    n_docs = m.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    c = m.groupBy("ent").agg(F.count(F.lit(1)).alias("c"))
    a = m.select("doc_id", F.col("ent").alias("ent_a"))
    b = m.select("doc_id", F.col("ent").alias("ent_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    out = (
        pairs.join(
            F.broadcast(c.select(F.col("ent").alias("ent_a"),
                                 F.col("c").alias("c_a"))),
            "ent_a",
        )
        .join(
            F.broadcast(c.select(F.col("ent").alias("ent_b"),
                                 F.col("c").alias("c_b"))),
            "ent_b",
        )
        .crossJoin(F.broadcast(n_docs))
    )
    return out.select(
        "ent_a",
        "ent_b",
        F.col("c_ab").cast("long").alias("c_ab"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        F.round(
            F.log(F.col("c_ab") * F.col("n")
                  / (F.col("c_a") * F.col("c_b"))),
            6,
        ).alias("pmi"),
    )


def _kg113_sql() -> str:
    return f"""
{_KV_SQL},
mention AS (
  SELECT doc_id, 'Unit' AS label,
         unnest(regexp_extract_all(v, 'unit-[a-z]+-[0-9]{{4}}')) AS mention
  FROM kv WHERE kind = 'text'
  UNION ALL
  SELECT doc_id, 'Thread' AS label,
         unnest(regexp_extract_all(v, 'thread-[0-9]{{3}}')) AS mention
  FROM kv WHERE kind = 'text'
),
m AS (SELECT DISTINCT doc_id, label || ':' || mention AS ent FROM mention),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM m),
c AS (SELECT ent, COUNT(*) AS c FROM m GROUP BY ent),
pairs AS (
  SELECT a.ent AS ent_a, b.ent AS ent_b, COUNT(*) AS c_ab
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.ent < b.ent
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT ent_a, ent_b, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
       ROUND(ln(c_ab * nd.n / (1.0 * ca.c * cb.c)), 6) AS pmi
FROM pairs
JOIN c ca ON ca.ent = pairs.ent_a
JOIN c cb ON cb.ent = pairs.ent_b
CROSS JOIN nd
"""


# --------------------------------------------------------------------------
# kg115 — PRA (Path Ranking Algorithm) metapath features for the
# HAS_THREAD relation: for every observed (unit, thread) edge, count
# the HT∘HT⁻¹∘HT support paths — unit → t' ← u' → thread with
# u' ≠ unit and t' ≠ thread — the classic PRA random-walk feature a
# link-prediction model weighs alongside the TransE energies (kg80)
# and Adamic-Adar overlaps. Also emits the path count normalized by
# the endpoint degrees (the walk-probability form PRA actually uses).
# Scale: three self-joins of the tiny HAS_THREAD slice, each on an
# endpoint key (AQE-skew-safe — threads are the hub side); never
# touches the corpus.
# --------------------------------------------------------------------------


def kg115_pra_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    gb = _wide(spark, sf_dir)
    ht = (
        gb.resolved.filter(F.col("pred") == "HAS_THREAD")
        .select(F.col("subj").alias("u"), F.col("obj").alias("t"))
        .distinct()
        .persist()
    )
    try:
        du = ht.groupBy("u").agg(F.count(F.lit(1)).alias("deg_u"))
        dt = ht.groupBy("t").agg(F.count(F.lit(1)).alias("deg_t"))
        # u -HT-> t1 <-HT- u2 -HT-> t : join chain on (t1) then (u2)
        h1 = ht.select(F.col("u").alias("u0"), F.col("t").alias("t1"))
        h2 = ht.select(F.col("u").alias("u2"), F.col("t").alias("t1"))
        h3 = ht.select(F.col("u").alias("u2"), F.col("t").alias("t3"))
        paths = (
            h1.join(h2, "t1")
            .filter(F.col("u2") != F.col("u0"))
            .join(h3, "u2")
            .filter(F.col("t3") != F.col("t1"))
            .groupBy(F.col("u0").alias("u"), F.col("t3").alias("t"))
            .agg(F.count(F.lit(1)).alias("n_paths"))
        )
        out = (
            ht.join(paths, ["u", "t"], "left")
            .join(du, "u")
            .join(dt, "t")
            .select(
                "u",
                "t",
                F.coalesce("n_paths", F.lit(0)).cast("long").alias(
                    "pra_paths"
                ),
                F.col("deg_u").cast("long").alias("deg_u"),
                F.col("deg_t").cast("long").alias("deg_t"),
                F.round(
                    F.coalesce("n_paths", F.lit(0))
                    / (F.col("deg_u") * F.col("deg_t")),
                    6,
                ).alias("pra_norm"),
            )
        )
        out = out.localCheckpoint()
        return out
    finally:
        ht.unpersist()


def _kg115_sql() -> str:
    from .kg import _edges_union_sql

    return f"""
{_edges_union_sql()},
ht AS (
  SELECT DISTINCT subj AS u, obj AS t FROM edges WHERE pred = 'HAS_THREAD'
),
du AS (SELECT u, COUNT(*) AS deg_u FROM ht GROUP BY u),
dt AS (SELECT t, COUNT(*) AS deg_t FROM ht GROUP BY t),
paths AS (
  SELECT h1.u AS u, h3.t AS t, COUNT(*) AS n_paths
  FROM ht h1
  JOIN ht h2 ON h2.t = h1.t AND h2.u <> h1.u
  JOIN ht h3 ON h3.u = h2.u AND h3.t <> h1.t
  GROUP BY 1, 2
)
SELECT ht.u, ht.t,
       CAST(COALESCE(p.n_paths, 0) AS BIGINT) AS pra_paths,
       CAST(du.deg_u AS BIGINT) AS deg_u,
       CAST(dt.deg_t AS BIGINT) AS deg_t,
       ROUND(COALESCE(p.n_paths, 0) / (1.0 * du.deg_u * dt.deg_t), 6)
         AS pra_norm
FROM ht
LEFT JOIN paths p ON p.u = ht.u AND p.t = ht.t
JOIN du ON du.u = ht.u
JOIN dt ON dt.t = ht.t
"""


QUERIES = {
    "kg115_pra_features": kg115_pra_features,
    "kg113_comention_pmi": kg113_comention_pmi,
    "kg110_linking_ambiguity": kg110_linking_ambiguity,
    "kg111_hub_edge_share": kg111_hub_edge_share,
    "kg109_label_mixing": kg109_label_mixing,
    "kg108_powerlaw_mle": kg108_powerlaw_mle,
    "kg107_nestedness": kg107_nestedness,
    "kg106_er_attack_curve": kg106_er_attack_curve,
    "kg105_functionality": kg105_functionality,
    "kg104_rich_club": kg104_rich_club,
    "q245_conductance": q245_conductance,
    "kg103_amie_rules": kg103_amie_rules,
    "kg102_dag_audit": kg102_dag_audit,
    "kg98_shacl_shapes": kg98_shacl_shapes,
    "kg100_snap_summary": kg100_snap_summary,
    "kg101_transitive_reduction": kg101_transitive_reduction,
    "kg95_katz": kg95_katz,
    "kg96_lca_similarity": kg96_lca_similarity,
    "kg97_densest_subgraph": kg97_densest_subgraph,
    "q240_wl_refinement": q240_wl_refinement,
    "q232_butterflies": q232_butterflies,
    "q217_luby_mis": q217_luby_mis,
    "q218_maximal_matching": q218_maximal_matching,
    "q219_betweenness": q219_betweenness,
    "q225_boruvka_msf": q225_boruvka_msf,
    "q215_scc": q215_scc,
    "q216_recursive_reach": q216_recursive_reach,
    "q200_connectivity_fraction": q200_connectivity_fraction,
    "kg84_endpoint_contract": kg84_endpoint_contract,
    "kg86_incremental_update": kg86_incremental_update,
    "q158_clustering_coeff": q158_clustering_coeff,
    "q159_ktruss": q159_ktruss,
    "kg82_closeness": kg82_closeness,
    "kg81_assortativity": kg81_assortativity,
    "kg74_topo_levels": kg74_topo_levels,
    "kg75_path_centrality": kg75_path_centrality,
    "kg76_random_walks": kg76_random_walks,
    "kg77_metapath_census": kg77_metapath_census,
    "kg78_cardinality_audit": kg78_cardinality_audit,
    "kg79_negative_samples": kg79_negative_samples,
    "kg80_transe_energies": kg80_transe_energies,
    "q32_connected_components": q32_connected_components,
    "kg38_comention_components": kg38_comention_components,
    "kg39_mention_links": kg39_mention_links,
    "kg87_candidate_links": kg87_candidate_links,
    "kg88_er_canonicalize": kg88_er_canonicalize,
    "kg89_linking_eval": kg89_linking_eval,
    "kg90_kgc_ranking": kg90_kgc_ranking,
    "kg91_skew_audit": kg91_skew_audit,
    "kg92_neighborhood_function": kg92_neighborhood_function,
    "kg93_blocking_efficiency": kg93_blocking_efficiency,
    "kg64_degree_distribution": kg64_degree_distribution,
    "kg65_pagerank": kg65_pagerank,
    "kg66_bfs_depth": kg66_bfs_depth,
    "kg67_orphan_nodes": kg67_orphan_nodes,
    "q51_triangle_counts": q51_triangle_counts,
    "q54_kcore": q54_kcore,
    "q55_link_prediction": q55_link_prediction,
    "q62_shortest_paths": q62_shortest_paths,
    "kg68_span_transitions": kg68_span_transitions,
    "q68_label_propagation": q68_label_propagation,
    "q69_neighbor_jaccard": q69_neighbor_jaccard,
    "kg69_hits": kg69_hits,
    "kg70_neighbor_features": kg70_neighbor_features,
    "kg71_personalized_pagerank": kg71_personalized_pagerank,
    "q91_modularity": q91_modularity,
    "kg72_bipartite_projection": kg72_bipartite_projection,
    "kg73_root_paths": kg73_root_paths,
}

ORACLES = {
    "kg115_pra_features": _kg115_sql(),
    "kg113_comention_pmi": _kg113_sql(),
    "kg110_linking_ambiguity": _kg110_sql(),
    "kg111_hub_edge_share": _kg111_sql(),
    "kg109_label_mixing": _kg109_sql(),
    "kg108_powerlaw_mle": _kg108_sql(),
    "kg107_nestedness": _kg107_sql(),
    "kg106_er_attack_curve": _kg106_sql(),
    "kg105_functionality": _kg105_sql(),
    "kg104_rich_club": _kg104_sql(),
    "kg103_amie_rules": _kg103_sql(),
    "kg102_dag_audit": _kg102_sql(),
    "kg98_shacl_shapes": _kg98_sql(),
    "kg100_snap_summary": _kg100_sql(),
    "kg101_transitive_reduction": _kg101_sql(),
    "q245_conductance": _q245_sql(),
    "kg95_katz": _kg95_sql(),
    "kg96_lca_similarity": _kg96_sql(),
    "kg97_densest_subgraph": _kg97_sql(),
    "q240_wl_refinement": _q240_sql(),
    "q232_butterflies": _Q232_SQL,
    "q217_luby_mis": _q217_sql(),
    "q219_betweenness": _q219_sql(),
    "q225_boruvka_msf": _q225_sql(),
    "q218_maximal_matching": _q218_sql(),
    "q215_scc": Q215_SQL,
    "q216_recursive_reach": _q216_sql(),
    "q200_connectivity_fraction": Q200_SQL,
    "kg84_endpoint_contract": _kg84_sql(),
    "kg86_incremental_update": KG86_SQL,
    "q158_clustering_coeff": Q158_SQL,
    "q159_ktruss": _q159_sql(),
    "kg82_closeness": _kg82_sql(),
    "kg74_topo_levels": _kg74_sql(),
    "kg75_path_centrality": _kg75_sql(),
    "kg76_random_walks": _kg76_sql(),
    "kg77_metapath_census": _kg77_sql(),
    "kg78_cardinality_audit": _kg78_sql(),
    "kg79_negative_samples": _kg79_sql(),
    "kg80_transe_energies": _kg80_sql(),
    "kg81_assortativity": _kg81_sql(),
    "q32_connected_components": Q32_SQL,
    "kg38_comention_components": KG38_SQL,
    "kg39_mention_links": _kg39_sql(),
    "kg87_candidate_links": _kg87_sql(),
    "kg88_er_canonicalize": _kg88_sql(),
    "kg89_linking_eval": _kg89_sql(),
    "kg90_kgc_ranking": _kg90_sql(),
    "kg91_skew_audit": _kg91_sql(),
    "kg92_neighborhood_function": _kg92_sql(),
    "kg93_blocking_efficiency": _kg93_sql(),
    "kg64_degree_distribution": _kg64_sql(),
    "kg65_pagerank": _kg65_sql(),
    "kg66_bfs_depth": _kg66_sql(),
    "kg67_orphan_nodes": _kg67_sql(),
    "q51_triangle_counts": Q51_SQL,
    "q54_kcore": _q54_sql(),
    "q55_link_prediction": Q55_SQL,
    "q62_shortest_paths": _q62_sql(),
    "kg68_span_transitions": _kg68_sql(),
    "q68_label_propagation": _q68_sql(),
    "q69_neighbor_jaccard": Q69_SQL,
    "kg69_hits": _kg69_sql(),
    "kg70_neighbor_features": _kg70_sql(),
    "kg71_personalized_pagerank": _kg71_sql(),
    "q91_modularity": _q91_sql(),
    "kg72_bipartite_projection": _kg72_sql(),
    "kg73_root_paths": _kg73_sql(),
}
