"""Persist hygiene (VERDICT r2 item 4): after a query family runs and
``release_caches()`` is called, no query-surface persist survives in
``getPersistentRDDs`` — every ``persist()`` in the query modules is
either released before its function returns (graphops' iterate tables,
q126's corpus-prep cache) or registered in a module cache that
``release_caches()`` drains (kg's memoized GraphBuild, q25's MinHash
feature table).

The representative set below deliberately hits every persist pattern:
the memoized kg build (kg34), the q25 generation cache, pre-return
unpersists (q51 triangles, kg79 negative sampling, q126 corpus prep),
and plain persist-free queries from each family. Iterative
localCheckpoint queries are exercised elsewhere; their checkpoint
blocks are lifetime-managed by the context cleaner, not persist().
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"

REPRESENTATIVE = [
    "kg34_has_lesson_triples",  # kg family — memoized GraphBuild persist
    "q25_lsh_neardup_pairs",  # textops — generation cache persist
    "q20_exact_dedup",  # textops — persist-free
    "q51_triangle_counts",  # graphops — persist + pre-return unpersist
    "kg79_negative_samples",  # graphops — build persist + edge persist
    "q126_corpus_prep_stats",  # pipelineops — plan cache unpersisted
    "q136_weighted_sample",  # pipelineops — round-3 top-k path
    "q154_skyline",  # mlops — round-3 histogram path
    "q172_rfm_scores",  # analytics — round-3 histogram ranks
]


def _persistent_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {k for k in m.keySet().toArray()}


def test_release_caches_drains_query_persists(spark):
    from oak_knowledge_graph_neo4j_auradb_spark import queries

    baseline = _persistent_ids(spark)
    for name in REPRESENTATIVE:
        df = queries.QUERIES[name](spark, SF)
        assert df.count() >= 0
    queries.release_caches()
    leaked = _persistent_ids(spark) - baseline
    assert not leaked, f"persisted RDDs leaked by query surface: {leaked}"


def test_release_caches_idempotent(spark):
    from oak_knowledge_graph_neo4j_auradb_spark import queries

    queries.release_caches()
    queries.release_caches()
    assert not queries.kg._BUILDS
    assert not queries.textops._Q25_FEATS_CACHE
    assert not queries.common._SORTED_RANK_PINS
