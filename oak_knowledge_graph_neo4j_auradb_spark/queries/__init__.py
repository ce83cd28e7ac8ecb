"""Driver-facing query surface.

Each submodule exports ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → ANSI-SQL string DuckDB runs on the
same parquet tables). Together they cover SURVEY.md §2's operator
inventory plus the large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing).
"""

from __future__ import annotations

from . import (
    analytics,
    common,
    curriculum,
    graphops,
    kg,
    mlops,
    pipelineops,
    relational,
    similarity,
    streamq,
    textops,
    tpch,
)

_MODULES = (
    relational,
    textops,
    similarity,
    kg,
    graphops,
    curriculum,
    streamq,
    pipelineops,
    tpch,
    analytics,
    mlops,
)

# Round-robin interleave the per-module registries so ANY prefix of the
# query registry spans every family (relational, textops, similarity,
# kg, graphops, ...). The driver samples a subset of queries() per
# round; with plain module-order concatenation its sample had only ever
# contained relational/pipeline names (round-3/4 VERDICT ask #8) — the
# interleaved order makes a prefix- or stride-sample family-diverse by
# construction. ORACLES is keyed lookup only; order is irrelevant.
import itertools as _it

QUERIES = {}
for _group in _it.zip_longest(*(list(_m.QUERIES.items()) for _m in _MODULES)):
    for _kv in _group:
        if _kv is not None:
            QUERIES[_kv[0]] = _kv[1]

ORACLES = {}
for _m in _MODULES:
    ORACLES.update(_m.ORACLES)


def release_caches() -> None:
    """Unpersist every module-level cache the query surface holds:
    the memoized GraphBuilds (kg._BUILDS — the cross-query edge-table
    cache with its own ``clear_builds`` API), q25's one-generation
    MinHash feature cache, and the pinned sorted_rank dimensions
    (common._SORTED_RANK_PINS). After this, no query-surface persist survives
    (every other persist() in the query modules is released before its
    function returns); tests/test_cache_hygiene.py pins that invariant.
    """
    kg.clear_builds()
    while textops._Q25_FEATS_CACHE:
        textops._Q25_FEATS_CACHE.pop().unpersist()
    while graphops._KG103_CACHE:
        graphops._KG103_CACHE.pop().unpersist()
    common.clear_rank_pins()
