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

QUERIES = {}
ORACLES = {}
for _m in (
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
):
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)


def release_caches() -> None:
    """Unpersist every module-level cache the query surface holds:
    the memoized GraphBuilds (kg._BUILDS — the cross-query edge-table
    cache with its own ``clear_builds`` API) and q25's one-generation
    MinHash feature cache. After this, no query-surface persist survives
    (every other persist() in the query modules is released before its
    function returns); tests/test_cache_hygiene.py pins that invariant.
    """
    kg.clear_builds()
    while textops._Q25_FEATS_CACHE:
        textops._Q25_FEATS_CACHE.pop().unpersist()
