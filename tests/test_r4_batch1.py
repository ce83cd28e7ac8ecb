"""Round-4 additions: pack-boundary stats (q358), exact-substring dup
spans (q359), legacy graph diff (kg118), predicate co-occurrence
(kg120). Value-level correctness is pinned by the strict DuckDB twins
(CORRECTNESS sweep); these tests pin the structural invariants the
oracles can't express."""

from pyspark.sql import functions as F


def test_pack_boundary_stats_bounds(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q358_pack_boundary_stats,
    )

    rows = q358_pack_boundary_stats(spark, sf_dir).collect()
    assert rows, "at least one shard group"
    for r in rows:
        assert 0 <= r["n_straddle"] <= r["n_docs"]
        assert 0.0 <= r["straddle_frac"] <= 1.0
        assert r["max_bins_spanned"] >= 1


def test_exact_substring_pairs_canonical(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
        q359_exact_substring_dups,
    )

    df = q359_exact_substring_dups(spark, sf_dir)
    rows = df.collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"], "pair must be canonical"
        assert r["n_shared_windows"] >= 2
    # a doc sharing a verbatim 30-token span with itself is impossible
    assert df.filter(F.col("doc_a") == F.col("doc_b")).count() == 0


def test_legacy_diff_is_monotone(spark, sf_dir):
    """Adding legacy source rows can only ADD first-seen candidates and
    dim members — the diff must show no removed edges."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import (
        kg118_legacy_graph_diff,
    )

    rows = kg118_legacy_graph_diff(spark, sf_dir).collect()
    assert all(r["direction"] == "added" for r in rows), rows
    assert sum(r["n_edges"] for r in rows) > 0, "legacy rows exist (d%10==7)"


def test_pred_cooccurrence_is_upper_triangle(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import (
        kg120_pred_cooccurrence,
    )

    rows = kg120_pred_cooccurrence(spark, sf_dir).collect()
    for r in rows:
        assert r["pred_a"] < r["pred_b"]
        assert r["n_subjects"] >= 1
