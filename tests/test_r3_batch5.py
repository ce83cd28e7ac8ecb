"""Invariants for kg95–kg97: Katz dominates the in-path count of the
direct predecessors, Wu-Palmer similarity is a bounded taxonomic score,
and the densest-subgraph peel is monotone in nodes with a coherent best
round."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg95_katz,
    kg96_lca_similarity,
    kg97_densest_subgraph,
)

SF01 = "/root/testdata/sf0.01"


def test_katz_floor_and_source_identity(spark):
    """Every score >= 1 (the β=1 base); after 6 attenuated rounds a
    node with no in-edge keeps exactly the base score, and no score
    exceeds 1/(1-α·λ)-style bounds for this shallow sparse DAG."""
    rows = kg95_katz(spark, SF01).collect()
    assert rows
    scores = {r["id"]: r["katz"] for r in rows}
    assert all(v >= 1.0 for v in scores.values())
    assert any(v > 1.0 for v in scores.values())
    # sources (roots of the hierarchy: phases/subjects/tiers/examboards)
    # receive no contribution, so some ids sit exactly at the base
    assert any(abs(v - 1.0) < 1e-12 for v in scores.values())
    assert max(scores.values()) < 1e6


def test_wu_palmer_bounded_and_pair_counts(spark):
    """sim in (0, 1]; a thread with k units renders C(k,2) pairs —
    n_pairs >= 1 and min <= avg <= max."""
    rows = kg96_lca_similarity(spark, SF01).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] >= 1
        assert 0.0 < r["min_sim"] <= r["avg_sim"] <= r["max_sim"] <= 1.0


def test_densest_peel_monotone_with_unique_best(spark):
    """Node/edge counts strictly shrink per surviving round (the peel
    always removes at least the below-threshold nodes), density stays
    positive, and exactly the max-density rounds carry is_best."""
    rows = sorted(
        kg97_densest_subgraph(spark, SF01).collect(),
        key=lambda r: r["round"],
    )
    assert rows and rows[0]["round"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] < a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
    best = max(r["density"] for r in rows)
    for r in rows:
        assert r["density"] > 0
        assert r["is_best"] == (r["density"] == best)
    assert any(r["is_best"] for r in rows)
