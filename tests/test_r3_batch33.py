"""Invariants for batch 33: token-budget allocator (q349),
character-class profile (q350), Dirichlet query-likelihood (q351)."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
    q157_bm25,
    q351_query_likelihood,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q349_token_budget,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q350_charclass_profile,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q349_budget_conserved_and_caps_hold(spark):
    rows = q349_token_budget(spark, SF01).collect()
    total_avail = sum(r["avail_tokens"] for r in rows)
    total_alloc = sum(r["alloc_tokens"] for r in rows)
    # one redistribution round conserves the budget exactly
    assert abs(total_alloc - 3.0 * total_avail) < 1.0
    for r in rows:
        if r["is_clipped"]:
            assert abs(r["epochs"] - 4.0) < 1e-6
        assert r["alloc_tokens"] > 0
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4


def test_q350_shares_sum_to_one(spark):
    for r in q350_charclass_profile(spark, SF001).collect():
        s = (
            r["lower_share"] + r["upper_share"] + r["digit_share"]
            + r["space_share"] + r["other_share"]
        )
        assert abs(s - 1.0) < 5e-4
        assert r["mean_token_len"] > 0


def test_q351_ranks_against_bm25(spark):
    ql = q351_query_likelihood(spark, SF01).collect()
    assert len(ql) == 15
    scores = [r["ql_score"] for r in ql]
    assert scores == sorted(scores, reverse=True)
    # QL scores are log-probabilities: strictly negative
    assert all(s < 0 for s in scores)
    # both lexical rankers should broadly agree on what's relevant:
    # the two top-15 sets share at least a third of their members
    bm = {r["doc_id"] for r in q157_bm25(spark, SF01).collect()}
    overlap = bm & {r["doc_id"] for r in ql}
    assert len(overlap) >= 5
