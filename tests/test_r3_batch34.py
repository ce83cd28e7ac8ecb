"""Invariants for batch 34: slug-collapse audit (kg114), PRA metapath
features (kg115), cross-modal caption consistency (kg116)."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg115_pra_features,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import (
    kg114_slug_collapse,
    kg116_crossmodal_consistency,
)

SF001 = "/root/testdata/sf0.001"


def test_kg114_collapse_histogram(spark):
    rows = kg114_slug_collapse(spark, SF001).collect()
    assert rows
    ks = [r["k_raw_forms"] for r in rows]
    assert all(k >= 1 for k in ks)
    # the suffix rule must actually merge something on this corpus
    assert any(k >= 2 for k in ks)
    for r in rows:
        assert r["n_normalized_ids"] >= 1 and r["example_nid"]


def test_kg115_pra_exact_replay(spark):
    rows = kg115_pra_features(spark, SF001).collect()
    assert rows
    # the output rows ARE the full HAS_THREAD edge set — replay the
    # metapath count and degrees from them exactly
    edges = {(r["u"], r["t"]) for r in rows}
    from collections import Counter

    du = Counter(u for u, _ in edges)
    dt = Counter(t for _, t in edges)
    for r in rows:
        assert r["deg_u"] == du[r["u"]] and r["deg_t"] == dt[r["t"]]
        want = sum(
            1
            for (u2, t1) in edges
            if u2 != r["u"] and (r["u"], t1) in edges and t1 != r["t"]
            and (u2, r["t"]) in edges
        )
        assert r["pra_paths"] == want


def test_kg116_jaccard_defined_iff_both_captions(spark):
    rows = kg116_crossmodal_consistency(spark, SF001).collect()
    assert rows
    for r in rows:
        assert r["embed_sim"] >= 0.75
        if r["caption_jaccard"] is None:
            assert r["captions_agree"] is False
        else:
            assert 0.0 <= r["caption_jaccard"] <= 1.0
            assert r["captions_agree"] == (r["caption_jaccard"] >= 0.5)
