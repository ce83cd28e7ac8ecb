"""Invariants for batch 32: b-bit MinHash accuracy (q346), SAX motif
census (q347), MIPS-to-NN reduction (q348)."""

from collections import Counter

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q347_sax_motifs,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    q348_mips_topk,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q346_bbit_minhash,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q346_onebit_noisier_but_bounded(spark):
    row = q346_bbit_minhash(spark, SF01).collect()[0]
    assert row["n_pairs"] > 0
    # 1 bit per perm throws away information: its MAE can't beat the
    # full-value estimator's on the same pairs (allowing rounding slop)
    assert row["mae_1bit"] >= row["mae_full"] - 1e-6
    assert 0.0 <= row["mae_full"] <= 1.0 and 0.0 <= row["mae_1bit"] <= 1.0


def test_q347_symbols_and_support(spark):
    rows = q347_sax_motifs(spark, SF001).collect()
    assert rows
    for r in rows:
        assert len(r["top_motif"]) == 3
        assert set(r["top_motif"]) <= set("abcd")
        assert r["n_occurrences"] >= 1


def test_q348_reduction_preserves_ranking(spark):
    rows = q348_mips_topk(spark, SF01).collect()
    per = Counter(r["query_id"] for r in rows)
    assert set(per.values()) == {3}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        # inner-product order and augmented-cosine order agree: the
        # reduction divides ip by a per-query constant (qn * M)
        ips = [r["ip"] for r in rs]
        cos = [r["aug_cos"] for r in rs]
        assert ips == sorted(ips, reverse=True)
        assert cos == sorted(cos, reverse=True)
