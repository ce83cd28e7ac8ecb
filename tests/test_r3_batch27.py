"""Invariants for q334 near-dup closure, q335 Kish n_eff, kg108
power-law MLE — pure-Python replays."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg108_powerlaw_mle,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q335_kish_neff,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q25_lsh_neardup_pairs,
    q334_neardup_closure,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q334_matches_python(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q25_lsh_neardup_pairs(spark, SF01)
        .select("doc_a", "doc_b")
        .collect()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    n_wedges = n_closed = 0
    for b, ns in adj.items():
        for a in ns:
            for c in ns:
                if a < c:
                    n_wedges += 1
                    if (a, c) in pairs:
                        n_closed += 1
    row = q334_neardup_closure(spark, SF01).collect()[0]
    assert row["n_wedges"] == n_wedges
    assert row["n_closed"] == n_closed
    if n_wedges:
        assert abs(
            row["closure_rate"] - round(n_closed / n_wedges, 6)
        ) < 1e-9
    # sanity: the audit has evidence to audit
    assert n_wedges > 0


def test_q335_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    by = defaultdict(list)
    for r in rows:
        by[r["source"]].append(float(r["n_chars"]))
    got = {r["source"]: r for r in q335_kish_neff(spark, SF001).collect()}
    assert set(got) == set(by)
    for s, ws in by.items():
        neff = sum(ws) ** 2 / sum(w * w for w in ws)
        r = got[s]
        assert r["n_docs"] == len(ws)
        assert abs(r["n_eff"] - neff) < 1e-2
        assert abs(r["design_effect"] - len(ws) / neff) < 1e-4
        # 1 <= n_eff <= n always
        assert 1.0 - 1e-9 <= r["n_eff"] <= len(ws) + 1e-6


def test_kg108_matches_python(spark):
    gb = _wide(spark, SF01)
    raw = {
        (r["subj"], r["obj"])
        for r in gb.resolved.select("subj", "obj").collect()
        if r["subj"] != r["obj"]
    }
    und = {(min(a, b), max(a, b)) for a, b in raw}
    deg = Counter()
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
    tail = [d for d in deg.values() if d >= 2]
    alpha = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    row = kg108_powerlaw_mle(spark, SF01).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_tail"] == len(tail)
    assert row["max_deg"] == max(deg.values())
    assert abs(row["alpha"] - alpha) < 1e-4
    assert abs(
        row["tail_fraction"] - round(len(tail) / len(deg), 6)
    ) < 1e-9
    # a curriculum graph is hub-heavy: alpha in the scale-free band
    assert 1.5 < row["alpha"] < 4.5
