"""Invariant for kg109: nominal assortativity matches a pure-Python
mixing-matrix replay, and the layered schema is disassortative."""

from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg109_label_mixing,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide

SF01 = "/root/testdata/sf0.01"


def test_kg109_matches_python(spark):
    gb = _wide(spark, SF01)
    edges = [
        (r["subj_label"], r["obj_label"])
        for r in gb.resolved.select("subj_label", "obj_label").collect()
    ]
    m = len(edges)
    mix = Counter(edges)
    a = defaultdict(float)
    b = defaultdict(float)
    trace = 0.0
    for (sl, ol), c in mix.items():
        e = c / m
        a[sl] += e
        b[ol] += e
        if sl == ol:
            trace += e
    sum_ab = sum(a[lab] * b.get(lab, 0.0) for lab in a)
    r_expect = (trace - sum_ab) / (1.0 - sum_ab)
    row = kg109_label_mixing(spark, SF01).collect()[0]
    assert row["n_edges"] == m
    assert row["n_labels"] == len({l for p in edges for l in p})
    assert abs(row["trace"] - trace) < 1e-6
    assert abs(row["sum_ab"] - sum_ab) < 1e-6
    assert abs(row["assortativity"] - r_expect) < 1e-4
    # every predicate bridges two distinct labels: empty diagonal,
    # strictly disassortative
    assert row["trace"] == 0.0
    assert row["assortativity"] < 0.0
