"""Invariant for kg106: the hub-removal attack curve matches a
pure-Python union-find replay of the same co-mention graph, and the
curve is monotone in the expected directions."""

from collections import Counter

from oak_knowledge_graph_neo4j_auradb_spark.operators.linking import (
    extract_mentions,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg106_er_attack_curve,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import docs_df

SF01 = "/root/testdata/sf0.01"


def _components(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = Counter(find(x) for x in parent)
    return sizes


def test_kg106_matches_union_find(spark):
    m = extract_mentions(docs_df(spark, SF01))
    rows = m.select("doc_id", "label", "mention").collect()
    units = {}
    threads = {}
    for r in rows:
        d = units if r["label"] == "Unit" else (
            threads if r["label"] == "Thread" else None
        )
        if d is not None:
            d.setdefault(r["doc_id"], set()).add(r["mention"])
    edges = {
        (u, t)
        for doc, us in units.items()
        for u in us
        for t in threads.get(doc, ())
    }
    deg = Counter()
    for u, t in edges:
        deg[u] += 1
        deg[t] += 1
    hubs = [n for n, _ in sorted(deg.items(), key=lambda x: (-x[1], x[0]))]
    got = {r["k_removed"]: r for r in
           kg106_er_attack_curve(spark, SF01).collect()}
    assert set(got) == {0, 1, 2, 4, 8}
    for k in (0, 1, 2, 4, 8):
        drop = set(hubs[:k])
        ek = {(u, t) for u, t in edges if u not in drop and t not in drop}
        sizes = _components(ek)
        r = got[k]
        assert r["n_nodes"] == sum(sizes.values())
        assert r["n_components"] == len(sizes)
        assert r["max_component"] == max(sizes.values())
    # removing hubs can only shrink the population and the giant
    # component's absolute size
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[b]["n_nodes"] <= got[a]["n_nodes"]
        assert got[b]["max_component"] <= got[a]["max_component"]
