"""Invariants for kg98/kg100/kg101: SHACL partition arithmetic, SNAP
summary mass conservation, and a pure-Python reachability cross-check
of the transitive-reduction audit."""

from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    _SHACL_CONSTRAINTS,
    _TR_ROUNDS,
    kg98_shacl_shapes,
    kg100_snap_summary,
    kg101_transitive_reduction,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide

SF01 = "/root/testdata/sf0.01"


def test_shacl_partition_arithmetic(spark):
    rows = kg98_shacl_shapes(spark, SF01).collect()
    assert len(rows) == len(_SHACL_CONSTRAINTS)
    keys = {(r["label"], r["pred"]) for r in rows}
    assert keys == {(lbl, p) for lbl, p, _, _ in _SHACL_CONSTRAINTS}
    for r in rows:
        # min- and max-violations partition the non-conforming set:
        # c < min and c > max are mutually exclusive for min <= max.
        assert (
            r["n_conforming"] + r["n_viol_min"] + r["n_viol_max"]
            == r["n_nodes"]
        )
        assert 0.0 <= r["conformance"] <= 1.0
        if r["min_c"] == 0:
            assert r["n_viol_min"] == 0
        # node universe really is the label dim (zero-edge nodes count)
        dims = _wide(spark, SF01).extras["dims"]
        n_lbl = dims.filter(F.col("label") == r["label"]).count()
        assert r["n_nodes"] == n_lbl


def test_snap_summary_conserves_nodes(spark):
    out = kg100_snap_summary(spark, SF01).collect()
    dims = _wide(spark, SF01).extras["dims"]
    per_label = {
        r["label"]: r["n"]
        for r in dims.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["label"] != "Schemaversion"
    }
    got = {}
    for r in out:
        got[r["label"]] = got.get(r["label"], 0) + r["n_nodes"]
        assert r["sample_id"] is not None
        assert r["n_nodes"] >= 1
    assert got == per_label
    # at least one label must split into >1 supernode (heterogeneous
    # neighborhoods), else the summary is degenerate
    from collections import Counter

    c = Counter(r["label"] for r in out)
    assert max(c.values()) > 1


def test_transitive_reduction_matches_python_bfs(spark):
    gb = _wide(spark, SF01)
    edges = [
        (r["subj"], r["obj"], r["pred"])
        for r in gb.resolved.select("subj", "obj", "pred")
        .distinct()
        .collect()
    ]
    adj: dict[str, set[str]] = {}
    for u, v, _ in edges:
        adj.setdefault(u, set()).add(v)
    # bounded-depth reachability at >= 2 hops, mirroring _TR_ROUNDS
    from collections import defaultdict

    reach2 = defaultdict(set)
    for u in adj:
        frontier = set(adj[u])
        seen = set(frontier)
        for _depth in range(2, _TR_ROUNDS + 1):
            step = set()
            for m in frontier:
                step |= adj.get(m, set())
            reach2[u] |= step
            frontier = step - seen
            seen |= frontier
            if not frontier:
                break
    exp_edges: dict[str, int] = {}
    exp_red: dict[str, int] = {}
    for u, v, p in edges:
        exp_edges[p] = exp_edges.get(p, 0) + 1
        if v in reach2[u]:
            exp_red[p] = exp_red.get(p, 0) + 1
    got = {r["pred"]: r for r in kg101_transitive_reduction(spark, SF01).collect()}
    assert set(got) == set(exp_edges)
    for p, r in got.items():
        assert r["n_edges"] == exp_edges[p]
        assert r["n_redundant"] == exp_red.get(p, 0)
        assert 0.0 <= r["reduction_rate"] <= 1.0
    # HAS_YEAR targets have a single incoming predicate — no 2-hop
    # alternative route can exist
    assert got["HAS_YEAR"]["n_redundant"] == 0
