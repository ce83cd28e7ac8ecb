"""Invariant for kg102: the distributed Kahn peel profile matches a
pure-Python replay on the same resolved edge set, and the curriculum
graph peels to empty (it is a DAG)."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    _KAHN_ROUNDS,
    kg102_dag_audit,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide

SF01 = "/root/testdata/sf0.01"


def test_kahn_peel_matches_python(spark):
    gb = _wide(spark, SF01)
    edges = {
        (r["subj"], r["obj"])
        for r in gb.resolved.select("subj", "obj").distinct().collect()
        if r["subj"] != r["obj"]
    }
    profile = []
    e = set(edges)
    for k in range(_KAHN_ROUNDS):
        subjs = {u for u, _ in e}
        objs = {v for _, v in e}
        srcs = subjs - objs
        if not srcs:
            break
        e = {(u, v) for u, v in e if u not in srcs}
        profile.append((k, len(srcs), len(e)))
    got = sorted(
        kg102_dag_audit(spark, SF01).collect(), key=lambda r: r["round"]
    )
    assert [
        (r["round"], r["n_sources_peeled"], r["n_edges_remaining"])
        for r in got
    ] == profile
    # the curriculum graph is a DAG: the peel must empty the edge set
    assert got[-1]["n_edges_remaining"] == 0
    assert got[-1]["is_dag_so_far"]
    # peel counts cover every non-sink node exactly once
    assert sum(r["n_sources_peeled"] for r in got) == len(
        {u for u, _ in edges}
    )
