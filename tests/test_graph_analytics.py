"""Graph-analytics invariants for kg64 (degree distribution) and kg65
(PageRank) beyond the DuckDB value-hash oracle: probability-mass
conservation, degree bookkeeping, and rank ordering sanity.

PageRank with uniform dangling-mass redistribution conserves total mass
exactly (up to float error) — the property the no-dangling shortcut
variant would fail, so it pins WHICH formulation is implemented."""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg64_degree_distribution,
    kg65_pagerank,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide


def test_pagerank_mass_conserved(spark, sf_dir):
    ranks = kg65_pagerank(spark, sf_dir)
    row = ranks.agg(
        F.sum("rank").alias("total"), F.count("*").alias("n")
    ).collect()[0]
    assert row["n"] > 0
    assert abs(row["total"] - 1.0) < 1e-4, row["total"]


def test_pagerank_follows_edge_direction(spark, sf_dir):
    """Rank flows along edges: every node with at least one in-edge must
    outrank every zero-in-degree node (sources sit at the uniform floor
    (1-d)/n + d*dangling/n; any incoming contribution strictly exceeds
    it). In this graph Subject/Phase/Tier are pure sources and
    Unitvariant is the deepest sink — checked explicitly."""
    gb = _wide(spark, sf_dir)
    ranks = kg65_pagerank(spark, sf_dir).persist()
    indeg = gb.resolved.groupBy(F.col("obj").alias("id")).agg(
        F.count("*").alias("indeg")
    )
    with_in = ranks.join(indeg, "id", "left_semi")
    no_in = ranks.join(indeg, "id", "left_anti")
    min_with = with_in.agg(F.min("rank")).collect()[0][0]
    max_without = no_in.agg(F.max("rank")).collect()[0][0]
    assert min_with > max_without, (min_with, max_without)

    uv_ids = gb.nodes["Unitvariant"].select(
        F.col("id").cast("string").alias("id")
    )
    uv_avg = (
        ranks.join(uv_ids, "id", "left_semi").agg(F.avg("rank")).collect()[0][0]
    )
    assert uv_avg > max_without
    ranks.unpersist()


def test_degree_distribution_counts(spark, sf_dir):
    gb = _wide(spark, sf_dir)
    dist = kg64_degree_distribution(spark, sf_dir)
    # sum over the distribution of outdeg * n_nodes per pred == edges per pred
    recon = (
        dist.groupBy("pred")
        .agg(F.sum(F.col("outdeg") * F.col("n_nodes")).alias("n_edges"))
    )
    actual = gb.resolved.groupBy("pred").agg(F.count("*").alias("n_edges"))
    diff = recon.exceptAll(actual)
    assert diff.count() == 0, diff.collect()


def test_bfs_depth_invariants(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        kg66_bfs_depth,
    )

    gb = _wide(spark, sf_dir)
    dist = kg66_bfs_depth(spark, sf_dir).persist()
    # every node at depth d>0 has an in-edge from a node at depth d-1
    e = gb.resolved.select("subj", "obj").distinct()
    parent = (
        dist.filter(F.col("depth") > 0)
        .join(e, dist.id == e.obj)
        .join(
            dist.select(F.col("id").alias("pid"), F.col("depth").alias("pd")),
            F.col("subj") == F.col("pid"),
        )
        .groupBy("id", "depth")
        .agg(F.min("pd").alias("min_parent_depth"))
    )
    bad = parent.filter(F.col("min_parent_depth") != F.col("depth") - 1)
    assert bad.count() == 0, bad.limit(5).collect()
    # depth-0 set is exactly the zero-in-degree node set
    roots = dist.filter("depth = 0")
    with_in = roots.join(e.select(F.col("obj").alias("id")).distinct(), "id", "left_semi")
    assert with_in.count() == 0
    assert dist.agg(F.max("depth")).collect()[0][0] <= 8
    dist.unpersist()


def test_orphans_only_schemaversion(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        kg67_orphan_nodes,
    )

    rows = kg67_orphan_nodes(spark, sf_dir).collect()
    assert {(r["label"], r["n_orphans"]) for r in rows} == {("Schemaversion", 1)}


def test_recursive_reach_native_and_consistent(spark, sf_dir):
    """q216 must execute through Catalyst's native recursive-CTE
    machinery (UnionLoop in the optimized plan — no Python driver
    loop), and its depth-1 counts must equal each keystage's distinct
    out-neighborhood computed independently."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        q216_recursive_reach,
    )

    df = q216_recursive_reach(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnionLoop" in plan
    rows = df.collect()
    assert rows and all(1 <= r["depth"] <= 4 and r["n_nodes"] > 0 for r in rows)
    got_d1 = {r["src"]: r["n_nodes"] for r in rows if r["depth"] == 1}
    gb = _wide(spark, sf_dir)
    e = gb.resolved.select("subj", "obj").distinct()
    want_d1 = {
        r["subj"]: r["n"]
        for r in e.filter(
            F.col("subj").startswith("ks") & (F.col("subj") != F.col("obj"))
        )
        .groupBy("subj")
        .agg(F.countDistinct("obj").alias("n"))
        .collect()
    }
    assert got_d1 == want_d1


def test_triangle_counts_handcrafted(spark):
    """K4 plus a pendant: every K4 vertex sits in C(3,2)=3 triangles,
    the pendant in none — checks the degree-ordered orientation counts
    each triangle exactly once (a double-count would report 6)."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)],
        "u long, v long",
    )
    got = {r["n"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_handcrafted(spark):
    """K4 with a pendant chain 4-5-6: at k=3 the chain peels in two
    cascading rounds (6 first, then 5), and 4's core degree drops from
    4 to 3 — peeling must recompute degrees AFTER each removal, which a
    single-pass degree filter would get wrong (it would keep 5)."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import kcore

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        "u long, v long",
    )
    got = {r["n"]: r["core_deg"] for r in kcore(edges, k=3, rounds=5).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_ktruss_handcrafted(spark):
    """K5 with a shared-vertex triangle and a pendant: at k=4 every K5
    edge has support 3 and survives, the side triangle's edges (support
    1) peel in round one, the pendant (support 0) is dropped by the
    inner support join. The diamond shows peeling CASCADES: its middle
    edge survives round one (support 2) but loses both triangles to the
    peel, so round two must remove it."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import ktruss

    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    edges = spark.createDataFrame(
        k5 + [(5, 6), (5, 7), (6, 7), (7, 8)], "u long, v long"
    )
    got = sorted((r["u"], r["v"]) for r in ktruss(edges, k=4, rounds=3).collect())
    assert got == sorted(k5)

    diamond = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "u long, v long"
    )
    assert ktruss(diamond, k=4, rounds=1).count() == 1
    assert ktruss(diamond, k=4, rounds=2).count() == 0


# ------------------------------------------------- source betweenness


def _brandes_exact(edge_list, sources, depth):
    """Pure-Python horizon-limited Brandes + stress oracle."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    eset = sorted(set(edge_list))
    for u, v in eset:
        adj[u].append(v)
    delta_sum = defaultdict(float)
    stress = defaultdict(int)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = defaultdict(float)
        cont = defaultdict(int)
        for u in reversed(order):
            for w in adj[u]:
                if dist.get(w) == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
                    cont[u] += 1 + cont[w]
        for v in order:
            if v != s:
                delta_sum[v] += delta[v]
                stress[v] += sigma[v] * cont[v]
    return delta_sum, stress


def test_source_betweenness_vs_exact_oracle(spark):
    """Random digraphs: the distributed forward-sigma/backward-delta
    recurrence equals a sequential Brandes limited to the same horizon."""
    import random

    from oak_knowledge_graph_neo4j_auradb_spark.operators.components import (
        source_betweenness,
    )

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = sorted(
            {
                (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
                for _ in range(80)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        sources = [f"n{i}" for i in (0, 1, 2)]
        e = spark.createDataFrame(edges, "eu string, ev string")
        s = spark.createDataFrame([(x,) for x in sources], "s string")
        got = {
            r["v"]: (round(r["delta_sum"], 6), r["stress"])
            for r in source_betweenness(e, s, depth=4).collect()
        }
        exp_d, exp_s = _brandes_exact(edges, sources, depth=4)
        want = {}
        for v in set(exp_d) | set(exp_s) | set(got):
            if v in [r for r in sources]:
                continue
            want[v] = (round(exp_d.get(v, 0.0), 6), exp_s.get(v, 0))
        got = {v: x for v, x in got.items() if v not in sources}
        # nodes never reached don't appear on either side
        assert got == want, f"trial {trial}: {got} != {want}"


def test_butterflies_handcrafted(spark, tmp_path):
    """A 2x2 complete biclique = exactly 1 butterfly; K(2,3) = C(3,2)=3
    via the part-side wedge formula. Built as a tiny lineitem table fed
    through the real q232 pipeline."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        q232_butterflies,
    )

    # parts are kept when l_partkey % 50 == 0; orders o1,o2 both touch
    # parts 50,100,150 -> K(2,3): wedges=C(2,2) per part *3? part deg=2
    # -> 1 wedge each = 3 wedges, one pair with m=3 -> C(3,2)=3
    rows = [(o, p) for o in (1, 2) for p in (50, 100, 150)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = q232_butterflies(spark, str(tmp_path)).collect()[0]
    assert got["wedges"] == 3
    assert got["cosupport_pairs"] == 1
    assert got["butterflies"] == 3
    assert got["capped_parts"] == 0


def test_wl_refinement_trajectory(spark, sf_dir):
    """q240: color counts only grow (refinement splits, never merges),
    the largest class only shrinks, round 0 has at most two colors
    (the two type tags), and round 1's color count equals the number
    of distinct (type, degree) classes — the exact 1-WL semantics of
    the first round on a bipartite graph with type-tag seeds."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        _WL_ROUNDS,
        q240_wl_refinement,
    )

    got = sorted(
        q240_wl_refinement(spark, sf_dir).collect(), key=lambda r: r["rnd"]
    )
    assert [r["rnd"] for r in got] == list(range(_WL_ROUNDS + 1))
    assert got[0]["n_colors"] <= 2
    for a, b in zip(got, got[1:]):
        assert b["n_colors"] >= a["n_colors"]
        assert b["largest_class"] <= a["largest_class"]

    li = load(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") % 50 == 0)
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    und = e0.select(F.col("src").alias("n")).unionAll(
        e0.select(F.col("dst").alias("n"))
    )
    type_deg_classes = (
        und.groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.substring("n", 1, 1).alias("t"), "deg")
        .distinct()
        .count()
    )
    assert got[1]["n_colors"] == type_deg_classes


def test_conductance_matches_definition(spark, sf_dir, tmp_path):
    """q245: on a small handcrafted graph, recompute vol/cut/phi from
    label_propagation's own output in pure python and match the query
    exactly (synchronous LPA may two-color a biclique, so the test
    trusts the labeling and pins the conductance arithmetic); on the
    real corpus phi stays in [0, 1]."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
        label_propagation,
        q245_conductance,
    )

    rows = [(o, p) for o in (1, 2) for p in (50, 100)] + [
        (o, p) for o in (3, 4) for p in (150, 200)
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {r["community"]: r for r in q245_conductance(spark, str(tmp_path)).collect()}

    e0 = spark.createDataFrame(
        [(f"o{o}", f"p{p}") for o, p in rows], "src string, dst string"
    )
    lab = {r["id"]: r["community"] for r in label_propagation(e0).collect()}
    dir_edges = [(a, b) for a, b in [(f"o{o}", f"p{p}") for o, p in rows]]
    dir_edges = dir_edges + [(b, a) for a, b in dir_edges]
    m2 = len(dir_edges)
    from collections import Counter

    vol, cut, sz = Counter(), Counter(), Counter(lab.values())
    for a, b in dir_edges:
        vol[lab[a]] += 1
        if lab[a] != lab[b]:
            cut[lab[a]] += 1
    expect = {
        c: (sz[c], vol[c], cut[c], round(cut[c] / min(vol[c], m2 - vol[c]), 6))
        for c in vol
        if 0 < vol[c] < m2
    }
    assert set(got) == set(expect)
    for c, (n_nodes, v, k, phi) in expect.items():
        r = got[c]
        assert (r["n_nodes"], r["volume"], r["cut_edges"]) == (n_nodes, v, k)
        assert abs(r["conductance"] - phi) < 1e-9

    real = q245_conductance(spark, sf_dir).collect()
    assert real
    for r in real:
        assert 0.0 <= r["conductance"] <= 1.0
