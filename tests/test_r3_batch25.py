"""Invariants for q332 Newey-West trend SE and kg107 NODF nestedness —
pure-Python replays."""

import math
from collections import defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q332_newey_west,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg107_nestedness,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q332_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/events.parquet").select(
        "ts", "value"
    ).collect()
    daily = defaultdict(list)
    for r in rows:
        daily[int(r["ts"].timestamp()) // 86400].append(float(r["value"]))
    d0 = min(daily)
    pts = sorted((d - d0, sum(v) / len(v)) for d, v in daily.items())
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    mxy = sum(x * y for x, y in pts) / n
    mxx = sum(x * x for x, _ in pts) / n
    beta = (mxy - mx * my) / (mxx - mx * mx)
    alpha = my - beta * mx
    u = {x: (x - mx) * (y - alpha - beta * x) for x, y in pts}
    g = sum(v * v for v in u.values())
    g_lags = 0.0
    for l in range(1, 8):
        gl = sum(
            u[x] * u[x - l] for x, _ in pts if (x - l) in u
        )
        g_lags += (1.0 - l / 8.0) * 2.0 * gl
    sxx = n * (mxx - mx * mx)
    var_naive = (g / (n - 2.0)) / (mxx - mx * mx) / n
    var_nw = (g + g_lags) / (sxx * sxx)
    row = q332_newey_west(spark, SF001).collect()[0]
    assert row["n_days"] == n
    assert abs(row["slope"] - beta) < 1e-5
    assert abs(row["se_naive"] - math.sqrt(var_naive)) < 1e-5
    assert abs(row["se_newey_west"] - math.sqrt(var_nw)) < 1e-5
    assert row["se_inflation"] > 0


def test_kg107_matches_python(spark):
    gb = _wide(spark, SF01)
    inc = {
        (r["subj"], r["obj"])
        for r in gb.resolved.filter("pred = 'HAS_THREAD'")
        .select("subj", "obj")
        .collect()
    }

    def nodf(pairs):
        adj = defaultdict(set)
        for a, b in pairs:
            adj[a].add(b)
        keys = sorted(adj)
        total = 0.0
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                da, db = len(adj[a]), len(adj[b])
                if da != db:
                    total += 100.0 * len(adj[a] & adj[b]) / min(da, db)
        n = len(keys)
        return n, total / (n * (n - 1) / 2.0)

    nu, nodf_u = nodf(inc)
    nt, nodf_t = nodf({(t, u) for u, t in inc})
    got = {r["axis"]: r for r in kg107_nestedness(spark, SF01).collect()}
    assert got["units"]["n"] == nu
    assert abs(got["units"]["nodf"] - nodf_u) < 1e-4
    assert got["threads"]["n"] == nt
    assert abs(got["threads"]["nodf"] - nodf_t) < 1e-4
    assert 0.0 <= got["units"]["nodf"] <= 100.0
