"""Invariants for q319 Heaps fit, q320 Brier decomposition, q321 LLR
keyness, kg104 rich-club — pure-Python replays on the same parquet."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg104_rich_club,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q319_heaps_fit,
    q320_brier_decomposition,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q321_llr_keyness,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _md5long(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q319_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    toks = defaultdict(float)
    first = {}
    for r in rows:
        sh = _md5long(str(r["doc_id"])) % 16
        for w in _tokens(r["text"]):
            toks[(r["source"], sh)] += 1
            k = (r["source"], _md5long(w))
            if k not in first or sh < first[k]:
                first[k] = sh
    new = defaultdict(float)
    for (src, _), sh in first.items():
        new[(src, sh)] += 1
    expect = {}
    for src in {s for s, _ in toks}:
        shards = sorted(sh for s, sh in toks if s == src)
        cn = cv = 0.0
        pts = []
        for sh in shards:
            cn += toks[(src, sh)]
            cv += new.get((src, sh), 0.0)
            pts.append((math.log(cn), math.log(cv)))
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        mxy = sum(x * y for x, y in pts) / n
        mxx = sum(x * x for x, _ in pts) / n
        # exact distinct-count degeneracy guard, mirroring the query
        if (
            n <= 2
            or len({x for x, _ in pts}) <= 1
            or len({y for _, y in pts}) <= 1
        ):
            continue
        beta = (mxy - mx * my) / (mxx - mx * mx)
        expect[src] = (n, beta)
    got = {r["source"]: r for r in q319_heaps_fit(spark, SF001).collect()}
    assert set(got) == set(expect)
    for src, (n, beta) in expect.items():
        assert got[src]["n_points"] == n
        assert abs(got[src]["beta"] - beta) < 1e-4
        # sublinear vocabulary growth on natural text
        assert 0.0 < got[src]["beta"] < 1.2


def test_q320_identity_and_range(spark):
    row = q320_brier_decomposition(spark, SF001).collect()[0]
    # Murphy identity holds up to the within-bin variance residual
    assert abs(
        row["brier"]
        - (row["reliability"] - row["resolution"] + row["uncertainty"])
        - row["decomp_residual"]
    ) < 2e-6
    assert 0.0 <= row["brier"] <= 1.0
    assert 0.0 <= row["uncertainty"] <= 0.25
    assert row["resolution"] >= 0.0 and row["reliability"] >= 0.0


def test_q321_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    sw = Counter()
    for r in rows:
        for w in _tokens(r["text"]):
            sw[(r["source"], w)] += 1
    rs = Counter()
    gw = Counter()
    for (s, w), c in sw.items():
        rs[s] += c
        gw[w] += c
    n_all = sum(rs.values())
    best = defaultdict(list)
    for (s, w), a in sw.items():
        if gw[w] < 5:
            continue
        ea = rs[s] * gw[w] / n_all
        if not a > ea:
            continue
        cells = [
            (a, ea),
            (gw[w] - a, (n_all - rs[s]) * gw[w] / n_all),
            (rs[s] - a, rs[s] * (n_all - gw[w]) / n_all),
            (
                n_all - gw[w] - rs[s] + a,
                (n_all - rs[s]) * (n_all - gw[w]) / n_all,
            ),
        ]
        g2 = 2.0 * sum(x * math.log(x / e) for x, e in cells if x > 0)
        best[s].append((round(g2, 4), w, a))
    expect = {}
    for s, lst in best.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        expect[s] = [(i + 1, w, int(a), g) for i, (g, w, a) in
                     enumerate(lst[:3])]
    got = defaultdict(list)
    for r in q321_llr_keyness(spark, SF001).collect():
        got[r["source"]].append(
            (r["rank"], r["word"], r["count"], r["g2"])
        )
    for s in got:
        got[s].sort()
    assert dict(got) == expect


def test_kg104_matches_python(spark):
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
    expect = {}
    for k in (1, 2, 4, 8, 16, 32):
        nodes = [x for x, d in deg.items() if d > k]
        if len(nodes) <= 1:
            continue
        ns = set(nodes)
        e_k = sum(1 for u, v in und if u in ns and v in ns)
        expect[k] = (
            len(nodes),
            e_k,
            round(2.0 * e_k / (len(nodes) * (len(nodes) - 1.0)), 6),
        )
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in kg104_rich_club(spark, SF01).collect()
    }
    assert got == expect
    # the curriculum hubs exist: at least the k=1 tier must be present
    assert 1 in got and got[1][0] > 1
