"""Invariants for q322 NPMI collocations, q323 source-pair JSD, kg105
predicate functionality — pure-Python replays on the same parquet."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg105_functionality,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q322_npmi_collocations,
    q323_source_jsd,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_q322_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "text"
    ).collect()
    bg = Counter()
    la = Counter()
    rb = Counter()
    for r in rows:
        t = _tokens(r["text"])
        for x, y in zip(t, t[1:]):
            bg[(x, y)] += 1
            la[x] += 1
            rb[y] += 1
    n = sum(bg.values())
    scored = []
    for (x, y), c in bg.items():
        if c < 5:
            continue
        p = c / n
        npmi = math.log(p / ((la[x] / n) * (rb[y] / n))) / -math.log(p)
        scored.append((round(npmi, 6), f"{x} {y}", c))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expect = [(b, c, s) for s, b, c in scored[:20]]
    got = [
        (r["bigram"], r["count"], r["npmi"])
        for r in q322_npmi_collocations(spark, SF001).collect()
    ]
    assert got == expect
    # NPMI is bounded in (-1, 1]
    assert all(-1.0 < s <= 1.0 for _, _, s in got)


def test_q323_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "text"
    ).collect()
    dist = defaultdict(Counter)
    for r in rows:
        dist[r["source"]].update(_tokens(r["text"]))
    probs = {
        s: {w: c / sum(cnt.values()) for w, c in cnt.items()}
        for s, cnt in dist.items()
    }
    got = {
        (r["s1"], r["s2"]): r["jsd"]
        for r in q323_source_jsd(spark, SF001).collect()
    }
    srcs = sorted(probs)
    assert set(got) == {
        (a, b) for ai, a in enumerate(srcs) for b in srcs[ai + 1:]
    }
    for (a, b), jsd in got.items():
        p, q = probs[a], probs[b]
        full = 0.0
        for w in set(p) | set(q):
            pw, qw = p.get(w, 0.0), q.get(w, 0.0)
            m = (pw + qw) / 2.0
            if pw > 0:
                full += pw / 2.0 * math.log(pw / m)
            if qw > 0:
                full += qw / 2.0 * math.log(qw / m)
        assert abs(jsd - full) < 1e-5, (a, b, jsd, full)
        assert 0.0 <= jsd <= math.log(2.0) + 1e-9


def test_kg105_matches_python(spark):
    gb = _wide(spark, SF01)
    triples = {
        (r["pred"], r["subj"], r["obj"])
        for r in gb.resolved.select("pred", "subj", "obj").collect()
    }
    by = defaultdict(set)
    for p, s, o in triples:
        by[p].add((s, o))
    got = {r["pred"]: r for r in kg105_functionality(spark, SF01).collect()}
    assert set(got) == set(by)
    for p, pairs in by.items():
        subj = {s for s, _ in pairs}
        obj = {o for _, o in pairs}
        out = Counter(s for s, _ in pairs)
        r = got[p]
        assert r["n_triples"] == len(pairs)
        assert r["n_subj"] == len(subj) and r["n_obj"] == len(obj)
        assert r["min_out"] == min(out.values())
        assert r["max_out"] == max(out.values())
        assert r["is_functional"] == (len(subj) == len(pairs))
        assert r["is_inverse_functional"] == (len(obj) == len(pairs))
    # the layered schema guarantees at least one inverse-functional
    # predicate (each lesson hangs off exactly one unitvariant chain)
    assert any(r["is_inverse_functional"] for r in got.values())
