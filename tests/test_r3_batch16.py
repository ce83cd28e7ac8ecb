"""Invariants for the round-3 batch 16 queries: kg103 metapath
equivalence mining, q313 Burrows' Delta stylometry, q315 isotropy.

Each is pinned against an independent pure-Python replay over the same
parquet input (not the SQL twin — that is the sweep's job)."""

import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg103_amie_rules,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    q315_isotropy_audit,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q313_burrows_delta,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_kg103_matches_python_replay(spark):
    gb = _wide(spark, SF01)
    edges = {
        (r["pred"], r["subj_label"], r["obj_label"], r["subj"], r["obj"])
        for r in gb.resolved.select(
            "pred", "subj_label", "obj_label", "subj", "obj"
        ).collect()
    }
    # compositions keyed by rule (p1, p2, ml, xl, zl) → set of (x, z)
    by_mid = defaultdict(list)
    for p, sl, ol, s, o in edges:
        by_mid[(o, ol)].append((p, sl, s))
    inst = defaultdict(set)
    for p2, sl2, ol2, s2, o2 in edges:
        for p1, xl, x in by_mid.get((s2, sl2), ()):
            inst[(p1, p2, sl2, xl, ol2)].add((x, o2))
    rules = list(inst)
    expect = {}
    for a in rules:
        for b in rules:
            if a == b or a[3:] != b[3:]:
                continue
            ov = len(inst[a] & inst[b])
            expect[a + b[:3]] = (
                len(inst[a]),
                len(inst[b]),
                ov,
                round(ov / len(inst[a]), 6),
            )
    got = {}
    for r in kg103_amie_rules(spark, SF01).collect():
        key = (r["p1"], r["p2"], r["ml"], r["xl"], r["zl"],
               r["q1"], r["q2"], r["qml"])
        got[key] = (r["n_lhs"], r["n_rhs"], r["support"], r["confidence"])
    assert got == expect
    # the curriculum KG carries the Unit-vs-Programme route equivalence
    assert any(s > 0 for (_, _, s, _) in got.values())


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_q313_matches_python_replay(spark):
    docs = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    sw = Counter()
    for r in docs:
        for w in _tokens(r["text"]):
            sw[(r["source"], w)] += 1
    gc = Counter()
    for (s, w), c in sw.items():
        gc[w] += c
    vocab = [w for w, _ in sorted(gc.items(), key=lambda t: (-t[1], t[0]))[:50]]
    sources = sorted({s for s, _ in sw})
    n = {s: sum(c for (s2, _), c in sw.items() if s2 == s) for s in sources}
    f = {
        (s, w): sw.get((s, w), 0) / n[s] for s in sources for w in vocab
    }
    delta = {}
    zs = defaultdict(list)
    for w in vocab:
        vals = [f[(s, w)] for s in sources]
        mu = sum(vals) / len(vals)
        var = sum((v - mu) ** 2 for v in vals) / (len(vals) - 1)
        sd = math.sqrt(var)
        if sd > 0:
            for s in sources:
                zs[s].append(abs((f[(s, w)] - mu) / sd))
    for s in sources:
        delta[s] = round(sum(zs[s]) / len(zs[s]), 6)
    got = {r["source"]: r["delta"] for r in
           q313_burrows_delta(spark, SF001).collect()}
    assert set(got) == set(delta)
    for s in delta:
        assert abs(got[s] - delta[s]) < 1e-6, (s, got[s], delta[s])


def test_q315_isotropy_python_replay(spark):
    import numpy as np

    vecs = np.array(
        [
            r["v"]
            for r in spark.read.parquet(f"{SF001}/embeddings.parquet")
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .collect()
        ]
    )
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    raw = float(np.sum(unit.mean(axis=0) ** 2))
    mu, sd = vecs.mean(axis=0), vecs.std(axis=0, ddof=1)
    w = (vecs - mu) / sd
    wu = w / np.linalg.norm(w, axis=1, keepdims=True)
    white = float(np.sum(wu.mean(axis=0) ** 2))
    row = q315_isotropy_audit(spark, SF001).collect()[0]
    assert row["n"] == len(vecs)
    assert abs(row["anisotropy_raw"] - round(raw, 6)) <= 2e-6
    assert abs(row["anisotropy_whitened"] - round(white, 6)) <= 2e-6
    # whitening must strip the common-mean component almost entirely
    assert row["anisotropy_whitened"] < row["anisotropy_raw"]
