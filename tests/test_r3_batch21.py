"""Invariants for q326 Good-Turing profile and q327 Weibull fit —
pure-Python replays on the same parquet."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q327_weibull_fit,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q326_good_turing,
)

SF001 = "/root/testdata/sf0.001"


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_q326_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "text"
    ).collect()
    cnt = defaultdict(Counter)
    for r in rows:
        cnt[r["source"]].update(_tokens(r["text"]))
    got = {r["source"]: r for r in q326_good_turing(spark, SF001).collect()}
    assert set(got) == set(cnt)
    for s, c in cnt.items():
        n = sum(c.values())
        v = len(c)
        n1 = sum(1 for f in c.values() if f == 1)
        sf2 = sum(f * f for f in c.values())
        sff = sum(f * (f - 1) for f in c.values())
        r = got[s]
        assert r["n_tokens"] == n and r["n_types"] == v
        assert r["hapax"] == n1
        assert abs(r["p_unseen"] - n1 / n) < 1e-6
        assert abs(r["yule_k"] - 1e4 * (sf2 - n) / n**2) < 1e-4
        assert abs(r["simpson_d"] - sff / (n * (n - 1))) < 1e-6
        # probabilities/indices in range
        assert 0.0 <= r["p_unseen"] <= 1.0
        assert 0.0 <= r["simpson_d"] <= 1.0


def test_q327_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_type", "user_id", "event_id", "ts"
    ).collect()
    by = defaultdict(list)
    for r in rows:
        by[(r["event_type"], r["user_id"])].append(
            (int(r["ts"].timestamp()), r["event_id"])
        )
    gaps = defaultdict(list)
    for (et, _), evs in by.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            if b - a > 0:
                gaps[et].append(float(b - a))
    expect = {}
    for et, gs in gaps.items():
        n = len(gs)
        hist = Counter(gs)
        pts = []
        r = 0.0
        for g in sorted(hist):
            c = hist[g]
            r += c
            fcdf = (r - 0.3) / (n + 0.4)
            pts.append((c, math.log(g), math.log(-math.log(1 - fcdf))))
        np_ = sum(c for c, _, _ in pts)
        sx = sum(c * x for c, x, _ in pts)
        sy = sum(c * y for c, _, y in pts)
        sxy = sum(c * x * y for c, x, y in pts)
        sxx = sum(c * x * x for c, x, _ in pts)
        if np_ <= 2 or sxx - sx * sx / np_ <= 0:
            continue
        k = (sxy - sx * sy / np_) / (sxx - sx * sx / np_)
        b = sy / np_ - k * sx / np_
        expect[et] = (n, k, math.exp(-b / k))
    got = {r["event_type"]: r for r in
           q327_weibull_fit(spark, SF001).collect()}
    assert set(got) == set(expect)
    for et, (n, k, lam) in expect.items():
        assert got[et]["n_gaps"] == n
        assert abs(got[et]["shape_k"] - k) < 1e-4
        assert abs(got[et]["scale_lambda"] - lam) / lam < 1e-3
        # arrival gaps on a synthetic uniform-ish feed are near-
        # memoryless-to-bursty: shape must be positive and modest
        assert 0.0 < got[et]["shape_k"] < 5.0
