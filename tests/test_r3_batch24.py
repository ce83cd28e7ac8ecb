"""Invariants for q330 Wasserstein drift and q331 circular diurnal
statistics — pure-Python replays on the same parquet."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q330_wasserstein_drift,
    q331_circular_diurnal,
)

SF001 = "/root/testdata/sf0.001"


def test_q330_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    by = defaultdict(Counter)
    allc = Counter()
    for r in rows:
        by[r["source"]][float(r["n_chars"])] += 1
        allc[float(r["n_chars"])] += 1
    vals = sorted(allc)
    n_all = sum(allc.values())
    got = {r["source"]: r for r in
           q330_wasserstein_drift(spark, SF001).collect()}
    assert set(got) == set(by)
    for s, cnt in by.items():
        n_s = sum(cnt.values())
        f_s = f_r = 0.0
        cs = cr = 0.0
        w1 = 0.0
        ks = 0.0
        for v, nxt in zip(vals, vals[1:]):
            cs += cnt.get(v, 0)
            cr += allc[v] - cnt.get(v, 0)
            f_s = cs / n_s
            f_r = cr / (n_all - n_s)
            w1 += abs(f_s - f_r) * (nxt - v)
            ks = max(ks, abs(f_s - f_r))
        assert abs(got[s]["w1"] - round(w1, 4)) < 1e-6, s
        assert abs(got[s]["ks_sup"] - round(ks, 6)) < 1e-6, s
        assert got[s]["w1"] >= 0.0 and 0.0 <= got[s]["ks_sup"] <= 1.0


def test_q331_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_type", "ts"
    ).collect()
    by = defaultdict(list)
    for r in rows:
        s = int(r["ts"].timestamp()) % 86400
        by[r["event_type"]].append(2.0 * math.pi * s / 86400.0)
    got = {r["event_type"]: r for r in
           q331_circular_diurnal(spark, SF001).collect()}
    assert set(got) == set(by)
    for et, thetas in by.items():
        n = len(thetas)
        sc = sum(math.cos(t) for t in thetas)
        ss = sum(math.sin(t) for t in thetas)
        rbar = math.sqrt(sc * sc + ss * ss) / n
        mean_hour = (math.atan2(ss, sc) / (2 * math.pi) * 24.0 + 24.0) % 24.0
        r = got[et]
        assert r["n_events"] == n
        assert abs(r["resultant_r"] - rbar) < 1e-6
        assert abs(r["mean_hour"] - mean_hour) < 1e-3
        assert abs(r["rayleigh_z"] - n * rbar * rbar) < 1e-3
        assert 0.0 <= r["resultant_r"] <= 1.0
        assert 0.0 <= r["mean_hour"] < 24.0
