"""Invariants for q316 Mann-Whitney, q317 Kruskal-Wallis, q318
Brown-Forsythe: each pinned against a pure-Python midrank/median replay
on the same parquet input."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q316_mann_whitney,
    q317_kruskal_wallis,
    q318_brown_forsythe,
)

SF001 = "/root/testdata/sf0.001"


def _midranks(values):
    cnt = Counter(values)
    mid, off = {}, 0.0
    for v in sorted(cnt):
        t = cnt[v]
        mid[v] = off + (t + 1.0) / 2.0
        off += t
    tie = sum(t**3 - t for t in cnt.values())
    return mid, tie, off


def test_q316_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select("lang", "n_chars")
        .collect()
    )
    vals = [float(r["n_chars"]) for r in rows]
    mid, tie, n_all = _midranks(vals)
    by = defaultdict(list)
    for r in rows:
        by[r["lang"]].append(float(r["n_chars"]))
    got = {r["lang"]: r for r in q316_mann_whitney(spark, SF001).collect()}
    assert set(got) == set(by)
    for lang, xs in by.items():
        n1, n2 = len(xs), n_all - len(xs)
        r_g = sum(mid[v] for v in xs)
        u = r_g - n1 * (n1 + 1) / 2.0
        var = (n1 * n2 / 12.0) * (
            (n_all + 1.0) - tie / (n_all * (n_all - 1.0))
        )
        z = (u - n1 * n2 / 2.0) / math.sqrt(var)
        assert got[lang]["n"] == n1
        assert abs(got[lang]["u_stat"] - round(u, 2)) < 1e-9
        assert abs(got[lang]["z"] - z) < 1e-5
        assert abs(
            got[lang]["rank_biserial"] - (1.0 - 2.0 * u / (n1 * n2))
        ) < 1e-5


def test_q317_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    vals = [float(r["n_chars"]) for r in rows]
    mid, tie, n = _midranks(vals)
    by = defaultdict(list)
    for r in rows:
        by[r["source"]].append(float(r["n_chars"]))
    sr = sum(
        sum(mid[v] for v in xs) ** 2 / len(xs) for xs in by.values()
    )
    h = 12.0 / (n * (n + 1.0)) * sr - 3.0 * (n + 1.0)
    hc = h / (1.0 - tie / (n**3 - n))
    row = q317_kruskal_wallis(spark, SF001).collect()[0]
    assert row["k_groups"] == len(by)
    assert row["n"] == n
    assert abs(row["h_stat"] - h) < 1e-5
    assert abs(row["h_tie_corrected"] - hc) < 1e-5
    # with 20 heterogeneous sources H must be positive
    assert row["h_stat"] > 0


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def test_q318_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF001}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    by = defaultdict(list)
    for r in rows:
        by[r["event_type"]].append(float(r["value"]))
    by = {k: v for k, v in by.items() if len(v) > 1}
    zs = {k: [abs(x - _median(v)) for x in v] for k, v in by.items()}
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    s_all = sum(sum(v) for v in zs.values())
    ss_all = sum(sum(x * x for x in v) for v in zs.values())
    sb = sum(sum(v) ** 2 / len(v) for v in zs.values())
    ssb = sb - s_all**2 / n
    ssw = ss_all - sb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = q318_brown_forsythe(spark, SF001).collect()[0]
    assert row["k_groups"] == k and row["n"] == n
    assert abs(row["f_bf"] - f) < 1e-4
    assert row["ss_within"] > 0
