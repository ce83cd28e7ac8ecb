"""Invariants for q324 n-gram novelty and q325 temporal leakage —
pure-Python replays on the same parquet."""

import hashlib
from collections import defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q325_temporal_leakage,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q324_ngram_novelty,
)

SF001 = "/root/testdata/sf0.001"


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _md5long(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q324_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    train = defaultdict(set)
    test = defaultdict(set)
    for r in rows:
        t = _tokens(r["text"])
        dest = train if _md5long(str(r["doc_id"])) % 10 < 8 else test
        for n in (1, 2, 3):
            for i in range(len(t) - n + 1):
                dest[n].add(_md5long(" ".join(t[i : i + n])))
    got = {r["n"]: r for r in q324_ngram_novelty(spark, SF001).collect()}
    assert set(got) == {1, 2, 3}
    prev = -1.0
    for n in (1, 2, 3):
        novel = len(test[n] - train[n])
        assert got[n]["n_test"] == len(test[n])
        assert got[n]["n_novel"] == novel
        assert abs(got[n]["novelty"] - round(novel / len(test[n]), 6)) < 1e-9
        # novelty must rise with n on natural text
        assert got[n]["novelty"] >= prev
        prev = got[n]["novelty"]


def test_q325_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_type", "user_id", "ts"
    ).collect()
    eps = [r["ts"].timestamp() // 1 for r in rows]
    t0, t1 = min(eps), max(eps)
    cut = t0 + 0.8 * (t1 - t0)
    users = defaultdict(lambda: [0, 0])
    for r, ep in zip(rows, eps):
        k = (r["event_type"], r["user_id"])
        if ep < cut:
            users[k][0] = 1
        else:
            users[k][1] = 1
    per_type = defaultdict(lambda: [0, 0, 0])
    for (et, _), (tr, te) in users.items():
        per_type[et][0] += tr
        per_type[et][1] += te
        per_type[et][2] += tr * te
    got = {r["event_type"]: r for r in
           q325_temporal_leakage(spark, SF001).collect()}
    expect = {et: v for et, v in per_type.items() if v[1] > 0}
    assert set(got) == set(expect)
    for et, (tr, te, lk) in expect.items():
        r = got[et]
        assert (r["n_train_users"], r["n_test_users"], r["n_leaked"]) == (
            tr,
            te,
            lk,
        )
        assert abs(r["leakage"] - round(lk / te, 6)) < 1e-9
