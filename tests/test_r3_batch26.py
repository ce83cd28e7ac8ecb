"""Invariant for q333: bigram mutual information matches a
pure-Python entropy replay, and the information identities hold."""

import math
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q333_token_mi,
)

SF001 = "/root/testdata/sf0.001"


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_q333_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "text"
    ).collect()
    bg = defaultdict(Counter)
    uni = defaultdict(Counter)
    for r in rows:
        t = _tokens(r["text"])
        for a, b in zip(t, t[1:]):
            bg[r["source"]][(a, b)] += 1
            uni[r["source"]][a] += 1

    def ent(cnt, n):
        return -sum(c / n * math.log(c / n) for c in cnt.values())

    got = {r["source"]: r for r in q333_token_mi(spark, SF001).collect()}
    assert set(got) == set(bg)
    for s in bg:
        n = sum(bg[s].values())
        h_joint = ent(bg[s], n)
        h_uni = ent(uni[s], n)
        r = got[s]
        assert r["n_bigrams"] == n
        assert abs(r["h_unigram"] - h_uni) < 1e-5
        assert abs(r["h_conditional"] - (h_joint - h_uni)) < 1e-5
        assert abs(r["mutual_info"] - (2 * h_uni - h_joint)) < 1e-5
        # information identities / ranges
        assert 0.0 <= r["h_conditional"] <= r["h_unigram"] + 1e-9
        assert r["mutual_info"] >= -1e-9
        assert 0.0 <= r["mi_ratio"] <= 1.0 + 1e-9
