"""Invariants for q337 ECE/MCE and q339 duplicate token mass —
pure-Python replays against the same parquet."""

import hashlib
from collections import Counter, defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q337_calibration_error,
    q339_dup_token_mass,
)

SF001 = "/root/testdata/sf0.001"


def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def test_q337_consistent_with_q320_bins(spark):
    row = q337_calibration_error(spark, SF001).collect()[0]
    assert row["n"] > 0 and 1 <= row["n_bins"] <= 10
    # L1/Linf ordering: ECE is a count-weighted mean of the per-bin
    # gaps, so it can never exceed MCE (their max)
    assert 0.0 <= row["ece"] <= row["mce"] <= 1.0


def test_q339_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "source", "text"
    ).collect()
    hcnt = Counter(
        int(hashlib.md5(r["text"].encode()).hexdigest()[:15], 16)
        for r in rows
    )
    per = defaultdict(lambda: [0, 0, 0.0, 0.0])  # docs, dup, tok, duptok
    for r in rows:
        h = int(hashlib.md5(r["text"].encode()).hexdigest()[:15], 16)
        nt = float(len(_tokens(r["text"])))
        p = per[r["source"]]
        p[0] += 1
        p[2] += nt
        if hcnt[h] > 1:
            p[1] += 1
            p[3] += nt
    got = {r["source"]: r for r in
           q339_dup_token_mass(spark, SF001).collect()}
    assert set(got) == set(per)
    for s, (nd, ndup, tok, duptok) in per.items():
        r = got[s]
        assert r["n_docs"] == nd and r["n_dup_docs"] == ndup
        assert abs(r["dup_doc_frac"] - round(ndup / nd, 6)) < 1e-9
        assert abs(r["dup_token_frac"] - round(duptok / tok, 6)) < 1e-6
