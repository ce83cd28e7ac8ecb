"""Invariants for the round-3 continuation batch 31: containment
dedup (q340), tokenizer fertility (q341), ORC roundtrip (q342), shard
balance (q343), quantile parity (q344), JL distortion (q345), linking
ambiguity (kg110), hub edge share (kg111), co-mention PMI (kg113)."""

import math
import re
from collections import Counter

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg110_linking_ambiguity,
    kg111_hub_edge_share,
    kg113_comention_pmi,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q342_orc_roundtrip,
    q343_shard_balance,
    q344_quantile_parity,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    q345_jl_distortion,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q340_containment_dedup,
    q341_tokenizer_fertility,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q340_containment_dominates_jaccard(spark):
    rows = q340_containment_dedup(spark, SF01).collect()
    assert rows, "LSH candidates must exist at sf0.01"
    for r in rows:
        # C(A,B) >= J(A,B) always (min(|A|,|B|) <= |A∪B|)
        assert r["containment"] >= r["jaccard"] - 1e-9
        assert 0.6 <= r["containment"] <= 1.0
        assert r["subset_only"] == (r["jaccard"] < 0.4)


def test_q341_matches_python(spark):
    bpe = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
    )
    rows = spark.read.parquet(f"{SF001}/documents.parquet").collect()
    agg = {}
    for r in rows:
        key = (r["source"], r["lang"])
        toks = bpe.findall(r["text"])
        a = agg.setdefault(key, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(toks)
        a[2] += len(r["text"].strip().split())
        a[3] += r["n_chars"]
    got = {
        (r["source"], r["lang"]): r
        for r in q341_tokenizer_fertility(spark, SF001).collect()
    }
    assert set(got) == set(agg)
    for key, (nd, nt, nw, nc) in agg.items():
        r = got[key]
        assert r["n_docs"] == nd and r["n_tokens"] == nt
        assert abs(r["fertility"] - round(nt / nw, 4)) < 1e-9
        assert abs(r["chars_per_token"] - round(nc / nt, 4)) < 1e-9


def test_q342_orc_preserves_checksums(spark):
    row = q342_orc_roundtrip(spark, SF001).collect()[0]
    src = spark.read.parquet(f"{SF001}/documents.parquet")
    assert row["n_docs"] == src.count()
    # checksum equality with the parquet source is the oracle's job;
    # here pin that the roundtrip is non-degenerate and deterministic
    again = q342_orc_roundtrip(spark, SF001).collect()[0]
    assert row == again


def test_q343_shards_partition_the_corpus(spark):
    row = q343_shard_balance(spark, SF001).collect()[0]
    src = spark.read.parquet(f"{SF001}/documents.parquet")
    total = src.groupBy().sum("n_chars").collect()[0][0]
    assert row["n_shards"] == 64
    assert row["min_bytes"] <= row["mean_bytes"] <= row["max_bytes"]
    assert row["max_over_mean"] >= 1.0
    assert 0.0 <= row["gini"] <= 1.0
    # mean * n == total bytes — shards PARTITION the corpus
    assert abs(row["mean_bytes"] * 64 - total) < 0.5 * 64


def test_q344_parity_gaps_mass_balance(spark):
    rows = q344_quantile_parity(spark, SF01).collect()
    n = sum(r["n_docs"] for r in rows)
    top = sum(r["n_top"] for r in rows)
    # strictly-above-p75 mass is at most 25% by the inverted-CDF rule
    assert top <= 0.25 * n + 1
    overall = top / n
    for r in rows:
        assert abs(
            r["parity_gap"] - round(r["n_top"] / r["n_docs"] - overall, 6)
        ) <= 2e-6


def test_q345_jl_concentration(spark):
    row = q345_jl_distortion(spark, SF01).collect()[0]
    assert row["n_pairs"] == 499
    assert row["min_ratio"] <= row["mean_ratio"] <= row["max_ratio"]
    # k=16 ⇒ σ≈0.35; the mean must sit near 1 and most pairs within ±50%
    assert 0.8 <= row["mean_ratio"] <= 1.2
    assert row["within_50pct"] >= 0.6


def test_kg110_counts_are_nested(spark):
    for r in kg110_linking_ambiguity(spark, SF001).collect():
        assert r["n_ambiguous"] <= r["n_linked"] <= r["n_forms"]
        if r["n_linked"]:
            assert 1.0 <= r["mean_fanout_linked"] <= r["max_fanout"]


def test_kg111_share_bounds(spark):
    rows = kg111_hub_edge_share(spark, SF001).collect()
    assert {r["direction"] for r in rows} == {"out", "in"}
    for r in rows:
        assert 0 < r["n_hubs"] and r["p99_degree"] >= 1
        assert 0.0 < r["hub_edge_share"] <= 1.0
        assert r["n_hub_edges"] <= r["n_edges"]


def test_kg113_matches_python(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    # kg mentions come from the interleaved kg docs, not this table —
    # replay the extraction regexes against the same kg source
    from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import docs_df

    rows = docs_df(spark, SF001).collect()
    per_doc = {}
    for r in rows:
        ents = set()
        for s in r["spans"]:
            if s["kind"] != "text" or not s["text"]:
                continue
            for m in re.findall(r"unit-[a-z]+-[0-9]{4}", s["text"]):
                ents.add("Unit:" + m)
            for m in re.findall(r"thread-[0-9]{3}", s["text"]):
                ents.add("Thread:" + m)
        if ents:
            per_doc[r["doc_id"]] = ents
    n = len(per_doc)
    c = Counter(e for es in per_doc.values() for e in es)
    pair = Counter()
    for es in per_doc.values():
        es = sorted(es)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                pair[(es[i], es[j])] += 1
    want = {
        k: v for k, v in pair.items() if v >= 2
    }
    got = {
        (r["ent_a"], r["ent_b"]): r
        for r in kg113_comention_pmi(spark, SF001).collect()
    }
    assert set(got) == set(want)
    for (ea, eb), cab in want.items():
        r = got[(ea, eb)]
        assert r["c_ab"] == cab and r["c_a"] == c[ea] and r["c_b"] == c[eb]
        assert abs(
            r["pmi"] - round(math.log(cab * n / (c[ea] * c[eb])), 6)
        ) < 1e-9
    assert docs.count() > 0
