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
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load, tokens


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


# ----------------------------------------- round-3 additions (q220-q224)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-min's one-sided guarantee: est >= true for every probe."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q223_cms_estimate,
    )

    rows = q223_cms_estimate(spark, sf_dir).collect()
    assert rows, "probe set must be non-empty"
    for r in rows:
        assert r["cms_est"] >= r["true_c"], r


def test_dsir_targets_score_higher(spark, sf_dir):
    """DSIR weights: the target slice (en) must average above the
    non-target slices — the whole point of the log-likelihood ratio."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q220_dsir_weights,
    )

    w = q220_dsir_weights(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    j = w.join(docs, "doc_id").groupBy(
        (F.col("lang") == "en").alias("is_en")
    ).agg(F.avg(F.col("dsir") / F.col("n_bigrams")).alias("m"))
    m = {r["is_en"]: r["m"] for r in j.collect()}
    assert m[True] > m[False], m


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a run of >= w+k-1 tokens must share a
    fingerprint (the winnowing selection guarantee)."""
    import oak_knowledge_graph_neo4j_auradb_spark.queries.textops as tx

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 4+3-1
    rows = [
        ("a", f"unique one two {shared} tail tokens here", "en", "s", 1),
        ("b", f"{shared} completely different ending words", "en", "s", 1),
        ("c", "nothing in common with either document at all", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, n_chars int"
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in tx.q221_winnowing(spark, d).collect()
    }
    assert ("a", "b") in got and got[("a", "b")] >= 2
    assert all(p == ("a", "b") for p in got)


def test_temporal_reach_vs_bruteforce(spark, sf_dir):
    """q224 against a pure-Python earliest-arrival brute force."""
    from collections import defaultdict

    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q224_temporal_reach,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

    ev = [
        (r["user_id"], int(r["ts"].timestamp()), int(r["value"] // 1))
        for r in load(spark, sf_dir, "events").collect()
    ]
    by_bucket = defaultdict(list)
    for u, s, b in ev:
        by_bucket[b].append((u, s))
    ce = set()
    for b, rows in by_bucket.items():
        for u, s in rows:
            for v, t in rows:
                if v != u and s < t <= s + 3600:
                    ce.add((u, v, t))
    arr1, edges_from = {}, defaultdict(list)
    for u, v, t in ce:
        arr1[(u, v)] = min(arr1.get((u, v), t), t)
        edges_from[u].append((v, t))
    n1 = defaultdict(int)
    for (u, v) in arr1:
        n1[u] += 1
    hop2 = defaultdict(set)
    for (u, v), ta in arr1.items():
        for w, t in edges_from[v]:
            if t > ta and w != u:
                hop2[u].add(w)
    got = {
        r["user_id"]: (r["n_1hop"], r["n_2hop"])
        for r in q224_temporal_reach(spark, sf_dir).collect()
    }
    want = {u: (n1[u], len(hop2[u])) for u in n1}
    assert got == want


def test_k_anonymity_monotone(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q222_k_anonymity,
    )

    rows = {r["k"]: r for r in q222_k_anonymity(spark, sf_dir).collect()}
    assert set(rows) == {2, 5, 10}
    assert (
        rows[2]["rows_at_risk"]
        <= rows[5]["rows_at_risk"]
        <= rows[10]["rows_at_risk"]
    )
    assert rows[2]["n_classes"] == rows[10]["n_classes"]


def _py_bpe(word_counts, rounds):
    """Reference BPE trainer: greedy left-to-right non-overlapping apply."""
    vocab = {w: [ch for ch in w] for w in word_counts}
    merges = []
    for _ in range(rounds):
        cnt = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] = (
                    cnt.get((syms[i], syms[i + 1]), 0) + word_counts[w]
                )
        if not cnt:
            break
        best = min(cnt, key=lambda p: (-cnt[p], p))
        merges.append((best[0], best[1], cnt[best]))
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_merges_vs_python_reference(spark, sf_dir):
    """q228's fold-based merge apply equals a classic sequential BPE
    trainer run on the same word-count vocabulary."""
    from collections import Counter
    import re

    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        _BPE_ROUNDS,
        q228_bpe_merges,
    )

    docs = load(spark, sf_dir, "documents").select("text").collect()
    wc = Counter()
    for r in docs:
        wc.update(t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t)
    want = _py_bpe(dict(wc), _BPE_ROUNDS)
    got = [
        (r["merge_a"], r["merge_b"], r["cnt"])
        for r in q228_bpe_merges(spark, sf_dir).orderBy("round").collect()
    ]
    assert got == want, (got, want)


def test_dup_spans_are_real_shared_substrings(spark, sf_dir):
    """Every q229 span maps to token-for-token equal subsequences in
    both documents at the reported positions and length."""
    import re

    from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
        q229_dup_spans,
    )

    toks = {
        r["doc_id"]: [
            t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t
        ]
        for r in load(spark, sf_dir, "documents").collect()
    }
    spans = q229_dup_spans(spark, sf_dir).collect()
    assert spans, "expected at least one duplicated span at this SF"
    for r in spans:
        a = toks[r["doc_a"]][r["start_a"] - 1 : r["start_a"] - 1 + r["span_tokens"]]
        b = toks[r["doc_b"]][r["start_b"] - 1 : r["start_b"] - 1 + r["span_tokens"]]
        assert len(a) == r["span_tokens"] and a == b, r


def test_bpe_merges_random_corpora_vs_reference(spark, tmp_path):
    """q228 on three random synthetic corpora (including merge chains
    from repeated characters and count ties) equals the sequential
    trainer — the corpus goes through the real parquet-reading query."""
    import random

    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        _BPE_ROUNDS,
        q228_bpe_merges,
    )

    rng = random.Random(7)
    alphabet = "abcx"
    for trial in range(3):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(40)
        ]
        text = " ".join(words)
        docs = spark.createDataFrame(
            [("0", text, "en", "s", len(text))],
            "doc_id string, text string, lang string, source string,"
            " n_chars long",
        )
        d = str(tmp_path / f"bpe{trial}")
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        wc = Counter(words)
        want = _py_bpe(dict(wc), _BPE_ROUNDS)
        got = [
            (r["merge_a"], r["merge_b"], r["cnt"])
            for r in q228_bpe_merges(spark, d).orderBy("round").collect()
        ]
        assert got == want, (trial, got, want)


def test_dup_spans_handcrafted_positions(spark, tmp_path):
    """q229 on documents with a known 12-token shared block reports the
    exact start positions and span length in both docs."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
        q229_dup_spans,
    )

    shared = " ".join(f"tok{i}" for i in range(12))  # 12 tokens
    a_prefix = "alpha beta gamma"  # 3 tokens -> shared starts at pos 4
    b_prefix = "delta"  # 1 token -> shared starts at pos 2
    rows = [
        (1, f"{a_prefix} {shared} omega", "en", "s", 1),
        (2, f"{b_prefix} {shared} psi chi", "en", "s", 1),
        (3, "nothing shared here at all beyond tiny words", "en", "s", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    d = str(tmp_path / "spans")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = q229_dup_spans(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["start_a"] == 4 and r["start_b"] == 2
    assert r["span_tokens"] == 12


def test_rendezvous_minimal_movement(spark, sf_dir):
    """q236: the HRW invariant — expanding 8→9 shards moves documents
    ONLY into the new shard (moved_in == 0 for shards 0–7, and shard
    8's entire population is moved-in); counts conserve."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        _HRW_K,
        q236_rendezvous_shards,
    )

    rows = {r["shard"]: r for r in q236_rendezvous_shards(spark, sf_dir).collect()}
    assert set(rows) == set(range(_HRW_K + 1))
    n = sum(r["n_8"] for r in rows.values())
    assert sum(r["n_9"] for r in rows.values()) == n
    for s in range(_HRW_K):
        assert rows[s]["moved_in"] == 0, rows[s]
    new = rows[_HRW_K]
    assert new["n_8"] == 0 and new["moved_in"] == new["n_9"] > 0
    # expected ~N/9 movement; allow wide tolerance
    assert n / 20 < new["n_9"] < n / 4


def test_zorder_layout_bounds_and_win(spark, sf_dir):
    """q241: the z-order bucket fixes 5 high bits of each dim, so both
    per-bucket spans are <= 7 by construction; the linear control has
    exact x locality (span 0) but near-domain y spans; and the
    z-layout's y touch fraction beats the linear layout's by a wide
    margin — the data-skipping contract the layout rewrite pays for."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q241_zorder_layout,
    )

    got = {r["layout"]: r for r in q241_zorder_layout(spark, sf_dir).collect()}
    assert set(got) == {"linear_x", "zorder"}
    z, lin = got["zorder"], got["linear_x"]
    assert z["avg_x_span"] <= 7 and z["avg_y_span"] <= 7
    assert lin["avg_x_span"] == 0.0
    assert lin["avg_y_span"] > 100
    assert z["y_touch_frac"] < lin["y_touch_frac"] / 4
    assert z["x_touch_frac"] <= 8 / 256 + 1e-9
    assert abs(lin["x_touch_frac"] - 1 / 256) < 1e-4  # 4dp render


def test_temperature_mix_interpolates(spark, sf_dir):
    """q242: temperature shares sum to 1, sit strictly between uniform
    and natural for every shard (alpha in (0,1) compresses the mix),
    and repeat factors exceed 1 exactly for below-average shards."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q242_temperature_mix,
    )

    got = q242_temperature_mix(spark, sf_dir).collect()
    k = len(got)
    assert abs(sum(r["temp_share"] for r in got) - 1.0) < 1e-4
    assert abs(sum(r["nat_share"] for r in got) - 1.0) < 1e-4
    for r in got:
        lo = min(r["nat_share"], 1.0 / k)
        hi = max(r["nat_share"], 1.0 / k)
        assert lo - 1e-6 <= r["temp_share"] <= hi + 1e-6, r
        assert (r["repeat_factor"] > 1) == (r["nat_share"] < r["temp_share"]) or (
            abs(r["repeat_factor"] - 1) < 1e-6
        )


def test_kneser_ney_sums_to_one(spark, sf_dir):
    """q244: interpolated KN is a proper distribution — for every
    context a, summing p_KN(b|a) over the continuation vocabulary
    (observed successors get the discounted term; all others only the
    backoff term) gives exactly 1. Recomputed from raw bigram counts
    collected off the same corpus."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load, tokens
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        _KN_D,
        q244_kneser_ney,
    )

    got = q244_kneser_ney(spark, sf_dir).collect()
    assert got and all(r["avg_nll"] > 0 for r in got)

    toks = load(spark, sf_dir, "documents").select(tokens(F.col("text")).alias("t"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    rows = bg.groupBy("a", "b").count().collect()
    from collections import defaultdict

    c2 = {(r["a"], r["b"]): r["count"] for r in rows}
    c1, n1f, n1r = defaultdict(int), defaultdict(int), defaultdict(int)
    for (a, b), c in c2.items():
        c1[a] += c
        n1f[a] += 1
        n1r[b] += 1
    tt = len(c2)
    vocab_r = sorted(n1r)
    for a in sorted(c1)[:10]:
        total = 0.0
        for b in vocab_r:
            disc = max(c2.get((a, b), 0) - _KN_D, 0.0) / c1[a]
            total += disc + _KN_D * n1f[a] / c1[a] * (n1r[b] / tt)
        assert abs(total - 1.0) < 1e-9, (a, total)
