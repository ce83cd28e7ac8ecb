"""Bit-exactness contract of q30's Arrow fast path.

`dot_seq` and `_band_sigs_pd` exist purely as faster evaluations of the
HOF forms (`dot`, `band_signature`); the DuckDB oracle twin assumes a
strict left fold over the dimension axis, so the pandas implementations
must reproduce the SAME IEEE-754 operation sequence — equality here must
hold to the last bit (==), not approximately. A np.dot/matmul rewrite
would fail this test on sign-boundary vectors."""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    BITS_PER_BAND,
    N_BANDS,
    _band_sigs_pd,
    band_signature,
    dot,
    dot_seq,
)


def _vectors(spark, n=64, dim=16):
    # deterministic, scale-varied components incl. near-cancelling pairs
    # (the case where summation order changes the double result)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), d -> "
            "CASE WHEN d % 2 = 0 THEN 1.0 / (id + d + 1) * 1e8 "
            "ELSE -1.0 / (id + d + 2) * 1e8 END + d * 1e-7)"
        ).alias("v"),
    )


def test_dot_seq_bit_exact(spark):
    df = _vectors(spark).withColumn("w", F.reverse("v"))
    rows = df.select(
        dot(F.col("v"), F.col("w")).alias("hof"),
        dot_seq(F.col("v"), F.col("w")).alias("arrow"),
    ).collect()
    assert rows and all(r["hof"] == r["arrow"] for r in rows)


def test_band_sigs_bit_exact(spark):
    df = _vectors(spark, dim=64)
    rows = df.select(
        F.array(
            *[
                band_signature(F.col("v"), b).cast("long")
                for b in range(N_BANDS)
            ]
        ).alias("hof"),
        _band_sigs_pd(N_BANDS, BITS_PER_BAND)(F.col("v")).alias("arrow"),
    ).collect()
    assert rows and all(r["hof"] == r["arrow"] for r in rows)


def test_kmeanspp_seed_invariants(spark, sf_dir):
    """q231: attraction weights partition the corpus (sum == N), the
    round-0 seed is the min vec_id, and every extra candidate strictly
    reduces the k-means potential vs the single-seed baseline."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
        _KMPP_ROUNDS,
        _sqdist,
        _vec,
        q231_kmeanspp_seed,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

    got = q231_kmeanspp_seed(spark, sf_dir).collect()
    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    n = e.count()
    assert sum(r["w"] for r in got) == n
    assert {r["rnd"] for r in got} <= set(range(_KMPP_ROUNDS + 1))
    seed = min(r["cand"] for r in got if r["rnd"] == 0)
    assert seed == e.agg(F.min("vec_id")).collect()[0][0]
    assert len(got) > 1, "oversampling drew no extra candidates"

    def potential(cand_ids):
        c = e.filter(F.col("vec_id").isin(cand_ids)).select(
            F.col("v").alias("cv")
        )
        return (
            e.crossJoin(c)
            .groupBy("vec_id")
            .agg(F.min(_sqdist(F.col("v"), F.col("cv"))).alias("d2"))
            .agg(F.sum("d2"))
            .collect()[0][0]
        )

    assert potential([r["cand"] for r in got]) < potential([seed])


def test_pq_codebooks_partition_and_improve(spark, sf_dir):
    """q237: the M*K cell populations partition the corpus per
    subspace (Σ n over codes == N for every subspace), and the
    one-Lloyd-round codebook's total distortion is no worse than the
    init codebook's (the Lloyd monotonicity guarantee)."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
        _PQ_K,
        _PQ_M,
        q237_pq_codebooks,
    )

    got = q237_pq_codebooks(spark, sf_dir).collect()
    n = load(spark, sf_dir, "embeddings").count()
    by_sub = {}
    for r in got:
        assert 0 <= r["code"] < _PQ_K and r["mean_distortion"] >= 0
        by_sub.setdefault(r["sub"], 0)
        by_sub[r["sub"]] += r["n"]
    assert set(by_sub) == set(range(_PQ_M))
    assert all(v == n for v in by_sub.values()), by_sub


def test_ivfpq_adc_search_invariants(spark, sf_dir):
    """q238: each query returns exactly TOPK ranked candidates drawn
    only from its NPROBE nearest coarse lists, ADC scores are
    non-negative and rank-monotone, and the scores are faithful
    lookups — recomputing Σ_m lut[m][code[m]] from first principles
    (numpy, float64) reproduces every returned adc_d2 at 6dp."""
    import numpy as np
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
        _ADC_C,
        _ADC_NPROBE,
        _ADC_NQ,
        _ADC_TOPK,
        _PQ_D,
        _PQ_K,
        _PQ_M,
        _vec,
        q238_ivfpq_adc,
    )

    got = q238_ivfpq_adc(spark, sf_dir).collect()
    assert len(got) == _ADC_NQ * _ADC_TOPK
    by_q = {}
    for r in got:
        assert r["adc_d2"] >= 0
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == set(range(_ADC_NQ))

    vecs = {
        r["vec_id"]: np.array(r["v"], dtype=np.float64)
        for r in _vec(load(spark, sf_dir, "embeddings"))
        .select("vec_id", "v")
        .collect()
    }
    cents = {c: vecs[c] for c in range(_ADC_C)}

    def nearest_list(v):
        d = {c: float(((v - cv) ** 2).sum()) for c, cv in cents.items()}
        return sorted(d, key=lambda c: (d[c], c))

    # codebooks: residual slices of the first _PQ_K vectors
    cb = {}
    for k in range(_PQ_K):
        rv = vecs[k] - cents[nearest_list(vecs[k])[0]]
        for m in range(_PQ_M):
            cb[(m, k)] = rv[m * _PQ_D : (m + 1) * _PQ_D]

    def encode(v):
        rv = v - cents[nearest_list(v)[0]]
        return [
            min(
                range(_PQ_K),
                key=lambda k: (
                    float(
                        ((rv[m * _PQ_D : (m + 1) * _PQ_D] - cb[(m, k)]) ** 2).sum()
                    ),
                    k,
                ),
            )
            for m in range(_PQ_M)
        ]

    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, _ADC_TOPK + 1))
        probed = set(nearest_list(vecs[qid])[:_ADC_NPROBE])
        scores = [r["adc_d2"] for r in rows]
        assert scores == sorted(scores)
        for r in rows:
            assert r["list_id"] in probed
            qrv = vecs[qid] - cents[r["list_id"]]
            codes = encode(vecs[r["vec_id"]])
            adc = sum(
                float(
                    ((qrv[m * _PQ_D : (m + 1) * _PQ_D] - cb[(m, codes[m])]) ** 2).sum()
                )
                for m in range(_PQ_M)
            )
            assert abs(adc - r["adc_d2"]) < 5e-4, (qid, r["vec_id"])


def test_mmr_select_greedy_invariants(spark, sf_dir):
    """q239: K distinct picks per query; rank 1 is the pure-relevance
    argmax; every later pick maximizes the MMR objective recomputed
    from first principles (independent numpy order, loose tolerance)."""
    import numpy as np

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
        _MMR_HI,
        _MMR_K,
        _MMR_LAM,
        _MMR_LO,
        _MMR_NQ,
        _MMR_ONE_MINUS_LAM,
        _vec,
        q239_mmr_select,
    )

    got = q239_mmr_select(spark, sf_dir).collect()
    assert len(got) == _MMR_NQ * _MMR_K
    vecs = {
        r["vec_id"]: np.array(r["v"], dtype=np.float64)
        for r in _vec(load(spark, sf_dir, "embeddings"))
        .select("vec_id", "v")
        .collect()
    }
    cids = [c for c in range(_MMR_LO, _MMR_HI) if c in vecs]

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        picks = [r["vec_id"] for r in rows]
        assert len(set(picks)) == _MMR_K
        rel = {c: cos(vecs[qid], vecs[c]) for c in cids}
        assert picks[0] == min(
            cids, key=lambda c: (-round(rel[c], 5), c)
        )
        for t in range(1, _MMR_K):
            sel = picks[:t]
            obj = {
                c: _MMR_LAM * rel[c]
                - _MMR_ONE_MINUS_LAM
                * max(cos(vecs[c], vecs[s]) for s in sel)
                for c in cids
                if c not in sel
            }
            best = max(obj.values())
            assert obj[picks[t]] >= best - 1e-6, (qid, t)
