"""Invariants for q328 hubness and q329 reciprocity: numpy replay of
the exact top-K graph on the same embeddings."""

import numpy as np

from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    q328_knn_hubness,
    q329_knn_reciprocity,
)

SF001 = "/root/testdata/sf0.001"


def _topk(spark, k=5):
    import pyspark.sql.functions as F

    rows = (
        spark.read.parquet(f"{SF001}/embeddings.parquet")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    labs = {r["vec_id"]: r["label"] for r in rows}
    m = np.array([r["v"] for r in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    top = {}
    for i, qid in enumerate(ids):
        order = sorted(
            ((float(sims[i, j]), ids[j]) for j in range(len(ids)) if j != i),
            key=lambda t: (-t[0], t[1]),
        )
        top[qid] = [nid for _, nid in order[:k]]
    return top, labs


def test_q328_matches_numpy(spark):
    top, _ = _topk(spark)
    occ = {q: 0 for q in top}
    for q, ns in top.items():
        for n in ns:
            occ[n] += 1
    vals = np.array(sorted(occ.values()), dtype=float)
    m1 = vals.mean()
    m2 = ((vals - m1) ** 2).mean()
    m3 = ((vals - m1) ** 3).mean()
    row = q328_knn_hubness(spark, SF001).collect()[0]
    assert row["n_vecs"] == len(occ)
    assert abs(row["mean_k_occ"] - m1) < 1e-6
    assert abs(row["skewness"] - m3 / m2**1.5) < 1e-4
    assert row["n_antihub"] == int((vals == 0).sum())
    assert row["max_occ"] == int(vals.max())
    hub_occ = occ[row["hub_vec_id"]]
    assert hub_occ == int(vals.max())
    # argmax tie-break: smallest vec_id among maximal hubs
    assert row["hub_vec_id"] == min(
        v for v, c in occ.items() if c == hub_occ
    )


def test_q329_matches_numpy(spark):
    top, labs = _topk(spark)
    edges = {(q, n) for q, ns in top.items() for n in ns}
    per = {}
    for q, ns in top.items():
        lab = labs[q]
        a, b = per.get(lab, (0, 0))
        for n in ns:
            a += 1
            b += 1 if (n, q) in edges else 0
        per[lab] = (a, b)
    got = {r["label"]: r for r in q329_knn_reciprocity(spark, SF001).collect()}
    assert set(got) == set(per)
    for lab, (ne, nm) in per.items():
        assert got[lab]["n_edges"] == ne
        assert got[lab]["n_mutual"] == nm
        assert abs(got[lab]["reciprocity"] - round(nm / ne, 6)) < 1e-9
        assert 0.0 <= got[lab]["reciprocity"] <= 1.0
