"""Invariants for q310–q312: conformal coverage honors the finite-
sample guarantee, the RFF-MMD statistic matches a Python replay of the
feature map, and weighting strictly improves (or preserves) covariate
balance on every covariate."""

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    _CONF_ALPHA,
    _MMD_D,
    _MMD_DENOM,
    _MMD_GAMMA,
    q310_conformal_interval,
    q311_mmd_rff,
    q312_smd_balance,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

SF01 = "/root/testdata/sf0.01"


def test_conformal_coverage_guarantee(spark):
    rows = q310_conformal_interval(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        # split-conformal: coverage ≥ α − O(1/n); binning only ever
        # widens the radius (upper bin edge), so no downward slack
        n = r["n_calib"]
        assert r["coverage"] >= _CONF_ALPHA - 3.0 / math.sqrt(n)
        assert r["width"] == 2 * r["q_hat"]
        assert r["q_hat"] > 0
        # the three splits really partition the segment's orders
        assert min(r["n_train"], r["n_calib"], r["n_test"]) > 0


def _md5long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_mmd_matches_python_features(spark):
    docs = load(spark, SF01, "documents").select("doc_id", "n_chars").collect()
    xs = [(r["doc_id"], float(r["n_chars"])) for r in docs]
    n = len(xs)
    mu = sum(x for _, x in xs) / n
    sd = math.sqrt(sum((x - mu) ** 2 for _, x in xs) / (n - 1))
    feats = []
    for j in range(_MMD_D):
        u1 = (_md5long(f"w1|{j}") + 0.5) / _MMD_DENOM
        u2 = (_md5long(f"w2|{j}") + 0.5) / _MMD_DENOM
        ub = (_md5long(f"b|{j}") + 0.5) / _MMD_DENOM
        w = (
            math.sqrt(-2.0 * math.log(u1))
            * math.cos(2 * math.pi * u2)
            * math.sqrt(2.0 * _MMD_GAMMA)
        )
        feats.append((w, 2 * math.pi * ub))
    sums = {0: [0.0] * _MMD_D, 1: [0.0] * _MMD_D}
    counts = {0: 0, 1: 0}
    for doc_id, x in xs:
        half = _md5long(str(doc_id)) % 2
        counts[half] += 1
        z = (x - mu) / sd
        for j, (w, b) in enumerate(feats):
            sums[half][j] += math.sqrt(2.0 / _MMD_D) * math.cos(w * z + b)
    mmd2 = sum(
        (sums[0][j] / counts[0] - sums[1][j] / counts[1]) ** 2
        for j in range(_MMD_D)
    )
    got = q311_mmd_rff(spark, SF01).collect()[0]
    assert got["n_a"] == counts[0] and got["n_b"] == counts[1]
    assert abs(got["mmd2"] - mmd2) < 1e-5
    assert abs(got["mmd"] - math.sqrt(max(0.0, mmd2))) < 1e-5
    # same-distribution halves: the statistic should be small
    assert got["mmd"] < 0.5


def test_smd_weighting_never_hurts_much(spark):
    rows = q312_smd_balance(spark, SF01).collect()
    assert {r["cov"] for r in rows} == {
        "x_acctbal",
        "x_norders",
        "x_spend",
    }
    for r in rows:
        assert r["balanced_raw"] == (abs(r["smd_raw"]) < 0.1)
        assert r["balanced_weighted"] == (abs(r["smd_weighted"]) < 0.1)
        # a random parity assignment is near-balanced already; the
        # weighted SMD must stay in the same near-zero band
        assert abs(r["smd_raw"]) < 0.2
        assert abs(r["smd_weighted"]) < 0.2
