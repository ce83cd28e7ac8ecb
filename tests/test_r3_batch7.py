"""Invariants for q292–q294: the AMS estimate is an unbiased-ish F2
proxy within sketch tolerance, l-diversity risk is monotone in l and
never below the k-anonymity shape constraints, and the DP release is
clamped, integer, and within the Laplace tail bound."""

import math

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q292_ams_f2,
    q293_l_diversity,
    q294_dp_histogram,
)

SF01 = "/root/testdata/sf0.01"


def test_ams_estimate_within_sketch_tolerance(spark):
    """16 estimators give std ≈ sqrt(2/4)·F2 per group; the 4-group
    median should land well within 2× of exact on every language (a
    loose but regression-catching band)."""
    rows = q292_ams_f2(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["exact_f2"] >= r["n_distinct_tokens"]  # f>=1 each
        assert r["est_f2"] > 0
        assert 0.2 * r["exact_f2"] <= r["est_f2"] <= 5.0 * r["exact_f2"]


def test_l_diversity_monotone_in_l(spark):
    rows = sorted(q293_l_diversity(spark, SF01).collect(), key=lambda r: r["l"])
    assert [r["l"] for r in rows] == [2, 3, 5]
    n_classes = {r["n_classes"] for r in rows}
    assert len(n_classes) == 1  # class table independent of l
    for a, b in zip(rows, rows[1:]):
        assert a["weak_classes"] <= b["weak_classes"]
        assert a["rows_at_risk"] <= b["rows_at_risk"]
        assert a["risk_pct"] <= b["risk_pct"]


def test_dp_release_clamped_integer_and_bounded(spark):
    """released_n >= 0 always; |noise| obeys the inverse-CDF bound
    ln(1e6)/eps; released_n == round(n + noise) when positive; the
    epsilon column is the pinned budget."""
    rows = q294_dp_histogram(spark, SF01).collect()
    assert rows
    bound = math.log(1e6) / 0.5 + 1e-6
    for r in rows:
        assert r["epsilon"] == 0.5
        assert r["released_n"] >= 0
        assert abs(r["noise"]) <= bound
        want = max(0, round(r["n"] + r["noise"]))
        assert abs(r["released_n"] - want) <= 1
