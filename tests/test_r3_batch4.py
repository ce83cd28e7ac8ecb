"""Invariants for q271–q273: Newton training improves on the chance
log-loss, ACF is a bounded damped correlation with the right pair
counts, and the GMM renders ordered, properly-normalized components."""

import math

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q272_acf,
    q273_gmm_em,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
    q271_logistic_irls,
)

SF01 = "/root/testdata/sf0.01"


def test_logistic_beats_chance_and_is_finite(spark):
    """Three Newton rounds from beta=0 must not do worse than the
    chance model (log-loss <= ln 2 up to rounding) and the fitted
    coefficients stay in a sane range for O(1) features."""
    rows = q271_logistic_irls(spark, SF01).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 15000
    assert 0.0 < r["log_loss"] <= math.log(2.0) + 1e-4
    assert abs(r["b0"]) < 10 and abs(r["b1"]) < 10


def test_acf_bounded_and_pair_counts(spark):
    """acf in [-1, 1] for the biased estimator; an exact day-offset
    join over a gap-free 30-day series yields n_days - lag pairs."""
    rows = q272_acf(spark, SF01).collect()
    assert len(rows) == 5 * 7
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9
        assert r["n_pairs"] <= r["n_days"] - r["lag"]


def test_gmm_components_ordered_and_normalized(spark):
    rows = q273_gmm_em(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["w_lo"] <= 1.0
        assert r["mu_lo"] <= r["mu_hi"]
        # sqrt of the 1e-4 variance floor
        assert r["sd_lo"] >= 0.01 - 1e-9
        assert r["sd_hi"] >= 0.01 - 1e-9
        assert r["n"] > 0


def test_logrank_consistent_counts(spark):
    """Cohort subject/churn totals reconcile with q250's subject
    framing, the variance is positive, and chi2 = (O-E)^2 / V."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q274_logrank,
    )

    r = q274_logrank(spark, SF01).collect()[0]
    assert r["churned_a"] <= r["n_a"] and r["churned_b"] <= r["n_b"]
    assert r["var_lr"] > 0
    expect = r["o_minus_e"] ** 2 / r["var_lr"]
    assert abs(r["chi2"] - expect) < 1e-2


def test_jackknife_ci_brackets_theta(spark):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q275_ratio_jackknife,
    )

    r = q275_ratio_jackknife(spark, SF01).collect()[0]
    assert r["n_buckets"] == 32
    assert r["se_jack"] >= 0
    assert r["ci_lo"] <= r["theta"] <= r["ci_hi"]


def test_cochran_armitage_chi2_is_z_squared(spark):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q276_cochran_armitage,
    )

    r = q276_cochran_armitage(spark, SF01).collect()[0]
    assert r["n"] == 15000
    assert 0.0 < r["p_bar"] < 1.0
    assert abs(r["chi2_trend"] - r["z_trend"] ** 2) < 1e-4


def test_perplexity_buckets_partition_and_order(spark):
    """Terciles partition the corpus (sizes differ by <= 1) and mean
    cross-entropy rises head -> tail; bucket CE ranges do not invert."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q277_perplexity_buckets,
    )

    rows = {
        r["bucket"]: r
        for r in q277_perplexity_buckets(spark, SF01).collect()
    }
    assert sorted(rows) == [1, 2, 3]
    sizes = [rows[b]["n_docs"] for b in (1, 2, 3)]
    assert max(sizes) - min(sizes) <= 1
    assert rows[1]["mean_ce"] <= rows[2]["mean_ce"] <= rows[3]["mean_ce"]
    assert rows[1]["ce_hi"] <= rows[2]["ce_lo"] + 1e-9
    assert rows[2]["ce_hi"] <= rows[3]["ce_lo"] + 1e-9


def test_rouge2_metric_identities(spark):
    """P and R are clipped-count fractions in (0, 1]; F1 is their
    harmonic mean; overlap can't exceed either doc's bigram total."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
        q278_rouge2,
    )

    rows = q278_rouge2(spark, SF01).collect()
    assert rows
    for r in rows:
        assert 0 < r["rouge2_p"] <= 1.0 and 0 < r["rouge2_r"] <= 1.0
        hm = 2 * r["rouge2_p"] * r["rouge2_r"] / (
            r["rouge2_p"] + r["rouge2_r"]
        )
        assert abs(r["rouge2_f"] - hm) < 1e-3
        assert r["rouge2_f"] >= 0.2


def test_srm_counts_reconcile_and_chi2_nonneg(spark):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q279_srm_check,
    )

    r = q279_srm_check(spark, SF01).collect()[0]
    assert r["n_train"] + r["n_val"] + r["n_test"] == r["n"]
    assert r["chi2"] >= 0
    # the md5 8/1/1 assignment on this corpus is healthy
    assert r["srm_detected"] == 0


def test_neyman_allocation_sums_to_budget(spark):
    """Integer seats sum to exactly B; every stratum's seat count is
    within 1 of its real-valued Neyman share."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q280_neyman_allocation,
    )

    rows = q280_neyman_allocation(spark, SF01).collect()
    assert sum(r["alloc"] for r in rows) == 1000
    tot = sum(r["n_docs"] * r["s_h"] for r in rows)
    for r in rows:
        share = 1000 * r["n_docs"] * r["s_h"] / tot
        assert abs(r["alloc"] - share) < 1.0 + 1e-6


def test_msprt_p_monotone_nonincreasing(spark):
    """The always-valid p-value never rises as days accumulate, and
    lives in (0, 1]."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q281_msprt,
    )

    rows = q281_msprt(spark, SF01).orderBy("day").collect()
    assert len(rows) == 30
    ps = [r["p_always_valid"] for r in rows]
    assert all(0 < p <= 1.0 for p in ps)
    assert all(b <= a + 1e-9 for a, b in zip(ps, ps[1:]))
    assert [r["n"] for r in rows] == list(range(1, 31))


def test_pacf_lag1_equals_acf_lag1(spark):
    """pacf_1 == rho_1 by definition; all correlations bounded."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q282_pacf,
    )

    rows = q282_pacf(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["pacf1"] == r["rho1"]
        for k in ("rho1", "rho2", "rho3", "pacf2", "pacf3"):
            assert -1.0 - 1e-6 <= r[k] <= 1.0 + 1e-6


def test_ipf_raking_matches_source_margins_exactly(spark):
    """After the final source half-step the weighted source margins
    equal the scaled full-corpus targets, and the weighted total
    equals the train-split size."""
    import duckdb

    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q283_ipf_raking,
    )

    rows = q283_ipf_raking(spark, SF01).collect()
    doc = f"{SF01}/documents.parquet"
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{doc}'").fetchone()[0]
    srcs = dict(
        duckdb.sql(
            f"SELECT source, COUNT(*) FROM '{doc}' GROUP BY 1"
        ).fetchall()
    )
    t = sum(r["n_train"] for r in rows)
    wtot = sum(r["weight"] * r["n_train"] for r in rows)
    assert abs(wtot - t) < 1e-2
    by_src = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + (
            r["weight"] * r["n_train"]
        )
    for s, achieved in by_src.items():
        assert abs(achieved - srcs[s] * t / n) < 1e-2


def test_markov_attribution_shares_normalize(spark):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q284_markov_attribution,
    )

    rows = q284_markov_attribution(spark, SF01).collect()
    assert {r["channel"] for r in rows} == {"click", "signup", "view"}
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # removing a channel can only hurt conversion
        assert r["p_win_removed"] <= r["p_win_base"] + 1e-9
        assert 0 <= r["removal_effect"] <= 1


def test_hhi_bounds_and_effective_sources(spark):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q285_hhi,
    )

    rows = q285_hhi(spark, SF01).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_sources"] - 1e-9 <= r["hhi"] <= 1.0
        assert 0.0 <= r["hhi_norm"] <= 1.0
        assert 1.0 <= r["effective_sources"] <= r["n_sources"] + 1e-9


def test_woe_iv_decile_identities(spark):
    """Deciles are balanced, pos <= n, and every IV contribution is
    non-negative (sign(p-b) == sign(WoE) by construction when the
    smoothing perturbation is small)."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
        q286_woe_iv,
    )

    rows = q286_woe_iv(spark, SF01).collect()
    assert sorted(r["decile"] for r in rows) == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r["pos"] <= r["n"]
        assert r["iv"] >= -1e-4


def test_kleinberg_burst_covers_series_and_flags_peaks(spark):
    """Every (type, day) cell gets a 0/1 state; burst days have a
    higher mean count than base days within each type that bursts."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q287_kleinberg_burst,
    )

    rows = q287_kleinberg_burst(spark, SF01).collect()
    assert len(rows) == 5 * 30
    by_type = {}
    for r in rows:
        assert r["in_burst"] in (0, 1)
        by_type.setdefault(r["event_type"], []).append(r)
    for tp, rs in by_type.items():
        burst = [r["y"] for r in rs if r["in_burst"] == 1]
        base = [r["y"] for r in rs if r["in_burst"] == 0]
        if burst and base:
            assert sum(burst) / len(burst) > sum(base) / len(base)


def test_positional_attribution_shares_and_bounds(spark):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        q288_positional_attribution,
    )

    rows = q288_positional_attribution(spark, SF01).collect()
    assert {r["channel"] for r in rows} <= {"click", "signup", "view"}
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # per-journey credit sums to 1, so credit <= touches
        assert 0 < r["credit"] <= r["touches"]
