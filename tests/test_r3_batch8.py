"""Invariants for q295–q297: the Holt fold reproduces a hand-rolled
Python recurrence, NB moments respect the overdispersion gate, and
TOST arithmetic is internally consistent."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q295_holt_linear,
    q296_negbin_fit,
    q297_tost_equivalence,
)

SF01 = "/root/testdata/sf0.01"


def _holt_py(ys, a=0.3, b=0.1):
    l, t = ys[0], ys[1] - ys[0]
    sse = 0.0
    for y in ys[1:]:
        pred = l + t
        sse += (y - pred) ** 2
        l_new = a * y + (1 - a) * pred
        t = b * (l_new - l) + (1 - b) * t
        l = l_new
    return l, t, (sse / (len(ys) - 1)) ** 0.5


def test_holt_matches_python_recurrence(spark):
    from pyspark.sql import functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

    rows = {r["event_type"]: r for r in q295_holt_linear(spark, SF01).collect()}
    assert len(rows) == 5
    ev = load(spark, SF01, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = (
        ev.groupBy("event_type", day.alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["y"])
    for et, ys in series.items():
        l, t, rmse = _holt_py(ys)
        got = rows[et]
        assert got["n_days"] == len(ys)
        assert abs(got["level"] - l) < 1e-4
        assert abs(got["trend"] - t) < 1e-4
        assert abs(got["rmse_1step"] - rmse) < 1e-4
        assert abs(got["forecast_next"] - (l + t)) < 1e-4


def test_negbin_gate_and_identities(spark):
    rows = q296_negbin_fit(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["dispersion"] > 0
        if r["var"] > r["mu"]:
            assert r["nb_r"] is not None and r["nb_r"] > 0
            assert 0.0 < r["nb_p"] < 1.0
        else:
            assert r["nb_r"] is None and r["nb_p"] is None


def test_tost_consistency(spark):
    rows = q297_tost_equivalence(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["se"] > 0 and r["delta"] > 0
        # z_lower + z_upper == 2*delta/se
        assert abs((r["z_lower"] + r["z_upper"]) - 2 * r["delta"] / r["se"]) < 1e-3
        assert r["equivalent"] == (min(r["z_lower"], r["z_upper"]) > 1.644854)
