"""Invariants for q298–q300: the Holt-Winters fold reproduces a
hand-rolled Python recurrence, Page-Hinkley statistics match a Python
replay, and the Yule-Walker φ₂ coincides with q282's lag-2 PACF
(Durbin-Levinson identity)."""

from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    _HW_A,
    _HW_B,
    _HW_G,
    _HW_M,
    _PH_DELTA_FRAC,
    _PH_LAMBDA_SD,
    q282_pacf,
    q298_holt_winters,
    q299_page_hinkley,
    q300_yule_walker,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

SF01 = "/root/testdata/sf0.01"


def _daily(spark):
    ev = load(spark, SF01, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    rows = (
        ev.groupBy("event_type", day.alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    days: dict[str, list[int]] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r["y"])
        days.setdefault(r["event_type"], []).append(r["day"])
    return series, days


def _hw_py(ys, a=_HW_A, b=_HW_B, g=_HW_G, m=_HW_M):
    mu1 = sum(ys[:m]) / m
    mu2 = sum(ys[m : 2 * m]) / m
    level, trend = mu1, (mu2 - mu1) / m
    s = [y - mu1 for y in ys[:m]]
    sse = 0.0
    for y in ys[m:]:
        pred = level + trend + s[0]
        sse += (y - pred) ** 2
        lnew = a * (y - s[0]) + (1 - a) * (level + trend)
        tnew = b * (lnew - level) + (1 - b) * trend
        snew = g * (y - lnew) + (1 - g) * s[0]
        s = s[1:] + [snew]
        level, trend = lnew, tnew
    return level, trend, s[0], (sse / (len(ys) - m)) ** 0.5


def test_holt_winters_matches_python(spark):
    series, _ = _daily(spark)
    got = {r["event_type"]: r for r in q298_holt_winters(spark, SF01).collect()}
    exp_types = {t for t, ys in series.items() if len(ys) >= 2 * _HW_M + 1}
    assert set(got) == exp_types
    for t in exp_types:
        level, trend, s_next, rmse = _hw_py(series[t])
        r = got[t]
        assert r["n_days"] == len(series[t])
        assert abs(r["level"] - level) < 1e-4
        assert abs(r["trend"] - trend) < 1e-4
        assert abs(r["season_next"] - s_next) < 1e-4
        assert abs(r["rmse_1step"] - rmse) < 1e-4
        assert abs(
            r["forecast_next"] - (level + trend + s_next)
        ) < 1e-4


def test_page_hinkley_matches_python(spark):
    series, days = _daily(spark)
    got = {r["event_type"]: r for r in q299_page_hinkley(spark, SF01).collect()}
    assert set(got) == set(series)
    for t, ys in series.items():
        n = len(ys)
        mu = sum(ys) / n
        var = sum((y - mu) ** 2 for y in ys) / (n - 1)
        delta = _PH_DELTA_FRAC * mu
        lam = _PH_LAMBDA_SD * var**0.5
        m = 0.0
        mmin = 0.0
        run = 0.0
        max_ph = 0.0
        n_alarm = 0
        first_alarm = None
        cums = 0.0
        phs = []
        for i, y in enumerate(ys):
            cums += y
            cumavg = cums / (i + 1)
            run += y - cumavg - delta
            mmin = min(mmin if i else run, run)
            ph = run - mmin
            phs.append(ph)
            if ph > lam:
                n_alarm += 1
                if first_alarm is None:
                    first_alarm = days[t][i]
            max_ph = max(max_ph, ph)
        r = got[t]
        assert r["n_days"] == n
        assert abs(r["max_ph"] - max_ph) < 1e-4
        assert abs(r["lambda"] - lam) < 1e-4
        assert r["n_alarm_days"] == n_alarm
        assert r["first_alarm_day"] == first_alarm
        assert all(p >= -1e-12 for p in phs)


def test_yule_walker_consistent_with_pacf(spark):
    yw = {r["event_type"]: r for r in q300_yule_walker(spark, SF01).collect()}
    pacf = {r["event_type"]: r for r in q282_pacf(spark, SF01).collect()}
    assert set(yw) == set(pacf)
    for t, r in yw.items():
        # Durbin-Levinson: the AR(2) φ₂ IS the lag-2 partial autocorr
        # (q282 rounds at 4dp, so compare at that precision).
        assert abs(r["phi2"] - pacf[t]["pacf2"]) < 2e-4
        # stationarity triangle for a fitted AR(2) on a real series
        assert abs(r["phi2"]) < 1.0
        assert r["noise_var"] >= 0.0
