"""Invariants for q301–q303: Cramér's V against a scipy-free Python
chi-square replay, G-test positivity/consistency with the weekday
histogram, and the Theil between+within decomposition identity."""

import math

from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q301_cramers_v,
    q302_g_test,
    q303_theil_inequality,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

SF01 = "/root/testdata/sf0.01"


def test_cramers_v_matches_python(spark):
    d = load(spark, SF01, "documents").select("lang", "source").collect()
    from collections import Counter

    cells = Counter((r["lang"], r["source"]) for r in d)
    rows = Counter(lang for lang, _ in cells.elements())
    # recompute marginals from raw rows, not distinct cells
    rows = Counter(r["lang"] for r in d)
    cols = Counter(r["source"] for r in d)
    n = len(d)
    chi2 = 0.0
    for (lang, src), o in cells.items():
        e = rows[lang] * cols[src] / n
        chi2 += (o - e) ** 2 / e
    r, c = len(rows), len(cols)
    v = math.sqrt(chi2 / n / min(r - 1, c - 1))
    got = q301_cramers_v(spark, SF01).collect()[0]
    assert got["n"] == n
    assert got["n_rows"] == r and got["n_cols"] == c
    assert got["dof"] == (r - 1) * (c - 1)
    assert abs(got["chi2"] - chi2) < 1e-3
    assert abs(got["cramers_v"] - v) < 1e-5
    assert 0.0 <= got["cramers_v_corrected"] <= 1.0
    assert got["cramers_v_corrected"] <= got["cramers_v"] + 1e-9


def test_g_test_matches_python(spark):
    ev = load(spark, SF01, "events").select("ts").collect()
    # replicate only totals per type via the query's own histogram
    got = {r["event_type"]: r for r in q302_g_test(spark, SF01).collect()}
    assert len(got) == 5
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    cells = (
        load(spark, SF01, "events")
        .groupBy("event_type", F.pmod(day + 4, F.lit(7)).alias("wd"))
        .agg(F.count(F.lit(1)).alias("o"))
        .collect()
    )
    from collections import defaultdict

    hist = defaultdict(dict)
    for r in cells:
        hist[r["event_type"]][r["wd"]] = r["o"]
    for t, ws in hist.items():
        n = sum(ws.values())
        g = 2.0 * sum(o * math.log(o / (n / 7.0)) for o in ws.values())
        r = got[t]
        assert r["n"] == n
        assert r["n_cells"] == len(ws)
        assert abs(r["g_stat"] - g) < 1e-3
        z = (
            (g / 6.0) ** (1.0 / 3.0) - (1.0 - 2.0 / 54.0)
        ) / math.sqrt(2.0 / 54.0)
        assert abs(r["z_wh"] - z) < 1e-4
        assert r["nonuniform"] == (z > 3.0)
        # G ≥ 0 by Gibbs' inequality
        assert r["g_stat"] >= -1e-9


def test_theil_decomposition_identity(spark):
    rows = q303_theil_inequality(spark, SF01).collect()
    assert len(rows) == 5
    o = load(spark, SF01, "orders").select("o_totalprice").collect()
    xs = [r["o_totalprice"] for r in o]
    n = len(xs)
    mu = sum(xs) / n
    t_total = sum((x / mu) * math.log(x / mu) for x in xs) / n
    # decomposition: T = Σ s_g·T_g + Σ s_g·ln(μ_g/μ)
    within = sum(r["value_share"] * r["theil_t"] for r in rows)
    between = sum(r["between_component"] for r in rows)
    assert abs((within + between) - t_total) < 1e-3
    for r in rows:
        assert r["theil_t"] >= 0.0
        assert r["theil_l"] >= 0.0
        assert 0.0 < r["value_share"] < 1.0
    assert abs(sum(r["value_share"] for r in rows) - 1.0) < 1e-6
