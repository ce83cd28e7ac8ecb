"""Invariants for q307–q309: the histogram-space Hill estimator equals
the naive sorted-order-statistics form, Atkinson sits in (0,1) and
below Theil-comparable bounds, and the Gumbel moments fit matches a
Python replay on the same block maxima."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    _ATK_EPS,
    _EULER_G,
    _GUMBEL_T,
    _HILL_FRAC,
    q307_hill_tail_index,
    q308_atkinson_index,
    q309_gumbel_evt,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

SF01 = "/root/testdata/sf0.01"


def test_hill_matches_sorted_order_statistics(spark):
    docs = load(spark, SF01, "documents").select("source", "n_chars").collect()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append(float(r["n_chars"]))
    got = {r["source"]: r for r in q307_hill_tail_index(spark, SF01).collect()}
    for src, xs in by_src.items():
        xs.sort(reverse=True)
        n = len(xs)
        k = math.ceil(_HILL_FRAC * n)
        if k + 1 > n:
            assert src not in got
            continue
        xk1 = xs[k]  # (k+1)-th largest, 0-indexed
        logsum = sum(math.log(x / xk1) for x in xs[:k])
        if logsum <= 0:
            assert src not in got
            continue
        alpha = k / logsum
        r = got[src]
        assert r["n"] == n and r["k"] == k
        assert r["x_k1"] == xk1
        assert abs(r["hill_alpha"] - alpha) < 1e-5
    assert len(got) > 0


def test_atkinson_bounds_and_python_replay(spark):
    o = load(spark, SF01, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, SF01, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rows = o.join(c, "o_custkey").collect()
    by_seg = defaultdict(list)
    for r in rows:
        by_seg[r["c_mktsegment"]].append(r["o_totalprice"])
    got = {r["seg"]: r for r in q308_atkinson_index(spark, SF01).collect()}
    assert set(got) == set(by_seg)
    for seg, xs in by_seg.items():
        n = len(xs)
        mu = sum(xs) / n
        mpow = sum(x ** (1 - _ATK_EPS) for x in xs) / n
        ede = mpow ** (1 / (1 - _ATK_EPS))
        atk = 1 - ede / mu
        r = got[seg]
        assert r["n"] == n
        assert abs(r["atkinson"] - atk) < 1e-5
        # Atkinson is 0 only under perfect equality, < 1 always
        assert 0.0 < r["atkinson"] < 1.0
        assert r["ede"] < r["mean_value"]


def test_gumbel_matches_python_moments(spark):
    ev = load(spark, SF01, "events")
    day = F.floor(
        F.col("ts").cast("timestamp_ltz").cast("long") / F.lit(86400)
    ).cast("long")
    daily = (
        ev.groupBy("event_type", day.alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .collect()
    )
    weeks = defaultdict(lambda: defaultdict(list))
    for r in daily:
        weeks[r["event_type"]][r["day"] // 7].append(r["y"])
    got = {r["event_type"]: r for r in q309_gumbel_evt(spark, SF01).collect()}
    for t, wk in weeks.items():
        mx = [max(v) for v in wk.values() if len(v) == 7]
        if len(mx) < 3:
            assert t not in got
            continue
        m = sum(mx) / len(mx)
        s = math.sqrt(
            sum((x - m) ** 2 for x in mx) / (len(mx) - 1)
        )
        sigma = s * math.sqrt(6.0) / math.pi
        mu = m - _EULER_G * sigma
        rl = mu - sigma * math.log(-math.log(1.0 - 1.0 / _GUMBEL_T))
        r = got[t]
        assert r["n_blocks"] == len(mx)
        assert abs(r["gumbel_mu"] - mu) < 1e-4
        assert abs(r["gumbel_sigma"] - sigma) < 1e-4
        assert abs(r[f"return_level_{_GUMBEL_T}wk"] - rl) < 1e-4
        # the 4-block return level exceeds the fitted location
        assert r[f"return_level_{_GUMBEL_T}wk"] > r["gumbel_mu"]
