"""Invariants for q304–q306: t-closeness against a Python EMD replay,
STL strengths bounded and consistent with a Python decomposition, and
the dedup yield curve's nested-subsample monotonicity."""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    _TC_BIN_W,
    _TC_BINS,
    q304_t_closeness,
    q305_stl_strength,
    q306_dedup_yield_curve,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

SF01 = "/root/testdata/sf0.01"


def test_t_closeness_matches_python_emd(spark):
    docs = load(spark, SF01, "documents").select(
        "lang", "source", "n_chars"
    ).collect()
    bins = [
        (r["lang"], r["source"], min(_TC_BINS - 1, r["n_chars"] // _TC_BIN_W))
        for r in docs
    ]
    global_h = Counter(b for _, _, b in bins)
    grid = sorted(global_h)
    n = len(bins)
    m = len(grid)
    groups = defaultdict(Counter)
    for lang, src, b in bins:
        groups[(lang, src)][b] += 1
    got = {
        (r["lang"], r["source"]): r
        for r in q304_t_closeness(spark, SF01).collect()
    }
    assert set(got) == set(groups)
    for key, h in groups.items():
        gn = sum(h.values())
        cum = 0.0
        emd = 0.0
        for b in grid[:-1]:
            cum += h.get(b, 0) / gn - global_h[b] / n
            emd += abs(cum)
        emd /= m - 1
        r = got[key]
        assert r["n"] == gn
        assert abs(r["t_closeness"] - emd) < 1e-5
        assert r["breach"] == (r["t_closeness"] > 0.3)
        assert 0.0 <= r["t_closeness"] <= 1.0


def test_stl_strength_matches_python(spark):
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
    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append((r["day"], r["y"]))
    got = {r["event_type"]: r for r in q305_stl_strength(spark, SF01).collect()}
    for t, pts in series.items():
        ys = [y for _, y in pts]
        days = [d for d, _ in pts]
        det = []
        for i in range(3, len(ys) - 3):
            trend = sum(ys[i - 3 : i + 4]) / 7.0
            det.append((days[i], ys[i], ys[i] - trend))
        wd_means = defaultdict(list)
        for d, _, dt in det:
            wd_means[(d + 4) % 7].append(dt)
        s = {wd: sum(v) / len(v) for wd, v in wd_means.items()}
        rem = [dt - s[(d + 4) % 7] for d, _, dt in det]
        ds = [y - s[(d + 4) % 7] for d, y, _ in det]
        dts = [dt for _, _, dt in det]

        def var(v):
            mu = sum(v) / len(v)
            return sum((x - mu) ** 2 for x in v) / (len(v) - 1)

        ft = max(0.0, 1.0 - var(rem) / var(ds))
        fs = max(0.0, 1.0 - var(rem) / var(dts))
        r = got[t]
        assert r["n_days"] == len(det)
        assert abs(r["trend_strength"] - ft) < 1e-4
        assert abs(r["seasonal_strength"] - fs) < 1e-4
        assert 0.0 <= r["trend_strength"] <= 1.0
        assert 0.0 <= r["seasonal_strength"] <= 1.0


def test_dedup_yield_curve_nested_monotone(spark):
    rows = sorted(
        q306_dedup_yield_curve(spark, SF01).collect(),
        key=lambda r: r["frac"],
    )
    assert [r["frac"] for r in rows] == [25, 50, 75, 100]
    total = load(spark, SF01, "documents").count()
    assert rows[-1]["n_docs"] == total
    for a, b in zip(rows, rows[1:]):
        # nested buckets: docs, distincts, and dups all grow
        assert a["n_docs"] <= b["n_docs"]
        assert a["n_distinct"] <= b["n_distinct"]
        assert a["n_dups"] <= b["n_dups"]
    for r in rows:
        assert r["n_dups"] == r["n_docs"] - r["n_distinct"]
        assert 0.0 <= r["dup_rate"] < 1.0
