"""Invariants for batch 36: Ljung-Box white-noise test (q355) and
Freedman-Diaconis bin sizing (q356)."""

import math

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q355_ljung_box,
    q356_fd_bins,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q355_q_nonneg_and_consistent(spark):
    rows = q355_ljung_box(spark, SF01).collect()
    assert rows
    for r in rows:
        assert r["q_stat"] >= 0.0
        assert r["n_lags"] == 7 and r["n_days"] > 8
        assert r["reject_white_noise"] == (r["q_stat"] > 14.0671)


def test_q356_matches_python(spark):
    rows = {r["metric"]: r for r in q356_fd_bins(spark, SF001).collect()}
    assert set(rows) == {"o_totalprice", "event_value"}
    o = [
        int(round(r[0] * 100))
        for r in spark.read.parquet(f"{SF001}/orders.parquet")
        .select("o_totalprice")
        .collect()
    ]
    o.sort()
    n = len(o)
    q1 = o[math.ceil(0.25 * n) - 1]
    q3 = o[math.ceil(0.75 * n) - 1]
    r = rows["o_totalprice"]
    assert r["n"] == n and r["q1_cents"] == q1 and r["q3_cents"] == q3
    width = 2.0 * (q3 - q1) / n ** (1.0 / 3.0)
    assert abs(r["fd_width_cents"] - round(width, 4)) < 1e-9
    assert r["n_bins"] == math.ceil((max(o) - min(o)) / width)
