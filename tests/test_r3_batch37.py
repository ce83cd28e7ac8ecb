"""Invariants for batch 37: binary-segmentation changepoint (q357)
and per-label isolation audit (kg117)."""

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q357_binseg_changepoint,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import (
    kg117_label_isolation,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q357_split_reduces_sse(spark):
    rows = q357_binseg_changepoint(spark, SF01).collect()
    assert rows
    for r in rows:
        # any split's within-SS can never exceed the total SS
        assert -1e-6 <= r["sse_reduction"] <= r["sse_total"] + 1e-6
        assert r["n_days"] >= 2


def test_q357_matches_python(spark):
    from collections import Counter

    evs = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_type", "ts"
    ).collect()
    series = {}
    for r in evs:
        d = int(r["ts"].timestamp()) // 86400
        series.setdefault(r["event_type"], Counter())[d] += 1
    got = {r["event_type"]: r for r in
           q357_binseg_changepoint(spark, SF001).collect()}
    for t, cnt in series.items():
        ds = sorted(cnt)
        ys = [cnt[d] for d in ds]
        n, s, q = len(ys), sum(ys), sum(y * y for y in ys)
        sst = q - s * s / n
        best = None
        for i in range(1, n):
            ci = sum(ys[:i])
            qi = sum(y * y for y in ys[:i])
            ssl = qi - ci * ci / i
            ssr = (q - qi) - (s - ci) * (s - ci) / (n - i)
            red = round(sst - ssl - ssr, 4)
            if best is None or red > best[0]:
                best = (red, ds[i - 1])
        r = got[t]
        assert r["split_day"] == best[1]
        assert abs(r["sse_reduction"] - best[0]) < 1e-6


def test_kg117_schemaversion_isolated_lessons_connected(spark):
    rows = {r["label"]: r for r in
            kg117_label_isolation(spark, SF001).collect()}
    assert len(rows) == 13
    assert rows["Schemaversion"]["isolation_rate"] == 1.0
    # HAS_LESSON resolution keeps the overwhelming majority connected
    assert rows["Lesson"]["isolation_rate"] <= 0.2
    for r in rows.values():
        assert 0 <= r["n_isolated"] <= r["n_nodes"]
