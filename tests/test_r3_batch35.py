"""Invariants for batch 35: vocab coverage curve (q352), watermark
lateness audit (q353), SQL pipe-syntax parity (q354)."""

from collections import Counter

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    q353_lateness_audit,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.relational import (
    q354_pipe_syntax,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.textops import (
    q352_vocab_coverage,
)

SF001 = "/root/testdata/sf0.001"


def test_q352_matches_python_and_monotone(spark):
    import re

    rows = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "text"
    ).collect()
    cnt = Counter(
        t for r in rows for t in re.findall(r"[a-z0-9]+", r["text"].lower())
    )
    total = sum(cnt.values())
    ordered = sorted(cnt.values(), reverse=True)
    got = {r["k"]: r for r in q352_vocab_coverage(spark, SF001).collect()}
    assert set(got) == {1, 10, 100, 1000, 10000}
    prev = 0.0
    for k in (1, 10, 100, 1000, 10000):
        r = got[k]
        want_mass = sum(ordered[:k])
        assert r["covered_tokens"] == want_mass
        assert r["types_used"] == min(k, len(ordered))
        assert abs(r["coverage"] - round(want_mass / total, 6)) < 1e-9
        assert r["coverage"] >= prev
        prev = r["coverage"]


def test_q353_lateness_matches_python(spark):
    evs = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts"
    ).collect()
    evs.sort(key=lambda r: r["event_id"])
    hwm = {}
    late = Counter()
    n = Counter()
    for r in evs:
        es = int(r["ts"].timestamp())
        lag = max(hwm.get(r["user_id"], es) - es, 0)
        n[r["event_type"]] += 1
        if lag > 600:
            late[r["event_type"]] += 1
        hwm[r["user_id"]] = max(hwm.get(r["user_id"], es), es)
    got = {r["event_type"]: r for r in
           q353_lateness_audit(spark, SF001).collect()}
    assert set(got) == set(n)
    for t in n:
        assert got[t]["n_events"] == n[t]
        assert abs(
            got[t]["late_frac_600s"] - round(late[t] / n[t], 6)
        ) < 1e-9


def test_q354_pipe_equals_classic(spark):
    rows = q354_pipe_syntax(spark, SF001).collect()
    assert rows and len(rows) == len({r["o_orderpriority"] for r in rows})
    # classic-form re-derivation inside Spark must agree exactly
    spark.read.parquet(f"{SF001}/orders.parquet").createOrReplaceTempView(
        "t354"
    )
    classic = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents,
               DATE_FORMAT(MIN(o_orderdate), 'yyyy-MM-dd') AS first_order
        FROM t354 WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in classic]
