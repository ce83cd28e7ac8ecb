"""Invariant for q336: VARIANT-path extraction agrees with a plain
json.loads replay, and the plan parses once (single projection)."""

import json
from collections import defaultdict

from oak_knowledge_graph_neo4j_auradb_spark.queries.relational import (
    q336_variant_props,
)

SF001 = "/root/testdata/sf0.001"


def test_q336_matches_python(spark):
    rows = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_type", "props"
    ).collect()
    by = defaultdict(list)
    for r in rows:
        by[r["event_type"]].append(int(json.loads(r["props"])["k"]))
    got = {r["event_type"]: r for r in
           q336_variant_props(spark, SF001).collect()}
    assert set(got) == set(by)
    for et, ks in by.items():
        r = got[et]
        assert r["n"] == len(ks)
        assert r["n_distinct_k"] == len(set(ks))
        assert abs(r["avg_k"] - round(sum(ks) / len(ks), 6)) < 1e-9
        assert r["n_top_band"] == sum(1 for k in ks if k >= 90)


def test_q336_uses_variant_expressions(spark):
    plan = q336_variant_props(spark, SF001)._jdf.queryExecution().analyzed().toString()
    # the plan must go through the VARIANT encoding, not string re-parse
    assert "parse_json" in plan or "variant" in plan.lower()
