"""Pin the pure-Python XXH64 (functions/xxh64.py) bit-equal to Spark's
``xxhash64`` — the wide-reconstruction pivot depends on the driver-side
key constants matching the executor hash exactly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
    PRIMARY_COLUMNS,
    SUPPLEMENTARY_COLUMNS,
)
from oak_knowledge_graph_neo4j_auradb_spark.functions.xxh64 import xxhash64_str


def _spark_hashes(spark, strings: list[str]) -> list[int]:
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return [r.h for r in df.selectExpr("xxhash64(s) AS h").collect()]


def test_every_pivot_key_matches_jvm(spark):
    keys = ["_mv", *PRIMARY_COLUMNS, *SUPPLEMENTARY_COLUMNS]
    assert _spark_hashes(spark, keys) == [xxhash64_str(k) for k in keys]


def test_length_branches_match_jvm(spark):
    # every code path: empty, <4, 4-7, 8-31 (tail loop), 32+ (stripes)
    cases = ["", "a", "abc", "abcd", "abcdefg", "x" * 8, "y" * 31,
             "z" * 32, "w" * 33, "v" * 100, "unicode-éü漢字"]
    assert _spark_hashes(spark, cases) == [xxhash64_str(c) for c in cases]


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=80))
def test_property_pure_python_is_total(s):
    # totality + signed-int64 range (JVM cross-check is the tests above;
    # a per-example Spark job would be prohibitively slow under hypothesis)
    v = xxhash64_str(s)
    assert -(1 << 63) <= v < (1 << 63)


def test_random_strings_match_jvm(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_-é漢"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 64)))
        for _ in range(64)
    ]
    assert _spark_hashes(spark, cases) == [xxhash64_str(c) for c in cases]
