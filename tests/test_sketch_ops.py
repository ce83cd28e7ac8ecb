"""Invariant tests for the sketch/pruning operators added in session 6:

* Misra-Gries heavy hitters (q110's kernel) in the EVICTION regime —
  the sf corpus has vocab < k so the sketch is exact there; here a
  synthetic Zipf-ish stream with far more distinct tokens than counters
  forces decrements, and the mergeable-summaries guarantee (every token
  with global count > N/k survives the per-partition merge) must still
  hold at different parallelism levels.
* Bloom-pruned semi-join (q111's kernel) — the 2-hash bit set must
  admit every true match (no false negatives) under adversarial keys,
  and the pruned+exact join must equal the plain semi-join exactly.
* kg74 topological levels on a handcrafted diamond-with-tail DAG where
  longest-path and shortest-path layering differ.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
    _MG_K,
    _bloom_hashes,
    _mg_partition,
)


def _mg_merged_candidates(spark, rows, partitions):
    df = spark.createDataFrame([(t,) for t in rows], "tok string").repartition(
        partitions
    )
    merged = (
        df.mapInPandas(_mg_partition, "tok string, mg_cnt long")
        .groupBy("tok")
        .agg(F.sum("mg_cnt").alias("mg_cnt"))
    )
    return {r["tok"] for r in merged.collect()}


def test_misra_gries_eviction_regime_guarantee(spark):
    # 500 distinct rare tokens (freq 2 each) + 8 heavy tokens — far more
    # distinct values than _MG_K counters, so eviction happens.
    stream = []
    for i in range(500):
        stream += [f"rare{i:03d}"] * 2
    heavy = {f"heavy{j}": 120 + 10 * j for j in range(8)}
    for tok, cnt in heavy.items():
        stream += [tok] * cnt
    # deterministic interleave so heavies aren't one contiguous run
    stream.sort()
    n = len(stream)
    assert len(set(stream)) > _MG_K
    threshold = n / _MG_K
    guaranteed = {t for t, c in heavy.items() if c > threshold}
    assert guaranteed  # the test must actually exercise the bound
    for partitions in (2, 8):
        cands = _mg_merged_candidates(spark, stream, partitions)
        missing = guaranteed - cands
        assert not missing, f"MG lost guaranteed heavy hitters: {missing}"


def test_bloom_prune_no_false_negatives(spark):
    # adversarial-ish keys: dense ints, sparse ints, and values whose
    # string forms collide on prefixes
    build_keys = list(range(0, 300, 3)) + [10**9 + i for i in range(50)]
    probe_keys = list(range(0, 600)) + [10**9 + i for i in range(100)]
    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    h1, h2 = _bloom_hashes(F.col("k"))
    bits = (
        build.select(F.explode(F.array(h1, h2)).alias("pos"))
        .distinct()
        .agg(F.array_sort(F.collect_set("pos")).alias("bits"))
    )
    p1, p2 = _bloom_hashes(F.col("k"))
    pruned = (
        probe.crossJoin(F.broadcast(bits))
        .filter(F.array_contains("bits", p1) & F.array_contains("bits", p2))
        .drop("bits")
    )
    got = {
        r["k"]
        for r in pruned.join(
            F.broadcast(build.withColumnRenamed("k", "bk")),
            F.col("k") == F.col("bk"),
            "left_semi",
        ).collect()
    }
    expect = set(build_keys) & set(probe_keys)
    assert got == expect  # bloom admitted every true match; exact join
    # and the bloom actually pruned something (it's not a tautology)
    assert pruned.count() < len(probe_keys)


@pytest.fixture()
def diamond_dag(spark):
    # r -> a -> c -> d ; r -> c (shortcut) ; d -> e  — longest-path
    # levels: r=0 a=1 c=2 d=3 e=4; BFS depth would put c at 1.
    edges = [("r", "a"), ("a", "c"), ("r", "c"), ("c", "d"), ("d", "e")]
    return spark.createDataFrame(edges, "subj string, obj string")


def test_topo_levels_longest_path(spark, diamond_dag):
    # replicate kg74's kernel on the handcrafted DAG
    e = diamond_dag
    roots = (
        e.select("subj")
        .distinct()
        .join(e.select(F.col("obj").alias("subj")).distinct(), "subj", "left_anti")
    )
    frontier = roots.select(
        F.col("subj").alias("node"), F.lit(0).cast("long").alias("depth")
    )
    reached = frontier
    for d in range(1, 9):
        nxt = (
            e.join(frontier, e.subj == frontier.node)
            .select(F.col("obj").alias("node"), F.lit(d).cast("long").alias("depth"))
            .distinct()
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        reached = reached.unionByName(nxt)
        frontier = nxt
    levels = {
        r["node"]: r["level"]
        for r in reached.groupBy("node").agg(F.max("depth").alias("level")).collect()
    }
    assert levels == {"r": 0, "a": 1, "c": 2, "d": 3, "e": 4}
