"""CDC soak (VERDICT r3 item 8): a sustained streaming run into the
incrementally-maintained GraphStore — ≥50 micro-batch deliveries with a
checkpoint-loss fault and maintenance compactions injected mid-run —
must stay exactly-once ON CONTENT throughout: after every fault the
store's node/edge identity sets equal a batch build over everything
delivered so far, and a no-new-data drain never advances the version.

The unit tests in test_graph_store.py cover each fault in isolation;
this soak covers the compounding case (fault → more deliveries → second
fault → compaction → more deliveries) that a long-lived production CDC
feed actually experiences.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.plans.graph_store import (
    EDGE_KEYS,
    GraphStore,
    join_group_key,
)
from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import build_graph
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import ensure_documents
from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
    stream_graph_store_updates,
)

N_DOCS = 400
N_SEGMENTS = 50
#: convergence (full batch-build compare) is asserted at these points —
#: after each fault, periodically in between, and at the end
CONVERGE_AT = {0, 9, 17, 18, 29, 33, 39, 49}
CKPT_LOSS_AFTER = 17  # delete the checkpoint dir after this segment
COMPACT_AFTER = {25, 33}  # run maintenance compactions mid-stream


def _edge_keyset(df):
    return {tuple(r) for r in df.select(*EDGE_KEYS).distinct().collect()}


@pytest.mark.slow
def test_cdc_soak_survives_compounding_faults(spark, tmp_path):
    docs = spark.read.parquet(ensure_documents(str(tmp_path / "d"), N_DOCS))
    seg = F.pmod(F.xxhash64(join_group_key()), F.lit(N_SEGMENTS))
    docs = docs.withColumn("_seg", seg).persist()

    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    store_path = str(tmp_path / "g")
    ckpt = str(tmp_path / "ckpt")
    store = GraphStore(spark, store_path)

    def land(i: int) -> None:
        staged = str(tmp_path / f"stage_{i}")
        docs.filter(F.col("_seg") == i).drop("_seg").coalesce(1).write.parquet(
            staged
        )
        shutil.copy(
            glob.glob(f"{staged}/part-*.parquet")[0], f"{in_dir}/b{i:03d}.parquet"
        )

    def assert_converged(upto: int) -> None:
        gb = build_graph(
            spark, docs.filter(F.col("_seg") <= upto).drop("_seg")
        )
        assert _edge_keyset(store.edges()) == _edge_keyset(gb.resolved), upto
        for label in gb.nodes:
            got = {r["id"] for r in store.nodes(label).select("id").collect()}
            want = {r["id"] for r in gb.nodes[label].select("id").collect()}
            assert got == want, (upto, label)
        gb.unpersist()

    # ~40% of the join-group-aligned segments are empty at this corpus
    # size — an empty delivery must NOT commit (content-based delivery:
    # a micro-batch with nothing in it is a no-op, not a version bump)
    nonempty = {
        r["_seg"] for r in docs.select("_seg").distinct().collect()
    }
    delivered_versions = []
    n_content_commits = 0
    for i in range(N_SEGMENTS):
        land(i)
        v_pre = store.version() if store.exists() else -1
        stream_graph_store_updates(spark, in_dir, store_path, ckpt)
        if i in nonempty:
            assert store.version() == v_pre + 1, (i, "content must commit")
            n_content_commits += 1
        else:
            assert store.version() == v_pre, (i, "empty delivery committed")
        delivered_versions.append(store.version())

        if i == CKPT_LOSS_AFTER:
            # fault: lose the streaming checkpoint entirely; the next
            # drain re-reads EVERY landed file. Content idempotence must
            # absorb the total replay.
            v_before = store.version()
            content_before = _edge_keyset(store.edges())
            shutil.rmtree(ckpt)
            stream_graph_store_updates(spark, in_dir, store_path, ckpt)
            assert _edge_keyset(store.edges()) == content_before
            assert store.version() > v_before  # replay commits, content-equal
            assert_converged(i)

        if i in COMPACT_AFTER:
            # maintenance during the live feed: compaction is its own
            # aligned commit and must not change any read
            before = _edge_keyset(store.edges())
            store.compact(min_files_per_bucket=2)
            assert _edge_keyset(store.edges()) == before

        if i in CONVERGE_AT:
            assert_converged(i)

    # ≥50 deliveries happened; versions advanced monotonically, once
    # per non-empty delivery (plus fault-replay and compaction commits)
    assert len(delivered_versions) == N_SEGMENTS
    assert delivered_versions == sorted(delivered_versions)
    assert n_content_commits == len(nonempty) >= 25

    # steady state: a drain with nothing new is a true no-op (exactly-
    # once delivery), even after faults and compactions
    v_final = store.version()
    stream_graph_store_updates(spark, in_dir, store_path, ckpt)
    assert store.version() == v_final
    assert_converged(N_SEGMENTS - 1)

    # the metrics table recorded one row per table for every commit
    m = store.metrics()
    per_version = (
        m.groupBy("graph_version").count().orderBy("graph_version").collect()
    )
    n_tables = len(store.labels()) + 2  # + edges + dangling
    assert all(r["count"] == n_tables for r in per_version)
    assert len(per_version) == v_final + 1
    docs.unpersist()
