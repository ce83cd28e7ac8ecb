"""Structured-Streaming ingest: exactly-once incremental processing with
checkpoint resume (streaming/ingest.py; SURVEY.md §2.9)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
    make_universe,
    universe_to_arrow,
)
from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
    stream_entity_links,
    stream_graph_updates,
    stream_mentions,
    windowed_event_counts,
)


def _write_docs(path: str, n: int, seed: int) -> None:
    pq.write_table(universe_to_arrow(make_universe(n, seed=seed)), path)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "docs_in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def test_incremental_mentions_exactly_once(spark, dirs):
    _write_docs(f"{dirs['in']}/part1.parquet", 100, seed=42)
    stream_mentions(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 > 0

    # second drain with no new files: nothing reprocessed
    stream_mentions(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert spark.read.parquet(dirs["out"]).count() == n1

    # new file lands → only the delta is appended
    _write_docs(f"{dirs['in']}/part2.parquet", 60, seed=7)
    stream_mentions(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    n2 = spark.read.parquet(dirs["out"]).count()
    assert n2 > n1

    # batch equivalence: streaming total == batch extraction over all files
    from oak_knowledge_graph_neo4j_auradb_spark.operators.linking import (
        extract_mentions,
    )

    batch = extract_mentions(spark.read.parquet(dirs["in"])).count()
    assert n2 == batch


def test_stream_entity_links_matches_batch(spark, dirs):
    from oak_knowledge_graph_neo4j_auradb_spark.operators.linking import (
        extract_mentions,
        link_candidates,
    )

    _write_docs(f"{dirs['in']}/part1.parquet", 80, seed=42)
    dictionary = (
        extract_mentions(spark.read.parquet(dirs["in"]))
        .select("label", F.col("mention").alias("nid"))
        .distinct()
    )

    stream_entity_links(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], dictionary, top_k=2
    )
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 > 0

    # re-drain with no new files: exactly-once, nothing appended
    stream_entity_links(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], dictionary, top_k=2
    )
    assert spark.read.parquet(dirs["out"]).count() == n1

    # new file lands → only the delta; streamed rows == batch linking
    _write_docs(f"{dirs['in']}/part2.parquet", 50, seed=7)
    stream_entity_links(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], dictionary, top_k=2
    )
    streamed = {
        tuple(r)
        for r in spark.read.parquet(dirs["out"])
        .select("doc_id", "label", "mention", "nid", "dist", "rank")
        .collect()
    }
    m = (
        extract_mentions(spark.read.parquet(dirs["in"]))
        .select("doc_id", "label", "mention")
        .distinct()
    )
    batch = {
        tuple(r)
        for r in link_candidates(m, dictionary, top_k=2)
        .select("doc_id", "label", "mention", "nid", "dist", "rank")
        .collect()
    }
    assert streamed == batch


def test_stream_graph_updates_foreachbatch(spark, dirs):
    _write_docs(f"{dirs['in']}/part1.parquet", 120, seed=42)
    stream_graph_updates(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    t = spark.read.parquet(f"{dirs['out']}/triples")
    assert t.count() > 0
    assert "batch_id" in t.columns
    preds = {r["pred"] for r in t.select("pred").distinct().collect()}
    assert "HAS_LESSON" in preds


def test_windowed_event_counts(spark, tmp_path, sf_dir):
    # stage the events table as a "stream" directory
    ev_dir = str(tmp_path / "events_in")
    os.makedirs(ev_dir)
    shutil.copy(f"{sf_dir}/events.parquet", f"{ev_dir}/events.parquet")
    agg = windowed_event_counts(spark, ev_dir, window="6 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("evcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT sum(n_events) AS n FROM evcounts"
    ).first()["n"]
    want = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got == want


def test_stateful_first_seen_dedup(spark, dirs):
    from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
        stream_first_seen_nodes,
    )

    _write_docs(f"{dirs['in']}/part1.parquet", 120, seed=42)
    stream_first_seen_nodes(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    rows1 = spark.read.parquet(dirs["out"]).collect()
    ids1 = [r["id"] for r in rows1]
    assert len(ids1) == len(set(ids1)) > 0

    # overlapping delivery: the same universe prefix plus new docs —
    # state (restored from the checkpoint) suppresses every already-seen
    # ID across micro-batches AND across restarted runs
    _write_docs(f"{dirs['in']}/part2.parquet", 200, seed=42)
    stream_first_seen_nodes(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    rows2 = spark.read.parquet(dirs["out"]).collect()
    ids2 = [r["id"] for r in rows2]
    assert len(ids2) == len(set(ids2))
    assert set(ids1) <= set(ids2)

    # first-seen winner is the minimal extraction-order key per ID
    by_id = {}
    for r in rows2:
        assert r["id"] not in by_id
        by_id[r["id"]] = r["row_seq"]


def test_stateful_dedup_with_ttl_exact_within_horizon(spark, dirs):
    """With an event-time state TTL configured, dedup and restart
    recovery stay exact inside the TTL horizon — the bounded-state
    posture for unbounded ID spaces."""
    from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
        stream_first_seen_nodes,
    )

    wide_ttl = 1_000_000  # far beyond the corpus: no eviction fires
    _write_docs(f"{dirs['in']}/part1.parquet", 100, seed=7)
    stream_first_seen_nodes(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], state_ttl_rows=wide_ttl
    )
    ids1 = {r["id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert ids1

    # restart with overlapping redelivery: state restored from the
    # checkpoint still suppresses all previously-emitted IDs
    _write_docs(f"{dirs['in']}/part2.parquet", 160, seed=7)
    stream_first_seen_nodes(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], state_ttl_rows=wide_ttl
    )
    rows2 = spark.read.parquet(dirs["out"]).collect()
    ids2 = [r["id"] for r in rows2]
    assert len(ids2) == len(set(ids2))
    assert ids1 <= set(ids2)


def test_stateful_dedup_ttl_evicts_idle_state(spark, tmp_path):
    """IDs idle past the TTL (in extraction-sequence units) are evicted
    from the state store — observable as the store shrinking below the
    cumulative distinct-ID count after a far-future batch."""
    import pyarrow.parquet as pq

    from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
        make_universe,
        universe_to_arrow,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
        stream_first_seen_nodes,
    )

    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    uni = universe_to_arrow(make_universe(300, seed=11))
    # lesson_slug is ~unique per doc, so state size tracks doc count
    pq.write_table(uni.slice(0, 100), f"{d['in']}/part1.parquet")
    q1 = stream_first_seen_nodes(
        spark, d["in"], d["out"], d["ckpt"], id_col="lesson_slug",
        state_ttl_rows=50,
    )
    n_state_1 = q1.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert n_state_1 > 0

    # rows 250-299: the watermark jumps ~200 sequence units — every
    # part1 entry (armed for ≤ 99+50) is now past its timeout
    pq.write_table(uni.slice(250, 50), f"{d['in']}/part2.parquet")
    q2 = stream_first_seen_nodes(
        spark, d["in"], d["out"], d["ckpt"], id_col="lesson_slug",
        state_ttl_rows=50,
    )
    n_state_2 = q2.lastProgress["stateOperators"][0]["numRowsTotal"]
    n_out = spark.read.parquet(d["out"]).count()
    # output kept every first-seen row, state kept only the live window
    assert n_state_2 < n_out
    assert n_state_2 < n_state_1


def test_stream_merge_nodes_upserts(spark, dirs, tmp_path):
    """foreachBatch + merge_into: re-delivered entities update in place
    across micro-batches and restarted runs — never duplicate."""
    from oak_knowledge_graph_neo4j_auradb_spark.plans.sinks import read_merged
    from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
        stream_merge_nodes,
    )

    tbl = str(tmp_path / "unit_nodes")
    _write_docs(f"{dirs['in']}/part1.parquet", 120, seed=42)
    stream_merge_nodes(spark, dirs["in"], tbl, dirs["ckpt"])
    t1 = read_merged(spark, tbl)
    n1 = t1.count()
    assert n1 == t1.select("id").distinct().count() > 0

    # overlapping redelivery (same universe prefix + new docs): merged
    # table stays unique per id and only grows by the genuinely-new ids
    _write_docs(f"{dirs['in']}/part2.parquet", 200, seed=42)
    stream_merge_nodes(spark, dirs["in"], tbl, dirs["ckpt"])
    t2 = read_merged(spark, tbl)
    n2 = t2.count()
    assert n2 == t2.select("id").distinct().count() >= n1


def test_stream_entity_links_merged_storage_idempotent(spark, dirs, tmp_path):
    """The link-table sink must be exactly-once-on-content even when the
    offset log is LOST: replaying an already-delivered batch MERGEs
    identical values into matched keys instead of double-appending."""
    import shutil

    from oak_knowledge_graph_neo4j_auradb_spark.operators.linking import (
        extract_mentions,
        link_candidates,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.plans.snapshots import (
        SnapshotTable,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
        stream_entity_links_merged,
    )

    table = str(tmp_path / "links")
    _write_docs(f"{dirs['in']}/part1.parquet", 80, seed=42)
    dictionary = (
        extract_mentions(spark.read.parquet(dirs["in"]))
        .select("label", F.col("mention").alias("nid"))
        .distinct()
    )

    def rows():
        return {
            tuple(r)
            for r in SnapshotTable(spark, table)
            .read()
            .select("doc_id", "label", "mention", "nid", "dist", "rank")
            .collect()
        }

    stream_entity_links_merged(
        spark, dirs["in"], table, dirs["ckpt"], dictionary, top_k=2
    )
    first = rows()
    assert first
    v0 = SnapshotTable(spark, table).current_version()

    # lose the offset log entirely → the drain re-delivers part1; the
    # keyed MERGE must leave the row set bit-identical
    shutil.rmtree(dirs["ckpt"])
    stream_entity_links_merged(
        spark, dirs["in"], table, dirs["ckpt"], dictionary, top_k=2
    )
    assert rows() == first
    assert SnapshotTable(spark, table).current_version() == v0 + 1

    # new file → only the delta inserts; table equals batch linking
    _write_docs(f"{dirs['in']}/part2.parquet", 50, seed=7)
    stream_entity_links_merged(
        spark, dirs["in"], table, dirs["ckpt"], dictionary, top_k=2
    )
    m = (
        extract_mentions(spark.read.parquet(dirs["in"]))
        .select("doc_id", "label", "mention")
        .distinct()
    )
    batch = {
        tuple(r)
        for r in link_candidates(m, dictionary, top_k=2)
        .select("doc_id", "label", "mention", "nid", "dist", "rank")
        .collect()
    }
    assert rows() == batch


def test_stream_session_windows_invariants(spark, sf_dir):
    """q233 sessions per user are disjoint, ordered with >= gap between
    them, and internally dense (every in-session gap < 30 min).
    Cross-checked against batch session_window on the same input —
    streaming complete-mode drain must equal the batch operator."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.streamq import (
        q233_stream_session_windows,
    )

    got = sorted(
        (
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in q233_stream_session_windows(spark, sf_dir).collect()
        )
    )
    assert got
    by_user = {}
    for u, s, e, n in got:
        assert e - s >= 1800 and n >= 1
        by_user.setdefault(u, []).append((s, e))
    for u, spans in by_user.items():
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 >= e1, (u, (s1, e1), (s2, e2))
    batch = sorted(
        (
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("user_id") < 50)
            .withColumn("ts", F.date_trunc("second", F.col("ts")))
            .groupBy(
                F.session_window("ts", "30 minutes").alias("sw"), "user_id"
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id",
                F.col("sw.start").cast("long").alias("session_start"),
                F.col("sw.end").cast("long").alias("session_end"),
                "n_events",
            )
            .collect()
        )
    )
    assert got == batch
