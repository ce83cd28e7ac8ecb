"""Incremental graph maintenance (plans/graph_store.py): a delta-fed
GraphStore converges to the full batch build's node/edge identity sets,
every update is one aligned snapshot commit across all tables (graph-
level time travel), merges rewrite only the buckets the delta touches,
and re-applying a delta is content-idempotent — the reference's
monotone MERGE semantics (pipeline/auradb_loader.py:136-310) at
delta-proportional cost."""

import pytest
from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.plans.graph_store import (
    EDGE_KEYS,
    GraphStore,
)
from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import build_graph
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import ensure_documents

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from oak_knowledge_graph_neo4j_auradb_spark.plans.graph_store import (
        join_group_key,
    )

    full = spark.read.parquet(
        ensure_documents(str(tmp_path_factory.mktemp("docs")), N_DOCS)
    )
    # deterministic ~3:1 JOIN-GROUP-ALIGNED split (the update contract:
    # all documents of a consolidation join group ship together) — the
    # delta stands in for "documents that arrived after the initial
    # batch build"
    is_delta = F.pmod(F.xxhash64(join_group_key()), F.lit(4)) == 0
    return full, full.filter(~is_delta), full.filter(is_delta)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory, corpus):
    _, base, delta = corpus
    s = GraphStore(spark, str(tmp_path_factory.mktemp("store") / "g"))
    created = s.init(base)
    assert created["version"] == 0
    upd = s.update(delta)
    return s, upd


def _edge_keyset(df):
    return {tuple(r) for r in df.select(*EDGE_KEYS).distinct().collect()}


def test_incremental_converges_to_batch(spark, corpus, store):
    """init(base) + update(delta) covers the same node ids and edge
    identities as one batch build over base ∪ delta."""
    full, _, _ = corpus
    s, _ = store
    gb_full = build_graph(spark, full)
    assert _edge_keyset(s.edges()) == _edge_keyset(gb_full.resolved)
    for label in s.labels():
        got = {r["id"] for r in s.nodes(label).select("id").collect()}
        want = {
            r["id"] for r in gb_full.nodes[label].select("id").collect()
        }
        assert got == want, label
    gb_full.unpersist()


def test_update_is_one_aligned_commit(store):
    """Every table sits at the same version after an update — one
    integer addresses a consistent cross-table graph state."""
    s, upd = store
    assert upd["version"] == 1 == s.version()
    for label in s.labels():
        assert s._table(f"nodes/{label}").current_version() == 1
    ops = [h.operation for h in s.history()]
    assert ops == ["create", "merge"]


def test_time_travel_reads_pre_update_graph(spark, corpus, store):
    """as_of=0 is the graph exactly as the base build committed it."""
    _, base, _ = corpus
    s, _ = store
    gb_base = build_graph(spark, base)
    assert _edge_keyset(s.edges(as_of=0)) == _edge_keyset(gb_base.resolved)
    # and the update really added something
    assert s.edges(as_of=0).count() < s.edges().count()
    gb_base.unpersist()


def test_merge_touches_only_delta_buckets(store):
    """A merge rewrites only the buckets the delta's keys hash into:
    the Keystage delta carries at most 4 distinct ids, so at most 4 of
    the 64 bucket dirs may be rewritten — the rest carried forward by
    file reference."""
    s, upd = store
    meta = s._meta()
    rw = upd["buckets_rewritten"]["nodes/Keystage"]
    assert 0 < rw <= 4 < meta["n_buckets"]


def test_reapplying_delta_is_content_idempotent(corpus, store):
    _, _, delta = corpus
    s, _ = store
    before = _edge_keyset(s.edges())
    n_before = {lb: s.nodes(lb).count() for lb in s.labels()}
    r = s.update(delta)
    assert r["version"] == 2
    assert _edge_keyset(s.edges()) == before
    assert {lb: s.nodes(lb).count() for lb in s.labels()} == n_before


def test_second_init_refuses(spark, store, corpus):
    _, base, _ = corpus
    s, _ = store
    with pytest.raises(FileExistsError):
        s.init(base)


def test_streaming_cdc_converges(spark, corpus, tmp_path):
    """Two micro-batch deliveries through the streaming entry point
    (init batch, then a delta drain) leave the store equal to a batch
    build over everything delivered — and a no-new-files drain changes
    nothing (exactly-once ingest + content-idempotent updates)."""
    import glob
    import os
    import shutil

    from oak_knowledge_graph_neo4j_auradb_spark.streaming.ingest import (
        stream_graph_store_updates,
    )

    full, base, delta = corpus
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)

    def land(df, name):
        staged = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staged)
        shutil.copy(
            glob.glob(f"{staged}/part-*.parquet")[0], f"{in_dir}/{name}.parquet"
        )

    store_path = str(tmp_path / "g")
    ckpt = str(tmp_path / "ckpt")

    land(base, "b0")
    stream_graph_store_updates(spark, in_dir, store_path, ckpt)
    s = GraphStore(spark, store_path)
    assert s.version() == 0  # first delivery initialized the store

    land(delta, "b1")
    stream_graph_store_updates(spark, in_dir, store_path, ckpt)
    assert s.version() == 1

    gb_full = build_graph(spark, full)
    assert _edge_keyset(s.edges()) == _edge_keyset(gb_full.resolved)
    gb_full.unpersist()

    # drain again with nothing new: checkpoint says all files processed
    stream_graph_store_updates(spark, in_dir, store_path, ckpt)
    assert s.version() == 1


def test_metrics_table(spark, store):
    """Every graph commit appends one metrics row per table — rows
    written, total live rows, live files, rewritten buckets — derived
    from manifest footer counts (the north rule's metrics table on the
    incremental path). Totals must agree with the real tables."""
    s, _ = store
    m = s.metrics()
    tables = {f"nodes/{lb}" for lb in s.labels()} | {"edges", "dangling"}
    per_version = {
        (r["graph_version"], r["table"]): r for r in m.collect()
    }
    for g in (0, 1):
        assert {t for (v, t) in per_version if v == g} == tables, g
    assert per_version[(0, "edges")]["operation"] == "create"
    assert per_version[(1, "edges")]["operation"] == "merge"
    # manifest-derived totals equal the actual table cardinalities
    assert per_version[(1, "edges")]["rows_total"] == s.edges().count()
    lb = s.labels()[0]
    assert (
        per_version[(1, f"nodes/{lb}")]["rows_total"]
        == s.nodes(lb).count()
    )
    # version 0 creates write everything as "new"
    assert (
        per_version[(0, "edges")]["rows_written"]
        == per_version[(0, "edges")]["rows_total"]
    )


def test_graph_compact_stays_aligned(spark, store):
    """Graph-level compact advances EVERY table by exactly one version
    (rewrite or by-reference no-op), leaves every read identical, and
    records a metrics row per table."""
    s, _ = store
    v = s.version()
    before_edges = _edge_keyset(s.edges())
    before_files = {
        lb: s._table(f"nodes/{lb}").snapshot().n_files for lb in s.labels()
    }
    r = s.compact(min_files_per_bucket=2)
    assert r["version"] == v + 1 == s.version()
    for lb in s.labels():
        t = s._table(f"nodes/{lb}")
        assert t.current_version() == v + 1, lb  # aligned
        assert t.snapshot().n_files <= before_files[lb], lb
    assert _edge_keyset(s.edges()) == before_edges
    # time travel across the maintenance commit still consistent
    assert _edge_keyset(s.edges(as_of=v)) == before_edges
    ops = {
        r["table"]: r["operation"]
        for r in s.metrics().filter(F.col("graph_version") == v + 1).collect()
    }
    assert set(ops) == {f"nodes/{lb}" for lb in s.labels()} | {
        "edges",
        "dangling",
    }
    assert set(ops.values()) <= {"compact", "compact-noop"}


def test_align_delta_repairs_doc_level_feed(spark, corpus, tmp_path):
    """A doc-id-hash split VIOLATES the join-group contract (primary
    and supplementary halves of a unit can land on opposite sides).
    align_delta expands the delta to its join-group closure; the store
    then converges to the batch build even from the unaligned feed."""
    from oak_knowledge_graph_neo4j_auradb_spark.plans.graph_store import (
        align_delta,
        join_group_key,
    )

    full, _, _ = corpus
    # doc-level split — the contract-violating feed shape
    is_delta = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4)) == 0
    base_raw, delta_raw = full.filter(~is_delta), full.filter(is_delta)
    # the raw split genuinely splits at least one join group (else this
    # test proves nothing)
    k = join_group_key().alias("k")
    straddling = (
        base_raw.select(k).join(delta_raw.select(k), "k", "leftsemi")
        .distinct().count()
    )
    assert straddling > 0, "split never straddles a group — regen corpus"

    s = GraphStore(spark, str(tmp_path / "g"))
    s.init(align_delta(base_raw, full))
    s.update(align_delta(delta_raw, full))

    gb_full = build_graph(spark, full)
    assert _edge_keyset(s.edges()) == _edge_keyset(gb_full.resolved)
    for label in s.labels():
        got = {r["id"] for r in s.nodes(label).select("id").collect()}
        want = {r["id"] for r in gb_full.nodes[label].select("id").collect()}
        assert got == want, label
    gb_full.unpersist()


def test_expire_bounds_storage_keeps_metrics(spark, store):
    """After maintenance, expire(keep_last=2) drops old manifests and
    unreferenced files but current reads are unchanged and the
    append-only metrics audit trail keeps every version's rows."""
    s, _ = store
    v = s.version()  # ≥ 3 by now (update, re-update, compact ran)
    assert v >= 2
    before = _edge_keyset(s.edges())
    r = s.expire(keep_last=2)
    assert r["manifests_removed"] > 0
    assert _edge_keyset(s.edges()) == before
    assert _edge_keyset(s.edges(as_of=v)) == before
    # metrics survive expiry for EVERY version ever committed
    versions = {
        row["graph_version"] for row in s.metrics().select("graph_version").collect()
    }
    assert versions == set(range(v + 1))
