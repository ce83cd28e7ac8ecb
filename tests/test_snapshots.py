"""Snapshot-table semantics: atomic commits, copy-on-write merge,
time travel, rollback, expiry (plans/snapshots.py; reference MERGE
semantics at pipeline/auradb_loader.py:136-222)."""

import json
import os

import pytest

from oak_knowledge_graph_neo4j_auradb_spark.plans.snapshots import (
    CommitConflict,
    SnapshotTable,
)


def _rows(df):
    return {
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, None), ("c", 3, "z")],
        "id string, n int, s string",
    )
    t.create(df, keys="id", n_buckets=8)
    return t


def test_create_and_read(table):
    assert table.current_version() == 0
    assert _rows(table.read()) == {("a", 1, "x"), ("b", 2, None), ("c", 3, "z")}


def test_merge_updates_not_duplicates(table, spark):
    upd = spark.createDataFrame(
        [("b", 20, "y"), ("d", 4, "w")], "id string, n int, s string"
    )
    snap = table.merge(upd)
    assert snap.operation == "merge"
    got = _rows(table.read())
    assert got == {
        ("a", 1, "x"), ("b", 20, "y"), ("c", 3, "z"), ("d", 4, "w")
    }
    # re-running the same merge is content-idempotent
    table.merge(upd)
    assert _rows(table.read()) == got


def test_merge_null_preserves_existing(table, spark):
    upd = spark.createDataFrame([("a", 10, None)], "id string, n int, s string")
    table.merge(upd)
    assert ("a", 10, "x") in _rows(table.read())


def test_merge_is_copy_on_write(table, spark):
    """Untouched buckets' files carry forward by reference — the new
    manifest must reuse (not rewrite) their physical directories."""
    before = {e["path"]: e["bucket"] for e in table.snapshot().files}
    upd = spark.createDataFrame([("a", 10, "q")], "id string, n int, s string")
    snap = table.merge(upd)
    after = {e["path"]: e["bucket"] for e in snap.files}
    carried = set(before) & set(after)
    assert carried, "expected untouched bucket dirs to be reused"
    new = set(after) - set(before)
    assert new and all(p.startswith(os.path.join("data", "s1")) for p in new)


def test_time_travel_and_rollback(table, spark):
    upd = spark.createDataFrame([("a", 99, "x")], "id string, n int, s string")
    table.merge(upd)
    assert ("a", 99, "x") in _rows(table.read())
    assert ("a", 1, "x") in _rows(table.read(as_of=0))
    rb = table.rollback(0)
    assert rb.version == 2 and rb.operation == "rollback:0"
    assert _rows(table.read()) == _rows(table.read(as_of=0))
    # history intact: v1 still readable after rollback
    assert ("a", 99, "x") in _rows(table.read(as_of=1))


def test_append_then_read(table, spark):
    table.append(
        spark.createDataFrame([("e", 5, "v")], "id string, n int, s string")
    )
    assert ("e", 5, "v") in _rows(table.read())
    assert table.read().count() == 4


def test_key_pruned_read(table):
    pruned = table.read(key_values=["a"])
    assert ("a", 1, "x") in _rows(pruned)
    n_files_full = len(table.snapshot().files)
    # the pruned plan scans fewer bucket dirs than the full table
    assert len(pruned.inputFiles()) < n_files_full or n_files_full == 1


def test_commit_conflict(table, spark):
    """A second writer that planned against a stale HEAD must fail."""
    stale = table.snapshot()
    upd = spark.createDataFrame([("a", 7, "x")], "id string, n int, s string")
    table.merge(upd)
    with pytest.raises(CommitConflict):
        table._commit(
            stale.version, "merge", stale.files, stale.keys, stale.n_buckets
        )


def test_torn_writer_leaves_head_untouched(table, spark, tmp_path):
    """Staged-but-unpublished files must be invisible to readers."""
    before = _rows(table.read())
    upd = spark.createDataFrame([("z", 9, "t")], "id string, n int, s string")
    # simulate a writer dying after staging, before commit
    table._stage(upd, ["id"], 8, table.current_version() + 1, 1_000_000)
    assert table.current_version() == 0
    assert _rows(table.read()) == before
    # and a retry of the real operation reclaims the garbage dir
    table.merge(upd)
    assert ("z", 9, "t") in _rows(table.read())


def test_merge_pins_nondeterministic_updates(table, spark):
    """A nondeterministic update source (limit without order) must not
    duplicate keys: the touched-bucket collect and the merge join must
    see the same rows (regression — caught live with limit(10))."""
    base = spark.range(0, 200).selectExpr(
        "concat('k', id) AS id", "cast(id as int) AS n",
        "cast(null as string) AS s",
    )
    table.overwrite(base)
    n0 = table.read().count()
    upd = base.limit(50)  # nondeterministic row pick
    table.merge(upd)
    assert table.read().count() == n0
    ids = [r["id"] for r in table.read().select("id").collect()]
    assert len(ids) == len(set(ids)), "duplicate keys after merge"


def test_expire_keeps_current_readable(table, spark):
    for n in (10, 20, 30):
        table.merge(
            spark.createDataFrame(
                [("a", n, "x")], "id string, n int, s string"
            )
        )
    assert table.current_version() == 3
    report = table.expire(keep_last=2)
    assert report["manifests_removed"] == 2
    got = _rows(table.read())
    assert ("a", 30, "x") in got and len(got) == 3
    with pytest.raises(FileNotFoundError):
        table.snapshot(0)
    # expired stage dirs physically gone, retained ones present
    live = {e["path"].split(os.sep)[1] for e in table.snapshot().files}
    on_disk = set(os.listdir(os.path.join(table.path, "data")))
    assert live <= on_disk


def test_manifest_shape(table):
    """The manifest is plain JSON — the audit surface a catalog needs."""
    with open(os.path.join(table.path, "_snapshots", "v0.json")) as f:
        m = json.load(f)
    assert m["operation"] == "create" and m["keys"] == ["id"]
    assert all({"path", "bucket"} <= set(e) for e in m["files"])


def test_compact_rewrites_fragmented_buckets(table, spark):
    """Appends fragment a bucket across stage dirs; compact() must fold
    each fragmented bucket back to one file entry, leave content
    bit-identical, and commit as its own snapshot so history/expire
    semantics hold."""
    from collections import Counter

    table.append(
        spark.createDataFrame([("a2", 4, "y")], "id string, n int, s string")
    )
    table.append(
        spark.createDataFrame([("a3", 5, None)], "id string, n int, s string")
    )
    before = _rows(table.read())
    per = Counter(e["bucket"] for e in table.snapshot().files)
    assert max(per.values()) >= 2  # fragmentation exists
    v = table.current_version()

    snap = table.compact()
    assert snap.operation == "compact"
    assert table.current_version() == v + 1
    after_per = Counter(e["bucket"] for e in table.snapshot().files)
    assert max(after_per.values()) == 1
    assert _rows(table.read()) == before
    # time travel still reads the pre-compact state
    assert _rows(table.read(as_of=v)) == before
    # idempotent: nothing fragmented → no new commit
    assert table.compact().version == snap.version


def test_manifest_rows_and_noop(table, spark):
    """Manifests carry per-entry footer row counts (Iceberg record
    counts), n_rows sums them across carried + staged entries, and
    noop() commits an identical by-reference snapshot."""
    assert table.snapshot().n_rows == 3
    assert all(e["rows"] >= 1 for e in table.snapshot().files)
    table.merge(
        spark.createDataFrame([("d", 4, "w")], "id string, n int, s string")
    )
    snap = table.snapshot()
    assert snap.n_rows == 4  # carried entries kept their counts

    v = table.current_version()
    nsnap = table.noop("compact-noop")
    assert nsnap.version == v + 1 and nsnap.operation == "compact-noop"
    assert nsnap.files == snap.files  # by reference, nothing staged
    assert _rows(table.read()) == _rows(table.read(as_of=v))
