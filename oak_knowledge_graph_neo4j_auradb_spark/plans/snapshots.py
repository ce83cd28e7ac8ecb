"""Snapshot-committed table format — Iceberg MERGE/commit semantics on
plain parquet, no runtime jars required.

The reference's production posture is Neo4j MERGE upserts per batch
(pipeline/auradb_loader.py:136-222) and, per the north rule, partitioned
Iceberg tables with snapshot commits. This sandbox has no Iceberg
runtime jar, so this module implements the part of Iceberg that the
semantics actually depend on, directly over parquet files:

* **Atomic snapshot commits.** Every write (append / overwrite / merge)
  stages its data files under ``data/s{N}/``, writes a manifest
  ``_snapshots/v{N}.json`` listing every live file of the new table
  state, then publishes by atomically replacing the ``_snapshots/HEAD``
  pointer (``os.replace`` — POSIX-atomic). A reader either sees the old
  snapshot or the new one, never a torn state; a writer that dies
  mid-stage leaves HEAD untouched and only unreferenced garbage behind.
* **Copy-on-write keyed MERGE.** The table is hash-bucketed on its key
  (``pmod(xxhash64(keys), n_buckets)``, pinned at creation). A merge
  reads ONLY the data files of the buckets its update keys hash into,
  full-outer-joins them with the updates (NULL incoming values preserve
  existing ones — the reference drops NaN fields so Neo4j ``SET n +=``
  never nulls a property), writes replacement files for just those
  buckets, and commits a manifest that carries every untouched bucket's
  files forward BY REFERENCE. On a 1000-executor run over 10^12 rows,
  merge cost is proportional to the touched buckets, not the table.
* **Time travel + rollback.** ``read(as_of=N)`` plans the scan from
  manifest N; ``rollback(N)`` commits a new snapshot whose file list is
  N's (history is never rewritten, exactly like Iceberg's
  rollback-as-new-snapshot).
* **Snapshot expiry.** ``expire(keep_last=k)`` deletes manifests older
  than the last *k* and any data file no retained manifest references —
  the maintenance operation that bounds storage growth.

Optimistic concurrency: commit re-checks that HEAD still names the
parent snapshot it planned against and raises ``CommitConflict``
otherwise (single-writer in this sandbox; on a real object store the
same check rides on a conditional PUT).

Layout::

    table/
      data/s{N}/_pb={bucket}/part-*.parquet   immutable data files
      _snapshots/v{N}.json                    manifest: files + lineage
      _snapshots/HEAD                         atomic pointer {"v": N}
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """HEAD moved between planning and publish — retry the operation."""


def _dir_rows(d: str) -> int:
    """Row count of every parquet file under ``d``, from footers only."""
    import pyarrow.parquet as pq

    n = 0
    for root, _, names in os.walk(d):
        for nm in names:
            if nm.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(root, nm)).metadata.num_rows
    return n


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        "int"
    )


@dataclass(frozen=True)
class Snapshot:
    version: int
    operation: str
    parent: int | None
    files: list[dict[str, Any]]  # [{"path": rel_dir, "bucket": int}]
    keys: list[str]
    n_buckets: int
    committed_at: float
    #: JSON-serialized StructType — lets a snapshot with zero data files
    #: (empty create, merge of an empty table) read back as a typed
    #: empty DataFrame instead of failing (Iceberg tables likewise keep
    #: their schema in metadata, independent of data files)
    schema: str | None = None

    @property
    def n_files(self) -> int:
        return len(self.files)

    @property
    def n_rows(self) -> int | None:
        """Total live rows per the manifest — the commit-time footer
        counts, no data read (None for pre-rows manifests)."""
        if any("rows" not in e for e in self.files):
            return None
        return sum(e["rows"] for e in self.files)


class SnapshotTable:
    """A keyed, hash-bucketed, snapshot-committed parquet table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._snap_dir = os.path.join(path, "_snapshots")

    # -- manifest plumbing --------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self._snap_dir, "HEAD")

    def current_version(self) -> int | None:
        try:
            with open(self._head_path()) as f:
                return json.load(f)["v"]
        except FileNotFoundError:
            return None

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshot at {self.path}")
        with open(os.path.join(self._snap_dir, f"v{v}.json")) as f:
            m = json.load(f)
        return Snapshot(
            version=m["version"],
            operation=m["operation"],
            parent=m["parent"],
            files=m["files"],
            keys=m["keys"],
            n_buckets=m["n_buckets"],
            committed_at=m["committed_at"],
            schema=m.get("schema"),
        )

    def history(self) -> list[Snapshot]:
        if not os.path.isdir(self._snap_dir):
            return []
        versions = sorted(
            int(n[1:-5])
            for n in os.listdir(self._snap_dir)
            if n.startswith("v") and n.endswith(".json")
        )
        return [self.snapshot(v) for v in versions]

    def _commit(
        self,
        parent: int | None,
        operation: str,
        files: list[dict[str, Any]],
        keys: list[str],
        n_buckets: int,
        schema: str | None = None,
    ) -> Snapshot:
        """Write manifest v{parent+1} then atomically swing HEAD."""
        os.makedirs(self._snap_dir, exist_ok=True)
        if self.current_version() != parent:
            raise CommitConflict(
                f"{self.path}: HEAD is {self.current_version()}, "
                f"planned against {parent}"
            )
        version = 0 if parent is None else parent + 1
        if schema is None and parent is not None:
            schema = self.snapshot(parent).schema
        manifest = {
            "version": version,
            "operation": operation,
            "parent": parent,
            "files": files,
            "keys": keys,
            "n_buckets": n_buckets,
            "committed_at": time.time(),
            "schema": schema,
        }
        mpath = os.path.join(self._snap_dir, f"v{version}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        head_tmp = self._head_path() + ".tmp"
        with open(head_tmp, "w") as f:
            json.dump({"v": version}, f)
        os.replace(head_tmp, self._head_path())  # the publish point
        return self.snapshot(version)

    # -- data-file staging --------------------------------------------------

    def _stage(
        self,
        df: DataFrame,
        keys: list[str],
        n_buckets: int,
        stage_version: int,
        max_records_per_file: int,
    ) -> list[dict[str, Any]]:
        """Write df's rows under data/s{V}/ partitioned by bucket; return
        the per-bucket file entries. Files are immutable once written —
        a snapshot directory is never rewritten by a later operation.

        A directory left by a writer that staged but never published is
        garbage (no manifest references it — manifests only ever point
        at dirs of committed versions); a retry reclaims it here."""
        stage_dir = os.path.join(self.path, "data", f"s{stage_version}")
        if os.path.isdir(stage_dir):
            shutil.rmtree(stage_dir)
        (
            df.withColumn("_pb", _bucket_expr(keys, n_buckets))
            .repartition(min(n_buckets, 200), "_pb")
            .write.mode("errorifexists")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("_pb")
            .parquet(stage_dir)
        )
        rel = os.path.join("data", f"s{stage_version}")
        entries = []
        for name in sorted(os.listdir(stage_dir)):
            if name.startswith("_pb="):
                entries.append(
                    {
                        "path": os.path.join(rel, name),
                        "bucket": int(name[4:]),
                        # Iceberg manifests carry per-file record counts;
                        # same here, from the parquet footers at commit
                        # time — a metadata-only read, no data scanned.
                        "rows": _dir_rows(os.path.join(stage_dir, name)),
                    }
                )
        return entries

    # -- public write operations -------------------------------------------

    def create(
        self,
        df: DataFrame,
        keys: str | list[str],
        n_buckets: int = 64,
        max_records_per_file: int = 1_000_000,
    ) -> Snapshot:
        key_list = [keys] if isinstance(keys, str) else list(keys)
        if self.current_version() is not None:
            raise FileExistsError(f"table already exists at {self.path}")
        dedup = df.dropDuplicates(key_list)
        files = self._stage(dedup, key_list, n_buckets, 0, max_records_per_file)
        return self._commit(
            None, "create", files, key_list, n_buckets,
            schema=df.schema.json(),
        )

    def append(
        self, df: DataFrame, max_records_per_file: int = 1_000_000
    ) -> Snapshot:
        """Fast append: new files only, no read of existing data. Key
        uniqueness is NOT enforced here (use merge for upsert) — this is
        the Iceberg ``append`` snapshot, for known-new keys."""
        cur = self.snapshot()
        files = self._stage(
            df, cur.keys, cur.n_buckets, cur.version + 1, max_records_per_file
        )
        return self._commit(
            cur.version, "append", cur.files + files, cur.keys, cur.n_buckets
        )

    def overwrite(
        self, df: DataFrame, max_records_per_file: int = 1_000_000
    ) -> Snapshot:
        cur = self.snapshot()
        dedup = df.dropDuplicates(cur.keys)
        files = self._stage(
            dedup, cur.keys, cur.n_buckets, cur.version + 1, max_records_per_file
        )
        return self._commit(
            cur.version, "overwrite", files, cur.keys, cur.n_buckets
        )

    def merge(
        self, updates: DataFrame, max_records_per_file: int = 1_000_000
    ) -> Snapshot:
        """Copy-on-write keyed MERGE (Neo4j ``MERGE … SET n +=`` /
        Iceberg ``MERGE INTO`` semantics): matched keys update with
        NULL-preserving coalesce, unmatched insert, untouched buckets'
        files carry into the new snapshot by reference."""
        cur = self.snapshot()
        key_list = cur.keys
        # Pin the updates to ONE evaluation: the touched-bucket collect
        # below and the merge join both read this plan, and a
        # nondeterministic source (limit, sample, rand) re-evaluated
        # differently between the two would let rows drift into buckets
        # whose old files carry forward — duplicating keys. An eager
        # localCheckpoint materializes the update set once (updates are
        # merge-batch-sized, far smaller than the table).
        upd = (
            updates.dropDuplicates(key_list)
            .withColumn("_pb", _bucket_expr(key_list, cur.n_buckets))
            .localCheckpoint(eager=True)
        )
        # ≤ n_buckets ints — never data-proportional
        touched = {
            r["_pb"] for r in upd.select("_pb").distinct().collect()
        }
        keep = [e for e in cur.files if e["bucket"] not in touched]
        old_touched = [e for e in cur.files if e["bucket"] in touched]

        data_cols = [c for c in updates.columns if c not in key_list]
        if old_touched:
            tgt = self.spark.read.parquet(
                *[os.path.join(self.path, e["path"]) for e in old_touched]
            )
            u2 = upd.select(
                *key_list,
                *[F.col(c).alias(f"__u_{c}") for c in data_cols],
            )
            merged = tgt.join(u2, on=key_list, how="full_outer").select(
                *key_list,
                *[
                    F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c)
                    for c in data_cols
                ],
            )
        else:
            merged = upd.drop("_pb")
        files = self._stage(
            merged,
            key_list,
            cur.n_buckets,
            cur.version + 1,
            max_records_per_file,
        )
        return self._commit(
            cur.version, "merge", keep + files, key_list, cur.n_buckets
        )

    def compact(
        self,
        min_files_per_bucket: int = 2,
        max_records_per_file: int = 1_000_000,
    ) -> Snapshot:
        """Iceberg ``rewrite_data_files``: rewrite buckets fragmented
        by appends into one file entry each, content-identical — the
        maintenance pass a streaming sink needs so per-bucket read
        fan-in stays O(1) instead of O(drains). Untouched buckets carry
        forward by reference; the rewrite commits as its own snapshot
        (operation "compact"), so time travel and ``expire()`` keep
        their semantics. No dedup happens here — rows are rewritten
        exactly as stored (``merge`` is the keyed upsert)."""
        from collections import Counter

        cur = self.snapshot()
        per = Counter(e["bucket"] for e in cur.files)
        frag = {b for b, c in per.items() if c >= min_files_per_bucket}
        if not frag:
            return cur
        keep = [e for e in cur.files if e["bucket"] not in frag]
        old = [e for e in cur.files if e["bucket"] in frag]
        df = self.spark.read.parquet(
            *[os.path.join(self.path, e["path"]) for e in old]
        )
        files = self._stage(
            df, cur.keys, cur.n_buckets, cur.version + 1, max_records_per_file
        )
        return self._commit(
            cur.version, "compact", keep + files, cur.keys, cur.n_buckets
        )

    def noop(self, operation: str = "noop") -> Snapshot:
        """Commit a new snapshot identical to HEAD — every file carried
        by reference, nothing staged. Multi-table stores use this to
        keep per-table versions ALIGNED when a maintenance pass rewrites
        only some tables (GraphStore's one-integer graph version)."""
        cur = self.snapshot()
        return self._commit(
            cur.version, operation, cur.files, cur.keys, cur.n_buckets
        )

    def rollback(self, version: int) -> Snapshot:
        """Commit a NEW snapshot whose state is an old snapshot's —
        history stays intact (Iceberg rollback semantics)."""
        cur = self.snapshot()
        old = self.snapshot(version)
        return self._commit(
            cur.version, f"rollback:{version}", old.files, old.keys,
            old.n_buckets, schema=old.schema,
        )

    # -- read path ----------------------------------------------------------

    def read(
        self,
        as_of: int | None = None,
        key_values: list | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Scan a snapshot. ``key_values`` (single-key tables) prunes the
        scan to the buckets those keys hash into — file skipping from
        the manifest, the planner never opens the other buckets.
        ``buckets`` prunes to an explicit bucket-id set (for callers
        that derive touched buckets distributedly, e.g. GraphStore's
        delta resolution)."""
        snap = self.snapshot(as_of)
        files = snap.files
        if buckets is not None:
            want_b = set(buckets)
            files = [e for e in files if e["bucket"] in want_b]
        if key_values is not None:
            if len(snap.keys) != 1:
                raise ValueError("key_values pruning needs a single-key table")
            lit_df = self.spark.createDataFrame(
                [(v,) for v in key_values], f"{snap.keys[0]} string"
            )
            want = {
                r["_pb"]
                for r in lit_df.select(
                    _bucket_expr(snap.keys, snap.n_buckets).alias("_pb")
                )
                .distinct()
                .collect()
            }
            files = [e for e in files if e["bucket"] in want]
        if not files:
            if snap.schema:
                from pyspark.sql.types import StructType

                return self.spark.createDataFrame(
                    [], StructType.fromJson(json.loads(snap.schema))
                )
            raise FileNotFoundError(
                f"{self.path}: snapshot {snap.version} has no data files"
            )
        return self.spark.read.parquet(
            *[os.path.join(self.path, e["path"]) for e in files]
        )

    # -- maintenance --------------------------------------------------------

    def expire(self, keep_last: int = 2) -> dict[str, int]:
        """Drop all but the last ``keep_last`` manifests and delete any
        staged data directory no retained manifest references."""
        snaps = self.history()
        if len(snaps) <= keep_last:
            return {"manifests_removed": 0, "dirs_removed": 0}
        keep, drop = snaps[-keep_last:], snaps[:-keep_last]
        live_dirs = {e["path"] for s in keep for e in s.files}
        live_stage = {p.split(os.sep)[1] for p in live_dirs}
        removed_dirs = 0
        data_dir = os.path.join(self.path, "data")
        for name in os.listdir(data_dir):
            if name not in live_stage:
                shutil.rmtree(os.path.join(data_dir, name))
                removed_dirs += 1
        for s in drop:
            os.remove(os.path.join(self._snap_dir, f"v{s.version}.json"))
        return {"manifests_removed": len(drop), "dirs_removed": removed_dirs}
