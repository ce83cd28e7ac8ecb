"""Incremental graph maintenance — snapshot-versioned node/edge tables
absorbing document deltas by copy-on-write MERGE.

``write_graph`` materializes one batch build. At 10^12 documents you
never rebuild from scratch: new and changed documents arrive as a
delta, and the graph must absorb them in time proportional to the
DELTA, not the corpus. ``GraphStore`` keeps every node label and the
resolved edge stream in a :class:`~.snapshots.SnapshotTable` (atomic
snapshot commits, hash-bucketed copy-on-write MERGE) and applies a
delta by running the SAME extraction plan over just the delta
documents, then MERGE-ing each output table:

* node match on ``id`` → property upsert where NULL incoming values
  preserve existing ones — the reference's ``MERGE (n {id: …}) SET
  n += {…}`` with NaN fields dropped (pipeline/auradb_loader.py:170-189);
* edge match on ``(config_key, pred, subj, obj)`` → props upsert
  (``MERGE (start)-[r]->(end) SET r +=``, auradb_loader.py:295-310);
* no match → insert.

Two store-side mechanisms make the incremental result CONVERGE to the
batch build over the union (pinned by tests/test_graph_store.py and
the kg86 oracle gate):

* **Dangling-triple backlog.** Endpoint resolution drops triples whose
  endpoint ids match no node (the loader's silent MATCH-miss,
  auradb_loader.py:296-309). A triple extracted from an early batch
  may reference a node a LATER delta introduces — so unresolved
  triples park in a ``dangling`` table, and every update re-resolves
  (delta triples ∪ backlog) against the post-merge node dimension.
  Resolution order therefore never affects the final edge set.
* **Join-group-aligned deltas (caller contract).** The wide table
  joins primary and supplementary documents on
  ``(unit_slug, programme_slug_by_year)`` (operators/joins.py:
  consolidate); a delta that splits a join group extracts incomplete
  rows no later update revisits. Ship every document of a touched
  join group in the same delta — the per-entity consistency contract
  every CDC feed has. (Document-level hashes do NOT respect this;
  split on :func:`join_group_key`, as kg86 does, or repair a
  doc-level feed with :func:`align_delta`.)

Deletion is intentionally out of scope: the reference's loader never
deletes (Neo4j MERGE is monotone) and triples carry no per-document
provenance by design — a triple asserted by any document stays
asserted until a compaction rebuild.

Every ``update`` (and ``compact``) advances EVERY table by exactly one
snapshot version, so one integer *graph version* addresses a consistent
cross-table state: ``store.nodes("Lesson", as_of=g)`` and
``store.edges(as_of=g)`` read the graph exactly as update *g* committed
it — time travel over the whole graph (docs/iceberg_parity.md maps the
per-table mechanics onto Iceberg). Each commit also appends one row per
table to an append-only ``metrics`` table (rows written / total rows /
file count / rewritten buckets, all from manifest footer counts — the
north rule's metrics table for the incremental path).

Scale contract: extraction runs only over the delta (the batch plan's
own ``hash(doc_id)`` partitioning); each MERGE reads and rewrites only
the hash buckets the delta's keys land in, and untouched buckets carry
into the new snapshot by file reference. Update cost is
O(|delta| + touched buckets), independent of graph size.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators.mapper import resolve_triples
from .pipeline import RUN_TS, GraphBuild, build_graph, build_graph_from_config
from .snapshots import Snapshot, SnapshotTable

#: resolved-edge identity — one row per asserted relationship
EDGE_KEYS = ["config_key", "pred", "subj", "obj"]

_META = "_graph_meta.json"


def join_group_key():
    """The consolidation join group of a document, as a Column over the
    interleaved-doc schema.

    ``operators/joins.py:consolidate`` joins primary and supplementary
    documents on the unit slug, normalizing the variant suffix ONLY on
    the supplementary side (unit slugs naturally end in digits —
    normalizing both sides over-strips and re-splits groups). Documents
    sharing this key must ship in the same delta (module docstring);
    docs with no unit_slug span fall back to their own doc_id (they
    join nothing)."""
    from ..functions.scalars import normalize_unit_slug

    raw = F.element_at(
        F.expr("filter(spans, s -> s.text LIKE 'unit_slug=%')"), 1
    )["text"]
    val = F.regexp_replace(raw, "^unit_slug=", "")
    return F.coalesce(
        F.when(
            F.col("doc_id").startswith("sup-"), normalize_unit_slug(val)
        ).otherwise(val),
        F.col("doc_id"),
    )


def align_delta(docs_delta: DataFrame, docs_full: DataFrame) -> DataFrame:
    """Expand a document delta to its JOIN-GROUP CLOSURE: every document
    of ``docs_full`` whose join group intersects the delta's.

    ``GraphStore.update`` requires join-group-aligned deltas — a delta
    that splits a group extracts incomplete wide rows no later update
    revisits. CDC feeds keyed per-document (file drops, doc-id hash
    shards) do NOT respect that; this helper repairs such a feed by
    pulling in the group siblings. Re-shipping a sibling that was
    already absorbed is harmless — extraction is deterministic and the
    MERGE is idempotent on identical rows. Cost: one semi-join of the
    corpus against the delta's distinct group keys (delta-sized probe,
    AQE picks broadcast when small)."""
    key = join_group_key()
    touched = docs_delta.select(key.alias("_jg")).distinct()
    return (
        docs_full.withColumn("_jg", key)
        .join(touched, "_jg", "leftsemi")
        .drop("_jg")
    )


class GraphStore:
    """A snapshot-versioned, incrementally-maintained knowledge graph."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- plumbing ------------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.path, _META)

    def _meta(self) -> dict[str, Any]:
        with open(self._meta_path()) as f:
            return json.load(f)

    def _table(self, name: str) -> SnapshotTable:
        return SnapshotTable(self.spark, os.path.join(self.path, name))

    def _build(
        self, docs: DataFrame, config: str | dict | None, run_ts: str
    ) -> GraphBuild:
        if config is None:
            return build_graph(self.spark, docs, run_ts=run_ts)
        return build_graph_from_config(self.spark, docs, config, run_ts=run_ts)

    def _node_configs(self, config: str | dict | None) -> dict[str, Any]:
        if config is None:
            from ..config.curriculum_schema import NODES

            return NODES
        from ..config.manager import (
            compile_config,
            load_graph_config,
            validate_config_dict,
        )

        gc = (
            load_graph_config(config)
            if isinstance(config, str)
            else compile_config(validate_config_dict(dict(config)))
        )
        return gc.nodes

    # -- public surface ------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self._meta_path())

    def labels(self) -> list[str]:
        return list(self._meta()["labels"])

    def version(self) -> int:
        """Current graph version (all tables are commit-aligned)."""
        v = self._table("edges").current_version()
        if v is None:
            raise FileNotFoundError(f"no graph store at {self.path}")
        return v

    def history(self) -> list[Snapshot]:
        """Graph-level commit history (the edge table's, by alignment)."""
        return self._table("edges").history()

    def nodes(self, label: str, as_of: int | None = None) -> DataFrame:
        return self._table(f"nodes/{label}").read(as_of=as_of)

    def edges(self, as_of: int | None = None) -> DataFrame:
        return self._table("edges").read(as_of=as_of)

    def metrics(self) -> DataFrame:
        """Per-commit, per-table maintenance metrics (north-rule metrics
        table for the incremental path): one row per table per graph
        version with rows written / total live rows / live file count /
        rewritten buckets, all derived from manifest footer counts —
        no data scan. Append-only; survives ``expire``."""
        return self.spark.read.parquet(os.path.join(self.path, "metrics"))

    def _record_metrics(
        self, graph_version: int, snaps: dict[str, Snapshot]
    ) -> None:
        rows = []
        for name, snap in sorted(snaps.items()):
            prefix = os.path.join("data", f"s{snap.version}")
            new = [e for e in snap.files if e["path"].startswith(prefix)]
            rows.append(
                (
                    graph_version,
                    name,
                    snap.operation,
                    sum(e.get("rows", 0) for e in new),
                    snap.n_rows,
                    snap.n_files,
                    len(new),
                    float(snap.committed_at),
                )
            )
        df = self.spark.createDataFrame(
            rows,
            "graph_version int, table string, operation string, "
            "rows_written long, rows_total long, n_files int, "
            "buckets_rewritten int, committed_at double",
        )
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.path, "metrics")
        )

    def init(
        self,
        docs: DataFrame,
        config: str | dict | None = None,
        n_buckets: int = 64,
        run_ts: str = RUN_TS,
    ) -> dict[str, Any]:
        """Full batch build → graph version 0."""
        if os.path.exists(self._meta_path()):
            raise FileExistsError(f"graph store already exists at {self.path}")
        gb = self._build(docs, config, run_ts)
        labels = sorted(gb.nodes)
        snaps: dict[str, Snapshot] = {}
        for label in labels:
            snaps[f"nodes/{label}"] = self._table(f"nodes/{label}").create(
                gb.nodes[label], "id", n_buckets
            )
        snaps["edges"] = self._table("edges").create(
            gb.resolved, EDGE_KEYS, n_buckets
        )
        # the resolution complement parks for later updates to retry
        snaps["dangling"] = self._table("dangling").create(
            gb.triples.join(gb.resolved, on=EDGE_KEYS, how="left_anti"),
            EDGE_KEYS,
            n_buckets,
        )
        gb.unpersist()
        os.makedirs(self.path, exist_ok=True)
        with open(self._meta_path(), "w") as f:
            json.dump({"labels": labels, "n_buckets": n_buckets}, f)
        self._record_metrics(0, snaps)
        return {"version": 0, "labels": labels}

    def update(
        self,
        docs_delta: DataFrame,
        config: str | dict | None = None,
        run_ts: str = RUN_TS,
    ) -> dict[str, Any]:
        """Absorb a document delta: one aligned commit across all
        tables (MERGE on nodes/edges, overwrite on the dangling
        backlog).

        The delta must be join-group-aligned (module docstring). Its
        extracted triples, together with the parked dangling backlog,
        re-resolve against the POST-merge node dimension — so a triple
        whose endpoint arrives in a later delta lands in ``edges`` the
        moment both sides exist, in any arrival order.

        Returns the new graph version and, per merged table, how many
        bucket directories were actually rewritten (0 = the delta
        produced no rows for it; untouched buckets carried by
        reference).

        Scale note: the resolution dimension is BUCKET-PRUNED — the
        candidates' endpoint ids are hashed (with each table's own id
        dtype, matching its bucketing) into a distinct (label, bucket)
        set of at most labels × n_buckets ints, and each node table is
        read only at those bucket directories, ``id`` column only
        (parquet column pruning). Dimension read cost is
        O(touched buckets), not O(|nodes|); the semi-join itself is
        AQE-planned with a delta-sized probe side."""
        meta = self._meta()
        gb = self._build(docs_delta, config, run_ts)
        delta_nodes = gb.nodes
        if sorted(delta_nodes) != meta["labels"]:
            raise ValueError(
                f"delta build emits labels {sorted(delta_nodes)} but the "
                f"store was created with {meta['labels']} — label-set "
                "changes need a config migration, not an update"
            )
        rewritten: dict[str, int] = {}
        snaps: dict[str, Snapshot] = {}

        def _merge(name: str, upd: DataFrame) -> Snapshot:
            snap = self._table(name).merge(upd)
            new_prefix = os.path.join("data", f"s{snap.version}")
            rewritten[name] = sum(
                1 for e in snap.files if e["path"].startswith(new_prefix)
            )
            snaps[name] = snap
            return snap

        for label in meta["labels"]:
            _merge(f"nodes/{label}", delta_nodes[label])

        # (delta triples ∪ backlog) vs the post-merge node dimension.
        # One evaluation feeds the bucket probe, the resolve semi-join,
        # and the backlog complement.
        candidates = (
            gb.triples.unionByName(self._table("dangling").read())
            .dropDuplicates(EDGE_KEYS)
            .localCheckpoint(eager=True)
        )
        nodes_now = self._pruned_dims(candidates, meta)
        resolved = resolve_triples(
            candidates, nodes_now, self._node_configs(config)
        )
        # one evaluation feeds both the edge merge and the backlog
        # complement — and the complement must see the SAME resolved set
        resolved = resolved.localCheckpoint(eager=True)
        esnap = _merge("edges", resolved)
        still_dangling = candidates.join(
            resolved, on=EDGE_KEYS, how="left_anti"
        )
        snaps["dangling"] = self._table("dangling").overwrite(still_dangling)
        gb.unpersist()
        self._record_metrics(esnap.version, snaps)
        return {"version": esnap.version, "buckets_rewritten": rewritten}

    def dangling(self, as_of: int | None = None) -> DataFrame:
        """The parked resolution backlog (audit surface)."""
        return self._table("dangling").read(as_of=as_of)

    def _pruned_dims(
        self, candidates: DataFrame, meta: dict[str, Any]
    ) -> dict[str, DataFrame]:
        """Per-label node-id frames pruned to the buckets the
        candidates' endpoints hash into.

        Bucket ids are derived DISTRIBUTEDLY (the only collect is the
        distinct (label, bucket) set, ≤ labels × n_buckets ints) and
        each endpoint id is hashed at the table's own id dtype —
        bucketing hashed the stored column type, so a string endpoint
        probing a bigint-keyed table (Unitvariant) must cast first;
        try_cast keeps junk ids from throwing under ANSI (a junk id
        matches nothing, its bucket read is just wasted IO)."""
        from pyspark.sql.types import StructType

        nb = meta["n_buckets"]
        ep = candidates.select(
            F.col("subj_label").alias("label"), F.col("subj").alias("id")
        ).unionByName(
            candidates.select(
                F.col("obj_label").alias("label"), F.col("obj").alias("id")
            )
        )
        tables = {lb: self._table(f"nodes/{lb}") for lb in meta["labels"]}
        id_types = {}
        for lb, t in tables.items():
            schema = t.snapshot().schema
            if schema is None:  # pre-schema-manifest store: no pruning
                return {lb2: self.nodes(lb2).select("id") for lb2 in tables}
            st = StructType.fromJson(json.loads(schema))
            id_types[lb] = next(f.dataType for f in st.fields if f.name == "id")
        bucket = None
        for lb, dt in id_types.items():
            b = F.pmod(
                F.xxhash64(F.col("id").try_cast(dt)), F.lit(nb)
            ).cast("int")
            bucket = (
                F.when(F.col("label") == lb, b)
                if bucket is None
                else bucket.when(F.col("label") == lb, b)
            )
        touched: dict[str, set[int]] = {lb: set() for lb in tables}
        for r in (
            ep.select("label", bucket.alias("b")).distinct().collect()
        ):
            if r["label"] in touched and r["b"] is not None:
                touched[r["label"]].add(r["b"])
        return {
            lb: t.read(buckets=sorted(touched[lb])).select("id")
            for lb, t in tables.items()
        }

    def compact(self, min_files_per_bucket: int = 2) -> dict[str, Any]:
        """Graph-level ``rewrite_data_files``: fold append/merge
        fragmentation in every table back to one file entry per bucket.
        EVERY table commits exactly one new version — fragmented tables
        a real rewrite, the rest a by-reference no-op commit — so the
        one-integer graph version stays aligned and ``as_of`` reads
        across tables remain consistent through maintenance."""
        meta = self._meta()
        tables = [f"nodes/{lb}" for lb in meta["labels"]] + [
            "edges",
            "dangling",
        ]
        snaps: dict[str, Snapshot] = {}
        rewritten: dict[str, int] = {}
        for name in tables:
            t = self._table(name)
            before = t.current_version()
            snap = t.compact(min_files_per_bucket=min_files_per_bucket)
            if snap.version == before:  # nothing fragmented — stay aligned
                snap = t.noop("compact-noop")
                rewritten[name] = 0
            else:
                prefix = os.path.join("data", f"s{snap.version}")
                rewritten[name] = sum(
                    1 for e in snap.files if e["path"].startswith(prefix)
                )
            snaps[name] = snap
        version = snaps["edges"].version
        self._record_metrics(version, snaps)
        return {"version": version, "buckets_rewritten": rewritten}

    def expire(self, keep_last: int = 2) -> dict[str, int]:
        """Expire old snapshots across every table (storage bound)."""
        totals = {"manifests_removed": 0, "dirs_removed": 0}
        tables = [f"nodes/{lb}" for lb in self.labels()] + [
            "edges",
            "dangling",
        ]
        for name in tables:
            r = self._table(name).expire(keep_last)
            for k in totals:
                totals[k] += r[k]
        return totals
