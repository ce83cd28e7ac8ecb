"""Structured-Streaming ingest: incremental KG construction over a
growing documents table.

The reference is strictly batch (main.py; ARCHITECTURE.md:76-88). At
10^12-doc scale re-running the batch pipeline per delivery is not an
option — new document files land continuously and only the delta should
be processed. Structured Streaming gives exactly that: ``readStream``
over the documents directory, the SAME span-reconstruction / mention /
triple expressions as batch (the plans are identical — one definition,
two execution modes), ``writeStream`` with a checkpoint so every file is
processed exactly once and a restart resumes from the offset log.

``Trigger.AvailableNow`` drains everything currently available and
stops — the batch-of-streams execution mode used for scheduled
incremental runs (and for deterministic tests).

Aggregating stages (first-seen dedup, connected components) stay in the
batch layer over the checkpointed outputs — the standard
incremental-ingest/batch-consolidate split; ``foreachBatch`` in
:func:`stream_graph_updates` bridges into the batch pipeline per
micro-batch where full-graph semantics are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linking import extract_mentions, link_candidates
from ..operators.reconstruct import DOCS_SCHEMA, span_fingerprint


def stream_documents(spark: SparkSession, in_dir: str) -> DataFrame:
    """Streaming scan of a documents directory (parquet files land
    incrementally; schema pinned — no inference race)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )


def stream_mentions(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Incremental mention detection: every NEW document file's text
    spans → (doc_id, label, mention) appended to ``out_dir``. Re-running
    after more files land processes only the delta (offset log in
    ``checkpoint_dir``). Returns the finished query."""
    docs = stream_documents(spark, in_dir)
    q = (
        extract_mentions(docs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_fingerprints(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Incremental span-sequence fingerprints — the per-row invariant
    (input_hint) checkpointed per delivery, so any later transform can
    be audited against the at-ingest ordering without rereading spans."""
    docs = stream_documents(spark, in_dir)
    q = (
        span_fingerprint(docs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_graph_updates(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    run_ts: str = "2026-01-01T00:00:00",
):
    """Per-micro-batch KG construction via ``foreachBatch``: each batch
    of new documents runs the batch extraction plan and appends its
    triples. Cross-batch dedup is a consumer-side concern (first-seen
    ordering is carried in the data via doc_id order, so a batch
    ``min(struct(_ord …))`` over the accumulated output reproduces
    exact batch semantics at any time)."""
    from ..plans.pipeline import build_graph

    docs = stream_documents(spark, in_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gb = build_graph(
            spark, batch_df, run_ts=run_ts, repartition_docs=False
        )
        gb.triples.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_dir}/triples")
        gb.unpersist()

    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_entity_links(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    dictionary: DataFrame,
    max_edit: int = 1,
    top_k: int = 1,
):
    """Streaming fuzzy entity linking: each micro-batch of NEW document
    files runs span-wise mention detection + the SymSpell
    deletion-neighborhood candidate join + levenshtein rerank against
    the static (broadcast) entity ``dictionary``, appending
    (doc_id, label, mention, nid, dist, rank) rows.

    The per-mention top-k rank window cannot run on an unbounded
    stream, but its groups are (doc_id, label, mention) and a
    document's spans never straddle files — so batch-local ranking
    inside ``foreachBatch`` is EXACTLY global ranking, no cross-batch
    state needed. The dictionary side is a plain batch DataFrame and
    re-broadcasts per micro-batch (at cluster scale: a dimension
    refreshable between triggers). Checkpoint/offset log gives
    exactly-once over input files; re-drains append nothing."""
    docs = stream_documents(spark, in_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        m = (
            extract_mentions(batch_df)
            .select("doc_id", "label", "mention")
            .distinct()
        )
        link_candidates(m, dictionary, max_edit=max_edit, top_k=top_k).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_entity_links_merged(
    spark: SparkSession,
    in_dir: str,
    table_path: str,
    checkpoint_dir: str,
    dictionary: DataFrame,
    max_edit: int = 1,
    top_k: int = 1,
    n_buckets: int = 16,
):
    """Streaming fuzzy entity linking into a snapshot-versioned LINK
    TABLE: each micro-batch's candidates MERGE into a ``SnapshotTable``
    keyed on the full link identity (doc_id, label, mention, nid), so
    the sink is idempotent at the STORAGE level — replaying a batch
    (e.g. after losing the offset log) updates matched keys with
    identical values instead of double-appending. This is the
    at-least-once → exactly-once-on-content bridge
    ``stream_graph_store_updates`` uses for the graph itself, applied
    to the mention→entity link table; the table's snapshot history is
    the delivery history (time travel reads any prefix of drains).
    Batch-local top-k ranking is exact for the same reason as
    :func:`stream_entity_links` — a document's spans never straddle
    input files."""
    from ..plans.snapshots import SnapshotTable

    docs = stream_documents(spark, in_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        m = (
            extract_mentions(batch_df)
            .select("doc_id", "label", "mention")
            .distinct()
        )
        links = link_candidates(
            m, dictionary, max_edit=max_edit, top_k=top_k
        )
        t = SnapshotTable(spark, table_path)
        if t.current_version() is None:
            t.create(
                links,
                keys=["doc_id", "label", "mention", "nid"],
                n_buckets=n_buckets,
            )
        else:
            t.merge(links)

    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_merge_nodes(
    spark: SparkSession,
    in_dir: str,
    table_path: str,
    checkpoint_dir: str,
    label: str = "Unit",
    run_ts: str = "2026-01-01T00:00:00",
):
    """Streaming upsert: each micro-batch of new documents runs node
    extraction and MERGEs the label's node table in place
    (``foreachBatch`` → ``plans/sinks.merge_into``) — the streaming
    twin of the reference's UNWIND-MERGE loader
    (auradb_loader.py:170-189), with the same semantics: re-delivered
    entities UPDATE (null-skip property merge) instead of duplicating,
    new entities INSERT, and a replayed micro-batch (checkpoint
    recovery re-runs the last batch) is idempotent because the MERGE
    itself is. Only the buckets touched by the batch's keys are
    rewritten — a delivery of 10^6 docs against a 10^12-entity table
    rewrites a bounded slice, not the table."""
    from ..plans.pipeline import build_graph
    from ..plans.sinks import merge_into

    docs = stream_documents(spark, in_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gb = build_graph(
            spark, batch_df, run_ts=run_ts, repartition_docs=False
        )
        merge_into(spark, table_path, gb.nodes[label], "id")
        gb.unpersist()

    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_graph_store_updates(
    spark: SparkSession,
    in_dir: str,
    store_path: str,
    checkpoint_dir: str,
    run_ts: str = "2026-01-01T00:00:00",
):
    """Streaming CDC into the incrementally-maintained graph: each
    micro-batch of documents becomes ONE aligned GraphStore commit —
    the first batch initializes the store, every later batch MERGEs
    (``plans/graph_store.py``: node/edge upserts, dangling-backlog
    re-resolution). The graph's snapshot history IS the delivery
    history, and because updates converge independently of arrival
    order (kg86's contract), the drained store equals a batch build
    over everything delivered. A checkpoint-recovered micro-batch
    re-runs as a content-idempotent update (one extra identical-state
    version — the at-least-once → exactly-once-on-content bridge the
    reference's MERGE loader relies on, auradb_loader.py:136-222).

    Micro-batches must be join-group-aligned (graph_store.py caller
    contract), which CDC feeds that partition by entity satisfy by
    construction. A producer that shards per document instead must
    repair each drop to its join-group closure before landing it
    (``plans.graph_store.align_delta`` — needs the producer's corpus
    view, which only the producer has; the sink cannot reconstruct
    group siblings it was never sent)."""
    from ..plans.graph_store import GraphStore

    store = GraphStore(spark, store_path)
    docs = stream_documents(spark, in_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if store.exists():
            store.update(batch_df, run_ts=run_ts)
        else:
            store.init(batch_df, run_ts=run_ts)

    q = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def windowed_event_counts(
    spark: SparkSession,
    in_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed counts over a streaming events table (late
    rows beyond the watermark dropped) — the standard streaming agg
    shape (SURVEY.md §2.9 gap in the reference). `slide` < `window`
    turns the tumbling windows into overlapping sliding ones (each row
    lands in window/slide buckets)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(win, F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def stream_first_seen_nodes(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "unit_slug",
    state_ttl_rows: int | None = None,
):
    """Stateful incremental first-seen dedup via
    ``applyInPandasWithState`` — the reference's in-memory ``seen_ids``
    set (schema_mapper.py:86,172-176) as a distributed, checkpointed
    streaming operator: each micro-batch emits only IDs never seen in
    ANY prior batch, with the winning row chosen by the extraction-order
    key ``_row_seq`` so output is deterministic under parallelism.

    State is one row-seq watermark per entity ID, kept in the state
    store (HDFS/RocksDB-backed on a cluster — set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider for state that exceeds executor heap) and restored from
    ``checkpoint_dir`` on restart — the dedup survives job restarts,
    which the reference's process-local set cannot.

    **State growth**: one entry per distinct entity ID, forever, unless
    ``state_ttl_rows`` is set. At 10^12 entities unbounded state is not
    an option; with a TTL, an ID not re-seen within ``state_ttl_rows``
    extraction-sequence units is evicted (event-time timeout against a
    watermark over the ``_row_seq`` clock) and would be re-emitted if
    it reappears — exact dedup within the TTL horizon, bounded state
    beyond it. Seeing an ID again refreshes its clock.

    The TTL is event-time (data progress), not wall-clock, by design:
    a processing-time timeout keeps an ``availableNow`` run scheduling
    empty "cleaning up state" batches forever (observed: the query
    never self-terminates), and wall-clock eviction is neither
    deterministic nor replay-safe. Pick the TTL from the source's
    re-delivery window measured in sequence units; ``None`` keeps the
    exact-forever behavior for bounded ID spaces.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.reconstruct import reconstruct_wide

    docs = stream_documents(spark, in_dir)
    wide = reconstruct_wide(docs, "primary", columns=(id_col,))
    ids = wide.select(
        F.col(id_col).alias("id"), F.col("_row_seq").alias("row_seq")
    ).filter(F.col("id").isNotNull())
    if state_ttl_rows is not None:
        # the extraction-order key IS the event-time clock: 1 sequence
        # unit ≙ 1 second; the watermark tracks the max row_seq seen
        ids = ids.withColumn(
            "_et", F.timestamp_seconds(F.col("row_seq"))
        ).withWatermark("_et", "1 second")

    out_schema = "id string, row_seq bigint"
    state_schema = "seen boolean"

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()  # evict idle entry; ID may re-emit later
            return iter(())
        first = last = None
        for pdf in pdfs:
            if len(pdf):
                lo = pdf["row_seq"].min()
                hi = pdf["row_seq"].max()
                first = lo if first is None else min(first, lo)
                last = hi if last is None else max(last, hi)
        if first is None:
            return iter(())

        def arm():
            # fire when the watermark passes last-seen + TTL; must stay
            # strictly ahead of the current watermark or Spark rejects it
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max((int(last) + state_ttl_rows) * 1000, wm + 1)
            )

        if state.exists:
            if state_ttl_rows is not None:
                arm()  # refresh the clock on re-delivery
            return iter(())
        state.update((True,))
        if state_ttl_rows is not None:
            arm()
        return iter([pd.DataFrame({"id": [key[0]], "row_seq": [int(first)]})])

    deduped = ids.groupBy("id").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_rows is None
            else GroupStateTimeout.EventTimeTimeout
        ),
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
