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

from ..operators.linking import extract_mentions
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


def windowed_event_counts(
    spark: SparkSession,
    in_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts over a streaming events table
    (late rows beyond the watermark dropped) — the standard streaming
    agg shape (SURVEY.md §2.9 gap in the reference)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
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
):
    """Stateful incremental first-seen dedup via
    ``applyInPandasWithState`` — the reference's in-memory ``seen_ids``
    set (schema_mapper.py:86,172-176) as a distributed, checkpointed
    streaming operator: each micro-batch emits only IDs never seen in
    ANY prior batch, with the winning row chosen by the extraction-order
    key ``_row_seq`` so output is deterministic under parallelism.

    State is one row-seq watermark per entity ID, kept in the state
    store (HDFS/RocksDB-backed on a cluster) and restored from
    ``checkpoint_dir`` on restart — the dedup survives job restarts,
    which the reference's process-local set cannot.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.reconstruct import reconstruct_wide

    docs = stream_documents(spark, in_dir)
    wide = reconstruct_wide(docs, "primary", columns=(id_col,))
    ids = wide.select(
        F.col(id_col).alias("id"), F.col("_row_seq").alias("row_seq")
    ).filter(F.col("id").isNotNull())

    out_schema = "id string, row_seq bigint"
    state_schema = "seen boolean"

    def dedup(key, pdfs, state: GroupState):
        first = None
        for pdf in pdfs:
            if len(pdf):
                m = pdf.loc[pdf["row_seq"].idxmin()]
                if first is None or m["row_seq"] < first["row_seq"]:
                    first = m
        if first is None or state.exists:
            return iter(())
        state.update((True,))
        return iter(
            [pd.DataFrame({"id": [key[0]], "row_seq": [int(first["row_seq"])]})]
        )

    deduped = ids.groupBy("id").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
