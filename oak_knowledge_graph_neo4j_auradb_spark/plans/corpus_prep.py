"""Corpus preparation pipeline — the LLM-training-data analog of
``plans/pipeline.build_graph``: one composable plan that takes the raw
``documents`` table through the hygiene stages a 100-TB pre-training
corpus runs before shard writing, with every dropped row routed to a
side-output carrying its drop stage (the quarantine pattern of
``operators/quarantine.py``, applied to corpus filtering):

1. **benchmark hold-out** — ``doc_id % bench_mod == 0`` docs are the
   evaluation split; they never enter the training corpus.
2. **near-dup removal** — documents sharing a 5-token-prefix
   fingerprint keep only the lowest ``doc_id`` (the q86 cross-shard
   audit as an acting filter).
3. **quality filter** — the q81 fixed-weight logistic model; docs with
   score ≤ ``quality_min`` (or no tokens) drop.
4. **decontamination** — docs sharing any 5-gram with the held-out
   benchmark drop (q79's semi-join as an acting filter).
5. **packing** — survivors get a per-language sequence-packing bin
   (q71's running-token-budget assignment), ready for shard writing.

Stage flags are ORDER-INDEPENDENT per document (each is a pure
predicate over the corpus), so the pipeline computes them in parallel
branches off one persisted base scan and attributes each dropped doc to
the FIRST failing stage by a fixed priority — which makes the whole
plan replayable by a single SQL expression (the q126 oracle twin) and
keeps attribution deterministic however Spark schedules the branches.

Scale posture: one base scan persisted; the dup check is one shuffle on
an 8-byte fingerprint; decontamination shuffles gram fingerprints
(8-byte keys) with the benchmark side distinct-reduced first; quality
is a pure projection; packing is one window per language partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: drop-stage priority (first failing stage wins attribution)
STAGES = ("benchmark_heldout", "near_dup_prefix", "low_quality", "contaminated")


@dataclass
class CorpusPrep:
    kept: DataFrame      # doc_id, lang, tok_n, bin
    dropped: DataFrame   # doc_id, lang, stage
    stats: DataFrame     # stage, n_docs, n_tokens
    _base: DataFrame | None = None

    def unpersist(self) -> None:
        if self._base is not None:
            self._base.unpersist()
            self._base = None


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    *,
    bench_mod: int = 20,
    quality_min: float = 0.40,
    pack_budget: int = 2048,
) -> CorpusPrep:
    from ..queries.common import md5long, tokens
    from ..queries.pipelineops import _QW, _shingles

    base = docs.select(
        "doc_id",
        "lang",
        tokens(F.col("text")).alias("t"),
    ).persist()

    tok_n = F.size("t")
    is_bench = (F.col("doc_id") % bench_mod) == 0

    # -- near-dup: 5-token-prefix fingerprint, keep min doc_id ------------
    fp = md5long(F.concat_ws(" ", F.slice("t", 1, 5)))
    w_fp = Window.partitionBy("fp")
    flagged = base.withColumn("fp", fp).withColumn(
        "is_dup",
        ~is_bench
        & (
            F.col("doc_id")
            != F.min(F.when(~is_bench, F.col("doc_id"))).over(w_fp)
        ),
    )

    # -- quality: q81's fixed-weight logistic over cheap lexical feats ----
    stop = F.size(
        F.filter(F.col("t"), lambda x: x.isin("the", "a", "and", "of", "to"))
    ) / tok_n
    wlen = F.aggregate(
        F.col("t"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / tok_n
    z = (
        F.lit(_QW["b"])
        + _QW["stop"] * stop
        + _QW["wlen"] * wlen
        + _QW["loglen"] * F.log(F.lit(1.0) + tok_n)
    )
    score = F.when(tok_n > 0, 1.0 / (1.0 + F.exp(-z))).otherwise(F.lit(0.0))
    flagged = flagged.withColumn("is_lowq", score <= quality_min)

    # -- decontamination: any 5-gram shared with the benchmark split ------
    grams = base.select(
        "doc_id", F.explode(_shingles()).alias("gram")
    ).select("doc_id", md5long(F.col("gram")).alias("g"))
    bench_grams = (
        grams.filter((F.col("doc_id") % bench_mod) == 0).select("g").distinct()
    )
    contaminated = (
        grams.filter((F.col("doc_id") % bench_mod) != 0)
        .join(bench_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    flagged = flagged.join(contaminated, "doc_id", "left").withColumn(
        "is_contam", F.coalesce("is_contam", F.lit(False))
    )

    stage = (
        F.when(is_bench, F.lit(STAGES[0]))
        .when(F.col("is_dup"), F.lit(STAGES[1]))
        .when(F.col("is_lowq"), F.lit(STAGES[2]))
        .when(F.col("is_contam"), F.lit(STAGES[3]))
    )
    labeled = flagged.select(
        "doc_id", "lang", tok_n.alias("tok_n"), stage.alias("stage")
    )

    dropped = labeled.filter(F.col("stage").isNotNull()).select(
        "doc_id", "lang", "stage"
    )

    # -- packing: per-language running token budget (q71) -----------------
    w_pack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        labeled.filter(F.col("stage").isNull())
        .withColumn("cum", F.sum("tok_n").over(w_pack))
        .withColumn(
            "bin",
            F.floor((F.col("cum") - F.col("tok_n")) / pack_budget).cast(
                "long"
            ),
        )
        .select("doc_id", "lang", F.col("tok_n").cast("long").alias("tok_n"), "bin")
    )

    stats = (
        labeled.select(
            F.coalesce("stage", F.lit("kept")).alias("stage"), "tok_n"
        )
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tok_n").cast("long").alias("n_tokens"),
        )
    )
    return CorpusPrep(kept=kept, dropped=dropped, stats=stats, _base=base)


def write_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    max_records_per_file: int = 1_000_000,
    **prep_kwargs,
):
    """Materialize the prepared corpus under ``out_dir`` — the shard-
    writing tail of the pipeline, with the same checkpoint-resume
    contract as ``sinks.write_graph``: each stage directory with a
    ``_SUCCESS`` marker is skipped on re-run, so a resubmitted job
    continues from the last committed table instead of recomputing.

    Layout: ``kept/`` (partitioned by lang — the packing bin rides in
    the data, so a trainer reads one (lang, bin) group per sequence),
    ``dropped/`` (partitioned by drop stage — the quarantine pattern),
    ``stats/``, and per-partition ``lineage/``."""
    import os
    import time

    from .sinks import WriteReport, _committed, partition_lineage

    report = WriteReport(out_dir=out_dir)
    prep = prepare_corpus(spark, docs, **prep_kwargs)
    lineage_parts = []

    def emit(stage, df, key, partition_by=None):
        full = os.path.join(out_dir, stage)
        if _committed(full):
            report.stages_skipped.append(stage)
            return
        from pyspark.sql import Observation

        t0 = time.monotonic()
        obs = Observation(f"corpus_{stage}")
        w = (
            df.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
        )
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(full)
        report.stages_run.append(stage)
        report.metrics[f"{stage}_rows"] = obs.get["n"]
        report.metrics[f"{stage}_sec"] = round(time.monotonic() - t0, 3)
        lineage_parts.append(
            partition_lineage(spark.read.parquet(full), stage, key)
        )

    try:
        emit("kept", prep.kept, "doc_id", partition_by="lang")
        emit("dropped", prep.dropped, "doc_id", partition_by="stage")
        emit("stats", prep.stats, "stage")
        if lineage_parts:
            lin = lineage_parts[0]
            for p in lineage_parts[1:]:
                lin = lin.unionByName(p)
            emit("lineage", lin, "stage")
        elif _committed(os.path.join(out_dir, "lineage")):
            # fully-resumed run: every data stage was skipped, so there
            # is nothing to re-derive lineage from — the committed table
            # stands
            report.stages_skipped.append("lineage")
    finally:
        prep.unpersist()
    return report
