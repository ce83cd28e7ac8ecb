"""Stage G — checkpoint-resumable graph materialization with
per-partition lineage + metrics tables (BASELINE.json north_rule).

The reference writes per-label node CSVs and relationship CSVs in one
shot (schema_mapper.py:236-246,373-385) and restarts from zero on any
failure (HISTORY.md:357-363 — the 10K-row file-splitting workaround
exists because imports died mid-way). Here every pipeline stage persists
to its own columnar table under ``out_dir`` and a re-run skips any stage
whose output is already committed (parquet ``_SUCCESS`` marker — the
same idempotence Iceberg snapshot commits give in production):

    out_dir/
      wide/                 stage S+X+J+C checkpoint (the consolidated table)
      triples/              stage M (partitioned by config_key)
      resolved/             stage M+resolution
      nodes/<label>/        stage G per-label typed node tables
      lineage/              per-(stage, partition) row counts + key ranges
      metrics/              per-stage row counts + durations

Lineage rows carry (stage, partition_id, n_rows, min_key, max_key) — on
a 1000-executor run these are the audit trail for which partition of
which stage produced which keys, and the input for incremental
re-validation (scripts/validate_neo4j_import.py:236-319 is the
reference's after-the-fact equivalent).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import RUN_TS, GraphBuild, build_graph

#: Stage names ``write_graph(stages=[...])`` accepts — the engine's
#: analogue of the reference's run_partial_pipeline stage registry
#: (pipeline/pipeline.py:506-513: config/extract/validate/map/
#: transform/load). "nodes" selects every per-label node table.
GRAPH_STAGES = (
    "wide",
    "triples",
    "resolved",
    "nodes",
    "quarantine",
    "field_lineage",
)


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def partition_lineage(df: DataFrame, stage: str, key: str) -> DataFrame:
    """(stage, partition_id, n_rows, min_key, max_key) for one stage."""
    return (
        df.select(
            F.spark_partition_id().alias("partition_id"),
            F.col(key).cast("string").alias("_k"),
        )
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
        .select(F.lit(stage).alias("stage"), "*")
    )


@dataclass
class WriteReport:
    out_dir: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)


@dataclass
class StageProgress:
    """One progress event — the reference's PipelineProgress protocol
    (pipeline/pipeline.py:26-41): stage name, percent, human message,
    and record counts where known. Emitted at stage start (0%) and
    completion (100%), plus a final ``complete`` event."""

    stage: str
    progress_percent: float
    message: str
    records_processed: int = 0
    total_records: int = 0


def write_graph(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_ts: str = RUN_TS,
    max_records_per_file: int = 1_000_000,
    config: str | dict | None = None,
    stages: list[str] | None = None,
    progress: Callable[[StageProgress], None] | None = None,
) -> WriteReport:
    """Materialize the full graph build under ``out_dir``, stage by
    stage, resuming from any committed checkpoint.

    ``max_records_per_file`` bounds output file size the way the
    reference's 10K-row CSV split did (HISTORY.md:357-363) — but as a
    writer option, not a bespoke splitter.

    ``config`` (a reference-dialect JSON path or dict) routes through
    the config-as-program loader, so one JSON drives extraction AND
    materialization with no code changes (reference README.md:10).

    ``stages`` runs only the named subset of :data:`GRAPH_STAGES` — the
    reference's ``run_partial_pipeline`` (pipeline/pipeline.py:502-544),
    with one Spark-first difference: a selected stage never needs its
    upstream stages *materialized*. Upstream state is a lazy plan, so
    ``stages=["resolved"]`` on a fresh directory computes the
    extraction prefix in-flight and writes only the resolved table;
    when an upstream checkpoint IS committed it is read instead
    (resume semantics unchanged). Unknown names raise ``ValueError``
    (pipeline.py:522-525).

    ``progress`` receives a :class:`StageProgress` at each stage's
    start and completion plus a final ``complete`` event — the
    reference's progress-callback protocol (pipeline.py:26-41,
    ``_report_progress`` :89-104)."""
    if stages is not None:
        bad = [s for s in stages if s not in GRAPH_STAGES]
        if bad:
            raise ValueError(
                f"Invalid stage(s): {bad}. Valid stages: {list(GRAPH_STAGES)}"
            )
    selected = set(GRAPH_STAGES if stages is None else stages)

    def report_progress(
        stage: str, pct: float, msg: str, done: int = 0, total: int = 0
    ) -> None:
        if progress is not None:
            progress(StageProgress(stage, pct, msg, done, total))

    if config is not None:
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
        node_cfgs, rel_cfgs, filters = gc.nodes, gc.relationships, gc.filters
    else:
        from ..config.curriculum_schema import FILTERS, NODES, RELATIONSHIPS

        node_cfgs, rel_cfgs, filters = NODES, RELATIONSHIPS, FILTERS

    report = WriteReport(out_dir=out_dir)
    lineage_parts: list[DataFrame] = []
    t_all = time.monotonic()

    def emit(stage: str, df: DataFrame, path: str, key: str, partition_by=None):
        full = os.path.join(out_dir, path)
        if _committed(full):
            report.stages_skipped.append(stage)
            report_progress(stage, 100.0, "checkpoint hit — skipped")
            return spark.read.parquet(full)
        report_progress(stage, 0.0, f"writing {path}")
        t0 = time.monotonic()
        # the row-count metric rides the WRITE job itself (observe),
        # instead of a second count() job per table — with ~19 output
        # tables that post-write job tail is pure scheduling latency
        # (the Amdahl tail the submit ladder measured; BASELINE.md)
        from pyspark.sql import Observation

        obs = Observation(f"emit_{stage}")
        w = (
            df.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
        )
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(full)
        out = spark.read.parquet(full)
        report.stages_run.append(stage)
        n = int(obs.get["n"])
        report.metrics[f"{stage}_rows"] = n
        report.metrics[f"{stage}_sec"] = round(time.monotonic() - t0, 3)
        lineage_parts.append(partition_lineage(out, stage, key))
        report_progress(stage, 100.0, f"wrote {path}", n, n)
        return out

    gb: GraphBuild = build_graph(
        spark,
        docs,
        run_ts=run_ts,
        node_configs=node_cfgs,
        rel_configs=rel_cfgs,
        filters=filters,
    )

    wide_path = os.path.join(out_dir, "wide")
    if "wide" in selected:
        wide = emit("wide", gb.wide, "wide", "doc_id")
    elif _committed(wide_path):
        # later stages read the *checkpointed* wide table — a resumed
        # run never recomputes the reconstruction+join prefix
        wide = spark.read.parquet(wide_path)
    else:
        # stage subset with no wide checkpoint: downstream stages plan
        # over the lazy extraction prefix — nothing extra materializes
        wide = gb.wide
    gb2 = _rebind(spark, gb, wide, run_ts, node_cfgs, rel_cfgs)
    if "triples" in selected:
        emit(
            "triples", gb2.triples, "triples", "subj",
            partition_by="config_key",
        )
    if "resolved" in selected:
        emit(
            "resolved", gb2.resolved, "resolved", "subj",
            partition_by="config_key",
        )
    if "nodes" in selected:
        for label, ndf in gb2.nodes.items():
            emit(f"nodes/{label}", ndf, f"nodes/{label}", "id")

    if "quarantine" in selected:
        # validation side-output: every row a mapping rule dropped,
        # with (rule, reason, source ref) — validators.py:8-67 as a table
        from ..operators.quarantine import quarantine, validation_summary

        q = emit(
            "quarantine",
            quarantine(
                gb2.wide, gb2.triples, node_cfgs, rel_cfgs, gb2.extras["dims"]
            ),
            "quarantine",
            "rule",
            partition_by="rule",
        )
        report.metrics.update(
            validation_summary(q, int(report.metrics.get("wide_rows", 0)))
        )
    if "field_lineage" in selected:
        # rule-level field lineage: which config rule produced which
        # property (pipeline/mappers.py:8-39)
        emit(
            "field_lineage",
            field_lineage(spark, node_cfgs, rel_cfgs),
            "field_lineage",
            "config",
        )

    # metrics + lineage tables (append a fresh snapshot per run)
    report.metrics["total_sec"] = round(time.monotonic() - t_all, 3)
    mrows = [(k, float(v)) for k, v in report.metrics.items()]
    spark.createDataFrame(mrows, "metric string, value double").withColumn(
        "run_ts", F.lit(run_ts)
    ).write.mode("append").parquet(os.path.join(out_dir, "metrics"))
    if lineage_parts:
        lin = lineage_parts[0]
        for lp in lineage_parts[1:]:
            lin = lin.unionByName(lp)
        lin.withColumn("run_ts", F.lit(run_ts)).write.mode("append").parquet(
            os.path.join(out_dir, "lineage")
        )
    gb.unpersist()
    report_progress(
        "complete",
        100.0,
        f"{len(report.stages_run)} stages run, "
        f"{len(report.stages_skipped)} skipped",
    )
    return report


def _rebind(
    spark: SparkSession,
    gb: GraphBuild,
    wide: DataFrame,
    run_ts: str,
    node_cfgs=None,
    rel_cfgs=None,
) -> GraphBuild:
    """Re-derive the extraction plans over the checkpointed wide table."""
    from ..operators import mapper as mapper_op

    if node_cfgs is None or rel_cfgs is None:
        from ..config.curriculum_schema import NODES, RELATIONSHIPS

        node_cfgs = NODES if node_cfgs is None else node_cfgs
        rel_cfgs = RELATIONSHIPS if rel_cfgs is None else rel_cfgs

    triples = mapper_op.extract_triples_fused(wide, rel_cfgs, node_cfgs, run_ts)
    dims = mapper_op.node_dims(wide, node_cfgs, spark)
    resolved = mapper_op.resolve_triples(triples, {}, node_cfgs, dims=dims)
    return GraphBuild(
        wide=wide,
        triples=triples,
        resolved=resolved,
        _node_args=(wide, node_cfgs, run_ts, spark),
        extras={"dims": dims},
    )


# --------------------------------------------------------------------------
# field-level lineage (pipeline/mappers.py:8-39)
# --------------------------------------------------------------------------


def field_lineage(
    spark: SparkSession,
    node_configs: dict[str, Any],
    rel_configs: dict[str, Any],
) -> DataFrame:
    """Which config rule produced which property — the reference's
    DataLineage ``record_field_transformation`` / ``record_id_generation``
    (pipeline/mappers.py:13-39) as a table.

    The reference appends one lineage entry per RECORD, but the entries
    are rule-determined: every record of a mapping yields the same
    (source_field → target_field, transformation) triple. In a
    declarative engine that is config metadata — emit each rule once
    (kind, config, target_field, source_field, transformation) and join
    to partition lineage / quarantine by config key when a per-row audit
    is needed. At 10^12 rows this is the difference between a 50-row
    table and a second copy of the dataset.
    """

    def tf(pcfg: dict[str, Any]) -> str:
        if pcfg.get("hasura_col") == "current_timestamp":
            return "run_timestamp"
        if pcfg.get("synthetic_value") not in (None, ""):
            sv = str(pcfg["synthetic_value"])
            return (
                "id_generation:template" if "{" in sv else "id_generation:static"
            )
        if pcfg.get("computed"):
            return f"computed:{pcfg['computed']}"
        if pcfg.get("expand_list"):
            return f"expand_list:{pcfg.get('type', 'string')}"
        return f"clean_typed:{pcfg.get('type', 'string')}"

    def src(pcfg: dict[str, Any]) -> str | None:
        return pcfg.get("hasura_col") or None

    rows: list[tuple] = []
    for label, cfg in node_configs.items():
        idf = cfg.get("id_field", {})
        rows.append(
            ("node", label, idf.get("property_name", "id"), src(idf), tf(idf))
        )
        for pname, pcfg in cfg.get("properties", {}).items():
            rows.append(("node", label, pname, src(pcfg), tf(pcfg)))
    for key, cfg in rel_configs.items():
        rows.append(
            ("relationship", key, ":START_ID", cfg.get("start_csv_field"),
             "endpoint_resolution")
        )
        rows.append(
            ("relationship", key, ":END_ID", cfg.get("end_csv_field"),
             "endpoint_resolution")
        )
        for pname, pcfg in cfg.get("properties", {}).items():
            rows.append(("relationship", key, pname, src(pcfg), tf(pcfg)))
    return spark.createDataFrame(
        rows,
        "kind string, config string, target_field string, "
        "source_field string, transformation string",
    )


# --------------------------------------------------------------------------
# keyed MERGE upsert (auradb_loader.py:170-189 nodes, :295-310 rels)
# --------------------------------------------------------------------------

_MERGE_META = "_merge_meta.json"


def merge_into(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: str | list[str],
    n_buckets: int = 64,
    max_records_per_file: int = 1_000_000,
) -> dict[str, Any]:
    """Idempotent keyed MERGE into a bucket-partitioned parquet table —
    the reference's Neo4j upsert semantics re-expressed as a columnar
    merge (``MERGE (n {id: …}) SET n += {…}``, auradb_loader.py:170-189;
    ``MERGE (start)-[r]->(end) SET r +=``, :295-310; Iceberg
    ``MERGE INTO`` in production):

    * key match → UPDATE, where a NULL incoming property preserves the
      existing value (the reference drops NaN fields from the batch
      record, so ``SET n +=`` never nulls a property; here that is
      per-column ``coalesce(update, existing)``);
    * no match → INSERT;
    * existing rows never duplicate — re-running the same merge is a
      no-op on content.

    Scale contract: the table is hash-bucketed on the key
    (``pmod(xxhash64(keys), n_buckets)``, pinned at table creation in a
    ``_merge_meta.json`` sidecar). A merge only reads and rewrites the
    buckets its update keys hash into — dynamic partition overwrite
    leaves every untouched bucket's files exactly as they are, the
    parquet analogue of an Iceberg MERGE snapshot commit. The only
    driver-side collect is the touched-bucket id list (≤ n_buckets
    ints, never data-proportional).
    """
    import json as _json

    key_list = [keys] if isinstance(keys, str) else list(keys)
    data_cols = [c for c in updates.columns if c not in key_list]
    bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in key_list]), F.lit(n_buckets)
    ).cast("int")
    # Eagerly pin the update set: the touched-bucket collect and the
    # merge join must see identical rows — a nondeterministic source
    # (limit/sample) re-evaluated differently would let dynamic
    # partition overwrite replace an un-read bucket with drifted rows.
    upd = (
        updates.dropDuplicates(key_list)
        .withColumn("_bucket", bucket)
        .localCheckpoint(eager=True)
    )

    meta_path = os.path.join(path, _MERGE_META)
    if not _committed(path):
        (
            upd.write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy("_bucket")
            .parquet(path)
        )
        with open(meta_path, "w") as f:
            _json.dump({"keys": key_list, "n_buckets": n_buckets}, f)
        return {"created": True, "buckets_rewritten": None}

    with open(meta_path) as f:
        meta = _json.load(f)
    if meta["keys"] != key_list or meta["n_buckets"] != n_buckets:
        raise ValueError(
            f"merge_into({path}): table was created with keys="
            f"{meta['keys']}, n_buckets={meta['n_buckets']} — merge keys "
            f"and bucket count are pinned at creation"
        )

    touched = sorted(
        r["_bucket"] for r in upd.select("_bucket").distinct().collect()
    )
    tgt = spark.read.parquet(path).filter(F.col("_bucket").isin(touched))
    u2 = upd.select(
        *key_list,
        *[F.col(c).alias(f"__u_{c}") for c in data_cols],
        F.col("_bucket").alias("__u_bucket"),
    )
    merged = tgt.join(u2, on=key_list, how="full_outer").select(
        *key_list,
        *[
            F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c)
            for c in data_cols
        ],
        F.coalesce(F.col("__u_bucket"), F.col("_bucket")).alias("_bucket"),
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("_bucket")
        .parquet(path)
    )
    return {"created": False, "buckets_rewritten": len(touched)}


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a merge table without its physical bucket column."""
    return spark.read.parquet(path).drop("_bucket")


def read_graph(spark: SparkSession, out_dir: str) -> dict[str, Any]:
    """Load a materialized graph: nodes per label + edge tables."""
    nodes_dir = os.path.join(out_dir, "nodes")
    nodes = {
        label: spark.read.parquet(os.path.join(nodes_dir, label))
        for label in sorted(os.listdir(nodes_dir))
    }
    out = {
        "nodes": nodes,
        "triples": spark.read.parquet(os.path.join(out_dir, "triples")),
        "resolved": spark.read.parquet(os.path.join(out_dir, "resolved")),
        "metrics": spark.read.parquet(os.path.join(out_dir, "metrics")),
        "lineage": spark.read.parquet(os.path.join(out_dir, "lineage")),
    }
    for opt in ("quarantine", "field_lineage"):
        p = os.path.join(out_dir, opt)
        if _committed(p):
            out[opt] = spark.read.parquet(p)
    return out
