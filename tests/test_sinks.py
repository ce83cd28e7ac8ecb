"""Checkpoint-resumable materialization + lineage/metrics tables
(plans/sinks.py; north_rule resumability requirement)."""

import shutil

import pytest

from oak_knowledge_graph_neo4j_auradb_spark.plans.sinks import (
    read_graph,
    write_graph,
)
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import ensure_documents

N_DOCS = 200


@pytest.fixture(scope="module")
def out(spark, tmp_path_factory):
    docs = spark.read.parquet(
        ensure_documents(str(tmp_path_factory.mktemp("docs")), N_DOCS)
    )
    out_dir = str(tmp_path_factory.mktemp("graph"))
    report = write_graph(spark, docs, out_dir)
    return docs, out_dir, report


def test_first_run_writes_everything(out):
    _, _, report = out
    assert "wide" in report.stages_run
    assert "resolved" in report.stages_run
    assert any(s.startswith("nodes/") for s in report.stages_run)
    assert report.stages_skipped == []
    assert report.metrics["resolved_rows"] > 0


def test_read_back_graph(spark, out):
    _, out_dir, report = out
    g = read_graph(spark, out_dir)
    assert set(g["nodes"]) >= {"Lesson", "Unit", "Thread", "Schemaversion"}
    assert g["resolved"].count() == report.metrics["resolved_rows"]
    preds = {r["pred"] for r in g["resolved"].select("pred").distinct().collect()}
    assert "HAS_LESSON" in preds
    # lineage covers every written stage with per-partition key ranges
    lin = {r["stage"] for r in g["lineage"].select("stage").distinct().collect()}
    assert {"wide", "triples", "resolved"} <= lin
    row = g["lineage"].filter("stage = 'wide'").first()
    assert row["n_rows"] > 0 and row["min_key"] <= row["max_key"]


def test_resume_skips_committed_stages(spark, out):
    docs, out_dir, _ = out
    report2 = write_graph(spark, docs, out_dir)
    assert report2.stages_run == []
    assert "wide" in report2.stages_skipped
    assert "resolved" in report2.stages_skipped


def test_resume_recomputes_only_missing_stage(spark, out):
    docs, out_dir, first = out
    shutil.rmtree(f"{out_dir}/resolved")
    report3 = write_graph(spark, docs, out_dir)
    assert report3.stages_run == ["resolved"]
    assert "wide" in report3.stages_skipped
    g = read_graph(spark, out_dir)
    assert g["resolved"].count() == first.metrics["resolved_rows"]


def test_config_routed_write_matches_default(spark, out, tmp_path):
    """write_graph(config=<reference-dialect JSON>) — one JSON drives
    extraction AND materialization; result identical to the built-in
    schema it round-trips."""
    import json

    from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
        FILTERS,
        JOIN_STRATEGY,
        NODES,
        RELATIONSHIPS,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.config.manager import (
        export_reference_dialect,
    )

    docs, _, first = out
    cfg_path = str(tmp_path / "schema.json")
    with open(cfg_path, "w") as f:
        json.dump(
            export_reference_dialect(NODES, RELATIONSHIPS, JOIN_STRATEGY, FILTERS),
            f,
        )
    out2 = str(tmp_path / "graph_cfg")
    report = write_graph(spark, docs, out2, config=cfg_path)
    assert report.metrics["resolved_rows"] == first.metrics["resolved_rows"]
    assert report.metrics["triples_rows"] == first.metrics["triples_rows"]


def test_partial_stages_and_progress(spark, out, tmp_path):
    """Stage-subset runs with the progress-callback protocol
    (reference pipeline/pipeline.py:502-544 run_partial_pipeline,
    :26-41 PipelineProgress): each stage reports 0% then 100% in
    order, subsets write only what they name, a later full run
    resumes past them, and unknown stage names raise."""
    import os

    import pytest as _pytest

    docs, _, first = out
    events = []
    out_dir = str(tmp_path / "partial")
    r1 = write_graph(
        spark, docs, out_dir, stages=["wide"], progress=events.append
    )
    assert r1.stages_run == ["wide"]
    assert [(e.stage, e.progress_percent) for e in events] == [
        ("wide", 0.0),
        ("wide", 100.0),
        ("complete", 100.0),
    ]
    assert events[1].records_processed == first.metrics["wide_rows"]

    # downstream-only subset reads the committed wide checkpoint
    events.clear()
    r2 = write_graph(
        spark, docs, out_dir, stages=["resolved"], progress=events.append
    )
    assert r2.stages_run == ["resolved"] and r2.stages_skipped == []
    assert [e.stage for e in events] == ["resolved", "resolved", "complete"]
    assert os.path.exists(f"{out_dir}/resolved/_SUCCESS")
    assert not os.path.exists(f"{out_dir}/triples")

    # a later FULL run resumes: the subset-written stages skip (and
    # report 100% "skipped" progress), the rest run
    events.clear()
    r3 = write_graph(spark, docs, out_dir, progress=events.append)
    assert "wide" in r3.stages_skipped and "resolved" in r3.stages_skipped
    assert "triples" in r3.stages_run
    skipped = {e.stage for e in events if "skipped" in e.message}
    assert {"wide", "resolved"} <= skipped

    with _pytest.raises(ValueError, match="Invalid stage"):
        write_graph(spark, docs, out_dir, stages=["extract"])


def test_stage_subset_without_upstream_checkpoint(spark, out, tmp_path):
    """A selected stage never needs its upstream materialized: on a
    fresh directory, stages=["resolved"] plans the extraction prefix
    lazily and writes ONLY the resolved table — same rows as a full
    run's."""
    import os

    docs, _, first = out
    out_dir = str(tmp_path / "lazy")
    r = write_graph(spark, docs, out_dir, stages=["resolved"])
    assert r.stages_run == ["resolved"]
    assert not os.path.exists(f"{out_dir}/wide")
    got = spark.read.parquet(f"{out_dir}/resolved").count()
    assert got == first.metrics["resolved_rows"]
