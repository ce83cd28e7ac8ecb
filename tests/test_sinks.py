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
