"""Neo4j bulk-import CSV export: reference header conventions, 10K-row
splitting, quote-all cells, import command string
(plans/neo4j_export.py; reference schema_mapper.py:236-246,373-385 and
pipeline/loaders.py:12-59)."""

import csv
import os
import tempfile

import pytest

from oak_knowledge_graph_neo4j_auradb_spark.plans.neo4j_export import (
    export_neo4j_csvs,
)
from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import build_graph
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
    ensure_documents,
)


@pytest.fixture(scope="module")
def export(spark, tmp_path_factory):
    docs = spark.read.parquet(
        ensure_documents(str(tmp_path_factory.mktemp("docs")), 500)
    )
    gb = build_graph(spark, docs)
    out = str(tmp_path_factory.mktemp("neo4j"))
    ex = export_neo4j_csvs(gb, out)
    return gb, ex


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.reader(f))


def _first_part(d):
    return sorted(
        os.path.join(d, n) for n in os.listdir(d) if n.endswith(".csv")
    )[0]


def test_all_labels_and_rels_exported(export):
    gb, ex = export
    assert set(ex.node_dirs) == set(gb.nodes)
    assert len(ex.rel_dirs) == 12  # one per relationship config


def test_node_header_convention(export):
    _, ex = export
    rows = _read_csv(_first_part(ex.node_dirs["Unit"]))
    header = rows[0]
    assert header[0] == "unitSlug:ID(Unit)"
    assert "unitTitle:string" in header
    assert "priorKnowledge:list" in header
    assert "lastUpdated:datetime" in header


def test_relationship_header_convention(export):
    _, ex = export
    d = ex.rel_dirs["unitvariant_has_lesson"]
    rows = _read_csv(_first_part(d))
    header = rows[0]
    assert header[0] == ":START_ID(Unitvariant)"
    assert header[1] == ":END_ID(Lesson)"
    assert header[2] == ":TYPE"
    assert all(r[2] == "HAS_LESSON" for r in rows[1:])


def test_row_counts_match_graph(export, spark):
    gb, ex = export
    for label in ("Unit", "Lesson", "Subject"):
        n_csv = sum(
            len(_read_csv(p)) - 1
            for p in (
                os.path.join(d, f)
                for d in [ex.node_dirs[label]]
                for f in os.listdir(d)
                if f.endswith(".csv")
            )
        )
        assert n_csv == gb.nodes[label].count()


def test_quote_all_cells(export):
    """The reference passes quoting=1 (csv.QUOTE_ALL) — every non-empty
    cell must be quoted in the raw bytes."""
    _, ex = export
    path = _first_part(ex.node_dirs["Subject"])
    with open(path) as f:
        f.readline()  # header
        line = f.readline().strip()
    assert line.startswith('"')


def test_file_splitting(spark, tmp_path):
    docs = spark.read.parquet(
        ensure_documents(str(tmp_path / "docs"), 3000)
    )
    gb = build_graph(spark, docs)
    ex = export_neo4j_csvs(
        gb, str(tmp_path / "out"), max_records_per_file=500
    )
    d = ex.node_dirs["Lesson"]
    parts = [n for n in os.listdir(d) if n.endswith(".csv")]
    n_lessons = gb.nodes["Lesson"].count()
    assert len(parts) >= n_lessons // 500, (
        f"{n_lessons} lessons should split into >= {n_lessons // 500} files"
    )
    for p in parts:
        assert len(_read_csv(os.path.join(d, p))) - 1 <= 500


def test_import_command(export):
    _, ex = export
    cmd = ex.import_command()
    assert cmd.startswith("neo4j-admin database import full --database neo4j")
    assert "--nodes" in cmd and "--relationships" in cmd
    assert '--array-delimiter ; --quote "' in cmd
    assert "--multiline-fields true" in cmd
    # one --nodes flag per part file of every label
    assert cmd.count("--nodes") == sum(
        len([n for n in os.listdir(d) if n.endswith(".csv")])
        for d in ex.node_dirs.values()
    )


def test_roundtrip_spark_read(export, spark):
    gb, ex = export
    back = (
        spark.read.option("header", True)
        .option("escape", '"')
        .csv(ex.node_dirs["Lesson"])
    )
    assert back.count() == gb.nodes["Lesson"].count()
    assert back.columns[0] == "lessonSlug:ID(Lesson)"
