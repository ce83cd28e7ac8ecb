"""MERGE-upsert sink (auradb_loader MERGE semantics) and validation
quarantine side-output (validators.py semantics)."""

import os

import pytest
from pyspark.sql import functions as F

from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import build_graph
from oak_knowledge_graph_neo4j_auradb_spark.plans.sinks import (
    merge_into,
    read_merged,
    write_graph,
)
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import ensure_documents

N_DOCS = 200


# -- merge_into -------------------------------------------------------------


@pytest.fixture
def tbl(tmp_path):
    return str(tmp_path / "tbl")


def test_merge_second_run_updates_not_duplicates(spark, tbl):
    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    r1 = merge_into(spark, tbl, df1, "id", n_buckets=8)
    assert r1["created"]
    df2 = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "id long, name string, v long"
    )
    r2 = merge_into(spark, tbl, df2, "id", n_buckets=8)
    assert not r2["created"] and r2["buckets_rewritten"] <= 2
    rows = [tuple(r) for r in read_merged(spark, tbl).orderBy("id").collect()]
    assert rows == [(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)]


def test_merge_null_update_preserves_existing(spark, tbl):
    """SET n += drops NaN-valued keys from the batch record
    (auradb_loader.py:205-216) — a NULL incoming property must not
    clobber the stored value."""
    merge_into(
        spark,
        tbl,
        spark.createDataFrame([(1, "keep", 10)], "id long, name string, v long"),
        "id",
    )
    merge_into(
        spark,
        tbl,
        spark.createDataFrame([(1, None, 99)], "id long, name string, v long"),
        "id",
    )
    rows = [tuple(r) for r in read_merged(spark, tbl).collect()]
    assert rows == [(1, "keep", 99)]


def test_merge_idempotent(spark, tbl):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    merge_into(spark, tbl, df, "id")
    merge_into(spark, tbl, df, "id")
    merge_into(spark, tbl, df, "id")
    assert read_merged(spark, tbl).count() == 2


def test_merge_composite_key(spark, tbl):
    """Relationship upsert: MERGE on (start, type, end) — the rel
    MERGE key (auradb_loader.py:295-310)."""
    t1 = spark.createDataFrame(
        [("a", "HAS", "b", 1), ("a", "HAS", "c", 1)],
        "subj string, pred string, obj string, w long",
    )
    merge_into(spark, tbl, t1, ["subj", "pred", "obj"])
    t2 = spark.createDataFrame(
        [("a", "HAS", "b", 7)], "subj string, pred string, obj string, w long"
    )
    merge_into(spark, tbl, t2, ["subj", "pred", "obj"])
    got = {
        (r["subj"], r["pred"], r["obj"]): r["w"]
        for r in read_merged(spark, tbl).collect()
    }
    assert got == {("a", "HAS", "b"): 7, ("a", "HAS", "c"): 1}


def test_merge_pinned_contract(spark, tbl):
    merge_into(spark, tbl, spark.createDataFrame([(1, "a")], "id long, x string"),
               "id", n_buckets=8)
    with pytest.raises(ValueError, match="pinned"):
        merge_into(
            spark, tbl, spark.createDataFrame([(1, "a")], "id long, x string"),
            "id", n_buckets=16,
        )


# -- quarantine -------------------------------------------------------------


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = spark.read.parquet(
        ensure_documents(str(tmp_path_factory.mktemp("docs")), N_DOCS)
    )
    gb = build_graph(spark, docs)
    yield gb
    gb.unpersist()


def test_triples_equal_resolved_plus_dangling(spark, built):
    """The quarantine dangling rule is the exact complement of
    resolution — no triple is silently lost."""
    from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
        NODES,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.operators.quarantine import (
        dangling_quarantine,
    )

    n_raw = built.triples.count()
    n_res = built.resolved.count()
    n_dang = dangling_quarantine(
        built.triples, NODES, built.extras["dims"]
    ).count()
    assert n_raw == n_res + n_dang
    assert n_dang > 0  # docgen plants dangling 'nan' endpoints


def test_quarantine_rules_and_golden_unchanged(spark, built):
    from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
        NODES,
        RELATIONSHIPS,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.operators.quarantine import (
        quarantine,
    )

    q = quarantine(
        built.wide, built.triples, NODES, RELATIONSHIPS, built.extras["dims"]
    )
    rules = {r["rule"] for r in q.select("rule").distinct().collect()}
    assert "dangling_endpoint" in rules
    # every row carries rule, reason and a source ref
    assert (
        q.filter(
            F.col("rule").isNull()
            | F.col("reason").isNull()
            | F.col("source_ref").isNull()
        ).count()
        == 0
    )
    # quarantining is observation only: the resolved triple stream is
    # unchanged by computing it (same plan as the golden-tested build)
    assert built.resolved.count() > 0


def test_write_graph_emits_quarantine(spark, tmp_path_factory):
    docs = spark.read.parquet(
        ensure_documents(str(tmp_path_factory.mktemp("docs2")), 100)
    )
    out_dir = str(tmp_path_factory.mktemp("graph2"))
    report = write_graph(spark, docs, out_dir)
    assert os.path.exists(os.path.join(out_dir, "quarantine", "_SUCCESS"))
    # per-record accounting: invalid ≤ total, and non-negative valid
    m = report.metrics
    assert 0 < m["invalid_records"] <= m["total_records"]
    assert m["valid_records"] == m["total_records"] - m["invalid_records"]
    assert m["error_count"] >= m["invalid_records"]
    assert any(k.startswith("rule_") for k in m)
    q = spark.read.parquet(os.path.join(out_dir, "quarantine"))
    assert q.filter(F.col("rule") == "dangling_endpoint").count() > 0


def test_field_lineage_table(spark):
    """Every configured property has exactly one lineage rule row, with
    id generations and endpoint resolutions marked (mappers.py:13-39)."""
    from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
        NODES,
        RELATIONSHIPS,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.plans.sinks import field_lineage

    fl = field_lineage(spark, NODES, RELATIONSHIPS).collect()
    by = {(r["kind"], r["config"], r["target_field"]): r for r in fl}
    # one row per node property + id, per rel property + both endpoints
    n_expected = sum(1 + len(c["properties"]) for c in NODES.values()) + sum(
        2 + len(c["properties"]) for c in RELATIONSHIPS.values()
    )
    assert len(fl) == n_expected == len(by)
    assert by[("node", "Subject", "subjectTitle")]["source_field"] == (
        "programme_subject"
    )
    assert by[("node", "Subject", "subjectTitle")]["transformation"] == (
        "clean_typed:string"
    )
    assert by[("node", "Unitoffering", "unitOfferingSlug")][
        "transformation"
    ].startswith("id_generation:")
    assert by[("relationship", "unitvariant_has_lesson", ":START_ID")][
        "transformation"
    ] == "endpoint_resolution"


def test_merge_property_random_sequences(spark, tmp_path):
    """Property: any sequence of merges equals the dict-model fold
    (key -> row; per-column non-null update wins, null preserves)."""
    import random

    rng = random.Random(7)
    tbl = str(tmp_path / "prop_tbl")
    model: dict[int, dict] = {}
    for step in range(4):
        n = rng.randint(1, 8)
        batch = []
        for _ in range(n):
            k = rng.randint(0, 9)
            name = rng.choice([None, f"n{rng.randint(0, 99)}"])
            v = rng.choice([None, rng.randint(0, 999)])
            batch.append((k, name, v))
        # model fold: batch is deduped per key (arbitrary winner is fine
        # for the test — make batches key-unique to stay deterministic)
        uniq = {}
        for k, name, v in batch:
            uniq[k] = (k, name, v)
        for k, (_, name, v) in uniq.items():
            cur = model.get(k, {"name": None, "v": None})
            model[k] = {
                "name": name if name is not None else cur["name"],
                "v": v if v is not None else cur["v"],
            }
        df = spark.createDataFrame(
            list(uniq.values()), "id long, name string, v long"
        )
        from oak_knowledge_graph_neo4j_auradb_spark.plans.sinks import (
            merge_into,
            read_merged,
        )

        merge_into(spark, tbl, df, "id", n_buckets=4)
        got = {
            r["id"]: {"name": r["name"], "v": r["v"]}
            for r in read_merged(spark, tbl).collect()
        }
        assert got == model, f"step {step}: {got} != {model}"
