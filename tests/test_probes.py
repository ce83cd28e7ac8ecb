"""Degenerate-input probes for the KG pipeline (the behaviors the
engine's own docs promise):

* empty documents table → the static Schemaversion node still appears
  (it's config-synthesized, not data-derived); every data-derived node
  table and the triple stream are empty;
* primary-only corpus (no ``sup-*`` docs) → Thread nodes and HAS_THREAD
  edges vanish (threads live only on the supplementary join side) and
  NOTHING else changes — the supplementary merge is a left join, so
  dropping its right side must not perturb any other label or edge type.
"""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import build_graph
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import ensure_documents


def _docs(spark, tmp_path, n):
    return spark.read.parquet(ensure_documents(str(tmp_path), n))


def test_empty_documents(spark, tmp_path):
    gb = build_graph(spark, _docs(spark, tmp_path, 200).limit(0))
    assert gb.nodes["Schemaversion"].count() == 1
    assert gb.triples.count() == 0
    assert gb.resolved.count() == 0
    for label, df in gb.nodes.items():
        if label != "Schemaversion":
            assert df.count() == 0, label


def test_primary_only_corpus(spark, tmp_path):
    full = _docs(spark, tmp_path, 300)
    prim = full.filter(F.col("doc_id").startswith("doc-"))
    gb_full = build_graph(spark, full)
    gb_prim = build_graph(spark, prim)

    assert gb_full.nodes["Thread"].count() > 0
    assert gb_prim.nodes["Thread"].count() == 0

    def preds(gb):
        return {
            r["pred"]
            for r in gb.resolved.select("pred").distinct().collect()
        }

    assert preds(gb_full) - preds(gb_prim) == {"HAS_THREAD"}

    for label in gb_full.nodes:
        if label == "Thread":
            continue
        assert gb_prim.nodes[label].count() == gb_full.nodes[label].count(), label

    per_pred_full = {
        (r["pred"], r["n"])
        for r in gb_full.resolved.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["pred"] != "HAS_THREAD"
    }
    per_pred_prim = {
        (r["pred"], r["n"])
        for r in gb_prim.resolved.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_pred_full == per_pred_prim
