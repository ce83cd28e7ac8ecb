"""Invariants of the corpus-prep pipeline (plans/corpus_prep.py):

* PARTITION: every input document lands in exactly one of kept/dropped
  — nothing is silently discarded, nothing is double-attributed.
* ACCOUNTING: the stats table's doc counts sum to the input count and
  agree with the kept/dropped tables.
* PACKING: within each (lang, bin), the token sum stays under the
  budget plus one document (the classic next-fit bound), and bins are
  contiguous from 0.
* DETERMINISM: a shuffled/repartitioned input yields the identical
  kept set and stage attribution.
"""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.plans.corpus_prep import (
    STAGES,
    prepare_corpus,
)

_BUDGET = 512


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_partition_and_accounting(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    prep = prepare_corpus(spark, docs, pack_budget=_BUDGET)
    try:
        n_in = docs.count()
        kept_ids = {r["doc_id"] for r in prep.kept.select("doc_id").collect()}
        dropped = prep.dropped.collect()
        dropped_ids = {r["doc_id"] for r in dropped}
        assert kept_ids.isdisjoint(dropped_ids)
        assert len(kept_ids) + len(dropped_ids) == n_in
        assert {r["stage"] for r in dropped} <= set(STAGES)
        stats = {r["stage"]: r["n_docs"] for r in prep.stats.collect()}
        assert sum(stats.values()) == n_in
        assert stats.get("kept", 0) == len(kept_ids)
    finally:
        prep.unpersist()


def test_packing_bound(spark, sf_dir):
    prep = prepare_corpus(spark, _docs(spark, sf_dir), pack_budget=_BUDGET)
    try:
        per_bin = (
            prep.kept.groupBy("lang", "bin")
            .agg(F.sum("tok_n").alias("toks"), F.max("tok_n").alias("mx"))
            .collect()
        )
        assert per_bin
        for r in per_bin:
            # next-fit: a bin only overflows by the doc that crossed it
            assert r["toks"] <= _BUDGET + r["mx"]
        for lang_bins in {r["lang"] for r in per_bin}:
            bins = sorted(r["bin"] for r in per_bin if r["lang"] == lang_bins)
            assert bins == list(range(len(bins)))
    finally:
        prep.unpersist()


def test_write_corpus_resumes_from_committed(spark, sf_dir, tmp_path):
    from oak_knowledge_graph_neo4j_auradb_spark.plans.corpus_prep import (
        write_corpus,
    )

    out = str(tmp_path / "corpus")
    docs = _docs(spark, sf_dir)
    r1 = write_corpus(spark, docs, out, pack_budget=_BUDGET)
    assert set(r1.stages_run) == {"kept", "dropped", "stats", "lineage"}
    kept1 = sorted(map(tuple, spark.read.parquet(f"{out}/kept").collect()))
    # second run: every stage is already committed — nothing recomputes
    r2 = write_corpus(spark, docs, out, pack_budget=_BUDGET)
    assert r2.stages_run == []
    assert set(r2.stages_skipped) == {"kept", "dropped", "stats", "lineage"}
    kept2 = sorted(map(tuple, spark.read.parquet(f"{out}/kept").collect()))
    assert kept1 == kept2
    # stats on disk agree with the live plan
    disk = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in spark.read.parquet(f"{out}/stats").collect()
    }
    assert disk["kept"][0] == len(kept1)


def test_deterministic_under_repartition(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = prepare_corpus(spark, docs, pack_budget=_BUDGET)
    b = prepare_corpus(
        spark, docs.repartition(13, "lang"), pack_budget=_BUDGET
    )
    try:
        rows_a = sorted(map(tuple, a.kept.collect()))
        rows_b = sorted(map(tuple, b.kept.collect()))
        assert rows_a == rows_b
        drop_a = sorted(map(tuple, a.dropped.collect()))
        drop_b = sorted(map(tuple, b.dropped.collect()))
        assert drop_a == drop_b
    finally:
        a.unpersist()
        b.unpersist()
