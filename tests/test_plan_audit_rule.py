"""The plan-audit raw-global-window rule (VERDICT r2 item 2).

``count_raw_global_windows`` must go RED on a deliberate regression — a
single-partition window (no partitionBy) directly over a raw table scan,
the class Spark merely warns about but which serializes the whole corpus
through one task at 100 TB — and stay GREEN on the five queries whose
scale paths replaced exactly that pattern in round 3 (q136, q166, q172,
q186, q207), plus the sanctioned shape (a global window over an
aggregated intermediate such as a value histogram).
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.plan_audit import count_raw_global_windows


def test_detector_flags_raw_global_window(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = d.withColumn("r", F.row_number().over(Window.orderBy("doc_id")))
    assert count_raw_global_windows(bad) >= 1

    # lead() over the raw scan — q186's pre-fix shape — is also flagged
    bad2 = d.withColumn("n", F.lead("doc_id").over(Window.orderBy("doc_id")))
    assert count_raw_global_windows(bad2) >= 1


def test_detector_allows_window_over_aggregate(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = d.groupBy("n_chars").count()
    ok = hist.withColumn(
        "cum",
        F.sum("count").over(
            Window.orderBy("n_chars").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    assert count_raw_global_windows(ok) == 0

    # ... and over a limit (top-k intermediates)
    ok2 = d.orderBy("doc_id").limit(10).withColumn(
        "r", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert count_raw_global_windows(ok2) == 0


@pytest.mark.parametrize(
    "name",
    [
        "q136_weighted_sample",
        "q166_quantile_normalize",
        "q172_rfm_scores",
        "q186_sorted_neighborhood",
        "q207_decile_lift",
    ],
)
def test_fixed_five_have_no_raw_global_window(spark, name):
    from oak_knowledge_graph_neo4j_auradb_spark.queries import QUERIES

    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert count_raw_global_windows(df) == 0


def test_detector_flags_raw_entity_keyed_aggregate(spark, sf_dir):
    """VERDICT r3 tightening: a groupBy(doc_id) aggregate retains corpus
    cardinality, so a global window above it must STILL be flagged —
    the aggregate alone is not evidence of boundedness."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_doc = d.groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    bad = per_doc.withColumn("r", F.row_number().over(Window.orderBy("s")))
    assert count_raw_global_windows(bad) >= 1

    # but a second, genuinely-reducing aggregate above it covers again
    hist = per_doc.groupBy("s").count()
    ok = hist.withColumn(
        "cum",
        F.sum("count").over(
            Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert count_raw_global_windows(ok) == 0


def test_every_query_is_audited_or_exempt():
    """Coverage pin: every registered batch query must carry a plan-
    audit budget (AUDIT) or a documented exemption (UNAUDITABLE) — so a
    new operator cannot land without its physical-plan invariants being
    ratcheted. And no stale entries: everything listed must exist."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries import QUERIES
    from tools.plan_audit import AUDIT, UNAUDITABLE

    listed = {name for name, _, _ in AUDIT}
    dupes = [n for n in listed if sum(1 for m, _, _ in AUDIT if m == n) > 1]
    assert not dupes, f"duplicate AUDIT entries: {dupes}"
    missing = sorted(set(QUERIES) - listed - UNAUDITABLE)
    assert not missing, f"queries without audit coverage: {missing}"
    stale = sorted((listed | UNAUDITABLE) - set(QUERIES))
    assert not stale, f"audit entries for unknown queries: {stale}"
