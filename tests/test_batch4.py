"""Invariants for the batch-4 operators (SemDedup, bucketed range join,
stream-stream join, bipartite projection) beyond the DuckDB value-hash
oracle: plan-shape-independent equivalences and structural properties.
"""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
    _RJ_SEC,
    q100_range_join,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg72_bipartite_projection,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    _SD_TAU,
    _vec,
    cosine,
    q98_semdedup,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.streamq import (
    q102_stream_stream_join,
)


def test_range_join_bucketing_equals_naive(spark, sf_dir):
    """The two-bucket probe explode is lossless: the bucketed plan's
    result must equal the naive equi-join + range post-filter."""
    got = q100_range_join(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("ets")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), "value"
    )
    naive = (
        err.join(clk, err.user_id == F.col("cu"))
        .filter(
            (F.col("cts") >= F.col("ets") - F.expr(f"INTERVAL {_RJ_SEC} SECONDS"))
            & (F.col("cts") < F.col("ets"))
        )
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("s"),
        )
    )
    naive_full = err.join(naive, on="event_id", how="left").select(
        "event_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_prior_clicks"),
        F.col("s").alias("sum_click_value"),
    )
    diff = got.select(
        "event_id", "n_prior_clicks", "sum_click_value"
    ).exceptAll(naive_full)
    assert diff.count() == 0
    assert got.count() == err.count()  # zero-click errors preserved


def test_semdedup_kept_pairs_below_tau(spark, sf_dir):
    """After the drop rule, no two KEPT vectors in the same cluster may
    exceed τ — the defining property of SemDedup's greedy keep-lowest.
    Re-derive the kept set and check all kept-kept pairs."""
    res = q98_semdedup(spark, sf_dir)
    n_drop = res.agg(F.sum("n_dropped")).collect()[0][0]
    assert n_drop and n_drop > 0  # the threshold actually bites here

    # Reconstruct assignment + dropped set exactly as the query does
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
        _SD_K,
        _sqdist,
    )
    from pyspark.sql import Window

    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    cent = e.filter(F.col("vec_id") < _SD_K).select(
        F.col("vec_id").cast("int").alias("c"), F.col("v").alias("cv")
    )
    d2 = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "c", _sqdist(F.col("v"), F.col("cv")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("c").asc())
    a = (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "c")
    )
    l = a.select("c", F.col("vec_id").alias("id1"), F.col("v").alias("v1"))
    r = a.select("c", F.col("vec_id").alias("id2"), F.col("v").alias("v2"))
    pairs = (
        l.join(r, on="c")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("sim", cosine(F.col("v1"), F.col("v2")))
    )
    dropped = (
        pairs.filter(F.col("sim") > _SD_TAU).select("id2").distinct()
    )
    kept_violations = (
        pairs.filter(F.col("sim") > _SD_TAU)
        .join(dropped.withColumnRenamed("id2", "id1"), on="id1", how="left_anti")
        .join(dropped, on="id2", how="left_anti")
    )
    assert kept_violations.count() == 0


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Drained availableNow stream-stream inner join == the batch range
    join over the same static input (watermarks must only bound state,
    never drop inner-join rows on a drained run)."""
    got = q102_stream_stream_join(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("cts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("eu"),
        F.col("ts").cast("timestamp").alias("ets"),
    )
    batch = (
        c.join(
            e,
            (c.user_id == F.col("eu"))
            & (F.col("ets") > F.col("cts"))
            & (F.col("ets") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            "click_id",
            "error_id",
            (F.col("ets").cast("long") - F.col("cts").cast("long")).alias(
                "gap_sec"
            ),
        )
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_bipartite_projection_wedge_count(spark, sf_dir):
    """Σ_pairs n_shared_threads must equal Σ_threads C(deg, 2) — the
    projection is exactly the wedge count of the bipartite incidence."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide

    proj = kg72_bipartite_projection(spark, sf_dir)
    total_pairs = proj.agg(F.sum("n_shared_threads")).collect()[0][0] or 0
    gb = _wide(spark, sf_dir)
    ut = (
        gb.resolved.filter(F.col("pred") == "HAS_THREAD")
        .select("subj", "obj")
        .distinct()
    )
    wedges = (
        ut.groupBy("obj")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
        .collect()[0]["w"]
        or 0
    )
    assert total_pairs == int(wedges)
