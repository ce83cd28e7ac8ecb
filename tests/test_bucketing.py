"""Bucketed co-located joins — the shuffle-elimination technique for
repeated large-large joins at 100 TB: write both sides bucketed by the
join key, and every subsequent join on that key runs with ZERO
exchanges (sort-merge over pre-bucketed files). This pins the plan
property, not just the result: the bucketed join's physical plan must
contain no Exchange operator, while the plain-parquet control join
must contain at least one."""

import re

import pyspark.sql.functions as F


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange\b", plan))


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_od")
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("b_li")
        )
        (
            od.withColumnRenamed("o_orderkey", "l_orderkey")
            .write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("b_od")
        )
        joined = spark.table("b_li").join(spark.table("b_od"), "l_orderkey")
        control = li.join(
            od.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        )
        n_b = joined.count()
        n_c = control.count()
        assert n_b == n_c and n_b > 0
        assert _exchanges(joined) == 0, "bucketed join must not shuffle"
        assert _exchanges(control) >= 1, "control join should shuffle"
        # co-located aggregation on the bucket key is also exchange-free
        agg = spark.table("b_li").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        assert _exchanges(agg) == 0, "bucketed groupBy must not shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_od")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
