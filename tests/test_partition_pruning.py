"""Partition pruning — the scan-elimination techniques that matter at
100 TB, pinned as PLAN properties (not just results):

* STATIC pruning: a literal predicate on the partition column must
  reach the scan as a PartitionFilter, so only matching directories
  are listed/read.
* DYNAMIC partition pruning (DPP): a join against a FILTERED dimension
  must inject a runtime subquery filter into the fact scan's partition
  filters — the fact table never reads partitions the dim filter
  excludes, even though the partition set is only known at runtime.
  This is the mechanism that turns "join a year of logs to this week's
  dim slice" from a full scan into a 7-partition read.
"""

import pyspark.sql.functions as F


def _write_partitioned_events(spark, sf_dir, path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.floor(F.col("ts").cast("timestamp_ltz").cast("long") / 86400)
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    return spark.read.parquet(path)


def test_static_partition_pruning(spark, sf_dir, tmp_path):
    fact = _write_partitioned_events(spark, sf_dir, str(tmp_path / "ev"))
    days = [r["day"] for r in fact.select("day").distinct().limit(3).collect()]
    q = fact.filter(F.col("day") == days[0])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the literal day must appear inside the partition filters, and the
    # result must match an unpartitioned filter exactly
    assert str(days[0]) in plan.split("PartitionFilters")[1].split("]")[0]
    expect = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn(
            "day",
            F.floor(F.col("ts").cast("timestamp_ltz").cast("long") / 86400),
        )
        .filter(F.col("day") == days[0])
        .count()
    )
    assert q.count() == expect


def test_dynamic_partition_pruning_injects_runtime_filter(
    spark, sf_dir, tmp_path
):
    fact = _write_partitioned_events(spark, sf_dir, str(tmp_path / "ev2"))
    days = sorted(
        r["day"] for r in fact.select("day").distinct().limit(40).collect()
    )[:3]
    dim = spark.createDataFrame(
        [(int(d), f"label{i}") for i, d in enumerate(days)],
        "dim_day long, label string",
    )
    # the selective filter lives on the DIM side; the fact side's
    # partition column is only constrained through the join
    joined = fact.join(
        dim.filter(F.col("label") != "nope"),
        fact.day == F.col("dim_day"),
    )
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized.lower(), optimized[:2000]
    got = joined.count()
    expect = fact.filter(F.col("day").isin([int(d) for d in days])).count()
    assert got == expect
