"""SparkSession factory tuned for the KG-construction workload.

Scale posture: these confs are the local-mode stand-ins for the settings
we would ship on a 1000-executor cluster reading 100 TB:

* AQE on (runtime coalescing, skew-join splitting) — the reference hit
  import timeouts on skewed batches instead (`HISTORY.md:357-363`).
* Arrow enabled for every pandas/Arrow UDF stage (the reference is
  row-at-a-time pandas `iterrows`; we are Arrow-vectorized end to end).
* Shuffle partitions sized by env so the same code runs at local[8] and
  local[32] for the two-cluster-size scaling evidence, and at thousands
  of partitions on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oak-kg-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to ``2 * cpus`` locally; on a real
    cluster this would be sized to keep post-shuffle partitions in the
    100–500 MB range at the target data scale.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    builder = _tune(builder, shuffle_partitions)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _tune(builder, shuffle_partitions: int):
    """Engine tuning shared by the local factory and spark-submit jobs."""
    return (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # the reference's UNWIND batches were 1,000 rows
        # (pipeline/auradb_loader.py:477); Arrow batches of 10k keep UDF
        # overhead amortized while bounding per-batch memory.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the document scan is compute-heavy (per-row span pivot); the
        # default 128 MB split turns a single ~125 MB file into ONE task.
        # Smaller splits keep the scan parallel — on a cluster this also
        # keeps post-scan partitions comfortably in executor memory.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # PySpark's per-API-call error call-site capture costs THREE
        # extra py4j round trips (conf.get + PySparkCurrentOrigin.set/
        # clear) plus a Python stack walk per DataFrame method. The
        # flagship's 61-branch melt makes thousands of API calls while
        # building its plan, so the documented opt-out measurably cuts
        # plan-construction latency; the only cost is losing Python
        # call-site lines inside JVM AnalysisException messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Constraint propagation is superlinear in predicate/alias count
        # and re-runs inside AQE's per-stage re-optimization; on the
        # flagship's 61-branch melt it costs ~4.5 s of plan build plus
        # ~5 s across AQE re-plans (profiled: build 5.8→1.3 s, exec
        # 13.3→8.1 s, identical results — it is an optimizer-cost knob,
        # not a semantics knob). Our queries state their IsNotNull /
        # join-key filters explicitly, so the inferred constraints it
        # would add are already in the plans.
        .config("spark.sql.constraintPropagation.enabled", "false")
    )


def get_cluster_spark(
    app_name: str = "oak-kg-spark-job",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Session factory for ``spark-submit`` jobs (north_rule deploy path:
    ``spark-submit --py-files`` on a multi-executor cluster).

    Master, executor count, and memory come from the submit command /
    cluster manager — this factory applies only the engine's SQL/Arrow
    tuning. ``shuffle_partitions`` defaults to ``$SPARK_GRAFT_SHUFFLE``
    or 2× the default parallelism once the session is up; on a real
    cluster set it so post-shuffle partitions land in the 100–500 MB
    range at the target scale (e.g. ~200k partitions at 100 TB).
    """
    if shuffle_partitions is None:
        env = os.environ.get("SPARK_GRAFT_SHUFFLE")
        shuffle_partitions = int(env) if env else 0
    builder = _tune(SparkSession.builder.appName(app_name), shuffle_partitions or 8)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if not shuffle_partitions:
        # size to the cluster we actually got
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(2 * spark.sparkContext.defaultParallelism, 8)),
        )
    return spark
