"""Similarity search over the embeddings table (vec_id, embedding
float[64], label) — the training-data-pipeline operators the engine adds
beyond the reference's surface (task brief; SURVEY.md §2 extension).

Three tiers:
* q29 — brute-force cosine top-k (the exactness baseline). Broadcast the
  query set against the corpus: at 100 TB the corpus side never shuffles;
  the per-row JVM `zip_with`/`aggregate` dot product stays inside
  WholeStageCodegen (no Python).
* q30 — LSH-bucketed near-dup (the scale path). 8 deterministic
  hyperplanes → 256 buckets → shuffle corpus once on bucket id →
  candidate pairs only within buckets (~1/256 of the cross product),
  exact cosine re-check on candidates. This is the standard
  sign-random-projection LSH (Charikar 2002); planes are integer-rational
  so Spark and DuckDB compute bit-identical signatures.
* q31 — IVF-style coarse quantization: per-label centroids (tiny,
  broadcast) → nearest-centroid assignment. The centroid table is the
  IVF index; probing = broadcast join instead of full scan.

All math is float64 with identical left-to-right fold order in both
engines so the driver's value-hash compare holds exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import load, r4

DIM = 64
N_PLANES = 8
K = 5
N_QUERY = 10  # query set: vec_id < 10


def _vec(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same op order as the DuckDB
    twin, so results match to the last bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


#: DuckDB twins (l/r are DOUBLE[]) — list_transform+list_sum folds in list
#: order, matching F.aggregate's left fold
def _dot_sql(l: str, r: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({l}, {r}), p -> p[1] * p[2]))"
    )


def _norm_sql(l: str) -> str:
    return f"sqrt(list_sum(list_transform({l}, x -> x * x)))"


def _cos_sql(l: str, r: str) -> str:
    return f"({_dot_sql(l, r)} / ({_norm_sql(l)} * {_norm_sql(r)}))"


# --------------------------------------------------------------------------
# q29 — brute-force cosine top-k
# --------------------------------------------------------------------------


def q29_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    sims = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "rank", r4(F.col("sim")).alias("sim"))
    )


Q29_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY}
), sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_cos_sql('q.qv', 'e.v')} AS sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       round(sim, 4) AS sim
FROM ranked WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# q30 — LSH near-duplicate pairs (sign-random-projection)
# --------------------------------------------------------------------------

# plane(b, d) = ((b*1009 + d*9176 + 1) mod 2003) / 2003 - 0.5 — exact
# rational values, identical in any IEEE-754 engine
_PA, _PB, _PM = 1009, 9176, 2003


def _plane_dot(v: Column, b: int) -> Column:
    return F.aggregate(
        F.zip_with(
            v,
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda x, d: x
            * (((F.lit(b) * _PA + d * _PB + 1) % _PM) / F.lit(float(_PM)) - 0.5),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(v: Column) -> Column:
    bits = [
        F.when(_plane_dot(v, b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(N_PLANES)
    ]
    out = bits[0]
    for bc in bits[1:]:
        out = out + bc
    return out


def q30_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings")).withColumn(
        "bucket", lsh_bucket(F.col("v"))
    )
    a = e.select("bucket", F.col("vec_id").alias("id1"), F.col("v").alias("v1"))
    b = e.select("bucket", F.col("vec_id").alias("id2"), F.col("v").alias("v2"))
    # shuffle once on bucket id; pairs only within buckets (the 1/2^8
    # candidate reduction that makes this survive 100× scale)
    cand = a.join(b, on="bucket").filter(F.col("id1") < F.col("id2"))
    return (
        cand.select(
            "id1", "id2", cosine(F.col("v1"), F.col("v2")).alias("sim")
        )
        .filter(F.col("sim") > 0.2)
        .select("id1", "id2", r4(F.col("sim")).alias("sim"))
    )


# DuckDB list_transform's lambda index i is 1-based; Spark's is 0-based
_PLANE_SQL = (
    f"list_sum(list_transform(v, (x, i) -> x * "
    f"((({{b}} * {_PA} + (i - 1) * {_PB} + 1) % {_PM}) / {_PM}.0 - 0.5)))"
)
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {_PLANE_SQL.format(b=b)} > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(N_PLANES)
)

Q30_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), hashed AS (
  SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e
), cand AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         {_cos_sql('a.v', 'b.v')} AS sim
  FROM hashed a JOIN hashed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id1, id2, round(sim, 4) AS sim FROM cand WHERE sim > 0.2
"""


# --------------------------------------------------------------------------
# q31 — IVF coarse quantization: per-label centroids, nearest assignment
# --------------------------------------------------------------------------


def q31_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    # centroid table: element-wise mean per label — posexplode + agg is a
    # tiny shuffle (n_labels × dim rows); the result broadcasts
    cent = (
        e.select("label", F.posexplode("v").alias("d", "x"))
        .groupBy("label", "d")
        .agg((F.sum("x") / F.count("x")).alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("m")))
            ).alias("ent")
        )
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(ent, e -> e.m)").alias("cv"),
        )
    )
    sims = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "c_label",
        cosine(F.col("v"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("c_label").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("c_label").alias("assigned"),
            r4(F.col("sim")).alias("sim"),
        )
    )


Q31_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), expl AS (
  SELECT label, unnest(v) AS x,
         unnest(range(0, {DIM})) AS d
  FROM e
), cm AS (
  SELECT label, d, sum(x) / count(x) AS m FROM expl GROUP BY label, d
), cent AS (
  SELECT label AS c_label, list(m ORDER BY d) AS cv FROM cm GROUP BY label
), sims AS (
  SELECT e.vec_id, c.c_label, {_cos_sql('e.v', 'c.cv')} AS sim
  FROM e CROSS JOIN cent c
), ranked AS (
  SELECT vec_id, c_label, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, c_label ASC) AS rn
  FROM sims
)
SELECT vec_id, c_label AS assigned, round(sim, 4) AS sim
FROM ranked WHERE rn = 1
"""


QUERIES = {
    "q29_knn_bruteforce": q29_knn_bruteforce,
    "q30_lsh_neardup": q30_lsh_neardup,
    "q31_ivf_assign": q31_ivf_assign,
}

ORACLES = {
    "q29_knn_bruteforce": Q29_SQL,
    "q30_lsh_neardup": Q30_SQL,
    "q31_ivf_assign": Q31_SQL,
}
