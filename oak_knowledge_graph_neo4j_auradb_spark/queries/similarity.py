"""Similarity search over the embeddings table (vec_id, embedding
float[64], label) — the training-data-pipeline operators the engine adds
beyond the reference's surface (task brief; SURVEY.md §2 extension).

Three tiers:
* q29 — brute-force cosine top-k (the exactness baseline). Broadcast the
  query set against the corpus: at 100 TB the corpus side never shuffles;
  the per-row JVM `zip_with`/`aggregate` dot product stays inside
  WholeStageCodegen (no Python).
* q30 — banded LSH near-dup (the scale path). N_BANDS independent bands
  of BITS_PER_BAND sign-random-projection planes (Charikar 2002) →
  per-band signatures → candidate pairs collide in ANY band (the
  MinHash band trick applied to SRP). Bucket cardinality is
  2^BITS_PER_BAND per band and the bit width is a parameter: growing
  the corpus 100× means raising BITS_PER_BAND so expected bucket
  occupancy stays bounded — candidate pairs scale ~N²·bands/2^bits,
  and join parallelism scales with bucket count, not a fixed 256.
  Planes are integer-rational so Spark and DuckDB compute bit-identical
  signatures; only (band, signature, id) flows through the candidate
  shuffle — vectors are joined back per surviving pair.
* q31 — IVF-style coarse quantization: per-label centroids (tiny,
  broadcast) → nearest-centroid assignment. The centroid table is the
  IVF index; probing = broadcast join instead of full scan.

All math is float64 with identical left-to-right fold order in both
engines so the driver's value-hash compare holds exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType
from pyspark.sql.window import Window

from .common import load, r4

DIM = 64
#: banded SRP-LSH geometry: N_BANDS × BITS_PER_BAND planes. 8-bit bands
#: (256 buckets each) are sized for the sandbox corpus (~10³ vectors →
#: expected bucket occupancy ~4); at 10⁹ vectors raise BITS_PER_BAND to
#: ~24 so occupancy — and with it candidate-pair count ~N²·bands/2^bits
#: — stays bounded. Both are plumbed through q30 as parameters.
N_BANDS = 4
BITS_PER_BAND = 8
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
    # per-vector norms computed ONCE per side — inside cosine() the
    # corpus norm would be re-folded once per query and the query norm
    # once per corpus row; same expression tree, bit-identical values
    en = e.select("vec_id", "v", norm(F.col("v")).alias("n"))
    q = F.broadcast(
        en.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("n").alias("qn"),
        )
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n"))
    sims = (
        en.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("sim"),
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


def _plane_dot(v: Column, b: int, dim: int = DIM) -> Column:
    return F.aggregate(
        F.zip_with(
            v,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x
            * (((F.lit(b) * _PA + d * _PB + 1) % _PM) / F.lit(float(_PM)) - 0.5),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def band_signature(
    v: Column, band: int, bits: int = BITS_PER_BAND, dim: int = DIM
) -> Column:
    """The band's BITS_PER_BAND sign bits packed into an int. Plane
    (band*bits + j) keeps every band's planes distinct while staying in
    the integer-rational family both engines evaluate identically."""
    terms = [
        F.when(_plane_dot(v, band * bits + j, dim) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        for j in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


# Arrow-batched fast paths for q30's two hot loops. Spark's HOF lambdas
# (F.aggregate / zip_with) are INTERPRETED per element — measured ~2.7 ms
# per 32-plane signature row — so the 650K-candidate re-check and the
# signature sweep dominate the query. These pandas UDFs compute the SAME
# IEEE-754 operation sequence (a strict left fold over the dimension
# axis: one elementwise multiply + one add per step, vectorized across
# ROWS, sequential across DIMS), so every double is bit-identical to the
# HOF form and to the DuckDB twin — a np.dot/matmul would NOT be (pairwise
# summation reorders the adds and can flip a sign bit near 0).


def _seq_dot_np(a, b):
    acc = np.zeros(len(a))
    for d in range(a.shape[1]):
        acc = acc + a[:, d] * b[:, d]
    return acc


# DataType objects (not strings): string return types are parsed at
# decoration time and demand a live SparkSession at module import
@pandas_udf(DoubleType())
def dot_seq(a: pd.Series, b: pd.Series) -> pd.Series:
    # NULL on either side → NULL dot (the oracle's list_sum over NULL),
    # and np.stack can't ingest None rows (deg_nulls sweep)
    mask = (a.notna() & b.notna()).to_numpy()
    out = np.full(len(a), np.nan)  # NaN → Arrow null on the way back
    if mask.any():
        out[mask] = _seq_dot_np(
            np.stack(a[mask].to_numpy()), np.stack(b[mask].to_numpy())
        )
    return pd.Series(out)


def _band_sigs_pd(n_bands: int, bits: int, dim: int = DIM):
    """pandas UDF: v -> array of N_BANDS packed band signatures."""
    planes = np.array(
        [
            [
                ((p * _PA + d * _PB + 1) % _PM) / float(_PM) - 0.5
                for d in range(dim)
            ]
            for p in range(n_bands * bits)
        ]
    )

    @pandas_udf(ArrayType(LongType()))
    def f(v: pd.Series) -> pd.Series:
        # NULL embeddings → all-zero signature: the oracle's per-bit
        # CASE WHEN <plane·v> > 0 folds the NULL dot into ELSE 0, so
        # null vectors all land in bucket 0 (their NULL cosine then
        # fails every verify threshold — deg_nulls sweep). np.stack
        # can't ingest None rows, hence the mask.
        mask = v.notna().to_numpy()
        sigs = np.zeros((len(v), n_bands), dtype=np.int64)
        if mask.any():
            mat = np.stack(v[mask].to_numpy())  # (rows, dim)
            acc = np.zeros((mat.shape[0], planes.shape[0]))
            for d in range(dim):
                acc = acc + mat[:, d : d + 1] * planes[None, :, d]
            pos = acc > 0
            sub = np.zeros((mat.shape[0], n_bands), dtype=np.int64)
            for b in range(n_bands):
                for j in range(bits):
                    sub[:, b] += pos[:, b * bits + j].astype(np.int64) << j
            sigs[mask] = sub
        return pd.Series(list(sigs))

    return f


def q30_lsh_neardup(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int = N_BANDS,
    bits: int = BITS_PER_BAND,
) -> DataFrame:
    """Banded SRP-LSH near-dup: candidates collide in ANY band.

    Only (band, sig, vec_id) rows flow through the candidate shuffle —
    a 12-byte stream regardless of embedding width; full vectors are
    joined back per distinct surviving pair for the exact cosine
    re-check. Candidate-pair volume ≈ N²·bands/2^bits: both knobs are
    parameters, so bucket cardinality grows with the corpus instead of
    pinning at a fixed 256."""
    e = _vec(load(spark, sf_dir, "embeddings"))
    # The signature and norm tables each feed both sides of a self-join;
    # the STATIC plan shows their Arrow stages twice, but AQE exchange
    # reuse dedups them at runtime — persisting instead was measured
    # SLOWER (4.0s vs 2.8s at sf0.1: materialization barrier + store
    # round-trip on tiny tables).
    sigs = e.select(
        "vec_id", _band_sigs_pd(n_bands, bits)(F.col("v")).alias("s")
    )
    keys = sigs.select(
        "vec_id", F.posexplode("s").alias("band", "sig")
    )
    a = keys.select("band", "sig", F.col("vec_id").alias("id1"))
    b = keys.select("band", "sig", F.col("vec_id").alias("id2"))
    cand = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()  # a pair colliding in several bands scores once
    )
    # norms are per-VECTOR, not per-pair: compute once on the join-back
    # dimension instead of re-folding both operands inside every
    # candidate's cosine (measured ~25% off the whole query). Same
    # expression tree as cosine() — dot/(n1*n2) — so values (and the
    # DuckDB twin) are bit-identical.
    withn = e.select(
        "vec_id", "v", F.sqrt(dot_seq(F.col("v"), F.col("v"))).alias("n")
    )
    v1 = withn.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1"),
        F.col("n").alias("n1"),
    )
    v2 = withn.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"),
        F.col("n").alias("n2"),
    )
    sim = dot_seq(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    return (
        cand.join(v1, on="id1")
        .join(v2, on="id2")
        .select("id1", "id2", sim.alias("sim"))
        .filter(F.col("sim") > 0.2)
        .select("id1", "id2", r4(F.col("sim")).alias("sim"))
    )


# DuckDB list_transform's lambda index i is 1-based; Spark's is 0-based
_PLANE_SQL = (
    f"list_sum(list_transform(v, (x, i) -> x * "
    f"((({{p}} * {_PA} + (i - 1) * {_PB} + 1) % {_PM}) / {_PM}.0 - 0.5)))"
)


def _band_sig_sql(band: int, bits: int = BITS_PER_BAND) -> str:
    return " + ".join(
        f"(CASE WHEN {_PLANE_SQL.format(p=band * bits + j)} > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )


_SIG_COLS = ", ".join(
    f"{_band_sig_sql(b)} AS sig{b}" for b in range(N_BANDS)
)
# UNION (not UNION ALL) dedups pairs colliding in several bands —
# the twin of Spark's .distinct()
_CAND_UNION = "\n  UNION\n".join(
    f"  SELECT a.vec_id AS id1, b.vec_id AS id2\n"
    f"  FROM hashed a JOIN hashed b "
    f"ON a.sig{b} = b.sig{b} AND a.vec_id < b.vec_id"
    for b in range(N_BANDS)
)

Q30_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), hashed AS (
  SELECT vec_id, {_SIG_COLS} FROM e
), cand AS (
{_CAND_UNION}
), scored AS (
  SELECT cand.id1, cand.id2, {_cos_sql('ea.v', 'eb.v')} AS sim
  FROM cand
  JOIN e ea ON ea.vec_id = cand.id1
  JOIN e eb ON eb.vec_id = cand.id2
)
SELECT id1, id2, round(sim, 4) AS sim FROM scored WHERE sim > 0.2
"""


# --------------------------------------------------------------------------
# q31 — IVF coarse quantization: per-label centroids, nearest assignment
# --------------------------------------------------------------------------


def q31_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    # centroid table: element-wise mean per label — posexplode + agg is a
    # tiny shuffle (n_labels × dim rows); the result broadcasts
    # NULL vectors explode to DIM null components (the oracle zips
    # unnest(v) against unnest(range(DIM)), padding the short side with
    # NULL) so an all-null label still yields a centroid row — a plain
    # posexplode would drop those rows and the whole label (deg_nulls
    # sweep); try_divide for the all-null mean (count(x) = 0)
    cent = (
        e.select(
            "label",
            F.posexplode(
                F.coalesce(
                    "v", F.array_repeat(F.lit(None).cast("double"), DIM)
                )
            ).alias("d", "x"),
        )
        .groupBy("label", "d")
        .agg(F.try_divide(F.sum("x"), F.count("x")).alias("m"))
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


# --------------------------------------------------------------------------
# q33 — IVF-probed ANN top-k: search only the query's nearest cell
# --------------------------------------------------------------------------


def q33_ivf_probe_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF search path q31's assignment enables: each query probes
    ONLY the corpus vectors assigned to its own nearest-centroid cell
    (nprobe=1), exact cosine inside the cell, top-k per query.

    Scale shape: the (vec_id, cell, sim) assignment stream is narrow —
    vectors are never carried through the assignment window; the corpus
    shuffles once on vec_id (to attach cells) and once on cell (the
    probe join against the broadcast query set). At 10⁹ vectors with
    √N cells the probe scans ~√N candidates per query instead of N."""
    e = _vec(load(spark, sf_dir, "embeddings"))
    # NULL vectors explode to DIM null components (the oracle zips
    # unnest(v) against unnest(range(DIM)), padding the short side with
    # NULL) so an all-null label still yields a centroid row — a plain
    # posexplode would drop those rows and the whole label (deg_nulls
    # sweep); try_divide for the all-null mean (count(x) = 0)
    cent = (
        e.select(
            "label",
            F.posexplode(
                F.coalesce(
                    "v", F.array_repeat(F.lit(None).cast("double"), DIM)
                )
            ).alias("d", "x"),
        )
        .groupBy("label", "d")
        .agg(F.try_divide(F.sum("x"), F.count("x")).alias("m"))
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
        "vec_id", "c_label", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("c_label").asc()
    )
    assign = (
        sims.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_label").alias("cell"))
    )
    cells = e.select(
        "vec_id", "v", norm(F.col("v")).alias("n")
    ).join(assign, on="vec_id")
    q = F.broadcast(
        cells.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("n").alias("qn"),
            "cell",
        )
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n"))
    cand = (
        cells.join(q, on="cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "rank", r4(F.col("sim")).alias("sim"))
    )


Q33_SQL = f"""
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
), asims AS (
  SELECT e.vec_id, c.c_label, {_cos_sql('e.v', 'c.cv')} AS sim
  FROM e CROSS JOIN cent c
), assign AS (
  SELECT vec_id, c_label AS cell FROM (
    SELECT vec_id, c_label, sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, c_label ASC) AS rn
    FROM asims) WHERE rn = 1
), cells AS (
  SELECT e.vec_id, e.v, a.cell FROM e JOIN assign a USING (vec_id)
), q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM cells
  WHERE vec_id < {N_QUERY}
), cand AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.qv', 'c.v')} AS sim
  FROM cells c JOIN q ON c.cell = q.cell AND c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       round(sim, 4) AS sim
FROM ranked WHERE rank <= {K}
"""


# --------------------------------------------------------------------------
# q84 — k-means Lloyd iterations: the centroid-LEARNING loop the IVF
# family (q31/q33, fixed label-derived centroids) doesn't exercise.
# Deterministic posture: k=4 seeded from vec_id<4, TWO fixed update
# rounds, squared-euclidean assignment with (dist asc, centroid asc)
# tie-break, centroid components rounded to 6dp after each mean (so the
# two engines' different float-summation orders can't leak into the
# next round's argmin). Spark plan per round: broadcast centroids ×
# corpus (k·dim doubles — always broadcastable), one posexplode agg for
# the update (k·dim result rows). The oracle unrolls both rounds as
# CTEs. At 10⁹ vectors this is exactly the distributed k-means plan
# you'd run: corpus never shuffles for assignment, only the tiny
# (cluster, dim) partial-agg does.
# --------------------------------------------------------------------------

_KM_K = 4
_KM_ROUNDS = 2


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqdist_sql(l: str, r: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({l}, {r}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def q84_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    cent = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").cast("int").alias("c"), F.col("v").alias("cv")
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        d2 = e.crossJoin(F.broadcast(cent_df)).select(
            "vec_id", "v", "c", _sqdist(F.col("v"), F.col("cv")).alias("d2")
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d2").asc(), F.col("c").asc()
        )
        return (
            d2.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", "c", "d2")
        )

    for _ in range(_KM_ROUNDS):
        a = assign(cent)
        cent = (
            a.select(
                "c",
                F.posexplode(
                    F.coalesce(
                        "v",
                        F.array_repeat(F.lit(None).cast("double"), DIM),
                    )
                ).alias("d", "x"),
            )
            .groupBy("c", "d")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("c")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("m")))
                ).alias("ent")
            )
            .select("c", F.expr("transform(ent, e -> e.m)").alias("cv"))
        )
    final = assign(cent)
    return (
        final.groupBy("c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            r4(F.sum("d2")).alias("inertia"),
        )
        .join(
            cent.select(
                "c",
                r4(
                    F.aggregate(
                        F.col("cv"), F.lit(0.0), lambda acc, x: acc + x
                    )
                ).alias("cent_sum"),
            ),
            on="c",
        )
        .select(F.col("c").alias("cluster"), "n", "inertia", "cent_sum")
    )


def _q84_sql(k: int = _KM_K, rounds: int = _KM_ROUNDS) -> str:
    steps = [
        f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS (
  SELECT CAST(vec_id AS INT) AS c, v AS cv FROM e WHERE vec_id < {k})"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        steps.append(
            f"""
a{r} AS (
  SELECT vec_id, v, c FROM (
    SELECT e.vec_id, e.v, c{p}.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_sqdist_sql('e.v', f'c{p}.cv')} ASC, c{p}.c ASC) AS rn
    FROM e CROSS JOIN c{p}) WHERE rn = 1),
c{r} AS MATERIALIZED (
  SELECT c, list(m ORDER BY d) AS cv FROM (
    SELECT c, d, round(avg(x), 6) AS m FROM (
      SELECT c, unnest(v) AS x, unnest(range(0, {DIM})) AS d FROM a{r})
    GROUP BY c, d) GROUP BY c)"""
        )
    return (
        "WITH " + ",".join(steps)
        + f""",
af AS (
  SELECT vec_id, c, d2 FROM (
    SELECT e.vec_id, c{rounds}.c,
           {_sqdist_sql('e.v', f'c{rounds}.cv')} AS d2,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_sqdist_sql('e.v', f'c{rounds}.cv')} ASC,
                      c{rounds}.c ASC) AS rn
    FROM e CROSS JOIN c{rounds}) WHERE rn = 1)
SELECT af.c AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(af.d2), 4) AS inertia,
       ROUND(ANY_VALUE(cs.s), 4) AS cent_sum
FROM af JOIN (SELECT c, list_sum(cv) AS s FROM c{rounds}) cs
  ON af.c = cs.c
GROUP BY af.c
"""
    )


# --------------------------------------------------------------------------
# q98 — SemDedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
# at web-scale through semantic deduplication"): partition the embedding
# space into clusters, then inside each cluster drop every vector whose
# cosine similarity to an earlier-kept vector exceeds τ. The two-level
# structure is the whole point at 10⁹ vectors: the O(N²) pairwise step
# runs only WITHIN a cluster, so total work is Σ|cluster|² ≈ N²/k, and
# each cluster is one shuffle partition — raise k proportionally to N
# and per-task work stays constant. Spark plan: centroid assignment is a
# broadcast crossJoin (corpus never shuffles; k·dim doubles broadcast),
# the pairwise step is ONE self-join shuffle keyed on cluster id. Hot
# clusters at production scale get sub-bucketed by an SRP band (q30's
# machinery) before the self-join — same τ semantics, bounded fan-out.
# Drop rule: in a pair (id1 < id2) with sim > τ, id2 is the duplicate —
# the keep-lowest-id convention makes the result order-independent.
# All cosine math reuses the module's bit-exact fold helpers, so the
# strict threshold compare (no pre-round) agrees with DuckDB exactly.
# --------------------------------------------------------------------------

_SD_K = 8
_SD_TAU = 0.3


def q98_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        # norm computed ONCE per vector (q29's bit-identity posture)
        .select("vec_id", "v", "c", norm(F.col("v")).alias("n"))
    )
    left = a.select(
        "c",
        F.col("vec_id").alias("id1"),
        F.col("v").alias("v1"),
        F.col("n").alias("n1"),
    )
    right = a.select(
        "c",
        F.col("vec_id").alias("id2"),
        F.col("v").alias("v2"),
        F.col("n").alias("n2"),
    )
    pairs = (
        left.join(right, on="c")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "c",
            "id2",
            (dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))).alias(
                "sim"
            ),
        )
        .filter(F.col("sim") > _SD_TAU)
    )
    dup = pairs.groupBy("c").agg(
        F.countDistinct("id2").cast("long").alias("n_dropped"),
        r4(F.max("sim")).alias("max_dup_sim"),
    )
    total = a.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return total.join(dup, on="c", how="left").select(
        F.col("c").alias("cluster"),
        "n_total",
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
        (F.col("n_total") - F.coalesce(F.col("n_dropped"), F.lit(0)))
        .cast("long")
        .alias("n_kept"),
        "max_dup_sim",
    )


Q98_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS (
  SELECT CAST(vec_id AS INT) AS c, v AS cv FROM e WHERE vec_id < {_SD_K}
), a AS (
  SELECT vec_id, v, c,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS n
  FROM (
    SELECT e.vec_id, e.v, c0.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_sqdist_sql('e.v', 'c0.cv')} ASC, c0.c ASC) AS rn
    FROM e CROSS JOIN c0) WHERE rn = 1
), pairs AS (
  SELECT l.c, r.vec_id AS id2,
         {_dot_sql('l.v', 'r.v')} / (l.n * r.n) AS sim
  FROM a l JOIN a r ON l.c = r.c AND l.vec_id < r.vec_id
), dup AS (
  SELECT c, CAST(COUNT(DISTINCT id2) AS BIGINT) AS n_dropped,
         ROUND(MAX(sim), 4) AS max_dup_sim
  FROM pairs WHERE sim > {_SD_TAU} GROUP BY c
)
SELECT t.c AS cluster, t.n_total,
       COALESCE(d.n_dropped, CAST(0 AS BIGINT)) AS n_dropped,
       t.n_total - COALESCE(d.n_dropped, CAST(0 AS BIGINT)) AS n_kept,
       d.max_dup_sim
FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_total FROM a GROUP BY c) t
LEFT JOIN dup d ON t.c = d.c
"""


# --------------------------------------------------------------------------
# q140 — label-centroid similarity matrix: per-class mean vectors and
# the pairwise cosine between them — the embedding-space QA a training
# pipeline runs to spot collapsed or duplicate classes before the
# vectors are trusted. The centroid is assembled with an ORDER-PINNED
# per-dimension average (posexplode → (label, dim) avg → re-collect
# sorted by dim), so the only nondeterminism is sum-order ulps, hidden
# by the 6dp rendering. Class count is small by nature, so the
# centroid matrix broadcasts and the pair join is trivial; the heavy
# stage — the per-dim partial agg over N vectors — is one shuffle.
# --------------------------------------------------------------------------


def q140_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _vec(load(spark, sf_dir, "embeddings"))
    ex = emb.select("label", F.posexplode("v").alias("pos", "val"))
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("m"))
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s.getField("m"),
        ).alias("c")
    )
    a = carr.select(F.col("label").alias("l1"), F.col("c").alias("c1"))
    b = carr.select(F.col("label").alias("l2"), F.col("c").alias("c2"))
    return (
        a.join(F.broadcast(b), F.col("l1") < F.col("l2"))
        .select(
            "l1",
            "l2",
            F.round(cosine(F.col("c1"), F.col("c2")), 6).alias("cos_sim"),
        )
    )


def _q140_sql() -> str:
    return f"""
WITH ex AS (
  SELECT label, u.i AS pos, embedding[u.i] AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
), cent AS (
  SELECT label, pos, AVG(val) AS m FROM ex GROUP BY 1, 2
), carr AS (
  SELECT label, list(m ORDER BY pos) AS c FROM cent GROUP BY label
)
SELECT a.label AS l1, b.label AS l2,
       ROUND({_cos_sql('a.c', 'b.c')}, 6) AS cos_sim
FROM carr a JOIN carr b ON a.label < b.label
"""


# --------------------------------------------------------------------------
# q168 — dominant principal direction of the embedding cloud by power
# iteration on the 64×64 second-moment (Gram) matrix: S = Σ v·vᵀ built
# with a double posexplode + per-(d,e) sum (the declarative form; at
# 10⁹ rows the same matrix comes from a mapInPandas per-partition Gram
# accumulation — 64×64 per task — tree-reduced by one tiny groupBy).
# Three fixed max-abs-normalized iterations from the all-ones start;
# S entries differ across engines only in summation order (~1e-15
# relative), which the contraction preserves and the 6dp render hides.
# --------------------------------------------------------------------------

_PCA_ROUNDS = 3


def q168_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # NULL vectors explode to DIM null components (the oracle's padded
    # multi-unnest; q31's note) — the covariance/eigvec chain then
    # propagates NULL instead of losing every row (deg_nulls sweep)
    x = e.select(
        "vec_id",
        F.posexplode(
            F.coalesce("v", F.array_repeat(F.lit(None).cast("double"), DIM))
        ).alias("d", "x"),
    )
    y = x.select(
        F.col("vec_id").alias("vid2"),
        F.col("d").alias("e"),
        F.col("x").alias("y"),
    )
    S = (
        x.join(y, x.vec_id == F.col("vid2"))
        .groupBy("d", "e")
        .agg(F.sum(F.col("x") * F.col("y")).alias("s"))
        .localCheckpoint()
    )
    v = spark.range(DIM).select(
        F.col("id").cast("int").alias("e"), F.lit(1.0).alias("w")
    )
    for _ in range(_PCA_ROUNDS):
        w = (
            S.join(v, "e")
            .groupBy("d")
            .agg(F.sum(F.col("s") * F.col("w")).alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        # eager per-round checkpoint (kg65's discipline): the 64-row
        # vector is trivial to materialize and keeps the static plan
        # from nesting each round's joins inside the next
        v = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("d").alias("e"), (F.col("w") / F.col("m")).alias("w")
            )
            .localCheckpoint()
        )
    return v.select(
        F.col("e").cast("long").alias("dim"),
        F.round("w", 6).alias("component"),
    )


def _q168_sql(rounds: int = _PCA_ROUNDS) -> str:
    steps = [
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
expl AS (
  SELECT vec_id, unnest(v) AS x, unnest(range(0, {DIM})) AS d FROM e
),
S AS MATERIALIZED (
  SELECT a.d AS d, b.d AS e, SUM(a.x * b.x) AS s
  FROM expl a JOIN expl b ON a.vec_id = b.vec_id GROUP BY 1, 2
),
v0 AS (SELECT unnest(range(0, {DIM})) AS e, CAST(1 AS DOUBLE) AS w)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(
            f"""
w{k} AS (SELECT S.d, SUM(S.s * v.w) AS w
        FROM S JOIN v{p} v ON S.e = v.e GROUP BY S.d),
v{k} AS (SELECT d AS e, w / (SELECT MAX(ABS(w)) FROM w{k}) AS w FROM w{k})"""
        )
    return (
        ",".join(steps)
        + f"""
SELECT CAST(e AS BIGINT) AS dim, ROUND(w, 6) AS component FROM v{rounds}"""
    )


# --------------------------------------------------------------------------
# q202 — embedding-quality eval: label recall@5 under brute-force
# cosine — for each vector, does any of its 5 nearest neighbors share
# its label? The retrieval-eval harness run at sample scale (this
# corpus); at production scale the same eval feeds candidates from
# q33's IVF probe instead of the full cross join. Norms are
# precomputed per side (the q30 lesson), similarities use the
# bit-identical sequential fold, and ranks tie-break on candidate id.
# --------------------------------------------------------------------------


def q202_label_recall_at5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    wn = e.select("vec_id", "v", "label", norm(F.col("v")).alias("nm"))
    a = wn.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlab"),
        F.col("nm").alias("qn"),
    )
    b = wn.select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("label").alias("clab"),
        F.col("nm").alias("cn"),
    )
    sim = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    p = (
        a.crossJoin(b)
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "qlab", "cid", "clab", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    top = p.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )
    hits = top.groupBy("qid", "qlab").agg(
        # CASE-mirror: NULL labels count as a miss, not NULL (deg_nulls)
        F.max(
            F.when(F.col("clab") == F.col("qlab"), 1).otherwise(0)
        ).alias("hit")
    )
    return hits.groupBy(F.col("qlab").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("hit"), 6).alias("recall_at5"),
    )


Q202_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), p AS (
  SELECT a.vec_id AS qid, a.label AS qlab,
         b.vec_id AS cid, b.label AS clab,
         {_cos_sql('a.v', 'b.v')} AS sim
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
), top AS (
  SELECT qid, qlab, clab,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim DESC, cid) AS rk
  FROM p
), hits AS (
  SELECT qid, qlab,
         MAX(CASE WHEN clab = qlab THEN 1 ELSE 0 END) AS hit
  FROM top WHERE rk <= 5 GROUP BY 1, 2
)
SELECT qlab AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(AVG(hit), 6) AS recall_at5
FROM hits GROUP BY qlab
"""


# --------------------------------------------------------------------------
# q203 — precision/recall curve for the banded SRP-LSH candidate
# generator against brute-force ground truth: at each cosine threshold,
# what fraction of retrieved candidates are true near-pairs (precision)
# and what fraction of true near-pairs the bands retrieved (recall) —
# the tuning table that justifies N_BANDS × BITS_PER_BAND before
# scaling the index. Ground truth is the exact all-pairs sweep (sample
# scale only — the thing LSH exists to avoid); similarities are the
# bit-identical folds, so threshold membership matches exactly across
# engines. Empty-truth thresholds render NULL recall, not an error.
# --------------------------------------------------------------------------

_PR_THRESHOLDS = (0.5, 0.7, 0.8, 0.9)


def q203_lsh_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    sigs = e.select(
        "vec_id", _band_sigs_pd(N_BANDS, BITS_PER_BAND)(F.col("v")).alias("s")
    )
    keys = sigs.select("vec_id", F.posexplode("s").alias("band", "sig"))
    a = keys.select("band", "sig", F.col("vec_id").alias("id1"))
    b = keys.select("band", "sig", F.col("vec_id").alias("id2"))
    cand = (
        a.join(b, on=["band", "sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    withn = e.select(
        "vec_id", "v", F.sqrt(dot_seq(F.col("v"), F.col("v"))).alias("n")
    )
    v1 = withn.select(
        F.col("vec_id").alias("id1"),
        F.col("v").alias("v1"),
        F.col("n").alias("n1"),
    )
    v2 = withn.select(
        F.col("vec_id").alias("id2"),
        F.col("v").alias("v2"),
        F.col("n").alias("n2"),
    )
    sim = dot_seq(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    exact = (
        v1.crossJoin(v2)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", sim.alias("sim"))
        .join(cand.withColumn("is_cand", F.lit(1)), ["id1", "id2"], "left")
        .localCheckpoint()
    )
    if exact.isEmpty():
        # no vector pairs at all → no PR curve (the oracle's grouped
        # aggregate over the empty pair set renders zero rows)
        return spark.createDataFrame(
            [],
            "threshold double, n_candidates long, n_truth long, "
            "n_tp long, precision double, recall double",
        )
    rows = []
    for t in _PR_THRESHOLDS:
        g = exact.agg(
            F.lit(t).alias("threshold"),
            F.count_if(F.col("is_cand").isNotNull())
            .cast("long")
            .alias("n_candidates"),
            F.count_if(F.col("sim") >= t).cast("long").alias("n_truth"),
            F.count_if(
                (F.col("sim") >= t) & F.col("is_cand").isNotNull()
            )
            .cast("long")
            .alias("n_tp"),
        )
        rows.append(g)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select(
        "threshold",
        "n_candidates",
        "n_truth",
        "n_tp",
        # try_divide: zero candidates → NULL precision (DuckDB x/0)
        F.round(F.try_divide("n_tp", "n_candidates"), 6).alias(
            "precision"
        ),
        F.when(
            F.col("n_truth") > 0,
            F.round(F.col("n_tp") / F.col("n_truth"), 6),
        ).alias("recall"),
    )


def _q203_sql() -> str:
    thresh_rows = ", ".join(f"({t})" for t in _PR_THRESHOLDS)
    sig_cols = ", ".join(
        f"{_band_sig_sql(b, bits=BITS_PER_BAND)} AS sig{b}"
        for b in range(N_BANDS)
    )
    cand_union = "\n  UNION\n".join(
        f"  SELECT a.vec_id AS id1, b.vec_id AS id2 FROM hashed a "
        f"JOIN hashed b ON a.sig{b} = b.sig{b} AND a.vec_id < b.vec_id"
        for b in range(N_BANDS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), hashed AS (
  SELECT vec_id, v, {sig_cols} FROM e
), cand AS (
{cand_union}
), exact AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         {_cos_sql('a.v', 'b.v')} AS sim,
         EXISTS (SELECT 1 FROM cand c
                 WHERE c.id1 = a.vec_id AND c.id2 = b.vec_id) AS is_cand
  FROM e a JOIN e b ON a.vec_id < b.vec_id
), th AS (SELECT CAST(threshold AS DOUBLE) AS threshold
          FROM (VALUES {thresh_rows}) t(threshold))
SELECT th.threshold,
       CAST(COUNT(*) FILTER (WHERE is_cand) AS BIGINT) AS n_candidates,
       CAST(COUNT(*) FILTER (WHERE sim >= th.threshold) AS BIGINT)
         AS n_truth,
       CAST(COUNT(*) FILTER (WHERE sim >= th.threshold AND is_cand)
            AS BIGINT) AS n_tp,
       ROUND(COUNT(*) FILTER (WHERE sim >= th.threshold AND is_cand)
             / (1.0 * COUNT(*) FILTER (WHERE is_cand)), 6) AS precision,
       CASE WHEN COUNT(*) FILTER (WHERE sim >= th.threshold) > 0 THEN
         ROUND(COUNT(*) FILTER (WHERE sim >= th.threshold AND is_cand)
               / (1.0 * COUNT(*) FILTER (WHERE sim >= th.threshold)), 6)
       END AS recall
FROM exact CROSS JOIN th
GROUP BY th.threshold
"""


# --------------------------------------------------------------------------
# q204 — external cluster validation of the IVF assignment (q31):
# purity (Σ max-label count per assigned cluster / n) and normalized
# mutual information between assignment and true label, from one
# confusion-matrix aggregation. Counts are integers; the entropies
# assemble identical doubles (integer-ratio logs), rendered at 6dp.
# --------------------------------------------------------------------------


def q204_assignment_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign = q31_ivf_assign(spark, sf_dir).select("vec_id", "assigned")
    truth = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    conf = (
        assign.join(truth, "vec_id")
        .groupBy("assigned", "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    n = conf.agg(F.sum("c")).collect()[0][0]
    per_a = conf.groupBy("assigned").agg(
        F.max("c").alias("mx"), F.sum("c").alias("ca")
    )
    per_l = conf.groupBy("label").agg(F.sum("c").alias("cl"))
    h_a = per_a.agg(
        (-F.sum((F.col("ca") / n) * F.log(F.col("ca") / n))).alias("h")
    )
    h_l = per_l.agg(
        (-F.sum((F.col("cl") / n) * F.log(F.col("cl") / n))).alias("h")
    )
    h_al = conf.agg(
        (-F.sum((F.col("c") / n) * F.log(F.col("c") / n))).alias("h")
    )
    purity = per_a.agg(
        (F.sum("mx") / F.lit(n).cast("double")).alias("p")
    )
    out = (
        purity.crossJoin(h_a.withColumnRenamed("h", "ha"))
        .crossJoin(h_l.withColumnRenamed("h", "hl"))
        .crossJoin(h_al.withColumnRenamed("h", "hal"))
    )
    # try_divide: a single perfectly-pure cluster has H=0 everywhere —
    # NMI is 0/0, NULL on both engines (deg_one sweep)
    nmi = F.try_divide(
        F.col("ha") + F.col("hl") - F.col("hal"),
        (F.col("ha") + F.col("hl")) / 2,
    )
    return out.select(
        F.lit(n).cast("long").alias("n"),
        F.round("p", 6).alias("purity"),
        F.round(nmi, 6).alias("nmi"),
    )


def _q204_sql() -> str:
    return f"""
WITH assign AS ({Q31_SQL}),
conf AS (
  SELECT a.assigned, e.label, COUNT(*) AS c
  FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY 1, 2
), nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM conf),
pa AS (SELECT assigned, MAX(c) AS mx, SUM(c) AS ca FROM conf GROUP BY 1),
pl AS (SELECT label, SUM(c) AS cl FROM conf GROUP BY 1),
ents AS (
  SELECT
    (SELECT -SUM((ca / n) * ln(ca / n)) FROM pa, nn) AS ha,
    (SELECT -SUM((cl / n) * ln(cl / n)) FROM pl, nn) AS hl,
    (SELECT -SUM((c / n) * ln(c / n)) FROM conf, nn) AS hal,
    (SELECT SUM(mx) / MIN(n) FROM pa, nn) AS p,
    (SELECT CAST(n AS BIGINT) FROM nn) AS n
)
SELECT n, ROUND(p, 6) AS purity,
       ROUND((ha + hl - hal) / ((ha + hl) / 2), 6) AS nmi
FROM ents
"""


# --------------------------------------------------------------------------
# q231 — k-means|| SEEDING (Bahmani et al. 2012, "Scalable k-means++"):
# the distributed replacement for k-means++'s inherently sequential
# D²-sampling. Per round: squared distance to the CURRENT candidate
# set (small — broadcast), the 1-row potential φ = Σd², and an
# independent coin per point keeping it with probability
# min(1, l·d²/φ) — so a round costs one broadcast join + one 1-row agg
# and the corpus never shuffles; the candidate set grows by ~l per
# round. The coin is u = md5long(vec_id|round)/2^60 — deterministic
# across engines and partitionings (the q42/q87/q230 hash-uniform
# trick), and d²/φ are rendered at 6dp before the comparison so the
# two engines' float summation can't flip a selection. Output: each
# candidate with the round that added it and its attraction weight
# (|points nearest to it|) — the weighted instance the final
# driver-side k-means++ would consume. Already-selected candidates
# have d² = 0 and can never be re-drawn.
# --------------------------------------------------------------------------

_KMPP_ROUNDS = 3
_KMPP_L = 4.0


def q231_kmeanspp_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    cands = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("cand"),
        F.col("v").alias("cv"),
        F.lit(0).cast("int").alias("rnd"),
    )
    for r in range(1, _KMPP_ROUNDS + 1):
        d2 = (
            e.crossJoin(F.broadcast(cands.select("cand", "cv")))
            .groupBy("vec_id")
            .agg(F.round(F.min(_sqdist(F.col("v"), F.col("cv"))), 6).alias("d2"))
        )
        phi = d2.agg(F.round(F.sum("d2"), 6).alias("phi"))
        u = md5long(F.concat_ws("|", "vec_id", F.lit(str(r)))) / F.lit(
            float(1 << 60)
        )
        sel = (
            e.join(d2, "vec_id")
            .crossJoin(F.broadcast(phi))
            # try_divide: all mass already on candidates → φ = 0 →
            # NULL ratio → the coin comparison is false on both engines
            .filter(u < _KMPP_L * F.try_divide("d2", "phi"))
            .select(
                F.col("vec_id").alias("cand"),
                F.col("v").alias("cv"),
                F.lit(r).cast("int").alias("rnd"),
            )
        )
        cands = cands.unionByName(sel).localCheckpoint()
    asgn = e.crossJoin(F.broadcast(cands.select("cand", "cv")))
    w = Window.partitionBy("vec_id").orderBy(
        F.round(_sqdist(F.col("v"), F.col("cv")), 6).asc(), F.col("cand").asc()
    )
    won = (
        asgn.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("cand")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    return (
        cands.select("cand", "rnd")
        .join(won, "cand", "left")
        .select("cand", "rnd", F.coalesce("w", F.lit(0)).cast("long").alias("w"))
    )


def _q231_sql() -> str:
    from .common import MD5LONG_SQL

    denom = repr(float(1 << 60))
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        """c0 AS (
  SELECT vec_id AS cand, v AS cv, 0 AS rnd FROM e ORDER BY vec_id LIMIT 1
)""",
    ]
    for r in range(1, _KMPP_ROUNDS + 1):
        p = r - 1
        u = MD5LONG_SQL.format(
            x=f"CAST(e.vec_id AS VARCHAR) || '|{r}'"
        )
        ctes.append(
            f"""dd{r} AS (
  SELECT e.vec_id,
         ROUND(MIN({_sqdist_sql('e.v', 'c.cv')}), 6) AS d2
  FROM e, c{p} c GROUP BY e.vec_id
),
ph{r} AS (SELECT ROUND(SUM(d2), 6) AS phi FROM dd{r}),
s{r} AS (
  SELECT e.vec_id AS cand, e.v AS cv, {r} AS rnd
  FROM e JOIN dd{r} USING (vec_id), ph{r}
  WHERE CAST({u} AS DOUBLE) / {denom}
        < {_KMPP_L} * dd{r}.d2 / ph{r}.phi
),
c{r} AS (SELECT * FROM c{p} UNION ALL SELECT * FROM s{r})"""
        )
    last = f"c{_KMPP_ROUNDS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asgn AS (
  SELECT e.vec_id, c.cand,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_sqdist_sql('e.v', 'c.cv')}, 6), c.cand) AS rn
  FROM e, {last} c
),
won AS (
  SELECT cand, CAST(COUNT(*) AS BIGINT) AS w FROM asgn
  WHERE rn = 1 GROUP BY cand
)
SELECT c.cand, CAST(c.rnd AS INTEGER) AS rnd,
       CAST(COALESCE(won.w, 0) AS BIGINT) AS w
FROM {last} c LEFT JOIN won USING (cand)
"""
    )


# --------------------------------------------------------------------------
# q237 — PRODUCT QUANTIZATION codebook training + encoding (Jégou et
# al. 2011, "Product Quantization for Nearest Neighbor Search"): the
# vector-compression codec IVF-PQ indexes pair with q31/q33's coarse
# quantizer. The 64-dim space splits into _PQ_M 16-dim subspaces; each
# trains an independent k=_PQ_K codebook (deterministic init from the
# first K vec_ids, one Lloyd round with 6dp-rendered centroids — the
# q84 cross-engine trick), then every vector encodes as M sub-codes.
# Output: per (subspace, code) cell population and mean quantization
# distortion — the table a PQ index build reports. Scale shape: the
# subspace explode is in-place (M slices per row), codebooks are
# (M·K·16 doubles) broadcasts, assignment is a per-(vec, sub) argmin
# window keyed by vec — the corpus never shuffles for training or
# encoding beyond the tiny centroid aggregates.
# --------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_D = 16  # dims per subspace
_PQ_K = 4  # codes per subspace


def q237_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    sub = e.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                lambda m: F.struct(
                    m.alias("sub"),
                    F.slice("v", m * _PQ_D + 1, _PQ_D).alias("sv"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    cent = sub.filter(F.col("vec_id") < _PQ_K).select(
        "sub",
        F.col("vec_id").cast("int").alias("code"),
        F.col("sv").alias("cv"),
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        d2 = sub.join(F.broadcast(cent_df), "sub").select(
            "vec_id",
            "sub",
            "sv",
            "code",
            _sqdist(F.col("sv"), F.col("cv")).alias("d2"),
        )
        w = Window.partitionBy("vec_id", "sub").orderBy(
            F.col("d2").asc(), F.col("code").asc()
        )
        return (
            d2.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    a = assign(cent)
    cent2 = (
        a.select(
            "sub",
            "code",
            # q31's padded-explode note: NULL slices keep their rows
            F.posexplode(
                F.coalesce(
                    "sv",
                    F.array_repeat(F.lit(None).cast("double"), _PQ_D),
                )
            ).alias("d", "x"),
        )
        .groupBy("sub", "code", "d")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("sub", "code")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("m")))
            ).alias("ent")
        )
        .select(
            "sub", "code", F.expr("transform(ent, e -> e.m)").alias("cv")
        )
    )
    enc = assign(cent2)
    return enc.groupBy("sub", "code").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        r4(F.avg("d2")).alias("mean_distortion"),
    )


def _q237_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sub AS (
  SELECT vec_id, m AS sub,
         v[m * {_PQ_D} + 1 : (m + 1) * {_PQ_D}] AS sv
  FROM e, unnest(generate_series(0, {_PQ_M - 1})) AS ms(m)
), c0 AS (
  SELECT sub, CAST(vec_id AS INTEGER) AS code, sv AS cv
  FROM sub WHERE vec_id < {_PQ_K}
), a1 AS (
  SELECT vec_id, sub, sv, code,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, sub
           ORDER BY {_sqdist_sql('sv', 'cv')}, code) AS rn
  FROM sub JOIN c0 USING (sub)
), w1 AS (SELECT vec_id, sub, sv, code FROM a1 WHERE rn = 1),
c1 AS (
  SELECT sub, code,
         list(m ORDER BY d) AS cv
  FROM (
    SELECT sub, code, d, ROUND(AVG(sv[d]), 6) AS m
    FROM w1, unnest(generate_series(1, {_PQ_D})) AS u(d)
    GROUP BY sub, code, d
  ) GROUP BY sub, code
), a2 AS (
  SELECT s.vec_id, s.sub, c.code,
         {_sqdist_sql('s.sv', 'c.cv')} AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY s.vec_id, s.sub
           ORDER BY {_sqdist_sql('s.sv', 'c.cv')}, c.code) AS rn
  FROM sub s JOIN c1 c USING (sub)
)
SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(d2), 4) AS mean_distortion
FROM a2 WHERE rn = 1
GROUP BY sub, code
"""


# --------------------------------------------------------------------------
# q238 — IVF-PQ ASYMMETRIC-DISTANCE SEARCH (Jégou et al. 2011 §IV):
# the serving path the q31/q33 coarse quantizer and q237 codec exist
# for, and the canonical billion-scale ANN index (FAISS IVFPQ). Build:
# assign every vector to its nearest coarse centroid, PQ-encode the
# RESIDUAL (v − centroid) as _PQ_M sub-codes. Search: for each query,
# probe the _ADC_NPROBE nearest lists; per probed list precompute a
# [_PQ_M][_PQ_K] lookup table of partial squared distances from the
# query residual to every codeword, then score each encoded vector as
# a pure table-lookup fold adc = Σ_m lut[m][code[m]] — no vector math
# per candidate. Scale shape: the corpus is touched twice, once to
# assign+encode (broadcast centroids/codebooks, one groupBy(vec_id)
# shuffle to pack the code array — the index build), once to score
# (the LUT table is queries×nprobe rows, BROADCAST; ADC is a map-side
# 4-element fold over 8-bit codes, so the scan reads codes, never
# vectors); the only search shuffle is the per-query top-k. At 10⁹
# vectors the code table would be written partitioned by list_id so
# probing prunes partitions. Cross-engine bit-identity: LUT cells use
# the shared _sqdist fold, and both engines sum the M partial
# distances in subspace order (F.aggregate over sequence ↔
# list_sum(list(ld2 ORDER BY sub))), so adc matches to the last bit;
# ranking orders by ROUND(adc, 6) with vec_id tie-break.
# --------------------------------------------------------------------------

_ADC_C = 4  # coarse lists (centroids = first C vec_ids)
_ADC_NPROBE = 2  # probed lists per query
_ADC_NQ = 5  # query set: vec_id < 5
_ADC_TOPK = 5


def q238_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    coarse = e.filter(F.col("vec_id") < _ADC_C).select(
        F.col("vec_id").cast("int").alias("lst"), F.col("v").alias("cv")
    )
    # --- index build: coarse assignment + residual ---
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("lst").asc()
    )
    asgn = (
        e.crossJoin(F.broadcast(coarse))
        .select(
            "vec_id",
            "v",
            "lst",
            "cv",
            _sqdist(F.col("v"), F.col("cv")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "lst",
            F.zip_with("v", "cv", lambda x, y: x - y).alias("rv"),
        )
    )
    sub = asgn.select(
        "vec_id",
        "lst",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                lambda m: F.struct(
                    m.alias("sub"),
                    F.slice("rv", m * _PQ_D + 1, _PQ_D).alias("sv"),
                ),
            )
        ).alias("s"),
    ).select("vec_id", "lst", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    # codebooks: residual slices of the first _PQ_K vectors (the q237
    # deterministic-init convention; training iterations live in q237)
    cb = sub.filter(F.col("vec_id") < _PQ_K).select(
        "sub",
        F.col("vec_id").cast("int").alias("code"),
        F.col("sv").alias("cbv"),
    )
    wc = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("cd2").asc(), F.col("code").asc()
    )
    enc = (
        sub.join(F.broadcast(cb), "sub")
        .select(
            "vec_id",
            "lst",
            "sub",
            "code",
            _sqdist(F.col("sv"), F.col("cbv")).alias("cd2"),
        )
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .groupBy("vec_id", "lst")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("sub"), F.col("code")))
            ).alias("sc")
        )
        .select(
            "vec_id",
            "lst",
            F.expr("transform(sc, p -> p.code)").alias("codes"),
        )
    )
    # --- search: probe lists, build LUTs, fold ADC ---
    q = e.filter(F.col("vec_id") < _ADC_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    wp = Window.partitionBy("qid").orderBy(
        F.col("qd2").asc(), F.col("lst").asc()
    )
    probe = (
        q.crossJoin(F.broadcast(coarse))
        .select(
            "qid",
            "qv",
            "lst",
            "cv",
            _sqdist(F.col("qv"), F.col("cv")).alias("qd2"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _ADC_NPROBE)
        .select(
            "qid",
            "lst",
            F.zip_with("qv", "cv", lambda x, y: x - y).alias("qrv"),
        )
    )
    lut = (
        probe.select(
            "qid",
            "lst",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                    lambda m: F.struct(
                        m.alias("sub"),
                        F.slice("qrv", m * _PQ_D + 1, _PQ_D).alias("qsv"),
                    ),
                )
            ).alias("s"),
        )
        .select("qid", "lst", F.col("s.sub").alias("sub"), F.col("s.qsv").alias("qsv"))
        .join(F.broadcast(cb), "sub")
        .select(
            "qid",
            "lst",
            "sub",
            "code",
            _sqdist(F.col("qsv"), F.col("cbv")).alias("ld2"),
        )
        .groupBy("qid", "lst")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("sub"), F.col("code"), F.col("ld2")))
            ).alias("cells")
        )
        .select(
            "qid",
            "lst",
            # cells is sorted by (sub, code) and dense, so cell (m, k)
            # sits at index m*K + k — pack to a [M][K] double grid
            # keyed by (sub, code), NOT dense position: a corpus with
            # fewer than K vectors trains a sparse codebook, where the
            # positional m·K+k arithmetic dereferences the wrong (or a
            # missing) cell (deg_one sweep) — the map lookup matches
            # the oracle's join-by-code semantics at any codebook size
            F.expr(
                f"map_from_entries(transform(cells, c -> "
                f"struct(c.sub * {_PQ_K} + c.code, c.ld2)))"
            ).alias("lut"),
        )
    )
    adc = enc.join(F.broadcast(lut), "lst").select(
        "qid",
        "vec_id",
        "lst",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            F.lit(0.0),
            lambda acc, m: acc
            + F.element_at(
                F.col("lut"),
                m * _PQ_K + F.element_at(F.col("codes"), m + 1),
            ),
        ).alias("adc"),
    )
    wr = Window.partitionBy("qid").orderBy(
        F.round(F.col("adc"), 6).asc(), F.col("vec_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _ADC_TOPK)
        .select(
            F.col("qid").cast("long").alias("qid"),
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("lst").cast("int").alias("list_id"),
            F.round(F.col("adc"), 6).alias("adc_d2"),
        )
    )


def _q238_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
coarse AS (
  SELECT CAST(vec_id AS INT) AS lst, v AS cv FROM e WHERE vec_id < {_ADC_C}
), asgn AS (
  SELECT vec_id, lst,
         list_transform(list_zip(v, cv), p -> p[1] - p[2]) AS rv
  FROM (
    SELECT e.vec_id, e.v, c.lst, c.cv,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_sqdist_sql('e.v', 'c.cv')} ASC, c.lst ASC) AS rn
    FROM e CROSS JOIN coarse c) WHERE rn = 1
), sub AS (
  SELECT vec_id, lst, m AS sub,
         rv[m * {_PQ_D} + 1 : (m + 1) * {_PQ_D}] AS sv
  FROM asgn, unnest(generate_series(0, {_PQ_M - 1})) AS ms(m)
), cb AS (
  SELECT sub, CAST(vec_id AS INT) AS code, sv AS cbv
  FROM sub WHERE vec_id < {_PQ_K}
), enc AS (
  SELECT vec_id, lst, sub, code FROM (
    SELECT s.vec_id, s.lst, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY {_sqdist_sql('s.sv', 'c.cbv')} ASC, c.code ASC) AS rn
    FROM sub s JOIN cb c USING (sub)) WHERE rn = 1
), q AS (
  SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_ADC_NQ}
), probe AS (
  SELECT qid, lst,
         list_transform(list_zip(qv, cv), p -> p[1] - p[2]) AS qrv
  FROM (
    SELECT q.qid, q.qv, c.lst, c.cv,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY {_sqdist_sql('q.qv', 'c.cv')} ASC, c.lst ASC) AS rn
    FROM q CROSS JOIN coarse c) WHERE rn <= {_ADC_NPROBE}
), lut AS (
  SELECT p.qid, p.lst, p.sub, c.code,
         {_sqdist_sql('p.qsv', 'c.cbv')} AS ld2
  FROM (
    SELECT qid, lst, m AS sub,
           qrv[m * {_PQ_D} + 1 : (m + 1) * {_PQ_D}] AS qsv
    FROM probe, unnest(generate_series(0, {_PQ_M - 1})) AS ms(m)) p
  JOIN cb c USING (sub)
), adc AS (
  SELECT l.qid, en.vec_id, en.lst,
         list_sum(list(l.ld2 ORDER BY l.sub)) AS adc
  FROM enc en
  JOIN lut l ON l.lst = en.lst AND l.sub = en.sub AND l.code = en.code
  GROUP BY 1, 2, 3
)
SELECT qid, CAST(rn AS INTEGER) AS rank, vec_id,
       lst AS list_id, ROUND(adc, 6) AS adc_d2
FROM (
  SELECT qid, vec_id, lst, adc,
         ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY ROUND(adc, 6) ASC, vec_id ASC) AS rn
  FROM adc) WHERE rn <= {_ADC_TOPK}
"""


# --------------------------------------------------------------------------
# q239 — MAXIMAL MARGINAL RELEVANCE selection (Carbonell & Goldstein
# 1998): the diversification rerank a retrieval / training-data
# selection pipeline runs AFTER ANN recall — greedily pick K items
# maximizing λ·rel(q, d) − (1−λ)·max_{s∈S} sim(d, s). Spark shape:
# the candidate list per query is BOUNDED (here 40; at scale, q33's
# IVF probe top-N), so MMR is a per-query Arrow batch — one
# applyInPandas group per qid, vectorized numpy inside, millions of
# queries parallelize across executors with a single hash shuffle on
# qid and zero candidate-set joins. The greedy loop is K iterations
# over an n-vector, not a DataFrame op — exactly the "bounded
# imperative core inside a grouped UDF" pattern the brief reserves
# Python for. Cross-engine bit-identity: all cosines fold the
# dimension axis left-to-right (numpy acc loop ↔ list_sum's list
# fold), the score is the literal expression 0.7·rel − 0.3·msim in
# both engines (msim is an order-independent MAX of bit-identical
# doubles), and argmax orders by the RAW score with cid tie-break, so
# the unrolled DuckDB twin reproduces every pick exactly.
# --------------------------------------------------------------------------

_MMR_NQ = 3  # queries: vec_id < 3
_MMR_LO = 3  # candidate pool: 3 <= vec_id < 43
_MMR_HI = 43
_MMR_K = 4  # picks per query
_MMR_LAM = 0.7
_MMR_ONE_MINUS_LAM = 0.3  # literal, NOT 1-0.7 (binary 0.30000000000000004)


def q239_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import IntegerType, StructField, StructType

    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    q = e.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cand = e.filter(
        (F.col("vec_id") >= _MMR_LO) & (F.col("vec_id") < _MMR_HI)
    ).select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    rows = q.join(F.broadcast(cand))  # bounded per-query candidate list

    out_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("rank", IntegerType()),
            StructField("vec_id", LongType()),
            StructField("rel", DoubleType()),
            StructField("score", DoubleType()),
        ]
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cid").reset_index(drop=True)
        qid = int(pdf["qid"].iloc[0])
        # NULL vectors → NaN rows (the oracle's NULL rel/sim); dim from
        # any non-null vector, degenerate 1 if the whole group is null
        vecs = list(pdf["cv"]) + [pdf["qv"].iloc[0]]
        dim0 = next((len(x) for x in vecs if x is not None), 1)

        def as_vec(x):
            return (
                np.full(dim0, np.nan)
                if x is None
                else np.asarray(x, dtype=np.float64)
            )

        qv = as_vec(pdf["qv"].iloc[0])
        C = np.stack([as_vec(x) for x in pdf["cv"]])
        ids = pdf["cid"].to_numpy()
        n, dim = C.shape
        # dimension-order left folds (the dot_seq contract) so every
        # double matches the DuckDB list_sum fold bit-for-bit
        dotqc = np.zeros(n)
        nc2 = np.zeros(n)
        nq2 = 0.0
        D = np.zeros((n, n))
        for d in range(dim):
            dotqc = dotqc + qv[d] * C[:, d]
            nc2 = nc2 + C[:, d] * C[:, d]
            nq2 = nq2 + qv[d] * qv[d]
            D = D + np.outer(C[:, d], C[:, d])
        ncs = np.sqrt(nc2)
        rel = dotqc / (np.sqrt(nq2) * ncs)
        S = D / np.outer(ncs, ncs)
        picked: list[int] = []
        msim = np.zeros(n)
        recs = []
        for t in range(1, _MMR_K + 1):
            if picked:
                score = _MMR_LAM * rel - _MMR_ONE_MINUS_LAM * msim
            else:
                score = _MMR_LAM * rel
            # NULLS-LAST ordering (score DESC, cid ASC) — NaN scores
            # sort after every real score, exactly as the oracle's
            # ROW_NUMBER treats NULL
            best = min(
                (i for i in range(n) if i not in picked),
                key=lambda i: (
                    bool(np.isnan(score[i])),
                    -score[i] if not np.isnan(score[i]) else 0.0,
                    ids[i],
                ),
            )
            recs.append(
                (qid, t, int(ids[best]), float(rel[best]), float(score[best]))
            )
            if picked:
                # fmax (NaN-ignoring) mirrors SQL MAX's NULL skipping
                msim = np.fmax(msim, S[:, best])
            else:
                msim = S[:, best].copy()
            picked.append(best)
        return pd.DataFrame(
            recs, columns=["qid", "rank", "vec_id", "rel", "score"]
        )

    res = rows.groupBy("qid").applyInPandas(mmr, out_schema)
    return res.select(
        F.col("qid").cast("long").alias("qid"),
        "rank",
        F.col("vec_id").cast("long").alias("vec_id"),
        F.round(F.col("rel"), 6).alias("rel_cos"),
        F.round(F.col("score"), 6).alias("mmr_score"),
    )


def _q239_sql() -> str:
    lam, oml = _MMR_LAM, _MMR_ONE_MINUS_LAM
    sim_rs = (
        f"{_dot_sql('a.cv', 'b.cv')} / ({_norm_sql('a.cv')} * {_norm_sql('b.cv')})"
    )
    ctes = [
        f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {_MMR_NQ}),
cand AS (
  SELECT vec_id AS cid, v AS cv FROM e
  WHERE vec_id >= {_MMR_LO} AND vec_id < {_MMR_HI}
), rel AS (
  SELECT q.qid, c.cid,
         {_dot_sql('q.qv', 'c.cv')} /
           ({_norm_sql('q.qv')} * {_norm_sql('c.cv')}) AS rel
  FROM q CROSS JOIN cand c
), sims AS (
  SELECT a.cid AS i, b.cid AS j, {sim_rs} AS sim
  FROM cand a JOIN cand b ON a.cid <> b.cid
), p1 AS (
  SELECT qid, cid, rel, {lam} * rel AS score FROM (
    SELECT qid, cid, rel, ROW_NUMBER() OVER (
      PARTITION BY qid ORDER BY {lam} * rel DESC, cid ASC) AS rn
    FROM rel) WHERE rn = 1
), s1 AS (SELECT qid, cid FROM p1)"""
    ]
    for t in range(2, _MMR_K + 1):
        ctes.append(
            f"""p{t} AS (
  SELECT qid, cid, rel, score FROM (
    SELECT g.qid, g.cid, g.rel, g.score, ROW_NUMBER() OVER (
      PARTITION BY g.qid ORDER BY g.score DESC, g.cid ASC) AS rn
    FROM (
      SELECT r.qid, r.cid, r.rel,
             {lam} * r.rel - {oml} * MAX(sm.sim) AS score
      FROM rel r
      JOIN s{t - 1} s ON s.qid = r.qid
      JOIN sims sm ON sm.i = r.cid AND sm.j = s.cid
      WHERE NOT EXISTS (
        SELECT 1 FROM s{t - 1} x WHERE x.qid = r.qid AND x.cid = r.cid)
      GROUP BY 1, 2, 3
    ) g) WHERE rn = 1
), s{t} AS (SELECT qid, cid FROM s{t - 1} UNION ALL SELECT qid, cid FROM p{t})"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT qid, {t} AS rank, cid, rel, score FROM p{t}"
        for t in range(1, _MMR_K + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT qid, CAST(rank AS INTEGER) AS rank, cid AS vec_id,
       ROUND(rel, 6) AS rel_cos, ROUND(score, 6) AS mmr_score
FROM ({unions})
"""
    )


# --------------------------------------------------------------------------
# q251 — GEOMETRIC MEDIAN per label via Weiszfeld iteration (Weiszfeld
# 1937; Cohen et al. STOC 2016 for the modern treatment): the
# L1-robust centroid an embedding-cleaning stage uses where q140's
# arithmetic mean is dragged by outlier vectors — the minimizer of
# Σ‖v − x‖ instead of Σ‖v − x‖². Three fixed rounds from the mean:
# x ← Σ(v/d_v) / Σ(1/d_v), d_v = max(‖v − x‖, ε). Output is the
# per-label median vector in long (label, dim, value) form plus each
# round's mean distance, pinning monotone descent.
#
# Scale posture: vectors live in LONG FORM (vec, dim, val) — all four
# stages per round are partial-aggregable hash shuffles on (label,dim)
# or vec_id, never a collect; the iterate x is labels×64 rows joined
# back broadcast-style. Corpus-size-independent state, fixed round
# count, no Python. The DuckDB twin unrolls the same three rounds.
# --------------------------------------------------------------------------

_GM_EPS = 1e-12
_GM_ROUNDS = 3


def q251_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    lng = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    ).persist()
    x = lng.groupBy("label", "dim").agg(F.avg("val").alias("m"))
    for _ in range(_GM_ROUNDS):
        d = (
            lng.join(x, ["label", "dim"])
            .groupBy("vec_id", "label")
            .agg(
                F.greatest(
                    F.sqrt(F.sum(F.pow(F.col("val") - F.col("m"), 2))),
                    F.lit(_GM_EPS),
                ).alias("d")
            )
        )
        x = (
            lng.join(d, ["vec_id", "label"])
            .groupBy("label", "dim")
            .agg(
                (F.sum(F.col("val") / F.col("d")) / F.sum(1.0 / F.col("d"))).alias(
                    "m"
                )
            )
        )
    fin = (
        lng.join(x, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum(F.pow(F.col("val") - F.col("m"), 2))).alias("d"))
        .groupBy("label")
        .agg(F.avg("d").alias("mean_dist"))
    )
    out = (
        x.join(fin, "label")
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            F.round("m", 6).alias("gm"),
            F.round("mean_dist", 6).alias("mean_dist"),
        )
        .localCheckpoint()
    )
    lng.unpersist()
    return out


def _q251_sql(rounds: int = _GM_ROUNDS, eps: float = _GM_EPS) -> str:
    steps = [
        """
lng AS MATERIALIZED (
  SELECT vec_id, label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS q(i)
),
x0 AS MATERIALIZED (
  SELECT label, dim, AVG(val) AS m FROM lng GROUP BY label, dim)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(
            f"""
d{k} AS (
  SELECT l.vec_id, l.label,
         GREATEST(sqrt(SUM((l.val - x.m) * (l.val - x.m))), {eps!r}) AS d
  FROM lng l JOIN x{p} x ON l.label = x.label AND l.dim = x.dim
  GROUP BY l.vec_id, l.label
),
x{k} AS MATERIALIZED (
  SELECT l.label, l.dim, SUM(l.val / d.d) / SUM(1.0 / d.d) AS m
  FROM lng l JOIN d{k} d ON l.vec_id = d.vec_id AND l.label = d.label
  GROUP BY l.label, l.dim)"""
        )
    return (
        "WITH "
        + ",".join(steps)
        + f""",
fin AS (
  SELECT label, AVG(d) AS mean_dist FROM (
    SELECT l.vec_id, l.label,
           sqrt(SUM((l.val - x.m) * (l.val - x.m))) AS d
    FROM lng l JOIN x{rounds} x ON l.label = x.label AND l.dim = x.dim
    GROUP BY l.vec_id, l.label
  ) GROUP BY label
)
SELECT x.label, CAST(x.dim AS BIGINT) AS dim, ROUND(x.m, 6) AS gm,
       ROUND(f.mean_dist, 6) AS mean_dist
FROM x{rounds} x JOIN fin f ON x.label = f.label"""
    )


# --------------------------------------------------------------------------
# q256 — K-CENTER coreset selection via Gonzalez farthest-point
# traversal (Gonzalez 1985; the 2-approximation for metric k-center;
# Sener & Savarese ICLR 2018 use exactly this for training-data core-
# set selection): start from the lowest vec_id, then 7 times add the
# point FARTHEST from the chosen set. Deterministic counterpart to
# q231's D²-sampled k-means|| seeding — max instead of coin flips.
# Reports each center with its round, assigned-point count, and
# cluster radius (the k-center objective).
#
# Scale posture: each round is one broadcast crossJoin against the
# ≤k-row chosen set + a partial-aggregable min — the argmax is a
# distributed TakeOrderedAndProject, never a global sort; rounds are
# localCheckpointed so the plan stays round-depth-free. Distances are
# rounded to 6dp before every argmax/assignment (ulp-stable across
# engines), ties break on vec_id.
# --------------------------------------------------------------------------

_KC_K = 8


def q256_kcenter_gonzalez(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    chosen = (
        e.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("cand"),
            F.col("v").alias("cv"),
            F.lit(0).cast("int").alias("rnd"),
        )
        .localCheckpoint()
    )
    for r in range(1, _KC_K):
        d = (
            e.crossJoin(F.broadcast(chosen.select("cv")))
            .groupBy("vec_id")
            .agg(
                F.round(
                    F.min(_sqdist(F.col("v"), F.col("cv"))), 6
                ).alias("d2")
            )
        )
        pick = (
            d.orderBy(F.desc("d2"), "vec_id")
            .limit(1)
            .join(e, "vec_id")
            .select(
                F.col("vec_id").alias("cand"),
                F.col("v").alias("cv"),
                F.lit(r).cast("int").alias("rnd"),
            )
        )
        chosen = chosen.union(pick).localCheckpoint()
    asgn_w = Window.partitionBy("vec_id").orderBy("d2", "cand")
    asgn = (
        e.crossJoin(F.broadcast(chosen.select("cand", "cv")))
        .select(
            "vec_id",
            "cand",
            F.round(_sqdist(F.col("v"), F.col("cv")), 6).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(asgn_w))
        .filter(F.col("rn") == 1)
    )
    return (
        asgn.groupBy("cand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned"),
            F.round(F.max("d2"), 6).alias("radius_sq"),
        )
        .join(chosen.select("cand", "rnd"), "cand")
        .select(
            F.col("cand").alias("center_vec_id"),
            F.col("rnd").cast("long").alias("round"),
            "n_assigned",
            "radius_sq",
        )
    )


def _q256_sql(k: int = _KC_K) -> str:
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        """c0 AS (
  SELECT vec_id AS cand, v AS cv, 0 AS rnd FROM e ORDER BY vec_id LIMIT 1
)""",
    ]
    for r in range(1, k):
        p = r - 1
        ctes.append(
            f"""dd{r} AS (
  SELECT e.vec_id, ROUND(MIN({_sqdist_sql('e.v', 'c.cv')}), 6) AS d2
  FROM e, c{p} c GROUP BY e.vec_id
),
p{r} AS (SELECT vec_id FROM dd{r} ORDER BY d2 DESC, vec_id LIMIT 1),
c{r} AS (
  SELECT * FROM c{p}
  UNION ALL
  SELECT e.vec_id, e.v, {r} FROM e JOIN p{r} USING (vec_id)
)"""
        )
    last = f"c{k - 1}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
asgn AS (
  SELECT vec_id, cand, d2 FROM (
    SELECT e.vec_id, c.cand,
           ROUND({_sqdist_sql('e.v', 'c.cv')}, 6) AS d2,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND({_sqdist_sql('e.v', 'c.cv')}, 6), c.cand)
             AS rn
    FROM e, {last} c
  ) WHERE rn = 1
)
SELECT a.cand AS center_vec_id, CAST(c.rnd AS BIGINT) AS round,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       ROUND(MAX(a.d2), 6) AS radius_sq
FROM asgn a JOIN {last} c ON a.cand = c.cand
GROUP BY a.cand, c.rnd"""
    )


# --------------------------------------------------------------------------
# q257 — IVF RECALL-vs-NPROBE curve (the tuning loop of Johnson,
# Douze & Jégou's FAISS IVF; nprobe is THE recall/cost knob): for
# nprobe ∈ {1, 2, 4}, each query searches only the corpus cells of its
# nprobe nearest centroids; recall@5 is measured against the exact
# brute-force top-5, alongside the mean number of candidates scanned —
# the curve an index operator reads before fixing nprobe in
# production. Extends q31 (assignment) / q33 (nprobe=1 search) /
# q202 (recall harness) into the full tradeoff audit.
#
# Scale posture: the corpus is assigned to cells ONCE (one narrow
# shuffle); each probe level joins the bounded query set (broadcast)
# against cell-pruned candidates — never all-pairs; the brute-force
# truth is bounded by |queries|×N, the eval cost any offline recall
# audit pays. All ranks order by 6dp-rounded sims (ulp-stable).
# --------------------------------------------------------------------------

_NPROBES = (1, 2, 4)


def q257_ivf_probe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    # plain posexplode: THIS oracle derives dims from
    # generate_series(1, len(v)), which is empty for a NULL vector —
    # null vectors contribute no centroid rows here, unlike q31/q33's
    # range-zipped (NULL-padded) twins (deg_nulls sweep)
    cent = (
        e.select("label", F.posexplode("v").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.try_divide(F.sum("x"), F.count("x")).alias("m"))
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
    wn = e.select("vec_id", "v", norm(F.col("v")).alias("nm"))
    csims = wn.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "c_label",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim"),
    )
    w_rank = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("c_label").asc()
    )
    ranked_cells = csims.withColumn(
        "rn", F.row_number().over(w_rank)
    ).persist()
    assign = ranked_cells.filter(F.col("rn") == 1).select(
        "vec_id", F.col("c_label").alias("cell")
    )
    cells = wn.join(assign, "vec_id").persist()
    q = F.broadcast(
        cells.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nm").alias("qn"),
        )
    )
    sim = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nm")), 6
    )
    # exact truth: brute-force top-5 per query
    w_q = Window.partitionBy("qid").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    truth = (
        cells.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w_q))
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id")
        .persist()
    )
    n_q = truth.select("qid").distinct().count()
    outs = []
    for p in _NPROBES:
        probes = ranked_cells.filter(
            (F.col("vec_id") < N_QUERY) & (F.col("rn") <= p)
        ).select(
            F.col("vec_id").alias("qid"), F.col("c_label").alias("cell")
        )
        cand = (
            cells.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("qid"))
            .join(F.broadcast(q.select("qid", "qv", "qn")), "qid")
            .select("qid", "vec_id", sim.alias("sim"))
        )
        scanned = cand.groupBy("qid").agg(
            F.count(F.lit(1)).alias("n_scanned")
        )
        top = (
            cand.withColumn("rk", F.row_number().over(w_q))
            .filter(F.col("rk") <= 5)
            .select("qid", "vec_id")
        )
        hits = top.join(truth, ["qid", "vec_id"]).count()
        mean_scanned = scanned.agg(
            F.avg("n_scanned").alias("ms")
        ).collect()[0]["ms"]
        # empty corpus: AVG over nothing is NULL and the recall divisor
        # is 0 — the oracle renders both as NULL (one row per nprobe)
        outs.append(
            (
                p,
                None if mean_scanned is None else float(mean_scanned),
                (hits / (5.0 * n_q)) if n_q else None,
            )
        )
    res = spark.createDataFrame(
        outs, "nprobe int, mean_scanned double, recall_at5 double"
    ).select(
        F.col("nprobe").cast("long").alias("nprobe"),
        F.round("mean_scanned", 2).alias("mean_scanned"),
        F.round("recall_at5", 6).alias("recall_at5"),
    )
    ranked_cells.unpersist()
    cells.unpersist()
    truth.unpersist()
    return res


def _q257_sql() -> str:
    branches = []
    for p in _NPROBES:
        branches.append(
            f"""
SELECT {p} AS nprobe,
       ROUND((SELECT AVG(ns) FROM (
          SELECT COUNT(*) AS ns FROM cand{p} GROUP BY qid)), 2)
         AS mean_scanned,
       ROUND((SELECT COUNT(*) FROM top{p} t JOIN truth USING (qid, vec_id))
             / (5.0 * (SELECT COUNT(DISTINCT qid) FROM truth)), 6)
         AS recall_at5"""
        )
    cand_ctes = []
    for p in _NPROBES:
        cand_ctes.append(
            f"""cand{p} AS (
  SELECT q.qid, c.vec_id,
         ROUND({_cos_sql('q.qv', 'c.v')}, 6) AS sim
  FROM cells c
  JOIN (SELECT vec_id AS qid, c_label AS cell FROM ranked
        WHERE vec_id < {N_QUERY} AND rn <= {p}) pr ON c.cell = pr.cell
  JOIN qset q ON q.qid = pr.qid
  WHERE c.vec_id <> q.qid
),
top{p} AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY sim DESC, vec_id) AS rk
    FROM cand{p}
  ) WHERE rk <= 5
)"""
        )
    return (
        f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
cent AS (
  SELECT label AS c_label, list(m ORDER BY d) AS cv FROM (
    SELECT label, d, AVG(x) AS m
    FROM (SELECT label, i - 1 AS d, CAST(v[i] AS DOUBLE) AS x
          FROM e, unnest(generate_series(1, len(v))) AS u(i))
    GROUP BY label, d
  ) GROUP BY label
),
ranked AS MATERIALIZED (
  SELECT e.vec_id, c.c_label,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_sql('e.v', 'c.cv')}, 6) DESC, c.c_label)
           AS rn
  FROM e, cent c
),
cells AS MATERIALIZED (
  SELECT e.vec_id, e.v, r.c_label AS cell
  FROM e JOIN ranked r ON e.vec_id = r.vec_id AND r.rn = 1
),
qset AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERY}),
truth AS MATERIALIZED (
  SELECT qid, vec_id FROM (
    SELECT q.qid, c.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY ROUND({_cos_sql('q.qv', 'c.v')}, 6) DESC, c.vec_id)
             AS rk
    FROM cells c, qset q WHERE c.vec_id <> q.qid
  ) WHERE rk <= 5
),
"""
        + ",\n".join(cand_ctes)
        + "\n"
        + "\nUNION ALL\n".join(branches)
    )


# --------------------------------------------------------------------------
# q259 — HARD-NEGATIVE MINING for contrastive training (Robinson et
# al. ICLR 2021; the in-batch-negatives upgrade every retrieval/
# embedding trainer runs): for each class centroid, the top-5 vectors
# from OTHER classes by cosine — the near-miss impostors whose
# gradients matter most. Output is the (anchor label, impostor, its
# true label, sim) mining table.
#
# Scale posture: centroids are a labels×dim aggregate broadcast
# against the corpus — one narrow pass, per-label top-k windows over
# the label-partitioned score stream; no vector-vector pair join.
# --------------------------------------------------------------------------


def q259_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    # plain posexplode: THIS oracle derives dims from
    # generate_series(1, len(v)), which is empty for a NULL vector —
    # null vectors contribute no centroid rows here, unlike q31/q33's
    # range-zipped (NULL-padded) twins (deg_nulls sweep)
    cent = (
        e.select("label", F.posexplode("v").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.try_divide(F.sum("x"), F.count("x")).alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("d"), F.col("m")))
            ).alias("ent")
        )
        .select(
            F.col("label").alias("anchor"),
            F.expr("transform(ent, e -> e.m)").alias("cv"),
        )
    )
    scored = (
        e.crossJoin(F.broadcast(cent))
        .filter(F.col("label") != F.col("anchor"))
        .select(
            "anchor",
            "vec_id",
            F.col("label").alias("true_label"),
            F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("anchor").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "anchor",
            F.col("rk").cast("long").alias("rank"),
            F.col("vec_id").alias("impostor_vec_id"),
            "true_label",
            "sim",
        )
    )


def _q259_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
cent AS (
  SELECT label AS anchor, list(m ORDER BY d) AS cv FROM (
    SELECT label, d, AVG(x) AS m
    FROM (SELECT label, i - 1 AS d, CAST(v[i] AS DOUBLE) AS x
          FROM e, unnest(generate_series(1, len(v))) AS u(i))
    GROUP BY label, d
  ) GROUP BY label
),
scored AS (
  SELECT c.anchor, e.vec_id, e.label AS true_label,
         ROUND({_cos_sql('e.v', 'c.cv')}, 6) AS sim
  FROM e, cent c WHERE e.label <> c.anchor
)
SELECT anchor, CAST(rk AS BIGINT) AS rank,
       vec_id AS impostor_vec_id, true_label, sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor
              ORDER BY sim DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= 5
"""


# --------------------------------------------------------------------------
# q260 — RANDOM FOURIER FEATURES kernel approximation audit (Rahimi &
# Recht NIPS 2007, test-of-time 2017): z(x) = √(2/D)·cos(Wx + b) with
# W ~ N(0, 2γI), b ~ U[0, 2π) makes z(x)·z(y) an unbiased estimator of
# the RBF kernel exp(−γ‖x−y‖²) — the trick that turns kernel methods
# into linear ones at corpus scale. Both the W draws (Box–Muller over
# md5-hash uniforms) and b are derived IN-PLAN from engine-portable
# hashes, so the two twins build bit-identical feature maps. The audit
# scores approximate vs exact kernel over the query×corpus pair grid:
# mean/max absolute error (theory: O(1/√D)).
#
# Scale posture: the feature map is a (dim → D) long-form join —
# corpus-linear, partial-aggregable, no pair join; only the bounded
# query set crosses the corpus for the audit comparison (the same
# cost envelope as q257's truth pass).
# --------------------------------------------------------------------------

_RFF_D = 32
_RFF_GAMMA = 0.25
_RFF_DENOM = float(1 << 60)


def q260_rff_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import md5long

    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    dims = e.select(F.posexplode("v").alias("i", "_x")).select(
        "i"
    ).distinct()
    feats = spark.range(_RFF_D).select(F.col("id").cast("int").alias("j"))
    u = lambda tag: (  # noqa: E731 — md5 uniform in (0,1), both engines
        md5long(F.concat_ws("|", F.lit(tag), F.col("j"), F.col("i")))
        + 0.5
    ) / F.lit(_RFF_DENOM)
    wtab = (
        feats.crossJoin(dims)
        .select(
            "j",
            "i",
            (
                F.sqrt(-2.0 * F.log(u("w1")))
                * F.cos(2.0 * math.pi * u("w2"))
                * math.sqrt(2.0 * _RFF_GAMMA)
            ).alias("w"),
        )
    )
    btab = feats.select(
        "j",
        (
            2.0
            * math.pi
            * (
                md5long(F.concat_ws("|", F.lit("b"), F.col("j"))) + 0.5
            )
            / F.lit(_RFF_DENOM)
        ).alias("b"),
    )
    lng = e.select("vec_id", F.posexplode("v").alias("i", "x"))
    z = (
        lng.join(F.broadcast(wtab), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("w") * F.col("x")).alias("s"))
        .join(F.broadcast(btab), "j")
        .select(
            "vec_id",
            "j",
            (
                math.sqrt(2.0 / _RFF_D)
                * F.cos(F.col("s") + F.col("b"))
            ).alias("z"),
        )
    )
    zarr = z.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(F.struct("j", "z"))
        ).alias("ent")
    ).select(
        "vec_id", F.expr("transform(ent, e -> e.z)").alias("zv")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERY)
        .join(zarr, "vec_id")
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("zv").alias("qz"),
        )
    )
    pairs = (
        e.join(zarr, "vec_id")
        .crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            (
                dot(F.col("qz"), F.col("zv"))
                - F.exp(
                    -_RFF_GAMMA * _sqdist(F.col("qv"), F.col("v"))
                )
            ).alias("err"),
            F.exp(-_RFF_GAMMA * _sqdist(F.col("qv"), F.col("v"))).alias(
                "k_exact"
            ),
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("err"))), 6).alias("mean_abs_err"),
        F.round(F.max(F.abs(F.col("err"))), 6).alias("max_abs_err"),
        F.round(F.avg("k_exact"), 6).alias("mean_k_exact"),
    )


def _q260_sql() -> str:
    from .common import MD5LONG_SQL

    denom = repr(_RFF_DENOM)
    u1 = MD5LONG_SQL.format(
        x="'w1' || '|' || CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)"
    )
    u2 = MD5LONG_SQL.format(
        x="'w2' || '|' || CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)"
    )
    ub = MD5LONG_SQL.format(x="'b' || '|' || CAST(j AS VARCHAR)")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (SELECT DISTINCT i - 1 AS i
         FROM e, unnest(generate_series(1, len(v))) AS g(i)),
feats AS (SELECT CAST(j AS INT) AS j
          FROM unnest(generate_series(0, {_RFF_D - 1})) AS f(j)),
wtab AS (
  SELECT j, i,
         sqrt(-2.0 * ln(({u1} + 0.5) / {denom}))
         * cos(2.0 * pi() * ({u2} + 0.5) / {denom})
         * sqrt(2.0 * {_RFF_GAMMA!r}) AS w
  FROM feats, dims
),
btab AS (
  SELECT j, 2.0 * pi() * ({ub} + 0.5) / {denom} AS b FROM feats
),
lng AS (
  SELECT vec_id, i - 1 AS i, CAST(v[i] AS DOUBLE) AS x
  FROM e, unnest(generate_series(1, len(v))) AS g(i)
),
z AS (
  SELECT s.vec_id, s.j,
         sqrt(2.0 / {_RFF_D}) * cos(s.s + b.b) AS z
  FROM (SELECT l.vec_id, w.j, SUM(w.w * l.x) AS s
        FROM lng l JOIN wtab w ON l.i = w.i
        GROUP BY l.vec_id, w.j) s
  JOIN btab b ON s.j = b.j
),
zarr AS (
  SELECT vec_id, list(z ORDER BY j) AS zv FROM z GROUP BY vec_id
),
q AS (
  SELECT e.vec_id AS qid, e.v AS qv, za.zv AS qz
  FROM e JOIN zarr za ON e.vec_id = za.vec_id
  WHERE e.vec_id < {N_QUERY}
),
pairs AS (
  SELECT {_dot_sql('q.qz', 'za.zv')}
         - exp(-{_RFF_GAMMA!r} * {_sqdist_sql('q.qv', 'e.v')}) AS err,
         exp(-{_RFF_GAMMA!r} * {_sqdist_sql('q.qv', 'e.v')}) AS k_exact
  FROM e JOIN zarr za ON e.vec_id = za.vec_id, q
  WHERE e.vec_id <> q.qid
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ABS(err)), 6) AS mean_abs_err,
       ROUND(MAX(ABS(err)), 6) AS max_abs_err,
       ROUND(AVG(k_exact), 6) AS mean_k_exact
FROM pairs
"""


# --------------------------------------------------------------------------
# q263 — GRADED RANKING METRICS for the retrieval stack (Järvelin &
# Kekäläinen 2002 for nDCG; the TREC MAP/MRR canon): per label,
# MRR@10, nDCG@5 and MAP@5 of the exact cosine ranking with same-label
# relevance — the eval bundle that complements q202's recall@5 (which
# only says WHETHER a relevant hit is in the top-k, not where).
# IDCG uses min(R, 5) relevant items, computed in-plan with a
# sequence fold so both engines state the same closed form.
#
# Scale posture: the ranking window is partitioned per query over the
# bounded query set's candidate stream; per-query metrics come from
# the top-10 rows only, then one per-label rollup. The query×corpus
# score pass is the same bounded eval envelope as q202/q257.
# --------------------------------------------------------------------------


def q263_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    wn = e.select("vec_id", "v", "label", norm(F.col("v")).alias("nm"))
    q = F.broadcast(
        wn.filter(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("label").alias("qlab"),
            F.col("nm").alias("qn"),
        )
    )
    labc = e.groupBy(F.col("label").alias("_rl")).agg(
        F.count(F.lit(1)).alias("label_n")
    )
    sim = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nm")), 6
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    top = (
        wn.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlab",
            sim.alias("sim"),
            "vec_id",
            (F.col("label") == F.col("qlab")).cast("int").alias("rel"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )
    wc = (
        Window.partitionBy("qid")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = top.withColumn("cum_rel", F.sum("rel").over(wc))
    per_q = scored.groupBy("qid", "qlab").agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("rel") == 1, 1.0 / F.col("rk")
                )
            ),
            F.lit(0.0),
        ).alias("mrr10"),
        F.sum(
            F.when(
                (F.col("rel") == 1) & (F.col("rk") <= 5),
                1.0 / F.log2(F.col("rk") + 1),
            ).otherwise(0.0)
        ).alias("dcg5"),
        F.sum(
            F.when(
                (F.col("rel") == 1) & (F.col("rk") <= 5),
                F.col("cum_rel") / F.col("rk"),
            ).otherwise(0.0)
        ).alias("ap_num"),
    )
    idcg = F.expr(
        "aggregate(sequence(1, int(least(label_n - 1, 5))), 0D,"
        " (acc, i) -> acc + 1.0 / log2(double(i) + 1.0))"
    )
    per_q = per_q.join(labc, per_q.qlab == F.col("_rl")).select(
        "qid",
        "qlab",
        "mrr10",
        (F.col("dcg5") / idcg).alias("ndcg5"),
        (
            F.col("ap_num") / F.least(F.col("label_n") - 1, F.lit(5))
        ).alias("ap5"),
    )
    return per_q.groupBy(F.col("qlab").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("mrr10"), 6).alias("mrr_at10"),
        F.round(F.avg("ndcg5"), 6).alias("ndcg_at5"),
        F.round(F.avg("ap5"), 6).alias("map_at5"),
    )


def _q263_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
labc AS (SELECT label, COUNT(*) AS label_n FROM e GROUP BY label),
q AS (SELECT vec_id AS qid, v AS qv, label AS qlab FROM e
      WHERE vec_id < {N_QUERY}),
top AS (
  SELECT * FROM (
    SELECT q.qid, q.qlab, c.vec_id,
           CASE WHEN c.label = q.qlab THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (PARTITION BY q.qid
             ORDER BY ROUND({_cos_sql('q.qv', 'c.v')}, 6) DESC, c.vec_id)
             AS rk
    FROM e c, q WHERE c.vec_id <> q.qid
  ) WHERE rk <= 10
),
scored AS (
  SELECT *, SUM(rel) OVER (PARTITION BY qid ORDER BY rk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel
  FROM top
),
per_q AS (
  SELECT qid, qlab,
         COALESCE(MAX(CASE WHEN rel = 1 THEN 1.0 / rk END), 0)
           AS mrr10,
         SUM(CASE WHEN rel = 1 AND rk <= 5
             THEN 1.0 / log2(rk + 1.0) ELSE 0 END) AS dcg5,
         SUM(CASE WHEN rel = 1 AND rk <= 5
             THEN cum_rel / (1.0 * rk) ELSE 0 END) AS ap_num
  FROM scored GROUP BY 1, 2
),
metr AS (
  SELECT p.qid, p.qlab, p.mrr10,
         p.dcg5 / list_sum(list_transform(
           generate_series(1, CAST(LEAST(l.label_n - 1, 5) AS INT)),
           i -> 1.0 / log2(i + 1.0))) AS ndcg5,
         p.ap_num / LEAST(l.label_n - 1, 5) AS ap5
  FROM per_q p JOIN labc l ON p.qlab = l.label
)
SELECT qlab AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(AVG(mrr10), 6) AS mrr_at10,
       ROUND(AVG(ndcg5), 6) AS ndcg_at5,
       ROUND(AVG(ap5), 6) AS map_at5
FROM metr GROUP BY qlab
"""


# --------------------------------------------------------------------------
# q315 — embedding ISOTROPY audit (Ethayarajh EMNLP 2019; Mu & Viswanath
# ICLR 2018 "all-but-the-top"): for unit-normalized vectors the average
# pairwise cosine equals ‖mean(û)‖² up to the 1/n self-term, so the
# squared norm of the mean unit vector IS the anisotropy score — O(n),
# never a pair join. Scored twice: raw, and after per-dimension
# standardization (the whitening-lite that removes the common-mean
# component); a healthy post-whitening score is ≈ 0. Long-form
# posexplode → per-dim moment agg (broadcast back) → per-vector norms
# via JVM array folds — corpus-linear, three partial-agg shuffles.
# --------------------------------------------------------------------------


def q315_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings")).select("vec_id", "v")
    lng = e.select("vec_id", F.posexplode("v").alias("i", "x"))
    dimstats = lng.groupBy("i").agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd")
    )

    def mean_unit_sq(df, xcol):
        # ‖mean over vectors of (x/‖v‖)‖² from long form: per-vector
        # norm, normalize, per-dim mean, then Σ mean².
        norms = df.groupBy("vec_id").agg(
            F.sqrt(F.sum(F.col(xcol) * F.col(xcol))).alias("nrm")
        )
        unit = df.join(norms, "vec_id").select(
            "i", (F.col(xcol) / F.col("nrm")).alias("u")
        )
        dm = unit.groupBy("i").agg(F.avg("u").alias("m"))
        return dm.agg(F.sum(F.col("m") * F.col("m")).alias("s"))

    raw = mean_unit_sq(lng, "x").select(
        F.col("s").alias("iso_raw")
    )
    wl = lng.join(F.broadcast(dimstats), "i").select(
        "vec_id", "i", ((F.col("x") - F.col("mu")) / F.col("sd")).alias("xw")
    )
    white = mean_unit_sq(wl, "xw").select(F.col("s").alias("iso_white"))
    n = e.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.size("v")).cast("long").alias("dim"),
    )
    return (
        n.crossJoin(raw)
        .crossJoin(white)
        .select(
            "n",
            "dim",
            F.round("iso_raw", 6).alias("anisotropy_raw"),
            F.round("iso_white", 6).alias("anisotropy_whitened"),
            F.round(F.col("iso_raw") - F.col("iso_white"), 6).alias(
                "reduction"
            ),
        )
    )


Q315_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
lng AS (
  SELECT vec_id, i - 1 AS i, CAST(v[i] AS DOUBLE) AS x
  FROM e, unnest(generate_series(1, len(v))) AS u(i)
), dimstats AS (
  SELECT i, AVG(x) AS mu, STDDEV_SAMP(x) AS sd FROM lng GROUP BY 1
), nr AS (
  SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM lng GROUP BY 1
), dm_raw AS (
  SELECT l.i, AVG(l.x / nr.nrm) AS m
  FROM lng l JOIN nr ON nr.vec_id = l.vec_id GROUP BY 1
), iso_raw AS (SELECT SUM(m * m) AS s FROM dm_raw),
wl AS (
  SELECT l.vec_id, l.i, (l.x - d.mu) / d.sd AS xw
  FROM lng l JOIN dimstats d ON d.i = l.i
), nrw AS (
  SELECT vec_id, SQRT(SUM(xw * xw)) AS nrm FROM wl GROUP BY 1
), dm_w AS (
  SELECT w.i, AVG(w.xw / nrw.nrm) AS m
  FROM wl w JOIN nrw ON nrw.vec_id = w.vec_id GROUP BY 1
), iso_w AS (SELECT SUM(m * m) AS s FROM dm_w),
nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MAX(len(v)) AS BIGINT) AS dim
  FROM e
)
SELECT nn.n, nn.dim,
       ROUND(iso_raw.s, 6) AS anisotropy_raw,
       ROUND(iso_w.s, 6) AS anisotropy_whitened,
       ROUND(iso_raw.s - iso_w.s, 6) AS reduction
FROM nn CROSS JOIN iso_raw CROSS JOIN iso_w
"""


# --------------------------------------------------------------------------
# q328 — k-NN hubness audit (Radovanović et al. JMLR 2010): the
# k-occurrence distribution N_k(x) = how often each vector appears in
# other vectors' top-K — high-dimensional spaces grow "hubs" that
# pollute ANN results and "anti-hubs" that are never retrieved. One
# summary row: skewness of N_k (the canonical hubness score), the
# anti-hub count (N_k = 0), the max, and the argmax hub. Small-scale
# baseline uses the exact all-pairs graph (the q29 idiom — fine at the
# bounded embedding-table size); at corpus scale the identical
# aggregation runs over the q30/q33 LSH/IVF candidate graph instead of
# the cross join — the downstream moments are candidate-set agnostic.
# The top-K window partitions by query_id: distributed.
# --------------------------------------------------------------------------

_HUB_K = 5


def q328_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    en = e.select("vec_id", "v", norm(F.col("v")).alias("n"))
    q = en.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    top = (
        en.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HUB_K)
    )
    occ = top.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("double").alias("occ")
    )
    full = (
        en.select("vec_id")
        .join(occ, "vec_id", "left")
        .withColumn("occ", F.coalesce("occ", F.lit(0.0)))
    )
    key = F.format_string(
        "%010.0f|%010d", F.col("occ"), F.lit(10**10) - F.col("vec_id")
    )
    g = full.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("occ").alias("m1"),
        F.avg(F.col("occ") * F.col("occ")).alias("m2r"),
        F.avg(F.col("occ") * F.col("occ") * F.col("occ")).alias("m3r"),
        F.count_if(F.col("occ") == 0).cast("long").alias("n_antihub"),
        F.max("occ").alias("max_occ"),
        F.max(key).alias("hubkey"),
    )
    m2 = F.col("m2r") - F.col("m1") * F.col("m1")
    m3 = (
        F.col("m3r")
        - 3.0 * F.col("m1") * F.col("m2r")
        + 2.0 * F.col("m1") * F.col("m1") * F.col("m1")
    )
    return g.select(
        F.col("n").cast("long").alias("n_vecs"),
        F.round(F.col("m1"), 6).alias("mean_k_occ"),
        # try_divide: constant occupancy (1 vector) → zero variance
        F.round(F.try_divide(m3, F.pow(m2, 1.5)), 6).alias("skewness"),
        "n_antihub",
        F.col("max_occ").cast("long").alias("max_occ"),
        (
            F.lit(10**10)
            - F.substring(F.col("hubkey"), 12, 10).cast("long")
        ).alias("hub_vec_id"),
    )


def _q328_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sims AS (
  SELECT q.vec_id AS query_id, e.vec_id,
         {_cos_sql('q.v', 'e.v')} AS sim
  FROM e CROSS JOIN e q WHERE e.vec_id <> q.vec_id
), top AS (
  SELECT vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, vec_id ASC) AS rk
    FROM sims) WHERE rk <= {_HUB_K}
), occ AS (
  SELECT e.vec_id,
         CAST(COALESCE(o.c, 0) AS DOUBLE) AS occ
  FROM e LEFT JOIN (
    SELECT vec_id, COUNT(*) AS c FROM top GROUP BY 1) o
  ON o.vec_id = e.vec_id
), g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(occ) AS m1,
         AVG(occ * occ) AS m2r, AVG(occ * occ * occ) AS m3r,
         CAST(COUNT(*) FILTER (WHERE occ = 0) AS BIGINT) AS n_antihub,
         MAX(occ) AS max_occ,
         MAX(printf('%010.0f|%010d', occ,
                    10000000000 - vec_id)) AS hubkey
  FROM occ
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       ROUND(m1, 6) AS mean_k_occ,
       ROUND((m3r - 3.0 * m1 * m2r + 2.0 * m1 * m1 * m1)
             / POW(m2r - m1 * m1, 1.5), 6) AS skewness,
       n_antihub,
       CAST(max_occ AS BIGINT) AS max_occ,
       10000000000 - CAST(substr(hubkey, 12, 10) AS BIGINT)
         AS hub_vec_id
FROM g
"""


# --------------------------------------------------------------------------
# q329 — mutual-kNN reciprocity audit (the mutual-graph pruning
# diagnostic behind UMAP's fuzzy union and mutual-kNN clustering): the
# fraction of directed top-K edges whose reverse edge also exists.
# Low reciprocity co-occurs with high hubness (q328) — hubs absorb
# in-edges they never return — so the pair (skewness, reciprocity) is
# the standard ANN-graph health readout. Same candidate-graph caveat
# as q328: exact all-pairs here, LSH/IVF candidates at corpus scale.
# Per-label breakdown keeps the readout actionable (which class's
# neighborhood structure is degenerate).
# --------------------------------------------------------------------------


def q329_knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    en = e.select("vec_id", "v", "label", norm(F.col("v")).alias("n"))
    q = en.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlab"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
    )
    sim = dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    top = (
        en.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qlab", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HUB_K)
        .select("query_id", "qlab", "vec_id")
    )
    rev = top.select(
        F.col("vec_id").alias("query_id"),
        F.col("query_id").alias("vec_id"),
        F.lit(1).alias("mutual"),
    )
    j = top.join(rev, ["query_id", "vec_id"], "left")
    return (
        j.groupBy(F.col("qlab").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.coalesce("mutual", F.lit(0)))
            .cast("long")
            .alias("n_mutual"),
        )
        .select(
            "label",
            "n_edges",
            "n_mutual",
            F.round(F.col("n_mutual") / F.col("n_edges"), 6).alias(
                "reciprocity"
            ),
        )
    )


def _q329_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), sims AS (
  SELECT q.vec_id AS query_id, q.label AS qlab, e.vec_id,
         {_cos_sql('q.v', 'e.v')} AS sim
  FROM e CROSS JOIN e q WHERE e.vec_id <> q.vec_id
), top AS (
  SELECT query_id, qlab, vec_id FROM (
    SELECT query_id, qlab, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, vec_id ASC) AS rk
    FROM sims) WHERE rk <= {_HUB_K}
)
SELECT t.qlab AS label,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(r.query_id) AS BIGINT) AS n_mutual,
       ROUND(COUNT(r.query_id) / (1.0 * COUNT(*)), 6) AS reciprocity
FROM top t LEFT JOIN top r
  ON r.query_id = t.vec_id AND r.vec_id = t.query_id
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q345 — JOHNSON-LINDENSTRAUSS PROJECTION distortion audit: project
# the 64-d embeddings to k=16 with the Achlioptas ±1 scheme (sign from
# the same exact-rational LCG family as q30's SRP planes, so both
# engines derive identical signs) and measure how well pairwise
# squared distances survive: per consecutive-id pair, ratio =
# ‖y_a−y_b‖² / ‖x_a−x_b‖². JL theory says the ratio concentrates
# around 1 with σ ≈ √(2/k) ≈ 0.35 — the audit reports the observed
# mean/min/max and the within-[0.5, 1.5] mass, the number that decides
# whether a 4× cheaper index (16-d kernels, 4× smaller ANN memory) is
# safe to build on. Scale: the projection is a narrow per-row map
# (16 sequential folds over 64 elements, whole-stage codegen); the
# audit pairs are a bounded consecutive-id self-join, never all-pairs.
# Per-pair arithmetic is a deterministic left fold in both engines;
# only the 6dp-rounded MEAN aggregates across rows.
# --------------------------------------------------------------------------

_JL_K = 16


def _jl_proj(v: Column) -> Column:
    """k=16 Achlioptas projection: y_j = Σ_i s(j,i)·v_i / √k with
    s(j,i) = +1 iff (1009·t² + 9176·t + 1) mod 2003 < 1001 for the
    flat index t = 64j + i. The QUADRATIC in t matters: a bilinear
    j·a + i·b scheme makes rows j and j+2 near-identical
    (2·1009 ≡ 15 mod 2003), collapsing the projection to effective
    rank ≈ 2; the quadratic walks each row through a disjoint,
    well-mixed residue block (measured max row correlation 0.26,
    mean ratio 0.99)."""
    def signer(j: int):
        def f(x, i):
            t = F.lit(64 * j) + i
            return F.when(
                (_PA * t * t + _PB * t + 1) % _PM < 1001, x
            ).otherwise(-x)

        return f

    comps = []
    for j in range(_JL_K):
        signed = F.transform(v, signer(j))
        comps.append(
            F.aggregate(signed, F.lit(0.0), lambda a, x: a + x)
            / F.lit(4.0)
        )
    return F.array(*comps)


def q345_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    p = e.select("vec_id", "v", _jl_proj(F.col("v")).alias("y"))
    a = p.select(
        F.col("vec_id").alias("ida"),
        F.col("v").alias("va"),
        F.col("y").alias("ya"),
    )
    b = p.select(
        (F.col("vec_id") - 1).alias("ida"),
        F.col("v").alias("vb"),
        F.col("y").alias("yb"),
    )
    d2 = lambda l, r: F.aggregate(  # noqa: E731
        F.zip_with(l, r, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, "ida")
        .select(
            # try_divide: identical adjacent vectors → NULL ratio
            F.try_divide(
                d2(F.col("ya"), F.col("yb")), d2(F.col("va"), F.col("vb"))
            ).alias("ratio")
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("ratio"), 6).alias("mean_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
        # try_divide: zero pairs → NULL share (DuckDB x/0)
        F.round(
            F.try_divide(
                F.count_if(
                    (F.col("ratio") >= 0.5) & (F.col("ratio") <= 1.5)
                ),
                F.count(F.lit(1)),
            ),
            6,
        ).alias("within_50pct"),
    )


def _q345_sql() -> str:
    comps = ", ".join(
        f"list_sum(list_transform(v, (x, i) -> CASE WHEN "
        f"(({_PA} * ({64 * j} + i - 1) * ({64 * j} + i - 1)"
        f" + {_PB} * ({64 * j} + i - 1) + 1) % {_PM}) < 1001 "
        f"THEN x ELSE -x END)) / 4.0"
        for j in range(_JL_K)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), p AS (
  SELECT vec_id, v, [{comps}] AS y FROM e
), pr AS (
  SELECT
    list_sum(list_transform(list_zip(a.y, b.y),
             q -> (q[1] - q[2]) * (q[1] - q[2])))
    / list_sum(list_transform(list_zip(a.v, b.v),
             q -> (q[1] - q[2]) * (q[1] - q[2]))) AS ratio
  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ratio), 6) AS mean_ratio,
       ROUND(MIN(ratio), 6) AS min_ratio,
       ROUND(MAX(ratio), 6) AS max_ratio,
       ROUND(COUNT(*) FILTER (WHERE ratio BETWEEN 0.5 AND 1.5)
             / (1.0 * COUNT(*)), 6) AS within_50pct
FROM pr
"""


# --------------------------------------------------------------------------
# q348 — MAXIMUM INNER PRODUCT SEARCH via the NN reduction: retrieval
# scores are inner products (not cosine) whenever the index stores
# unnormalized embeddings with popularity-scaled norms. The classic
# reduction (Bachrach et al.): augment every corpus vector with
# x̃ = [x, √(M²−‖x‖²)] (M = max corpus norm, a broadcast 1-row agg)
# and queries with q̃ = [q, 0]; then ‖q̃−x̃‖² = ‖q‖² + M² − 2⟨q,x⟩, so
# cosine/L2 ANN machinery (q30-q33) ranks by inner product exactly.
# The query emits, per query, the top-3 by DIRECT dot product along
# with the augmented-space cosine — monotone-agreement between the
# two columns is the correctness certificate the reduction rides on
# (pinned by the batch-31 tests; rank ties broken by neighbor id).
# Scale: queries broadcast; per-row fold arithmetic; top-k windows
# partition by query id.
# --------------------------------------------------------------------------


def q348_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vec(load(spark, sf_dir, "embeddings"))
    en = e.select("vec_id", "v", norm(F.col("v")).alias("n"))
    mx = en.agg(F.max("n").alias("m"))
    q = F.broadcast(
        en.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("n").alias("qn"),
        )
    )
    cand = (
        en.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .crossJoin(F.broadcast(mx))
    )
    ip = dot(F.col("qv"), F.col("v"))
    # augmented-space cosine: ⟨q̃,x̃⟩ / (‖q̃‖·‖x̃‖) = ⟨q,x⟩ / (‖q‖·M)
    aug_cos = ip / (F.col("qn") * F.col("m"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        ip.alias("ip"),
        aug_cos.alias("aug_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ip").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            r4(F.col("ip")).alias("ip"),
            F.round("aug_cos", 6).alias("aug_cos"),
        )
    )


def _q348_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), en AS (
  SELECT vec_id, v, {_norm_sql('v')} AS n FROM e
), mx AS (SELECT MAX(n) AS m FROM en),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_dot_sql('q.v', 'c.v')} AS ip,
         {_dot_sql('q.v', 'c.v')} / (q.n * mx.m) AS aug_cos
  FROM en q JOIN en c ON c.vec_id <> q.vec_id
  CROSS JOIN mx
  WHERE q.vec_id < 5
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY ip DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       ROUND(ip, 4) AS ip, ROUND(aug_cos, 6) AS aug_cos
FROM ranked WHERE rank <= 3
"""


QUERIES = {
    "q348_mips_topk": q348_mips_topk,
    "q345_jl_distortion": q345_jl_distortion,
    "q329_knn_reciprocity": q329_knn_reciprocity,
    "q328_knn_hubness": q328_knn_hubness,
    "q263_ranking_metrics": q263_ranking_metrics,
    "q315_isotropy_audit": q315_isotropy_audit,
    "q260_rff_kernel": q260_rff_kernel,
    "q257_ivf_probe_recall": q257_ivf_probe_recall,
    "q259_hard_negatives": q259_hard_negatives,
    "q256_kcenter_gonzalez": q256_kcenter_gonzalez,
    "q251_geometric_median": q251_geometric_median,
    "q239_mmr_select": q239_mmr_select,
    "q238_ivfpq_adc": q238_ivfpq_adc,
    "q237_pq_codebooks": q237_pq_codebooks,
    "q231_kmeanspp_seed": q231_kmeanspp_seed,
    "q202_label_recall_at5": q202_label_recall_at5,
    "q203_lsh_pr_curve": q203_lsh_pr_curve,
    "q204_assignment_purity": q204_assignment_purity,
    "q168_pca_power": q168_pca_power,
    "q140_label_centroids": q140_label_centroids,
    "q29_knn_bruteforce": q29_knn_bruteforce,
    "q30_lsh_neardup": q30_lsh_neardup,
    "q31_ivf_assign": q31_ivf_assign,
    "q33_ivf_probe_knn": q33_ivf_probe_knn,
    "q84_kmeans": q84_kmeans,
    "q98_semdedup": q98_semdedup,
}

ORACLES = {
    "q348_mips_topk": _q348_sql(),
    "q345_jl_distortion": _q345_sql(),
    "q329_knn_reciprocity": _q329_sql(),
    "q328_knn_hubness": _q328_sql(),
    "q315_isotropy_audit": Q315_SQL,
    "q263_ranking_metrics": _q263_sql(),
    "q260_rff_kernel": _q260_sql(),
    "q257_ivf_probe_recall": _q257_sql(),
    "q259_hard_negatives": _q259_sql(),
    "q256_kcenter_gonzalez": _q256_sql(),
    "q251_geometric_median": _q251_sql(),
    "q239_mmr_select": _q239_sql(),
    "q238_ivfpq_adc": _q238_sql(),
    "q237_pq_codebooks": _q237_sql(),
    "q231_kmeanspp_seed": _q231_sql(),
    "q202_label_recall_at5": Q202_SQL,
    "q203_lsh_pr_curve": _q203_sql(),
    "q204_assignment_purity": _q204_sql(),
    "q168_pca_power": _q168_sql(),
    "q140_label_centroids": _q140_sql(),
    "q29_knn_bruteforce": Q29_SQL,
    "q30_lsh_neardup": Q30_SQL,
    "q31_ivf_assign": Q31_SQL,
    "q33_ivf_probe_knn": Q33_SQL,
    "q84_kmeans": _q84_sql(),
    "q98_semdedup": Q98_SQL,
}
