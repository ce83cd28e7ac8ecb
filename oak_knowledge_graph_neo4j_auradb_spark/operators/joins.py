"""Stage X/J — join-key normalization, array explode, multi-source join.

Reference semantics (/root/reference):
* explode ``programme_slug_by_year`` on BOTH sides before the composite
  join — hasura_extractor.py:132-143,210-221; row-count effect
  HISTORY.md:714.
* strip the ``-<digits>`` unitvariant suffix from the join side's
  ``unit_slug`` — hasura_extractor.py:186-208.
* ordered left merge on the composite key
  ``(unit_slug, programme_slug_by_year)`` — hasura_extractor.py:222-247;
  config ``join_strategy`` (...alpha.json:135-154).

Scale design: the supplementary side is unit-level (orders of magnitude
smaller than the lesson-level primary), so it is broadcast by default —
no shuffle of the 10^12-row side at all. When the dimension outgrows the
broadcast threshold the same plan falls back to a shuffled join where
AQE's skew-join splitting handles hot units (spark.sql.adaptive.skewJoin
is enabled in session.py). The deterministic order key
``(_row_seq, _psby_pos, _sup_seq, _sup_pos)`` replaces pandas' implicit
row order so downstream first-seen dedup is reproducible under any
parallelism (SURVEY.md §7.4 risk 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import normalize_unit_slug

PSBY = "programme_slug_by_year"


def explode_join_key_array(
    df: DataFrame, col: str = PSBY, pos_name: str = "_psby_pos"
) -> DataFrame:
    """Explode a join-key column that may hold a JSON-encoded string
    array (the reconstruction renders list values as JSON text). Scalar
    values pass through with position 0; null stays null (pandas
    ``explode`` keeps NaN rows, hasura_extractor.py:140-142)."""
    parsed = F.when(
        F.trim(F.col(col)).startswith("["),
        F.from_json(F.col(col), "array<string>"),
    ).otherwise(F.array(F.col(col)))
    parsed = F.coalesce(parsed, F.array(F.col(col)))
    other = [c for c in df.columns if c != col]
    return df.select(
        *other, F.posexplode_outer(parsed).alias(pos_name, col)
    )


def prepare_supplementary(sup: DataFrame) -> DataFrame:
    """Join-side prep: suffix-normalize ``unit_slug``, explode the
    array join key, and rename the order bookkeeping columns."""
    sup = sup.withColumn("unit_slug", normalize_unit_slug(F.col("unit_slug")))
    sup = explode_join_key_array(sup, PSBY, "_sup_pos")
    return sup.withColumnRenamed("_row_seq", "_sup_seq").drop("doc_id")


def consolidate(
    primary: DataFrame, supplementary: DataFrame, broadcast_sup: bool = True
) -> DataFrame:
    """The reference's multi-source join (hasura_extractor.py:100-258):
    primary (exploded) LEFT JOIN supplementary (normalized + exploded)
    ON (unit_slug, programme_slug_by_year).

    Output carries ``_ord = struct(_row_seq, _psby_pos, _sup_seq,
    _sup_pos)`` — the total order equal to the reference's consolidated
    CSV row order (pandas left merge preserves left order; multiple right
    matches append in right order)."""
    left = explode_join_key_array(primary, PSBY, "_psby_pos")
    right = prepare_supplementary(supplementary)
    if broadcast_sup:
        right = F.broadcast(right)
    joined = left.join(right, on=["unit_slug", PSBY], how="left")
    return joined.withColumn(
        "_ord",
        F.struct(
            F.col("_row_seq"),
            F.col("_psby_pos"),
            F.coalesce(F.col("_sup_seq"), F.lit(-1)).alias("_sup_seq"),
            F.coalesce(F.col("_sup_pos"), F.lit(-1)).alias("_sup_pos"),
        ),
    )
