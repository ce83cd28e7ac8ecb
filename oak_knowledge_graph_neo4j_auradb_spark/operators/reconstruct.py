"""Stage S — span-sequence → consolidated wide-table reconstruction.

The interleaved document encodes one source-MV row as ordered spans
(FIXTURES.md §1); this stage inverts the encoding, recovering the
reference's consolidated wide table (`hasura_extractor.py:249-258`)
directly from the document table.

Scale design:
* The fast path (:func:`reconstruct_wide`) is **pure Catalyst** — per-row
  `array_sort` → `transform` → `map_from_entries` → typed projections.
  No shuffle, no Python: at 10^12 docs this is a single narrow
  WholeStageCodegen scan stage, and unreferenced columns prune all the
  way into the parquet/Iceberg reader (nested-schema pruning keeps only
  the spans needed when combined with a span-kind filter).
* :func:`reconstruct_wide_pandas` is the Arrow/`mapInPandas` variant
  (input_hint requires vectorized-UDF stages); it exists for parity
  testing and as the extension point where real mention/NER models would
  run. Identical output contract.
* The per-row invariant — span-sequence equality on
  ``(kind, text, media_ref, rank(offset))`` — is checkable cheaply at any
  pipeline point via :func:`span_fingerprint` (a 64-bit hash; comparing
  fingerprints across a repartition/transform proves order preservation
  without materializing spans twice).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..config.curriculum_schema import (
    PRIMARY_COLUMNS,
    SUPPLEMENTARY_COLUMNS,
    column_dtype,
)
from ..functions.xxh64 import xxhash64_str

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)
DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_STRUCT)),
    ]
)

#: spans ordered by the data-carried ordering key — order is data, not
#: physical layout (SURVEY.md §2.7)
_SORTED_SPANS = (
    "array_sort(spans, (l, r) -> CASE WHEN l.offset < r.offset THEN -1 "
    "WHEN l.offset > r.offset THEN 1 ELSE 0 END)"
)

#: field-name/value entries: name is the text before the first '=',
#: value is the remainder (or media_ref for media spans)
_KV_ENTRIES = f"""
    transform({_SORTED_SPANS}, s -> struct(
        substring_index(s.text, '=', 1) AS k,
        CASE WHEN s.kind = 'media' THEN s.media_ref
             ELSE substring(s.text, length(substring_index(s.text, '=', 1)) + 2)
        END AS v))
"""

#: same entries with xxhash64(name) keys. The wide projection does ~61
#: map lookups per row; with string keys each lookup linearly scans the
#: 62-entry map comparing long shared-prefix names ("programme_…") — the
#: dominant per-row cost at scale. int64 keys make every compare one
#: machine word (measured ~2.5× on the 61-column projection).
#:
#: Deliberately UNSORTED spans: element order cannot influence the k→v
#: map — field names are unique per doc, and a duplicate would make
#: map_from_entries throw (spark.sql.mapKeyDedupPolicy=EXCEPTION), so
#: sorting buys nothing here. Higher-order-function lambdas evaluate on
#: the interpreted path (no codegen), so the per-element comparator was
#: ~30% of the whole pivot. Order-sensitive consumers (media_assets,
#: span_fingerprint) still sort.
_KV_ENTRIES_HASHED = f"""
    transform(spans, s -> struct(
        xxhash64(substring_index(s.text, '=', 1)) AS k,
        CASE WHEN s.kind = 'media' THEN s.media_ref
             ELSE substring(s.text, length(substring_index(s.text, '=', 1)) + 2)
        END AS v))
"""

def _key_hashes(docs: DataFrame, keys: list[str]) -> dict[str, int]:
    """xxhash64 of each column name, computed driver-side in pure
    Python (functions/xxh64.py is pytest-pinned bit-equal to the
    executor's xxhash64) — the JVM round trip this used to cost was a
    real Spark job on every cold plan build."""
    return {k: xxhash64_str(k) for k in keys}


def _typed(col: Column, dtype: str) -> Column:
    if dtype == "long":
        return col.try_cast("long")
    if dtype == "double":
        return col.try_cast("double")
    if dtype == "boolean":
        return (
            F.when(F.lower(col) == "true", F.lit(True))
            .when(F.lower(col) == "false", F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    return col


def row_seq(doc_id: Column) -> Column:
    """Extraction-order total key embedded in doc_id (``doc-%07d``) —
    anchors the reference's input-order-dependent first-seen dedup
    (schema_mapper.py:86,172-176)."""
    return F.substring(doc_id, 5, 10).cast("long")


def _typed_sql(inner: str, dtype: str) -> str:
    if dtype == "long":
        return f"TRY_CAST({inner} AS BIGINT)"
    if dtype == "double":
        return f"TRY_CAST({inner} AS DOUBLE)"
    if dtype == "boolean":
        return (
            f"CASE WHEN lower({inner}) = 'true' THEN true "
            f"WHEN lower({inner}) = 'false' THEN false "
            f"ELSE CAST(NULL AS BOOLEAN) END"
        )
    return inner


def reconstruct_wide(
    docs: DataFrame, mv: str, columns: tuple[str, ...] | None = None
) -> DataFrame:
    """documents → wide table for one source MV. Pure Catalyst.

    Projections are built as SQL strings and submitted in ONE
    ``selectExpr`` — per-column Column construction costs a py4j round
    trip each (~2 ms × 61 columns × 2 MVs of pure driver latency on
    every plan build); string assembly is free."""
    if columns is None:
        columns = PRIMARY_COLUMNS if mv == "primary" else SUPPLEMENTARY_COLUMNS
    hashes = _key_hashes(docs, ["_mv", *columns])
    # cheap MV pre-filter BEFORE the 61-entry map build: one array scan
    # for the discriminator span, no sort/map allocation. Rows of the
    # other MV (e.g. 94% of docs when reconstructing the supplementary
    # table) never pay the pivot. The map-based filter below remains the
    # semantic gate; this is a conservative superset of every span shape
    # that can yield map['_mv'] == mv: a field span carrying the exact
    # text, or a media span whose key parses to '_mv' (text '_mv' or
    # '_mv=…') with media_ref as the value.
    docs = docs.filter(
        F.exists(
            F.col("spans"),
            lambda s: (s["text"] == f"_mv={mv}")
            | (
                (s["kind"] == "media")
                & (s["media_ref"] == mv)
                & s["text"].startswith("_mv")
            ),
        )
    )
    # ALL map lookups happen inside ONE lambda scope: the map is bound to
    # the lambda variable `m` and built exactly once per row. Projecting
    # `element_at(_m, k)` per column from a plain `_m` alias lets the
    # optimizer inline the whole array_sort→transform→map_from_entries
    # chain into EVERY column — 61 map builds per row (measured 6× slower
    # on the full-width write at 400k docs).
    fields = ", ".join(
        f"element_at(m, {hashes[c]}L) AS {c}" for c in columns
    )
    w = (
        f"transform(array(map_from_entries({_KV_ENTRIES_HASHED})), "
        f"m -> struct(element_at(m, {hashes['_mv']}L) AS _mv, {fields}))[0]"
    )
    df = docs.selectExpr(
        "doc_id", "substring(doc_id, 5, 10) AS _rs", f"{w} AS _w"
    ).filter(F.col("_w._mv") == mv)
    projections = ["doc_id", "CAST(_rs AS BIGINT) AS _row_seq"] + [
        _typed_sql(f"_w.{c}", column_dtype(c)) + f" AS {c}" for c in columns
    ]
    return df.selectExpr(*projections)


def reconstruct_wide_pandas(
    docs: DataFrame, mv: str, columns: tuple[str, ...] | None = None
) -> DataFrame:
    """Arrow-vectorized `mapInPandas` reconstruction — same contract as
    :func:`reconstruct_wide`; the extension point for model-backed span
    processing (mention detection etc.). No per-row Python in the hot
    loop: batches are decoded with vectorized pandas ops."""
    if columns is None:
        columns = PRIMARY_COLUMNS if mv == "primary" else SUPPLEMENTARY_COLUMNS
    cols = tuple(columns)

    fields = [StructField("doc_id", StringType()), StructField("_row_seq", "long")]
    # build output schema mirroring _typed dtypes
    from pyspark.sql.types import BooleanType, DoubleType, LongType

    type_map = {
        "long": LongType(),
        "double": DoubleType(),
        "boolean": BooleanType(),
        "string": StringType(),
    }
    for c in cols:
        fields.append(StructField(c, type_map[column_dtype(c)]))
    out_schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("_row_seq", LongType()),
        ]
        + [StructField(c, type_map[column_dtype(c)]) for c in cols]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                kv = {}
                for s in sorted(spans, key=lambda s: s["offset"]):
                    name, _, val = s["text"].partition("=")
                    kv[name] = s["media_ref"] if s["kind"] == "media" else val
                if kv.get("_mv") != mv:
                    continue
                rows.append((doc_id, int(doc_id[4:]), kv))
            if not rows:
                continue
            out = pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "_row_seq": [r[1] for r in rows],
                }
            )
            for c in cols:
                series = pd.Series([r[2].get(c) for r in rows], dtype="object")
                dt = column_dtype(c)
                if dt == "long":
                    series = series.astype("Int64")
                elif dt == "double":
                    series = series.astype("float64")
                elif dt == "boolean":
                    series = series.map(
                        lambda v: None if v is None else v.lower() == "true"
                    ).astype("boolean")
                out[c] = series
            yield out

    return docs.mapInPandas(gen, out_schema)


def span_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — 64-bit fingerprint of the ordered
    ``(kind, text, media_ref)`` sequence. Two DataFrames with equal
    per-doc fingerprints satisfy the per-row span-sequence-equality
    invariant (BASELINE.json input_hint) regardless of physical layout."""
    normalized = F.expr(
        f"transform({_SORTED_SPANS}, s -> struct(s.kind, s.text, s.media_ref))"
    )
    return docs.select(
        "doc_id", F.xxhash64(F.to_json(normalized)).alias("fp")
    )


def media_assets(docs: DataFrame) -> DataFrame:
    """All media spans as a typed asset table (multimodal plumbing):
    (doc_id, field, media_ref, order). Binary payload decode is a
    downstream concern (`operators/multimodal.py`)."""
    s = F.explode(F.expr(_SORTED_SPANS)).alias("s")
    exploded = docs.select("doc_id", s)
    return exploded.filter(F.col("s.kind") == "media").select(
        "doc_id",
        F.substring_index("s.text", "=", 1).alias("field"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("order"),
    )
