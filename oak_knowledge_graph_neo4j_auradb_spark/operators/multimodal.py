"""Multimodal span plumbing: media refs → binary payloads → features.

The reference stores media as opaque string IDs (``lesson_video_id``,
config ...alpha.json:322-326) and never touches bytes. A training-data
pipeline must: (1) resolve refs to binary payloads, (2) decode/extract
features, (3) frame-sample — all as Arrow-batched stages with typed
schemas so the Spark-side plumbing scales even though the actual codec
work happens in a library.

Decode layering (this container has no image/audio libs):
* :func:`fetch_payload` — production: object-store range reads inside
  ``mapInPandas``; here: a deterministic fake (utf-8 bytes of the ref)
  so every downstream stage, schema, and batch shape is real and
  testable.
* :func:`decode_media` — metadata extraction over the binary column.
  The *real* decode hook (`_decode_real`) raises ``NotImplementedError``
  (PIL/ffmpeg absent); the deterministic stub derives width/height/
  duration from the payload hash so results are stable and
  oracle-checkable.
* :func:`sample_frames` — UDTF-shaped row expansion (1 video → N frame
  rows) via ``mapInPandas``: the output-batch-larger-than-input-batch
  pattern real frame sampling needs.

Everything is ``mapInPandas`` (Arrow batches, no per-row Python
round-trip) with explicit output schemas — the input_hint contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("field", StringType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("field", StringType()),
        StructField("media_ref", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def fetch_payload(assets: DataFrame) -> DataFrame:
    """(doc_id, field, media_ref) → + binary ``payload``.

    Production implementation: batched object-store GETs per Arrow batch
    (the refs are ``asset://`` URIs). Sandbox: payload = utf-8 bytes of
    the ref — deterministic, so feature extraction is oracle-checkable.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "field", "media_ref"]].copy()
            out["payload"] = out["media_ref"].map(
                lambda r: r.encode("utf-8"), na_action="ignore"
            )
            yield out

    return assets.mapInPandas(gen, PAYLOAD_SCHEMA)


def _decode_real(payload: bytes) -> dict:
    """The real decoder hook — wire PIL / torchaudio / ffmpeg here."""
    raise NotImplementedError(
        "real media decode requires image/audio libraries not present "
        "in this environment; use decode_media(stub=True)"
    )


def _decode_stub(payload: bytes) -> dict:
    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "content_md5": h,
        "width": int(h[:8], 16) % 1920,
        "height": int(h[8:16], 16) % 1080,
    }


def decode_media(with_payload: DataFrame, stub: bool = True) -> DataFrame:
    """Binary payloads → typed feature rows (Arrow-batched)."""
    decode = _decode_stub if stub else _decode_real

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode)
            out = pdf[["doc_id", "field", "media_ref"]].copy()
            out["n_bytes"] = feats.map(lambda d: d["n_bytes"]).astype("int64")
            out["content_md5"] = feats.map(lambda d: d["content_md5"])
            out["width"] = feats.map(lambda d: d["width"]).astype("int32")
            out["height"] = feats.map(lambda d: d["height"]).astype("int32")
            yield out

    return with_payload.mapInPandas(gen, FEATURE_SCHEMA)


EMBED_DIM = 16

EMBED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def embed_media(with_payload: DataFrame) -> DataFrame:
    """Binary payloads → EMBED_DIM-dim embedding vectors (Arrow-batched).

    Production: a vision/audio encoder over the decoded media. Sandbox:
    a deterministic hash embedding — md5(payload) gives 16 bytes, dim d
    = byte_d/255 - 0.5 — so the vectors (and every downstream ANN /
    near-dup stage) are exactly reproducible by the DuckDB oracle from
    the same ref bytes. The Spark-side contract (Arrow batch in,
    array<double> column out, one row per asset) is the real one."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_ref"]].copy()
            out["embedding"] = pdf["payload"].map(
                lambda p: [
                    b / 255.0 - 0.5 for b in hashlib.md5(p).digest()[:EMBED_DIM]
                ]
            )
            yield out

    return with_payload.mapInPandas(gen, EMBED_SCHEMA)


def sample_frames(with_payload: DataFrame, n_frames: int = 3) -> DataFrame:
    """1 video payload → ``n_frames`` frame rows (UDTF-shaped expansion).

    Real implementation decodes at timestamps; the stub hashes
    (payload, frame_idx) so each emitted frame is distinct and
    deterministic."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "frame_idx": [], "frame_md5": []}
            for doc_id, ref, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["payload"]
            ):
                for i in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(i)
                    rows["frame_md5"].append(
                        hashlib.md5(payload + str(i).encode("utf-8")).hexdigest()
                    )
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    return with_payload.mapInPandas(gen, FRAME_SCHEMA)
