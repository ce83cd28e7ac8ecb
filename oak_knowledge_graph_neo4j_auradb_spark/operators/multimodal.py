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
  The *real* decode hook (`_decode_real`) parses genuine uncompressed
  BMP and PCM WAV bytes with self-contained struct parsers (and routes
  through PIL when available for compressed formats); the deterministic
  stub derives width/height from the payload hash so the synthetic
  corpus stays oracle-checkable. Compressed codecs without PIL remain
  a documented NotImplementedError.
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


def _decode_bmp(payload: bytes) -> dict:
    """Parse a real (uncompressed, BITMAPINFOHEADER) BMP: 'BM' magic,
    int32-LE width at offset 18, int32-LE height at 22 (negative =
    top-down; dimensions are |height|). Pure struct parsing — the same
    header walk PIL's BmpImagePlugin does, with no external library."""
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    dib = struct.unpack_from("<I", payload, 14)[0]
    if dib >= 40:  # BITMAPINFOHEADER and successors: int32 dims
        w, h = struct.unpack_from("<ii", payload, 18)
    else:  # BITMAPCOREHEADER: uint16 dims
        w, h = struct.unpack_from("<HH", payload, 18)
    return {
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
        "width": int(abs(w)),
        "height": int(abs(h)),
    }


def _decode_wav(payload: bytes) -> dict:
    """Parse a real PCM WAV: RIFF/WAVE container, 'fmt ' chunk for
    (channels, sample_rate), 'data' chunk for the sample count. The
    FEATURE_SCHEMA mapping for audio is documented as width=sample_rate,
    height=n_channels (the schema is image-shaped; audio reuses it
    rather than forking the feature table per modality)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            channels, rate = struct.unpack_from("<HI", payload, pos + 10)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None:
        raise ValueError("WAV payload has no fmt chunk")
    return {
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
        "width": int(rate),
        "height": int(channels),
    }


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: samples per pixel by PNG color type (3 = palette: one index sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_defilter(raw: bytes, stride: int, bpp: int, height: int) -> bytes:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/
    Paeth). ``stride`` is bytes per scanline, ``bpp`` the filter unit
    (bytes per complete pixel, min 1). Raises on a bad filter byte or a
    short stream — decode failures surface instead of yielding garbage."""
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG stream {len(raw)}B != {(stride + 1) * height}B expected"
        )
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


def _decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Full self-contained PNG decode: chunk walk → IHDR, zlib-inflate
    the concatenated IDAT stream, reverse the scanline filters. Returns
    (width, height, defiltered pixel bytes — palette indices for color
    type 3). stdlib-only (struct + zlib); the one unsupported shape is
    Adam7 interlacing (interlace=1), which raises explicitly. A wrong
    CRC/forged length surfaces as an inflate or length error rather
    than silent garbage."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    hdr = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = hdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    channels = _PNG_CHANNELS.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    stride = (channels * depth * w + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    pixels = _png_defilter(zlib.decompress(bytes(idat)), stride, bpp, h)
    return int(w), int(h), pixels


def _decode_real(payload: bytes) -> dict:
    """Real-bytes decoder: self-contained parsers for uncompressed BMP,
    PCM WAV, and (new, round 5) non-interlaced PNG — zlib is stdlib, so
    the full IDAT inflate + defilter needs no external library. PIL
    remains the optional wider-codec path (JPEG/MP4) when available."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:8] == _PNG_MAGIC:
        w, h, _pixels = _decode_png(payload)
        return {
            "n_bytes": len(payload),
            "content_md5": hashlib.md5(payload).hexdigest(),
            "width": w,
            "height": h,
        }
    try:  # optional wider-codec path (PNG/JPEG/…) if PIL is present
        from io import BytesIO

        from PIL import Image  # type: ignore

        with Image.open(BytesIO(payload)) as im:
            return {
                "n_bytes": len(payload),
                "content_md5": hashlib.md5(payload).hexdigest(),
                "width": int(im.width),
                "height": int(im.height),
            }
    except ImportError:
        pass
    raise NotImplementedError(
        "JPEG/MP4 decode requires image/audio libraries not present in "
        "this environment; use decode_media(stub=True) or feed "
        "BMP/WAV/PNG payloads"
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
