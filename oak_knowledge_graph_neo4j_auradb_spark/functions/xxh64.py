"""Pure-Python XXH64 matching Spark's ``xxhash64`` (seed 42).

The wide-reconstruction pivot (operators/reconstruct.py) keys its
span map by ``xxhash64(column_name)`` so the per-row map carries 8-byte
keys instead of strings. The driver needs those key constants at plan
time; computing them JVM-side costs a real Spark job on every cold
process (~0.4 s of the flagship's plan build). XXH64 is a public,
stable algorithm (Cyan4973/xxHash spec; Spark pins it at seed 42 in
``XxHash64``), so the driver computes the constants locally and a
pytest cross-checks every branch of this implementation against the
JVM on literal + property-generated inputs (tests/test_xxh64.py).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as an unsigned 64-bit int (Spark's seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK)) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK), 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _MASK), 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed-int64 XXH64 of a string's UTF-8 bytes — the exact value
    Spark's ``xxhash64(lit(s))`` returns."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
