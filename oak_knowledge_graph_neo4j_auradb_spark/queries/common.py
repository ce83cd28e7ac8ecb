"""Shared helpers for the driver-facing query surface."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table. In production these reads are
    Iceberg scans; parquet here — Catalyst pushes filters/projections
    into the scan either way."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def r4(col: Column) -> Column:
    """Round a double to 4 places — shared canonical rendering so the
    Spark result and the DuckDB oracle hash identically."""
    return F.round(col, 4)


def hex2long(hexcol: Column) -> Column:
    """First 15 hex chars of a hash → non-negative int64 (60 bits).

    DuckDB twin: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    Both engines agree because md5 is engine-independent (unlike
    xxhash64/``hash()``, whose seeds differ across engines).
    """
    return F.conv(hexcol, 16, 10).cast("long")


def md5long(col: Column) -> Column:
    """Engine-portable 60-bit hash of a string column."""
    return hex2long(F.substring(F.md5(col), 1, 15))


#: DuckDB twin of :func:`md5long`
MD5LONG_SQL = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def tokens(col: Column) -> Column:
    """Lowercased whitespace/punctuation tokens, no empties.

    DuckDB twin: ``list_filter(string_split_regex(lower(x),
    '[^a-z0-9]+'), t -> t <> '')`` — both engines keep boundary empties
    from the regex split, so both filter them explicitly.
    """
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != ""
    )


TOKENS_SQL = "list_filter(string_split_regex(lower({x}), '[^a-z0-9]+'), t -> t <> '')"
