"""Stage C — declarative cleaning (reference: data_cleaner.py).

Order of operations mirrors ``DataCleaner.clean_data``
(data_cleaner.py:81-110): drop all-null rows → trim string columns →
config filters → synthetic ID columns → pinned run timestamp. We then
fold in the reference's cleaned-CSV round trip (the mapper re-reads the
CSV, schema_mapper.py:34-39), under which string values equal to pandas
NA tokens become null again — centralizing the reference's subtle
empty/NaN semantics (SURVEY.md §7.4 risk 3) in one projection.

Everything here is a single Catalyst projection + one filter: no
shuffle, no UDF, fully codegen'd, and the ``is_legacy`` filter pushes
down to the scan when this runs directly over a materialized wide table.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config.curriculum_schema import NODES, column_dtype
from ..functions.scalars import pytrim, pytrim_sql, synthetic_template
from ..oracle.pyoracle import NA_TOKENS

import re

_FIELD_RE = re.compile(r"\{([^}]+)\}")


def _synthetic_id_col(template: str) -> Column:
    """data_cleaner.py:337-358 computed on the astype(str) frame: null
    *string* fields substitute as the literal 'nan' (the astype(str)
    mirror); a null non-string field nulls the whole ID (stored '', then
    NA-tokenized to null by the round-trip projection)."""
    parts: list[Column] = []
    pos = 0
    guards: list[Column] = []
    for m in _FIELD_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        c = pytrim(F.col(name).cast("string"))
        if column_dtype(name) == "string":
            c = F.coalesce(c, F.lit("nan"))
        else:
            guards.append(F.col(name).isNull())
        parts.append(c)
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    out = F.concat(*parts)
    for g in guards:
        out = F.when(g, F.lit(None).cast("string")).otherwise(out)
    return out


def clean(df: DataFrame, filters: dict[str, Any], run_ts: str) -> DataFrame:
    """Apply the full cleaning contract; adds ``current_timestamp`` and
    the synthetic ID columns declared in node configs."""
    cols = [c for c in df.columns if not c.startswith("_") or c == "_ord"]
    string_cols = [
        c
        for c in df.columns
        if not c.startswith("_") and c != "doc_id" and column_dtype(c) == "string"
    ]

    # dropna(how="all") over data columns (data_cleaner.py:84);
    # SQL-string assembly — one py4j call instead of one per column
    data_cols = [c for c in df.columns if not c.startswith("_") and c != "doc_id"]
    df = df.filter(
        "NOT (" + " AND ".join(f"{c} IS NULL" for c in data_cols) + ")"
    )

    # trim strings (data_cleaner.py:88-89)
    df = df.selectExpr(
        *[
            f"{pytrim_sql(c)} AS {c}" if c in string_cols else c
            for c in df.columns
        ]
    )

    # filters (data_cleaner.py:112-134)
    for col, want in filters.items():
        if col not in df.columns:
            continue
        if isinstance(want, list):
            df = df.filter(F.col(col).isin(want))
        else:
            df = df.filter(F.col(col) == F.lit(want))

    # synthetic ID columns (data_cleaner.py:296-368)
    for label, cfg in NODES.items():
        idf = cfg.get("id_field", {})
        tmpl = idf.get("synthetic_value", "")
        if not tmpl or "{" not in tmpl:
            continue
        colname = idf.get("hasura_col") or idf.get("property_name", "id")
        df = df.withColumn(colname, _synthetic_id_col(tmpl))

    df = df.withColumn("current_timestamp", F.lit(run_ts))

    # cleaned-CSV round trip: NA-token strings → null
    na_list = ", ".join(f"'{t}'" for t in sorted(NA_TOKENS))
    df = df.selectExpr(
        *[
            (
                f"CASE WHEN {c} IN ({na_list}) THEN CAST(NULL AS STRING) "
                f"ELSE {c} END AS {c}"
                if (c in string_cols or _is_synthetic_col(c))
                else c
            )
            for c in df.columns
        ]
    )
    return df


def _is_synthetic_col(name: str) -> bool:
    for cfg in NODES.values():
        idf = cfg.get("id_field", {})
        tmpl = idf.get("synthetic_value", "")
        if tmpl and "{" in tmpl:
            if name == (idf.get("hasura_col") or idf.get("property_name", "id")):
                return True
    return False
