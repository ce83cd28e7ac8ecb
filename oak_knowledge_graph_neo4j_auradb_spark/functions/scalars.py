"""Scalar expression library — the reference's value-cleaning semantics
re-expressed as Catalyst column expressions (JVM-side, codegen'd) with
Arrow-vectorized pandas UDFs only for the two operations Spark genuinely
cannot express: ``\\uXXXX`` unescaping and dual-dialect (JSON ∥ Python
literal) array parsing.

Reference semantics reproduced here (file:line into /root/reference):

* empty-value detection  — schema_mapper.py:573-592 (``""``, ``"[]"``,
  ``"{}"``, whitespace-padded variants, empty list/dict)
* surrounding-quote strip — schema_mapper.py:594-610
* unicode unescape        — schema_mapper.py:612-631
* type casts              — schema_mapper.py:789-868 (int = int(float(x)),
  boolean token set, list dual-dialect parse, string clean)
* null-ish ID tokens      — schema_mapper.py:156-170 ('nan','null','none')
* synthetic ID templates  — data_cleaner.py:337-368
* join-key suffix strip   — hasura_extractor.py:186-208

Every function takes/returns ``pyspark.sql.Column`` so the whole cleaning
layer stays inside WholeStageCodegen; the pandas UDFs are gated behind
cheap ``contains`` predicates so the Arrow path only runs on rows that
need it.
"""

from __future__ import annotations

import ast
import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# empty / null-ish detection
# ---------------------------------------------------------------------------

# Matches a JSON empty list or dict, allowing interior whitespace —
# equivalent to the reference's "json.loads yields empty list/dict"
# probe (schema_mapper.py:580-588), which succeeds iff the payload is
# brackets around JSON whitespace (exactly space/tab/newline/CR — not
# Java's wider \s).
_EMPTY_STRUCT_RE = r"^(\[[ \t\n\r]*\]|\{[ \t\n\r]*\})$"

#: string tokens the reference treats as a null ID (schema_mapper.py:168)
NULLISH_ID_TOKENS = ("nan", "null", "none")

#: the full character class Python ``str.strip()`` removes (Unicode
#: whitespace property) — Java ``\s`` is ASCII-only and ``F.trim`` strips
#: 0x20 only, so neither matches the reference's pandas/``.strip()``
#: semantics on tabs, newlines, NBSP, … (SURVEY.md §7.4 risk 3)
_PY_WS = (
    "\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000"
)
#: SQL-literal form (backslashes doubled for the SQL string parser)
PYTRIM_SQL_CLASS = _PY_WS.replace("\\", "\\\\")


def pytrim(col: Column) -> Column:
    """``str.strip()``-faithful trim (all Unicode whitespace, both ends).

    Stays in codegen (one regexp_replace); use wherever the reference
    calls ``.strip()`` / pandas ``.str.strip()``.
    """
    return F.regexp_replace(col, f"^[{_PY_WS}]+|[{_PY_WS}]+$", "")


def pytrim_sql(expr: str) -> str:
    """SQL-string form of :func:`pytrim` for ``selectExpr`` assembly."""
    return (
        f"regexp_replace({expr}, "
        f"'^[{PYTRIM_SQL_CLASS}]+|[{PYTRIM_SQL_CLASS}]+$', '')"
    )


def is_empty_str(col: Column) -> Column:
    """True iff the *string* value is empty per schema_mapper.py:573-592.

    Null input → True (pd.isna branch of _clean_value, :792).
    """
    t = pytrim(col)
    return col.isNull() | (t == "") | t.rlike(_EMPTY_STRUCT_RE)


def is_nullish_id(col: Column) -> Column:
    """True iff a would-be node ID must skip the row
    (schema_mapper.py:156-170): null, empty, or 'nan'/'null'/'none'."""
    t = pytrim(col)
    return (
        col.isNull()
        | (t == "")
        | F.lower(t).isin(*NULLISH_ID_TOKENS)
    )


# ---------------------------------------------------------------------------
# string cleaning
# ---------------------------------------------------------------------------


def strip_surrounding_quotes(col: Column) -> Column:
    """Strip ONE pair of surrounding quotes (schema_mapper.py:594-610).

    Positional ``substring`` checks, not a regex: ``^'.*'$`` silently
    fails on values with embedded newlines (``.`` stops at ``\\n``)
    where the reference's ``text[0]``/``text[-1]`` test strips them.
    """
    first = F.substring(col, 1, 1)
    last = col.substr(F.length(col), F.lit(1))
    inner = col.substr(F.lit(2), F.length(col) - 2)
    return F.when(
        (F.length(col) >= 2) & (first == last) & first.isin("'", '"'),
        inner,
    ).otherwise(col)


_UNICODE_ESC_RE = re.compile(r"\\u([0-9a-fA-F]{4})")


def _unescape_series(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        try:
            return _UNICODE_ESC_RE.sub(lambda m: chr(int(m.group(1), 16)), v)
        except (ValueError, OverflowError):
            return v

    return s.map(one, na_action="ignore")


@pandas_udf(StringType())
def unicode_unescape_udf(s: pd.Series) -> pd.Series:
    """Decode ``\\uXXXX`` escapes (schema_mapper.py:612-631).

    Arrow-vectorized; call through :func:`unicode_unescape` so the UDF
    only fires on rows containing a literal ``\\u``.
    """
    return _unescape_series(s)


def unicode_unescape(col: Column) -> Column:
    """`\\uXXXX` → chars, with a JVM-side guard so the Arrow exchange only
    happens for rows that actually contain an escape."""
    return F.when(col.contains("\\u"), unicode_unescape_udf(col)).otherwise(col)


def clean_string(col: Column) -> Column:
    """The reference's string-type clean (schema_mapper.py:853-860):
    trim → strip one pair of surrounding quotes → unicode-unescape.
    Empty values (per :func:`is_empty_str`) become null = property omitted
    (schema_mapper.py:792-794,213-215)."""
    cleaned = unicode_unescape(strip_surrounding_quotes(pytrim(col)))
    return F.when(is_empty_str(col), F.lit(None).cast("string")).otherwise(cleaned)


# ---------------------------------------------------------------------------
# typed casts (schema_mapper.py:789-868)
# ---------------------------------------------------------------------------


#: whitespace Python ``float()`` ignores at the edges — Unicode
#: whitespace EXCEPT \x1c-\x1f (float() rejects those despite
#: str.isspace() accepting them)
_NUM_WS = (
    "\\s\\u0085\\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000"
)

#: Python float-literal syntax (sign, decimal, exponent). Underscored
#: literals ('1_0', PEP 515), inf/nan tokens, and non-ASCII Unicode
#: decimal digits (``float('٣') == 3.0`` in Python; Java ``\d`` is
#: ASCII-only) are deliberately excluded → null (unreachable in the
#: curriculum value space; documented deviation, mirrored in
#: tests/test_scalar_properties.py::_oracle_clean).
_PYFLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def _pyfloat(col: Column) -> Column:
    """``float(value)`` faithfully: Python's edge-whitespace set and
    literal grammar, null where Python raises. Gating the cast on an
    explicit grammar (rather than trusting the engine cast) matters
    twice: Spark's string→double trims ALL ASCII ≤ 0x20 (accepts
    '0\\x1c' — Python raises) and under ANSI an unguarded cast THROWS on
    the first malformed value — one bad row in 100 TB kills the job."""
    t = F.regexp_replace(col, f"^[{_NUM_WS}]+|[{_NUM_WS}]+$", "")
    return F.when(t.rlike(_PYFLOAT_RE), t.try_cast("double"))


def clean_int(col: Column) -> Column:
    """``int(float(value))`` — tolerates '104.0' (schema_mapper.py:797-799;
    bug history HISTORY.md:331). Truncation toward zero matches Python
    ``int()``. Unparseable / empty / out-of-int64 → null (counted
    upstream as a metric instead of the reference's string fallback)."""
    return (
        F.when(is_empty_str(col), F.lit(None))
        .otherwise(_pyfloat(col).try_cast("long"))
    )


def clean_float(col: Column) -> Column:
    """float(value) (schema_mapper.py:800-801)."""
    return F.when(is_empty_str(col), F.lit(None)).otherwise(_pyfloat(col))


#: the truthy token set, case-insensitive (schema_mapper.py:802-805)
BOOL_TRUE_TOKENS = ("true", "1", "yes", "on")


def clean_boolean(col: Column) -> Column:
    """String → bool via the reference token set (schema_mapper.py:802-805).
    The RAW string is lowercased with no trim — ``'1 '`` is falsy."""
    return F.when(is_empty_str(col), F.lit(None)).otherwise(
        F.lower(col).isin(*BOOL_TRUE_TOKENS)
    )


def clean_datetime(col: Column) -> Column:
    """datetime type is a trimmed string passthrough (schema_mapper.py:806-807)."""
    return F.when(is_empty_str(col), F.lit(None)).otherwise(pytrim(col))


# ---------------------------------------------------------------------------
# dual-dialect list parse (schema_mapper.py:808-852)
# ---------------------------------------------------------------------------


def _parse_list_value(v):
    if v is None:
        return None
    if not isinstance(v, str) or not v.strip():
        return None
    # parse the RAW value — the reference gives json.loads/literal_eval
    # the unstripped string (schema_mapper.py:812,831), so exotic edge
    # whitespace makes the parse FAIL into the single-item fallback
    try:
        parsed = json.loads(v)
    except (json.JSONDecodeError, ValueError):
        try:
            parsed = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return [v.strip()]
    if not isinstance(parsed, list):
        return [str(parsed)]
    out = []
    for item in parsed:
        if isinstance(item, dict):
            j = json.dumps(item)
            out.append(_UNICODE_ESC_RE.sub(lambda m: chr(int(m.group(1), 16)), j))
        else:
            out.append(str(item).strip())
    return [x for x in out if x]


@pandas_udf(ArrayType(StringType()))
def parse_list_udf(s: pd.Series) -> pd.Series:
    """JSON-or-Python-literal array → array<string>; dict elements kept as
    unicode-unescaped JSON strings, empties filtered
    (schema_mapper.py:808-852). Arrow-vectorized."""
    return s.map(_parse_list_value, na_action="ignore")


def clean_list(col: Column) -> Column:
    """List-typed property clean. Empty markers → null (omitted)."""
    return F.when(is_empty_str(col), F.lit(None).cast(ArrayType(StringType()))).otherwise(
        parse_list_udf(col)
    )


def synthetic_prop_col(sv, data_type: str) -> Column:
    """Config-constant synthetic property → typed literal Column.

    One shared path for ALL node kinds (single/static, per-row,
    expanded) so a given config constant renders identically everywhere
    — round 4 had the static branch passing bools through as typed
    literals while the other two stringified first ('true' vs 'True' on
    a string-typed property; round-4 ADVICE). Non-string scalars apply
    the reference's clean_value coercions driver-side
    (schema_mapper.py:789-868: int(float(v)), float(v), bool(v),
    str(v)) — e.g. a bool sv on an int property is 1, on a string
    property 'True', exactly as the pyoracle computes. String constants
    keep the full clean_typed path (trim/quote-strip/unescape/parse)."""
    if isinstance(sv, (bool, int, float)):
        if data_type == "int":
            return F.lit(int(float(sv))).cast("long")
        if data_type == "float":
            return F.lit(float(sv)).cast("double")
        if data_type == "boolean":
            return F.lit(bool(sv))
        if data_type == "list":
            return F.lit([str(sv).strip()])
        # string / datetime: Python str() rendering, e.g. True → 'True'
        return F.lit(str(sv).strip())
    return clean_typed(F.lit(str(sv)), data_type)


def clean_typed(col: Column, data_type: str) -> Column:
    """Dispatch on the config ``type`` field (schema_mapper.py:789-868)."""
    if data_type == "int":
        return clean_int(col)
    if data_type == "float":
        return clean_float(col)
    if data_type == "boolean":
        return clean_boolean(col)
    if data_type == "datetime":
        return clean_datetime(col)
    if data_type == "list":
        return clean_list(col)
    return clean_string(col)


# ---------------------------------------------------------------------------
# computed properties (schema_mapper.py:540-571)
# ---------------------------------------------------------------------------


def compute_is_not_null(col: Column) -> Column:
    """computed: "is_not_null" → True iff value present and non-empty."""
    return ~(col.isNull() | is_empty_str(col))


def compute_is_null(col: Column) -> Column:
    return col.isNull() | is_empty_str(col)


# ---------------------------------------------------------------------------
# join-key / template helpers
# ---------------------------------------------------------------------------


def normalize_unit_slug(col: Column) -> Column:
    """Strip a trailing ``-<digits>`` unitvariant suffix — regex group-1 of
    ``^(.+)-(\\d+)$`` with passthrough when unmatched
    (hasura_extractor.py:186-208)."""
    stripped = F.regexp_extract(col, r"^(.+)-(\d+)$", 1)
    return F.when(col.isNull(), col).when(stripped == "", col).otherwise(stripped)


_TEMPLATE_FIELD_RE = re.compile(r"\{([^}]+)\}")


def synthetic_template(template: str) -> Column:
    """Compile a ``"{field_a}-{field_b}"`` synthetic-ID template into a
    Column (data_cleaner.py:337-358): every placeholder replaced by the
    trimmed row value; if ANY referenced field is null the whole ID is
    null (the cleaner then stores ``""``, data_cleaner.py:326 — callers
    use :func:`F.coalesce` with ``lit("")`` where that matters)."""
    fields = _TEMPLATE_FIELD_RE.findall(template)
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_FIELD_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(pytrim(F.col(m.group(1))))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    result = F.concat(*parts) if parts else F.lit(template)
    guard = None
    for f in fields:
        c = F.col(f).isNull()
        guard = c if guard is None else (guard | c)
    if guard is None:
        return result
    return F.when(guard, F.lit(None).cast("string")).otherwise(result)
