"""Stage M/G — config-driven node + triple extraction (the heart of the
engine; reference: ``schema_mapper.py:73-538``).

The reference walks the consolidated table once per node label / per
relationship config with ``iterrows`` and a ``seen`` set — first-seen-wins
dedup in input order (schema_mapper.py:86,172-176,308-338). Here each
config compiles to a declarative DataFrame plan:

    project(endpoint strings + raw prop columns)
      → filter(null-ish IDs out)
      → groupBy(id).agg(min(struct(_ord, props…)))     # first-seen dedup
      → project(typed cleaning of the winning row's props)

**Why ``min(struct(...))`` instead of a window**: ``row_number() over
(partition by id order by _ord)`` shuffles every row. The min-struct
aggregate gets map-side partial aggregation — at 10^12 rows with hot keys
("lesson"/"keystage"-scale skew, north_rule) the per-partition combine
collapses duplicates *before* the exchange, so the shuffle carries at most
``distinct_ids × partitions`` rows instead of all rows. ``_ord`` (the
total input order from ``operators/joins.py``) is unique per row, so the
lexicographic struct comparison never reaches the prop fields — the
winner is exactly the reference's first-seen row, deterministically,
under any parallelism (SURVEY.md §7.4 risk 1).

Array expansion (``expand_list`` threads → Thread nodes / HAS_THREAD
edges, schema_mapper.py:633-787,388-486) parses the dual-dialect payload
with one Arrow-vectorized UDF and then stays in Catalyst: ``posexplode``
for the element order, per-row cross product for array endpoints.
"""

from __future__ import annotations

import ast
import json
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, MapType, StringType

from ..config.curriculum_schema import column_dtype
from ..functions.scalars import (
    clean_typed,
    synthetic_prop_col,
    is_empty_str,
    is_nullish_id,
)

# --------------------------------------------------------------------------
# dual-dialect array-of-dict parsing (schema_mapper.py:680-695)
# --------------------------------------------------------------------------


def _parse_dict_array(v):
    if v is None:
        return None
    try:
        parsed = json.loads(v)
    except (json.JSONDecodeError, ValueError):
        try:
            parsed = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return None
    if not isinstance(parsed, list):
        return None
    out = []
    for item in parsed:
        if not isinstance(item, dict):
            continue  # non-dict elements skipped (schema_mapper.py:698-704)
        rendered = {}
        for k, val in item.items():
            if val is None:
                continue  # absent key ≡ null value (omitted either way)
            rendered[str(k)] = (
                json.dumps(val) if isinstance(val, (dict, list)) else str(val)
            )
        out.append(rendered)
    return out


@pandas_udf(ArrayType(MapType(StringType(), StringType())))
def parse_dict_array_udf(s: pd.Series) -> pd.Series:
    """JSON ∥ py-literal array of objects → array<map<string,string>>;
    unparseable / non-array / null → null. Arrow-vectorized."""
    return s.map(_parse_dict_array, na_action="ignore")


def parsed_col_name(field: str) -> str:
    return f"_parsed_{field}"


def parsed_array(wide: DataFrame, field: str) -> Column:
    """The dual-dialect parsed array for an expandable field. Prefers the
    pipeline's precomputed ``_parsed_<field>`` column (one UDF evaluation
    per row, persisted in the wide-table cache) over re-running the
    Arrow round-trip in this stage."""
    pc = parsed_col_name(field)
    if pc in wide.columns:
        return F.col(pc)
    return parse_dict_array_udf(F.col(field))


def with_parsed_arrays(wide: DataFrame, node_configs: dict[str, Any]) -> DataFrame:
    """Materialize ``_parsed_<field>`` for every expand_list field —
    called once before the wide-table persist so every downstream
    consumer (triple melt, node dims, expanded nodes) reads the parsed
    array from cache instead of paying its own UDF stage."""
    for field in _expandable_fields(node_configs):
        wide = wide.withColumn(
            parsed_col_name(field), parse_dict_array_udf(F.col(field))
        )
    return wide


# --------------------------------------------------------------------------
# endpoint rendering — str(row[field]) as the reference mapper sees it
# (schema_mapper.py:162,315,320 over the post-CSV-round-trip frame)
# --------------------------------------------------------------------------


def endpoint_str(name: str) -> Column:
    dtype = column_dtype(name)
    c = F.col(name)
    if dtype == "boolean":
        return F.coalesce(
            F.when(c, F.lit("True")).otherwise(F.lit("False")), F.lit("nan")
        )
    if dtype in ("long", "double"):
        return F.coalesce(c.cast("string"), F.lit("nan"))
    return F.coalesce(c, F.lit("nan"))


def clean_typed_from(col: Column, src_dtype: str, ptype: str) -> Column:
    """_clean_value over a source column of known dtype
    (schema_mapper.py:789-868). Non-string sources skip the empty-marker
    string checks (a float can't be '[]')."""
    if src_dtype == "string":
        return clean_typed(col, ptype)
    if ptype == "int":
        return col.try_cast("long")
    if ptype == "float":
        return col.try_cast("double")
    if ptype == "boolean":
        if src_dtype == "boolean":
            return col
        return F.when(col.isNull(), F.lit(None)).otherwise(col != 0)
    if ptype == "list":
        return F.when(col.isNull(), F.lit(None)).otherwise(
            F.array(F.trim(col.cast("string")))
        )
    # string / datetime
    return col.cast("string")


def _canonical_str(col: Column, ptype: str) -> Column:
    """Canonical string rendering for the uniform props map / comparison:
    ints bare, floats via double→string, booleans lowercase, lists as
    compact JSON."""
    if ptype == "int":
        return col.cast("string")
    if ptype == "float":
        return col.cast("string")
    if ptype == "boolean":
        # null must STAY null (property omitted) — otherwise('false')
        # alone would render a missing value as a real false
        return F.when(col.isNull(), F.lit(None).cast("string")).when(
            col, "true"
        ).otherwise("false")
    if ptype == "list":
        return F.to_json(col)
    return col


# --------------------------------------------------------------------------
# node extraction
# --------------------------------------------------------------------------


def _expandable_fields(node_configs: dict[str, Any]) -> dict[str, dict]:
    out = {}
    for label, cfg in node_configs.items():
        idf = cfg.get("id_field", {})
        if idf.get("expand_list"):
            pname = idf.get("property_name", "id")
            out[idf.get("hasura_col")] = {
                "node_type": label,
                "id_key": idf.get("id_key", pname),
            }
    return out


def extract_node(
    wide: DataFrame,
    label: str,
    cfg: dict[str, Any],
    run_ts: str,
    spark: SparkSession | None = None,
) -> DataFrame:
    """One node label → DataFrame(id, <typed props>). First-seen dedup via
    min-struct aggregate (see module docstring)."""
    idf = cfg.get("id_field", {})
    props: dict[str, Any] = cfg.get("properties", {})
    id_type = idf.get("type", "string")

    if idf.get("expand_list"):
        return _extract_expanded_node(wide, label, cfg, run_ts)

    synthetic = idf.get("synthetic_value", "")
    id_col = idf.get("hasura_col")
    is_static = bool(synthetic) and not id_col and "{" not in str(synthetic)
    if is_static:
        # single static node (schema_mapper.py:108-139)
        assert spark is not None, "static synthetic node needs a SparkSession"
        sel = [F.lit(synthetic).alias("id")]
        for pname, pcfg in props.items():
            ptype = pcfg.get("type", "string")
            sv = pcfg.get("synthetic_value")
            hcol = pcfg.get("hasura_col")
            if sv is not None and sv != "":
                sel.append(synthetic_prop_col(sv, ptype).alias(pname))
            elif hcol == "current_timestamp":
                sel.append(F.lit(run_ts).alias(pname))
        return spark.range(1).select(*sel)

    if synthetic and not id_col and "{" in str(synthetic):
        # templated synthetic node → the cleaner materialized the column
        # under the id property name (schema_mapper.py:143-146)
        id_col = idf.get("property_name", "id")

    prop_cols = []
    for pname, pcfg in props.items():
        hcol = pcfg.get("hasura_col")
        sv = pcfg.get("synthetic_value")
        if sv is not None and sv != "":
            # constant property on a per-row node — synthetic values win
            # over column sources (schema_mapper.py:189-196; the oracle's
            # extract_nodes sv-first branch)
            prop_cols.append((pname, pcfg, None))
        elif hcol and hcol in wide.columns:
            prop_cols.append((pname, pcfg, hcol))
        elif hcol == "current_timestamp":
            prop_cols.append((pname, pcfg, None))

    src = wide.select(
        F.col("_ord"),
        endpoint_str(id_col).alias("_id_str"),
        *[
            F.col(h).alias(f"_p{i}")
            for i, (_, _, h) in enumerate(prop_cols)
            if h is not None
        ],
    ).filter(~is_nullish_id(F.col("_id_str")))

    w_fields = [F.col("_ord").alias("o")] + [
        F.col(f"_p{i}") for i, (_, _, h) in enumerate(prop_cols) if h is not None
    ]
    agg = src.groupBy("_id_str").agg(F.min(F.struct(*w_fields)).alias("_w"))

    sel = [clean_typed(F.col("_id_str"), id_type).alias("id")]
    for i, (pname, pcfg, hcol) in enumerate(prop_cols):
        ptype = pcfg.get("type", "string")
        sv = pcfg.get("synthetic_value")
        if sv is not None and sv != "":
            sel.append(synthetic_prop_col(sv, ptype).alias(pname))
        elif hcol is None:
            sel.append(F.lit(run_ts).alias(pname))
        else:
            sel.append(
                clean_typed_from(
                    F.col(f"_w._p{i}"), column_dtype(hcol), ptype
                ).alias(pname)
            )
    return agg.select(*sel)


def _extract_expanded_node(
    wide: DataFrame, label: str, cfg: dict[str, Any], run_ts: str
) -> DataFrame:
    """expand_list array → nodes (threads → Thread,
    schema_mapper.py:633-787)."""
    idf = cfg["id_field"]
    props: dict[str, Any] = cfg.get("properties", {})
    col = idf.get("hasura_col")
    pname_id = idf.get("property_name", "id")
    id_key = idf.get("id_key", pname_id)
    id_type = idf.get("type", "string")

    exploded = wide.select(
        F.col("_ord"),
        F.posexplode(parsed_array(wide, col)).alias("_pos", "_item"),
    )
    src = exploded.select(
        F.struct(F.col("_ord"), F.col("_pos")).alias("_ord2"),
        F.element_at(F.col("_item"), id_key).alias("_id_str"),
        # maps aren't orderable — carry the entries array through the
        # min-struct aggregate instead
        F.map_entries(F.col("_item")).alias("_item_e"),
    ).filter(F.col("_id_str").isNotNull() & (F.trim(F.col("_id_str")) != ""))

    agg = src.groupBy("_id_str").agg(
        F.min(
            F.struct(F.col("_ord2").alias("o"), F.col("_item_e").alias("item_e"))
        ).alias("_w")
    ).withColumn("_item", F.map_from_entries(F.col("_w.item_e")))

    sel = [clean_typed(F.col("_id_str"), id_type).alias("id")]
    for pname, pcfg in props.items():
        ptype = pcfg.get("type", "string")
        sv = pcfg.get("synthetic_value")
        hcol = pcfg.get("hasura_col")
        if sv is not None and sv != "":
            sel.append(synthetic_prop_col(sv, ptype).alias(pname))
        elif hcol == "current_timestamp":
            sel.append(F.lit(run_ts).alias(pname))
        elif hcol:
            sel.append(
                clean_typed(F.element_at(F.col("_item"), hcol), ptype).alias(pname)
            )
    return agg.select(*sel)


def extract_nodes(
    wide: DataFrame,
    node_configs: dict[str, Any],
    run_ts: str,
    spark: SparkSession | None = None,
) -> dict[str, DataFrame]:
    return {
        label: extract_node(wide, label, cfg, run_ts, spark)
        for label, cfg in node_configs.items()
    }


# --------------------------------------------------------------------------
# triple extraction
# --------------------------------------------------------------------------

TRIPLE_COLUMNS = (
    "config_key",
    "pred",
    "subj",
    "obj",
    "subj_label",
    "obj_label",
    "props",
)


def extract_triples_config(
    wide: DataFrame,
    config_key: str,
    cfg: dict[str, Any],
    node_configs: dict[str, Any],
    run_ts: str,
) -> DataFrame:
    """One relationship config → canonical triple stream
    (schema_mapper.py:249-486): per-config first-seen dedup on
    (start, end, type); array endpoints expand per row
    (cross product, :438-449)."""
    rtype = cfg.get("relationship_type", config_key)
    sf, ef = cfg.get("start_csv_field"), cfg.get("end_csv_field")
    props: dict[str, Any] = cfg.get("properties", {})
    expandable = _expandable_fields(node_configs)
    s_arr, e_arr = sf in expandable, ef in expandable

    prop_cols = []
    for pname, pcfg in props.items():
        hcol = pcfg.get("hasura_col")
        if hcol and hcol in wide.columns:
            prop_cols.append((pname, pcfg, hcol))
        elif hcol == "current_timestamp":
            prop_cols.append((pname, pcfg, None))

    raw_props = [
        F.col(h).alias(f"_p{i}")
        for i, (_, _, h) in enumerate(prop_cols)
        if h is not None
    ]

    def arr_ids(field: str) -> Column:
        idk = expandable[field]["id_key"]
        ids = F.transform(
            parsed_array(wide, field), lambda it: F.element_at(it, idk)
        )
        return F.filter(
            ids, lambda v: v.isNotNull() & (F.trim(v) != "")
        )

    if s_arr or e_arr:
        s_ids = (
            arr_ids(sf)
            if s_arr
            else F.when(
                F.trim(endpoint_str(sf)) != "", F.array(endpoint_str(sf))
            ).otherwise(F.array().cast("array<string>"))
        )
        e_ids = (
            arr_ids(ef)
            if e_arr
            else F.when(
                F.trim(endpoint_str(ef)) != "", F.array(endpoint_str(ef))
            ).otherwise(F.array().cast("array<string>"))
        )
        base = wide.select(
            F.col("_ord"), s_ids.alias("_ss"), e_ids.alias("_es"), *raw_props
        )
        # per-row cross product of endpoint sets; element order carried so
        # first-seen matches the reference's nested loops (:439-449)
        base = base.select(
            "_ord",
            F.posexplode(F.coalesce(F.col("_ss"), F.array().cast("array<string>"))).alias(
                "_spos", "_s"
            ),
            "_es",
            *[F.col(f"_p{i}") for i, (_, _, h) in enumerate(prop_cols) if h is not None],
        ).select(
            "_ord",
            "_spos",
            "_s",
            F.posexplode(F.coalesce(F.col("_es"), F.array().cast("array<string>"))).alias(
                "_epos", "_e"
            ),
            *[F.col(f"_p{i}") for i, (_, _, h) in enumerate(prop_cols) if h is not None],
        )
        ordc = F.struct(
            F.col("_ord").alias("o"), F.col("_spos"), F.col("_epos")
        )
    else:
        base = wide.select(
            F.col("_ord"),
            endpoint_str(sf).alias("_s"),
            endpoint_str(ef).alias("_e"),
            *raw_props,
        ).filter((F.trim(F.col("_s")) != "") & (F.trim(F.col("_e")) != ""))
        ordc = F.struct(F.col("_ord").alias("o"))

    w_fields = [ordc.alias("o2")] + [
        F.col(f"_p{i}") for i, (_, _, h) in enumerate(prop_cols) if h is not None
    ]
    agg = base.groupBy("_s", "_e").agg(F.min(F.struct(*w_fields)).alias("_w"))

    # canonical props map (null values omitted = property omitted)
    entries = []
    for i, (pname, pcfg, hcol) in enumerate(prop_cols):
        ptype = pcfg.get("type", "string")
        rule = pcfg.get("computed")
        if hcol is None:
            val = F.lit(run_ts)
        else:
            raw = F.col(f"_w._p{i}")
            src_dtype = column_dtype(hcol)
            if rule:
                # computed properties (schema_mapper.py:540-571)
                if src_dtype == "string":
                    empty = raw.isNull() | is_empty_str(raw)
                else:
                    empty = raw.isNull()
                b = ~empty if rule == "is_not_null" else empty
                if rule not in ("is_not_null", "is_null"):
                    b = F.lit(None).cast("boolean")
                val = _canonical_str(b, "boolean")
            else:
                val = _canonical_str(
                    clean_typed_from(raw, src_dtype, ptype), ptype
                )
        entries.append(F.struct(F.lit(pname).alias("k"), val.alias("v")))

    props_map = F.map_from_entries(
        F.filter(F.array(*entries), lambda e: e["v"].isNotNull())
    ) if entries else F.map_from_entries(F.array().cast("array<struct<k:string,v:string>>"))

    return agg.select(
        F.lit(config_key).alias("config_key"),
        F.lit(rtype).alias("pred"),
        F.col("_s").alias("subj"),
        F.col("_e").alias("obj"),
        F.lit(cfg.get("start_node_type")).alias("subj_label"),
        F.lit(cfg.get("end_node_type")).alias("obj_label"),
        props_map.alias("props"),
    )


def extract_triples(
    wide: DataFrame,
    rel_configs: dict[str, Any],
    node_configs: dict[str, Any],
    run_ts: str,
) -> DataFrame:
    """All relationship configs → one unioned canonical triple stream.

    Per-config plans each carry their own dedup shuffle — correct but 12
    exchanges. :func:`extract_triples_fused` produces the identical
    stream with ONE exchange; this per-config form remains for targeted
    single-config extraction (e.g. the kg34 driver query)."""
    dfs = [
        extract_triples_config(wide, key, cfg, node_configs, run_ts)
        for key, cfg in rel_configs.items()
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# --------------------------------------------------------------------------
# fused extraction — one shuffle for all configs
# --------------------------------------------------------------------------
#
# The dedup key (config_key, subj, obj) is disjoint across configs, so the
# 12 per-config aggregates can share a single hash aggregate: union the 12
# projections over the cached wide table (narrow, cheap) into one uniform
# schema, shuffle ONCE on (config_key, subj, obj). At 10^12 rows this
# turns 12 full-table exchanges into 1. Property values are rendered to
# their canonical strings BEFORE the aggregate — per-value cleaning is
# deterministic, so it commutes with first-seen winner selection
# (schema_mapper.py:308-338 applies _clean_value after dedup; same
# result). Entries ride through min(struct(ord, entries)) untouched
# because the order key is unique per input row.


def _prop_entries_pre(
    prop_cols: list, run_ts: str
) -> Column:
    """array<struct<k,v>> of canonically-rendered property values,
    computed from the source columns directly (pre-aggregate)."""
    entries = []
    for pname, pcfg, hcol in prop_cols:
        ptype = pcfg.get("type", "string")
        rule = pcfg.get("computed")
        if hcol is None:
            val = F.lit(run_ts)
        else:
            raw = F.col(hcol)
            src_dtype = column_dtype(hcol)
            if rule:
                if src_dtype == "string":
                    empty = raw.isNull() | is_empty_str(raw)
                else:
                    empty = raw.isNull()
                b = ~empty if rule == "is_not_null" else empty
                if rule not in ("is_not_null", "is_null"):
                    b = F.lit(None).cast("boolean")
                val = _canonical_str(b, "boolean")
            else:
                val = _canonical_str(clean_typed_from(raw, src_dtype, ptype), ptype)
        entries.append(F.struct(F.lit(pname).alias("k"), val.alias("v")))
    if not entries:
        return F.array().cast("array<struct<k:string,v:string>>")
    return F.array(*entries)


def extract_triples_fused(
    wide: DataFrame,
    rel_configs: dict[str, Any],
    node_configs: dict[str, Any],
    run_ts: str,
) -> DataFrame:
    """All relationship configs → canonical triple stream: ONE scan of
    the wide table, ONE exchange.

    Melt, don't union: a per-row array holds every config's candidate
    triples (expanded endpoints contribute their per-row cross product
    via nested ``transform``s), one ``explode`` flattens it, one
    ``groupBy(config_key, subj, obj)`` dedups. A 12-branch union reads
    the (cached) table 12× — 12 × partitions tasks and 12 scans; at
    10^12 rows that is the difference between one pass and twelve."""
    expandable = _expandable_fields(node_configs)

    # Python UDFs cannot appear inside higher-order-function lambdas
    # (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF) — and every
    # extra UDF stage pays an Arrow round-trip over the whole table.
    # Materialize each expandable field's parsed ID array as a plain
    # column first (reusing the pipeline's cached `_parsed_<field>`
    # column when present, so the parse ran exactly once per row).
    used_fields = set()
    for cfg in rel_configs.values():
        for fld in (cfg.get("start_csv_field"), cfg.get("end_csv_field")):
            if fld in expandable:
                used_fields.add(fld)
    id_cols = {}
    for fld in sorted(used_fields):
        idk = expandable[fld]["id_key"]
        ids = F.transform(parsed_array(wide, fld), lambda it: F.element_at(it, idk))
        id_cols[fld] = f"_ids_{fld}"
        wide = wide.withColumn(
            id_cols[fld],
            F.coalesce(
                F.filter(ids, lambda v: v.isNotNull() & (F.trim(v) != "")),
                F.array().cast("array<string>"),
            ),
        )

    def arr_ids(field: str) -> Column:
        return F.col(id_cols[field])

    empty = F.array().cast(
        "array<struct<config_key:string,pred:string,subj_label:string,"
        "obj_label:string,s:string,e:string,spos:int,epos:int,"
        "entries:array<struct<k:string,v:string>>>>"
    )

    def elem(ck, rtype, slbl, elbl, s, e, spos, epos, entries) -> Column:
        return F.struct(
            F.lit(ck).alias("config_key"),
            F.lit(rtype).alias("pred"),
            F.lit(slbl).alias("subj_label"),
            F.lit(elbl).alias("obj_label"),
            s.alias("s"),
            e.alias("e"),
            spos.cast("int").alias("spos"),
            epos.cast("int").alias("epos"),
            entries.alias("entries"),
        )

    config_arrays = []
    for config_key, cfg in rel_configs.items():
        rtype = cfg.get("relationship_type", config_key)
        sf, ef = cfg.get("start_csv_field"), cfg.get("end_csv_field")
        props: dict[str, Any] = cfg.get("properties", {})
        s_arr, e_arr = sf in expandable, ef in expandable

        prop_cols = []
        for pname, pcfg in props.items():
            hcol = pcfg.get("hasura_col")
            if hcol and hcol in wide.columns:
                prop_cols.append((pname, pcfg, hcol))
            elif hcol == "current_timestamp":
                prop_cols.append((pname, pcfg, None))
        entries = _prop_entries_pre(prop_cols, run_ts)

        if s_arr or e_arr:
            s_ids = (
                arr_ids(sf)
                if s_arr
                else F.when(
                    F.trim(endpoint_str(sf)) != "", F.array(endpoint_str(sf))
                ).otherwise(F.array().cast("array<string>"))
            )
            e_ids = (
                arr_ids(ef)
                if e_arr
                else F.when(
                    F.trim(endpoint_str(ef)) != "", F.array(endpoint_str(ef))
                ).otherwise(F.array().cast("array<string>"))
            )
            # per-row cross product of the endpoint sets (nested
            # higher-order transforms; schema_mapper.py:438-449)
            arr = F.flatten(
                F.transform(
                    s_ids,
                    lambda s, si: F.transform(
                        e_ids,
                        lambda e, ei: elem(
                            config_key,
                            rtype,
                            cfg.get("start_node_type"),
                            cfg.get("end_node_type"),
                            s,
                            e,
                            si,
                            ei,
                            entries,
                        ),
                    ),
                )
            )
        else:
            s, e = endpoint_str(sf), endpoint_str(ef)
            arr = F.when(
                (F.trim(s) != "") & (F.trim(e) != ""),
                F.array(
                    elem(
                        config_key,
                        rtype,
                        cfg.get("start_node_type"),
                        cfg.get("end_node_type"),
                        s,
                        e,
                        F.lit(0),
                        F.lit(0),
                        entries,
                    )
                ),
            ).otherwise(empty)
        config_arrays.append(arr)

    melted = wide.select(
        F.col("_ord"), F.explode(F.concat(*config_arrays)).alias("_el")
    )
    agg = melted.groupBy(
        F.col("_el.config_key").alias("config_key"),
        F.col("_el.s").alias("_s"),
        F.col("_el.e").alias("_e"),
    ).agg(
        F.min(
            F.struct(
                F.struct(
                    F.col("_ord").alias("o"),
                    F.col("_el.spos").alias("_spos"),
                    F.col("_el.epos").alias("_epos"),
                ).alias("o2"),
                F.col("_el.entries").alias("_entries"),
            )
        ).alias("_w"),
        F.first("_el.pred").alias("pred"),
        F.first("_el.subj_label").alias("subj_label"),
        F.first("_el.obj_label").alias("obj_label"),
    )
    props_map = F.map_from_entries(
        F.filter(F.col("_w._entries"), lambda e: e["v"].isNotNull())
    )
    return agg.select(
        "config_key",
        "pred",
        F.col("_s").alias("subj"),
        F.col("_e").alias("obj"),
        "subj_label",
        "obj_label",
        props_map.alias("props"),
    )


def node_dims(
    wide: DataFrame,
    node_configs: dict[str, Any],
    spark: SparkSession,
) -> DataFrame:
    """(label, nid) — the distinct node-ID dimension for endpoint
    resolution: ONE scan, ONE exchange for all 13 labels.

    Same melt shape as :func:`extract_triples_fused` — a per-row array of
    (label, id_type, raw_id) candidates, exploded once, distinct once.
    IDs are the dedup key, so no first-seen ordering is needed. Typed
    cleaning (quote strip + unicode unescape, a pandas-UDF stage) runs
    AFTER the distinct — over ~|distinct ids| rows instead of
    13 × |table|; cleaning is per-value deterministic so
    distinct→clean→distinct yields exactly extract_node's ID set."""
    expandable = _expandable_fields(node_configs)
    empty = F.array().cast(
        "array<struct<label:string,t:string,raw:string>>"
    )

    arrays = []
    statics = []
    for label, cfg in node_configs.items():
        idf = cfg.get("id_field", {})
        id_type = idf.get("type", "string")
        synthetic = idf.get("synthetic_value", "")
        id_col = idf.get("hasura_col")

        if idf.get("expand_list"):
            idk = expandable[id_col]["id_key"]
            parsed = parsed_array(wide, id_col)
            pcol = f"_dimids_{id_col}"
            wide = wide.withColumn(
                pcol,
                F.coalesce(
                    F.filter(
                        F.transform(parsed, lambda it: F.element_at(it, idk)),
                        lambda v: v.isNotNull() & (F.trim(v) != ""),
                    ),
                    F.array().cast("array<string>"),
                ),
            )
            arrays.append(
                (label, id_type, pcol)  # expanded marker, resolved below
            )
        elif synthetic and not id_col and "{" not in str(synthetic):
            statics.append((label, str(synthetic)))
        else:
            if synthetic and not id_col and "{" in str(synthetic):
                id_col = idf.get("property_name", "id")
            raw = endpoint_str(id_col)
            arrays.append(
                F.when(
                    ~is_nullish_id(raw),
                    F.array(
                        F.struct(
                            F.lit(label).alias("label"),
                            F.lit(id_type).alias("t"),
                            raw.alias("raw"),
                        )
                    ),
                ).otherwise(empty)
            )

    resolved_arrays = []
    for a in arrays:
        if isinstance(a, tuple):
            label, id_type, pcol = a
            resolved_arrays.append(
                F.transform(
                    F.col(pcol),
                    lambda v: F.struct(
                        F.lit(label).alias("label"),
                        F.lit(id_type).alias("t"),
                        v.alias("raw"),
                    ),
                )
            )
        else:
            resolved_arrays.append(a)
    melted = wide.select(
        F.explode(F.concat(*resolved_arrays)).alias("_el")
    ).select(
        F.col("_el.label").alias("label"),
        F.col("_el.t").alias("_t"),
        F.col("_el.raw").alias("_raw"),
    )
    distinct_raw = melted.distinct()
    cleaned = F.when(
        F.col("_t") == "int", clean_typed(F.col("_raw"), "int").cast("string")
    ).otherwise(clean_typed(F.col("_raw"), "string"))
    out = distinct_raw.select("label", cleaned.alias("nid")).distinct()
    if statics:
        st = spark.createDataFrame(statics, "label string, nid string")
        out = out.unionByName(st)
    return out


# --------------------------------------------------------------------------
# endpoint resolution (the loader's MATCH semantics,
# pipeline/auradb_loader.py:296-329,421-454)
# --------------------------------------------------------------------------


def canonical_endpoint(col: Column, label_col: Column, node_configs: dict[str, Any]) -> Column:
    """Cast a raw endpoint string to the target label's ID type and
    render canonically ('2064.0' → '2064' for int-ID labels)."""
    int_labels = [
        lbl
        for lbl, cfg in node_configs.items()
        if cfg.get("id_field", {}).get("type") == "int"
    ]
    if not int_labels:
        return col
    return F.when(
        label_col.isin(int_labels),
        col.try_cast("double").try_cast("long").cast("string"),
    ).otherwise(col)


def resolve_triples(
    triples: DataFrame,
    nodes: dict[str, DataFrame],
    node_configs: dict[str, Any],
    dims: DataFrame | None = None,
) -> DataFrame:
    """Drop triples whose endpoints match no node — the loader's silent
    MATCH-miss behavior (pipeline/auradb_loader.py:296-309); equivalently
    the reference's own integrity validation
    (scripts/validate_neo4j_import.py:315-319).

    No broadcast hint on the node-ID dimension: |dims| grows with the
    corpus (distinct entities), so a forced broadcast means a serial,
    data-proportional driver collect+hash-build per semi-join — measured
    as the dominant non-scaling cost at 1.6M docs, and outright
    impossible at 10^12. Left to AQE, the join runs as a shuffled
    semi-join and is demoted to broadcast at runtime only when the
    actual built size is small. Pass ``dims`` (from :func:`node_dims`)
    to resolve in one fused exchange instead of 13 per-label dedup
    aggregates."""
    if dims is None:
        dims = None
        for lbl, df in nodes.items():
            d = df.select(
                F.lit(lbl).alias("label"), F.col("id").cast("string").alias("nid")
            )
            dims = d if dims is None else dims.unionByName(d)
        dims = dims.distinct()

    t = triples.withColumn(
        "subj_c",
        canonical_endpoint(F.col("subj"), F.col("subj_label"), node_configs),
    ).withColumn(
        "obj_c", canonical_endpoint(F.col("obj"), F.col("obj_label"), node_configs)
    )
    t = t.join(
        dims.withColumnRenamed("label", "subj_label").withColumnRenamed(
            "nid", "subj_c"
        ),
        on=["subj_label", "subj_c"],
        how="left_semi",
    )
    t = t.join(
        dims.withColumnRenamed("label", "obj_label").withColumnRenamed("nid", "obj_c"),
        on=["obj_label", "obj_c"],
        how="left_semi",
    )
    return t.select(
        "config_key",
        "pred",
        F.col("subj_c").alias("subj"),
        F.col("obj_c").alias("obj"),
        "subj_label",
        "obj_label",
        "props",
    )
