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
        return col.cast("long")
    if ptype == "float":
        return col.cast("double")
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
        return F.when(col, "true").otherwise("false")
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
                if ptype == "boolean":
                    sel.append(F.lit(bool(sv)).alias(pname))
                else:
                    sel.append(F.lit(sv).alias(pname))
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
        if hcol and hcol in wide.columns:
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
            sel.append(F.lit(sv).alias(pname))
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
        F.posexplode(parse_dict_array_udf(F.col(col))).alias("_pos", "_item"),
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
            sel.append(F.lit(sv).alias(pname))
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
        parsed = parse_dict_array_udf(F.col(field))
        ids = F.transform(parsed, lambda it: F.element_at(it, idk))
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
    """All relationship configs → one unioned canonical triple stream."""
    dfs = [
        extract_triples_config(wide, key, cfg, node_configs, run_ts)
        for key, cfg in rel_configs.items()
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
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
        col.cast("double").cast("long").cast("string"),
    ).otherwise(col)


def resolve_triples(
    triples: DataFrame,
    nodes: dict[str, DataFrame],
    node_configs: dict[str, Any],
) -> DataFrame:
    """Drop triples whose endpoints match no node — the loader's silent
    MATCH-miss behavior (pipeline/auradb_loader.py:296-309); equivalently
    the reference's own integrity validation
    (scripts/validate_neo4j_import.py:315-319).

    The node-ID dimension is tiny relative to the triple stream, so both
    semi-joins broadcast — no shuffle of the triples."""
    dims = None
    for lbl, df in nodes.items():
        d = df.select(
            F.lit(lbl).alias("label"), F.col("id").cast("string").alias("nid")
        )
        dims = d if dims is None else dims.unionByName(d)
    dims = F.broadcast(dims.distinct())

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
