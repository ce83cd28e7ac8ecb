"""Validation quarantine: rows the pipeline would otherwise drop
silently are routed to a side-output with (rule, reason, source ref) —
the reference's per-batch ValidationResult semantics
(pipeline/validators.py:8-67: valid/invalid routing with error strings)
re-expressed as a DataFrame, so at 100 TB the audit trail is a queryable
table instead of a driver-side error list.

Three rules cover every silent drop in the mapping stage:

* ``node_id_nullish`` — a wide row whose id column for a label is
  null-ish ('', 'nan', 'None', NULL): the reference's SchemaMapper
  skips the record (schema_mapper.py:172-176); here it skips node
  emission AND lands in quarantine.
* ``endpoint_empty`` — a relationship config row with a blank scalar
  endpoint (skipped before the triple melt).
* ``dangling_endpoint`` — an extracted triple whose subject/object
  matches no node id: the loader's silent MATCH-miss
  (pipeline/auradb_loader.py:296-309).

Scale shape: the two wide-table rules share ONE melt/explode pass (the
``extract_triples_fused`` pattern — one scan, one exchange regardless
of config count); the dangling rule is the exact complement of
``resolve_triples``'s two semi-joins (left joins against the same
persisted ``node_dims``), so ``triples == resolved + dangling`` row-for-
row — asserted in tests/test_quarantine.py.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import is_nullish_id
from .mapper import canonical_endpoint, endpoint_str, _expandable_fields

#: unified quarantine schema
_ENTRY_T = (
    "array<struct<rule:string,target:string,field:string,"
    "value:string,reason:string>>"
)


def _entry(rule: str, target: str, fld: str, value: Column, reason: str) -> Column:
    return F.struct(
        F.lit(rule).alias("rule"),
        F.lit(target).alias("target"),
        F.lit(fld).alias("field"),
        value.cast("string").alias("value"),
        F.lit(reason).alias("reason"),
    )


def wide_quarantine(
    wide: DataFrame,
    node_configs: dict[str, Any],
    rel_configs: dict[str, Any],
) -> DataFrame:
    """Node-id and endpoint rules over the wide table — one pass.

    Returns (rule, target, field, value, reason, source_ref) where
    source_ref is the row's ``_ord`` extraction-order key (the
    engine-wide source lineage key)."""
    expandable = _expandable_fields(node_configs)
    empty = F.array().cast(_ENTRY_T)

    arrays: list[Column] = []
    for label, cfg in node_configs.items():
        idf = cfg.get("id_field", {})
        id_col = idf.get("hasura_col")
        if not id_col or idf.get("expand_list") or id_col == "current_timestamp":
            continue  # synthetic / list ids cannot be null-ish per row
        raw = endpoint_str(id_col)
        arrays.append(
            F.when(
                is_nullish_id(raw),
                F.array(
                    _entry(
                        "node_id_nullish",
                        label,
                        id_col,
                        raw,
                        "id field is null-ish; node emission skipped "
                        "(schema_mapper.py:172-176)",
                    )
                ),
            ).otherwise(empty)
        )
    for config_key, cfg in rel_configs.items():
        for side, fld_key in (
            ("start", "start_csv_field"),
            ("end", "end_csv_field"),
        ):
            fld = cfg.get(fld_key)
            if not fld or fld in expandable:
                continue  # empty ID lists are valid (zero triples)
            raw = endpoint_str(fld)
            arrays.append(
                F.when(
                    F.trim(raw) == "",
                    F.array(
                        _entry(
                            "endpoint_empty",
                            config_key,
                            fld,
                            raw,
                            f"{side} endpoint blank; triple skipped",
                        )
                    ),
                ).otherwise(empty)
            )

    melted = wide.select(
        F.col("_ord").cast("string").alias("source_ref"),
        F.explode(F.concat(*arrays)).alias("_e"),
    )
    return melted.select(
        "_e.rule", "_e.target", "_e.field", "_e.value", "_e.reason", "source_ref"
    )


def dangling_quarantine(
    triples: DataFrame,
    node_configs: dict[str, Any],
    dims: DataFrame,
) -> DataFrame:
    """Triples failing endpoint resolution — the exact complement of
    ``resolve_triples`` (same canonicalization, same dims), with the
    failing side(s) in the reason."""
    t = triples.withColumn(
        "subj_c",
        canonical_endpoint(F.col("subj"), F.col("subj_label"), node_configs),
    ).withColumn(
        "obj_c",
        canonical_endpoint(F.col("obj"), F.col("obj_label"), node_configs),
    )
    d_s = dims.select(
        F.col("label").alias("subj_label"),
        F.col("nid").alias("subj_c"),
        F.lit(True).alias("_s_ok"),
    )
    d_o = dims.select(
        F.col("label").alias("obj_label"),
        F.col("nid").alias("obj_c"),
        F.lit(True).alias("_o_ok"),
    )
    bad = (
        t.join(d_s, on=["subj_label", "subj_c"], how="left")
        .join(d_o, on=["obj_label", "obj_c"], how="left")
        .filter(F.col("_s_ok").isNull() | F.col("_o_ok").isNull())
    )
    side = F.concat_ws(
        "+",
        F.when(F.col("_s_ok").isNull(), F.lit("subj")),
        F.when(F.col("_o_ok").isNull(), F.lit("obj")),
    )
    return bad.select(
        F.lit("dangling_endpoint").alias("rule"),
        F.col("config_key").alias("target"),
        side.alias("field"),
        F.concat_ws("->", "subj_c", "obj_c").alias("value"),
        F.concat(
            F.lit("endpoint matches no node ("), side, F.lit("); MATCH-miss")
        ).alias("reason"),
        F.concat_ws("|", "subj_label", "obj_label").alias("source_ref"),
    )


def quarantine(
    wide: DataFrame,
    triples: DataFrame,
    node_configs: dict[str, Any],
    rel_configs: dict[str, Any],
    dims: DataFrame,
) -> DataFrame:
    """All rules unioned into one side-output table."""
    return wide_quarantine(wide, node_configs, rel_configs).unionByName(
        dangling_quarantine(triples, node_configs, dims)
    )


#: rules keyed on a wide-table row (source_ref = _ord); dangling is
#: triple-level and counts as errors, not invalid source records
_RECORD_RULES = ("node_id_nullish", "endpoint_empty")


def validation_summary(
    quarantined: DataFrame, total_records: int
) -> dict[str, int]:
    """The reference ValidationResult's summary counts
    (validators.py:15-20) from the quarantine table. ``error_count``
    is total rule hits; ``invalid_records`` counts DISTINCT source
    records (a record failing several rules is one invalid record,
    matching the per-record routing of validators.py:28-33)."""
    agg = quarantined.groupBy("rule").agg(F.count("*").alias("n")).collect()
    by_rule = {r["rule"]: r["n"] for r in agg}
    invalid = (
        quarantined.filter(F.col("rule").isin(*_RECORD_RULES))
        .select("source_ref")
        .distinct()
        .count()
    )
    return {
        "total_records": total_records,
        "valid_records": total_records - invalid,
        "invalid_records": invalid,
        "error_count": sum(by_rule.values()),
        **{f"rule_{k}": v for k, v in by_rule.items()},
    }
