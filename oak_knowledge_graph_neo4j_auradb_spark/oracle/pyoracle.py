"""Golden-triple oracle: a pure-Python, single-process replay of the
reference pipeline's semantics over the synthetic universe.

This is the correctness anchor for the Spark engine (SURVEY.md §5b): the
reference's mapping is pure given input order, so replaying its semantics
on the same records yields the exact node/triple sets the reference would
emit — the Spark pipeline is then pinned to equality (P/R = 1.0 ≥ 0.95,
BASELINE.json north_rule).

Clean-room reimplementation — behavior is specified by these reference
locations (/root/reference), not by copied code:

* explode programme_slug_by_year        hasura_extractor.py:132-143,210-221
* unit_slug suffix normalization        hasura_extractor.py:186-208
* ordered left merge on composite key   hasura_extractor.py:222-247
* trim / filter / synthetic / ts        data_cleaner.py:81-110,296-368
* CSV round-trip dtype semantics        data_cleaner.py:88-89 + pandas NA tokens
* node extraction + first-seen dedup    schema_mapper.py:73-247
* array→node expansion (threads)        schema_mapper.py:633-787
* relationship extraction + dedup       schema_mapper.py:249-486
* value cleaning / types / empties      schema_mapper.py:540-868
* loader endpoint type casts            pipeline/auradb_loader.py:324-329,421-454
"""

from __future__ import annotations

import ast
import json
import re
from typing import Any

from ..config.curriculum_schema import (
    FILTERS,
    NODES,
    RELATIONSHIPS,
    column_dtype,
)
from ..sources.docgen import Universe

RUN_TS = "2026-01-01T00:00:00"

_UNI_RE = re.compile(r"\\u([0-9a-fA-F]{4})")

#: pandas default NA tokens that matter for our value space — a string
#: column value equal to one of these round-trips through the cleaned CSV
#: back into NaN at schema-mapper read time (pd.read_csv defaults).
NA_TOKENS = {"", "nan", "NaN", "NULL", "null", "None", "N/A", "NA", "n/a", "<NA>"}


def _unescape(text: str) -> str:
    try:
        return _UNI_RE.sub(lambda m: chr(int(m.group(1), 16)), text)
    except (ValueError, OverflowError):
        return text


def _strip_quotes(text: str) -> str:
    if len(text) >= 2 and text[0] == text[-1] and text[0] in "'\"":
        return text[1:-1]
    return text


def _is_empty(value: Any) -> bool:
    """schema_mapper.py:573-592."""
    if isinstance(value, str):
        t = value.strip()
        if t in ("", "[]", "{}"):
            return True
        try:
            p = json.loads(t)
            return isinstance(p, (list, dict)) and not p
        except (json.JSONDecodeError, ValueError):
            return False
    if isinstance(value, (list, dict)):
        return not value
    return False


def _parse_array(value: Any) -> list | None:
    """Dual-dialect array parse (schema_mapper.py:680-695)."""
    if isinstance(value, list):
        return value
    if not isinstance(value, str):
        return None
    try:
        p = json.loads(value)
    except (json.JSONDecodeError, ValueError):
        try:
            p = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            return None
    return p if isinstance(p, list) else None


def clean_value(value: Any, data_type: str) -> Any:
    """schema_mapper.py:789-868 (None ⇒ property omitted)."""
    if value is None or _is_empty(value):
        return None
    try:
        if data_type == "int":
            return int(float(value))
        if data_type == "float":
            return float(value)
        if data_type == "boolean":
            if isinstance(value, str):
                return value.lower() in ("true", "1", "yes", "on")
            return bool(value)
        if data_type == "datetime":
            return str(value).strip()
        if data_type == "list":
            if isinstance(value, str) and value.strip():
                arr = _parse_array(value)
                if arr is None:
                    # non-list parse result or hard failure
                    try:
                        p = json.loads(value)
                        return [str(p)]
                    except (json.JSONDecodeError, ValueError):
                        try:
                            p = ast.literal_eval(value)
                            return [str(p)]
                        except (ValueError, SyntaxError):
                            return [str(value).strip()]
                out = []
                for item in arr:
                    if isinstance(item, dict):
                        out.append(_unescape(json.dumps(item)))
                    else:
                        out.append(str(item).strip())
                return [x for x in out if x]
            if isinstance(value, list):
                return value
            return [str(value).strip()]
        # string
        if isinstance(value, (dict, list)):
            return json.dumps(value)
        return _unescape(_strip_quotes(str(value).strip()))
    except (ValueError, TypeError):
        return _unescape(_strip_quotes(str(value).strip()))


def compute_value(value: Any, rule: str) -> Any:
    """schema_mapper.py:540-571 (value is post-round-trip: None = NaN)."""
    empty = value is None or _is_empty(value)
    if rule == "is_not_null":
        return not empty
    if rule == "is_null":
        return empty
    return None


def _fmt(value: Any, dtype: str) -> str:
    """str(row[col]) as the mapper sees it after the CSV round trip:
    None → 'nan' (both float NaN and object-NaN render 'nan'),
    floats keep '.0', bools 'True'/'False'."""
    if value is None:
        return "nan"
    if dtype == "double":
        return str(float(value))
    if dtype == "long":
        return str(int(value))
    if dtype == "boolean":
        return "True" if value else "False"
    return str(value)


# --------------------------------------------------------------------------
# pipeline stages
# --------------------------------------------------------------------------


def _normalize_slug(slug: Any) -> Any:
    if slug is None:
        return None
    m = re.match(r"^(.+)-(\d+)$", str(slug))
    return m.group(1) if m else slug


def _explode_psby(rows: list[dict]) -> list[dict]:
    out = []
    for r in rows:
        v = r.get("programme_slug_by_year")
        if isinstance(v, list):
            for el in v:
                rr = dict(r)
                rr["programme_slug_by_year"] = el
                out.append(rr)
        else:
            out.append(dict(r))
    return out


def consolidate(uni: Universe) -> list[dict]:
    """Explode → normalize → ordered left merge (hasura_extractor.py:100-247)."""
    left = _explode_psby(uni.primary)
    right = []
    for r in uni.supplementary:
        rr = dict(r)
        rr["unit_slug"] = _normalize_slug(rr.get("unit_slug"))
        right.append(rr)
    right = _explode_psby(right)

    index: dict[tuple, list[dict]] = {}
    for rr in right:
        index.setdefault(
            (rr.get("unit_slug"), rr.get("programme_slug_by_year")), []
        ).append(rr)

    sup_cols = [c for c in ("unit_order", "threads")]
    out = []
    for lr in left:
        key = (lr.get("unit_slug"), lr.get("programme_slug_by_year"))
        matches = index.get(key)
        if matches:
            for m in matches:
                row = dict(lr)
                for c in sup_cols:
                    row[c] = m.get(c)
                out.append(row)
        else:
            row = dict(lr)
            for c in sup_cols:
                row[c] = None
            out.append(row)
    return out


def clean(rows: list[dict], run_ts: str = RUN_TS) -> list[dict]:
    """data_cleaner.py:81-110 + the cleaned-CSV round trip back into the
    mapper (data_cleaner.py:53-66 → schema_mapper.py:34-39)."""
    out = []
    for r in rows:
        if all(v is None for v in r.values()):
            continue  # dropna(how="all"), data_cleaner.py:84
        row = dict(r)
        # strip object (string) columns
        for c, v in row.items():
            if isinstance(v, str):
                row[c] = v.strip()
        # filters (data_cleaner.py:112-134)
        skip = False
        for col, want in FILTERS.items():
            v = row.get(col)
            if isinstance(want, list):
                if v not in want:
                    skip = True
            elif v != want:
                skip = True
        if skip:
            continue
        # synthetic columns (data_cleaner.py:296-368) — computed on the
        # astype(str) frame, where a null string field reads "nan"
        for label, cfg in NODES.items():
            idf = cfg.get("id_field", {})
            tmpl = idf.get("synthetic_value", "")
            if not tmpl or "{" not in tmpl:
                continue
            col = idf.get("hasura_col") or idf.get("property_name", "id")
            rid = tmpl
            ok = True
            for ph in re.findall(r"\{([^}]+)\}", tmpl):
                v = row.get(ph)
                if column_dtype(ph) == "string":
                    v = "nan" if v is None else v  # astype(str) mirror
                if v is None:
                    ok = False
                    break
                rid = rid.replace("{" + ph + "}", str(v).strip())
            row[col] = rid if ok else ""
        row["current_timestamp"] = run_ts
        # CSV round trip: string values that are pandas NA tokens → None
        for c, v in list(row.items()):
            if isinstance(v, str) and v in NA_TOKENS:
                row[c] = None
        out.append(row)
    return out


def extract_nodes(rows: list[dict], run_ts: str = RUN_TS) -> dict[str, list[dict]]:
    """schema_mapper.py:73-247 (+ array expansion :633-787)."""
    result: dict[str, list[dict]] = {}
    for label, cfg in NODES.items():
        idf = cfg.get("id_field", {})
        props = cfg.get("properties", {})
        seen: set[str] = set()
        nodes: list[dict] = []

        if idf.get("expand_list"):
            col = idf.get("hasura_col")
            id_key = idf.get("id_key", idf.get("property_name", "id"))
            id_type = idf.get("type", "string")
            for row in rows:
                arr = row.get(col)
                if arr is None:
                    continue
                parsed = _parse_array(arr)
                if parsed is None:
                    continue
                for item in parsed:
                    if not isinstance(item, dict) or id_key not in item:
                        continue
                    idv = str(item[id_key])
                    if not idv.strip() or idv in seen:
                        continue
                    seen.add(idv)
                    node = {"id": clean_value(idv, id_type)}
                    for pname, pcfg in props.items():
                        hcol = pcfg.get("hasura_col")
                        ptype = pcfg.get("type", "string")
                        sv = pcfg.get("synthetic_value")
                        if sv is not None and sv != "":
                            cv = clean_value(sv, ptype)
                            if cv is not None:
                                node[pname] = cv
                        elif hcol == "current_timestamp":
                            node[pname] = run_ts
                        elif hcol and hcol in item:
                            cv = clean_value(item[hcol], ptype)
                            if cv is not None:
                                node[pname] = (
                                    json.dumps(cv)
                                    if ptype == "list" and isinstance(cv, list)
                                    else cv
                                )
                    nodes.append(node)
            result[label] = nodes
            continue

        synthetic = idf.get("synthetic_value", "")
        id_col = idf.get("hasura_col")
        static = bool(synthetic) and not id_col and "{" not in synthetic
        if static:
            node = {"id": synthetic}
            for pname, pcfg in props.items():
                ptype = pcfg.get("type", "string")
                sv = pcfg.get("synthetic_value")
                hcol = pcfg.get("hasura_col")
                if sv is not None and sv != "":
                    node[pname] = clean_value(sv, ptype)
                elif hcol == "current_timestamp":
                    node[pname] = run_ts
            result[label] = [node]
            continue

        if synthetic and not id_col and "{" in synthetic:
            id_col = idf.get("property_name", "id")
        id_type = idf.get("type", "string")
        dtype = column_dtype(id_col)
        for row in rows:
            if id_col not in row:
                continue
            raw = row.get(id_col)
            if raw is None:
                continue  # pd.isna skip (schema_mapper.py:159-160)
            idv = _fmt(raw, dtype)
            if not idv.strip() or idv.lower() in ("nan", "null", "none"):
                continue
            if idv in seen:
                continue
            seen.add(idv)
            node = {"id": clean_value(idv, id_type)}
            for pname, pcfg in props.items():
                hcol = pcfg.get("hasura_col")
                ptype = pcfg.get("type", "string")
                sv = pcfg.get("synthetic_value")
                if sv is not None and sv != "":
                    cv = clean_value(sv, ptype)
                    if cv is not None:
                        node[pname] = cv
                elif hcol and hcol in row:
                    cv = clean_value(row.get(hcol), ptype)
                    if cv is not None:
                        node[pname] = (
                            json.dumps(cv)
                            if ptype == "list" and isinstance(cv, list)
                            else cv
                        )
                elif hcol == "current_timestamp":
                    node[pname] = run_ts
            nodes.append(node)
        result[label] = nodes
    return result


def _expandable_fields() -> dict[str, dict]:
    out = {}
    for label, cfg in NODES.items():
        idf = cfg.get("id_field", {})
        if idf.get("expand_list"):
            pname = idf.get("property_name", "id")
            out[idf.get("hasura_col")] = {
                "node_type": label,
                "id_key": idf.get("id_key", pname),
            }
    return out


def extract_triples(rows: list[dict], run_ts: str = RUN_TS) -> list[dict]:
    """schema_mapper.py:249-486: per-config first-seen dedup on
    (start, end, type); array endpoints expand to a per-row cross
    product; raw string endpoints exactly as ``str(row[field])``."""
    expandable = _expandable_fields()
    triples: list[dict] = []
    for key, cfg in RELATIONSHIPS.items():
        rtype = cfg.get("relationship_type", key)
        sf, ef = cfg.get("start_csv_field"), cfg.get("end_csv_field")
        props = cfg.get("properties", {})
        s_arr, e_arr = sf in expandable, ef in expandable
        seen: set[tuple] = set()
        for row in rows:

            def endpoint_ids(field: str, is_arr: bool) -> list[str]:
                if is_arr:
                    raw = row.get(field)
                    if raw is None:
                        return []
                    parsed = _parse_array(raw)
                    if parsed is None:
                        return []
                    idk = expandable[field]["id_key"]
                    return [
                        str(i[idk])
                        for i in parsed
                        if isinstance(i, dict)
                        and idk in i
                        and str(i[idk]).strip()
                    ]
                if field not in row:
                    return []
                v = _fmt(row.get(field), column_dtype(field))
                return [v] if v.strip() else []

            starts = endpoint_ids(sf, s_arr)
            ends = endpoint_ids(ef, e_arr)
            for s in starts:
                for e in ends:
                    if not s or not e:
                        continue
                    rk = (s, e, rtype)
                    if rk in seen:
                        continue
                    seen.add(rk)
                    trip = {
                        "config_key": key,
                        "pred": rtype,
                        "subj": s,
                        "obj": e,
                        "subj_label": cfg.get("start_node_type"),
                        "obj_label": cfg.get("end_node_type"),
                        "props": {},
                    }
                    for pname, pcfg in props.items():
                        hcol = pcfg.get("hasura_col")
                        ptype = pcfg.get("type", "string")
                        rule = pcfg.get("computed")
                        if rule and hcol and hcol in row:
                            cv = compute_value(row.get(hcol), rule)
                            if cv is not None:
                                trip["props"][pname] = cv
                        elif hcol and hcol in row:
                            cv = clean_value(row.get(hcol), ptype)
                            if cv is not None:
                                trip["props"][pname] = cv
                        elif hcol == "current_timestamp":
                            trip["props"][pname] = run_ts
                    triples.append(trip)
    return triples


def resolve_triples(
    nodes: dict[str, list[dict]], triples: list[dict]
) -> list[dict]:
    """Loader endpoint resolution (pipeline/auradb_loader.py:296-329):
    endpoint strings cast to the target node's ID type; edges whose
    endpoint matches no node silently drop."""
    idsets: dict[str, set] = {}
    idtypes: dict[str, str] = {
        lbl: cfg.get("id_field", {}).get("type", "string")
        for lbl, cfg in NODES.items()
    }
    for lbl, rows in nodes.items():
        idsets[lbl] = {r["id"] for r in rows}

    def cast(v: str, t: str):
        try:
            if t == "int":
                return int(float(v))
            return v
        except (ValueError, TypeError):
            return v

    out = []
    for t in triples:
        s = cast(t["subj"], idtypes.get(t["subj_label"], "string"))
        e = cast(t["obj"], idtypes.get(t["obj_label"], "string"))
        if s in idsets.get(t["subj_label"], set()) and e in idsets.get(
            t["obj_label"], set()
        ):
            out.append({**t, "subj": s, "obj": e})
    return out


def run_oracle(uni: Universe, run_ts: str = RUN_TS) -> dict[str, Any]:
    """Full replay: consolidate → clean → nodes + triples (+resolved)."""
    rows = clean(consolidate(uni), run_ts)
    nodes = extract_nodes(rows, run_ts)
    triples = extract_triples(rows, run_ts)
    return {
        "rows": rows,
        "nodes": nodes,
        "triples": triples,
        "resolved": resolve_triples(nodes, triples),
    }
