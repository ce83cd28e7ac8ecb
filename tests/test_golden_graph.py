"""Golden-triple equality: the Spark pipeline must emit exactly the node
and triple sets the reference's semantics produce on the same records
(P/R = 1.0 ≥ 0.95, BASELINE.json north_rule).

The oracle (`oracle/pyoracle.py`) replays the reference pipeline
(`hasura_extractor.py` → `data_cleaner.py` → `schema_mapper.py`) in pure
Python over the identical synthetic universe; `lastUpdated` (run
timestamp) is excluded per FIXTURES.md §5.
"""

import json

import pytest

from oak_knowledge_graph_neo4j_auradb_spark.oracle import pyoracle
from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import build_graph
from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
    make_universe,
    universe_to_arrow,
)

N_DOCS = 400
RUN_TS = "2026-01-01T00:00:00"


def canon_value(v):
    """Canonical string rendering shared by both sides (lists via
    json.dumps default separators — the reference's node-CSV rendering,
    schema_mapper.py:219-221; booleans lowercase)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return json.dumps(list(v))
    if isinstance(v, float):
        return str(v)
    return str(v)


def canon_props(d):
    return {k: canon_value(v) for k, v in d.items() if k != "lastUpdated"}


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    uni = make_universe(N_DOCS)
    path = str(tmp_path_factory.mktemp("docs") / "documents.parquet")
    import pyarrow.parquet as pq

    pq.write_table(universe_to_arrow(uni), path)
    docs = spark.read.parquet(path)
    gb = build_graph(spark, docs, run_ts=RUN_TS)
    oracle = pyoracle.run_oracle(uni, run_ts=RUN_TS)
    yield gb, oracle
    gb.unpersist()


def spark_nodes_canon(df):
    out = {}
    for row in df.collect():
        d = row.asDict(recursive=True)
        nid = canon_value(d.pop("id"))
        out[nid] = canon_props({k: v for k, v in d.items() if v is not None})
    return out


def oracle_nodes_canon(rows):
    out = {}
    for r in rows:
        d = dict(r)
        nid = canon_value(d.pop("id"))
        out[nid] = canon_props(d)
    return out


@pytest.mark.parametrize(
    "label",
    [
        "Schemaversion",
        "Subject",
        "Phase",
        "Keystage",
        "Year",
        "Unit",
        "Unitoffering",
        "Programme",
        "Tier",
        "Examboard",
        "Unitvariant",
        "Lesson",
        "Thread",
    ],
)
def test_nodes_match_oracle(built, label):
    gb, oracle = built
    got = spark_nodes_canon(gb.nodes[label])
    want = oracle_nodes_canon(oracle["nodes"][label])
    assert set(got) == set(want), (
        f"{label} id sets differ: only-spark={sorted(set(got) - set(want))[:5]} "
        f"only-oracle={sorted(set(want) - set(got))[:5]}"
    )
    for nid in want:
        assert got[nid] == want[nid], f"{label} {nid}: {got[nid]} != {want[nid]}"


def triple_key(t):
    return (t["config_key"], t["subj"], t["obj"])


def test_triples_match_oracle(built):
    gb, oracle = built
    got = {}
    for row in gb.triples.collect():
        d = row.asDict(recursive=True)
        props = {k: v for k, v in (d["props"] or {}).items() if k != "lastUpdated"}
        got[(d["config_key"], d["subj"], d["obj"])] = (
            d["pred"],
            d["subj_label"],
            d["obj_label"],
            props,
        )
    want = {}
    for t in oracle["triples"]:
        want[(t["config_key"], t["subj"], t["obj"])] = (
            t["pred"],
            t["subj_label"],
            t["obj_label"],
            canon_props(t["props"]),
        )
    assert set(got) == set(want), (
        f"triple sets differ: only-spark={sorted(set(got) - set(want))[:5]} "
        f"only-oracle={sorted(set(want) - set(got))[:5]} "
        f"(n_spark={len(got)}, n_oracle={len(want)})"
    )
    for k in want:
        assert got[k] == want[k], f"{k}: {got[k]} != {want[k]}"


def test_resolved_triples_match_oracle(built):
    gb, oracle = built
    got = {
        (d["config_key"], d["subj"], d["obj"])
        for d in (r.asDict() for r in gb.resolved.collect())
    }
    want = {
        (t["config_key"], canon_value(t["subj"]), canon_value(t["obj"]))
        for t in oracle["resolved"]
    }
    assert got == want, (
        f"resolved differ: only-spark={sorted(got - want)[:5]} "
        f"only-oracle={sorted(want - got)[:5]}"
    )


def test_triple_precision_recall_gate(built):
    """Explicit P/R ≥ 0.95 gate on (subj, pred, obj) — the north-rule
    metric; exact equality above implies 1.0 but this records the
    number."""
    gb, oracle = built
    got = {(d["pred"], d["subj"], d["obj"]) for d in (r.asDict() for r in gb.triples.collect())}
    want = {(t["pred"], t["subj"], t["obj"]) for t in oracle["triples"]}
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
