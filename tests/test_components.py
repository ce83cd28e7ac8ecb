"""Connected-components canonicalization + mention linking (north_rule
stages K and L; operators/components.py, operators/linking.py)."""

import pyspark.sql.functions as F
import pytest

from oak_knowledge_graph_neo4j_auradb_spark.operators.components import (
    canonicalize,
    connected_components,
)
from oak_knowledge_graph_neo4j_auradb_spark.operators.linking import (
    extract_mentions,
    link_mentions,
)


def cc_dict(df):
    return {r["id"]: r["canonical_id"] for r in df.collect()}


def test_cc_chain(spark):
    # a-b-c-d chain plus isolated pair e-f: two components
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("f", "e")], "src string, dst string"
    )
    got = cc_dict(connected_components(edges))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


def test_cc_cycle_and_selfloop(spark):
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x"), ("w", "w")],
        "src string, dst string",
    )
    got = cc_dict(connected_components(edges))
    # self-loop-only node drops out of the edge set (no non-self edges)
    assert got == {"x": "x", "y": "x", "z": "x"}


def test_cc_salted_matches_unsalted(spark):
    rows = [(f"n{i}", f"n{(i * 7) % 40}") for i in range(40)] + [
        ("hub", f"n{i}") for i in range(0, 40, 2)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    plain = cc_dict(connected_components(edges))
    salted = cc_dict(connected_components(edges, salt=8))
    assert plain == salted


def test_cc_long_chain_converges(spark):
    n = 24
    edges = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(n)],
        "src string, dst string",
    )
    got = cc_dict(connected_components(edges, max_iter=40))
    assert set(got.values()) == {"v000"}
    assert len(got) == n + 1


def test_canonicalize_rewrites_and_passes_through(spark):
    comp = spark.createDataFrame(
        [("b", "a"), ("a", "a")], "id string, canonical_id string"
    )
    df = spark.createDataFrame(
        [("b", 1), ("a", 2), ("zz", 3)], "k string, v int"
    )
    out = {
        r["k"]: r["v"]
        for r in canonicalize(df, comp, "k").collect()
    }
    # b rewritten to a (values 1 and 2 both under 'a' now), zz untouched
    assert sorted(out) == ["a", "zz"]


def test_mention_extraction_and_linking(spark):
    docs = spark.createDataFrame(
        [
            (
                "doc-1",
                [
                    {"kind": "text", "text": "x=see unit-maths-0001 and thread-003",
                     "media_ref": "", "offset": 0},
                    {"kind": "field", "text": "y=unit-maths-9999",
                     "media_ref": "", "offset": 1},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    m = extract_mentions(docs)
    got = {(r["label"], r["mention"]) for r in m.collect()}
    # field spans are not prose — no mention from the 9999 unit
    assert got == {("Unit", "unit-maths-0001"), ("Thread", "thread-003")}

    dictionary = spark.createDataFrame(
        [("Unit", "unit-maths-0001")], "label string, nid string"
    )
    linked = {
        (r["label"], r["mention"]): r["linked"]
        for r in link_mentions(m, dictionary).collect()
    }
    assert linked == {
        ("Unit", "unit-maths-0001"): True,
        ("Thread", "thread-003"): False,
    }
