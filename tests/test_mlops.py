"""Handcrafted micro-cases for the model-eval operators (mlops.py),
checking the math the DuckDB twin can't independently witness: AUC tie
midranks, stump argmin placement, and skyline dominance edge cases."""

import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
    q151_auc_rank,
    q152_decision_stump,
    q154_skyline,
)


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    """A tiny sf-dir with handcrafted embeddings / documents / orders."""
    d = str(tmp_path_factory.mktemp("mlops_crafted"))

    emb_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    # positives (label<5) score {3, 2}; negatives {2, 1}:
    # pairwise wins 3, tie 1 → AUC = (3 + 0.5) / 4 = 0.875
    emb = [
        (1, [3.0, 0.0], 0),
        (2, [2.0, 0.0], 1),
        (3, [2.0, 0.0], 7),
        (4, [1.0, 0.0], 9),
    ]
    spark.createDataFrame(emb, emb_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/embeddings.parquet")

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    # perfectly separable at n_chars <= 2: left = 2 en, right = 2 de
    docs = [
        (1, "a", "en", "web", 1),
        (2, "b", "en", "web", 2),
        (3, "c", "de", "web", 10),
        (4, "d", "de", "web", 11),
    ]
    spark.createDataFrame(docs, doc_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")

    ord_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
        ]
    )
    import datetime as dt

    t = [dt.datetime(2024, 1, 1 + i) for i in range(4)]
    # (price, date): two identical maxima survive together; the
    # same-price-older and the cheaper-older points are dominated; the
    # pricier-but-oldest point survives on the price axis.
    orders = [
        (1, 10.0, t[3]),
        (2, 10.0, t[3]),
        (3, 10.0, t[1]),
        (4, 5.0, t[2]),
        (5, 12.0, t[0]),
    ]
    spark.createDataFrame(orders, ord_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    return d


def test_auc_tie_midranks(spark, crafted_dir):
    row = q151_auc_rank(spark, crafted_dir).collect()[0]
    assert row["n_pos"] == 2 and row["n_neg"] == 2
    assert row["auc"] == 0.875


def test_stump_separable(spark, crafted_dir):
    row = q152_decision_stump(spark, crafted_dir).collect()[0]
    assert row["threshold"] == 2
    assert row["n_left"] == 2 and row["n_right"] == 2
    assert row["pos_left"] == 2 and row["pos_right"] == 0
    # perfect split of a balanced parent: gain = parent gini = 0.5
    assert row["gini_gain"] == 0.5


def test_skyline_dominance_edges(spark, crafted_dir):
    rows = q154_skyline(spark, crafted_dir).collect()
    keys = sorted(r["o_orderkey"] for r in rows)
    # duplicates both kept; same-price-older and dominated points out;
    # highest-price point survives despite oldest date
    assert keys == [1, 2, 5]


def test_skyline_no_mutual_domination(spark, sf_dir):
    """On real data: no frontier point dominates another frontier
    point (pairwise check is cheap — frontiers are small)."""
    pts = q154_skyline(spark, sf_dir).collect()
    for a in pts:
        for b in pts:
            if a["o_orderkey"] == b["o_orderkey"]:
                continue
            dominates = (
                a["price_cents"] >= b["price_cents"]
                and a["es"] >= b["es"]
                and (
                    a["price_cents"] > b["price_cents"]
                    or a["es"] > b["es"]
                )
            )
            assert not dominates


def test_fellegi_sunter_weight_ordering(spark, sf_dir):
    """q234: the log-likelihood weight must be monotone in the
    agreement pattern — (seg ∧ bal) > (seg only) and > (bal only) —
    and the top-20 must all carry the maximal observed pattern's
    weight ordering (descending, tie-broken by pair)."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.mlops import (
        q234_fellegi_sunter,
    )

    rows = q234_fellegi_sunter(spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    by_pattern = {}
    for r in rows:
        by_pattern.setdefault((r["agree_seg"], r["agree_bal"]), set()).add(
            r["weight"]
        )
    for pat, ws in by_pattern.items():
        assert len(ws) == 1, f"pattern {pat} maps to several weights: {ws}"
    w = {p: next(iter(ws)) for p, ws in by_pattern.items()}
    if (True, True) in w and (True, False) in w:
        assert w[(True, True)] > w[(True, False)]
    if (True, True) in w and (False, True) in w:
        assert w[(True, True)] > w[(False, True)]
    weights = [r["weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)
