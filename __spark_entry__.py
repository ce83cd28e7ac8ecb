"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline over the
sf0.001 documents table (span-encode → reconstruct → extract → resolve)
and returns the resolved triple stream. ``queries()`` exposes every
implemented operator (SURVEY.md §2 + training-data ops); ``oracle_sql()``
gives each one's DuckDB twin for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction over the sf0.001 documents table."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import kg_flagship

    return kg_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from oak_knowledge_graph_neo4j_auradb_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from oak_knowledge_graph_neo4j_auradb_spark.queries import ORACLES

    return dict(ORACLES)
