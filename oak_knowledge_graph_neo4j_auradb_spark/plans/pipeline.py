"""End-to-end KG-construction plan: documents → nodes + triples.

Mirrors the reference's batch lifecycle (main.py:77-214): extract+join →
clean → schema-map → load — except every stage is a lazy DataFrame plan
and the "load" is a partitioned columnar write (Iceberg in production;
parquet in this sandbox, see ``sinks.py``).

Scale shape (SURVEY.md §7.1): one scan of the document table feeds both
MV reconstructions; the consolidated wide table is persisted once and
fanned out to 13 node plans + 12 relationship plans; each plan's only
shuffle is its dedup aggregate (map-side combined). The supplementary
join broadcasts. Endpoint resolution broadcasts the node-ID dimension.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from ..config.curriculum_schema import FILTERS, NODES, RELATIONSHIPS
from ..operators import clean as clean_op
from ..operators import joins as join_op
from ..operators import mapper as mapper_op
from ..operators.reconstruct import reconstruct_wide

RUN_TS = "2026-01-01T00:00:00"


@dataclass
class GraphBuild:
    wide: DataFrame
    nodes: dict[str, DataFrame]
    triples: DataFrame
    resolved: DataFrame
    extras: dict[str, Any] = field(default_factory=dict)

    def unpersist(self) -> None:
        self.wide.unpersist()


def build_graph(
    spark: SparkSession,
    docs: DataFrame,
    run_ts: str = RUN_TS,
    broadcast_sup: bool = True,
    node_configs: dict[str, Any] | None = None,
    rel_configs: dict[str, Any] | None = None,
    filters: dict[str, Any] | None = None,
    persist_wide: bool = True,
) -> GraphBuild:
    """Compile the full graph-construction plan over a documents table."""
    node_configs = node_configs if node_configs is not None else NODES
    rel_configs = rel_configs if rel_configs is not None else RELATIONSHIPS
    filters = filters if filters is not None else FILTERS

    primary = reconstruct_wide(docs, "primary")
    supplementary = reconstruct_wide(docs, "supplementary")
    wide = join_op.consolidate(primary, supplementary, broadcast_sup=broadcast_sup)
    wide = clean_op.clean(wide, filters, run_ts)
    if persist_wide:
        # one materialization fans out to all 25 extraction plans
        wide = wide.persist(StorageLevel.MEMORY_AND_DISK)

    nodes = mapper_op.extract_nodes(wide, node_configs, run_ts, spark)
    triples = mapper_op.extract_triples(wide, rel_configs, node_configs, run_ts)
    resolved = mapper_op.resolve_triples(triples, nodes, node_configs)
    return GraphBuild(wide=wide, nodes=nodes, triples=triples, resolved=resolved)
