"""End-to-end KG-construction plan: documents → nodes + triples.

Mirrors the reference's batch lifecycle (main.py:77-214): extract+join →
clean → schema-map → load — except every stage is a lazy DataFrame plan
and the "load" is a partitioned columnar write (Iceberg in production;
parquet in this sandbox, see ``sinks.py``).

Scale shape (SURVEY.md §7.1):

* the document scan is explicitly repartitioned on ``hash(doc_id)``
  (north_rule) so reconstruction parallelism never depends on source
  file layout — a 10^12-doc Iceberg table arrives in whatever file
  splits the writer chose; one 8 MB parquet file in this sandbox arrives
  as a single split. Both get ``shuffle.partitions`` of work. The
  exchange is reused by both MV reconstructions (ReusedExchange).
* the consolidated wide table is persisted once and fanned out to the
  extraction plans; the supplementary join broadcasts (no shuffle of the
  lesson-level side).
* triple extraction is ONE fused exchange for all 12 configs
  (`operators/mapper.py:extract_triples_fused`); endpoint resolution
  semi-joins against a ONE-exchange node-ID dimension (`node_dims`)
  via AQE-planned shuffled semi-joins — no data-proportional driver
  collect. Flagship total: 4 exchanges (repartition, wide persist
  fan-in, fused triples, fused dims) regardless of config count.
* per-label typed node tables (13 dedup aggregates) are built lazily —
  consumers that only need the resolved triple stream never pay their
  plan-construction or execution cost.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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
    triples: DataFrame
    resolved: DataFrame
    _node_args: tuple = field(default=(), repr=False)
    _nodes: dict[str, DataFrame] | None = field(default=None, repr=False)
    extras: dict[str, Any] = field(default_factory=dict)

    @property
    def nodes(self) -> dict[str, DataFrame]:
        """Per-label typed node tables, built on first access."""
        if self._nodes is None:
            wide, node_configs, run_ts, spark = self._node_args
            self._nodes = mapper_op.extract_nodes(
                wide, node_configs, run_ts, spark
            )
        return self._nodes

    def unpersist(self) -> None:
        self.wide.unpersist()
        self.resolved.unpersist()  # no-op unless a caller persisted it
        if "dims" in self.extras:
            self.extras["dims"].unpersist()


def build_graph(
    spark: SparkSession,
    docs: DataFrame,
    run_ts: str = RUN_TS,
    broadcast_sup: bool = True,
    node_configs: dict[str, Any] | None = None,
    rel_configs: dict[str, Any] | None = None,
    filters: dict[str, Any] | None = None,
    persist_wide: bool = True,
    repartition_docs: bool = True,
) -> GraphBuild:
    """Compile the full graph-construction plan over a documents table."""
    node_configs = node_configs if node_configs is not None else NODES
    rel_configs = rel_configs if rel_configs is not None else RELATIONSHIPS
    filters = filters if filters is not None else FILTERS

    if repartition_docs:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        docs = docs.repartition(n_part, F.col("doc_id"))

    primary = reconstruct_wide(docs, "primary")
    supplementary = reconstruct_wide(docs, "supplementary")
    wide = join_op.consolidate(primary, supplementary, broadcast_sup=broadcast_sup)
    wide = clean_op.clean(wide, filters, run_ts)
    wide = mapper_op.with_parsed_arrays(wide, node_configs)
    if persist_wide:
        # one materialization fans out to all extraction plans
        wide = wide.persist(StorageLevel.MEMORY_AND_DISK)

    triples = mapper_op.extract_triples_fused(
        wide, rel_configs, node_configs, run_ts
    )
    dims = mapper_op.node_dims(wide, node_configs, spark)
    # both endpoint semi-joins (AQE-planned shuffled joins; AQE may
    # demote to broadcast at runtime if the dimension turns out tiny)
    # consume this dimension; without the persist each semi-join
    # re-runs the melt+distinct (the rename-divergent plans defeat
    # Spark's exchange reuse)
    dims = dims.persist(StorageLevel.MEMORY_AND_DISK)
    resolved = mapper_op.resolve_triples(triples, {}, node_configs, dims=dims)
    return GraphBuild(
        wide=wide,
        triples=triples,
        resolved=resolved,
        _node_args=(wide, node_configs, run_ts, spark),
        extras={"dims": dims},
    )


def build_graph_from_config(
    spark: SparkSession,
    docs: DataFrame,
    config: str | dict[str, Any],
    run_ts: str = RUN_TS,
    **kwargs: Any,
) -> GraphBuild:
    """Config-as-program entry: a reference-dialect JSON file (or an
    already-loaded config dict) drives the whole build with no code
    changes (reference README.md:10, config_manager.py:22-77). The
    config is validated, env-substituted, legacy-converted, and
    compiled to planner structures by ``config/manager.py``; a user's
    modified JSON runs the engine directly:

        gb = build_graph_from_config(spark, docs, "my_schema.json")
    """
    from ..config.manager import (
        compile_config,
        load_graph_config,
        validate_config_dict,
    )

    gc = (
        load_graph_config(config)
        if isinstance(config, str)
        else compile_config(validate_config_dict(dict(config)))
    )
    return build_graph(
        spark,
        docs,
        run_ts=run_ts,
        node_configs=gc.nodes,
        rel_configs=gc.relationships,
        filters=gc.filters,
        **kwargs,
    )
