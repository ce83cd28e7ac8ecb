"""Neo4j bulk-import CSV export + ``neo4j-admin`` command generation —
the reference's loader-facing surface (SURVEY §2 S8/S10/S11), produced
distributed.

Header conventions replicated exactly from the reference:

* node files ``{label.lower()}_nodes.csv`` with the ID column headed
  ``{property_name}:ID({Label})`` and every property ``{name}:{type}``
  (schema_mapper.py:113-114,183-185,236-246);
* relationship files ``{config_key.lower()}_relationships.csv`` headed
  ``:START_ID({StartLabel})``, ``:END_ID({EndLabel})``, ``:TYPE`` plus
  typed properties (schema_mapper.py:340-345,373-385);
* list-typed properties JSON-encoded into the cell
  (schema_mapper.py:249-255);
* full quoting — the reference passes ``quoting=1`` to ``to_csv``
  (schema_mapper.py:245,384), which is ``csv.QUOTE_ALL`` despite its
  inline "QUOTE_MINIMAL" comment; ``quoteAll`` here follows the actual
  behavior, not the comment;
* files split at 10,000 rows (HISTORY.md:357-363 — the reference split
  CSVs so imports could not die mid-file; here it is one
  ``maxRecordsPerFile`` option instead of a post-pass);
* the ``neo4j-admin database import full`` command string with the
  reference's exact flag set (pipeline/loaders.py:12-59).

Each "file" is a Spark output directory of part CSVs (every part
carries the header); the command generator enumerates the parts, which
is also how the reference's loader consumed its ``_partN`` splits
(pipeline/auradb_loader.py:277-282).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import GraphBuild


def _node_headers(
    label: str, cfg: dict[str, Any], df: DataFrame
) -> list[tuple[str, str]]:
    """(df_column, csv_header) pairs for one node table."""
    idf = cfg.get("id_field", {})
    id_prop = idf.get("property_name", "id")
    out = [("id", f"{id_prop}:ID({label})")]
    for pname, pcfg in cfg.get("properties", {}).items():
        ptype = pcfg.get("type", "string") if isinstance(pcfg, dict) else pcfg
        if pname in df.columns:
            out.append((pname, f"{pname}:{ptype}"))
    return out


@dataclass
class Neo4jExport:
    out_dir: str
    node_dirs: dict[str, str] = field(default_factory=dict)
    rel_dirs: dict[str, str] = field(default_factory=dict)
    database_name: str = "neo4j"

    def _parts(self, d: str) -> list[str]:
        return sorted(
            os.path.join(d, n)
            for n in os.listdir(d)
            if n.endswith(".csv") and not n.startswith(("_", "."))
        )

    def import_command(self) -> str:
        """The reference's neo4j-admin command (pipeline/loaders.py:25-52),
        one ``--nodes``/``--relationships`` per part file."""
        node_files = [p for d in self.node_dirs.values() for p in self._parts(d)]
        rel_files = [p for d in self.rel_dirs.values() for p in self._parts(d)]
        if not node_files and not rel_files:
            raise ValueError("No CSV files provided for import")
        parts = ["neo4j-admin", "database", "import", "full"]
        parts += ["--database", self.database_name]
        for f_ in node_files:
            parts += ["--nodes", f_]
        for f_ in rel_files:
            parts += ["--relationships", f_]
        parts += [
            "--delimiter", ",",
            "--array-delimiter", ";",
            "--quote", '"',
            "--multiline-fields", "true",
        ]
        return " ".join(parts)


def export_neo4j_csvs(
    gb: GraphBuild,
    out_dir: str,
    node_configs: dict[str, Any] | None = None,
    rel_configs: dict[str, Any] | None = None,
    quote_all: bool = True,
    max_records_per_file: int = 10_000,
    database_name: str = "neo4j",
) -> Neo4jExport:
    """Write the built graph as Neo4j bulk-import CSVs.

    Scale posture: one distributed CSV write per label / relationship
    config — no driver-side materialization; the 10K-row file split is
    the writer's ``maxRecordsPerFile``, so a 10^9-row label becomes many
    part files in one pass, each import-command-addressable.
    """
    if node_configs is None or rel_configs is None:
        from ..config.curriculum_schema import NODES, RELATIONSHIPS

        node_configs = node_configs or NODES
        rel_configs = rel_configs or RELATIONSHIPS

    export = Neo4jExport(out_dir=out_dir, database_name=database_name)

    def _write(df: DataFrame, path: str) -> None:
        (
            df.write.mode("overwrite")
            .option("header", True)
            .option("quoteAll", quote_all)
            .option("escape", '"')
            .option("maxRecordsPerFile", max_records_per_file)
            .csv(path)
        )

    for label, df in gb.nodes.items():
        cfg = node_configs.get(label, {})
        cols = []
        for src, hdr in _node_headers(label, cfg, df):
            c = F.col(src)
            if dict(df.dtypes)[src].startswith("array"):
                c = F.to_json(c)  # list props JSON-encoded in the cell
            cols.append(c.alias(hdr))
        path = os.path.join(out_dir, "nodes", f"{label.lower()}_nodes.csv")
        _write(df.select(*cols), path)
        export.node_dirs[label] = path

    for key, cfg in rel_configs.items():
        sub = gb.resolved.filter(F.col("config_key") == key)
        cols = [
            F.col("subj").alias(f":START_ID({cfg['start_node_type']})"),
            F.col("obj").alias(f":END_ID({cfg['end_node_type']})"),
            F.col("pred").alias(":TYPE"),
        ]
        for pname, pcfg in cfg.get("properties", {}).items():
            ptype = pcfg.get("type", "string") if isinstance(pcfg, dict) else "string"
            cols.append(
                F.element_at(F.col("props"), pname).alias(f"{pname}:{ptype}")
            )
        path = os.path.join(
            out_dir, "relationships", f"{key.lower()}_relationships.csv"
        )
        _write(sub.select(*cols), path)
        export.rel_dirs[key] = path

    return export
