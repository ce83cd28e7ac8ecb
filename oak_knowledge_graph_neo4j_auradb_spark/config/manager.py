"""Config-as-program: the JSON dialect IS the pipeline definition.

The reference's headline feature is that one JSON file drives the whole
extract→clean→map→load run with no code changes (reference README.md:10;
``config_manager.py:22-132`` load/validate/env-substitute/legacy-convert;
production contract ``config/oak_curriculum_schema_v0.1.0-alpha.json``).
This module re-implements those semantics for the Spark engine:

* :class:`ConfigManager` — directory-scoped load/save/list/validate with
  the reference's error behavior (``ConfigurationError`` on missing
  file, bad JSON, missing required keys, bad join strategy, unset env
  vars).
* :func:`compile_config` — normalizes a validated config dict into the
  :class:`GraphConfig` structures the planner consumes
  (``plans/pipeline.py:build_graph``), so a user's modified JSON runs
  the engine directly: ``build_graph_from_config(spark, docs, path)``.
* ``${VAR}`` environment substitution (``config_manager.py:161-183``):
  a string value that IS exactly ``${VAR}`` is replaced by the env
  value; an unset variable raises. Applied recursively through dicts
  and lists before validation, so substituted values are validated.
* legacy-format conversion (``config_manager.py:80-131``): top-level
  ``node_mappings`` / ``relationship_mappings`` lists are converted to
  the ``schema_mapping`` dialect when ``schema_mapping`` is absent.

The embedded Python structures in ``curriculum_schema.py`` remain the
pinned production contract our tests assert against; the round-trip
test (tests/test_config_manager.py) proves JSON-dialect export →
:class:`ConfigManager` load → :func:`compile_config` reproduces them
exactly and builds the identical golden graph.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

__all__ = [
    "ConfigurationError",
    "ConfigManager",
    "GraphConfig",
    "compile_config",
    "load_graph_config",
    "validate_config_dict",
    "export_reference_dialect",
]


class ConfigurationError(Exception):
    """Raised for any config load/validation failure
    (reference ``config_manager.py:7-8``)."""


_REQUIRED_KEYS = ("hasura_endpoint", "materialized_views", "join_strategy")
_JOIN_TYPES = ("inner", "left", "right", "outer")
_STRATEGY_TYPES = ("single_source", "multi_source_join")
_PROP_TYPES = ("string", "int", "float", "boolean", "datetime", "list")
_FULL_ENV_RE = re.compile(r"^\$\{([^}]+)\}$")


def _substitute_env_vars(value: Any) -> Any:
    """Recursive ``${VAR}`` substitution (``config_manager.py:161-183``).

    Faithful to the reference: only a string that is ENTIRELY a
    ``${VAR}`` placeholder is substituted (embedded placeholders pass
    through untouched), and an unset variable is a hard error — a
    silently-missing endpoint must not reach the pipeline.
    """
    if isinstance(value, str):
        m = _FULL_ENV_RE.match(value)
        if m:
            env_value = os.getenv(m.group(1))
            if env_value is None:
                raise ConfigurationError(
                    f"Environment variable {m.group(1)} is not set"
                )
            return env_value
        return value
    if isinstance(value, dict):
        return {k: _substitute_env_vars(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute_env_vars(v) for v in value]
    return value


def _validate_join_strategy(
    join_strategy: Any, materialized_views: dict[str, Any]
) -> None:
    """``config_manager.py:185-236`` semantics."""
    if not isinstance(join_strategy, dict):
        raise ConfigurationError("join_strategy must be a dictionary")
    strategy_type = join_strategy.get("type")
    if strategy_type not in _STRATEGY_TYPES:
        raise ConfigurationError(
            "join_strategy.type must be 'single_source' or 'multi_source_join'"
        )
    primary_mv = join_strategy.get("primary_mv")
    if primary_mv and primary_mv not in materialized_views:
        raise ConfigurationError(
            f"join_strategy.primary_mv '{primary_mv}' not found in "
            f"materialized_views"
        )
    joins = join_strategy.get("joins", [])
    if strategy_type == "multi_source_join" and not joins:
        raise ConfigurationError(
            "multi_source_join strategy requires at least one join configuration"
        )
    for i, join_config in enumerate(joins):
        join_mv = join_config.get("mv")
        if join_mv not in materialized_views:
            raise ConfigurationError(
                f"Join {i}: mv '{join_mv}' not found in materialized_views"
            )
        join_type = join_config.get("join_type", "inner")
        if join_type not in _JOIN_TYPES:
            raise ConfigurationError(
                f"Join {i}: join_type must be 'inner', 'left', 'right', or 'outer'"
            )
        on_clause = join_config.get("on")
        if not on_clause or not isinstance(on_clause, dict):
            raise ConfigurationError(
                f"Join {i}: 'on' clause is required and must be a dict"
            )
        if "left_key" not in on_clause or "right_key" not in on_clause:
            raise ConfigurationError(
                f"Join {i}: 'on' clause must contain 'left_key' and 'right_key'"
            )


def _convert_legacy_config(config: dict[str, Any]) -> dict[str, Any]:
    """Old-format ``node_mappings``/``relationship_mappings`` lists →
    simplified ``schema_mapping`` (``config_manager.py:80-131``).

    In the legacy dialect a property value may be either a plain source
    field name or a dict carrying ``source_field``; dicts without a
    ``source_field`` are dropped, exactly as the reference does.
    """
    schema_mapping: dict[str, Any] = {"nodes": {}, "relationships": {}}
    for node_mapping in config.get("node_mappings", []):
        label = node_mapping.get("label")
        if not label:
            continue
        props: dict[str, Any] = {}
        for prop_name, prop_config in node_mapping.get("properties", {}).items():
            if isinstance(prop_config, dict):
                source_field = prop_config.get("source_field")
                if source_field:
                    props[prop_name] = source_field
            else:
                props[prop_name] = prop_config
        schema_mapping["nodes"][label] = {
            "id_field": node_mapping.get("id_field"),
            "properties": props,
        }
    for rel_mapping in config.get("relationship_mappings", []):
        rel_type = rel_mapping.get("type")
        if not rel_type:
            continue
        props = {}
        for prop_name, prop_config in rel_mapping.get("properties", {}).items():
            if isinstance(prop_config, dict):
                source_field = prop_config.get("source_field")
                if source_field:
                    props[prop_name] = source_field
            else:
                props[prop_name] = prop_config
        schema_mapping["relationships"][rel_type] = {
            "start_node_field": rel_mapping.get("start_node_id_field"),
            "end_node_field": rel_mapping.get("end_node_id_field"),
            "properties": props,
        }
    return schema_mapping


def _validate_config(config: dict[str, Any]) -> None:
    """``config_manager.py:45-78`` semantics, applied post-substitution."""
    for key in _REQUIRED_KEYS:
        if key not in config:
            raise ConfigurationError(f"Missing required configuration key: {key}")
    if not isinstance(config["materialized_views"], dict):
        raise ConfigurationError(
            "materialized_views must be a dict mapping view names to field lists"
        )
    _validate_join_strategy(config["join_strategy"], config["materialized_views"])
    if "schema_mapping" not in config:
        if "node_mappings" in config or "relationship_mappings" in config:
            config["schema_mapping"] = _convert_legacy_config(config)
        else:
            raise ConfigurationError(
                "Configuration must contain 'schema_mapping' or legacy "
                "'node_mappings'/'relationship_mappings'"
            )
    if not isinstance(config["schema_mapping"], dict):
        raise ConfigurationError("schema_mapping must be a dictionary")


class ConfigManager:
    """Directory-scoped config store (``config_manager.py:11-159``)."""

    def __init__(self, config_dir: str = "config"):
        self.config_dir = Path(config_dir)
        if not self.config_dir.exists():
            raise ConfigurationError(
                f"Configuration directory {self.config_dir} does not exist"
            )

    def load_config(self, config_file: str) -> dict[str, Any]:
        """Load → env-substitute → validate (+ legacy conversion)."""
        config_path = self.config_dir / config_file
        if not config_path.exists():
            raise ConfigurationError(
                f"Configuration file {config_path} does not exist"
            )
        try:
            with open(config_path, "r") as f:
                config_data = json.load(f)
        except json.JSONDecodeError as e:
            raise ConfigurationError(f"Invalid JSON in {config_path}: {e}")
        except Exception as e:
            raise ConfigurationError(f"Failed to read {config_path}: {e}")
        config_data = _substitute_env_vars(config_data)
        _validate_config(config_data)
        return config_data

    def save_config(self, config: dict[str, Any], config_file: str) -> None:
        config_path = self.config_dir / config_file
        try:
            with open(config_path, "w") as f:
                json.dump(config, f, indent=2)
        except Exception as e:
            raise ConfigurationError(
                f"Failed to save configuration to {config_path}: {e}"
            )

    def list_configs(self) -> list[str]:
        try:
            return [
                f.name for f in self.config_dir.iterdir() if f.suffix == ".json"
            ]
        except Exception as e:
            raise ConfigurationError(f"Failed to list configurations: {e}")

    def validate_config_file(self, config_file: str) -> tuple[bool, str | None]:
        try:
            self.load_config(config_file)
            return True, None
        except ConfigurationError as e:
            return False, str(e)


# --------------------------------------------------------------------------
# compile: validated dict → planner structures
# --------------------------------------------------------------------------


@dataclass
class GraphConfig:
    """The compiled pipeline definition ``build_graph`` consumes."""

    nodes: dict[str, dict[str, Any]]
    relationships: dict[str, dict[str, Any]]
    join_strategy: dict[str, Any]
    filters: dict[str, Any]
    materialized_views: dict[str, list[str]] = field(default_factory=dict)
    extras: dict[str, Any] = field(default_factory=dict)


def _norm_prop(label: str, name: str, spec: Any) -> dict[str, Any]:
    """Normalize one property spec: ``synthetic_value: ""`` means
    "not synthetic" in the JSON dialect (the production file pads every
    property with the empty marker) and is dropped; a non-empty value is
    kept. Unknown ``type`` is rejected at compile time rather than
    surfacing as a misbuilt Catalyst cast mid-job."""
    if not isinstance(spec, dict):
        raise ConfigurationError(
            f"{label}.{name}: property spec must be a dict, got {type(spec).__name__}"
        )
    out = dict(spec)
    dtype = out.get("type", "string")
    if dtype not in _PROP_TYPES:
        raise ConfigurationError(
            f"{label}.{name}: unknown property type '{dtype}' "
            f"(expected one of {', '.join(_PROP_TYPES)})"
        )
    sv = out.get("synthetic_value")
    if sv == "" or sv is None:
        out.pop("synthetic_value", None)
    return out


def compile_config(config: dict[str, Any]) -> GraphConfig:
    """Validated config dict → :class:`GraphConfig`.

    Accepts exactly the reference JSON dialect (nodes with
    ``id_field``/``properties``, relationships with
    ``relationship_type``/``start_node_type``/``start_csv_field``/
    ``end_node_type``/``end_csv_field``) and produces the structures
    ``curriculum_schema.NODES``/``RELATIONSHIPS`` hardcode — the
    round-trip is the identity on the production contract.
    """
    sm = config.get("schema_mapping")
    if not isinstance(sm, dict):
        raise ConfigurationError("schema_mapping must be a dictionary")
    raw_nodes = sm.get("nodes", {})
    raw_rels = sm.get("relationships", {})
    if not isinstance(raw_nodes, dict) or not isinstance(raw_rels, dict):
        raise ConfigurationError(
            "schema_mapping.nodes and schema_mapping.relationships must be dicts"
        )

    nodes: dict[str, dict[str, Any]] = {}
    for label, node_cfg in raw_nodes.items():
        if not isinstance(node_cfg, dict) or "id_field" not in node_cfg:
            raise ConfigurationError(f"node '{label}' must define id_field")
        id_field = _norm_prop(label, "id_field", node_cfg["id_field"])
        if "property_name" not in id_field:
            raise ConfigurationError(
                f"node '{label}': id_field.property_name is required"
            )
        if not id_field.get("hasura_col") and "synthetic_value" not in id_field:
            raise ConfigurationError(
                f"node '{label}': id_field needs a hasura_col or a "
                f"non-empty synthetic_value"
            )
        props = {
            p: _norm_prop(label, p, spec)
            for p, spec in node_cfg.get("properties", {}).items()
        }
        nodes[label] = {"id_field": id_field, "properties": props}

    rels: dict[str, dict[str, Any]] = {}
    for key, rel_cfg in raw_rels.items():
        if not isinstance(rel_cfg, dict):
            raise ConfigurationError(f"relationship '{key}' must be a dict")
        missing = [
            k
            for k in (
                "relationship_type",
                "start_node_type",
                "start_csv_field",
                "end_node_type",
                "end_csv_field",
            )
            if not rel_cfg.get(k)
        ]
        if missing:
            raise ConfigurationError(
                f"relationship '{key}' missing: {', '.join(missing)}"
            )
        for endpoint in ("start_node_type", "end_node_type"):
            if rel_cfg[endpoint] not in nodes:
                raise ConfigurationError(
                    f"relationship '{key}': {endpoint} "
                    f"'{rel_cfg[endpoint]}' is not a configured node label"
                )
        out = {
            k: rel_cfg[k]
            for k in (
                "relationship_type",
                "start_node_type",
                "start_csv_field",
                "end_node_type",
                "end_csv_field",
            )
        }
        out["properties"] = {
            p: _norm_prop(key, p, spec)
            for p, spec in rel_cfg.get("properties", {}).items()
        }
        rels[key] = out

    extras = {
        k: config[k]
        for k in (
            "hasura_endpoint",
            "export_from_hasura",
            "import_to_neo4j",
            "test_limit",
            "clear_database_before_import",
        )
        if k in config
    }
    return GraphConfig(
        nodes=nodes,
        relationships=rels,
        join_strategy=config.get("join_strategy", {}),
        filters=config.get("filters", {}) or {},
        materialized_views=config.get("materialized_views", {}),
        extras=extras,
    )


def load_graph_config(path: str) -> GraphConfig:
    """One-call path → :class:`GraphConfig` (file outside a managed
    config dir). This is the entry ``build_graph_from_config`` uses."""
    p = Path(path)
    mgr = ConfigManager(str(p.parent))
    return compile_config(mgr.load_config(p.name))


def validate_config_dict(config: dict[str, Any]) -> dict[str, Any]:
    """Apply the full load pipeline (env substitution → validation →
    legacy conversion) to an in-memory dict — same semantics as
    :meth:`ConfigManager.load_config` minus the file read."""
    config = _substitute_env_vars(config)
    _validate_config(config)
    return config


# --------------------------------------------------------------------------
# export: planner structures → reference JSON dialect
# --------------------------------------------------------------------------


def export_reference_dialect(
    nodes: dict[str, Any],
    relationships: dict[str, Any],
    join_strategy: dict[str, Any],
    filters: dict[str, Any],
    materialized_views: dict[str, list[str]] | None = None,
    hasura_endpoint: str = "http://localhost:8080/v1/graphql",
) -> dict[str, Any]:
    """Render planner structures as a reference-dialect config dict —
    the inverse of :func:`compile_config` (modulo the dialect's
    ``synthetic_value: ""`` padding, which compile strips). Used by the
    round-trip test and by ``tools/export_config.py`` so users can
    start from the engine's pinned contract and edit JSON from there.
    """
    mvs = materialized_views or {
        "primary": [],
        "supplementary": [],
    }
    return {
        "hasura_endpoint": hasura_endpoint,
        "export_from_hasura": True,
        "import_to_neo4j": True,
        "materialized_views": mvs,
        "join_strategy": join_strategy,
        "filters": filters,
        "schema_mapping": {
            "nodes": nodes,
            "relationships": relationships,
        },
    }
