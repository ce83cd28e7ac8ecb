"""Config-as-program: the JSON dialect drives the pipeline.

Mirrors the reference's test surface (`tests/test_config_manager.py`):
load/validate/env-substitute/legacy-convert error behavior, plus the
engine-specific guarantees — the exported reference-dialect JSON
round-trips to the embedded contract exactly, and a graph built FROM
the JSON file is identical to one built from the embedded structures.
"""

import json

import pytest

from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
    FILTERS,
    JOIN_STRATEGY,
    NODES,
    RELATIONSHIPS,
)
from oak_knowledge_graph_neo4j_auradb_spark.config.manager import (
    ConfigManager,
    ConfigurationError,
    compile_config,
    export_reference_dialect,
    load_graph_config,
    validate_config_dict,
)

# -- fixtures ---------------------------------------------------------------


def minimal_config(**overrides):
    cfg = {
        "hasura_endpoint": "http://localhost:8080/v1/graphql",
        "materialized_views": {"mv_a": ["f1", "f2"], "mv_b": ["f1", "g1"]},
        "join_strategy": {
            "type": "multi_source_join",
            "primary_mv": "mv_a",
            "joins": [
                {
                    "mv": "mv_b",
                    "join_type": "left",
                    "on": {"left_key": ["f1"], "right_key": ["f1"]},
                }
            ],
        },
        "filters": {},
        "schema_mapping": {
            "nodes": {
                "Thing": {
                    "id_field": {
                        "hasura_col": "f1",
                        "type": "string",
                        "property_name": "thingId",
                        "synthetic_value": "",
                    },
                    "properties": {
                        "score": {
                            "hasura_col": "f2",
                            "type": "int",
                            "synthetic_value": "",
                        }
                    },
                }
            },
            "relationships": {
                "thing_self": {
                    "relationship_type": "RELATES",
                    "start_node_type": "Thing",
                    "start_csv_field": "f1",
                    "end_node_type": "Thing",
                    "end_csv_field": "g1",
                    "properties": {},
                }
            },
        },
    }
    cfg.update(overrides)
    return cfg


@pytest.fixture
def cfg_dir(tmp_path):
    return tmp_path


def write_cfg(cfg_dir, cfg, name="test.json"):
    (cfg_dir / name).write_text(json.dumps(cfg))
    return name


# -- ConfigManager basics ---------------------------------------------------


def test_init_nonexistent_directory(tmp_path):
    with pytest.raises(ConfigurationError, match="does not exist"):
        ConfigManager(str(tmp_path / "nope"))


def test_load_valid_config(cfg_dir):
    name = write_cfg(cfg_dir, minimal_config())
    cfg = ConfigManager(str(cfg_dir)).load_config(name)
    assert cfg["hasura_endpoint"].startswith("http://")
    assert "schema_mapping" in cfg


def test_load_nonexistent_config(cfg_dir):
    with pytest.raises(ConfigurationError, match="does not exist"):
        ConfigManager(str(cfg_dir)).load_config("missing.json")


def test_load_invalid_json(cfg_dir):
    (cfg_dir / "bad.json").write_text("{not json")
    with pytest.raises(ConfigurationError, match="Invalid JSON"):
        ConfigManager(str(cfg_dir)).load_config("bad.json")


@pytest.mark.parametrize("missing", ["hasura_endpoint", "materialized_views",
                                     "join_strategy"])
def test_missing_required_key(cfg_dir, missing):
    cfg = minimal_config()
    del cfg[missing]
    name = write_cfg(cfg_dir, cfg)
    with pytest.raises(ConfigurationError, match=missing):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_missing_schema_mapping_and_legacy(cfg_dir):
    cfg = minimal_config()
    del cfg["schema_mapping"]
    name = write_cfg(cfg_dir, cfg)
    with pytest.raises(ConfigurationError, match="schema_mapping"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_validate_config_file_reports(cfg_dir):
    mgr = ConfigManager(str(cfg_dir))
    ok_name = write_cfg(cfg_dir, minimal_config(), "ok.json")
    bad = minimal_config()
    del bad["join_strategy"]
    bad_name = write_cfg(cfg_dir, bad, "bad.json")
    assert mgr.validate_config_file(ok_name) == (True, None)
    valid, err = mgr.validate_config_file(bad_name)
    assert not valid and "join_strategy" in err
    assert sorted(mgr.list_configs()) == ["bad.json", "ok.json"]


# -- env substitution -------------------------------------------------------


def test_env_substitution(cfg_dir, monkeypatch):
    monkeypatch.setenv("TEST_KG_ENDPOINT", "http://sub:1/graphql")
    cfg = minimal_config(hasura_endpoint="${TEST_KG_ENDPOINT}")
    name = write_cfg(cfg_dir, cfg)
    loaded = ConfigManager(str(cfg_dir)).load_config(name)
    assert loaded["hasura_endpoint"] == "http://sub:1/graphql"


def test_env_substitution_missing_raises(cfg_dir, monkeypatch):
    monkeypatch.delenv("TEST_KG_MISSING", raising=False)
    cfg = minimal_config(hasura_endpoint="${TEST_KG_MISSING}")
    name = write_cfg(cfg_dir, cfg)
    with pytest.raises(ConfigurationError, match="TEST_KG_MISSING"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_env_substitution_nested_and_partial(cfg_dir, monkeypatch):
    monkeypatch.setenv("TEST_KG_VAL", "resolved")
    cfg = minimal_config()
    # nested list/dict values substitute; embedded placeholders pass
    # through untouched (reference substitutes only full-string values)
    cfg["extra"] = {"a": ["${TEST_KG_VAL}"], "b": "prefix-${TEST_KG_VAL}"}
    name = write_cfg(cfg_dir, cfg)
    loaded = ConfigManager(str(cfg_dir)).load_config(name)
    assert loaded["extra"]["a"] == ["resolved"]
    assert loaded["extra"]["b"] == "prefix-${TEST_KG_VAL}"


# -- join-strategy validation ----------------------------------------------


def js(cfg_dir, join_strategy):
    return write_cfg(cfg_dir, minimal_config(join_strategy=join_strategy))


def test_bad_strategy_type(cfg_dir):
    name = js(cfg_dir, {"type": "star_join"})
    with pytest.raises(ConfigurationError, match="single_source"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_primary_mv_not_found(cfg_dir):
    name = js(cfg_dir, {"type": "single_source", "primary_mv": "ghost"})
    with pytest.raises(ConfigurationError, match="ghost"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_multi_source_requires_joins(cfg_dir):
    name = js(cfg_dir, {"type": "multi_source_join", "primary_mv": "mv_a"})
    with pytest.raises(ConfigurationError, match="at least one join"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_join_mv_not_found(cfg_dir):
    name = js(
        cfg_dir,
        {
            "type": "multi_source_join",
            "primary_mv": "mv_a",
            "joins": [{"mv": "ghost", "on": {"left_key": "a", "right_key": "a"}}],
        },
    )
    with pytest.raises(ConfigurationError, match="ghost"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_bad_join_type(cfg_dir):
    name = js(
        cfg_dir,
        {
            "type": "multi_source_join",
            "primary_mv": "mv_a",
            "joins": [
                {
                    "mv": "mv_b",
                    "join_type": "cross",
                    "on": {"left_key": "f1", "right_key": "f1"},
                }
            ],
        },
    )
    with pytest.raises(ConfigurationError, match="join_type"):
        ConfigManager(str(cfg_dir)).load_config(name)


def test_join_on_clause_required(cfg_dir):
    name = js(
        cfg_dir,
        {
            "type": "multi_source_join",
            "primary_mv": "mv_a",
            "joins": [{"mv": "mv_b", "join_type": "left", "on": {"left_key": "f1"}}],
        },
    )
    with pytest.raises(ConfigurationError, match="left_key"):
        ConfigManager(str(cfg_dir)).load_config(name)


# -- legacy conversion ------------------------------------------------------


def test_legacy_conversion(cfg_dir):
    cfg = minimal_config()
    del cfg["schema_mapping"]
    cfg["node_mappings"] = [
        {
            "label": "Thing",
            "id_field": "f1",
            "properties": {
                "plain": "f2",
                "dicty": {"source_field": "g1"},
                "dropped": {"no_source": True},
            },
        }
    ]
    cfg["relationship_mappings"] = [
        {
            "type": "RELATES",
            "start_node_id_field": "f1",
            "end_node_id_field": "g1",
            "properties": {"weight": "f2"},
        }
    ]
    name = write_cfg(cfg_dir, cfg)
    loaded = ConfigManager(str(cfg_dir)).load_config(name)
    sm = loaded["schema_mapping"]
    assert sm["nodes"]["Thing"]["id_field"] == "f1"
    assert sm["nodes"]["Thing"]["properties"] == {"plain": "f2", "dicty": "g1"}
    assert sm["relationships"]["RELATES"]["start_node_field"] == "f1"
    assert sm["relationships"]["RELATES"]["properties"] == {"weight": "f2"}


# -- compile_config ---------------------------------------------------------


def test_compile_strips_empty_synthetic(cfg_dir):
    gc = compile_config(validate_config_dict(minimal_config()))
    assert "synthetic_value" not in gc.nodes["Thing"]["id_field"]
    assert gc.nodes["Thing"]["properties"]["score"]["type"] == "int"
    assert gc.relationships["thing_self"]["relationship_type"] == "RELATES"


def test_compile_rejects_unknown_type():
    cfg = minimal_config()
    cfg["schema_mapping"]["nodes"]["Thing"]["properties"]["score"]["type"] = "decimal"
    with pytest.raises(ConfigurationError, match="decimal"):
        compile_config(validate_config_dict(cfg))


def test_compile_rejects_missing_id_field():
    cfg = minimal_config()
    del cfg["schema_mapping"]["nodes"]["Thing"]["id_field"]
    with pytest.raises(ConfigurationError, match="id_field"):
        compile_config(validate_config_dict(cfg))


def test_compile_rejects_unconfigured_endpoint():
    cfg = minimal_config()
    cfg["schema_mapping"]["relationships"]["thing_self"]["end_node_type"] = "Ghost"
    with pytest.raises(ConfigurationError, match="Ghost"):
        compile_config(validate_config_dict(cfg))


def test_compile_rejects_incomplete_relationship():
    cfg = minimal_config()
    del cfg["schema_mapping"]["relationships"]["thing_self"]["end_csv_field"]
    with pytest.raises(ConfigurationError, match="end_csv_field"):
        compile_config(validate_config_dict(cfg))


# -- round-trip: embedded contract ↔ JSON dialect ---------------------------


def test_export_load_compile_roundtrip(tmp_path):
    cfg = export_reference_dialect(NODES, RELATIONSHIPS, JOIN_STRATEGY, FILTERS)
    path = tmp_path / "exported.json"
    path.write_text(json.dumps(cfg, indent=2))
    gc = load_graph_config(str(path))
    assert gc.nodes == NODES
    assert gc.relationships == RELATIONSHIPS
    assert gc.join_strategy == JOIN_STRATEGY
    assert gc.filters == FILTERS


def test_graph_from_json_config_identical(spark, tmp_path):
    """A graph built FROM the JSON file equals one built from the
    embedded structures — config-as-program end to end."""
    import pyarrow.parquet as pq

    from oak_knowledge_graph_neo4j_auradb_spark.plans.pipeline import (
        build_graph,
        build_graph_from_config,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
        make_universe,
        universe_to_arrow,
    )

    cfg = export_reference_dialect(NODES, RELATIONSHIPS, JOIN_STRATEGY, FILTERS)
    path = tmp_path / "schema.json"
    path.write_text(json.dumps(cfg))

    docs_path = str(tmp_path / "documents.parquet")
    pq.write_table(universe_to_arrow(make_universe(150)), docs_path)
    docs = spark.read.parquet(docs_path)

    gb_py = build_graph(spark, docs, persist_wide=False)
    gb_js = build_graph_from_config(spark, docs, str(path), persist_wide=False)
    a = gb_py.resolved.select("subj", "pred", "obj")
    b = gb_js.resolved.select("subj", "pred", "obj")
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).limit(1).count() == 0
    gb_py.extras["dims"].unpersist()
    gb_js.extras["dims"].unpersist()
