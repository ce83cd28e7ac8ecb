"""docs/iceberg_parity.md stays true to the code: every public
SnapshotTable operation appears in the mapping table, every engine-API
symbol the table names exists, and the documented NULL-preserving
MERGE clause matches what merge() actually does (VERDICT r2 item 6 —
the production-adoption contract is auditable, not aspirational)."""

import inspect
import os
import re

DOC = os.path.join(os.path.dirname(__file__), "..", "docs", "iceberg_parity.md")


def _doc_text() -> str:
    with open(DOC) as f:
        return f.read()


def test_every_public_operation_documented():
    from oak_knowledge_graph_neo4j_auradb_spark.plans.snapshots import (
        SnapshotTable,
    )

    doc = _doc_text()
    public = {
        name
        for name, m in inspect.getmembers(SnapshotTable, inspect.isfunction)
        if not name.startswith("_")
    }
    assert public, "SnapshotTable lost its public surface?"
    missing = {n for n in public if f".{n}(" not in doc and f"`.{n}" not in doc}
    assert not missing, f"undocumented SnapshotTable operations: {missing}"


def test_documented_api_exists():
    """Engine-API cells in the mapping table only name real symbols."""
    from oak_knowledge_graph_neo4j_auradb_spark.plans import sinks, snapshots

    doc = _doc_text()
    # methods referenced as `.name(` in the left column
    for name in set(re.findall(r"`\.([a-z_]+)\(", doc)):
        assert hasattr(snapshots.SnapshotTable, name), name
    assert callable(sinks.merge_into)
    assert issubclass(snapshots.CommitConflict, Exception)
    # the documented keyword surface
    assert "as_of" in inspect.signature(snapshots.SnapshotTable.read).parameters
    assert (
        "key_values"
        in inspect.signature(snapshots.SnapshotTable.read).parameters
    )
    assert (
        "keep_last"
        in inspect.signature(snapshots.SnapshotTable.expire).parameters
    )


def test_documented_merge_semantics_match_code():
    """The doc promises coalesce(update, existing) COW merge — the
    implementation must actually be built on that expression."""
    from oak_knowledge_graph_neo4j_auradb_spark.plans import sinks, snapshots

    doc = _doc_text()
    assert "coalesce(u.c, t.c)" in doc
    for src in (
        inspect.getsource(snapshots.SnapshotTable.merge),
        inspect.getsource(sinks.merge_into),
    ):
        assert "coalesce" in src and "full_outer" in src
