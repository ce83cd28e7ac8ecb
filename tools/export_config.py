"""Emit the engine's pinned curriculum contract as a reference-dialect
JSON config file.

The embedded Python structures (`config/curriculum_schema.py`) are the
production contract; this tool renders them in the JSON dialect the
reference's ConfigManager reads (`config_manager.py:22-77`), giving
users an editable starting point:

    python tools/export_config.py out/my_schema.json
    # edit, then:
    #   build_graph_from_config(spark, docs, "out/my_schema.json")

The round-trip (export → load → compile) is asserted identity in
tests/test_config_manager.py.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from oak_knowledge_graph_neo4j_auradb_spark.config.curriculum_schema import (
    FILTERS,
    JOIN_STRATEGY,
    NODES,
    PRIMARY_COLUMNS,
    RELATIONSHIPS,
    SUPPLEMENTARY_COLUMNS,
)
from oak_knowledge_graph_neo4j_auradb_spark.config.manager import (
    export_reference_dialect,
)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "curriculum_schema.json"
    cfg = export_reference_dialect(
        NODES,
        RELATIONSHIPS,
        JOIN_STRATEGY,
        FILTERS,
        materialized_views={
            "primary": list(PRIMARY_COLUMNS),
            "supplementary": list(SUPPLEMENTARY_COLUMNS),
        },
    )
    with open(out, "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
