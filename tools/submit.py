"""Package the engine and launch it through ``spark-submit --py-files``.

Builds ``build/oak_kg_spark.zip`` (the package's source tree, no tests)
and execs

    spark-submit --master <master> --py-files build/oak_kg_spark.zip \
        tools/job_build_graph.py <job args...>

so the job's imports resolve from the shipped zip on every executor —
the exact deploy shape the north_rule names for multi-executor
clusters. In this sandbox ``--master local[N]`` stands in for a real
cluster; the two-parallelism scaling evidence (BASELINE.md) runs the
same submit at local[8] vs local[32].
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "oak_knowledge_graph_neo4j_auradb_spark"


def build_zip(out_path: str | None = None) -> str:
    """Zip the package source for --py-files (deterministic ordering)."""
    out_path = out_path or os.path.join(REPO, "build", "oak_kg_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(src_root)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out_path


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument(
        "--driver-memory", default=os.environ.get("SPARK_DRIVER_MEM", "4g")
    )
    args, job_args = ap.parse_known_args(argv)

    zip_path = build_zip()
    cmd = [
        "spark-submit",
        "--master",
        args.master,
        "--driver-memory",
        args.driver_memory,
        "--py-files",
        zip_path,
        os.path.join(REPO, "tools", "job_build_graph.py"),
        *job_args,
    ]
    print(" ".join(cmd), file=sys.stderr)
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
