"""spark-submit entry point for the KG-construction pipeline.

The north_rule's deploy path: the engine ships as a zip of the package
and runs on a multi-executor cluster via

    python tools/submit.py --output /path/out \
        [--input docs.parquet] [--config schema.json] [--master spark://...]

which expands to

    spark-submit --master <master> --py-files build/oak_kg_spark.zip \
        tools/job_build_graph.py --input ... --output ...

Master / executor count / memory are owned by the submit command (or
the cluster manager in YARN/K8s mode); the job only applies the
engine's SQL/Arrow tuning (`session.get_cluster_spark`). At N vs 4N
executors the identical job is what the scaling criterion measures.

Emits ONE JSON line of run metrics on stdout (stage rows/seconds,
quarantine summary, total) so a scheduler can scrape it.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="documents parquet path (doc_id, spans)")
    ap.add_argument(
        "--n-docs",
        type=int,
        default=2000,
        help="generate a deterministic synthetic corpus of this size "
        "when --input is not given",
    )
    ap.add_argument("--output", required=True, help="graph output directory")
    ap.add_argument(
        "--config",
        help="reference-dialect schema JSON; defaults to the built-in "
        "curriculum schema",
    )
    ap.add_argument(
        "--max-records-per-file", type=int, default=1_000_000
    )
    args = ap.parse_args(argv)

    from oak_knowledge_graph_neo4j_auradb_spark.plans.sinks import write_graph
    from oak_knowledge_graph_neo4j_auradb_spark.session import get_cluster_spark

    spark = get_cluster_spark()
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        import tempfile

        from oak_knowledge_graph_neo4j_auradb_spark.sources.docgen import (
            ensure_documents,
        )

        docs = spark.read.parquet(
            ensure_documents(tempfile.mkdtemp(), args.n_docs)
        )

    report = write_graph(
        spark,
        docs,
        args.output,
        max_records_per_file=args.max_records_per_file,
        config=args.config,
    )
    out = {
        "out_dir": report.out_dir,
        "stages_run": report.stages_run,
        "stages_skipped": report.stages_skipped,
        "metrics": report.metrics,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
