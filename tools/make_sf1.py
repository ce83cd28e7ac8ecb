"""Generate the sf1 scale rung (round-4 VERDICT ask #5): ~6M-row
lineitem / 400k documents — 10× sf0.1 — deterministically derived from
the driver's sf0.1 tables by key-shifted replication.

Each 10× step to date has exposed a real bug (q180's int64 overflow at
sf0.1, sorted_rank's resampled range boundaries at 50k keys), so the
rung exists to be SWEPT, not just benchmarked.

Construction: fact tables are unioned as 10 copies with every key
column shifted by copy_idx × stride (stride = a round power of ten
above the max key, so copies never collide and FK joins stay exactly
consistent within a copy). Dimension tables (region, nation) keep one
copy. Document text gets a per-copy suffix token so the dedup families
see 10 near-copies per original rather than byte-identical ones;
embeddings are shifted by copy on vec_id only (exact duplicate vectors
across copies — a legitimate ANN stress shape).

Deterministic: pure column arithmetic on the driver's seed=42 tables.

Usage: python tools/make_sf1.py [out_dir]   (default build/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
N_COPIES = 10

#: key-shift strides — round powers of ten above each table's max key
#: at sf0.1 (orderkey < 600k, custkey < 15k, partkey < 20k, suppkey <
#: 1k, event/user ids < 1M/100k, doc/vec ids < 40k/50k)
STRIDES = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

#: per-table (column → stride key) shift map; other columns copy as-is
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

DIM_TABLES = ("region", "nation")


def main() -> int:
    from pyspark.sql import functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.session import get_spark

    out_root = sys.argv[1] if len(sys.argv) > 1 else "build/sf1"
    spark = get_spark("make-sf1")
    for name in DIM_TABLES:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_root, f"{name}.parquet")
        )
        print(f"{name}: dim copied")
    for name, shift in SHIFTS.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(N_COPIES):
            c = base
            for col, skey in shift.items():
                # every shifted key column is int64 in the driver schema
                c = c.withColumn(
                    col, (F.col(col) + i * STRIDES[skey]).cast("long")
                )
            if name == "documents" and i > 0:
                # near-copy, not byte-copy: the dedup families should
                # see 10 high-Jaccard variants per original
                c = c.withColumn(
                    "text", F.concat_ws(" ", "text", F.lit(f"copytag{i}"))
                ).withColumn(
                    "n_chars",
                    F.col("n_chars") + F.lit(len(f" copytag{i}")),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # file layout: ~128 MB targets via a modest repartition; the
        # fact tables land as multiple files so scans parallelize
        n_files = 8 if name in ("lineitem", "events", "documents") else 4
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_root, f"{name}.parquet")
        )
        print(f"{name}: x{N_COPIES} written")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
