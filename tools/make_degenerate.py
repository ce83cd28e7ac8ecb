"""Generate adversarial/degenerate corpora for the robustness sweep
(round-4 VERDICT ask #4): the div-by-zero / first-row / empty-reduce
crash classes that only surface on pathological inputs.

Three dirs under build/degenerate/, each carrying all ten driver tables
with schemas copied from /root/testdata/sf0.001 (the source of truth):

  deg_empty  — every table zero rows. Empty scans, empty aggregates,
               empty windows, ln/percentile over nothing.
  deg_one    — exactly one row per table (the first sf0.001 row).
               Single-partition windows, stddev of one sample, LSH over
               one document, self-joins with no second row.
  deg_nulls  — 50 rows per table with every non-key column nulled.
               All-null optional columns: casts, tokenizers, regexes and
               aggregates over pure-null input.

Key columns (kept non-null in deg_nulls) are the join identities the
engine's semantics genuinely require — nulling a primary key is not an
adversarial input but a different table.

Usage: python tools/make_degenerate.py [out_root]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: columns that stay populated in deg_nulls — join/identity keys only
KEY_COLS = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def _null_optionals(t: pa.Table, keep: set[str]) -> pa.Table:
    cols = []
    for field in t.schema:
        if field.name in keep:
            cols.append(t.column(field.name))
        else:
            cols.append(pa.nulls(t.num_rows, type=field.type))
    return pa.Table.from_arrays(cols, schema=t.schema)


def main() -> int:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "build/degenerate"
    for name in TABLES:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        variants = {
            "deg_empty": t.schema.empty_table(),
            "deg_one": t.slice(0, 1),
            "deg_nulls": _null_optionals(t.slice(0, 50), KEY_COLS[name]),
        }
        for dname, vt in variants.items():
            d = os.path.join(out_root, dname)
            os.makedirs(d, exist_ok=True)
            pq.write_table(vt, os.path.join(d, f"{name}.parquet"))
    for dname in ("deg_empty", "deg_one", "deg_nulls"):
        print(os.path.join(out_root, dname))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
