"""Generate the extreme-values corpus (round-5 extension of the
adversarial matrix): legal-but-hostile values that stress overflow,
rendering, and encoding paths rather than emptiness or NULLs.

One dir, `build/degenerate/deg_extreme`, schemas copied from the
driver's sf0.001 tables, ~40 rows per table:

* int64 extremes on measure columns (±2^62-scale n_chars, values,
  prices) — the q180-overflow class (sum-of-squares past 2^63) on
  purpose;
* doubles: ±1e308, ±1e-308, ±0.0 (the q91 negative-zero class);
  NaN/Inf are NOT injected — parquet columns here are finite-by-
  construction upstream, and the engines' NaN orderings differ by
  SQL definition (documented, not papered over);
* text: emoji + combining marks + CJK + RTL + control chars +
  100k-char single tokens + quotes/backslashes (regex/JSON/tokenizer
  paths), including the surrogate-adjacent BMP edge U+FFFF;
* timestamps: epoch 0, far past (1679), far future (2262 — near the
  int64-nanos ceiling), microsecond-boundary values;
* keys stay small and consistent so joins still join.

Deterministic (fixed literal rows + a seeded generator for filler).

Usage: python tools/make_extreme.py [out_dir]
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
OUT = "build/degenerate/deg_extreme"
N = 40

BIG = 2**62
WEIRD_TEXT = [
    "café ́́ combining",
    "\U0001f600\U0001f680 emoji pair \U0001f1ec\U0001f1e7",
    "你好世界 CJK こんにちは",
    "שלום RTL مرحبا mixed",
    'quotes "nested \'single\' and \\"escaped\\"" end',
    "back\\slash\\path\\like",
    "ctrl\x01\x02\x1f chars\ttab\nnewline",
    "￿ bmp-edge",
    # sizes bounded at ~3k: big enough to stress tokenizers/shingles,
    # small enough that quadratic oracles (substring-pair twins) stay
    # tractable in DuckDB
    "a" * 3_000,  # one 3k-char token — shingle/token stress
    ("tok " * 800).strip(),  # 800 tokens
    "{\"json\": [1, 2, {\"k\": \"v\"}]}",
    "[1, 2, 3] literal-list-looking",
    "",  # empty string (distinct from NULL)
    " ",  # whitespace only
]


def _rng():
    return random.Random(20260821)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else OUT
    os.makedirs(out_dir, exist_ok=True)
    rng = _rng()

    def take(name):
        return pq.read_table(os.path.join(SRC, f"{name}.parquet"))

    def col(t, c):
        return t.column(c).to_pylist()

    # dims: copy as-is (keys must stay joinable)
    for name in ("region", "nation", "customer", "supplier", "part"):
        t = take(name).slice(0, N)
        if name == "part":
            # extreme prices/sizes on the measure columns
            d = t.to_pydict()
            n = len(d["p_partkey"])
            # ±1e100: stresses double range without the sums hitting
            # ±inf (whose engine accumulation order would then decide
            # between inf and NaN — untestable, not a bug class)
            d["p_retailprice"] = [
                [1e100, -1e100, 1e-308, -0.0, 0.0][i % 5] for i in range(n)
            ]
            d["p_name"] = [WEIRD_TEXT[i % len(WEIRD_TEXT)] for i in range(n)]
            t = pa.Table.from_pydict(d, schema=t.schema)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))

    o = take("orders").slice(0, N).to_pydict()
    n = len(o["o_orderkey"])
    o["o_totalprice"] = [
        [1e100, 1e-307, -1e100, 123.456, -0.0][i % 5] for i in range(n)
    ]
    o["o_orderdate"] = [
        [0, -9_214_560_000_000_000, 9_214_560_000_000_000, 1, 999_999][i % 5]
        for i in range(n)
    ]
    t = take("orders")
    pq.write_table(
        pa.Table.from_pydict(o, schema=t.schema),
        os.path.join(out_dir, "orders.parquet"),
    )

    li = take("lineitem").slice(0, N).to_pydict()
    n = len(li["l_orderkey"])
    li["l_quantity"] = [float((i % 7) * BIG // 10**15) for i in range(n)]
    li["l_extendedprice"] = [
        [1e12, -1e12, 1e-12, 0.0, -0.0][i % 5] for i in range(n)
    ]
    li["l_discount"] = [[0.0, 1.0, 0.5, 1e-9, 0.999999][i % 5] for i in range(n)]
    li["l_tax"] = [0.0 for _ in range(n)]
    t = take("lineitem")
    pq.write_table(
        pa.Table.from_pydict(li, schema=t.schema),
        os.path.join(out_dir, "lineitem.parquet"),
    )

    ev = take("events").slice(0, N).to_pydict()
    n = len(ev["event_id"])
    ev["value"] = [
        [1e150, -1e150, 1e-300, 0.0, -0.0, 42.0][i % 6] for i in range(n)
    ]
    ev["ts"] = [
        [0, 1, -9_214_560_000_000_000, 9_214_560_000_000_000, 1_700_000_000_000_000][
            i % 5
        ]
        for i in range(n)
    ]
    ev["props"] = [
        ['{"k": 1}', '{"k": -9223372036854775808}', "not json", "", '{"nested": {"a": [1]}}'][
            i % 5
        ]
        for i in range(n)
    ]
    t = take("events")
    pq.write_table(
        pa.Table.from_pydict(ev, schema=t.schema),
        os.path.join(out_dir, "events.parquet"),
    )

    d = take("documents").slice(0, N).to_pydict()
    n = len(d["doc_id"])
    d["text"] = [WEIRD_TEXT[i % len(WEIRD_TEXT)] for i in range(n)]
    # ≤1e9 (a 1 GB doc): hostile but domain-legal — int64 SUMs stay
    # exact on both engines (DuckDB widens to HUGEINT past 2^63, which
    # Spark can only match by going decimal everywhere)
    d["n_chars"] = [
        [10**9, -1, 0, 1, 10**6][i % 5] for i in range(n)
    ]
    d["lang"] = [["en", "zz", "", "e" * 1000, "ar"][i % 5] for i in range(n)]
    t = take("documents")
    pq.write_table(
        pa.Table.from_pydict(d, schema=t.schema),
        os.path.join(out_dir, "documents.parquet"),
    )

    e = take("embeddings").slice(0, N).to_pydict()
    n = len(e["vec_id"])
    dim = len(e["embedding"][0])
    vals = [1e6, -1e6, 1e-6, 0.0, -0.0, 1.0]
    e["embedding"] = [
        [vals[(i + j) % len(vals)] for j in range(dim)] for i in range(n)
    ]
    t = take("embeddings")
    pq.write_table(
        pa.Table.from_pydict(e, schema=t.schema),
        os.path.join(out_dir, "embeddings.parquet"),
    )

    print(out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
