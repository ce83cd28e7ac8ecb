"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and an order-insensitive value
comparison (doubles to 6 places). Usage:

    python tools/check_entry.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_cell(r[i]) for i in order))
    return sorted(out)


def canon_cell_strict(v):
    """Type-preserving canon — mimics the driver's value hash, which
    fetches both sides as pandas. A DuckDB HUGEINT aggregate surfaces as
    float64 there ('3.0') while Spark's long is '3', so an uncast SUM
    fails strict even though the tolerant compare passes."""
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "b:" + str(bool(v)).lower()
    if isinstance(v, (float, np.floating)):
        return "f:" + repr(float(v))
    if isinstance(v, (int, np.integer)):
        return "i:" + str(int(v))
    if isinstance(v, (list, tuple)) or (
        type(v).__name__ == "ndarray"
    ):
        return "[" + ",".join(canon_cell_strict(x) for x in v) + "]"
    return "s:" + str(v)


def canon_pdf_strict(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        tuple(canon_cell_strict(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    manifest_path = None
    if "--manifest" in argv:
        i = argv.index("--manifest")
        manifest_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    manifest: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from oak_knowledge_graph_neo4j_auradb_spark.session import get_spark

    spark = get_spark("check-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # strict mode compares via pandas (the driver's value-hash
            # path); fetch ONCE and derive the row count from it — a
            # separate collect() would re-execute the whole plan and
            # double the sweep's wall time.
            spdf = sdf.toPandas() if strict else None
            if strict:
                srows = list(spdf.itertuples(index=False, name=None))
            else:
                srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            manifest[name] = {
                "status": "fail",
                "err": f"spark: {type(e).__name__}: {str(e)[:200]}",
            }
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            manifest[name] = {"status": "rows_only", "rows": len(srows)}
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            manifest[name] = {"status": "fail", "err": f"duckdb: {str(e)[:200]}"}
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems and not strict:
            a = canon_rows(scols, srows)
            b = canon_rows(dcols, drows)
            if a != b:
                diff_a = [r for r in a if r not in set(b)][:3]
                diff_b = [r for r in b if r not in set(a)][:3]
                problems.append(f"values only-spark={diff_a} only-duck={diff_b}")
        if not problems and strict:
            # strict implies the tolerant compare: identical typed canon
            # forms also agree at 6-decimal tolerance
            a = canon_pdf_strict(spdf)
            b = canon_pdf_strict(con.sql(oracles[name]).df())
            if a != b:
                diff_a = [r for r in a if r not in set(b)][:2]
                diff_b = [r for r in b if r not in set(a)][:2]
                problems.append(
                    f"STRICT only-spark={diff_a} only-duck={diff_b}"
                )
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            manifest[name] = {"status": "fail", "err": " | ".join(problems)[:300]}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            manifest[name] = {
                "status": "pass",
                "rows": len(srows),
                "strict": strict,
                "sec": round(time.time() - t0, 2),
            }
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    if manifest_path:
        import datetime
        import json

        counts: dict[str, int] = {}
        for m in manifest.values():
            counts[m["status"]] = counts.get(m["status"], 0) + 1
        with open(manifest_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "strict": strict,
                    "generated_at": datetime.datetime.now(
                        datetime.timezone.utc
                    ).isoformat(timespec="seconds"),
                    "totals": counts,
                    "queries": manifest,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"manifest → {manifest_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
