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


def _persistent_ids(spark) -> set:
    return {
        k for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def _gc_settle(spark, baseline: set = frozenset(), rounds: int = 12, wait: float = 1.5) -> set:
    """Drive Python + JVM GC until the persistent-RDD set stabilizes.

    ``localCheckpoint`` blocks (iterative lineage cuts throughout
    graphops/components) are freed by Spark's ContextCleaner only after
    the referencing JVM objects are collected — a few GC cycles with a
    short settle wait drains them. What remains after the set goes
    stable is genuinely stuck storage (the round-4 sorted_rank class).
    """
    import gc

    jvm = spark.sparkContext._jvm
    prev = None
    stable = 0
    for _ in range(rounds):
        # Two JVM GCs per cycle: the first collects objects whose py4j
        # detach just landed, the second collects what the first made
        # unreachable (Dataset → plan → checkpointed RDD chains) so the
        # ContextCleaner's weak references enqueue within one cycle.
        gc.collect()
        jvm.System.gc()
        time.sleep(0.5)
        jvm.System.gc()
        time.sleep(wait)
        cur = _persistent_ids(spark)
        import os as _os

        if _os.environ.get("CHECK_ENTRY_SETTLE_DEBUG"):
            print(f"  settle: {sorted(cur - baseline)}")
        if not cur - baseline:
            return cur
        # A reference chain N weak-levels deep needs ~N GC passes before
        # the ContextCleaner can unpersist the last block — stay patient
        # while the set is small but nonzero (observed: q225's final
        # block clears on the 3rd cycle some runs, the 5th on others).
        stable = stable + 1 if cur == prev else 0
        if stable >= 5:
            break
        prev = cur
    return _persistent_ids(spark)


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

    # Pin the kg-oracle corpus size to this sweep's sf_dir BEFORE the
    # query modules import (kg.py reads SPARK_GRAFT_ORACLE_NDOCS once at
    # import). Previously an exported-but-stale env var, or an sf0.1
    # sweep without it, silently desynced every kg oracle from the Spark
    # side and surfaced as baffling values-mismatches (round-4 ADVICE).
    import os

    _sf_docs_by_sf = {
        "sf0.001": 400,
        "sf0.01": 4000,
        "sf0.1": 40000,
        "sf1": 400000,
        "deg_empty": 0,
        "deg_one": 1,
        "deg_nulls": 2,
        "deg_extreme": 3,
    }
    _sf_docs = _sf_docs_by_sf.get(os.path.basename(os.path.normpath(sf_dir)))
    if _sf_docs is not None:
        prev = os.environ.get("SPARK_GRAFT_ORACLE_NDOCS")
        if prev is not None and int(prev) != _sf_docs:
            print(
                f"note: overriding SPARK_GRAFT_ORACLE_NDOCS={prev} → "
                f"{_sf_docs} to match {sf_dir}"
            )
        os.environ["SPARK_GRAFT_ORACLE_NDOCS"] = str(_sf_docs)

    import __spark_entry__ as entry_mod
    from oak_knowledge_graph_neo4j_auradb_spark.queries import kg as _kg
    from oak_knowledge_graph_neo4j_auradb_spark.session import get_spark

    assert _kg.N_DOCS_BY_SF == _sf_docs_by_sf, (
        "check_entry's sf→ndocs table diverged from kg.N_DOCS_BY_SF — "
        "update both together"
    )
    if _sf_docs is not None:
        assert _kg.ORACLE_SF_NDOCS == _sf_docs

    spark = get_spark("check-entry")
    con = duckdb.connect()
    for t in TABLES:
        # driver tables are single files; Spark-written rungs (sf1)
        # are directories of part files — glob those for DuckDB
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    # Persist-leak audit (round-4 VERDICT ask #3): record which
    # persistent-RDD ids each query introduced; after the sweep,
    # release_caches() + GC-settle and attribute any residue back to
    # the query that created it ("leaked" per manifest entry). This
    # costs one py4j call per query instead of a full cache drain +
    # rebuild per query, so the memoized kg builds keep their value.
    leak_baseline = _persistent_ids(spark)
    leak_known = set(leak_baseline)
    persist_ids: dict[str, set] = {}
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
            cur = _persistent_ids(spark)
            persist_ids[name] = cur - leak_known
            leak_known |= cur
            continue
        cur = _persistent_ids(spark)
        persist_ids[name] = cur - leak_known
        leak_known |= cur
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
    # End-of-sweep leak attribution: drain the query-surface caches,
    # let GC settle (flushes ContextCleaner-managed localCheckpoint
    # blocks), and charge any residual persistent storage back to the
    # query whose run introduced it.
    sdf = spdf = srows = None  # noqa: F841 — drop last iteration's refs
    from oak_knowledge_graph_neo4j_auradb_spark import queries as _qmod

    _qmod.release_caches()
    residual = _gc_settle(spark, leak_baseline) - leak_baseline
    if residual:
        # Last-resort discriminator before declaring a leak: a block can
        # be pinned by an execution-scoped JVM reference (a pooled
        # broadcast/AQE thread's threadlocal to the LAST executed plan)
        # that the next execution overwrites — bounded last-plan
        # retention, not a leak. Run one throwaway broadcast-join job to
        # overwrite those slots, then settle again. True leaks (a
        # module-level strong reference — the round-4 sorted_rank class)
        # survive this flush.
        print(
            f"leak audit: {len(residual)} block(s) after settle — "
            "flushing execution-scoped JVM references and re-settling"
        )
        from pyspark.sql import functions as _F

        _big = spark.range(100000).select(
            "id", (_F.col("id") % 100).alias("k")
        )
        _small = spark.range(100).select(
            _F.col("id").alias("k"), _F.lit("x").alias("v")
        )
        _big.join(_F.broadcast(_small), "k").groupBy("v").count().collect()
        _big = _small = None
        residual = _gc_settle(spark, leak_baseline, rounds=5) - leak_baseline
    attributed = set()
    for name, m in manifest.items():
        owned = residual & persist_ids.get(name, set())
        m["leaked"] = len(owned)
        attributed |= owned
    leak_unattr = len(residual - attributed)
    leak_total = len(residual)
    print(
        f"leak audit: residual={leak_total} "
        f"unattributed={leak_unattr}"
        + ("" if leak_total == 0 else "  ** STORAGE LEAK **")
    )
    if residual:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in sorted(residual):
            jr = jmap.get(rid)
            if jr is not None:
                r = jr.rdd()
                print(
                    f"  leaked rdd {rid}: "
                    f"{r.getStorageLevel().description()} | "
                    f"{str(r.getCreationSite())[:120]}"
                )

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
                    "leaked_total": leak_total,
                    "leaked_unattributed": leak_unattr,
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
