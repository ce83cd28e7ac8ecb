"""Invariants for the HITS / k-means / neighborhood-feature operators
beyond the DuckDB value-hash oracle: normalization bounds, mass
bookkeeping, and monotone inertia."""

import pyspark.sql.functions as F

from oak_knowledge_graph_neo4j_auradb_spark.queries.graphops import (
    kg69_hits,
    kg70_neighbor_features,
    kg71_personalized_pagerank,
)
from oak_knowledge_graph_neo4j_auradb_spark.queries.kg import _wide
from oak_knowledge_graph_neo4j_auradb_spark.queries.similarity import (
    _KM_K,
    q84_kmeans,
)


def test_hits_normalized(spark, sf_dir):
    h = kg69_hits(spark, sf_dir).persist()
    row = h.agg(
        F.max("hub").alias("mh"),
        F.max("auth").alias("ma"),
        F.min("hub").alias("nh"),
        F.min("auth").alias("na"),
    ).collect()[0]
    # max-normalization pins the top score to exactly 1.0 on each side
    assert row["mh"] == 1.0 and row["ma"] == 1.0
    assert row["nh"] >= 0.0 and row["na"] >= 0.0
    # pure sources have auth 0, pure sinks have hub 0 — both exist here
    assert h.filter(F.col("auth") == 0.0).count() > 0
    assert h.filter(F.col("hub") == 0.0).count() > 0
    h.unpersist()


def test_kmeans_partition(spark, sf_dir):
    out = q84_kmeans(spark, sf_dir).collect()
    assert 1 <= len(out) <= _KM_K
    total = sum(r["n"] for r in out)
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert total == n_vecs
    assert all(r["inertia"] >= 0 for r in out)


def test_personalized_pagerank_localizes(spark, sf_dir):
    """Seed-restricted teleport: total mass still conserved, and every
    node NOT reachable from the keystage seeds holds exactly rank 0 —
    the property that distinguishes personalization from kg65's
    uniform teleport (where every node gets the floor)."""
    r = kg71_personalized_pagerank(spark, sf_dir).persist()
    total = r.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-4, total
    # seeds themselves always hold at least the (1-d)/|S| floor
    seeds = r.filter(F.col("id").startswith("ks"))
    assert seeds.count() > 0
    assert seeds.agg(F.min("rank")).collect()[0][0] > 0
    # subjects/phases are upstream of keystages (never reached from
    # them along directed edges) — rank exactly 0
    n_zero = r.filter(F.col("rank") == 0.0).count()
    assert n_zero > 0
    r.unpersist()


def test_neighbor_features_bookkeeping(spark, sf_dir):
    gb = _wide(spark, sf_dir)
    n_edges = gb.resolved.select("subj", "obj").distinct().count()
    f = kg70_neighbor_features(spark, sf_dir).persist()
    row = f.agg(
        F.sum("outdeg").alias("so"), F.sum("indeg").alias("si")
    ).collect()[0]
    # every distinct edge contributes one out-degree and one in-degree
    assert row["so"] == n_edges and row["si"] == n_edges
    # 2-hop counts only exist where some out-neighbor itself has edges
    bad = f.filter((F.col("outdeg") == 0) & (F.col("n_2hop") > 0)).count()
    assert bad == 0
    f.unpersist()


def test_largest_remainder_sums_to_budget(spark, sf_dir):
    """Hamilton apportionment's defining property: integer allocations
    sum EXACTLY to the budget (no drift from floor rounding)."""
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        _ALLOC_BUDGET,
        q175_largest_remainder_alloc,
    )

    rows = q175_largest_remainder_alloc(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == _ALLOC_BUDGET
    # every allocation within 1 unit of the exact proportional share
    tot = sum(r["cents"] for r in rows)
    for r in rows:
        exact = r["cents"] * _ALLOC_BUDGET / tot
        assert abs(r["alloc"] - exact) < 1.0


def test_wilson_bounds_bracket_estimate(spark, sf_dir):
    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q177_wilson_interval,
    )

    for r in q177_wilson_interval(spark, sf_dir).collect():
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0


def test_absorption_prob_crafted(spark, tmp_path):
    """Crafted chain: every 'signup' goes half to purchase, half to
    error (absorbing) — v(signup) must be exactly 0.5; 'view' always
    precedes signup, so v(view) = 0.5 after round 2. Pins the
    absorbing-state semantics (win=1, loss=0, transient=recurse)."""
    import datetime as dt

    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q194_absorption_prob,
    )

    rows, eid = [], 0
    t0 = dt.datetime(2024, 1, 1)
    for u in range(8):
        seq = ["view", "signup", "purchase" if u % 2 == 0 else "error"]
        for i, et in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=eid), u, et, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["state"]: r["p_win"]
        for r in q194_absorption_prob(spark, str(tmp_path)).collect()
    }
    assert got == {"view": 0.5, "signup": 0.5}


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    """Chunking invariants: chunk starts advance by the stride, full
    chunks are exactly the window width, and the kept chunks cover
    every token of every document (the short-tail drop rule may only
    discard positions already covered by the previous overlap)."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.pipelineops import (
        _CHUNK_STRIDE,
        _CHUNK_W,
        q191_chunk_overlap,
    )

    chunks = q191_chunk_overlap(spark, sf_dir)
    rows = chunks.collect()
    for r in rows:
        assert (r["start_tok"] - 1) % _CHUNK_STRIDE == 0
        assert r["n_tokens"] <= _CHUNK_W
    # coverage: per doc, max(start+len-1) must reach the token count
    # whenever the doc produced any chunk
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import tokens

    ntok = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
    )
    cov = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_tokens") - 1).alias("covered")
    )
    # left join from the document table: every tokenized doc must
    # appear in the chunk table (the first chunk is exempt from the
    # tail-drop rule, so ≤(W−stride)-token docs keep their one chunk)
    # and its chunks must reach its last token
    bad = (
        ntok.filter(F.col("n") > 0)
        .join(cov, "doc_id", "left")
        .filter(
            F.col("covered").isNull() | (F.col("covered") < F.col("n"))
        )
        .count()
    )
    assert bad == 0


def test_longest_run_decode(spark):
    """Shift-AND run decoding on handcrafted masks: 0b0111011 has runs
    of 2 and 3 (longest 3); a single bit is a run of 1; zero mask is 0;
    30 consecutive bits decode to exactly 30 (the unroll bound)."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        _longest_run,
    )

    df = spark.createDataFrame(
        [(0b0111011,), (0b1,), (0,), ((1 << 30) - 1,)], "mask long"
    )
    got = [
        r["run"]
        for r in df.select(_longest_run(F.col("mask")).alias("run"))
        .orderBy("mask")
        .collect()
    ]
    # ordered by mask value: 0, 1, 0b0111011=59, 2^30-1
    assert got == [0, 1, 3, 30]


def test_poisson_bootstrap_brackets_true_mean(spark, sf_dir):
    """q230's 95% CI must bracket the per-source sample mean (the
    Poisson bootstrap is centered on it), be properly ordered, and have
    width shrinking roughly as 1/sqrt(n) — checked loosely: the CI of
    every source is non-degenerate and contains the plain mean."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q230_poisson_bootstrap,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

    ci = {
        r["source"]: (r["ci_lo"], r["boot_mean"], r["ci_hi"])
        for r in q230_poisson_bootstrap(spark, sf_dir).collect()
    }
    true_means = {
        r["source"]: r["m"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.avg("n_chars").alias("m"))
        .collect()
    }
    assert set(ci) == set(true_means)
    for src, (lo, mid, hi) in ci.items():
        assert lo <= mid <= hi, (src, ci[src])
        assert lo < hi, f"degenerate CI for {src}"
        # the bootstrap distribution is centered on the sample mean;
        # with B=32 the sample mean must land inside the 95% band
        assert lo <= true_means[src] <= hi, (src, ci[src], true_means[src])


def test_fd_g3_bounds_and_key_fd(spark, sf_dir):
    """q235: g3 ∈ [0, 1); violations == 0 iff the FD holds exactly; a
    hand-verified candidate matches a pandas recomputation."""
    from collections import Counter, defaultdict

    from oak_knowledge_graph_neo4j_auradb_spark.queries.analytics import (
        q235_fd_violations,
    )
    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load

    got = {r["fd"]: r for r in q235_fd_violations(spark, sf_dir).collect()}
    rows = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    ).collect()
    cnt = Counter((r["l_partkey"], r["l_suppkey"]) for r in rows)
    per_a = defaultdict(list)
    for (a, b), c in cnt.items():
        per_a[a].append(c)
    n = len(rows)
    want_viol = n - sum(max(cs) for cs in per_a.values())
    r = got["l_partkey->l_suppkey"]
    assert r["violations"] == want_viol and r["n_rows"] == n
    for r in got.values():
        assert 0 <= r["g3"] < 1
        assert (r["violations"] == 0) == (r["g3"] == 0.0)


def test_join_size_estimate_ordering(spark, sf_dir):
    """q243: exact pairs equals the true self-join count; the uniform
    assumption can only underestimate (it minimizes sum-of-squares
    given the total), and keeping heavy hitters exactly can only
    tighten it: est_uniform <= est_hh_tail <= exact."""
    import pyspark.sql.functions as F

    from oak_knowledge_graph_neo4j_auradb_spark.queries.common import load
    from oak_knowledge_graph_neo4j_auradb_spark.queries.relational import (
        q243_join_size_estimate,
    )

    r = q243_join_size_estimate(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    true_pairs = (
        li.alias("a")
        .join(li.alias("b"), F.col("a.l_partkey") == F.col("b.l_partkey"))
        .count()
    )
    assert r["exact_pairs"] == true_pairs
    assert r["est_uniform"] <= r["est_hh_tail"] + 1e-6
    assert r["est_hh_tail"] <= r["exact_pairs"] + 1e-6
    assert abs(r["hh_tail_rel_err"]) <= abs(r["uniform_rel_err"]) + 1e-9
