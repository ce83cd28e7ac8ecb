"""Stage K — entity canonicalization via connected components over a
similarity-edge DataFrame (BASELINE.json north_rule).

The reference has no equivalent operator (its entity space is small
enough that exact-slug identity suffices, schema_mapper.py:86); at
10^12-doc scale near-duplicate entities (slug variants, re-issued
unitvariants — cf. the ``-<digits>`` suffix family the reference
normalizes away at join time, hasura_extractor.py:186-208) need a
transitive closure: canonical id = min entity id of the connected
component in the similarity graph.

Algorithm: iterative min-label propagation by hash join —

    labels(n, comp)  ←  each node starts as its own component
    repeat:
        msgs  = edges ⨝ labels            (neighbor's current label)
        labels' = min(labels ∪ msgs) per node
    until no label changed

Scale design (each item visible in the plan):
* **Shuffle structure**: every iteration is one join (edges ⨝ labels on
  node id) + one aggregate (min per node). Both partial-aggregate
  map-side, so a hot node's million edges collapse to one row per input
  partition before the exchange — the classic label-propagation skew
  killer ("lesson"/"keystage"-scale hubs, north_rule) is handled by
  combine + AQE skew-join splitting (enabled in session.py). For
  adversarial hubs beyond AQE's split threshold, ``salt`` adds an
  explicit two-phase aggregate: msgs are first min-combined per
  (node, salt_bucket), then per node.
* **Lineage control**: each iteration ``localCheckpoint``s the label
  DataFrame — without it the plan doubles per round and the job dies on
  plan-size long before data-size (SURVEY.md §7.4 risk 4).
* **Convergence**: counted via one aggregate on the joined frame —
  iteration stops when no node improved, bounded by ``max_iter``
  (graph diameter; min-label propagation needs O(diameter) rounds).

For massive graphs an alternating large-star/small-star scheme
(Kiveris et al., "Connected Components in MapReduce and Beyond") halves
round count; min-propagation is kept here for its 1-join/round shape and
because curriculum alias clusters are shallow (diameter ≤ 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    salt: int = 0,
) -> DataFrame:
    """(id, comp) — comp is the min node id of the component.

    ``edges`` is an undirected similarity-edge list; self-loops and
    duplicates are tolerated. ``salt`` > 0 adds an explicit two-phase
    min-combine for graphs whose hub degree defeats AQE's skew split.
    """
    # symmetrize once; (n, m) means "m is a candidate label for n"
    fwd = edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
    rev = edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    adj = fwd.unionByName(rev).filter(F.col("n") != F.col("m")).distinct()
    adj = adj.localCheckpoint(eager=False)

    labels = (
        adj.select("n")
        .distinct()
        .select(F.col("n"), F.col("n").alias("comp"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iter):
        # neighbor labels: for edge (n, m), m's current comp is a
        # candidate for n
        msgs = adj.join(
            labels.withColumnRenamed("n", "m"), on="m", how="inner"
        ).select("n", "comp")
        if salt > 0:
            msgs = (
                msgs.withColumn(
                    "_b", F.pmod(F.hash(F.col("comp")), F.lit(salt))
                )
                .groupBy("n", "_b")
                .agg(F.min("comp").alias("comp"))
                .select("n", "comp")
            )
        cand = msgs.unionByName(labels).groupBy("n").agg(
            F.min("comp").alias("comp")
        )
        cand = cand.localCheckpoint(eager=True)

        changed = (
            cand.join(
                labels.withColumnRenamed("comp", "old"), on="n", how="inner"
            )
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = cand
        if changed == 0:
            break
    return labels.select(F.col("n").alias("id"), F.col("comp").alias("canonical_id"))


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
    max_fixpoint_iter: int = 200,
) -> DataFrame:
    """(id, scc_id) over a DIRECTED edge list — scc_id is the min node
    id of the strongly connected component.

    FW-BW-Trim coloring (Slota, Rajamanickam & Madduri, "BFS and
    Coloring-Based Parallel Algorithms for Strongly Connected
    Components", IPDPS 2014), expressed as DataFrame joins:

    each outer round
      1. **Trim** to fixpoint: a node with no in-edge or no out-edge in
         the remaining subgraph is its own SCC (it can sit on no cycle).
         Trimming alone dissolves any DAG region, so outer rounds pay
         only for genuinely nested cycle structure.
      2. **Color** forward to fixpoint: color(v) = max id over
         ancestors(v) ∪ {v}, propagated along out-edges (one join + one
         max-aggregate per iteration — the same map-side-combine shape
         as ``connected_components``, so hub skew collapses before the
         exchange and AQE splits what remains).
      3. **Backward containment**: within each color class c the node
         with id == c is the class root (its max ancestor is itself);
         SCC(c) = nodes of class c that REACH c, found by backward BFS
         along in-edges restricted to the class. Every nonempty class
         settles one SCC per round, so distinct classes make parallel
         progress.
      4. Settled nodes and their edges leave the remaining subgraph.

    Scale notes: every step is a key-partitioned join/aggregate (no
    global sort, no driver-side adjacency); per-iteration lineage is cut
    with ``localCheckpoint`` exactly as in ``connected_components``. The
    count() per iteration is O(1) driver data. Rounds are bounded by the
    SCC-condensation nesting depth observed through max-id roots, not by
    |V|; ``max_rounds`` is a safety net that raises rather than returns
    a partial answer.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    schema = nodes.select(
        "id", F.col("id").alias("scc_id")
    ).schema
    assigned = spark.createDataFrame([], schema)
    rem_n, rem_e = nodes, e
    n_rem = rem_n.count()
    for _ in range(max_rounds):
        if n_rem == 0:
            return assigned
        # -- 1. trim zero-in/zero-out nodes (singleton SCCs) to fixpoint
        for _t in range(max_fixpoint_iter):
            keep = (
                rem_n.join(
                    rem_e.select(F.col("dst").alias("id")).distinct(),
                    "id",
                    "semi",
                )
                .join(
                    rem_e.select(F.col("src").alias("id")).distinct(),
                    "id",
                    "semi",
                )
                .localCheckpoint()
            )
            k = keep.count()
            if k == n_rem:
                break
            peeled = rem_n.join(keep, "id", "anti")
            assigned = assigned.unionByName(
                peeled.select("id", F.col("id").alias("scc_id"))
            ).localCheckpoint()
            rem_n = keep
            rem_e = (
                rem_e.join(
                    keep.select(F.col("id").alias("src")), "src", "semi"
                )
                .join(keep.select(F.col("id").alias("dst")), "dst", "semi")
                .localCheckpoint()
            )
            n_rem = k
        if n_rem == 0:
            return assigned
        # -- 2. forward max-color propagation to fixpoint
        color = rem_n.select("id", F.col("id").alias("color")).localCheckpoint()
        for _c in range(max_fixpoint_iter):
            pred_max = (
                rem_e.join(
                    color.withColumnRenamed("id", "src"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("pcolor"))
            )
            new = (
                color.join(pred_max, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        "color", F.coalesce("pcolor", F.col("color"))
                    ).alias("color"),
                )
                .localCheckpoint()
            )
            changed = (
                new.join(
                    color.withColumnRenamed("color", "old"), "id"
                )
                .filter(F.col("color") != F.col("old"))
                .limit(1)
                .count()
            )
            color = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                "strongly_connected_components: coloring fixpoint did not "
                f"converge in {max_fixpoint_iter} iterations"
            )
        # -- 3. backward BFS from each class root, inside the class
        members = color.filter(F.col("id") == F.col("color")).localCheckpoint()
        frontier = members
        for _b in range(max_fixpoint_iter):
            preds = (
                rem_e.join(
                    frontier.withColumnRenamed("id", "dst"), "dst"
                )
                .select(F.col("src").alias("id"), "color")
                .join(color, ["id", "color"], "semi")
                .distinct()
                .join(members, ["id"], "anti")
                .localCheckpoint()
            )
            if preds.limit(1).count() == 0:
                break
            members = members.unionByName(preds).localCheckpoint()
            frontier = preds
        scc_rep = members.groupBy("color").agg(F.min("id").alias("scc_id"))
        assigned = assigned.unionByName(
            members.join(scc_rep, "color").select("id", "scc_id")
        ).localCheckpoint()
        # -- 4. settled nodes leave the remaining subgraph
        rem_n = rem_n.join(members.select("id"), "id", "anti").localCheckpoint()
        rem_e = (
            rem_e.join(
                members.select(F.col("id").alias("src")), "src", "anti"
            )
            .join(members.select(F.col("id").alias("dst")), "dst", "anti")
            .localCheckpoint()
        )
        n_rem = rem_n.count()
    if n_rem != 0:
        raise RuntimeError(
            f"strongly_connected_components: {n_rem} nodes unsettled after "
            f"{max_rounds} rounds"
        )
    return assigned


def canonicalize(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Rewrite ``id_col`` to its component's canonical id (identity for
    ids outside the similarity graph). The component map is orders of
    magnitude smaller than the data — broadcast, no shuffle."""
    comp = F.broadcast(
        components.withColumnRenamed("id", id_col).withColumnRenamed(
            "canonical_id", "_canon"
        )
    )
    return (
        df.join(comp, on=id_col, how="left")
        .withColumn(id_col, F.coalesce(F.col("_canon"), F.col(id_col)))
        .drop("_canon")
    )


def luby_mis(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    priority=None,
    max_rounds: int = 12,
) -> DataFrame:
    """(id, round) — deterministic Luby maximal independent set.

    Luby's algorithm (Luby 1986, the textbook O(log n)-round parallel
    MIS): each round, every still-active vertex whose priority is
    strictly below every active neighbor's joins the set; winners and
    their neighborhoods retire. ``priority`` is a Column function of
    the node id — pass a deterministic hash (callers wanting an
    engine-portable oracle twin pass the shared md5-based hash) so the
    "random" draw is a pure function of the id and both the rounds and
    the final set replay bit-identically anywhere.

    Scale shape per round: one join (active adjacency ⨝ active
    priorities) + one min-aggregate for the neighborhood minimum, one
    broadcast-able anti-join to retire vertices, two semi-joins to
    shrink the adjacency — all partitioned on node id, map-side
    combined, no global structure. ``localCheckpoint`` truncates the
    per-round lineage exactly as ``connected_components`` does. The
    reference engine has no MIS operator; this is the standard
    distributed formulation over the same edge shape its linking
    stages emit.
    """
    if priority is None:
        priority = F.xxhash64
    fwd = edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
    rev = edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    adj = (
        fwd.unionByName(rev)
        .filter(F.col("n") != F.col("m"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    act = (
        adj.select("n")
        .distinct()
        .withColumn("p", priority(F.col("n")))
        .localCheckpoint(eager=False)
    )
    out = None
    for r in range(max_rounds):
        if act.isEmpty():
            break
        mn = (
            adj.join(
                act.select(F.col("n").alias("m"), F.col("p").alias("pm")),
                "m",
            )
            .groupBy("n")
            .agg(F.min("pm").alias("mn"))
        )
        winners = (
            act.join(mn, "n", "left")
            .filter(F.col("mn").isNull() | (F.col("p") < F.col("mn")))
            .select("n", F.lit(r).cast("int").alias("round"))
            .localCheckpoint()
        )
        out = winners if out is None else out.unionByName(winners)
        nbrs = adj.join(winners.select(F.col("n").alias("m")), "m").select("n")
        removed = winners.select("n").unionByName(nbrs).distinct()
        act = act.join(removed, "n", "anti").localCheckpoint()
        keep = act.select("n")
        adj = (
            adj.join(keep, "n", "semi")
            .join(keep.withColumnRenamed("n", "m"), "m", "semi")
            .localCheckpoint(eager=False)
        )
    if out is None:
        # empty-graph schema must match the populated path ('id', not
        # the internal 'n' — deg_empty sweep, round 5)
        spark = edges.sparkSession
        return spark.createDataFrame([], "id string, round int")
    return out.withColumnRenamed("n", "id")


def maximal_matching(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    priority=None,
    max_rounds: int = 12,
) -> DataFrame:
    """(s, d, round) — deterministic distributed greedy maximal matching.

    Hoepman-style proposal rounds: each active vertex proposes its
    minimum-priority incident edge; an edge proposed by BOTH endpoints
    is matched and its endpoints retire. With a deterministic edge
    priority (a hash of the canonical endpoint pair) every round is a
    pure function of the surviving graph, so the result replays
    bit-identically and an unrolled-round SQL twin can re-derive it.

    Scale shape per round: the per-vertex argmin is a window
    ROW_NUMBER partitioned BY VERTEX (never global), the mutual check
    is one count-2 aggregate on the proposed edge key, retirement is
    an anti-join — everything keyed, nothing single-partition.
    """
    if priority is None:
        priority = F.xxhash64
    s, d = F.col(src), F.col(dst)
    canon = edges.select(
        F.least(s, d).alias("s"), F.greatest(s, d).alias("d")
    ).filter(F.col("s") != F.col("d")).distinct()
    canon = canon.withColumn(
        "q", priority(F.concat_ws("|", "s", "d"))
    ).localCheckpoint(eager=False)

    out = None
    for r in range(max_rounds):
        if canon.isEmpty():
            break
        inc = canon.select(F.col("s").alias("v"), "s", "d", "q").unionByName(
            canon.select(F.col("d").alias("v"), "s", "d", "q")
        )
        w = Window.partitionBy("v").orderBy("q", "s", "d")
        prop = inc.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        matched = (
            prop.groupBy("s", "d")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") == 2)
            .select("s", "d", F.lit(r).cast("int").alias("round"))
            .localCheckpoint()
        )
        if matched.isEmpty():
            break
        out = matched if out is None else out.unionByName(matched)
        gone = matched.select(F.col("s").alias("v")).unionByName(
            matched.select(F.col("d").alias("v"))
        )
        canon = (
            canon.join(gone.withColumnRenamed("v", "s"), "s", "anti")
            .join(gone.withColumnRenamed("v", "d"), "d", "anti")
            .select("s", "d", "q")
            .localCheckpoint()
        )
    if out is None:
        spark = edges.sparkSession
        return spark.createDataFrame([], "s string, d string, round int")
    return out


def source_betweenness(
    edges: DataFrame,
    seeds: DataFrame,
    depth: int = 4,
) -> DataFrame:
    """(v, delta_sum, stress) — Brandes dependency + Shimbel stress from
    a seed set, exact within a fixed BFS horizon.

    ``edges`` is a directed (eu, ev) list, ``seeds`` a (s) column of
    source ids. Forward pass: level-synchronous BFS carrying INTEGER
    shortest-path counts sigma (one join + one partial-agg sum per
    level; the visited set advances by anti-join). Backward pass: the
    Brandes accumulation delta(v) = Σ_w sigma_v/sigma_w · (1+delta_w)
    over shortest-DAG successors, alongside the integer continuation
    count c(v) = Σ_w (1+c_w); stress(v) = sigma_v · c(v) stays
    integer-exact end to end. Each round is keyed on (source, node) —
    no global sort, no driver state; ``localCheckpoint`` bounds the
    lineage exactly as ``connected_components`` does.
    """
    e = edges.select(
        F.col(edges.columns[0]).alias("eu"),
        F.col(edges.columns[1]).alias("ev"),
    ).distinct().localCheckpoint(eager=False)
    levels = [
        seeds.select(
            F.col(seeds.columns[0]).alias("s"),
            F.col(seeds.columns[0]).alias("v"),
            F.lit(1).cast("long").alias("sigma"),
        ).localCheckpoint()
    ]
    visited = levels[0].select("s", "v").localCheckpoint()
    for _ in range(depth):
        fr = levels[-1]
        msgs = fr.join(e, fr["v"] == e["eu"]).select(
            "s", F.col("ev").alias("v"), "sigma"
        )
        nxt = (
            msgs.join(visited, ["s", "v"], "anti")
            .groupBy("s", "v")
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .localCheckpoint()
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "v")).localCheckpoint()

    deltas: list[DataFrame | None] = [None] * len(levels)
    deltas[-1] = levels[-1].select(
        "s",
        "v",
        "sigma",
        F.lit(0.0).alias("delta"),
        F.lit(0).cast("long").alias("c"),
    )
    for lv in range(len(levels) - 2, -1, -1):
        w = deltas[lv + 1].select(
            F.col("s").alias("ws"),
            F.col("v").alias("wv"),
            F.col("sigma").alias("wsig"),
            F.col("delta").alias("wdelta"),
            F.col("c").alias("wc"),
        )
        f = levels[lv]
        deltas[lv] = (
            f.join(e, f["v"] == e["eu"], "left")
            .join(
                w,
                (F.col("s") == F.col("ws")) & (F.col("ev") == F.col("wv")),
                "left",
            )
            .groupBy("s", "v", "sigma")
            .agg(
                F.coalesce(
                    F.sum(
                        F.col("sigma").cast("double")
                        / F.col("wsig")
                        * (F.lit(1.0) + F.col("wdelta"))
                    ),
                    F.lit(0.0),
                ).alias("delta"),
                F.coalesce(F.sum(F.lit(1) + F.col("wc")), F.lit(0))
                .cast("long")
                .alias("c"),
            )
            .localCheckpoint()
        )
    allv = None
    for lv in range(1, len(levels)):
        part = deltas[lv].select(
            "v", "delta", (F.col("sigma") * F.col("c")).alias("st")
        )
        allv = part if allv is None else allv.unionByName(part)
    if allv is None:
        return edges.sparkSession.createDataFrame(
            [], "v string, delta_sum double, stress long"
        )
    return allv.groupBy("v").agg(
        F.sum("delta").alias("delta_sum"),
        F.sum("st").cast("long").alias("stress"),
    )


def boruvka_forest(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    max_rounds: int = 30,
) -> DataFrame:
    """(s, d, w) — minimum spanning forest by Borůvka min-edge hooking.

    Each round every current component selects its minimum outgoing
    edge under the TOTAL order (w, s, d) — so ties in w are broken
    deterministically and the forest is the unique MSF of the
    tuple-weighted graph (any sequential Kruskal using the same total
    order derives the identical edge set, which is what the SQL twin
    does). Component count at least halves per round → O(log n) rounds.

    Scale shape per round: two label joins + a per-component argmin
    (ROW_NUMBER window PARTITIONED BY component, never global), then a
    component relabel via ``connected_components`` over the forest so
    far — every step keyed, lineage localCheckpointed.
    """
    s, d = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(s, d).alias("s"),
            F.greatest(s, d).alias("d"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("s") != F.col("d"))
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("n", F.col("n").alias("comp"))
    forest = None
    for _ in range(max_rounds):
        lab_s = labels.select(F.col("n").alias("s"), F.col("comp").alias("cs"))
        lab_d = labels.select(F.col("n").alias("d"), F.col("comp").alias("cd"))
        x = (
            e.join(lab_s, "s")
            .join(lab_d, "d")
            .filter(F.col("cs") != F.col("cd"))
            .localCheckpoint()
        )
        if x.isEmpty():
            break
        cand = x.select(F.col("cs").alias("comp"), "w", "s", "d").unionByName(
            x.select(F.col("cd").alias("comp"), "w", "s", "d")
        )
        win = Window.partitionBy("comp").orderBy("w", "s", "d")
        new_e = (
            cand.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("s", "d", "w")
            .distinct()
            .localCheckpoint()
        )
        forest = new_e if forest is None else (
            forest.unionByName(new_e).distinct().localCheckpoint()
        )
        cc = connected_components(forest, "s", "d").select(
            F.col("id").alias("n"), F.col("canonical_id").alias("comp")
        )
        labels = (
            nodes.join(cc, "n", "left")
            .select("n", F.coalesce("comp", "n").alias("comp"))
            .localCheckpoint()
        )
    if forest is None:
        return edges.sparkSession.createDataFrame(
            [], "s string, d string, w long"
        )
    return forest
