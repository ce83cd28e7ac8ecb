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

from pyspark.sql import DataFrame
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
