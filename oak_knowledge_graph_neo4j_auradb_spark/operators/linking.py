"""Stage L — span-wise mention detection + candidate entity linking
against a broadcast entity dictionary (BASELINE.json north_star).

The reference links implicitly — every relationship endpoint is an exact
column value (schema_mapper.py:315-320). At interleaved-document scale
the prose spans themselves mention entities ("Builds on thread-014…"),
so the engine adds an explicit two-step stage:

1. **Mention detection** — regexp candidates over ``kind='text'`` spans.
   Pure Catalyst (`regexp_extract_all` + explode): no Python in the
   scan, patterns are per-entity-type config.
2. **Candidate linking** — left join against the entity dictionary
   (label, id). The dictionary is the node-ID dimension — orders of
   magnitude smaller than the doc table — so it broadcasts; the
   10^12-row mention stream never shuffles.

Unlinked mentions survive with ``linked=false`` — they are the signal
for dictionary gaps (the reference's silent MATCH-miss drops them,
pipeline/auradb_loader.py:296-309; keeping them is the lineage-friendly
variant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default mention patterns per target node label
MENTION_PATTERNS: dict[str, str] = {
    "Unit": r"unit-[a-z]+-[0-9]{4}",
    "Thread": r"thread-[0-9]{3}",
}


def extract_mentions(
    docs: DataFrame, patterns: dict[str, str] | None = None
) -> DataFrame:
    """(doc_id, label, mention) — every pattern hit in every text span.

    One scan: spans are exploded once, each pattern contributes an
    extract-all array, concatenated and exploded together."""
    patterns = patterns if patterns is not None else MENTION_PATTERNS
    spans = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "text")
    arrays = [
        F.transform(
            F.regexp_extract_all(F.col("s.text"), F.lit(rx), F.lit(0)),
            lambda m: F.struct(F.lit(label).alias("label"), m.alias("mention")),
        )
        for label, rx in patterns.items()
    ]
    arr = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
    return spans.select(
        "doc_id", F.explode(arr).alias("_m")
    ).select(
        "doc_id",
        F.col("_m.label").alias("label"),
        F.col("_m.mention").alias("mention"),
    )


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Left join mentions against the (label, nid) entity dictionary.

    Adds ``linked`` (boolean). The dictionary side broadcasts — the
    mention stream keeps its partitioning."""
    d = F.broadcast(
        dictionary.select(
            "label", F.col("nid").alias("mention"), F.lit(True).alias("linked")
        ).distinct()
    )
    return mentions.join(d, on=["label", "mention"], how="left").withColumn(
        "linked", F.coalesce(F.col("linked"), F.lit(False))
    )


def deletion_variants(col: Column) -> Column:
    """The string plus every single-character deletion, deduped —
    the SymSpell deletion neighborhood at edit radius 1."""
    return F.array_union(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                F.substr(col, F.lit(1), i - 1),
                F.substr(col, i + 1, F.length(col)),
            ),
        ),
    )


def block_candidates(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """The BLOCKING stage alone: deduped (doc_id, label, mention, nid)
    candidate pairs from the radius-1 deletion-neighborhood equi-join,
    before the exact levenshtein filter. Exposed separately so blocking
    quality (reduction ratio, block precision — kg93) can be measured
    against the candidate volume the rerank actually sees."""
    m = mentions.select("doc_id", "label", "mention").withColumn(
        "variant", F.explode(deletion_variants(F.col("mention")))
    )
    d = F.broadcast(
        dictionary.select("label", "nid")
        .distinct()
        .withColumn("variant", F.explode(deletion_variants(F.col("nid"))))
    )
    return (
        m.join(d, on=["label", "variant"])
        .select("doc_id", "label", "mention", "nid")
        .distinct()  # a pair can collide on several shared variants
    )


def link_candidates(
    mentions: DataFrame,
    dictionary: DataFrame,
    max_edit: int = 1,
    top_k: int = 1,
) -> DataFrame:
    """Fuzzy **candidate** entity linking: SymSpell-style blocking +
    exact levenshtein rerank (north_star's "candidate entity linking").

    Both sides expand to their radius-1 deletion neighborhood
    ({s} ∪ del1(s)); a shared variant is a superset certificate for
    edit distance ≤ 1 (substitution → same-position deletions match;
    insertion/deletion → one side IS the other's deletion), so the
    equi-join on (label, variant) generates every true candidate and
    the exact ``levenshtein`` filter prunes the false ones. At scale
    the dictionary side (|dict| × avg_len rows after expansion)
    broadcasts; the 10^12-row mention stream fans out ×(len+1) in-place
    and never shuffles for the join — the only shuffles are the
    candidate dedup and the per-mention top-k window, both over the
    matched-candidate stream (≪ mention stream), partitioned by
    mention key (never global). A naive levenshtein theta-join would
    be a full broadcast-nested-loop over every mention × every entry.

    Input mentions must be distinct per (doc_id, label, mention) —
    the rank window treats that triple as the candidate group.
    Returns (doc_id, label, mention, nid, dist, rank) with
    ``rank <= top_k``, ties broken by (dist, nid).
    """
    cand = (
        block_candidates(mentions, dictionary)
        .withColumn("dist", F.levenshtein("mention", "nid").cast("long"))
        .filter(F.col("dist") <= max_edit)
    )
    w = Window.partitionBy("doc_id", "label", "mention").orderBy("dist", "nid")
    return cand.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= top_k)
