"""E3 — entity linking: blocked candidate generation + broadcast-dictionary
scoring (BASELINE.json north_star).

Plan shape (built for the 100 TB side being `mentions`):

    mentions (huge)  ──┐
                       ├── broadcast hash join on block_key (dictionary is
    entities (small) ──┘    driver-size; aliases exploded first)
    → vectorized score (levenshtein similarity, JVM built-in)
    → per-mention argmax via max_by (single partial-aggregating shuffle —
      cheaper than a row_number window, which would sort each group)

The only shuffle is the final per-mention aggregation; the join itself is
broadcast (verified in tests via the physical plan). Skewed blocks (one
hot entity in ~30% of mentions) are irrelevant to a broadcast join and the
argmax aggregates partially map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mentions import block_key, normalize_mention


def candidate_dictionary(entities: DataFrame) -> DataFrame:
    """Explode canonical_name + aliases → (alias_norm, block_key, entity_id).

    block_key is recomputed per alias (an alias can start differently than
    its canonical form).
    """
    alias = F.explode(
        F.array_union(F.array(F.col("canonical_name")), F.col("aliases"))
    ).alias("alias")
    d = entities.select("entity_id", alias)
    return d.select(
        "entity_id",
        normalize_mention(F.col("alias")).alias("alias_norm"),
        block_key(F.col("alias")).alias("block_key"),
    ).dropDuplicates(["entity_id", "alias_norm", "block_key"])


def similarity(a, b):
    """Normalized levenshtein similarity in [0, 1] (JVM built-in)."""
    return F.round(
        1.0
        - F.levenshtein(a, b)
        / F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double"),
        6,
    )


def link_mentions(
    mentions: DataFrame,
    entities: DataFrame,
    min_score: float = 0.5,
) -> DataFrame:
    """mentions × broadcast(dictionary) → best entity per mention.

    Returns one row per mention with (entity_id, score); mentions whose
    block has no candidate above ``min_score`` are dropped (they stay
    linkable via canonicalization, E4).
    """
    dic = candidate_dictionary(entities)
    cand = mentions.join(F.broadcast(dic), "block_key")
    scored = cand.withColumn(
        "score", similarity(F.col("mention_norm"), F.col("alias_norm"))
    ).where(F.col("score") >= min_score)
    # argmax per mention occurrence; deterministic tie-break: highest
    # score, then smallest entity_id (min_by over (-score, entity_id))
    best = scored.groupBy(
        "conv_id", "turn_idx", "mention_pos", "mention", "mention_norm",
        "mention_iri",
    ).agg(
        F.min_by(
            F.struct(F.col("score"), F.col("entity_id")),
            F.struct((-F.col("score")).alias("ns"), F.col("entity_id")),
        ).alias("_b"),
    )
    return best.select(
        "conv_id", "turn_idx", "mention_pos", "mention", "mention_norm",
        "mention_iri",
        F.col("_b.entity_id").alias("entity_id"),
        F.col("_b.score").alias("score"),
    )
