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
    # coalesce: array_union(x, NULL) is NULL and explode would drop the
    # entity entirely — a nullable aliases column (parquet/JSON sources)
    # must still contribute the canonical name
    alias = F.explode(
        F.array_union(
            F.array(F.col("canonical_name")),
            F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
        )
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


_KEY = ["conv_id", "turn_idx", "mention_pos", "mention", "mention_norm",
        "mention_iri"]


def _argmax_entity(scored: DataFrame) -> DataFrame:
    """Best (entity_id, score) per mention occurrence; deterministic
    tie-break: highest score, then smallest entity_id."""
    best = scored.groupBy(*_KEY).agg(
        F.min_by(
            F.struct(F.col("score"), F.col("entity_id")),
            F.struct((-F.col("score")).alias("ns"), F.col("entity_id")),
        ).alias("_b"),
    )
    return best.select(
        *_KEY,
        F.col("_b.entity_id").alias("entity_id"),
        F.col("_b.score").alias("score"),
    )


def link_mentions(
    mentions: DataFrame,
    entities: DataFrame,
    min_score: float = 0.5,
) -> DataFrame:
    """mentions × broadcast(dictionary) → best entity per mention.

    Two-phase cascade (identical results to scoring every block
    candidate, proven by the score-1.0-iff-equal property of normalized
    levenshtein):

    1. **exact phase** — broadcast equi-join on the normalized surface
       form; any hit is a guaranteed global argmax (score 1.0 beats every
       fuzzy candidate; ties broken by min entity_id as usual).
    2. **fuzzy phase** — only mentions with no exact alias go through
       block-key candidate generation + levenshtein scoring. In
       gazetteer-heavy corpora this is a tiny residue; without the
       cascade a collision-prone block (all 'Pe…' persons share one key)
       turns 0.7M mentions into ~34M scored candidates.

    Mentions below ``min_score`` everywhere are dropped (they stay
    linkable via canonicalization, E4).
    """
    dic = candidate_dictionary(entities)

    # NOTE: the mentions subtree feeds both cascade phases (exact join +
    # the anti-join residue), so upstream mention detection executes once
    # per branch. We deliberately do NOT persist here: mentions is the
    # corpus-scale side, and pinning it in executor storage for the
    # session lifetime is a worse failure mode than recomputing a regex
    # scan. Callers that know their data is small can persist upstream.

    exact_hits = mentions.join(
        F.broadcast(dic.select("entity_id",
                               F.col("alias_norm").alias("mention_norm"))),
        "mention_norm",
    ).withColumn("score", F.lit(1.0))
    exact = _argmax_entity(exact_hits)

    residue = mentions.join(
        F.broadcast(dic.select(F.col("alias_norm").alias("mention_norm"))
                    .distinct()),
        "mention_norm",
        "left_anti",
    )
    cand = residue.join(F.broadcast(dic), "block_key")
    scored = cand.withColumn(
        "score", similarity(F.col("mention_norm"), F.col("alias_norm"))
    ).where(F.col("score") >= min_score)
    fuzzy = _argmax_entity(scored)

    return exact.unionByName(fuzzy)


def alias_table(
    linked: DataFrame,
    surface_col: str = "mention_norm",
    entity_col: str = "entity_id",
    min_count: int = 1,
) -> DataFrame:
    """Alias-prior table from linking (or annotation) evidence — the
    P(entity | surface form) dictionary every production entity linker
    bootstraps from its own output (the Wikipedia anchor-text trick:
    count how often each surface form resolves to each entity, and the
    normalized counts become the candidate prior for the NEXT linking
    run). This closes the loop on :func:`link_mentions`: run it once
    with the gazetteer, harvest the alias table, and ambiguous surface
    forms now carry a data-derived prior instead of a string-similarity
    guess.

    Output, one row per (surface, entity) pair observed ≥ ``min_count``
    times: ``(surface, entity, n_links, n_surface, prior_ppm, rank)``
    — ``prior_ppm`` the floor-scaled share of the surface form's links
    going to this entity, ``rank`` 1 = most-linked (ties broken by min
    entity for determinism). ``min_count`` prunes hapax noise BEFORE
    the prior denominator — a pruned alias row should not dilute the
    survivors' priors, so ``n_surface`` sums the surviving rows only
    (documented choice; pass min_count=1 for raw shares).

    Scale shape: the corpus-scale linked table collapses in ONE
    partial-aggregated groupBy(surface, entity); the window for totals
    and ranks runs on the ALIAS-sized result (bounded by distinct
    surface×entity pairs, vocabulary scale), partitioned by surface —
    no corpus-scale window, no Python, no joins.
    """
    if min_count < 1:
        raise ValueError(
            f"alias_table: min_count must be >= 1, got {min_count}")
    from pyspark.sql import Window

    pairs = (linked
             .where(F.col(surface_col).isNotNull()
                    & F.col(entity_col).isNotNull())
             .groupBy(F.col(surface_col).alias("surface"),
                      F.col(entity_col).alias("entity"))
             .agg(F.count("*").alias("n_links"))
             .where(F.col("n_links") >= min_count))
    w = Window.partitionBy("surface")
    wr = w.orderBy(F.col("n_links").desc(), F.col("entity").asc())
    tot = F.sum("n_links").over(w)
    x = F.col("n_links") * F.lit(1_000_000)
    return (pairs
            .select("surface", "entity",
                    F.col("n_links").cast("long").alias("n_links"),
                    tot.cast("long").alias("n_surface"),
                    ((x - F.pmod(x, tot)) / tot).cast("long")
                    .alias("prior_ppm"),
                    F.row_number().over(wr).cast("int").alias("rank")))
