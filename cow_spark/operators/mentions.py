"""E1 — batched mention detection over transcript text.

No COW counterpart (BASELINE.json north_star: "batched mention
detection"); generalizes COW's per-row template scan to entity mentions.

Two paths:
- **JVM path (default)**: ``regexp_extract_all`` with a gazetteer
  alternation or generic pattern — stays inside whole-stage codegen,
  zero Python. Right choice for gazetteers up to ~10⁴ names (the
  compiled DFA is broadcast as part of the plan).
- **Arrow path**: ``mapInPandas`` with a matcher compiled once per
  executor — for matchers a regex can't express. Batched, never per-row
  over the JVM boundary (input_hint mandate).

Output grain: one row per (turn, mention occurrence), with a
deterministic skolem mention IRI (E2) so re-runs mint identical IRIs —
mirroring COW's deterministic URI-template expansion (csvw.py:897-914).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.iri import skolem_iri

KEY_COLS = ["conv_id", "turn_idx"]


def gazetteer_pattern(names: list[str]) -> str:
    """Word-bounded alternation, longest-first (leftmost-first engines
    like Java regex and RE2 then agree on matches)."""
    ordered = sorted(set(names), key=lambda n: (-len(n), n))
    if not ordered:
        # \b(?:)\b matches the empty string at every word boundary —
        # a silent flood of '' mentions; fail fast instead
        raise ValueError("gazetteer_pattern requires at least one name")
    return r"\b(?:" + "|".join(re.escape(n) for n in ordered) + r")\b"


def normalize_mention(c):
    return F.lower(F.trim(c))


def block_key(c):
    """Blocking key = first-2-chars + length of the normalized surface
    form — must match the entity dictionary's block_key (FIXTURES.md F4)."""
    n = normalize_mention(c)
    return F.concat_ws("|", F.substring(n, 1, 2), F.length(n).cast("string"))


def detect_mentions(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    mention_base: str = "https://example.com/id/mention",
) -> DataFrame:
    """JVM-path mention detection: text → exploded mention rows.

    Plan shape: scan → regexp_extract_all → posexplode (no shuffle).
    """
    m = F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
    out = df.select(
        *KEY_COLS,
        F.posexplode(m).alias("mention_pos", "mention"),
    )
    return out.select(
        *KEY_COLS,
        "mention_pos",
        "mention",
        normalize_mention(F.col("mention")).alias("mention_norm"),
        block_key(F.col("mention")).alias("block_key"),
        skolem_iri(
            mention_base,
            F.col("conv_id"),
            F.col("turn_idx").cast("string"),
            F.col("mention_pos").cast("string"),
            F.col("mention"),
        ).alias("mention_iri"),
    )


def detect_mentions_arrow(
    df: DataFrame,
    matcher_factory: Callable[[], Callable[[str], list[str]]],
    text_col: str = "text",
    mention_base: str = "https://example.com/id/mention",
) -> DataFrame:
    """Arrow-batched custom matcher (compiled once per executor via the
    factory — ≅ COW's compile-once template cache, csvw.py:841-844)."""
    key_cols = KEY_COLS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        match = matcher_factory()
        for b in batches:
            rows = []
            for conv, turn, text in zip(b["conv_id"], b["turn_idx"], b[text_col]):
                if text is None:
                    continue
                # Arrow→pandas renders a nullable int column as float64
                # with NaN; keep the row with a NULL key like the JVM
                # path does instead of crashing on int(NaN)
                turn_i = None if pd.isna(turn) else int(turn)
                for pos, mention in enumerate(match(text)):
                    rows.append((conv, turn_i, pos, mention))
            yield pd.DataFrame(
                rows, columns=[*key_cols, "mention_pos", "mention"]
            )

    raw = df.select(*key_cols, text_col).mapInPandas(
        run,
        schema="conv_id string, turn_idx int, mention_pos int, mention string",
    )
    return raw.select(
        *key_cols,
        "mention_pos",
        "mention",
        normalize_mention(F.col("mention")).alias("mention_norm"),
        block_key(F.col("mention")).alias("block_key"),
        skolem_iri(
            mention_base,
            F.col("conv_id"),
            F.col("turn_idx").cast("string"),
            F.col("mention_pos").cast("string"),
            F.col("mention"),
        ).alias("mention_iri"),
    )


def cooccurrence_edges(
    mentions: DataFrame,
    group_col: str = "conv_id",
    term_col: str = "mention",
    max_per_group: int = 1_000,
) -> DataFrame:
    """Entity co-occurrence edges: (term_a, term_b, n_groups) counting
    the groups (conversations/documents) where both terms appear — the
    raw material for entity-graph construction and linking priors.

    Scale shape mirrors the LSH bucket guard: the within-group pair
    explosion is quadratic in the group's DISTINCT term count, so
    groups above ``max_per_group`` distinct terms are dropped
    (log-and-drop; a single pathological conversation otherwise emits a
    runaway task). The distinct (group, term) table feeds three
    consumers (the size histogram and both self-join sides), so it
    persists — sketch-scale, far smaller than the mention stream; AQE
    breaks ReuseExchange and the upstream extraction would otherwise
    re-run per consumer (CLAUDE.md). The handle rides on the result:
    ``dedup.release(edges)`` frees it.
    """
    from .dedup import _attach_persisted

    terms = mentions.select(
        F.col(group_col).alias("g"),
        F.col(term_col).alias("t")).distinct().persist()
    oversized = (terms.groupBy("g").agg(F.count("*").alias("_n"))
                 .where(F.col("_n") > max_per_group).select("g"))
    sized = terms.join(F.broadcast(oversized), "g", "left_anti")
    a, b = sized.alias("a"), sized.alias("b")
    out = (
        a.join(b, "g")
        .where(F.col("a.t") < F.col("b.t"))
        .select(F.col("a.t").alias("term_a"), F.col("b.t").alias("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_groups"))
    )
    return _attach_persisted(out, terms)


def coref_resolve(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Recency-heuristic coreference over transcript turns: a turn that
    names no entity inherits the most recent prior named mention in its
    conversation — the classic antecedent-recency rule (Hobbs-style
    salience collapsed to recency), and the KG-densification step that
    lets anaphoric turns ("note: Oslo", "sounds good") contribute
    triples to the entity under discussion instead of dropping out of
    the graph. COW has no dialogue notion at all; this generalizes its
    per-row extraction to cross-row context (reference per-row loop:
    csvw.py:488-557), the way the north star's transcript KG needs.

    Returns one row per input turn:
    ``(conv_col, order_col, mention, antecedent, antecedent_turn,
    resolved)`` — ``mention`` = first ``pattern`` match in this turn's
    text (NULL if none), ``antecedent`` = the latest strictly-earlier
    turn's mention, ``antecedent_turn`` = its turn, ``resolved`` =
    ``coalesce(mention, antecedent)`` (NULL only before the first
    mention of a conversation).

    Scale shape: ONE window sort per conversation (the same keyed sort
    sessionize/funnel use) carries both the antecedent surface form and
    its turn index via a single ``last(struct, ignorenulls)`` over the
    strictly-preceding frame; no join, no explode, no Python. Skewed
    (hot) conversations are bounded by SLOT-capped conversation length
    upstream; at 10^12 turns the shuffle is the one keyed exchange any
    per-conversation semantics costs.
    """
    from pyspark.sql.window import Window as _W

    m = F.nullif(F.regexp_extract(F.col(text_col), pattern, 0), F.lit(""))
    staged = df.select(
        F.col(conv_col), F.col(order_col), m.alias("mention"))
    w = (_W.partitionBy(conv_col).orderBy(order_col)
         .rowsBetween(_W.unboundedPreceding, -1))
    prior = F.last(
        F.when(F.col("mention").isNotNull(),
               F.struct(F.col(order_col).alias("at"),
                        F.col("mention").alias("m"))),
        ignorenulls=True).over(w)
    return (staged
            .select(conv_col, order_col, "mention", prior.alias("_p"))
            .select(conv_col, order_col, "mention",
                    F.col("_p.m").alias("antecedent"),
                    F.col("_p.at").alias("antecedent_turn"),
                    F.coalesce("mention", "_p.m").alias("resolved")))


# Quoted-span pattern in the Java∩RE2 subset (explicit classes, no \s):
# a double-quoted run of 1..400 non-quote/non-newline chars. Both
# engines scan leftmost non-overlapping, so an unbalanced trailing
# quote simply never closes a span — identical on both sides.
QUOTE_PATTERN = '"([^"\\n]{1,400})"'


def quote_attribution(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    speaker_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Attribute every double-quoted span in a transcript turn to its
    speaker — reported speech is the one place a turn carries a
    *second* voice, and a KG that records ``(speaker, said, quote)``
    without this step attributes quoted text to the wrong entity. The
    direct-speech slice of quotation corpora (PARC-style attribution
    collapsed to the syntactic case regex can carry at 100 TB; cue-verb
    and indirect speech stay upstream NLP).

    Returns one row per quoted span: ``(conv_id, turn_idx, speaker,
    quote_idx, quote, quote_chars)`` with ``quote_idx`` the 0-based
    position of the span within its turn (leftmost-first, the
    scan order both engines share). Spans are capped at 400 chars by
    the pattern itself — an unterminated quote swallowing the rest of
    a 100 KB turn is a data bug this cap refuses to encode.

    Scale shape: one ``regexp_extract_all`` + ``posexplode`` — map-only,
    no shuffle, no Python; rows without quotes vanish at the explode.
    """
    spans = F.regexp_extract_all(F.col(text_col), F.lit(QUOTE_PATTERN), 1)
    return (transcripts.select(
        F.col(conv_col).alias("conv_id"),
        F.col(order_col).alias("turn_idx"),
        F.col(speaker_col).alias("speaker"),
        F.posexplode(spans).alias("quote_idx", "quote"))
        .withColumn("quote_chars",
                    F.length("quote").cast("int")))


def pattern_triples(
    df: DataFrame,
    patterns: list[tuple[str, str]],
    text_col: str = "text",
    id_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Pattern-based relation extraction — the open-IE-lite stage
    between :func:`detect_mentions` (entities only) and the spec-
    driven column mapping (`operators/extract.py` maps COLUMNS; this
    extracts (subj, pred, obj) from free TEXT, the north-star's
    per-turn triple extraction when the relation lives in the prose):
    each pattern is ``(predicate_name, regex with exactly two capture
    groups)``; every match emits one triple row.

    Output: ``(<id_cols...>, pred, subj, obj)``, one row per match,
    all matches of all patterns per input row (overlaps across
    patterns allowed — they are different relations). NULL text emits
    nothing.

    Scale shape: the whole pattern library evaluates in ONE projection
    — per pattern the two group-extractions are zipped into a struct
    array and the per-pattern arrays concat into a single explode, so
    N patterns never become N union branches re-running the scan (the
    no-CSE-across-unions rule). Zero shuffles, zero Python; the
    zip_with lambda touches only its own elements, so the interpreted-
    HOF re-evaluation trap doesn't bite.
    """
    if not patterns:
        raise ValueError("pattern_triples: patterns must be non-empty")
    for name, pat in patterns:
        import re as _re
        if _re.compile(pat).groups != 2:
            raise ValueError(
                f"pattern_triples: pattern {name!r} must have exactly "
                f"two capture groups")
    t = F.coalesce(F.col(text_col), F.lit(""))

    def _mk(name):
        # a closure, not a default arg: pyspark reads the lambda's
        # ARITY to bind HOF variables, so a bound default would make
        # zip_with look ternary
        return lambda a, b: F.struct(F.lit(name).alias("pred"),
                                     a.alias("subj"), b.alias("obj"))

    arrs = []
    for name, pat in patterns:
        g1 = F.regexp_extract_all(t, F.lit(pat), 1)
        g2 = F.regexp_extract_all(t, F.lit(pat), 2)
        arrs.append(F.zip_with(g1, g2, _mk(name)))
    exploded = df.select(
        *id_cols, F.explode(F.concat(*arrs)).alias("m"))
    return exploded.select(*id_cols, "m.pred", "m.subj", "m.obj")


def mention_timeline(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    ts_col: str = "ts",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Temporal entity profile — the KG's time attributes mined in the
    same pass as the mentions themselves: per normalized surface form,
    when the entity first/last appears and how broadly (the
    ``prov:generatedAtTime``-style payload the nanopub layer attaches,
    and the recency signal :func:`coref_resolve` depends on). Entities
    whose active span is one burst in one conversation are ephemera;
    long-span multi-conversation entities are the canonicalization
    targets worth linking carefully.

    One row per entity: ``(entity, n_mentions, n_convs, first_ts,
    last_ts, span_us)`` — ``span_us`` the exact integer microsecond
    extent (0 for single-mention entities), timestamps passed through
    as-is (rendering is the caller's concern; the gate uses the
    canonical TS_FMT).

    Scale shape: scan → regexp explode (no shuffle) → ONE partial-agg
    groupBy bounded by the entity vocabulary; min/max/count all
    map-side combine. No windows, no joins, no Python.
    """
    m = F.explode(F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(pattern), 0))
    rows = df.select(F.col(conv_col).alias("_conv"),
                     F.col(ts_col).alias("_ts"),
                     m.alias("_m"))
    ent = normalize_mention(F.col("_m"))
    return (rows.select(ent.alias("entity"), "_conv", "_ts")
            .groupBy("entity")
            .agg(F.count("*").cast("long").alias("n_mentions"),
                 F.countDistinct("_conv").cast("long").alias("n_convs"),
                 F.min("_ts").alias("first_ts"),
                 F.max("_ts").alias("last_ts"))
            .withColumn(
                "span_us",
                (F.unix_micros("last_ts")
                 - F.unix_micros("first_ts")).cast("long")))
