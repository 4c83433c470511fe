"""Dialogue-structure operators over transcript tables: SFT pair
extraction and context-window assembly.

The north-star input is a table of multi-turn conversation / agent
transcripts (conv_id, turn_idx, role, text, tool, ts); the training
pipeline's last mile turns those into supervised examples. Both
operators are single-window plans over (conv_id, turn_idx) — the
table's natural clustering key, so a conv_id-bucketed layout shuffles
nothing, and window groups are conversation-sized (millions of small
groups, the healthy window case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def _turn_window():
    # built lazily: WindowSpec construction touches the active session
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def sft_pairs(
    transcripts: DataFrame,
    prompt_role: str = "user",
    response_role: str = "assistant",
) -> DataFrame:
    """(conv_id, turn_idx, prompt, response) for every adjacent
    ``prompt_role`` → ``response_role`` turn pair with non-empty text on
    both sides — the standard instruction-tuning pair mine.

    Adjacency is by turn_idx (the next stored turn must be the very
    next index): a tool turn between user and assistant breaks the
    pair, which is the conservative default — tool-mediated exchanges
    belong to :func:`conversation_windows`, where the intermediate
    turns are part of the context.
    """
    w = _turn_window()
    nxt_role = F.lead("role").over(w)
    nxt_text = F.lead("text").over(w)
    nxt_idx = F.lead("turn_idx").over(w)
    return (
        transcripts.select(
            "conv_id", "turn_idx", "role", "text",
            nxt_role.alias("_nr"), nxt_text.alias("_nt"),
            nxt_idx.alias("_ni"),
        )
        .where(
            (F.col("role") == prompt_role)
            & (F.col("_nr") == response_role)
            & (F.col("_ni") == F.col("turn_idx") + 1)
            & (F.length(F.trim(F.col("text"))) > 0)
            & (F.length(F.trim(F.col("_nt"))) > 0)
        )
        .select("conv_id", "turn_idx",
                F.col("text").alias("prompt"),
                F.col("_nt").alias("response"))
    )


def conversation_windows(
    transcripts: DataFrame,
    n_context: int = 3,
    target_role: str = "assistant",
    sep: str = "\n",
) -> DataFrame:
    """(conv_id, turn_idx, context, target): for every non-empty
    ``target_role`` turn, the previous ``n_context`` turns rendered as
    ``role: text`` lines — the sliding-context example builder for
    dialogue model training.

    One window with a bounded rows-frame: ``collect_list`` over
    ``rowsBetween(-n_context, -1)`` preserves frame order, so the
    context reads oldest-to-newest. Turns with empty text still appear
    in contexts (``role:`` line) — silently skipping them would
    misrepresent the conversation's shape to the model.
    """
    frame = _turn_window().rowsBetween(-n_context, -1)
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"),
                                                       F.lit("")))
    ctx = F.array_join(F.collect_list(line).over(frame), sep)
    return (
        transcripts.select(
            "conv_id", "turn_idx", "role", "text", ctx.alias("context"))
        .where((F.col("role") == target_role)
               & (F.length(F.trim(F.col("text"))) > 0)
               & (F.length(F.col("context")) > 0))
        .select("conv_id", "turn_idx", "context",
                F.col("text").alias("target"))
    )


def tool_transitions(
    transcripts: DataFrame,
    scale: int = 1000,
) -> DataFrame:
    """Markov transition statistics over per-conversation tool-call
    sequences: how often does an agent follow ``search`` with ``calc``,
    start a conversation with ``browse``, or stop after a tool? The
    workflow-mining audit for agent transcripts — skewed transition mass
    flags scripted loops; unexpected edges flag tool-use drift.

    Each conversation's tool-bearing turns (rows with non-NULL ``tool``,
    ordered by ``turn_idx``) form a sequence t₁…tₘ; transitions are
    ``('^START', t₁)``, ``(tᵢ, tᵢ₊₁)``, ``(tₘ, '$END')``. Returns
    ``(prev, next, n, p_fp)`` with ``p_fp = n * scale div Σ n(prev·)``
    — the integer fixed-point row-conditional probability.

    Plan: tool-turn filter reaches the scan; ONE window pass per
    conversation (lead + row_number share the sort; conversation-sized
    groups, the healthy window case); each row emits its transitions
    through one explode — no union branch re-running the scan. The
    transition matrix is |tools|²-sized, so the final aggregations and
    the prev-total join are vocabulary-scale.
    """
    # secondary sort on tool: duplicate turn_idx values (shouldn't
    # happen, but dirty data does) would otherwise make the sequence —
    # and thus the transition counts — nondeterministic across runs
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "tool")
    seq = (
        transcripts.where(F.col("tool").isNotNull())
        .select("conv_id", "turn_idx", "tool")
        .withColumn("_next", F.lead("tool", 1, "$END").over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    start_edge = F.when(
        F.col("_rn") == 1,
        F.array(F.struct(F.lit("^START").alias("prev"),
                         F.col("tool").alias("next")))
    ).otherwise(F.array().cast("array<struct<prev:string,next:string>>"))
    step_edge = F.array(F.struct(F.col("tool").alias("prev"),
                                 F.col("_next").alias("next")))
    edges = (
        seq.select(F.explode(F.concat(start_edge, step_edge)).alias("e"))
        .select("e.prev", "e.next")
    )
    counts = edges.groupBy("prev", "next").agg(F.count("*").alias("n"))
    totals = counts.groupBy("prev").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), "prev")
        .select("prev", "next", F.col("n").cast("long").alias("n"),
                F.expr(f"n * {scale} div _tot").alias("p_fp"))
    )


def turn_coherence(
    transcripts: DataFrame,
    threshold_ppm: int = 100_000,
) -> DataFrame:
    """Per-conversation lexical coherence: Jaccard overlap of the
    distinct-token sets of every adjacent turn pair, aggregated to
    ``(conv_id, n_transitions, mean_jac_ppm, min_jac_ppm,
    n_incoherent)``. The corpus-audit signal for transcript QUALITY
    gating: truncated/garbled conversations and mis-stitched sessions
    show up as sequences of near-zero-overlap transitions, while
    healthy task dialogues keep recurring entities/terms across turns
    (the TextTiling intuition applied at turn granularity).

    Exact integer fixed point end to end: per pair
    ``jac_ppm = (|A∩B|·10⁶) // |A∪B|`` (pmod floor — double-division
    ulp must not flip the floor), two EMPTY token sets count as
    identical (10⁶ — an empty-to-empty transition is vacuously
    coherent, and NULL would silently shrink n_transitions);
    ``mean_jac_ppm = Σ jac_ppm // n`` floored, ``n_incoherent`` counts
    transitions strictly below ``threshold_ppm``.

    One window shuffle on (conv_id, turn_idx) — the transcript table's
    natural clustering key, so a conv-bucketed layout shuffles
    nothing — then one conversation-keyed partial aggregate. Token
    arrays are built once per row in the window's input projection
    (native set ops downstream, no per-element lambda re-eval)."""
    from cow_spark.functions.text import normalize_text, tokens

    w = _turn_window()
    tok = F.array_distinct(tokens(normalize_text(F.col("text"))))
    t = transcripts.select("conv_id", "turn_idx", tok.alias("cur"))
    p = (t.select("conv_id", "cur", F.lag("cur").over(w).alias("prv"))
         .where(F.col("prv").isNotNull()))
    inter = F.size(F.array_intersect("cur", "prv")).cast("long")
    union = (F.size("cur") + F.size("prv")).cast("long") - inter
    num = inter * F.lit(1_000_000)
    jac = F.when(union > 0, ((num - F.pmod(num, union)) / union)
                 .cast("long")).otherwise(F.lit(1_000_000))
    pairs = p.select("conv_id", jac.alias("jac_ppm"))
    s, n = F.sum("jac_ppm"), F.count("*")
    return (pairs.groupBy("conv_id").agg(
        n.cast("long").alias("n_transitions"),
        ((s - F.pmod(s, n)) / n).cast("long").alias("mean_jac_ppm"),
        F.min("jac_ppm").alias("min_jac_ppm"),
        F.sum(F.when(F.col("jac_ppm") < threshold_ppm, 1)
              .otherwise(0)).cast("long").alias("n_incoherent"),
    ))


def prefix_duplicates(transcripts: DataFrame) -> DataFrame:
    """Conversations that are FULL TURN-PREFIXES of other conversations
    — the transcript-native duplicate class (a retried / regenerated /
    resumed session re-submits the same opening turns verbatim, so
    document-level near-dup misses it while the prefix relation is
    exact). Returns ``(conv_a, conv_b, prefix_len)``: conversation
    ``conv_a``'s ENTIRE turn sequence (roles and texts, in turn order)
    equals the first ``prefix_len`` turns of ``conv_b``; equal-length
    pairs (identical conversations) are emitted once with
    ``conv_a < conv_b``. Downstream keeps max-length representatives
    and drops the subsumed retries.

    Prefix identity is decided by an ORDER-AWARE COMMUTATIVE
    fingerprint: per turn ``t = H60(rank || '|' || role || '|' ||
    text) mod 2^44``, per prefix the running Σt — position sits inside
    each hash, so equal (length, sum) keys identify equal ordered
    prefixes (fingerprint-collision caveat: 44 bits per term + the
    exact length in the key, the repo-wide md5-fingerprint contract
    class). The 2^44 cap is what keeps the window sum inside int64 for
    conversations up to 2^19 turns — UNCAPPED 60-bit terms overflow at
    just 8 turns, and ANSI would abort; past 2^19 turns the sum still
    raises loudly rather than wrapping. Ranks are DENSE positions
    (row_number per conversation), so gappy turn_idx values compare by
    sequence, not by raw index arithmetic.

    Scale shape: one (conv_id)-keyed window pass for ranks + running
    sums, one conversation-sized tails table (final sum + length), and
    ONE equi-join on (length, fingerprint) — candidate pairs only
    where a tail sum matches a prefix sum at the same depth, i.e. the
    join key IS the dedup evidence. No all-pairs, no per-row Python.
    """
    from ..functions.hashing import portable_hash60

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    rk = F.row_number().over(w)
    t = transcripts.select(
        "conv_id", rk.alias("rk"),
        F.pmod(portable_hash60(F.concat_ws(
            "|", rk.cast("string"), F.col("role"),
            F.coalesce(F.col("text"), F.lit("")))),
            F.lit(1 << 44)).alias("th"))
    run = (t.withColumn(
        "fp", F.sum("th").over(
            Window.partitionBy("conv_id").orderBy("rk")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("conv_id", "rk", "fp"))
    tails = (run.groupBy("conv_id")
             .agg(F.max("rk").alias("n_turns"), F.max_by("fp", "rk")
                  .alias("total")))
    a = tails.select(F.col("conv_id").alias("conv_a"),
                     F.col("n_turns").alias("len_a"),
                     F.col("total").alias("fp_a"))
    b = run.select(F.col("conv_id").alias("conv_b"),
                   F.col("rk").alias("len_a"), F.col("fp").alias("fp_a"))
    pairs = (a.join(b, ["len_a", "fp_a"])
             .where(F.col("conv_a") != F.col("conv_b")))
    # identical conversations match in both directions: keep min-id
    # as conv_a; proper prefixes only ever match one way
    blen = tails.select(F.col("conv_id").alias("conv_b"),
                        F.col("n_turns").alias("len_b"))
    return (pairs.join(blen, "conv_b")
            .where((F.col("len_a") < F.col("len_b"))
                   | (F.col("conv_a") < F.col("conv_b")))
            .select("conv_a", "conv_b",
                    F.col("len_a").cast("long").alias("prefix_len")))


def role_entropy(
    transcripts: DataFrame,
    frac_bits: int = 10,
) -> DataFrame:
    """Per-conversation role-distribution entropy — the transcript
    diversity gate next to :func:`turn_coherence`'s lexical one: a
    healthy dialogue alternates user/assistant (entropy near 1 bit, or
    higher with tool turns); a degenerate session — one speaker
    monologuing, a runaway tool loop — collapses toward 0, and
    entropy + majority share flag both failure shapes in one pass.

    One row per conversation: ``(conv_id, n_turns, n_roles,
    entropy_fp, majority_ppm)`` — entropy in the exact integer log2
    fixed point (units 1/2^frac_bits bits): H = log2fp(n) −
    ⌊Σ cᵢ·log2fp(cᵢ) / n⌋ for role counts cᵢ (the algebraic identity
    H = log2 n − (Σ cᵢ log2 cᵢ)/n avoids per-row division entirely, so
    ONE floor happens per conversation and both engines agree
    bit-for-bit); ``majority_ppm`` the floor-scaled share of the most
    frequent role. Single-turn conversations get entropy 0, not NULL —
    a one-turn session is maximally degenerate, which is the point.

    Scale shape: groupBy(conv, role) partial agg (bounded by convs ×
    role vocabulary), log2 columns staged on that frame, one more
    partial agg to conversation grain. No windows, no joins on the
    corpus, no Python. int64 audit: cᵢ·log2fp(cᵢ) ≤ n · 63·2^frac and
    the sum stays ≤ n²-free (linear in total turns).
    """
    from ..functions.intmath import with_log2_fp

    cr = (transcripts.groupBy("conv_id", "role")
          .agg(F.count("*").alias("c")))
    cr = with_log2_fp(cr, "c", "l2c", frac_bits)
    conv = (cr.groupBy("conv_id")
            .agg(F.sum("c").alias("n_turns"),
                 F.count("*").alias("n_roles"),
                 F.sum(F.col("c") * F.col("l2c")).alias("_cl"),
                 F.max("c").alias("_cmax")))
    conv = with_log2_fp(conv, "n_turns", "_l2n", frac_bits)

    def _floor(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    return conv.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_roles").cast("long").alias("n_roles"),
        (F.col("_l2n") - _floor(F.col("_cl"), F.col("n_turns")))
        .cast("long").alias("entropy_fp"),
        _floor(F.col("_cmax") * F.lit(1_000_000), F.col("n_turns"))
        .alias("majority_ppm"))


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """Per-tool response-latency profile over agent transcripts — the
    operational health read on the `tool` column (which tools are
    slow, which go unanswered): a tool turn's latency is the event-time
    gap to the NEXT turn in its conversation (the turn that consumes
    the tool result), in exact integer microseconds.

    One row per tool: ``(tool, n_calls, n_timed, mean_us, min_us,
    max_us)`` — ``n_timed`` < ``n_calls`` exactly when tool turns end
    their conversation (no successor = unanswered; they count as calls
    but contribute no latency, a signal in itself). The mean is the
    pmod-floored integer division. Negative gaps (out-of-order event
    time) pass through into min_us rather than being silently clamped
    — a corrupt log should look corrupt.

    Scale shape: ONE window on the table's natural (conv_id, turn_idx)
    clustering key for the successor timestamp, then one partial-agg
    groupBy to the tool-vocabulary-sized result. No joins, no Python.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = F.lead(F.unix_micros(F.col("ts"))).over(w)
    calls = (transcripts
             .select("conv_id", "turn_idx", "role", "tool",
                     F.unix_micros(F.col("ts")).alias("_us"),
                     nxt.alias("_nxt"))
             .where((F.col("role") == "tool") & F.col("tool").isNotNull()))
    lat = F.col("_nxt") - F.col("_us")
    s = F.sum(F.when(F.col("_nxt").isNotNull(), lat).otherwise(0))
    n = F.sum(F.when(F.col("_nxt").isNotNull(), 1).otherwise(0))
    return (calls.groupBy("tool")
            .agg(F.count("*").cast("long").alias("n_calls"),
                 n.cast("long").alias("n_timed"),
                 s.alias("_s"),
                 F.min(lat).cast("long").alias("min_us"),
                 F.max(lat).cast("long").alias("max_us"))
            .select("tool", "n_calls", "n_timed",
                    F.when(F.col("n_timed") > 0,
                           ((F.col("_s") - F.pmod(F.col("_s"),
                                                  F.col("n_timed")))
                            / F.col("n_timed")).cast("long"))
                    .alias("mean_us"),
                    "min_us", "max_us"))


def topic_segments(
    transcripts: DataFrame,
    threshold_ppm: int = 100_000,
) -> DataFrame:
    """Lexical topic segmentation of conversations — TextTiling
    collapsed to turn granularity: a new segment opens wherever the
    adjacent-turn token Jaccard (exactly :func:`turn_coherence`'s
    per-transition statistic) falls strictly below ``threshold_ppm``.
    The chunking stage for long multi-topic sessions: RAG indexing and
    context-window packing both want topically coherent spans, not
    fixed-size slices through a subject change.

    One row per turn: ``(conv_id, turn_idx, jac_ppm, segment_id,
    segment_start)`` — ``jac_ppm`` NULL on each conversation's first
    turn (no predecessor; it always starts segment 0), ``segment_id``
    0-based and dense within the conversation, ``segment_start`` true
    on openers. Empty↔empty transitions are vacuously coherent (10⁶,
    the turn_coherence rule) so blank filler turns don't shatter
    segments.

    Scale shape: the SAME single (conv_id, turn_idx) window shuffle as
    turn_coherence carries the lag AND the running boundary sum —
    segment_id is a prefix count of boundary indicators, one sort,
    zero joins, zero Python. Per-segment rollups are one groupBy on
    the output downstream.
    """
    from ..functions.text import normalize_text, tokens

    w = _turn_window()
    tok = F.array_distinct(tokens(normalize_text(F.col("text"))))
    t = transcripts.select("conv_id", "turn_idx", tok.alias("cur"))
    p = t.select("conv_id", "turn_idx", "cur",
                 F.lag("cur").over(w).alias("prv"))
    inter = F.size(F.array_intersect("cur", "prv")).cast("long")
    union = (F.size("cur") + F.size("prv")).cast("long") - inter
    num = inter * F.lit(1_000_000)
    jac = F.when(F.col("prv").isNull(), F.lit(None).cast("long")) \
        .when(union > 0,
              ((num - F.pmod(num, union)) / union).cast("long")) \
        .otherwise(F.lit(1_000_000))
    scored = p.select("conv_id", "turn_idx", jac.alias("jac_ppm"))
    boundary = (F.col("jac_ppm").isNotNull()
                & (F.col("jac_ppm") < threshold_ppm)).cast("int")
    run = F.sum(boundary).over(
        _turn_window().rowsBetween(Window.unboundedPreceding, 0))
    return scored.select(
        "conv_id", "turn_idx", "jac_ppm",
        run.cast("long").alias("segment_id"),
        (F.col("jac_ppm").isNull()
         | (F.col("jac_ppm") < threshold_ppm)).alias("segment_start"))


def tool_ngrams(
    transcripts: DataFrame,
    n: int = 3,
    min_count: int = 1,
    sep: str = ">",
) -> DataFrame:
    """Frequent tool-call n-grams — :func:`tool_transitions` extended
    from the Markov bigram to whole sub-workflows: the corpus-level
    answer to "which length-n tool sequences do agents actually run?"
    (sequential pattern mining collapsed to contiguous n-grams, the
    scale-honest core of PrefixSpan — gap patterns need a lattice
    search; contiguous grams need one window). High-support grams are
    candidate macros/pipelines; a gram whose count dwarfs its
    conversation support is one session looping.

    Each conversation's tool-bearing turns (non-NULL ``tool``, ordered
    by ``turn_idx``) form a sequence; every contiguous window of n
    tools is a gram rendered ``t1>t2>t3``. One row per gram with
    ``count >= min_count``: ``(gram, n, n_convs, support_ppm)`` —
    ``n`` total occurrences (overlapping windows count each),
    ``n_convs`` distinct conversations containing it, ``support_ppm``
    the floor-scaled share of conversations long enough to contain ANY
    n-gram (shorter conversations can't testify either way, so they
    leave the denominator).

    Scale shape: ONE window pass on the natural (conv, turn) key
    stages the n−1 leads; complete windows survive a null filter; one
    partial-agg groupBy to the (≤ |tools|ⁿ)-bounded gram table, plus a
    1-row denominator broadcast. No joins on the corpus, no Python.
    """
    if n < 2:
        raise ValueError(f"tool_ngrams: n must be >= 2, got {n}")
    # secondary sort on tool: duplicate turn_idx values (dirty data)
    # would otherwise make gram counts nondeterministic across runs
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "tool")
    seq = (transcripts.where(F.col("tool").isNotNull())
           .select("conv_id", "turn_idx", "tool"))
    leads = [F.col("tool")] + [F.lead("tool", i).over(w)
                               for i in range(1, n)]
    grams = (seq.select("conv_id",
                        F.concat_ws(sep, *leads).alias("gram"),
                        leads[-1].isNotNull().alias("_full"))
             .where("_full"))
    denom = (grams.agg(F.countDistinct("conv_id").alias("_tc")))
    counts = (grams.groupBy("gram")
              .agg(F.count("*").alias("n"),
                   F.countDistinct("conv_id").alias("n_convs"))
              .where(F.col("n") >= min_count))
    sup = F.col("n_convs") * F.lit(1_000_000)
    return (counts.crossJoin(F.broadcast(denom))
            .select("gram",
                    F.col("n").cast("long").alias("n"),
                    F.col("n_convs").cast("long").alias("n_convs"),
                    ((sup - F.pmod(sup, F.col("_tc"))) / F.col("_tc"))
                    .cast("long").alias("support_ppm")))


def action_loops(
    transcripts: DataFrame,
    min_run: int = 3,
) -> DataFrame:
    """Runaway-loop screen over agent transcripts — the per-session
    localization that :func:`tool_ngrams` (corpus counts) and
    :func:`role_entropy` (whole-conversation collapse) don't give:
    maximal runs of CONSECUTIVE identical tool calls within a
    conversation's tool sequence. An agent stuck retrying one tool is
    the dominant transcript failure mode — it burns tokens, poisons
    SFT mining, and a run's coordinates are exactly what a repair or
    filter step needs.

    Intervening non-tool turns (the assistant reading each result) do
    NOT break a run — the sequence is the tool-bearing turns in
    ``turn_idx`` order, so "call, read, call again" still counts as
    the loop it is. One row per run with length ≥ ``min_run``:
    ``(conv_id, tool, run_len, start_turn, end_turn)``.

    Scale shape: the boundary-prefix-count trick (same shape as
    :func:`topic_segments`): ONE window on the natural (conv, turn)
    key carries the lag AND the running boundary sum that numbers the
    runs, then one partial-agg groupBy (conv, run) bounded by the
    run count. No joins, no second shuffle key, no Python.
    """
    if min_run < 2:
        raise ValueError(f"action_loops: min_run must be >= 2, "
                         f"got {min_run}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "tool")
    seq = (transcripts.where(F.col("tool").isNotNull())
           .select("conv_id", "turn_idx", "tool"))
    marked = seq.withColumn(
        "_new",
        (F.lag("tool").over(w).isNull()
         | (F.lag("tool").over(w) != F.col("tool"))).cast("int"))
    run = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (marked.withColumn("_run", run)
            .groupBy("conv_id", "_run", "tool")
            .agg(F.count("*").alias("run_len"),
                 F.min("turn_idx").alias("start_turn"),
                 F.max("turn_idx").alias("end_turn"))
            .where(F.col("run_len") >= min_run)
            .select("conv_id", "tool",
                    F.col("run_len").cast("long").alias("run_len"),
                    F.col("start_turn").cast("int").alias("start_turn"),
                    F.col("end_turn").cast("int").alias("end_turn")))


# dialogue-act heuristics, Java∩RE2 subset, applied to lowercased
# trimmed text; precedence question > command > statement. NB the
# terminal-'?' test is an explicit last-char check, NOT `\?$`: Java's
# non-multiline `$` also matches before a trailing \n, RE2's does not,
# so a `$`-anchored oracle regex diverges on newline-terminated turns.
_ACT_QUESTION = (r"^(what|who|whom|whose|when|where|why|how|"
                 r"which|is|are|was|were|do|does|did|can|could|will|"
                 r"would|should|shall|may|might)\b")
_ACT_COMMAND = (r"^(please\b|do\b|don't\b|ask\b|run\b|give\b|list\b|show\b|"
                r"tell\b|make\b|write\b|find\b|create\b|explain\b|"
                r"generate\b|stop\b|use\b|add\b|remove\b|update\b|"
                r"check\b|book\b|send\b|set\b|schedule\b)")


def speech_acts(transcripts: DataFrame) -> DataFrame:
    """Dialogue-act distribution per role — the interaction-shape
    profile next to :func:`role_entropy`'s speaker one: a healthy
    assistant corpus is statement-heavy with clarifying questions; a
    user side is question/command-heavy; drift in those shares flags
    scripted traffic or a broken collection path. A lexical heuristic
    (question = terminal '?' or interrogative opener, command =
    imperative opener, else statement; empty turns their own class),
    not a classifier — the cascade's cheap first pass, and the
    three-way split is what a sampling strategy needs.

    One row per (role, act): ``(role, act, n, share_ppm)`` with the
    share conditional WITHIN the role (shares sum to ~10⁶ per role),
    so roles of different sizes compare directly.

    Scale shape: one linear scan classifies (two regexes in one
    codegen span), one partial-agg groupBy bounded by roles × 4 acts,
    one vocabulary-sized window for the role totals. No joins on the
    corpus, no Python.
    """
    t = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    act = (F.when(F.length(t) == 0, F.lit("empty"))
           .when((F.substring(t, -1, 1) == "?")
                 | t.rlike(_ACT_QUESTION), F.lit("question"))
           .when(t.rlike(_ACT_COMMAND), F.lit("command"))
           .otherwise(F.lit("statement")))
    counts = (transcripts.select("role", act.alias("act"))
              .groupBy("role", "act").agg(F.count("*").alias("n")))
    tot = F.sum("n").over(Window.partitionBy("role"))
    share = F.col("n") * F.lit(1_000_000)
    return (counts.withColumn("_tot", tot)
            .select("role", "act", F.col("n").cast("long").alias("n"),
                    ((share - F.pmod(share, F.col("_tot")))
                     / F.col("_tot")).cast("long").alias("share_ppm")))


def render_conversations(
    transcripts: DataFrame,
    sep: str = "\n",
    line_fmt: str = "{role}: {text}",
) -> DataFrame:
    """Whole-conversation chat rendering — the SFT last mile after
    :func:`sft_pairs` (adjacent pairs) and :func:`conversation_windows`
    (sliding contexts): one training string per conversation in a
    fixed turn template, the shape every chat fine-tune consumes.
    ``line_fmt`` takes ``{role}`` and ``{text}`` (NULL text renders
    empty — skipping turns would misrepresent the dialogue's shape).

    One row per conversation: ``(conv_id, n_turns, n_chars,
    rendered)`` with ``n_chars`` the rendered length (the packing
    planner's input).

    Scale shape: ONE partial-agg groupBy on conv_id (the natural
    bucketing key — co-located layouts shuffle nothing):
    ``sort_array(collect_list(struct(turn_idx, line)))`` renders
    order-correctly without a window sort, because the struct sorts by
    its first field. Conversations are bounded (thousands of turns,
    not billions), so the per-group list is safe — the same contract
    conversation_windows documents.
    """
    import re as _re

    parts = []
    for tok in _re.split(r"(\{role\}|\{text\})", line_fmt):
        if tok == "{role}":
            parts.append(F.col("role"))
        elif tok == "{text}":
            parts.append(F.coalesce(F.col("text"), F.lit("")))
        elif tok:
            parts.append(F.lit(tok))
    if not parts:
        raise ValueError("render_conversations: empty line_fmt")
    rendered_line = F.concat(*parts)
    item = F.struct(F.col("turn_idx").alias("i"),
                    rendered_line.alias("l"))
    agg = (transcripts.groupBy("conv_id")
           .agg(F.count("*").alias("n_turns"),
                F.sort_array(F.collect_list(item)).alias("_items")))
    rendered = F.array_join(
        F.transform("_items", lambda s: s.getField("l")), sep)
    return agg.select(
        "conv_id", F.col("n_turns").cast("long").alias("n_turns"),
        F.length(rendered).cast("long").alias("n_chars"),
        rendered.alias("rendered"))


# outcome lexicons, Java∩RE2 subset, lowercased text
_OUTCOME_OK = (r"\b(thanks|thank you|perfect|great|that works|solved|"
               r"resolved|booked|done|confirmed)\b")
_OUTCOME_ERR = (r"\b(error|failed|failure|exception|timeout|"
                r"cannot|can't|unable|not working|crash)\b")


def conversation_outcome(transcripts: DataFrame) -> DataFrame:
    """Heuristic session-outcome labeling — the SFT corpus filter
    after :func:`render_conversations` renders: training on abandoned
    or error-terminated sessions teaches the failure mode, so each
    conversation gets a cheap label from its CLOSING turns (where
    outcomes live): ``resolved`` (acknowledgment lexicon in the last
    user-visible text), ``error`` (failure lexicon in the final two
    turns), ``abandoned`` (conversation ends on a user turn —
    nobody answered), else ``open``. Precedence error > resolved >
    abandoned — an error acknowledged with "thanks anyway" is still
    an error session.

    One row per conversation: ``(conv_id, n_turns, last_role,
    outcome)``.

    Scale shape: ONE partial-agg groupBy on conv_id — the closing
    turns are found with max_by/struct-max aggregates (no window, no
    sort): struct-max of (turn_idx, role/text) is the last turn,
    conditional struct-max over the two lexicon hits scopes them to
    the final two indices. No joins, no Python.
    """
    t = F.lower(F.coalesce(F.col("text"), F.lit("")))
    last = F.max(F.struct(F.col("turn_idx").alias("i"),
                          F.col("role").alias("r"),
                          t.alias("x")))
    hit_ok = F.max(F.when(t.rlike(_OUTCOME_OK),
                          F.col("turn_idx")))
    hit_err = F.max(F.when(t.rlike(_OUTCOME_ERR),
                           F.col("turn_idx")))
    agg = (transcripts.groupBy("conv_id")
           .agg(F.count("*").alias("n_turns"), last.alias("_last"),
                hit_ok.alias("_ok_i"), hit_err.alias("_err_i")))
    last_i = F.col("_last.i")
    outcome = (
        F.when(F.col("_err_i") >= last_i - 1, F.lit("error"))
        .when(F.col("_ok_i") >= last_i - 1, F.lit("resolved"))
        .when(F.col("_last.r") == "user", F.lit("abandoned"))
        .otherwise(F.lit("open")))
    return agg.select(
        "conv_id", F.col("n_turns").cast("long").alias("n_turns"),
        F.col("_last.r").alias("last_role"),
        outcome.alias("outcome"))


def turn_gaps(transcripts: DataFrame) -> DataFrame:
    """Role-transition latency profile — :func:`tool_latency`
    generalized from the tool column to every speaker handoff: the
    event-time gap between adjacent turns, aggregated per
    (prev_role, role) pair. The ops read on WHO is slow (assistant
    after tool = model latency, user after assistant = human think
    time), and the drift alarm when a collection pipeline starts
    batching writes.

    One row per occurring transition: ``(prev_role, role, n, mean_us,
    min_us, max_us)`` in exact integer micros (pmod-floored mean;
    negative out-of-order gaps surface in min_us, not clamped —
    tool_latency's rule).

    Scale shape: ONE window on the natural (conv, turn) key for the
    lag, one partial agg to the |roles|²-bounded profile. No joins,
    no Python.
    """
    w = _turn_window()
    g = (transcripts.select(
        "conv_id", "turn_idx", "role",
        F.unix_micros(F.col("ts")).alias("_us"))
        .select("role",
                F.lag("role").over(w).alias("prev_role"),
                (F.col("_us") - F.lag("_us").over(w)).alias("_gap"))
        .where(F.col("prev_role").isNotNull()))
    s = F.sum("_gap")
    n = F.count("*")
    return (g.groupBy("prev_role", "role")
            .agg(n.cast("long").alias("n"),
                 ((s - F.pmod(s, n)) / n).cast("long").alias("mean_us"),
                 F.min("_gap").cast("long").alias("min_us"),
                 F.max("_gap").cast("long").alias("max_us")))


def preference_pairs(
    responses: DataFrame,
    prompt_col: str = "prompt_id",
    id_col: str = "resp_id",
    score_col: str = "score",
    min_gap: int = 1,
) -> DataFrame:
    """DPO/RLHF preference-pair mining: for every prompt with several
    scored responses (regenerations, A/B samples, judge-rated
    candidates), emit ONE (chosen, rejected) pair — the best and the
    worst response — when the score gap clears ``min_gap``. This is
    the selection step between judge scoring (:func:`~cow_spark.plans
    .parity.judge_kappa` validates the judge) and preference-tuning
    data: a pair whose gap is inside the judge's noise band is label
    noise, hence the explicit margin.

    Both extremes ride ONE partial-aggregable groupBy (the
    :func:`~cow_spark.operators.dedup.select_survivors` shape — no
    window sort): chosen = min(struct(−score, id)) (max score, min-id
    tie-break), rejected = max(struct(−score, id)) (min score, max-id
    tie-break) — under an all-tied group the two ends land on
    different ids, and the gap filter then drops the pair unless
    ``min_gap == 0`` (document-your-noise default is 1). NULL
    prompt/id/score rows are excluded; single-response prompts never
    pair.

    Scale shape: one group-keyed shuffle with map-side combine; the
    output is prompt-bounded (≤1 row per prompt) at any corpus size.

    Returns ``(prompt_id, n_candidates, chosen_id, chosen_score,
    rejected_id, rejected_score, gap)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    p, i, s = F.col(prompt_col), F.col(id_col), F.col(score_col)
    base = (responses
            .where(p.isNotNull() & i.isNotNull() & s.isNotNull())
            .select(p.alias("prompt_id"), i.alias("rid"),
                    s.cast("long").alias("score")))
    key = F.struct((-F.col("score")).alias("ns"),
                   F.col("rid").alias("rid"))
    g = base.groupBy("prompt_id").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.min(key).alias("top"),
        F.max(key).alias("bot"))
    out = g.select(
        "prompt_id", "n_candidates",
        F.col("top.rid").alias("chosen_id"),
        (-F.col("top.ns")).cast("long").alias("chosen_score"),
        F.col("bot.rid").alias("rejected_id"),
        (-F.col("bot.ns")).cast("long").alias("rejected_score"),
        (F.col("bot.ns") - F.col("top.ns")).cast("long").alias("gap"))
    return out.where((F.col("n_candidates") >= 2)
                     & (F.col("gap") >= int(min_gap)))


def preference_pairs_oracle_sql(responses_sql: str,
                                min_gap: int = 1) -> str:
    """DuckDB twin of :func:`preference_pairs`; ``responses_sql``
    yields (prompt_id, rid, score)."""
    return f"""
with b as materialized (
  select prompt_id, rid, cast(score as bigint) as score
  from ({responses_sql})
  where prompt_id is not null and rid is not null
    and score is not null),
g as (
  select prompt_id,
         cast(count(*) as bigint) as n_candidates,
         min(struct_pack(ns := -score, rid := rid)) as top,
         max(struct_pack(ns := -score, rid := rid)) as bot
  from b group by prompt_id)
select prompt_id, n_candidates,
       top.rid as chosen_id,
       cast(-top.ns as bigint) as chosen_score,
       bot.rid as rejected_id,
       cast(-bot.ns as bigint) as rejected_score,
       cast(bot.ns - top.ns as bigint) as gap
from g
where n_candidates >= 2 and bot.ns - top.ns >= {int(min_gap)}
"""

BT_SCALE = 10_000          # rating fixed-point unit (1.0 == 10^4)
BT_S3 = BT_SCALE ** 3      # the shared numerator scale in the MM step
BT_MIN = BT_SCALE // 100   # post-normalization clamp (comparability floor)


def bradley_terry(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    rounds: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bradley-Terry strength ratings from pairwise outcomes — the
    arena-style aggregation step downstream of
    :func:`preference_pairs`: given (winner, loser) judgments between
    model/policy/response variants, estimate a per-player strength
    p_i such that P(i beats j) = p_i/(p_i+p_j), via ``rounds`` of the
    classic MM (minorization-maximization) update

        p_i' = W_i / Σ_{j~i} n_ij / (p_i + p_j)

    re-expressed in pure int64 fixed point so the iterate is a
    deterministic function of (matches, rounds) and replays
    bit-identically in DuckDB (:func:`bradley_terry_oracle_sql`) and
    pure Python (:func:`bradley_terry_py`):

    - ratings carry ``BT_SCALE`` fixed point, init ``BT_SCALE``;
    - denominator D_i = Σ (n_ij·BT_SCALE³) div (r_i + r_j);
    - raw update ru_i = max((W_i·BT_SCALE³) div max(D_i,1), 1) — a
      never-won player floors at 1 rather than collapsing the gauge;
    - each round renormalizes to Σr ≈ N·BT_SCALE (the MM gauge fix):
      r_i = max((ru_i·N·BT_SCALE) div Σru, BT_MIN).

    All divisions are floor-div on non-negative ints (``div``/``//``
    agree across engines); int64 bounds hold for ≤ ~9e6 wins per
    player, ≤ ~1.8e9 total matches, ≤ ~2e5 players (docstring math:
    the clamp keeps r_i+r_j ≥ 2·BT_MIN, the normalizer keeps
    r ≤ ~N·BT_SCALE) — beyond arena scale by orders of magnitude.
    ANSI mode makes any violation loud, not silent.

    Scale shape: the corpus-sized match log is read ONCE into two
    partial-agg tables (per-player wins, per-unordered-pair counts);
    the K rounds run on the pair table only (players × avg-degree
    rows), each round = two vocabulary-sized joins + one groupBy + a
    1-row broadcast normalizer, lineage cut per round
    (:func:`~.canon.round_checkpoint`). Self-matches and NULL
    endpoints drop. Returns ``(player, rating_fp, wins, n_matches)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from .canon import round_checkpoint

    m = (matches
         .select(F.col(winner_col).cast("string").alias("w"),
                 F.col(loser_col).cast("string").alias("l"))
         .where(F.col("w").isNotNull() & F.col("l").isNotNull()
                & (F.col("w") != F.col("l"))))
    wins = (m.groupBy(F.col("w").alias("i"))
            .agg(F.count("*").cast("long").alias("wins")).persist())
    pc = (m.select(F.least("w", "l").alias("a"),
                   F.greatest("w", "l").alias("b"))
          .groupBy("a", "b").agg(F.count("*").cast("long").alias("n")))
    pair_dir = (pc.select(F.col("a").alias("i"), F.col("b").alias("j"), "n")
                .union(pc.select(F.col("b").alias("i"),
                                 F.col("a").alias("j"), "n"))
                .persist())
    r = (pair_dir.select("i").distinct()
         .select("i", F.lit(BT_SCALE).cast("long").alias("r")))
    for _ in range(rounds):
        d = (pair_dir
             .join(r.select("i", F.col("r").alias("ri")), "i")
             .join(r.select(F.col("i").alias("j"),
                            F.col("r").alias("rj")), "j")
             .groupBy("i")
             .agg(F.sum(F.expr(f"(n * {BT_S3}) div (ri + rj)"))
                  .cast("long").alias("d")))
        u = (d.join(wins, "i", "left")
             .select("i", F.greatest(
                 F.expr(f"(coalesce(wins, 0) * {BT_S3})"
                        " div greatest(d, 1)"),
                 F.lit(1)).cast("long").alias("ru")))
        tot = u.agg(F.sum("ru").cast("long").alias("tot"),
                    F.count("*").cast("long").alias("nn"))
        r = (u.crossJoin(F.broadcast(tot))
             .select("i", F.greatest(
                 F.expr(f"(ru * nn * {BT_SCALE}) div tot"),
                 F.lit(BT_MIN)).cast("long").alias("r")))
        r = round_checkpoint(r, checkpoint_dir)
    nm = pair_dir.groupBy("i").agg(
        F.sum("n").cast("long").alias("n_matches"))
    out = (r.join(wins, "i", "left").join(nm, "i")
           .select(F.col("i").alias("player"),
                   F.col("r").alias("rating_fp"),
                   F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
                   "n_matches"))
    # The caller's single action still needs both cached partials for
    # the final rating/wins/n_matches joins — hand the handles over
    # (dedup.release(out) frees them) instead of unpersisting at
    # plan-build time, which would re-aggregate the corpus-sized match
    # log uncached.
    from .dedup import _attach_persisted

    return _attach_persisted(out, pair_dir, wins)


def bradley_terry_py(matches, rounds: int = 8):
    """Pure-Python twin of :func:`bradley_terry` — the identical
    integer recurrence, for pytest/hypothesis pinning. Returns
    ``{player: (rating_fp, wins, n_matches)}``."""
    m = [(w, l) for w, l in matches
         if w is not None and l is not None and w != l]
    wins: dict = {}
    pc: dict = {}
    for w, l in m:
        wins[w] = wins.get(w, 0) + 1
        a, b = (w, l) if w < l else (l, w)
        pc[(a, b)] = pc.get((a, b), 0) + 1
    adj: dict = {}
    for (a, b), n in pc.items():
        adj.setdefault(a, {})[b] = n
        adj.setdefault(b, {})[a] = n
    r = {i: BT_SCALE for i in adj}
    for _ in range(rounds):
        d = {i: sum((n * BT_S3) // (r[i] + r[j])
                    for j, n in js.items()) for i, js in adj.items()}
        ru = {i: max((wins.get(i, 0) * BT_S3) // max(d[i], 1), 1)
              for i in adj}
        tot, nn = sum(ru.values()), len(ru)
        r = {i: max((ru[i] * nn * BT_SCALE) // tot, BT_MIN) for i in adj}
    return {i: (r[i], wins.get(i, 0), sum(adj[i].values())) for i in adj}


def bradley_terry_oracle_sql(matches_sql: str, rounds: int = 8) -> str:
    """DuckDB twin of :func:`bradley_terry`: one MATERIALIZED CTE per
    MM round (the unrolled-chain discipline — an inlined chain would
    re-scan the base 3^rounds times), every SUM cast to BIGINT at the
    aggregate so no HUGEINT ever reaches an output or a divide."""
    sql = [
        f"with m as materialized (select winner, loser "
        f"from ({matches_sql}) where winner is not null "
        "and loser is not null and winner <> loser),",
        "w as materialized (select winner as i, "
        "cast(count(*) as bigint) as w from m group by winner),",
        "pc as materialized (select least(winner, loser) as a, "
        "greatest(winner, loser) as b, cast(count(*) as bigint) as n "
        "from m group by 1, 2),",
        "pdir as materialized (select a as i, b as j, n from pc "
        "union all select b as i, a as j, n from pc),",
        "nm as materialized (select i, cast(sum(n) as bigint) "
        "as n_matches from pdir group by i),",
        f"r0 as materialized (select i, cast({BT_SCALE} as bigint) "
        "as r from nm),",
    ]
    for k in range(1, rounds + 1):
        p = f"r{k - 1}"
        sql.append(
            f"d{k} as (select pdir.i, cast(sum((pdir.n * {BT_S3}) "
            f"// (ri.r + rj.r)) as bigint) as d "
            f"from pdir join {p} ri on pdir.i = ri.i "
            f"join {p} rj on pdir.j = rj.i group by pdir.i),")
        sql.append(
            f"u{k} as (select d{k}.i, greatest((coalesce(w.w, 0) "
            f"* {BT_S3}) // greatest(d, 1), 1) as ru "
            f"from d{k} left join w on d{k}.i = w.i),")
        sql.append(
            f"t{k} as (select cast(sum(ru) as bigint) as tot, "
            f"cast(count(*) as bigint) as nn from u{k}),")
        sql.append(
            f"r{k} as materialized (select i, greatest((ru * nn "
            f"* {BT_SCALE}) // tot, {BT_MIN}) as r from u{k}, t{k}),")
    body = "\n".join(sql).rstrip()
    assert body.endswith("),")
    body = body[:-2] + ")"
    return body + (
        f"\nselect r.i as player, cast(r.r as bigint) as rating_fp,"
        f" cast(coalesce(w.w, 0) as bigint) as wins, nm.n_matches"
        f" from r{rounds} r left join w on r.i = w.i"
        f" join nm on r.i = nm.i")
