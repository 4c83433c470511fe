"""Repetition-based quality signals (the Gopher/MassiveText rule family).

Pre-training corpora drop documents dominated by repeated lines or
n-grams; these are the standard signals, computed Spark-first:

- :func:`duplicate_line_fraction` — pure Column (array ops, codegen).
- :func:`repetition_stats` — DataFrame-level for the n-gram mode: the
  per-gram counting goes explode → groupBy with partial aggregation
  (one shuffle of (doc, gram) partials), NOT a per-row nested
  higher-order loop — interpreted HOF lambdas over d×g element pairs
  would be quadratic per document (see CLAUDE.md).

Everything is DuckDB-replayable; ratios are floor-scaled to ints at the
oracle boundary (round-half modes differ across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens
from .dedup import shingles_from_tokens


def duplicate_line_fraction(c: Column) -> Column:
    """Fraction of non-blank lines that repeat an earlier line.

    Splits on any line-ending convention (\\n, \\r\\n, \\r) and counts a
    line as blank when it has no non-whitespace character — a plain
    ``trim`` strips only spaces, so CRLF or tab-only "blank" lines
    would register as repeated content and inflate the kill signal."""
    lines = F.filter(F.split(c, r"\r\n|\r|\n"),
                     lambda x: x.rlike(r"\S"))
    n = F.size(lines)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / n.cast("double"),
    ).otherwise(F.lit(0.0))


def symbol_to_word_ratio(c: Column) -> Column:
    """Gopher's symbol gate: (# + …) occurrences per word — high values
    flag markup soup and scraped navigation."""
    syms = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\.|…"), 0))
    nw = F.size(F.filter(F.split(F.trim(c), r"\s+"),
                         lambda x: F.length(x) > 0))
    return F.when(nw > 0, syms / nw.cast("double")).otherwise(F.lit(0.0))


def alpha_word_fraction(c: Column) -> Column:
    """Fraction of words containing at least one alphabetic character —
    low values flag tables of numbers, hash dumps, separators."""
    words = F.filter(F.split(F.trim(c), r"\s+"),
                     lambda x: F.length(x) > 0)
    alpha = F.filter(words, lambda x: x.rlike("[A-Za-zÀ-ÿ]"))
    return F.when(F.size(words) > 0,
                  F.size(alpha) / F.size(words).cast("double")
                  ).otherwise(F.lit(1.0))


def bullet_line_fraction(c: Column) -> Column:
    """Fraction of non-blank lines starting with a bullet marker —
    Gopher drops documents that are mostly lists."""
    lines = F.filter(F.split(c, r"\r\n|\r|\n"), lambda x: x.rlike(r"\S"))
    bullets = F.filter(lines,
                       lambda x: F.trim(x).rlike(r"^([-*•]|[0-9]+[.)])"))
    return F.when(F.size(lines) > 0,
                  F.size(bullets) / F.size(lines).cast("double")
                  ).otherwise(F.lit(0.0))


def _ngrams_with_repeats(t: Column, n: int) -> Column:
    """All n-grams of a token array, duplicates KEPT (mode counting
    needs multiplicity — the distinct shingle set would hide exactly
    the repetition being measured). Documents shorter than ``n`` tokens
    yield NO grams (the shared builder's short-doc full-text fallback
    is a dedup-recall feature, not a repetition signal)."""
    grams = shingles_from_tokens(t, n, distinct=False)
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_dup_line_frac: float = 0.3,
    max_top_ngram_frac: float = 0.2,
    ngram: int = 2,
    max_symbol_ratio: float | None = None,
    min_alpha_frac: float | None = None,
    max_bullet_frac: float | None = None,
) -> DataFrame:
    """The composed corpus gate: every document gets ``keep`` plus the
    list of rules it failed (``reasons``) — filters should be
    *auditable*, a bare boolean hides why a corpus shrank.

    Rules (the MassiveText/Gopher shape): token-count window,
    duplicate-line fraction, top-``ngram`` share; the symbol-ratio,
    alpha-fraction, and bullet-line gates are opt-in (pass a
    threshold). One pass over the corpus: the token/line signals are
    pure Column expressions; the n-gram mode joins in from
    :func:`repetition_stats`'s partial-agg plan. Returns
    (doc_id, keep, reasons) — join back on doc_id for the surviving
    text.
    """
    from ..functions.text import token_count

    rep = repetition_stats(df, id_col, text_col, ngram)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("_nt"),
        symbol_to_word_ratio(F.col(text_col)).alias("_sym"),
        alpha_word_fraction(F.col(text_col)).alias("_alpha"),
        bullet_line_fraction(F.col(text_col)).alias("_bullet"),
    ).join(rep, "doc_id")
    checks = [
        ("too_few_tokens", F.col("_nt") < min_tokens),
        ("too_many_tokens", F.col("_nt") > max_tokens),
        ("dup_lines", F.col("dup_line_frac") > max_dup_line_frac),
        ("repeated_ngram", F.col("top_ngram_frac") > max_top_ngram_frac),
    ]
    if max_symbol_ratio is not None:
        checks.append(("symbol_soup", F.col("_sym") > max_symbol_ratio))
    if min_alpha_frac is not None:
        checks.append(("low_alpha", F.col("_alpha") < min_alpha_frac))
    if max_bullet_frac is not None:
        checks.append(("bullet_list", F.col("_bullet") > max_bullet_frac))
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks]),
        lambda x: x.isNotNull(),
    )
    return base.select(
        "doc_id",
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition signals:

    - ``dup_line_frac``  — share of non-blank lines that are repeats,
    - ``top_ngram_frac`` — share of all word ``n``-grams taken by the
      single most frequent one (1.0 = the document is one phrase
      looping; high values fail the Gopher repetition gates).

    Documents with fewer than ``n`` tokens get ``top_ngram_frac`` 0.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        duplicate_line_fraction(F.col(text_col)).alias("dup_line_frac"),
        tokens(normalize_text(F.col(text_col))).alias("_tok"),
    )
    ex = base.select(
        "doc_id",
        F.explode_outer(_ngrams_with_repeats(F.col("_tok"), n)).alias("_g"),
    )
    per_gram = (
        ex.where(F.col("_g").isNotNull())
        .groupBy("doc_id", "_g").agg(F.count("*").alias("_c"))
    )
    agg = per_gram.groupBy("doc_id").agg(
        F.max("_c").alias("_top"), F.sum("_c").alias("_total"))
    return (
        base.select("doc_id", "dup_line_frac")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "dup_line_frac",
            F.coalesce(F.col("_top") / F.col("_total").cast("double"),
                       F.lit(0.0)).alias("top_ngram_frac"),
        )
    )


def cross_doc_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-n-gram fraction (the RefinedWeb /
    "Deduplicating Training Data" passage-level signal): for each
    document, the share of its word ``n``-gram OCCURRENCES whose gram
    also appears in at least ``min_docs`` distinct documents. High
    values flag template pages, mirrored passages, and boilerplate the
    line- and whole-doc dedup passes miss — it is the *between*-document
    complement of :func:`repetition_stats` (within-document) and
    :func:`remove_repeated_lines` (exact line matches only).

    Returns (doc_id, n_grams, dup_grams, dup_frac_fp) for EVERY input
    document; ``dup_frac_fp = dup_grams * 1000 // n_grams`` (fixed-point
    — float division is not oracle-replayable), NULL when the document
    has fewer than ``n`` tokens (0 grams).

    Scale shape: grams are md5-reduced to 60-bit ints *before* any
    shuffle (the gram text never leaves the map side); per-(doc, gram)
    tf is one partial aggregation, so a phrase looping inside one
    document contributes one row, not one per repeat. Distinct-document
    frequency is then ``count(*)`` over those rows — no countDistinct
    expansion. The ≥``min_docs`` survivors (the shared-gram vocabulary,
    far smaller than the gram stream) are the join's build side; AQE
    broadcasts when it fits. Token arrays are staged as real columns
    before the gram transform (interpreted HOF lambdas re-evaluate
    captured subtrees per element, see CLAUDE.md).
    """
    from ..functions.hashing import portable_hash60

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_tok"),
    )
    ex = base.select(
        "doc_id",
        F.explode(_ngrams_with_repeats(F.col("_tok"), n)).alias("_g"),
    )
    tf = (
        ex.select("doc_id", portable_hash60(F.col("_g")).alias("_h"))
        .groupBy("doc_id", "_h").agg(F.count("*").alias("_tf"))
    )
    shared = (
        tf.groupBy("_h").agg(F.count("*").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h", F.lit(True).alias("_shared"))
    )
    per_doc = tf.join(shared, "_h", "left").groupBy("doc_id").agg(
        F.sum("_tf").cast("long").alias("n_grams"),
        F.sum(F.when(F.col("_shared"), F.col("_tf")).otherwise(0))
         .cast("long").alias("dup_grams"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
            F.expr("dup_grams * 1000 div n_grams").alias("dup_frac_fp"),
        )
    )


def remove_repeated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_repeats: int = 3,
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus-level boilerplate removal (the C4/CCNet line rule): drop
    every line that appears, trimmed, in at least ``min_repeats``
    DISTINCT documents — navigation chrome, cookie banners, signatures.
    Distinct-document counting (not raw occurrences) keeps a line that
    merely repeats inside one document; that is intra-doc repetition,
    :func:`repetition_stats`' job.

    Returns (doc_id, text, n_removed): the document rebuilt from its
    surviving lines in original order (every document survives, possibly
    empty). Lines shorter than ``min_line_chars`` after trimming are
    structural (blank separators, bullets) and are always kept.

    Scale shape: the line stream is consumed exactly twice (the
    frequent-set build and the probe — a two-pass algorithm's floor;
    the corpus-scale side is never persisted, per CLAUDE.md), with
    rebuild, totals, and removal counts folded into ONE per-doc
    aggregation on the probe pass. The frequent set is the join's
    build side — boilerplate vocabulary, orders of magnitude smaller
    than the line stream; AQE picks broadcast when it fits.

    ``posexplode_outer``, not ``posexplode``: NULL-text documents must
    survive (as empty) rather than silently vanish from the corpus.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(F.split(F.col(text_col), r"\r\n|\r|\n"))
         .alias("pos", "line"),
    )
    eligible = F.length(F.trim(F.col("line"))) >= min_line_chars
    freq = (
        lines.where(eligible)
        .select(F.md5(F.trim(F.col("line"))).alias("_h"), "doc_id")
        .groupBy("_h").agg(F.countDistinct("doc_id").alias("_n"))
        .where(F.col("_n") >= min_repeats)
        .select("_h", F.lit(True).alias("_drop"))
    )
    keyed = lines.withColumn(
        "_h", F.when(eligible, F.md5(F.trim(F.col("line")))))
    marked = keyed.join(freq, "_h", "left")
    keep = F.col("_drop").isNull() & F.col("line").isNotNull()
    return marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(  # collect_list skips NULLs
                    F.when(keep, F.struct("pos", "line")))),
                lambda x: x["line"]),
            "\n").alias("text"),
        (F.count("line")
         - F.sum(keep.cast("long"))).cast("long").alias("n_removed"),
    )


def linear_classifier_score(
    df: DataFrame,
    weights: DataFrame,
    bias_fp: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_ngrams: int = 1,
    hashed_dim: int | None = None,
    feature_col: str = "feature",
    weight_col: str = "weight_fp",
) -> DataFrame:
    """fastText-style linear classifier inference — the model-based
    quality gate of modern pipelines (FineWeb-Edu, DCLM): a document's
    logit is the bias plus the MEAN weight of its features, where
    features are lowercased word unigrams plus adjacent word n-grams up
    to ``word_ngrams`` (DCLM trains fastText with wordNgrams=2).
    Training happens offline; this operator is the corpus-scale scoring
    pass.

    ``weights`` is the trained model: ``(feature string, weight_fp
    long)`` — fixed-point integers (weight × caller's scale), so the
    distributed sum and the DuckDB oracle replay agree bit-for-bit and
    thresholding on ``logit_fp`` is exact. With ``hashed_dim=D`` the
    model uses the hashing trick instead: ``weights`` is keyed by
    ``bucket`` = hash(feature) mod D (bounded memory for unbounded
    vocabularies — fastText's own bucket trick for n-gram features).
    Unseen features weigh 0 (left join), exactly fastText's OOV rule.
    The sigmoid is monotone, so pipelines threshold the logit directly;
    apply it downstream if calibrated probabilities are needed.

    Returns (doc_id, n_features, sum_w_fp, logit_fp) with
    ``logit_fp = bias_fp + sum_w_fp div n_features`` — documents with
    no tokens are not scored (no features ⇒ no logit; keep the corpus
    table for the full id set, same contract as chunk_documents).

    Scale shape: the token array is staged as a real column (interpreted
    HOF lambdas re-evaluate captured subtrees, CLAUDE.md), unigrams and
    n-grams are ONE concat + ONE explode (a union of per-order explodes
    would re-execute the scan per order — no CSE across branches), the
    model travels by broadcast (vocabulary-sized by construction;
    ``hashed_dim`` bounds it for n-gram models), and the per-doc mean is
    a partial-aggregated groupBy where every feature of a document is
    already partition-local — the shuffle carries one row per document.
    """
    from ..functions.hashing import portable_hash60

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_tok"),
    ).withColumn("_n", F.size("_tok"))
    grams = F.col("_tok")
    for order in range(2, word_ngrams + 1):
        grams = F.concat(grams,
                         _ngrams_with_repeats(F.col("_tok"), order))
    feats = (
        base.where(F.col("_n") > 0)
        .select("doc_id", F.explode(grams).alias("_f"))
    )
    if hashed_dim is not None:
        feats = feats.select(
            "doc_id",
            F.pmod(portable_hash60(F.col("_f")),
                   F.lit(hashed_dim)).alias("_k"))
        key_col = "bucket"
    else:
        feats = feats.withColumnRenamed("_f", "_k")
        key_col = feature_col
    joined = feats.join(
        F.broadcast(weights.select(F.col(key_col).alias("_k"),
                                   F.col(weight_col).alias("_w"))),
        "_k", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_features"),
        F.sum(F.coalesce(F.col("_w"), F.lit(0))).cast("long")
        .alias("sum_w_fp"),
    ).select(
        "doc_id", "n_features", "sum_w_fp",
        F.expr(f"{int(bias_fp)} + sum_w_fp div n_features").cast("long")
        .alias("logit_fp"),
    )


def language_mix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Code-switching / language-purity signal: language-ID each fixed
    ``window``-token slice of a document and report how uniform the
    votes are — ``(doc_id, n_windows, majority_lang, purity_fp)`` with
    ``purity_fp = majority votes * 10000 div n_windows``. Mixed-language
    pages (navigation chrome in one language wrapping content in
    another, concatenation artifacts) show low purity where whole-doc
    :func:`~cow_spark.functions.text.lang_id` just reports the winner.

    Window granularity rather than lines/sentences: it needs no
    punctuation or layout to exist (crawl text often has neither) and
    bounds per-vote cost. Plan: one explode (≤ n_tokens/window rows per
    doc) → per-(doc, lang) partial-agg votes → per-doc argmax via a
    doc-partitioned window over ≤ |languages| rows per doc. Documents
    with no tokens keep n_windows=0 and NULL majority/purity.
    """
    from pyspark.sql.window import Window as W

    from ..functions.text import lang_id

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    n_win = F.ceil(F.size("_t") / F.lit(window)).cast("int")
    slices = F.when(
        F.size("_t") > 0,
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("_t"), (i * window + 1).cast("int"),
                             window))),
    ).otherwise(F.array().cast("array<string>"))
    votes = (
        staged.select("doc_id", F.explode(slices).alias("_w"))
        .select("doc_id", lang_id(F.col("_w")).alias("lang"))
        .groupBy("doc_id", "lang").agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("n"), F.asc("lang"))
    best = (
        votes.withColumn("_tot", F.sum("n").over(W.partitionBy("doc_id")))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("doc_id", F.col("_tot").cast("long").alias("n_windows"),
                F.col("lang").alias("majority_lang"),
                F.expr("n * 10000 div _tot").alias("purity_fp"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(best, "doc_id", "left")
        .select("doc_id",
                F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
                "majority_lang", "purity_fp")
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """UT1-style URL blocklist screening (the CCNet/RefinedWeb adult/
    malware domain filter): a document is flagged when any URL in its
    text resolves to a blocked domain or to a SUBDOMAIN of one
    (``cdn.bad.example`` is caught by a ``bad.example`` entry).

    ``blocklist`` is a one-column DataFrame ``(domain)``. Scale shape:
    each URL's host explodes into its parent-suffix chain (bounded by
    its label count, ~3-5 rows), then one broadcast hash equi-join
    against the blocklist — never a substring/endswith theta-join,
    which would nested-loop the corpus against the list. The corpus is
    touched map-side only; the single shuffle is the per-document
    re-aggregation.

    Returns one row per input document: ``(id_col, n_urls, n_blocked,
    blocked, matched)`` — ``matched`` is the lexicographically first
    blocklist entry that fired (deterministic audit pointer), NULL for
    clean docs. Documents without URLs come back with ``n_urls = 0``,
    ``blocked = 0``: URL screening has no opinion on prose, compose it
    with the text gates in :func:`quality_filter`.
    """
    from ..functions.text import url_domains

    bl = (blocklist.select(F.lower(F.col("domain")).alias("_bld"))
          .where(F.col("_bld").isNotNull()).distinct())
    urls = docs.select(
        F.col(id_col),
        F.posexplode_outer(url_domains(F.col(text_col)))
        .alias("_upos", "_dom"))
    parts = F.split(F.col("_dom"), r"\.")
    sfx_arr = F.when(
        F.col("_dom").isNotNull(),
        F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(
                F.slice(parts, i, F.size(parts) - i + 1), ".")))
    sfx = urls.select(
        id_col, "_upos", "_dom",
        F.explode_outer(sfx_arr).alias("_sfx"))
    hits = sfx.join(F.broadcast(bl), F.col("_sfx") == F.col("_bld"),
                    "left")
    per_url = hits.groupBy(id_col, "_upos").agg(
        F.max((F.col("_dom").isNotNull()).cast("int")).alias("_is_url"),
        F.min("_bld").alias("_match"))
    return per_url.groupBy(id_col).agg(
        F.sum("_is_url").cast("bigint").alias("n_urls"),
        F.sum((F.col("_match").isNotNull()).cast("bigint")
              ).alias("n_blocked"),
        F.max((F.col("_match").isNotNull()).cast("int")).alias("blocked"),
        F.min("_match").alias("matched"),
    )


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level crawl dedup (the CCNet first pass — dedup by URL
    before any text is even read): one kept representative per
    CANONICAL url (functions/text.py:canonical_url strips fragments,
    tracking params, default ports; lowercases scheme+host). Keeps the
    minimum ``id_col`` — retry-stable, no "first seen" race. Returns
    every input row with its canonical key and ``kept`` flag so the
    caller can audit the drop set instead of losing it.

    One groupBy on the canonical key + one key-equi join back — the
    same two-shuffle representative-election shape as exact text
    dedup, but on a URL-sized key (no content hashing, no text IO)."""
    from ..functions.text import canonical_url

    w = docs.select(F.col(id_col), F.col(url_col),
                    canonical_url(F.col(url_col)).alias("canon_url"))
    reps = w.groupBy("canon_url").agg(F.min(id_col).alias("_keep"))
    return (w.join(reps, "canon_url")
            .select(id_col, url_col, "canon_url",
                    (F.col(id_col) == F.col("_keep")).cast("int")
                    .alias("kept")))


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Automated Readability Index + Coleman-Liau per document, in
    EXACT integer fixed point — the grade-level quality gate (corpora
    skewed to grade < 3 are boilerplate/listings; > 16 is OCR noise
    and code): both formulas use only character/word/sentence counts,
    which is what makes them exactly computable at corpus scale where
    syllable-based scores (Flesch) are not.

    Count definitions, mirrored verbatim by the oracle (all in the
    Java∩RE2 regex subset — no ``\\s``, no shorthand classes):
    words = maximal ``[A-Za-z0-9]+`` runs (a deliberate, documented
    deviation from whitespace tokens: hyphenation and punctuation glue
    never change the word count); ARI characters = total alnum chars
    (= Σ run lengths); CLI letters = ``[A-Za-z]`` count; sentences =
    ``[.!?]+`` terminator runs, floored at 1 when words > 0 (an
    unterminated fragment is one sentence, not a division by zero).

    ppm fixed point with the pmod floor trick (negative numerators are
    legal — short texts score below 0; truncation-toward-zero would
    diverge from DuckDB's ``//`` exactly there):
    ``ari_ppm  = ⌊10⁶·(471·c·s + 50·w² − 2143·w·s) / (100·w·s)⌋``
    ``cli_ppm  = ⌊10⁶·(588·l − 2960·s − 1580·w) / (100·w)⌋``
    (ARI = 4.71·c/w + 0.5·w/s − 21.43; CLI = 5.88·l/w − 29.6·s/w −
    15.8 — coefficients scaled to integers). NULL scores when a doc
    has no words.

    Map-only: one projection over the scan, zero shuffles — the plan a
    100 TB quality pass needs (composes with the Gopher gates in a
    single stage).
    """
    t = F.col(text_col)
    w = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z0-9]+"), 0)) \
        .cast("long")
    c = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z0-9]"), 0)) \
        .cast("long")
    letters = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]"), 0)) \
        .cast("long")
    s_raw = F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)) \
        .cast("long")
    s = F.greatest(s_raw, F.lit(1).cast("long"))

    def floordiv(num: Column, den: Column) -> Column:
        return ((num - F.pmod(num, den)) / den).cast("long")

    ari_num = F.lit(1_000_000) * (
        F.lit(471) * c * s + F.lit(50) * w * w - F.lit(2143) * w * s)
    cli_num = F.lit(1_000_000) * (
        F.lit(588) * letters - F.lit(2960) * s - F.lit(1580) * w)
    ari = F.when(w > 0, floordiv(ari_num, F.lit(100) * w * s))
    cli = F.when(w > 0, floordiv(cli_num, F.lit(100) * w))
    return df.select(
        F.col(id_col),
        w.alias("n_words"),
        c.alias("n_alnum"),
        letters.alias("n_letters"),
        F.when(w > 0, s).alias("n_sentences"),
        ari.alias("ari_ppm"),
        cli.alias("cli_ppm"),
    )


# name → pattern, all inside the Java∩RE2 regex subset (inline (?i),
# no lookaround/backrefs) so every detector replays in the oracle.
INJECTION_PATTERNS: list[tuple[str, str]] = [
    ("override",
     r"(?i)(ignore|disregard|forget) (all |any |the )?"
     r"(previous|prior|above|earlier) "
     r"(instructions|directions|rules|prompts)"),
    ("exfil",
     r"(?i)(reveal|print|show|repeat|output) (your |the |me the )?"
     r"(system prompt|hidden instructions|initial prompt|secret)"),
    ("coercion",
     r"(?i)(you are now|pretend to be|jailbreak|do anything now"
     r"|\bDAN\b)"),
    ("payload", r"[A-Za-z0-9+/]{60,}={0,2}"),
]


def injection_scan(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    role_col: str | None = None,
) -> DataFrame:
    """Prompt-injection heuristic screen over transcript turns — the
    agent-pipeline safety gate next to :func:`pii_scan`'s privacy one:
    before transcripts become training data, turns that carry
    instruction-override phrasing, system-prompt exfiltration asks,
    role-coercion framing, or long base64-ish payloads get flagged for
    quarantine. A regex screen is not a classifier — it is the cheap
    100 TB FIRST pass that bounds what a model-based second pass must
    read, exactly the blocklist→classifier cascade url_blocklist and
    classifier_score already form.

    Output per input row: ``(<id_cols...>[, role], n_override,
    n_exfil, n_coercion, n_payload, n_injection, flagged)`` —
    ``role`` passes through when ``role_col`` is given because WHERE
    the pattern sits is the signal (override phrasing in a TOOL turn
    is the classic indirect-injection shape; in a user turn it may be
    a legitimate quote).

    Scale shape: one linear scan, the whole regex forest in a single
    codegen span — no shuffle, no Python, same discipline as pii_scan.
    """
    if not id_cols:
        raise ValueError("injection_scan: id_cols must be non-empty")
    t = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(c) for c in id_cols]
    if role_col:
        cols.append(F.col(role_col).alias("role"))
    total = None
    for name, pat in INJECTION_PATTERNS:
        c = F.size(F.regexp_extract_all(t, F.lit(pat), 0))
        cols.append(c.cast("int").alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.cast("int").alias("n_injection"))
    cols.append((total > 0).alias("flagged"))
    return df.select(*cols)


def lexicon_scan(
    df: DataFrame,
    id_cols: list[str],
    categories: dict[str, list[str]],
    text_col: str = "text",
) -> DataFrame:
    """Wordlist screen over tokenized text — the OTHER mechanical
    shape of content screening: :func:`injection_scan`'s regex forest
    is right for a handful of PATTERNS, but a 50k-term toxicity /
    brand-safety / domain lexicon cannot be one regex — it is a
    broadcast JOIN against the token stream (match on normalized
    token equality; multi-word phrases belong in the regex family).
    Same cascade position: the cheap 100 TB first pass bounding what
    a model-based second pass reads.

    ``categories`` maps category name → term list (terms are
    normalized with the same rule as the text). Output per input row:
    ``(<id_cols...>, n_<cat>..., n_hits, flagged)`` — rows with no
    tokens (empty/NULL text) appear with zero counts, a screen that
    silently drops unscreenable rows isn't a screen. A term listed
    under two categories counts once in each.

    Scale shape: explode to the token stream (the inherent cost of
    token-equality matching), ONE broadcast hash join against the
    lexicon (never shuffled), one partial-aggregated groupBy back to
    the id grain — the groupBy key is the table's own id, so
    pre-partitioned layouts shuffle nothing. No Python, no regex
    scaling with lexicon size.
    """
    from ..functions.text import normalize_text, tokens

    if not id_cols:
        raise ValueError("lexicon_scan: id_cols must be non-empty")
    if not categories:
        raise ValueError("lexicon_scan: categories must be non-empty")
    cats = sorted(categories)
    rows = [(cat, t) for cat in cats
            for t in sorted({w.strip().lower()
                             for w in categories[cat] if w.strip()})]
    if not rows:
        raise ValueError("lexicon_scan: categories contain no terms")
    lex = df.sparkSession.createDataFrame(rows, "cat string, tok string")
    tok = (df.select(*id_cols,
                     F.explode_outer(
                         tokens(normalize_text(F.col(text_col))))
                     .alias("tok")))
    hit = tok.join(F.broadcast(lex), "tok", "left")
    aggs = [F.sum(F.when(F.col("cat") == c, 1).otherwise(0))
            .cast("int").alias(f"n_{c}") for c in cats]
    out = hit.groupBy(*id_cols).agg(*aggs)
    total = None
    for c in cats:
        total = F.col(f"n_{c}") if total is None \
            else total + F.col(f"n_{c}")
    return out.select(*id_cols, *[f"n_{c}" for c in cats],
                      total.cast("int").alias("n_hits"),
                      (total > 0).alias("flagged"))


# signal regexes in the Java∩RE2 subset (text lowercased first)
_CODE_SYM = r"[{}();=<>\[\]]"
_CODE_KW = (r"\b(def|class|import|return|function|var|const|lambda|"
            r"void|int|public|static|elif|endif|struct|impl|fn|let)\b")
_CODE_INDENT = r"(?m)^(    |\t)"


def code_detect(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    min_score_ppm: int = 60_000,
) -> DataFrame:
    """Code-vs-prose routing heuristic — the corpus triage every
    mixed crawl needs before language-specific pipelines (code wants
    exact-substring dedup and no lowercasing; prose wants the Gopher
    gates): three cheap orthogonal signals — symbol density
    (braces/semicolons/operators), reserved-word hits, and indented
    lines — combined into one integer score. A heuristic router, not
    a classifier: it bounds what a trained router reads, and the
    per-signal counts are kept so thresholds can be re-derived
    without a rescan.

    Output per row: ``(<id_cols...>, n_chars, n_sym, n_kw, n_indent,
    score_ppm, is_code)`` with ``score_ppm = (n_sym·10 + n_kw·40 +
    n_indent·80) · 10⁶ / (n_chars+1)`` floor-divided (weights favor
    structure over punctuation; +1 dodges the empty-text divide) and
    ``is_code = score_ppm ≥ min_score_ppm``. NULL text scores 0.

    Scale shape: one linear scan, all three counters in a single
    codegen span — no shuffle, no Python (pii_scan discipline).
    """
    if not id_cols:
        raise ValueError("code_detect: id_cols must be non-empty")
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n_chars = F.length(t)
    n_sym = F.size(F.regexp_extract_all(t, F.lit(_CODE_SYM), 0))
    n_kw = F.size(F.regexp_extract_all(t, F.lit(_CODE_KW), 0))
    n_ind = F.size(F.regexp_extract_all(t, F.lit(_CODE_INDENT), 0))
    raw = (n_sym * 10 + n_kw * 40 + n_ind * 80) \
        * F.lit(1_000_000).cast("long")
    den = (n_chars + 1).cast("long")
    score = ((raw - F.pmod(raw, den)) / den).cast("long")
    return df.select(
        *id_cols,
        n_chars.cast("int").alias("n_chars"),
        n_sym.cast("int").alias("n_sym"),
        n_kw.cast("int").alias("n_kw"),
        n_ind.cast("int").alias("n_indent"),
        score.alias("score_ppm"),
        (score >= min_score_ppm).alias("is_code"))


# explicit byte-class regexes (Java∩RE2; no \s, no shorthand):
# C0 controls excluding \t \n \r, DEL+C1 controls, and U+FFFD
_ENC_C0 = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
_ENC_C1 = "[\\x7F-\\x9F]"
_ENC_REPLACEMENT = "�"


def encoding_health(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Mojibake / encoding-damage screen — the ingest-side text-health
    gate before any tokenizer sees the corpus: U+FFFD replacement
    chars mean a decoder already lost bytes, C0 controls mean binary
    contamination, DEL/C1 controls are the classic UTF-8-read-as-
    latin-1 signature. Damaged docs poison dedup fingerprints and BPE
    merges, and the per-signal counts say which repair (re-decode,
    strip, drop) applies.

    Output per row: ``(<id_cols...>, n_chars, n_replacement, n_c0,
    n_c1, bad_ppm, flagged)`` — ``bad_ppm`` floor-scaled over
    ``n_chars`` (0 for empty/NULL text), ``flagged`` = any signal.
    Tabs/newlines/CRs are NOT counted (real text contains them; the
    classes are explicit, the `\\s`-vs-\\x0B engine gap never enters).

    Scale shape: one linear scan, three counters in one codegen span,
    no shuffle, no Python (pii_scan discipline).
    """
    if not id_cols:
        raise ValueError("encoding_health: id_cols must be non-empty")
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_rep = F.size(F.regexp_extract_all(t, F.lit(_ENC_REPLACEMENT), 0))
    n_c0 = F.size(F.regexp_extract_all(t, F.lit(_ENC_C0), 0))
    n_c1 = F.size(F.regexp_extract_all(t, F.lit(_ENC_C1), 0))
    bad = (n_rep + n_c0 + n_c1).cast("long") * F.lit(1_000_000)
    den = F.greatest(n_chars.cast("long"), F.lit(1))
    return df.select(
        *id_cols,
        n_chars.cast("int").alias("n_chars"),
        n_rep.cast("int").alias("n_replacement"),
        n_c0.cast("int").alias("n_c0"),
        n_c1.cast("int").alias("n_c1"),
        ((bad - F.pmod(bad, den)) / den).cast("long").alias("bad_ppm"),
        ((n_rep + n_c0 + n_c1) > 0).alias("flagged"))


# ---------------------------------------------------------------------------
# Unicode-script mix profile (multilingual corpus audit)
# ---------------------------------------------------------------------------

# Explicit codepoint ranges, NOT \p{Script=...}: Java and RE2 spell
# script properties differently (\p{IsCyrillic} vs \p{Cyrillic}) and
# the oracle must replay the same sets — literal ranges are identical
# in both engines. Whitespace is the explicit class (Java \s includes
# \x0B, RE2's does not — text.py URL_PATTERN note).
_SCRIPT_RANGES = [
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("han", "[一-鿿]"),
]
_SPACE_CLASS = "[ \t\n\r\f\x0b]"


def script_profile(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Unicode-script composition audit — the multilingual complement
    to language-ID (:func:`language_mix` infers the language of
    mostly-Latin text; this catches the corpus-level failure modes
    language-ID can't: a "Russian" shard that is 90% Latin mojibake,
    CJK leaking into an English split, digit-dominated scrape junk).
    Counts per document the characters in five literal script ranges
    (Latin letters, ASCII digits, Cyrillic, Greek, CJK-unified Han)
    plus explicit whitespace; ``other`` is the remainder against
    codepoint length. The document's DOMINANT script is the
    first-in-canonical-order class with the maximum count (ties
    deterministic; all-zero → ``'none'``), and the output is the
    dominant-script rollup: one row per script with document count
    and the summed per-class character totals — a bounded profile
    (≤ 6 rows) whatever the corpus size.

    Shape: one linear scan, six ``regexp_count`` in one codegen span,
    one tiny groupBy — no Python, no second pass (pii_scan
    discipline). ``length()`` counts codepoints in both engines, so
    the ``other`` arithmetic replays exactly.

    No reference counterpart (COW is single-locale per run);
    extension family SURVEY.md §2.11.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {name: F.regexp_count(t, F.lit(pat)).cast("long")
              for name, pat in _SCRIPT_RANGES}
    space = F.regexp_count(t, F.lit(_SPACE_CLASS)).cast("long")
    n_chars = F.length(t).cast("long")
    other = n_chars - space - sum(counts.values())
    names = [n for n, _ in _SCRIPT_RANGES]
    # first-with-max wins, in canonical order: latin beats cyrillic
    # on an exact tie, etc. — the same CASE chain the oracle spells.
    dom = F.lit("none")
    for name in reversed(names):
        later = [counts[m] for m in names[names.index(name) + 1:]]
        cond = counts[name] > 0
        for o in later:
            cond = cond & (counts[name] >= o)
        for e in names[:names.index(name)]:
            cond = cond & (counts[name] > counts[e])
        dom = F.when(cond, F.lit(name)).otherwise(dom)
    per = docs.select(
        dom.alias("script"), space.alias("_space"),
        other.alias("_other"),
        *[counts[n].alias(f"_{n}") for n in names])
    return (per.groupBy("script")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 *[F.sum(f"_{n}").cast("long").alias(f"{n}_chars")
                   for n in names],
                 F.sum("_space").cast("long").alias("space_chars"),
                 F.sum("_other").cast("long").alias("other_chars")))


def script_profile_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`script_profile`; ``docs_sql`` yields
    (text). Same literal ranges (RE2 accepts the identical class
    strings); the dominance CASE replays first-with-max in order."""
    # count of a 1-char class = len(t) - len(t with the class deleted)
    c = {name: f"(length(t) - length(regexp_replace(t, '{pat}', '', 'g')))"
         for name, pat in _SCRIPT_RANGES}
    space = ("(length(t) - length(regexp_replace(t, '[ \t\n\r\f" +
             "\x0b]', '', 'g')))")
    names = [n for n, _ in _SCRIPT_RANGES]
    whens = []
    for i, name in enumerate(names):
        conds = [f"{c[name]} > 0"]
        conds += [f"{c[name]} > {c[e]}" for e in names[:i]]
        conds += [f"{c[name]} >= {c[o]}" for o in names[i + 1:]]
        whens.append(f"when {' and '.join(conds)} then '{name}'")
    dom = "case " + " ".join(whens) + " else 'none' end"
    sums = ", ".join(
        f"cast(sum({c[n]}) as bigint) as {n}_chars" for n in names)
    return f"""
with d as materialized (
  select coalesce(text, '') as t from ({docs_sql}))
select {dom} as script, cast(count(*) as bigint) as n_docs,
       {sums},
       cast(sum({space}) as bigint) as space_chars,
       cast(sum(length(t) - {space}
                - ({' + '.join(c[n] for n in names)})) as bigint)
         as other_chars
from d group by 1
"""


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character-distribution Shannon entropy — the
    compressibility proxy for gibberish/boilerplate screening
    (Gopher-family signal): keyboard mash, base64 blobs, and
    single-char padding sit at the entropy extremes where word-level
    gates (:func:`gopher_quality`) are blind, and a cheap entropy
    band prefilter runs before any tokenizer.
    :func:`~cow_spark.plans.stats.script_profile` classifies WHICH
    scripts appear; this measures how evenly the document spends its
    alphabet.

    Exact integer surface on the shared log2 kernel (no libm):
    ``entropy_fp = log2_fp(n) − (Σ c·log2_fp(c)) div n`` in 1/1024-bit
    units — algebraically H = log2 n − (1/n)Σ c·log2 c, every term
    the engine-portable fixed-point log2, the one floor at the
    division. Empty/NULL text reports (0, 0, 0) rather than
    disappearing. Character = one regex-split element in BOTH engines
    — identical for ASCII/BMP text (the repo's fixtures are ASCII;
    astral-plane codepoints split into surrogate halves on the JVM
    but one codepoint in DuckDB, the levenshtein-gotcha class —
    oracle-facing fixtures stay ASCII by contract).

    Scale shape: one char-explode (corpus-byte-sized, the honest cost
    of an exact profile) into a (doc, char) partial-agg shuffle —
    combiner-friendly, alphabet-bounded per doc; the log2 kernel
    stages integer columns on the counts table only. Returns
    ``(doc_id, n_chars, n_alphabet, entropy_fp)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from ..functions.intmath import with_log2_fp

    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("t"))
    ch = (base.select("doc_id",
                      F.explode(F.split(F.col("t"), "")).alias("ch"))
          .where(F.length("ch") > 0)
          .groupBy("doc_id", "ch").agg(F.count("*").alias("c")))
    cc = with_log2_fp(ch, "c", "l2c")
    per = cc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_alphabet"),
        F.sum(F.col("c") * F.col("l2c")).cast("long").alias("num"))
    per = with_log2_fp(per, "n_chars", "l2n")
    ent = (F.col("l2n")
           - F.expr("(num - pmod(num, n_chars)) div n_chars"))
    scored = per.select(
        "doc_id", "n_chars", "n_alphabet",
        ent.cast("long").alias("entropy_fp"))
    return (base.select("doc_id").distinct()
            .join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_chars", F.lit(0)).cast("long")
                    .alias("n_chars"),
                    F.coalesce("n_alphabet", F.lit(0)).cast("long")
                    .alias("n_alphabet"),
                    F.coalesce("entropy_fp", F.lit(0)).cast("long")
                    .alias("entropy_fp")))


def char_entropy_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`char_entropy`; ``docs_sql`` yields
    ``(doc_id, text)``."""
    from ..functions.intmath import log2_fp_sql

    l2c = log2_fp_sql("c")
    l2n = log2_fp_sql("n_chars")
    return f"""
with base as materialized (select doc_id, text from ({docs_sql})),
ch as (
  select doc_id, unnest(regexp_split_to_array(text, '')) as ch
  from base),
cnt as (
  select doc_id, ch, cast(count(*) as bigint) as c
  from ch where length(ch) > 0 group by doc_id, ch),
cc as (select doc_id, c, {l2c} as l2c from cnt),
per as (
  select doc_id, cast(sum(c) as bigint) as n_chars,
         cast(count(*) as bigint) as n_alphabet,
         cast(sum(c * l2c) as bigint) as num
  from cc group by doc_id),
scored as (
  select doc_id, n_chars, n_alphabet,
         cast({l2n} - num // n_chars as bigint) as entropy_fp
  from per)
select b.doc_id,
       cast(coalesce(n_chars, 0) as bigint) as n_chars,
       cast(coalesce(n_alphabet, 0) as bigint) as n_alphabet,
       cast(coalesce(entropy_fp, 0) as bigint) as entropy_fp
from (select distinct doc_id from base) b
left join scored on b.doc_id = scored.doc_id
"""
