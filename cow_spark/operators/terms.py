"""Corpus term statistics: vocabulary building and TF-IDF keyword
extraction.

Training-data pipelines build vocabularies (tokenizer training, OOV
audits) and per-document keyword profiles (clustering, topic balance)
before any model sees the data. No reference counterpart (extension
family, SURVEY.md §2.9).

Scale shape: both operators are explode → partial-aggregated groupBy —
the shuffle carries (key, partial-count) rows, never raw text. TF-IDF
scores are **integer fixed-point** (same policy as graphrank.py):
``score_fp = tf * SCALE * n_docs // df`` is monotone in tf·(N/df) and
bit-exact in the DuckDB replay, where a float log-idf could drift by a
ulp across libm implementations and flip a top-k boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import normalize_text, tokens

SCALE = 1_000  # tf * SCALE * n_docs must stay < 2^63; at 10^12 docs
# use the double-precision ranking path instead (no oracle replay)


def _term_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term) with multiplicity — lowercased whitespace tokens,
    the same normalization the dedup family uses."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )


def vocabulary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(term, doc_freq, total_tf): one pass, one shuffle on term.

    ``min_df`` prunes hapax noise (the long tail is most of the
    vocabulary; dropping df<2 typically shrinks the output 5-10×
    before it ever hits the driver or a sink).
    """
    per_doc = _term_rows(df, id_col, text_col).groupBy(
        "doc_id", "term").agg(F.count("*").alias("tf"))
    out = per_doc.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )
    return out.where(F.col("doc_freq") >= min_df) if min_df > 1 else out


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` terms per document by fixed-point TF-IDF:
    (doc_id, term, tf, doc_freq, score_fp, rank).

    Plan: one explode feeding two aggregations (per-(doc,term) tf;
    per-term df), a join of tf against the term-keyed df table, and a
    per-document top-k window. The window partitions by doc_id —
    millions of small groups, the healthy case (the CLAUDE.md window
    warning is about FEW groups). Ties break on term order so results
    are deterministic.
    """
    term_rows = _term_rows(df, id_col, text_col)
    tf = term_rows.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term", "tf", "doc_freq",
        F.expr(f"(tf * {SCALE} * {n_docs}) div doc_freq").alias("score_fp"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style language-model quality score, integer-exact:
    per-document mean unigram surprisal in whole BITS per token —
    (doc_id, n_tokens, bits_sum, score_fp) with
    ``score_fp = bits_sum * SCALE // n_tokens``.

    CCNet filters pre-training corpora by LM perplexity (well-modeled
    text scores low, gibberish and boilerplate-noise score high).
    log-probabilities are libm territory — ln() differs in the last ulp
    across glibc/JVM/DuckDB and a floor() at a boundary flips — so the
    per-token surprisal here is the EXACT integer
    ``floor(log2(T / c(t)))`` computed with no floating point at all:
    ``length(bin(T div c)) - 1`` (bit length of the integer quotient;
    floor(log2(x)) == floor(log2(floor(x))) for x >= 1 because 2^k is
    an integer). 1-bit-per-token resolution on a signal whose useful
    range spans ~5-25 bits/token — coarse per token, tight per document
    after averaging over hundreds of tokens, and reproducible anywhere.

    ``model=None`` scores against the corpus itself (self-surprisal:
    the within-corpus outlier detector). Pass a (term, count) DataFrame
    to score against a reference corpus — then unseen tokens take the
    add-one floor ``floor(log2((T + V) / (c + 1)))`` with V = model
    vocabulary size (seen tokens use the same smoothed form, keeping
    the distribution proper).

    Plan: one explode → per-(doc,term) tf → term-keyed join against the
    (vocabulary-sized) count table → per-doc partial aggregation. The
    shuffle carries (doc, term, tf) partials, never raw text; empty/
    NULL-text documents are kept with n_tokens=0 and NULL score.
    """
    tf = (
        _term_rows(df, id_col, text_col)
        .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    if model is None:
        counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
        totals = counts.agg(F.sum("c").alias("T"))
        joined = tf.join(counts, "term").crossJoin(F.broadcast(totals))
        bits = F.length(F.bin(F.expr("T div c"))) - F.lit(1)
    else:
        counts = model.select(F.col(model.columns[0]).alias("term"),
                              F.col(model.columns[1]).cast("long").alias("c"))
        totals = counts.agg((F.sum("c") + F.count("*")).alias("TV"))
        joined = (tf.join(F.broadcast(counts), "term", "left")
                  .crossJoin(F.broadcast(totals)))
        bits = F.length(
            F.bin(F.expr("TV div (coalesce(c, 0) + 1)"))) - F.lit(1)

    per_doc = (
        joined.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_tokens"),
             F.sum(F.col("tf") * bits).cast("long").alias("bits_sum"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("bits_sum", F.lit(0)).cast("long").alias("bits_sum"),
            F.expr(f"bits_sum * {SCALE} div n_tokens").alias("score_fp"),
        )
    )


def surprisal_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
) -> DataFrame:
    """CCNet's head/middle/tail corpus partition: score every document
    with :func:`unigram_surprisal`, then split at the ``cuts`` exact
    order statistics of the score distribution — ``head`` = lowest
    surprisal (best-modeled text, what CCNet keeps for pre-training),
    ``tail`` = highest, ``unscored`` = documents with no tokens.

    Returns (doc_id, score_fp, bucket). ``percentile_disc`` is an exact
    order statistic (integer in, integer out, no interpolation — the
    DuckDB oracle replays it bit-for-bit, same split as
    plans/stats.py:column_profile's audit mode). Exact-percentile
    memory is ∝ DISTINCT scores, and score_fp is fixed-point with a
    few-thousand-value range — bounded at any corpus size, so unlike a
    general exact percentile this audit aggregation is safe at scale.
    The two cutoffs travel to every row via a broadcast single-row
    cross join, not a window over the whole corpus (a global
    partitionBy() window would funnel the corpus through one task).
    """
    scored = unigram_surprisal(df, id_col, text_col, model)
    lo, hi = cuts
    cut = scored.where(F.col("score_fp").isNotNull()).agg(
        F.expr(f"percentile_disc({lo!r}) within group (order by score_fp)"
               ).alias("_lo"),
        F.expr(f"percentile_disc({hi!r}) within group (order by score_fp)"
               ).alias("_hi"),
    )
    return scored.crossJoin(F.broadcast(cut)).select(
        "doc_id", "score_fp",
        F.when(F.col("score_fp").isNull(), F.lit("unscored"))
         .when(F.col("score_fp") <= F.col("_lo"), F.lit("head"))
         .when(F.col("score_fp") <= F.col("_hi"), F.lit("middle"))
         .otherwise(F.lit("tail")).alias("bucket"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, arXiv:2302.03169): score each raw document by how much better
    a *target*-corpus bag-of-hashed-n-grams model predicts its features
    than the raw-corpus model does. Select-by-weight (top-k or
    threshold) is the caller's one-line follow-up.

    Features are unigrams ⊕ bigrams of the normalized tokens, hashed
    into ``n_buckets`` buckets (the paper's hashing trick; collisions
    are part of the method). Per-bucket surprisal under each model is
    the integer-exact whole-bit form used across this module —
    ``bitlength((T_m + B) div (c_m + 1)) - 1``, add-one smoothing (the
    paper's mixture smoothing is a float; whole bits replay bit-exactly
    in any engine) — and

        ``logw_bits = Σ_b n_db · (bits_raw(b) − bits_target(b))``

    positive when the target model predicts the document better, i.e.
    log₂ of the (smoothed) importance ratio at 1-bit bucket resolution;
    per-document sums over hundreds of features make the ranking tight.

    Plan: explode → per-(doc, bucket) counts (corpus shuffles carry
    hashed partials, never text). The raw model aggregates the same
    gram relation down to ≤ B rows — Spark re-runs that scan for the
    model branch (no CSE across branches without a persist, and the
    per-doc bucket table is corpus-scale: caching it is the link.py
    anti-trade), so the corpus is read twice, each pass map-side
    partial-aggregated. The target model scans only the (small,
    curated) target corpus. Models and totals travel by broadcast —
    the corpus is never joined to anything its own size. Documents
    with no tokens keep n_feats=0 and a NULL weight; an EMPTY target
    corpus yields NULL weights for every document (no model to score
    against) rather than an error.
    """
    B = int(n_buckets)

    def grams(frame: DataFrame, idc: str, txt: str) -> DataFrame:
        # stage the token array as a real column: HOF lambdas re-evaluate
        # captured subtrees per element
        staged = frame.select(
            F.col(idc).alias("doc_id"),
            tokens(normalize_text(F.col(txt))).alias("_t"))
        bi = F.when(
            F.size(F.col("_t")) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(F.col("_t")) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("_t"), (i + 1).cast("int")),
                    F.element_at(F.col("_t"), (i + 2).cast("int")))),
        ).otherwise(F.array().cast("array<string>"))
        return staged.select(
            "doc_id", F.explode(F.concat(F.col("_t"), bi)).alias("gram"))

    from ..functions.hashing import portable_hash60

    bucket = (portable_hash60(F.col("gram")) % B).alias("bucket")
    docbuck = (
        grams(df, id_col, text_col).select("doc_id", bucket)
        .groupBy("doc_id", "bucket").agg(F.count("*").alias("n"))
    )
    raw = docbuck.groupBy("bucket").agg(F.sum("n").alias("c_raw"))
    tgt = (
        grams(target, id_col, text_col).select(bucket)
        .groupBy("bucket").agg(F.count("*").alias("c_tgt"))
    )
    tot = (raw.agg(F.sum("c_raw").cast("long").alias("t_raw"))
           .crossJoin(tgt.agg(F.sum("c_tgt").cast("long").alias("t_tgt"))))
    bits_raw = F.length(F.bin(F.expr(f"(t_raw + {B}) div (c_raw + 1)"))) - 1
    bits_tgt = F.length(F.bin(
        F.expr(f"(t_tgt + {B}) div (coalesce(c_tgt, 0) + 1)"))) - 1
    per = (
        docbuck.join(F.broadcast(raw), "bucket")
        .join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("n_feats"),
             F.sum(F.col("n") * (bits_raw - bits_tgt)).cast("long")
             .alias("logw_bits"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(per, "doc_id", "left")
        .select("doc_id",
                F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                F.col("logw_bits"))
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conditional (bigram) LM quality score, integer-exact — the
    second-order member of the CCNet family next to
    :func:`unigram_surprisal`: per-document mean surprisal of each
    token given its predecessor, in whole bits,

        ``bits(w1 w2) = bitlength(c(w1·) div c(w1 w2)) − 1``
        ``≈ floor(log₂ 1/P(w2|w1))``

    where ``c(w1·)`` counts w1 as a bigram head and ``c(w1 w2)`` the
    bigram itself, both over this corpus (self-scoring: every document
    bigram exists in the model, so no backoff branch — this is the
    within-corpus phrase-predictability outlier detector; formulaic
    boilerplate scores near 0 bits/transition, incoherent token salad
    scores high). Same whole-bit integer discipline as the rest of the
    module: no floating point anywhere, replays bit-exactly in DuckDB.

    Returns ``(doc_id, n_bigrams, bits_sum, score_fp)`` with
    ``score_fp = bits_sum * SCALE div n_bigrams``; documents with
    fewer than two tokens keep n_bigrams=0 and NULL score.

    Plan: one explode into (doc, w1, w2) partials → per-doc-bigram tf
    (the only corpus-sized shuffle) → the two model tables are
    re-aggregations of tf (bigram- and head-vocabulary sized) joined
    back on their term keys — vocabulary joins, never corpus×corpus;
    hot head words ("the") skew the w1 join but each tf row matches
    exactly one model row (no fan-out) and AQE splits oversized
    partitions.
    """
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    bigrams = F.when(
        F.size(F.col("_t")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("_t")) - 2),
            lambda i: F.struct(
                F.element_at(F.col("_t"), (i + 1).cast("int")).alias("w1"),
                F.element_at(F.col("_t"), (i + 2).cast("int")).alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    tf = (
        staged.select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    )
    c2 = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = tf.groupBy("w1").agg(F.sum("tf").alias("c1"))
    bits = F.length(F.bin(F.expr("c1 div c2"))) - F.lit(1)
    per = (
        tf.join(c2, ["w1", "w2"]).join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_bigrams"),
             F.sum(F.col("tf") * bits).cast("long").alias("bits_sum"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("bits_sum", F.lit(0)).alias("bits_sum"),
            F.expr(f"bits_sum * {SCALE} div n_bigrams").alias("score_fp"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_fp: int = 120,
    b_fp: int = 75,
) -> DataFrame:
    """Okapi BM25 keyword retrieval scores, integer-exact end to end:
    ``(doc_id, n_hits, score_fp)`` for every document matching at least
    one query term. The keyword half of hybrid search (fuse with an
    embedding ranking via :func:`rrf_fuse`).

    Arithmetic (all bigint, no libm):
    - idf in 1/1024-bit units via the exact mantissa-squaring log2
      kernel (:mod:`..functions.intmath`):
      ``max(0, log2fp(2N−2df+1) − log2fp(2df+1))`` — Robertson idf with
      the ±0.5 folded into integers; terms in every document score 0.
    - tf saturation with k1/b as hundredths (k1=1.2 → 120):
      ``denom_h = 100 − b_fp + (b_fp·dl·N) div T`` (dl/avgdl = dl·N/T),
      ``tfsat = tf·(k1_fp+100)·1000 div (tf·100 + k1_fp·denom_h div 100)``.
    - score_fp = Σ idf_fp · tfsat div 1000 (1/1024-bit units).

    Plan: one explode filtered to the literal query-term set (the
    filter sits on the exploded stream, so non-query terms never enter
    a shuffle), per-(doc, term) tf carrying doc length; the per-term
    stats table is |query|-sized — the log2 kernel's staged columns run
    there, then broadcast back. Corpus totals (N driver-side count,
    T one partial agg) ride a broadcast cross join.
    """
    from ..functions.intmath import with_log2_fp

    q = sorted({t.lower() for t in query_terms})
    if not q:
        raise ValueError("empty query")
    n_docs = df.select(F.col(id_col)).distinct().count()

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    rows = (
        toks.select("doc_id", F.size("_t").alias("dl"),
                    F.explode("_t").alias("term"))
        .where(F.col("term").isin(q))
    )
    tf = rows.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl"))

    stats = (
        tf.groupBy("term").agg(F.count("*").alias("df_t"))
        .withColumn("_num", 2 * n_docs - 2 * F.col("df_t") + 1)
        .withColumn("_den", 2 * F.col("df_t") + 1)
    )
    stats = with_log2_fp(stats, "_num", "_lnum")
    stats = with_log2_fp(stats, "_den", "_lden")
    stats = stats.select(
        "term", F.greatest(F.col("_lnum") - F.col("_lden"),
                           F.lit(0)).alias("idf_fp"))

    totals = toks.agg(F.sum(F.size("_t")).cast("long").alias("T"))
    scored = (
        tf.join(F.broadcast(stats), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("_denom_h",
                    F.expr(f"100 - {b_fp} + ({b_fp} * dl * {n_docs}) div T"))
        .withColumn("_tfsat",
                    F.expr(f"(tf * ({k1_fp} + 100) * 1000) div "
                           f"(tf * 100 + ({k1_fp} * _denom_h) div 100)"))
        .withColumn("_s", F.expr("(idf_fp * _tfsat) div 1000"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"),
             F.sum("_s").cast("long").alias("score_fp"))
    )


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Collocation mining by pointwise mutual information — the
    corpus-analysis classic for multi-word expressions ("new york",
    "machine learning") and tokenizer-merge candidates. Integer-exact:

        ``pmi_fp = L(c_ab) − L(T₂) − L(c_a) − L(c_b) + 2·L(T₁)``

    with ``L`` the fixed-point log2 kernel (1/1024-bit units,
    :mod:`..functions.intmath`), c_ab the bigram count, c_x unigram
    counts, T₂/T₁ total bigrams/tokens — the sum-of-floors form of
    log₂ P(ab)/(P(a)P(b)), identical in every engine (a libm log here
    would flip top-k boundaries). ``min_count`` suppresses the hapax
    pairs PMI notoriously over-ranks. Returns the top-``k``
    ``(w1, w2, n_ab, pmi_fp)`` by (pmi desc, pair asc).

    Plan: one explode into bigram partials, vocabulary-sized count
    tables joined on their term keys, the staged log2 kernel over the
    surviving (≥ min_count) pairs, and a TakeOrdered top-k. The two
    count tables are PERSISTED (vocabulary-sized — the bounded-cache
    convention): each feeds multiple consumers (totals actions + the
    joins) and AQE breaks exchange reuse, so without the persist every
    consumer would re-run the corpus explode. The handles ride on the
    result (``dedup.release``).
    """
    from ..functions.intmath import log2_fp_py, with_log2_fp
    from ..operators.dedup import _attach_persisted

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    bigrams = F.when(
        F.size(F.col("_t")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("_t")) - 2),
            lambda i: F.struct(
                F.element_at(F.col("_t"), (i + 1).cast("int")).alias("w1"),
                F.element_at(F.col("_t"), (i + 2).cast("int")).alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = staged.select(F.explode(bigrams).alias("b")).select("b.w1", "b.w2")
    c_ab = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_ab")).persist()
    uni = (staged.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count("*").alias("n"))).persist()
    t1 = uni.agg(F.sum("n")).first()[0] or 0
    t2 = c_ab.agg(F.sum("n_ab")).first()[0] or 0
    if t1 < 1 or t2 < 1:
        uni.unpersist(), c_ab.unpersist()
        raise ValueError("collocations needs a non-empty corpus")

    j = (
        c_ab.where(F.col("n_ab") >= min_count)
        .join(uni.withColumnRenamed("w", "w1")
              .withColumnRenamed("n", "n_a"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("n", "n_b"), "w2")
    )
    j = with_log2_fp(j, "n_ab", "_lab")
    j = with_log2_fp(j, "n_a", "_la")
    j = with_log2_fp(j, "n_b", "_lb")
    const = 2 * log2_fp_py(t1) - log2_fp_py(t2)
    scored = j.select(
        "w1", "w2", F.col("n_ab").cast("long").alias("n_ab"),
        (F.col("_lab") - F.col("_la") - F.col("_lb") + F.lit(const))
        .cast("long").alias("pmi_fp"))
    out = scored.orderBy(F.desc("pmi_fp"), "w1", "w2").limit(k)
    return _attach_persisted(out, c_ab, uni)


def surprisal_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Span-level surprisal localization: score every fixed
    ``window``-token slice of a document with the corpus unigram model
    and report the WORST one — ``(doc_id, n_windows, worst_idx,
    worst_fp)`` with ``worst_fp`` the max per-window mean surprisal in
    the module's fixed-point units. Where :func:`unigram_surprisal`
    says "this document averages badly", this says "THIS span is the
    problem" — the signal for cutting an injected boilerplate/garbage
    region instead of dropping a whole mostly-good document.

    Same integer-exact whole-bit machinery; per-window means make short
    noise spans visible that a document-level mean dilutes away.
    Ties break on the lowest window index. Plan: one explode into
    (doc, window, term) rows, the vocabulary-sized count join, one
    partial agg per (doc, window) and an argmax per doc — all shuffles
    carry hashed/counted partials, never text.
    """
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    from ..operators.dedup import _attach_persisted

    rows = staged.select(
        "doc_id",
        F.posexplode("_t").alias("_pos", "term"),
    ).select("doc_id", (F.col("_pos") / window).cast("int").alias("w"),
             "term")
    # vocabulary-sized, three consumers (totals + the join) — persist
    # per the AQE-breaks-reuse convention; handle rides on the result
    counts = rows.groupBy("term").agg(F.count("*").alias("c")).persist()
    totals = counts.agg(F.sum("c").alias("T"))
    bits = F.length(F.bin(F.expr("T div c"))) - F.lit(1)
    per_win = (
        rows.join(counts, "term").crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("n_tok"),
             F.sum(bits).cast("long").alias("bits_sum"))
        .withColumn("score_fp", F.expr(f"bits_sum * {SCALE} div n_tok"))
    )
    out = (
        per_win.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_windows"),
             F.max_by(F.col("w"),
                      F.struct(F.col("score_fp"), -F.col("w")))
             .cast("int").alias("worst_idx"),
             F.max("score_fp").cast("long").alias("worst_fp"))
    )
    return _attach_persisted(out, counts)


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Distribution drift between two corpus snapshots (crawl N vs
    crawl N+1, pre- vs post-filter, train vs eval): unigram tokens
    hashed into ``n_buckets`` buckets (the DSIR hashing trick — same
    portable md5 hash, so the twin replays bucket membership exactly),
    compared bucket-by-bucket in parts-per-million fixed point. The
    monitoring primitive a recurring 100 TB ingest runs before
    committing a new snapshot to training.

    Returns one row per OCCUPIED bucket: ``(bucket, cnt_a, cnt_b,
    ppm_a, ppm_b, tvd_ppm_contrib)`` where ``ppm_x = floor(cnt_x *
    1e6 / total_x)`` and ``tvd_ppm_contrib = |ppm_a - ppm_b|`` —
    ``sum(tvd_ppm_contrib) / 2e6`` is the total-variation distance at
    ppm resolution, and per-bucket contributions rank WHICH parts of
    the distribution moved (join back to the gram relation to see the
    tokens). Integer-exact end-to-end: floor division replays
    identically in any engine; no floats, no χ² smoothing constants to
    disagree on.

    Scale shape: each corpus contributes one explode → map-side
    partial-aggregated groupBy down to ≤ n_buckets rows; the compare
    is a full-outer join of two ≤ n_buckets tables (broadcast-sized by
    construction). Totals ride the same aggregate via a window-free
    sum-over-literal-group: the bucket tables are tiny, so the second
    aggregate is free. One empty side fails loudly (its total is 0 and
    the ANSI ppm division aborts) — a drift number against nothing is
    a monitoring bug, not a zero; both-empty yields the empty frame.
    """
    from ..functions.hashing import portable_hash60

    B = int(n_buckets)
    if B < 2:
        raise ValueError(f"n_buckets must be >= 2, got {B}")

    def buckets(frame: DataFrame, name: str) -> DataFrame:
        staged = frame.select(
            tokens(normalize_text(F.col(text_col))).alias("_t"))
        return (staged.select(F.explode("_t").alias("gram"))
                .select(F.pmod(portable_hash60(F.col("gram")),
                               F.lit(B)).alias("bucket"))
                .groupBy("bucket")
                .agg(F.count("*").alias(name)))
    ba = buckets(a, "cnt_a")
    bb = buckets(b, "cnt_b")
    j = (ba.join(bb, "bucket", "full_outer")
         .select("bucket",
                 F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                 F.coalesce("cnt_b", F.lit(0)).alias("cnt_b")))
    # totals as scalar columns over the bucket-sized table (one tiny
    # window-free cross join against a 1-row aggregate)
    tot = j.agg(F.sum("cnt_a").alias("_ta"), F.sum("cnt_b").alias("_tb"))
    out = j.crossJoin(F.broadcast(tot))

    def _fdiv(num, den):
        # exact integer floor-div (the gap_fill pmod trick): a plain
        # floor(x/y) rides a double division whose ulp can flip the
        # floor exactly at integer quotients — where the twin's `//`
        # never does
        return ((num - F.pmod(num, den)) / den).cast("long")

    ppm_a = _fdiv(F.col("cnt_a") * 1_000_000, F.col("_ta"))
    ppm_b = _fdiv(F.col("cnt_b") * 1_000_000, F.col("_tb"))
    return (out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt_a").cast("long").alias("cnt_a"),
        F.col("cnt_b").cast("long").alias("cnt_b"),
        ppm_a.alias("ppm_a"), ppm_b.alias("ppm_b"),
        F.abs(ppm_a - ppm_b).alias("tvd_ppm_contrib")))


def vocab_growth(
    df: DataFrame,
    thresholds: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law evidence) at doc-id
    checkpoints — the corpus-curation saturation signal: if distinct
    types still grow near-linearly in tokens, the corpus is
    under-sampled for its domain; if the curve has bent onto the
    Heaps power law, more of the same data buys mostly repeats.
    Checked BEFORE committing an ingest batch, on the same pass that
    builds the vocabulary.

    One row per checkpoint (inclusive upper bound on ``id_col``):
    ``(threshold, n_docs, n_tokens, n_types, ttr_ppm)`` — cumulative
    docs / token occurrences / distinct types over all docs with id ≤
    threshold, plus the floor-scaled type-token ratio. Fitting K and β
    is a 20-row client-side job on this table; producing the curve is
    the corpus-scale job and lives here.

    Scale shape: NO global window (the running-total formulation is
    the single-task trap): a type's contribution to every checkpoint
    is decided by its FIRST occurrence (min doc id per term — one
    partial-agg groupBy), token totals by per-doc counts (second
    partial agg); each result explodes only against the bounded
    checkpoint array and re-aggregates per checkpoint. Corpus text is
    read once.
    """
    if not thresholds:
        raise ValueError("vocab_growth: thresholds must be non-empty")
    cks = sorted(set(int(t) for t in thresholds))
    ck_arr = F.array(*[F.lit(t).cast("bigint") for t in cks])

    tr = _term_rows(df, id_col, text_col)
    first = tr.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    types = (first
             .select(F.explode(ck_arr).alias("threshold"), "first_doc")
             .where(F.col("first_doc") <= F.col("threshold"))
             .groupBy("threshold")
             .agg(F.count("*").alias("n_types")))
    perdoc = tr.groupBy("doc_id").agg(F.count("*").alias("nt"))
    toks = (perdoc
            .select(F.explode(ck_arr).alias("threshold"), "doc_id", "nt")
            .where(F.col("doc_id") <= F.col("threshold"))
            .groupBy("threshold")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("nt").alias("n_tokens")))
    x = F.col("n_types") * F.lit(1_000_000)
    return (toks.join(types, "threshold", "left")
            .select(F.col("threshold").cast("bigint"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce("n_types", F.lit(0)).cast("long")
                    .alias("n_types"),
                    ((x - F.pmod(x, F.col("n_tokens")))
                     / F.col("n_tokens")).cast("long").alias("ttr_ppm")))


LN2_PPM = 693_147  # floor(10^6 * ln 2)


def zipf_alpha(
    df: DataFrame,
    xmin: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    frac_bits: int = 10,
) -> DataFrame:
    """Zipf/power-law exponent of the term-frequency distribution —
    the one-number language-health gate (natural text sits near α ≈
    2 over frequencies; machine-generated or boilerplate-heavy
    corpora drift off it): the discrete MLE of Clauset-Shalizi-Newman
    2009, α = 1 + n / Σ ln(f_i / (xmin − ½)), over terms with total
    frequency ≥ xmin.

    All arithmetic is the engine-exact integer log2 kernel:
    f/(xmin−½) = 2f/(2·xmin−1), so each term contributes
    ``log2_fp(2f) − log2_fp(2·xmin−1)`` and α converts from bits via
    two ppm floors (same two floors both engines — the ≤2-ulp bias is
    identical cross-engine, which is the property that matters).
    Output is ONE row: ``(n_terms, s_fp, alpha_ppm)`` — s_fp kept so a
    caller can re-derive α at other scalings; no rows when no term
    reaches xmin (a vacuous fit should look missing, not α=1).

    Scale shape: vocabulary() pass (one shuffle on term), then the
    log2 columns stage on the VOCABULARY-sized frame and one global
    partial-agg fold to a single row. int64 audit: n ≤ 2^33 terms and
    s_fp ≥ n (every term contributes ≥ 1 fp unit), so n · 2^frac ·
    10^6 / s_fp ≤ 2^frac · 10^6 — both products stay far inside int64.
    """
    from ..functions.intmath import log2_fp_py, with_log2_fp

    if xmin < 1:
        raise ValueError(f"zipf_alpha: xmin must be >= 1, got {xmin}")
    base = log2_fp_py(2 * xmin - 1, frac_bits)
    v = vocabulary(df, id_col, text_col).where(F.col("total_tf") >= xmin)
    v = v.select((F.col("total_tf") * 2).cast("bigint").alias("f2"))
    v = with_log2_fp(v, "f2", "l2", frac_bits)
    agg = v.agg(F.count("*").alias("n_terms"),
                F.sum(F.col("l2") - F.lit(base)).alias("s_fp"))

    def _floor(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    bits = _floor(F.col("n_terms") * F.lit((2 ** frac_bits) * 1_000_000),
                  F.col("s_fp"))
    return (agg.where(F.col("n_terms") > 0)
            .select(F.col("n_terms").cast("long").alias("n_terms"),
                    F.col("s_fp").cast("long").alias("s_fp"),
                    (F.lit(1_000_000)
                     + _floor(bits * F.lit(1_000_000), F.lit(LN2_PPM)))
                    .alias("alpha_ppm")))


def kneser_ney_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_ppm: int = 750_000,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram surprisal, integer-exact — the
    smoothed upgrade of :func:`bigram_surprisal` (whose raw MLE gives
    rare-but-seen bigrams 0-probability mass nowhere and cannot be
    compared across heads). KenLM's KN smoothing is what CCNet
    actually scores with; this is its bigram member in the module's
    fixed-point discipline:

        P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1) + λ(w1)·Pcont(w2)
        λ(w1)    = D · N1+(w1·)/c(w1)
        Pcont(w2)= N1+(·w2)/N1+(··)

    with D = ``discount_ppm``/10^6 (default 0.75, the textbook
    absolute discount). All ratios are parts-per-million floor
    divisions and the per-bigram surprisal is

        bits_fp = log2fp(10^6) − log2fp(p_ppm)      (1/1024-bit units)

    via the integer log2 kernel, so DuckDB replays every row
    bit-exactly. In exact arithmetic Σ_w2 P(w2|w1) = 1 and each term
    ≤ 1; the ppm floors only shrink terms, so ``p_ppm ≤ 10^6`` and
    bits_fp ≥ 0 always (p_ppm is floored at 1 so the log is defined
    — an all-floors-to-zero bigram scores the 19.93-bit ceiling).

    Plan shape: the corpus is exploded ONCE into per-doc bigram
    partials (the only corpus-sized shuffle); c2/c1/N1+ tables are
    re-aggregations of that tf table (bigram- and head-vocabulary
    sized); the iterative log2 expression runs on the MODEL table
    (vocabulary-sized), never per corpus row; docs join the model on
    the bigram key — vocabulary joins, no fan-out, AQE splits hot
    heads. Self-scoring (model = scored corpus) keeps every bigram
    in-model; an OOV bigram from a foreign corpus would simply not
    join and is dropped from n_bigrams — callers scoring cross-corpus
    should train on the union.

    Returns ``(doc_id, n_bigrams, kn_bits_fp, score_fp)`` with
    ``score_fp = kn_bits_fp div n_bigrams`` (mean 1/1024-bits per
    transition; NULL when a doc has no bigram).
    """
    from ..functions.intmath import log2_fp_py, with_log2_fp

    s = 1_000_000
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    bigrams = F.when(
        F.size(F.col("_t")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("_t")) - 2),
            lambda i: F.struct(
                F.element_at(F.col("_t"), (i + 1).cast("int")).alias("w1"),
                F.element_at(F.col("_t"), (i + 2).cast("int")).alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    tf = (
        staged.select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"),
                F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    )
    c2 = tf.groupBy("w1", "w2").agg(F.sum("tf").cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"),
                              F.count("*").cast("long").alias("n1r"))
    n1l = c2.groupBy("w2").agg(F.count("*").cast("long").alias("n1l"))
    nn = c2.agg(F.count("*").cast("long").alias("nn"))
    d = int(discount_ppm)
    model = (
        c2.join(c1, "w1").join(n1l, "w2").crossJoin(F.broadcast(nn))
        .withColumn("p_ppm", F.greatest(F.lit(1).cast("long"), F.expr(
            f"case when c2 * {s} - {d} > 0"
            f" then (c2 * {s} - {d}) div c1 else 0 end"
            f" + ((({d} * n1r) div c1) * ((n1l * {s}) div nn)) div {s}")))
    )
    log2_s = log2_fp_py(s)
    mb = with_log2_fp(model, "p_ppm", "_l2p").select(
        "w1", "w2", (F.lit(log2_s) - F.col("_l2p")).alias("_bits_fp"))
    per = (
        tf.join(mb, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("n_bigrams"),
             F.sum(F.col("tf") * F.col("_bits_fp")).cast("long")
             .alias("kn_bits_fp"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id")).distinct()
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("kn_bits_fp", F.lit(0)).alias("kn_bits_fp"),
            # pre-coalesce columns: NULL div NULL = NULL for bigram-less
            # docs (a literal 0 div 0 would ANSI-abort)
            F.expr("kn_bits_fp div n_bigrams").alias("score_fp"),
        )
    )


def textrank_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    iterations: int = 4,
) -> DataFrame:
    """TextRank keyword scoring — PageRank over the token adjacency
    graph (Mihalcea & Tarau's w=2 co-occurrence window): corpus-level
    keyword salience that, unlike TF-IDF, rewards words that sit in
    well-connected contexts rather than merely rare ones. A pure
    COMPOSITION: the bigram explode this module already uses feeds
    :func:`..graphrank.pagerank`'s integer fixed-point loop, so the
    result inherits its bit-exact cross-engine replay.

    Scale shape: one corpus explode into adjacent pairs, dedup to the
    vocabulary-sized undirected edge set (both directions, self-pairs
    dropped), then pagerank's vocabulary-sized rounds — the corpus is
    touched exactly once. Returns ``(node, rank_fp)``; callers top-k
    by rank_fp.
    """
    from .graphrank import pagerank

    staged = df.select(
        tokens(normalize_text(F.col(text_col))).alias("_t"))
    pairs = F.when(
        F.size(F.col("_t")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("_t")) - 2),
            lambda i: F.struct(
                F.element_at(F.col("_t"), (i + 1).cast("int")).alias("w1"),
                F.element_at(F.col("_t"), (i + 2).cast("int")).alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    adj = (staged.select(F.explode(pairs).alias("bg"))
           .select(F.col("bg.w1").alias("src"), F.col("bg.w2").alias("dst"))
           .where(F.col("src") != F.col("dst")))
    und = adj.unionByName(
        adj.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(und, iterations=iterations)


def textrank_oracle_sql(docs_cte: str, iterations: int = 4) -> str:
    """DuckDB twin of :func:`textrank_keywords`. ``docs_cte`` must
    yield a ``text`` column; tokenization mirrors tokens()∘
    normalize_text() (the module's shared regex discipline)."""
    from .graphrank import pagerank_oracle_sql

    edges = rf"""
with tk as (
  select list_filter(regexp_split_to_array(
    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
    x -> length(x) > 0) as t
  from ({docs_cte})
),
bg as (
  select unnest(list_transform(generate_series(1, len(t) - 1),
    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) as u
  from tk where len(t) >= 2
),
a as (select u.w1 as src, u.w2 as dst from bg where u.w1 <> u.w2)
select src, dst from a
union all
select dst, src from a
"""
    return pagerank_oracle_sql(edges, iterations=iterations)


def jsd_slices(
    docs: DataFrame,
    slice_col: str,
    text_col: str = "text",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    two named corpus slices — the symmetric, bounded (≤1 bit)
    complement of :func:`corpus_drift`'s binned profile and the
    :func:`~cow_spark.plans.parity.ks_test` score test: JSD reads on
    the TERM axis, so "the new crawl snapshot drifted" comes with
    how-many-bits, comparable across corpora. Slice entropies ride
    along (a collapsing H is mode collapse / dedup failure evidence).

    Everything is exact fixed-point integer math on the
    :mod:`~cow_spark.functions.intmath` log2 kernel (1/1024-bit
    units, bit-identical across engines): with per-term counts
    (c_a, c_b) and totals (n_a, n_b), the mixture numerator
    m = c_a·n_b + c_b·n_a over denominator 2·n_a·n_b gives
    H(M) = L(2·n_a·n_b) − floor(Σ m·L(m) / (2·n_a·n_b)), H(P/Q)
    likewise, and JSD = H(M) − floor((H(P)+H(Q))/2) — a fixed
    sequence of floors, replayed verbatim by the twin. Overflow
    contract: Σ m·L(m) needs n_a·n_b·log2-ish < 2⁶³ ⇒ slice token
    totals ≲ 10⁷ each — SAMPLE bigger slices (a divergence estimate
    gains nothing from the full corpus; ANSI raises loudly).

    Shape: one tokenize scan → term-keyed partial agg to the
    vocabulary-sized count table; the log2 kernel stages integer
    columns on that bounded table; three sums and a 1-row combine.
    Either slice empty ⇒ NULL jsd (no convention hides a dead
    slice). Returns one row ``(n_a, n_b, n_terms, h_a_fp, h_b_fp,
    jsd_fp)``. No reference counterpart; extension §2.11.
    """
    from ..functions.intmath import with_log2_fp

    sl = F.col(slice_col)
    base = (docs.where(sl.isin(a, b))
            .select((sl == a).alias("ga"),
                    F.explode(tokens(normalize_text(F.col(text_col))))
                    .alias("term")))
    v = base.groupBy("term").agg(
        F.sum(F.col("ga").cast("long")).cast("long").alias("ca"),
        F.sum((~F.col("ga")).cast("long")).cast("long").alias("cb"))
    tot = v.agg(F.coalesce(F.sum("ca"), F.lit(0)).cast("long")
                .alias("n_a"),
                F.coalesce(F.sum("cb"), F.lit(0)).cast("long")
                .alias("n_b"),
                F.count("*").cast("long").alias("n_terms")).persist()
    vv = v.crossJoin(F.broadcast(tot.select("n_a", "n_b")))
    vv = vv.withColumn(
        "m", F.col("ca") * F.col("n_b") + F.col("cb") * F.col("n_a"))
    vv = with_log2_fp(vv, "ca", "la")
    vv = with_log2_fp(vv, "cb", "lb")
    vv = with_log2_fp(vv, "m", "lm")
    sums = vv.agg(
        F.coalesce(F.sum(F.col("ca") * F.col("la")), F.lit(0))
        .cast("long").alias("sa"),
        F.coalesce(F.sum(F.col("cb") * F.col("lb")), F.lit(0))
        .cast("long").alias("sb"),
        F.coalesce(F.sum(F.col("m") * F.col("lm")), F.lit(0))
        .cast("long").alias("sm"))
    one = tot.crossJoin(F.broadcast(sums))
    one = with_log2_fp(one.withColumn("_na1", F.col("n_a")),
                       "_na1", "l_na")
    one = with_log2_fp(one.withColumn("_nb1", F.col("n_b")),
                       "_nb1", "l_nb")
    one = with_log2_fp(
        one.withColumn("_nm", 2 * F.col("n_a") * F.col("n_b")),
        "_nm", "l_nm")

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    h_a = F.col("l_na") - fdiv(F.col("sa"), F.col("n_a"))
    h_b = F.col("l_nb") - fdiv(F.col("sb"), F.col("n_b"))
    h_m = (F.col("l_nm")
           - fdiv(F.col("sm"), 2 * F.col("n_a") * F.col("n_b")))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    out = one.select(
        "n_a", "n_b", "n_terms",
        F.when(F.col("n_a") > 0, h_a).cast("long").alias("h_a_fp"),
        F.when(F.col("n_b") > 0, h_b).cast("long").alias("h_b_fp"),
        F.when(ok, h_m - fdiv(h_a + h_b, F.lit(2)))
        .cast("long").alias("jsd_fp"))
    from ..operators.dedup import _attach_persisted
    return _attach_persisted(out, tot)


def jsd_slices_oracle_sql(docs_sql: str, a: str = "a",
                          b: str = "b") -> str:
    """DuckDB twin of :func:`jsd_slices`; ``docs_sql`` yields
    (slice, text). Counts of 0 map to NULL before the log2 kernel
    (the kernel requires v >= 1) and products coalesce to 0 —
    mirroring the Spark side's NULL-for-<1 convention."""
    from ..functions.intmath import log2_fp_sql

    l_ca = log2_fp_sql("nullif(ca, 0)")
    l_cb = log2_fp_sql("nullif(cb, 0)")
    l_m = log2_fp_sql("m")
    l_na = log2_fp_sql("n_a")
    l_nb = log2_fp_sql("n_b")
    l_nm = log2_fp_sql("2 * n_a * n_b")
    return rf"""
with tk as materialized (
  select (slice = '{a}') as ga,
         unnest(list_filter(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
           x -> length(x) > 0)) as term
  from ({docs_sql}) where slice in ('{a}', '{b}')),
v as materialized (
  select term,
         cast(sum(case when ga then 1 else 0 end) as bigint) as ca,
         cast(sum(case when ga then 0 else 1 end) as bigint) as cb
  from tk group by term),
tot as materialized (
  select cast(coalesce(sum(ca), 0) as bigint) as n_a,
         cast(coalesce(sum(cb), 0) as bigint) as n_b,
         cast(count(*) as bigint) as n_terms from v),
vv as materialized (
  select ca, cb, ca * n_b + cb * n_a as m, n_a, n_b
  from v cross join tot),
sums as materialized (
  select cast(coalesce(sum(ca * coalesce({l_ca}, 0)), 0) as bigint)
           as sa,
         cast(coalesce(sum(cb * coalesce({l_cb}, 0)), 0) as bigint)
           as sb,
         cast(coalesce(sum(m * {l_m}), 0) as bigint) as sm
  from vv),
one as (
  select n_a, n_b, n_terms, sa, sb, sm,
         case when n_a > 0 then {l_na} end as l_na,
         case when n_b > 0 then {l_nb} end as l_nb,
         case when n_a > 0 and n_b > 0 then {l_nm} end as l_nm
  from tot cross join sums)
select n_a, n_b, n_terms,
  cast(case when n_a > 0 then l_na - sa // n_a end as bigint)
    as h_a_fp,
  cast(case when n_b > 0 then l_nb - sb // n_b end as bigint)
    as h_b_fp,
  cast(case when n_a > 0 and n_b > 0 then
    (l_nm - sm // (2 * n_a * n_b))
    - ((l_na - sa // n_a) + (l_nb - sb // n_b)) // 2 end as bigint)
    as jsd_fp
from one
"""


def unk_rate(
    df: DataFrame,
    vocab_size: int = 30_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    by_col: str | None = None,
) -> DataFrame:
    """UNK-rate estimate under a top-K vocabulary — the tokenizer
    sizing question asked before committing a vocab: if we keep only
    the K most frequent terms, what fraction of each slice's tokens
    become ``<unk>``? A slice whose unk_ppm is 3× the corpus mean is
    under-served by the shared vocabulary (the multilingual-tokenizer
    fairness audit in one number).

    The vocabulary is the global top-``vocab_size`` terms by total
    frequency, ties broken by term ascending (the K-boundary must be
    deterministic or two engines disagree on which tied term is in).
    unk_ppm = (n_unk·10^6) div n_tokens, exact.

    Scale shape: one tokenize scan → term-frequency combine
    (vocabulary-sized), distributed top-K sort-limit, then the chosen
    vocab broadcasts back onto a second tokenize pass — two scans, no
    corpus shuffle beyond the term combine; per-slice output. Returns
    (slice, n_tokens, n_unk, unk_ppm) — ``slice`` is '(all)' when
    ``by_col`` is None.
    """
    from ..functions.text import normalize_text, tokens

    slice_col = (F.col(by_col).cast("string")
                 if by_col else F.lit("(all)"))
    toks = df.select(
        slice_col.alias("slc"),
        F.explode(tokens(normalize_text(F.col(text_col))))
        .alias("term"))
    vocab = (toks.groupBy("term")
             .agg(F.count(F.lit(1)).alias("tf"))
             .orderBy(F.col("tf").desc(), F.col("term").asc())
             .limit(vocab_size)
             .select("term", F.lit(True).alias("_in")))
    joined = toks.join(F.broadcast(vocab), "term", "left")
    agg = joined.groupBy("slc").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
        .cast("long").alias("n_unk"))
    return agg.select(
        F.col("slc").alias("slice"), "n_tokens", "n_unk",
        F.expr("(n_unk * 1000000) div n_tokens").cast("long")
        .alias("unk_ppm"))


def unk_rate_oracle_sql(docs_sql: str, vocab_size: int) -> str:
    """DuckDB twin of :func:`unk_rate`; ``docs_sql`` yields
    (slc, text)."""
    return f"""
with tok as (
  select slc,
         unnest(list_filter(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
           x -> length(x) > 0)) as term
  from ({docs_sql})),
vocab as (
  select term from (
    select term, count(*) as tf from tok group by term
    order by tf desc, term asc limit {vocab_size})),
agg as (
  select slc, cast(count(*) as bigint) as n_tokens,
         cast(sum(case when vocab.term is null then 1 else 0 end)
              as bigint) as n_unk
  from tok left join vocab on tok.term = vocab.term
  group by slc)
select slc as slice, n_tokens, n_unk,
       cast((n_unk * 1000000) // n_tokens as bigint) as unk_ppm
from agg
"""


def vocab_richness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chao1 species-richness estimate + Good-Turing unseen-mass for
    the corpus vocabulary — the OTHER saturation question next to
    :func:`vocab_growth`: the growth curve says how fast types are
    still arriving; these estimators say how many types the corpus
    has NOT seen yet (Chao1's lower bound on the true vocabulary from
    singleton/doubleton counts) and what probability mass the next
    sampled token gives to novel types (Turing's f1/N). Both are
    computed from the frequency-of-frequencies profile tokenizer
    training and DSIR-style importance estimates already need, on the
    same one-pass counts.

    One output row, bias-corrected Chao1 (finite at f2=0):

    - ``chao1_types`` = V + (f1·(f1−1)) div (2·(f2+1)) — whole types,
      unscaled (the correction term's grain; int64-safe to f1≈3e9);
    - ``gt_unseen_ppm`` = (f1·10^6) div N — Good-Turing P(next token
      is a new type); ``coverage_ppm`` = 10^6 − that.

    Empty corpus → one row of zero counts with unseen 0 / coverage
    10^6 (the repo's zero-denominator convention), so a gate on this
    table never NULL-crashes.

    Scale shape: tokens → term counts (one partial-agg shuffle on
    term) → frequency-of-frequencies (second shuffle, bounded by the
    count of DISTINCT counts ≪ V) → a 1-row conditional aggregate.
    Corpus text is read once; nothing corpus-sized crosses the second
    shuffle.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    counts = (_term_rows(df, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("c")))
    fof = counts.groupBy("c").agg(F.count("*").alias("f"))
    agg = fof.agg(
        F.coalesce(F.sum(F.expr("c * f")), F.lit(0)).cast("long")
        .alias("n_tokens"),
        F.coalesce(F.sum("f"), F.lit(0)).cast("long").alias("n_types"),
        F.coalesce(F.sum(F.when(F.col("c") == 1, F.col("f"))),
                   F.lit(0)).cast("long").alias("f1"),
        F.coalesce(F.sum(F.when(F.col("c") == 2, F.col("f"))),
                   F.lit(0)).cast("long").alias("f2"))
    unseen = F.expr("if(n_tokens = 0, 0, (f1 * 1000000) div n_tokens)")
    return agg.select(
        "n_tokens", "n_types", "f1", "f2",
        (F.col("n_types")
         + F.expr("(f1 * (f1 - 1)) div (2 * (f2 + 1))"))
        .cast("long").alias("chao1_types"),
        unseen.cast("long").alias("gt_unseen_ppm"),
        (F.lit(1_000_000) - unseen).cast("long").alias("coverage_ppm"))


def vocab_richness_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`vocab_richness`; ``docs_sql`` yields
    ``(doc_id, text)`` and the tokenizer is the shared lowercased-
    whitespace split."""
    return rf"""
with tr as (
  select unnest(list_filter(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
           x -> length(x) > 0)) as term
  from ({docs_sql})),
counts as (select term, cast(count(*) as bigint) as c
           from tr group by term),
fof as (select c, cast(count(*) as bigint) as f from counts group by c),
agg as (
  select cast(coalesce(sum(c * f), 0) as bigint) as n_tokens,
         cast(coalesce(sum(f), 0) as bigint) as n_types,
         cast(coalesce(sum(case when c = 1 then f end), 0) as bigint)
           as f1,
         cast(coalesce(sum(case when c = 2 then f end), 0) as bigint)
           as f2
  from fof)
select n_tokens, n_types, f1, f2,
       cast(n_types + (f1 * (f1 - 1)) // (2 * (f2 + 1)) as bigint)
         as chao1_types,
       cast(case when n_tokens = 0 then 0
                 else (f1 * 1000000) // n_tokens end as bigint)
         as gt_unseen_ppm,
       cast(1000000 - case when n_tokens = 0 then 0
                 else (f1 * 1000000) // n_tokens end as bigint)
         as coverage_ppm
from agg
"""


def distinct_ngrams(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-1 / distinct-2 lexical-diversity ratios per corpus
    slice — the standard mode-collapse screen for GENERATED text
    (distillation outputs, synthetic corpora, model-vs-model slices):
    a slice whose generations reuse the same phrasing scores low on
    distinct bigrams long before a human notices, and comparing
    slices (model version, temperature, source) is the point, hence
    the ``group_col``. Complements :func:`~cow_spark.operators.
    quality.repetition_stats` (WITHIN-doc repetition) by measuring
    ACROSS-doc phrase reuse inside a slice.

    Per slice: ``distinct1_ppm`` = 10^6·|distinct unigrams|/unigram
    occurrences, ``distinct2_ppm`` = same over within-doc adjacent
    bigrams (bigrams never span documents), plus the raw counts.
    Slices with no bigram (every doc < 2 tokens) report 0 — the
    zero-denominator convention, and honest: no bigram evidence means
    no diversity evidence.

    Scale shape: one posexplode of the shared tokenizer's array feeds
    BOTH grams (the Generate boundary keeps the token expression from
    being re-inlined into a per-element lambda — the CLAUDE.md HOF
    rule); bigram = token joined to its within-doc successor by ONE
    (slice, doc)-keyed window lead, so a document's grams never leak
    across slices or documents. Input contract: one row per
    (group, id) — a duplicated id within a slice would interleave two
    token streams (the SQL twin is per-row and would diverge; the
    repo's fixtures and any sane corpus satisfy this). Each gram
    stream partial-aggregates on (slice, gram) then reduces to the
    slice-bounded output.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    toks = df.select(
        F.col(group_col).alias("slc"),
        F.col(id_col).alias("_did"),
        F.posexplode(tokens(normalize_text(F.col(text_col))))
        .alias("pos", "term"))
    uni = (toks.groupBy("slc", "term").agg(F.count("*").alias("n"))
           .groupBy("slc").agg(
               F.sum("n").cast("long").alias("n_unigrams"),
               F.count("*").cast("long").alias("types1")))
    w = Window.partitionBy("slc", "_did").orderBy("pos")
    bg = (toks.withColumn("_t2", F.lead("term").over(w))
          .where(F.col("_t2").isNotNull())
          .select("slc", F.concat_ws("\x1f", "term", "_t2")
                  .alias("gram")))
    bi = (bg.groupBy("slc", "gram").agg(F.count("*").alias("n"))
          .groupBy("slc").agg(
              F.sum("n").cast("long").alias("n_bigrams"),
              F.count("*").cast("long").alias("types2")))
    d1 = F.expr("if(n_unigrams = 0, 0,"
                " (types1 * 1000000) div n_unigrams)")
    d2 = F.expr("if(coalesce(n_bigrams, 0) = 0, 0,"
                " (types2 * 1000000) div n_bigrams)")
    return (uni.join(bi, "slc", "left")
            .select(F.col("slc").alias("slice"),
                    "n_unigrams", "types1",
                    F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce("types2", F.lit(0)).cast("long")
                    .alias("types2"),
                    d1.cast("long").alias("distinct1_ppm"),
                    d2.cast("long").alias("distinct2_ppm")))


def distinct_ngrams_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`distinct_ngrams`; ``docs_sql`` yields
    ``(slc, doc_id, text)``."""
    return rf"""
with tk as (
  select slc, doc_id,
         list_filter(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
           x -> length(x) > 0) as t
  from ({docs_sql})),
uni_rows as (select slc, unnest(t) as term from tk),
uni as (
  select slc, cast(sum(n) as bigint) as n_unigrams,
         cast(count(*) as bigint) as types1
  from (select slc, term, count(*) as n from uni_rows
        group by slc, term) group by slc),
bg_rows as (
  select slc, unnest(list_transform(generate_series(1, len(t) - 1),
           i -> t[i] || chr(31) || t[i + 1])) as gram
  from tk where len(t) >= 2),
bi as (
  select slc, cast(sum(n) as bigint) as n_bigrams,
         cast(count(*) as bigint) as types2
  from (select slc, gram, count(*) as n from bg_rows
        group by slc, gram) group by slc)
select uni.slc as slice, n_unigrams, types1,
       cast(coalesce(n_bigrams, 0) as bigint) as n_bigrams,
       cast(coalesce(types2, 0) as bigint) as types2,
       cast(case when n_unigrams = 0 then 0
                 else (types1 * 1000000) // n_unigrams end as bigint)
         as distinct1_ppm,
       cast(case when coalesce(n_bigrams, 0) = 0 then 0
                 else (types2 * 1000000) // n_bigrams end as bigint)
         as distinct2_ppm
from uni left join bi on uni.slc = bi.slc
"""
