"""Corpus-shaping operators: sequence packing and stratified sampling.

Training-data pipeline stages with no reference counterpart (extension
family, SURVEY.md §2.9). Both are pure DataFrame plans — no Python
boundary — and both are deterministic functions of the input, so the
DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash60
from ..functions.intmath import with_log2_fp
from ..functions.text import token_count


def pack_sequences(
    df: DataFrame,
    context: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    shard_col: Column | None = None,
) -> DataFrame:
    """GPT-style concat-and-split packing plan: documents are laid end to
    end in a deterministic order and cut every ``context`` tokens; a
    document may span a window boundary (that's the concat-and-split
    contract — no padding, no bin re-fitting).

    Returns one row per document:
      (doc_id, shard, n_tokens, start_off, bin_first, bin_last, n_bins)
    where ``start_off`` is the document's first token offset within its
    shard's stream and ``bin_*`` are the context-window indices it
    touches. A writer materializes window ``b`` of shard ``s`` by taking
    every doc with ``bin_first <= b <= bin_last`` — an equi-range lookup.

    Scale shape: one window function per shard, partitioned BY shard —
    the stream order inside a shard is inherently sequential (each
    offset depends on every predecessor), so parallelism comes from
    sharding, exactly like a 1000-executor packing job would split a
    100 TB corpus into thousands of independent streams. ``n_shards``
    is the parallelism knob; default shard key is ``pmod(id, n_shards)``
    (portable to the oracle), override ``shard_col`` for hash sharding
    on non-numeric ids.
    """
    shard = (shard_col if shard_col is not None
             else F.pmod(F.col(id_col), F.lit(n_shards))).cast("int")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    # integer `div`, not double /: past ~2^52/context cumulative tokens
    # a double quotient's ulp exceeds 1/context and floor() can land on
    # the wrong window (the repo's bit-exact arithmetic convention —
    # same as terms.py/graphrank.py). `div` truncates toward zero where
    # DuckDB's // floors, but the only negative operand here is end-1
    # == -1 (an empty doc opening a shard), and greatest() clamps that
    # case to bin_first == 0 in both engines.
    staged = base.withColumn("_end", F.sum("n_tokens").over(w))
    return staged.select(
        "doc_id", "shard", "n_tokens",
        (F.col("_end") - F.col("n_tokens")).alias("start_off"),
        F.expr(f"(_end - n_tokens) div {context}").cast("long")
         .alias("bin_first"),
        # empty docs occupy no tokens: clamp so bin_last >= bin_first
        F.greatest(
            F.expr(f"(_end - 1) div {context}"),
            F.expr(f"(_end - n_tokens) div {context}"),
        ).cast("long").alias("bin_last"),
    ).withColumn(
        "n_bins", (F.col("bin_last") - F.col("bin_first") + 1).cast("long")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "v1",
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling for corpus
    rebalancing (e.g. downweight a crawl source, keep all of a curated
    one): a document survives iff
    ``hash(id, salt) mod precision < rate[stratum] * precision``.

    Hash-based (md5, cross-engine) rather than ``rand()``: the sample is
    reproducible across runs, engines, and retries — a retried task
    re-derives the identical sample, which `rand()` cannot promise.
    One linear scan, no shuffle; the rates map travels as a literal
    CASE expression (vocabulary-sized), never a join.
    """
    u = F.pmod(
        portable_hash60(F.concat_ws("\x1f",
                                    F.col(id_col).cast("string"),
                                    F.lit(salt))),
        F.lit(precision),
    )
    thresh = F.lit(int(default_rate * precision))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == stratum,
                        F.lit(int(rate * precision))).otherwise(thresh)
    return df.where(u < thresh)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-window document chunking (the RAG / embedding-index prep
    stage): each document is split into windows of ``chunk_tokens``
    whitespace tokens advancing by ``chunk_tokens - overlap``, so
    consecutive chunks share ``overlap`` tokens of context. Unlike
    :func:`pack_sequences` (which concatenates documents and cuts at
    context boundaries for pre-training), chunking never crosses a
    document boundary — each chunk embeds/retrieves standalone.

    Returns (doc_id, chunk_idx, start_tok, n_tok, chunk_text):
    0-based ``chunk_idx``/``start_tok``; the final chunk may be short
    but is only emitted when it adds tokens beyond the previous chunk's
    coverage (every token appears in ≥1 chunk; a document with ≤
    ``chunk_tokens`` tokens yields exactly one chunk). ``chunk_text``
    is rebuilt from the whitespace-normalized tokens — byte-exact
    original spans don't survive tokenization and retrieval corpora
    don't need them. Empty/NULL documents yield no chunks (nothing to
    embed); keep the corpus table for the full id set.

    Scale shape: per-row explode, ZERO shuffles — chunking pipelines
    with the scan and any downstream per-chunk map. The token array is
    staged as a real column before the window transform (interpreted
    HOF lambdas re-evaluate captured subtrees per element, CLAUDE.md);
    fan-out is bounded by n_tokens/stride, so skew follows document
    length — cap upstream with the quality gate's max_tokens rule.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from ..functions.text import normalize_text, tokens

    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_tok"),
    ).withColumn("_n", F.size("_tok"))
    # chunk starts: 0, stride, 2*stride, ... while start < n AND the
    # chunk extends coverage (start + overlap < n, i.e. start <= n-1-overlap)
    n_chunks = F.when(
        F.col("_n") > 0,
        # greatest(1, ...): a doc with 0 < n <= overlap tokens still
        # yields its one (short) chunk — the floor() term goes negative
        F.greatest(
            F.lit(1),
            F.floor((F.col("_n") - F.lit(overlap + 1)) / F.lit(stride))
            .cast("int") + F.lit(1)),
    ).otherwise(F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride).cast("int").alias("start_tok"),
            F.least(F.lit(chunk_tokens),
                    F.col("_n") - i * stride).cast("int").alias("n_tok"),
            F.concat_ws(
                " ",
                F.slice(F.col("_tok"), (i * stride + 1).cast("int"),
                        chunk_tokens),
            ).alias("chunk_text"),
        ),
    )
    return (
        base.where(F.col("_n") > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.start_tok", "c.n_tok",
                "c.chunk_text")
    )


_NULL_STRATUM = "\x00"  # NULL strata form their own group (join keys drop NULL)


def _pow_alpha(n: Column, alpha: float) -> Column:
    """``n ** alpha`` with IEEE-exact evaluation for the alphas that
    matter: sqrt is correctly rounded by both the JVM and libm (IEEE 754
    mandate), so any alpha expressible as a sqrt chain replays bit-for-
    bit in the DuckDB oracle. Other alphas fall back to ``pow`` (libm,
    not correctly rounded — engines may differ in the last ulp)."""
    if alpha == 0.0:
        return F.lit(1.0)
    if alpha == 1.0:
        return n
    chain = {0.5: 1, 0.25: 2, 0.125: 3}.get(alpha)
    if chain is not None:
        for _ in range(chain):
            n = F.sqrt(n)
        return n
    return F.pow(n, F.lit(alpha))


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.5,
    target: int | None = None,
    strata_col: str = "source",
    w_scale: int = 1000,
    precision: int = 1_000_000,
) -> DataFrame:
    """Per-stratum sampling rates for multinomial temperature sampling
    (mT5 / XLM-R corpus rebalancing): stratum mass ``p_s ∝ n_s**alpha``,
    so ``alpha=1`` preserves the natural distribution, ``alpha=0`` gives
    every stratum equal mass, and the usual ``alpha≈0.5`` upweights
    low-resource strata (languages) relative to their size. The
    per-document Bernoulli rate that realizes an expected ``target``
    total is ``min(1, target * p_s / n_s)``.

    Returns ``(stratum, n_docs, w_fp, rate_fp)`` — one row per stratum
    (vocabulary-sized). Determinism discipline: ``w_fp = floor(n**alpha
    * w_scale)`` is integer (sqrt-chain alphas are IEEE-exact), its sum
    is exact bigint, and the final rate is a single fixed op-order
    double expression floor-scaled to ``rate_fp`` — the DuckDB oracle
    replays every step bit-for-bit. ``target=None`` rebalances at the
    corpus' own size (target = Σ n_s).

    Scale shape: one partial-agg count per stratum (the only shuffle,
    output vocabulary-sized), totals via a broadcast single-row cross
    join — the corpus table itself is never widened or re-sorted.
    """
    strat = F.coalesce(F.col(strata_col).cast("string"),
                       F.lit(_NULL_STRATUM))
    counts = df.groupBy(strat.alias("stratum")).agg(
        F.count("*").alias("n_docs"))
    w = counts.withColumn(
        "w_fp",
        F.floor(_pow_alpha(F.col("n_docs").cast("double"), alpha)
                * w_scale).cast("bigint"))
    tot = w.agg(F.sum("w_fp").alias("_sumw"),
                F.sum("n_docs").alias("_total"))
    tgt = (F.col("_total") if target is None
           else F.lit(int(target))).cast("double")
    rate = F.least(
        (tgt * F.col("w_fp").cast("double"))
        / (F.col("_sumw").cast("double") * F.col("n_docs").cast("double")),
        F.lit(1.0))
    return w.crossJoin(F.broadcast(tot)).select(
        "stratum", "n_docs", "w_fp",
        F.floor(rate * precision).cast("bigint").alias("rate_fp"))


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    target: int | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "v1",
    w_scale: int = 1000,
    precision: int = 1_000_000,
) -> DataFrame:
    """Multinomial temperature sampling: rebalance a corpus across its
    strata (typically languages or crawl sources) so stratum mass
    follows ``n**alpha``, realized as deterministic hash-based Bernoulli
    sampling per document (same reproducible-across-retries contract as
    :func:`stratified_sample`, which takes caller-chosen rates — here
    the rates come from the corpus' own distribution).

    Returns the surviving rows of ``df`` plus the ``rate_fp`` applied.
    Two passes over the corpus: a column-pruned count pass (one
    vocabulary-sized shuffle) and the filter pass with the rates table
    broadcast — no corpus-side shuffle, no window.
    """
    rates = temperature_rates(df, alpha, target, strata_col,
                              w_scale, precision)
    u = F.pmod(
        portable_hash60(F.concat_ws("\x1f",
                                    F.col(id_col).cast("string"),
                                    F.lit(salt))),
        F.lit(precision),
    )
    strat = F.coalesce(F.col(strata_col).cast("string"),
                       F.lit(_NULL_STRATUM))
    return (
        df.withColumn("_strat", strat)
        .join(F.broadcast(rates),
              F.col("_strat") == rates["stratum"], "inner")
        .where(u < F.col("rate_fp"))
        .drop("_strat", "stratum", "n_docs", "w_fp")
    )


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "split-v1",
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment with a leakage guard:
    each row gets ``split`` from ``hash(key, salt) mod precision``
    against the cumulative fraction thresholds. The key is
    ``group_col`` when given — pass a duplicate-group id (exact
    fingerprint, or a canonical id from ``near_duplicate_groups``) and
    every member of a duplicate cluster lands in the SAME split, the
    standard guard against test-set contamination by near-copies of
    training documents. NULL group keys (e.g. NULL-text docs with no
    fingerprint) fall back to the row id.

    Hash-based, not ``rand()``: reproducible across runs, engines, and
    task retries, and stable under corpus growth (adding documents
    never reassigns existing keys — the property folds/date-based
    splits lack). Fractions are applied at ``precision`` resolution
    via literal thresholds; one linear scan, zero shuffles, no join.

    Returns the input plus a ``split`` column.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = (F.coalesce(F.col(group_col).cast("string"),
                      F.col(id_col).cast("string"))
           if group_col else F.col(id_col).cast("string"))
    u = F.pmod(portable_hash60(F.concat_ws("\x1f", key, F.lit(salt))),
               F.lit(precision))
    # cumulative integer thresholds in the dict's insertion order —
    # deterministic split boundaries independent of float summation fuzz
    expr = None
    cum = 0
    names = list(fractions)
    for name in names[:-1]:
        cum += int(round(fractions[name] * precision))
        branch = F.when(u < cum, F.lit(name))
        expr = branch if expr is None else expr.when(u < cum, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


WSAMPLE_SALT = "wsample-v1"
_LOG2_60BITS = 60 << 10  # log2_fp of the hash range 2^60
_WS_PREC = 1_000_000


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = WSAMPLE_SALT,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: exactly
    ``k`` rows where a row's inclusion odds scale with its integer
    weight (quality score, token count, source priority) — the
    Efraimidis-Spirakis A-Res scheme with hash randomness.

    A-Res keeps the k largest ``u^(1/w)`` keys for uniform u. Ordering
    by that is ordering by ``-ln(u)/w`` ascending, and with
    ``u = h / 2^60`` from the portable md5 hash, ``-log2(u) =
    60<<10 - log2_fp(h)`` on the repo's integer log2 kernel — so the
    rank is pure integer arithmetic, reproducible across runs, task
    retries, and engines (sample-membership diffs between engines are
    the classic irreproducibility bug this kills). ln vs log2 is a
    constant factor shared by every row: the ORDER is identical, so
    the sample is exactly A-Res's.

    Scale shape: one map-side rank expression + TakeOrdered top-k — no
    global sort, no shuffle beyond the k-row collect tree. Weights
    must be positive integers (floor-scale floats first — float
    weights would put libm in the rank); NULL/non-positive weights are
    rejected loudly rather than silently excluded.

    Returns the sampled rows with their ``rank_fp`` (audit column).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("bigint")
    guard = df.where(w.isNull() | (w <= 0)).limit(1).collect()
    if guard:
        raise ValueError(
            f"weighted_sample requires positive integer weights; found "
            f"{weight_col}={guard[0][weight_col]!r} "
            f"(row {id_col}={guard[0][id_col]!r})")
    h = F.greatest(
        portable_hash60(F.concat_ws(
            "\x1f", F.col(id_col).cast("string"), F.lit(salt))),
        F.lit(1))  # h=0 (p=2^-60) would send log2_fp to NULL
    staged = with_log2_fp(df.withColumn("_h", h), "_h", "_l2h")
    rank = F.expr(f"(({_LOG2_60BITS} - _l2h) * {_WS_PREC}) div "
                  f"cast({weight_col} as bigint)")
    return (staged.withColumn("rank_fp", rank)
            .drop("_h", "_l2h")
            .orderBy(F.col("rank_fp").asc(), F.col(id_col).asc())
            .limit(k))


def weighted_sample_py(rows, k, salt: str = WSAMPLE_SALT):
    """Pure-Python twin over (id, weight) pairs: returns the sampled
    ids in rank order."""
    import hashlib

    from ..functions.intmath import log2_fp_py

    ranked = []
    for rid, w in rows:
        h = max(int(hashlib.md5(
            f"{rid}\x1f{salt}".encode()).hexdigest()[:15], 16), 1)
        rank = (_LOG2_60BITS - log2_fp_py(h)) * _WS_PREC // int(w)
        ranked.append((rank, rid))
    return [rid for _, rid in sorted(ranked)[:k]]


def split_leakage(
    assignments: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Split-leakage audit — the check that closes the dedup → split
    pipeline: :func:`hash_split` documents that keying the hash on a
    duplicate-cluster representative keeps near-duplicates in one
    split; THIS verifies that property on the actual assignment
    (whatever produced it), because a train/test boundary that a
    near-duplicate pair straddles is silent eval contamination —
    exactly what decontamination screens for against EXTERNAL
    benchmarks, applied to the corpus's own held-out split.

    One row per LEAKY cluster (≥ 2 distinct splits among its members):
    ``(cluster_id, n_docs, n_splits, splits)`` with ``splits`` the
    sorted distinct split list space-joined (bounded by the split
    vocabulary). Clean corpora return 0 rows — emptiness IS the pass
    signal, and the audit table is the worklist otherwise (re-split or
    drop those clusters). Docs absent from ``clusters`` are singleton
    clusters by definition and cannot leak — the inner join drops them
    deliberately.

    Scale shape: one equi-join of two corpus-scale projections on the
    id (column-pruned to 2 columns each side), then one
    partial-aggregated groupBy(cluster) with a collect_set bounded by
    the split vocabulary (a handful), filtered to violations. No
    windows, no Python.
    """
    a = assignments.select(F.col(id_col).alias("_id"),
                           F.col(split_col).alias("_split"))
    c = clusters.select(F.col(id_col).alias("_id"),
                        F.col(cluster_col).alias("cluster_id"))
    return (a.join(c, "_id")
            .groupBy("cluster_id")
            .agg(F.count("*").alias("n_docs"),
                 F.array_sort(F.collect_set("_split")).alias("_splits"))
            .where(F.size("_splits") >= 2)
            .select("cluster_id",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.size("_splits").cast("int").alias("n_splits"),
                    F.array_join("_splits", " ").alias("splits")))


def score_calibrate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group rank calibration of a quality score — the step
    between per-source scoring (:mod:`..operators.quality`,
    classifier_score, lm_surprisal) and a GLOBAL threshold: raw
    scores aren't comparable across sources/languages (a surprisal of
    500 means different things in en and zh), so each score is mapped
    to its within-group percentile and the global gate cuts on that.
    Quantile normalization, kept integer-exact.

    One row per input row: ``(<id_col>, <group_col>, <score_col>,
    pct_ppm)`` with ``pct_ppm = (rank − 1) · 10⁶ // (n − 1)`` (the SQL
    percent_rank definition under min-rank ties, floor-divided instead
    of float — Spark's percent_rank returns a double whose last ulp
    is not a cross-engine contract). Single-row groups get 0 (the
    percent_rank convention); NULL scores sort FIRST (rank lowest =
    worst, deterministic in both engines via NULLS FIRST).

    Scale shape: ONE window shuffle keyed on the group (rank and the
    group count share the same sort); group count = source/language
    vocabulary × rows, the healthy many-small-groups case. No joins,
    no Python.
    """
    # rank() over the score ALONE: tied scores must share the min
    # rank (the percent_rank contract) — an id tiebreaker would split
    # them; rank() is deterministic under ties by definition
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc_nulls_first())
    cnt = F.count("*").over(
        Window.partitionBy(group_col)
        .rowsBetween(Window.unboundedPreceding,
                     Window.unboundedFollowing))
    num = (F.rank().over(w) - 1).cast("long") * F.lit(1_000_000)
    den = F.greatest((cnt - 1).cast("long"), F.lit(1))
    return df.select(
        id_col, group_col, score_col,
        ((num - F.pmod(num, den)) / den).cast("long").alias("pct_ppm"))


def reliability_curve(
    scored: DataFrame,
    score_col: str = "score_ppm",
    outcome_col: str = "outcome",
    n_bins: int = 10,
) -> DataFrame:
    """Calibration reliability curve of a probability-like score
    (ppm-scaled, 0..10⁶) against a boolean outcome — the diagram
    behind "the classifier says 0.9 but is right 60% of the time":
    per equal-width confidence bin, predicted confidence vs observed
    accuracy, both exact ppm. :func:`score_calibrate` fixes ranks
    within groups; this audits the absolute scale — together they're
    the two calibration tools a scored corpus gate needs (cut
    thresholds mean nothing on a mis-calibrated scale).

    Bin = min(n_bins−1, floor(score·n_bins/10⁶)) so the 10⁶ endpoint
    folds into the last bin instead of minting an n_bins+1-th.
    Exactness: mean confidence = floor(Σscore/n), accuracy =
    floor(pos·10⁶/n) — single floors over exact integer sums.

    Shape: one scan, one n_bins-sized partial agg. Empty bins are
    absent (callers plotting left-join a static bin frame — absence
    IS the signal that a confidence region is unpopulated).

    Returns ``(bin, n, conf_ppm, acc_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    s = F.col(score_col).cast("long")
    o = F.col(outcome_col).cast("boolean")
    nb = F.lit(int(n_bins))
    num = s * nb
    den = F.lit(1_000_000)
    binc = F.least(nb - 1,
                   ((num - F.pmod(num, den)) / den).cast("long"))
    base = (scored.where(s.isNotNull() & o.isNotNull())
            .select(binc.alias("bin"), s.alias("s"),
                    o.cast("long").alias("pos")))
    g = base.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("ssum"),
        F.sum("pos").cast("long").alias("npos"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    return (g.select(
        "bin", "n",
        fdiv(F.col("ssum"), F.col("n")).alias("conf_ppm"),
        fdiv(F.col("npos") * F.lit(1_000_000), F.col("n"))
        .alias("acc_ppm")))


def reliability_curve_oracle_sql(scored_sql: str,
                                 n_bins: int = 10) -> str:
    """DuckDB twin of :func:`reliability_curve`; ``scored_sql``
    yields (s, outcome)."""
    nb = int(n_bins)
    return f"""
with base as materialized (
  select least({nb} - 1, (cast(s as bigint) * {nb}) // 1000000)
           as bin,
         cast(s as bigint) as s,
         case when outcome then 1 else 0 end as pos
  from ({scored_sql}) where s is not null and outcome is not null)
select bin, cast(count(*) as bigint) as n,
       cast(sum(s) // count(*) as bigint) as conf_ppm,
       cast((sum(pos) * 1000000) // count(*) as bigint) as acc_ppm
from base group by bin
"""


def mixture_allocate(
    sources: DataFrame,
    source_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder apportionment of an integer token budget over
    weighted sources — the "how many tokens from each domain" step of
    a mixture recipe. Every source gets ``floor(w·B/W)``; the leftover
    ``B − Σfloor`` goes one token each to the largest remainders
    (ties broken by source id ascending), so ``Σ quota = B`` exactly
    and the allocation is deterministic.

    Scale shape: the sources table is mixture-dimension-sized (one row
    per domain/shard, thousands not billions), so the two 1-row
    aggregates broadcast and the single unpartitioned remainder-rank
    window is cheap by contract. The corpus itself never enters —
    callers aggregate weights upstream. Overflow: ``w·B`` must stay
    under int64 (ANSI aborts loudly past it); with per-source token
    weights ≤ 10^12 that allows budgets to ~9·10^6 × the largest
    weight.

    ``W = 0`` (all weights zero/filtered) allocates nothing rather
    than dividing by zero. Returns ``(source, weight, quota)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    b = F.lit(int(budget)).cast("long")
    base = (sources
            .where(F.col(weight_col).isNotNull()
                   & (F.col(weight_col) >= 0))
            .select(F.col(source_col).alias("source"),
                    F.col(weight_col).cast("long").alias("weight")))
    tot = base.agg(F.coalesce(F.sum("weight"), F.lit(0))
                   .cast("long").alias("wsum"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    wd = base.crossJoin(F.broadcast(tot))
    q0 = (wd.select(
        "source", "weight", "wsum",
        F.when(F.col("wsum") > 0,
               fdiv(F.col("weight") * b, F.col("wsum")))
        .otherwise(F.lit(0)).cast("long").alias("quota0"),
        F.when(F.col("wsum") > 0,
               F.pmod(F.col("weight") * b, F.col("wsum")))
        .otherwise(F.lit(0)).cast("long").alias("rem")))
    left = q0.agg(
        (b - F.coalesce(F.sum("quota0"), F.lit(0)))
        .cast("long").alias("leftover"),
        F.max("wsum").alias("wsum_max"))
    rk = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = (q0.withColumn("rk",
                            F.row_number().over(rk).cast("long"))
              .crossJoin(F.broadcast(left)))
    return ranked.select(
        "source", "weight",
        (F.col("quota0")
         + F.when((F.col("wsum_max") > 0)
                  & (F.col("rk") <= F.col("leftover")),
                  F.lit(1)).otherwise(F.lit(0)))
        .cast("long").alias("quota"))


def mixture_allocate_oracle_sql(sources_sql: str, budget: int) -> str:
    """DuckDB twin of :func:`mixture_allocate`; ``sources_sql`` yields
    (source, weight)."""
    b = int(budget)
    return f"""
with base as (
  select source, cast(weight as bigint) as weight
  from ({sources_sql})
  where weight is not null and weight >= 0),
tot as (
  select cast(coalesce(sum(weight), 0) as bigint) as wsum from base),
q0 as materialized (
  select source, weight, wsum,
         cast(case when wsum > 0 then (weight * {b}) // wsum
              else 0 end as bigint) as quota0,
         cast(case when wsum > 0 then (weight * {b}) % wsum
              else 0 end as bigint) as rem
  from base, tot),
lft as (
  select cast({b} - coalesce(sum(quota0), 0) as bigint) as leftover,
         max(wsum) as wsum_max
  from q0),
ranked as (
  select source, weight, quota0,
         cast(row_number() over (order by rem desc, source asc)
              as bigint) as rk
  from q0)
select source, weight,
  cast(quota0 + case when wsum_max > 0 and rk <= leftover
       then 1 else 0 end as bigint) as quota
from ranked, lft
"""


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_ppm: int = 500_000,
    salt: str = "fim-v1",
    pre: str = "<|fim_pre|>",
    suf: str = "<|fim_suf|>",
    mid: str = "<|fim_mid|>",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, the
    code-model pretraining staple): for a deterministic ``rate_ppm``
    fraction of documents, pick two hash-derived cut points, and emit
    the PSM rearrangement

        pre ∥ prefix ∥ suf ∥ suffix ∥ mid ∥ middle

    so the model learns infilling from the same corpus bytes.
    Untransformed rows pass text through unchanged with
    ``fim = false``.

    Selection AND cut points ride the portable md5 hash (id ⊕ salt ⊕
    role) — the :func:`stratified_sample` discipline: reruns, retries,
    and the DuckDB twin all derive the identical transform, which
    ``rand()`` cannot promise. Cuts are 1..L−1 (both sides non-empty
    by construction; equal cuts → empty middle, a real FIM case kept
    deliberately); documents shorter than 2 chars never transform.
    ASCII/codepoint note: cuts count characters, so both engines
    agree on any UTF-8 text, but sentinel-free byte-exactness is only
    meaningful if the sentinels don't collide with corpus text —
    callers pick sentinels accordingly.

    Scale shape: one linear scan, ZERO shuffles, pure column
    expressions (three md5s + three substrings per row) — pipelines
    with the scan and any downstream packer. Returns
    (id, fim boolean, out_text).
    """
    from ..functions.hashing import portable_hash60

    def h(role: str) -> Column:
        return portable_hash60(F.concat_ws(
            "\x1f", F.col(id_col).cast("string"), F.lit(salt),
            F.lit(role)))

    t = F.col(text_col)
    ln = F.length(t)
    selected = ((F.pmod(h("sel"), F.lit(1_000_000)) < F.lit(rate_ppm))
                & (ln >= 2) & t.isNotNull())
    c1 = F.pmod(h("cut1"), ln - 1) + 1
    c2 = F.pmod(h("cut2"), ln - 1) + 1
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    rearranged = F.concat(
        F.lit(pre), t.substr(F.lit(1), lo),
        F.lit(suf), t.substr(hi + 1, ln),
        F.lit(mid), t.substr(lo + 1, hi - lo))
    return df.select(
        F.col(id_col),
        selected.alias("fim"),
        F.when(selected, rearranged).otherwise(t).alias("out_text"))


def fim_transform_oracle_sql(
    rows_sql: str,
    rate_ppm: int = 500_000,
    salt: str = "fim-v1",
    pre: str = "<|fim_pre|>",
    suf: str = "<|fim_suf|>",
    mid: str = "<|fim_mid|>",
) -> str:
    """DuckDB twin of :func:`fim_transform`; ``rows_sql`` yields
    (id, text)."""
    from ..functions.hashing import portable_hash60_sql

    def h(role: str) -> str:
        return portable_hash60_sql(
            f"concat_ws(chr(31), cast(id as varchar), '{salt}', "
            f"'{role}')")

    return f"""
with base as (select id, text from ({rows_sql})),
cuts as (
  select id, text, length(text) as ln,
         ({h('sel')}) % 1000000 < {rate_ppm}
           and length(text) >= 2 and text is not null as selected,
         case when length(text) >= 2
              then ({h('cut1')}) % (length(text) - 1) + 1 end as c1,
         case when length(text) >= 2
              then ({h('cut2')}) % (length(text) - 1) + 1 end as c2
  from base),
lohi as (
  select id, text, ln, selected,
         least(c1, c2) as lo, greatest(c1, c2) as hi
  from cuts)
select id, selected as fim,
  case when selected then
    '{pre}' || substr(text, 1, lo)
    || '{suf}' || substr(text, hi + 1, ln)
    || '{mid}' || substr(text, lo + 1, hi - lo)
  else text end as out_text
from lohi
"""


def pareto_frontier(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D Pareto frontier (skyline) — keep the rows no other row
    beats on BOTH axes: quality vs brevity, surprisal vs dedup
    distance, score vs recency. The curation question "which docs are
    worth keeping at any trade-off weight" answered without choosing
    the weight. Both axes MAXIMIZE; negate a column (exact on
    integers) to minimize it.

    Dominance is strict-somewhere (q ≥ on both, > on one): exact
    duplicates of a frontier point all survive — dropping ties is a
    dedup decision, not a dominance one. Derivation that avoids any
    pairwise join: with ``ymax(x) = max y at that x`` and
    ``M(x) = max ymax over all x' > x``, a row is on the frontier iff
    ``y = ymax(x)`` and ``y > M(x)`` (M empty → kept). NULL on either
    axis excludes the row.

    Scale shape: one partial-agg groupBy to the DISTINCT-X table, one
    ordered window (cummax, 1-row lag frame) over that table only,
    one equi-join back — the corpus never enters a window. The
    distinct-x table is value-cardinality-sized: ppm-quantized scores
    bound it at 10^6+1 rows; raw doubles make it corpus-sized, so
    quantize first (the repo-wide fixed-point discipline anyway).
    Returns the input rows (all columns) that are on the frontier.
    """
    from pyspark.sql.window import Window

    clean = df.where(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull())
    per_x = clean.groupBy(F.col(x_col).alias("_px")).agg(
        F.max(F.col(y_col)).alias("_ymax"))
    w = (Window.orderBy(F.col("_px").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    marked = per_x.select(
        "_px", "_ymax", F.max("_ymax").over(w).alias("_mstrict"))
    keep = marked.where(F.col("_mstrict").isNull()
                        | (F.col("_ymax") > F.col("_mstrict")))
    return (clean.join(keep,
                       (F.col(x_col) == F.col("_px"))
                       & (F.col(y_col) == F.col("_ymax")))
            .drop("_px", "_ymax", "_mstrict"))


def pareto_frontier_oracle_sql(rows_sql: str, x_col: str = "x",
                               y_col: str = "y") -> str:
    """DuckDB twin of :func:`pareto_frontier`; ``rows_sql`` yields
    rows with ``x_col``/``y_col`` plus any carried columns."""
    return f"""
with clean as (
  select * from ({rows_sql})
  where {x_col} is not null and {y_col} is not null),
per_x as (
  select {x_col} as px, max({y_col}) as ymax
  from clean group by {x_col}),
marked as (
  select px, ymax,
         max(ymax) over (order by px desc
           rows between unbounded preceding and 1 preceding)
           as mstrict
  from per_x),
keep as (
  select px, ymax from marked
  where mstrict is null or ymax > mstrict)
select clean.* from clean
join keep on clean.{x_col} = keep.px and clean.{y_col} = keep.ymax
"""


def winsorize(
    df: DataFrame,
    key_col: str,
    val_col: str,
    lo_ppm: int = 50_000,
    hi_ppm: int = 950_000,
) -> DataFrame:
    """Per-group winsorization — clamp a metric at its exact per-group
    order statistics before averaging/weighting, so one 10 MB document
    or one latency outlier can't own the group mean
    (:func:`~..plans.stats.mad_outliers` FLAGS outliers; this tames
    them in place for downstream aggregates).

    Exact, deterministic quantile spec (no interpolation — engines
    disagree on interpolated quantiles): the clamp bounds are the
    values at 0-based ranks ``((n−1)·p) div 10^6`` in ascending
    ``val`` order. Ties make WHICH row holds a rank ambiguous but
    never the VALUE at it, so the result is engine-independent without
    a tiebreak column. NULL values pass through unclamped.

    Scale shape: one keyed window (row_number + count ride the same
    shuffle), the two boundary rows per group reduce to a KEY-SIZED
    bounds table, broadcast back onto the corpus for the clamp — the
    corpus crosses exactly one shuffle. Returns the input columns
    plus ``val_w`` (the clamped value), ``lo_val``, ``hi_val``.
    """
    if not (0 <= lo_ppm <= hi_ppm <= 1_000_000):
        raise ValueError(
            f"winsorize: need 0 <= lo_ppm <= hi_ppm <= 10^6, got "
            f"{lo_ppm}/{hi_ppm}")
    from pyspark.sql.window import Window

    ranked = (df.where(F.col(val_col).isNotNull())
              .select(F.col(key_col).alias("_k"),
                      F.col(val_col).alias("_v"))
              .withColumn("_rn", F.row_number().over(
                  Window.partitionBy("_k").orderBy(F.col("_v").asc())))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy("_k"))))
    lo_i = F.expr(f"((_n - 1) * {lo_ppm}) div 1000000") + 1
    hi_i = F.expr(f"((_n - 1) * {hi_ppm}) div 1000000") + 1
    bounds = (ranked
              .where((F.col("_rn") == lo_i) | (F.col("_rn") == hi_i))
              .groupBy("_k")
              .agg(F.min("_v").alias("lo_val"),
                   F.max("_v").alias("hi_val")))
    out = df.join(F.broadcast(bounds),
                  F.col(key_col) == F.col("_k"), "left").drop("_k")
    clamped = F.when(
        F.col(val_col).isNotNull(),
        F.least(F.greatest(F.col(val_col), F.col("lo_val")),
                F.col("hi_val")))
    return out.withColumn("val_w", clamped)


def winsorize_oracle_sql(rows_sql: str, lo_ppm: int = 50_000,
                         hi_ppm: int = 950_000) -> str:
    """DuckDB twin of :func:`winsorize`; ``rows_sql`` yields
    (key, v [, carried columns])."""
    return f"""
with base as (select * from ({rows_sql})),
ranked as (
  select key as k, v,
         row_number() over (partition by key order by v asc) as rn,
         count(*) over (partition by key) as n
  from base where v is not null),
bounds as (
  select k, min(v) as lo_val, max(v) as hi_val
  from ranked
  where rn = ((n - 1) * {lo_ppm}) // 1000000 + 1
     or rn = ((n - 1) * {hi_ppm}) // 1000000 + 1
  group by k)
select base.*, lo_val, hi_val,
       case when v is not null
            then least(greatest(v, lo_val), hi_val) end as val_w
from base left join bounds on base.key = bounds.k
"""


def example_sample(
    df: DataFrame,
    strata_col: str,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "ex-v1",
) -> DataFrame:
    """k deterministic exemplars per stratum — the "show me five
    examples from every source" pull behind datasheets, eval sheets,
    and review queues. Hash-ordered rather than ``rand()`` or "first
    k" (which is really "whatever the scan order was"): the same k
    rows come back on every rerun, engine, and retry, and changing
    ``salt`` rotates the sample without touching anything else.

    Order is ``(md5(id ⊕ salt), id)`` — the id tiebreak makes the cut
    deterministic even on the (astronomically unlikely) hash tie.
    One keyed window over many small groups (the healthy window
    shape); rows with NULL id or stratum are excluded (they cannot be
    addressed stably). Returns the input columns plus ``sample_rank``
    (1-based)."""
    if k < 1:
        raise ValueError(f"example_sample: k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    from ..functions.hashing import portable_hash60

    h = portable_hash60(F.concat_ws(
        "\x1f", F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(id_col).asc())
    return (df.where(F.col(id_col).isNotNull()
                     & F.col(strata_col).isNotNull())
            .withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k))


def example_sample_oracle_sql(rows_sql: str, strata: str, idc: str,
                              k: int, salt: str = "ex-v1") -> str:
    """DuckDB twin of :func:`example_sample`; ``rows_sql`` yields the
    input columns."""
    from ..functions.hashing import portable_hash60_sql

    h = portable_hash60_sql(
        f"concat_ws(chr(31), cast({idc} as varchar), '{salt}')")
    return f"""
select * from (
  select *, row_number() over (
      partition by {strata} order by {h} asc, {idc} asc)
    as sample_rank
  from ({rows_sql})
  where {idc} is not null and {strata} is not null)
where sample_rank <= {k}
"""


def quantile_normalize(
    df: DataFrame,
    slice_col: str,
    id_col: str,
    val_col: str,
) -> DataFrame:
    """Quantile normalization across slices — map every slice's score
    distribution onto the POOLED distribution, so a judge/classifier
    whose scale drifted between batches (the batch effect) becomes
    comparable: after normalization the p90 of slice A and the p90 of
    slice B are the same number, by construction.

    Exact deterministic spec (no interpolation): a row at (id-tiebroken)
    rank ``r`` of ``n_s`` in its slice maps to the pooled value at
    position ``((r−1)·(N−1)) div max(n_s−1, 1) + 1`` — endpoints map
    to pooled min/max, a singleton slice maps to the pooled min
    (documented convention). The pooled lookup is BY CUMULATIVE COUNT
    over DISTINCT values, not a global row_number — a corpus-wide
    single-partition sort would be the scale bug; the distinct-value
    CDF is value-cardinality-sized (quantize scores, the repo-wide
    ppm discipline) and broadcasts. NULL values pass through with
    ``v_norm`` NULL.

    Shape: one keyed window (slice ranks), one distinct-value agg +
    bounded window (CDF), one broadcast range join (each row matches
    exactly one CDF bucket). Returns the input plus ``v_norm``.
    """
    from pyspark.sql.window import Window

    clean = df.where(F.col(val_col).isNotNull())
    n_total = clean.count()
    if n_total == 0:
        return df.withColumn("v_norm", F.lit(None).cast("long"))
    ranked = clean.select(
        F.col(slice_col).alias("_s"), F.col(id_col).alias("_i"),
        F.col(val_col).cast("long").alias("_v")) \
        .withColumn("_r", F.row_number().over(
            Window.partitionBy("_s").orderBy(F.col("_v").asc(),
                                             F.col("_i").asc()))) \
        .withColumn("_n", F.count(F.lit(1)).over(
            Window.partitionBy("_s")))
    pos = (F.expr(f"((_r - 1) * ({n_total} - 1))"
                  f" div greatest(_n - 1, 1)") + 1).alias("_p")
    cdf = (clean.groupBy(F.col(val_col).cast("long").alias("_cv"))
           .agg(F.count(F.lit(1)).alias("_c"))
           .withColumn("_cum", F.sum("_c").over(
               Window.orderBy(F.col("_cv").asc())
               .rowsBetween(Window.unboundedPreceding, 0)))
           .withColumn("_prev", F.col("_cum") - F.col("_c"))
           .select("_cv", "_prev", "_cum"))
    mapped = (ranked.select("_s", "_i", "_v", pos)
              .join(F.broadcast(cdf),
                    (F.col("_p") > F.col("_prev"))
                    & (F.col("_p") <= F.col("_cum")))
              .select(F.col("_s"), F.col("_i"),
                      F.col("_v"), F.col("_cv").alias("v_norm")))
    out = df.join(
        mapped.select(F.col("_s").alias(slice_col + "__qn"),
                      F.col("_i").alias(id_col + "__qn"), "v_norm"),
        (F.col(slice_col) == F.col(slice_col + "__qn"))
        & (F.col(id_col) == F.col(id_col + "__qn")), "left") \
        .drop(slice_col + "__qn", id_col + "__qn")
    return out


def quantile_normalize_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`quantile_normalize`; ``rows_sql`` yields
    (slc, id, v)."""
    return """
with base as (select slc, id, v from (%s)),
clean as (select * from base where v is not null),
nt as (select cast(count(*) as bigint) as n from clean),
ranked as (
  select slc, id, v,
         row_number() over (partition by slc order by v asc, id asc)
           as r,
         count(*) over (partition by slc) as ns
  from clean),
cdf as (
  select cast(v as bigint) as cv, count(*) as c,
         sum(count(*)) over (order by v asc
           rows between unbounded preceding and current row) as cum
  from clean group by v),
mapped as (
  select ranked.slc, ranked.id, ranked.v, cdf.cv as v_norm
  from ranked join cdf
    on ((r - 1) * ((select n from nt) - 1))
       // greatest(ns - 1, 1) + 1 > cum - c
   and ((r - 1) * ((select n from nt) - 1))
       // greatest(ns - 1, 1) + 1 <= cum)
select base.slc, base.id, base.v, mapped.v_norm
from base left join mapped
  on base.slc = mapped.slc and base.id = mapped.id
""" % rows_sql
