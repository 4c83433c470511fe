"""Distributed triple-set parity metric (BASELINE.json: P/R ≥ 0.95 vs
reference N-Quads on (s,p,o), graph names excluded — they embed a
run-dependent hash+timestamp, util/__init__.py:174-208).

Precision/recall computed with joins (semi-join counts), never a
collect — usable against a reference dump of any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..model import object_term

TRIPLE_KEY = ["s", "p", "o"]


def as_triple_set(quads: DataFrame) -> DataFrame:
    """Quads → distinct (s, p, o-term) rows."""
    return quads.select(
        "s", "p",
        object_term(F.col("o_kind"), F.col("o_lex"), F.col("o_dt"),
                    F.col("o_lang")).alias("o"),
    ).distinct()


def parse_nquads(lines: DataFrame) -> DataFrame:
    """N-Quads text lines → (s, p, o-term) rows (graph + trailing dot
    stripped). Regex-based, adequate for reference dumps with IRI
    subjects/predicates (the reference emits no blank-node subjects)."""
    pat = r"^<([^>]*)>\s+<([^>]*)>\s+(.*?)(?:\s+<[^>]*>)?\s+\.\s*$"
    return lines.select(
        F.regexp_extract("value", pat, 1).alias("s"),
        F.regexp_extract("value", pat, 2).alias("p"),
        F.regexp_extract("value", pat, 3).alias("o"),
    ).where(F.col("s") != "").distinct()


def precision_recall(candidate: DataFrame, reference: DataFrame) -> dict:
    """P/R of candidate vs reference triple sets (distinct rows)."""
    cand = candidate.select(TRIPLE_KEY).distinct()
    ref = reference.select(TRIPLE_KEY).distinct()
    n_cand = cand.count()
    n_ref = ref.count()
    n_inter = cand.join(ref, TRIPLE_KEY, "left_semi").count()
    return {
        "candidate": n_cand,
        "reference": n_ref,
        "intersection": n_inter,
        "precision": n_inter / n_cand if n_cand else 1.0,
        "recall": n_inter / n_ref if n_ref else 1.0,
    }


def er_eval(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Pair-level evaluation of an entity-resolution clustering against
    a gold clustering — the standard ER metric (pairwise P/R/F1), and
    the local analogue of this repo's triple P/R north metric applied
    to the linking stage. Inputs are two ``(node, canonical)`` frames
    (ifp_sameas / canonical_entities output shape); the node universe
    is pred ∪ gold (full outer join), with a symmetric singleton rule:
    a node missing from ``gold`` scores as a gold singleton, and a
    node missing from ``pred`` scores as a pred singleton. A left join
    here would silently drop gold-only nodes and inflate recall —
    realistic when pred covers only a subset (e.g. ifp_sameas emits
    only IFP-bearing subjects).

    NO pair table is ever materialized: with n_ij = |pred cluster i ∩
    gold cluster j|, true-positive pairs = Σ C(n_ij, 2), predicted
    pairs = Σ C(|i|, 2), gold pairs = Σ C(|j|, 2) — three aggregates
    over the node-level join, each output sized by the cluster count.
    A quadratic pairs-join would be exactly the all-pairs blowup the
    dedup family exists to avoid; the counting identity sidesteps it.

    Returns one row: n_nodes, tp_pairs, pred_pairs, gold_pairs, and
    floor-scaled precision/recall/F1 (``*_m`` = floor(x * 10^6),
    engine-portable like every float surface here). Empty-denominator
    conventions: no predicted pairs → precision 1 (nothing asserted,
    nothing wrong); no gold pairs → recall 1; F1 from the scaled
    integer parts is 0 when both are 0.
    """
    p = pred.select(F.col("node"), F.col("canonical").alias("pc"))
    g = gold.select(F.col("node"), F.col("canonical").alias("gc"))
    lone = F.concat(F.lit("\x00lone:"), F.col("node"))
    j = p.join(g, "node", "full_outer").select(
        "node",
        F.coalesce("pc", lone).alias("pc"),
        F.coalesce("gc", lone).alias("gc"))

    def pairs(df, *keys):
        return (df.groupBy(*keys).agg(F.count("*").alias("n"))
                .agg(F.coalesce(
                    F.sum(F.expr("n * (n - 1) div 2")), F.lit(0))
                    .cast("long").alias("p")))

    tp = pairs(j, "pc", "gc").withColumnRenamed("p", "tp_pairs")
    pp = pairs(j, "pc").withColumnRenamed("p", "pred_pairs")
    gp = pairs(j, "gc").withColumnRenamed("p", "gold_pairs")
    n = j.agg(F.count("*").cast("long").alias("n_nodes"))
    one = (n.crossJoin(tp).crossJoin(pp).crossJoin(gp))
    prec = F.when(F.col("pred_pairs") == 0, F.lit(1.0)) \
        .otherwise(F.col("tp_pairs") / F.col("pred_pairs"))
    rec = F.when(F.col("gold_pairs") == 0, F.lit(1.0)) \
        .otherwise(F.col("tp_pairs") / F.col("gold_pairs"))
    f1 = F.when(prec + rec == 0, F.lit(0.0)) \
        .otherwise(2 * prec * rec / (prec + rec))
    return one.select(
        "n_nodes", "tp_pairs", "pred_pairs", "gold_pairs",
        F.floor(prec * 1_000_000).cast("long").alias("precision_m"),
        F.floor(rec * 1_000_000).cast("long").alias("recall_m"),
        F.floor(f1 * 1_000_000).cast("long").alias("f1_m"))


def blocking_eval(
    blocks: DataFrame,
    gold: DataFrame,
    node_col: str = "node",
    block_col: str = "block",
) -> DataFrame:
    """Blocking quality for ER candidate generation — the two standard
    metrics: REDUCTION RATIO (1 - comparisons / all-pairs: how much of
    the quadratic search space the blocking scheme prunes) and PAIR
    COMPLETENESS (the fraction of gold same-entity pairs that co-occur
    in at least one block — the recall ceiling any downstream matcher
    inherits). ``blocks`` is (node, block) with multi-block membership
    allowed (LSH bands, multiple IFP keys); ``gold`` is
    (node, canonical).

    Cost discipline: comparisons = Σ_b C(|b|, 2) — block-count-sized
    aggregate, the standard definition (a pair sharing two blocks is
    two comparisons; that is what the matcher would actually pay).
    Completeness enumerates pairs ONLY inside (block ∩ gold-cluster)
    cells and dedups them — bounded by the gold pair count, never the
    corpus pair count; cross-cluster candidates (the overwhelming
    majority) are never materialized.

    One row: counts plus floor-scaled reduction_m / completeness_m.
    A scheme whose comparisons exceed C(n,2) gets a negative
    reduction_m — that is the honest answer, not a clamp.
    """
    b = blocks.select(F.col(node_col).alias("node"),
                      F.col(block_col).alias("block")).dropDuplicates()
    g = gold.select(F.col(node_col).alias("node"),
                    F.col("canonical").alias("gc"))
    comparisons = (b.groupBy("block").agg(F.count("*").alias("n"))
                   .agg(F.coalesce(F.sum(F.expr("n * (n - 1) div 2")),
                                   F.lit(0)).cast("long")
                        .alias("comparisons"),
                        F.count("*").cast("long").alias("n_blocks")))
    nodes = b.select("node").distinct()
    nn = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    gold_pairs = (g.groupBy("gc").agg(F.count("*").alias("n"))
                  .agg(F.coalesce(F.sum(F.expr("n * (n - 1) div 2")),
                                  F.lit(0)).cast("long")
                       .alias("gold_pairs")))
    # same-cluster co-blocked pairs, deduped across blocks
    bg = b.join(g, "node")
    l, r = bg.alias("l"), bg.alias("r")
    co = (l.join(r, (F.col("l.block") == F.col("r.block"))
                 & (F.col("l.gc") == F.col("r.gc"))
                 & (F.col("l.node") < F.col("r.node")))
          .select(F.col("l.node").alias("u"), F.col("r.node").alias("v"))
          .dropDuplicates()
          .agg(F.count("*").cast("long").alias("co_blocked_pairs")))
    one = nn.crossJoin(comparisons).crossJoin(gold_pairs).crossJoin(co)
    total = F.expr("n_nodes * (n_nodes - 1) div 2")
    rr = F.when(total == 0, F.lit(1.0)) \
        .otherwise(1 - F.col("comparisons") / total)
    pc = F.when(F.col("gold_pairs") == 0, F.lit(1.0)) \
        .otherwise(F.col("co_blocked_pairs") / F.col("gold_pairs"))
    return one.select(
        "n_nodes", "n_blocks", "comparisons",
        total.cast("long").alias("total_pairs"),
        "gold_pairs", "co_blocked_pairs",
        F.floor(rr * 1_000_000).cast("long").alias("reduction_m"),
        F.floor(pc * 1_000_000).cast("long").alias("completeness_m"))


def fs_weights(
    pairs: DataFrame,
    params: DataFrame,
    lower_fp: int,
    upper_fp: int,
) -> DataFrame:
    """Fellegi-Sunter record-linkage decision weights: per candidate
    pair, the total log-likelihood-ratio match weight over attribute
    comparisons, classified against (lower, upper) thresholds — the
    probabilistic layer on top of the blocking pipeline
    (:func:`blocking_eval` measures the candidates; this scores them).

    ``pairs`` is tidy: (id_a, id_b, attr, agree∈{0,1}); ``params``
    gives per-attribute (attr, m_ppm, u_ppm) — P(agree | match) and
    P(agree | non-match) in parts-per-million. Agreement contributes
    ``log2fp(m) − log2fp(u)``, disagreement ``log2fp(1e6−m) −
    log2fp(1e6−u)`` (the 1e6 numerators cancel in the ratio), both in
    the mantissa-squaring Q10 fixed point — log2 vs the textbook ln is
    a constant factor shared by every pair, so thresholds rescale and
    rankings are unchanged, and the integer pipeline stays engine-
    exact where libm flips floor boundaries. Returns ``(id_a, id_b,
    n_attrs, weight_fp, decision)`` with decision ∈ match / possible /
    nonmatch by ``weight_fp ≥ upper_fp`` / ``≥ lower_fp``.

    Scale shape: the four log2 columns are staged ONCE on the
    attribute-sized ``params`` table (driver-validated: every
    probability in [1, 999999] ppm so all four log arguments are ≥ 1,
    and m > u so agreement weight is positive — inverted parameters
    are a spec bug, not data), broadcast-joined to the pair table;
    then one partial-aggregated groupBy(id_a, id_b). Pairs citing an
    attribute absent from ``params`` would silently vanish through the
    inner join — an explicit bounded anti-join check (distinct attrs,
    vocabulary-sized) raises instead.
    """
    from ..functions.intmath import with_log2_fp

    if not (lower_fp <= upper_fp):
        raise ValueError(
            f"fs_weights: lower_fp {lower_fp} must be <= upper_fp {upper_fp}")
    prm = params.select(
        F.col("attr").cast("string").alias("attr"),
        F.col("m_ppm").cast("bigint").alias("m_ppm"),
        F.col("u_ppm").cast("bigint").alias("u_ppm"))
    rows = prm.collect()  # attribute-sized: a handful of rows
    for r in rows:
        if not (1 <= r["u_ppm"] < r["m_ppm"] <= 999_999):
            raise ValueError(
                "fs_weights: need 1 <= u_ppm < m_ppm <= 999999 ppm, got "
                f"attr={r['attr']!r} m={r['m_ppm']} u={r['u_ppm']}")
    if len({r["attr"] for r in rows}) != len(rows):
        raise ValueError("fs_weights: duplicate attr in params")
    prm = with_log2_fp(prm, "m_ppm", "_lm")
    prm = with_log2_fp(prm, "u_ppm", "_lu")
    prm = prm.withColumn("_dm", F.lit(1_000_000) - F.col("m_ppm"))
    prm = prm.withColumn("_du", F.lit(1_000_000) - F.col("u_ppm"))
    prm = with_log2_fp(prm, "_dm", "_ldm")
    prm = with_log2_fp(prm, "_du", "_ldu")
    prm = prm.select(
        "attr",
        (F.col("_lm") - F.col("_lu")).alias("_w_agree"),
        (F.col("_ldm") - F.col("_ldu")).alias("_w_disagree"))

    p = pairs.select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
        F.col("attr").cast("string").alias("attr"),
        F.col("agree").cast("int").alias("agree"))
    unknown = (p.select("attr").distinct()
               .join(prm.select("attr"), "attr", "left_anti")
               .limit(1).collect())
    if unknown:
        raise ValueError(
            f"fs_weights: pair attribute {unknown[0]['attr']!r} has no "
            "(m, u) parameters")
    j = p.join(F.broadcast(prm), "attr")
    w = F.when(F.col("agree") == 1, F.col("_w_agree")) \
         .otherwise(F.col("_w_disagree"))
    out = (j.groupBy("id_a", "id_b")
           .agg(F.count("*").cast("bigint").alias("n_attrs"),
                F.sum(w).cast("bigint").alias("weight_fp")))
    return out.withColumn(
        "decision",
        F.when(F.col("weight_fp") >= upper_fp, F.lit("match"))
        .when(F.col("weight_fp") >= lower_fp, F.lit("possible"))
        .otherwise(F.lit("nonmatch")))


def sorted_neighborhood(
    records: DataFrame,
    window: int = 3,
    key_col: str = "key",
    id_col: str = "id",
    prefix_len: int = 2,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernández & Stolfo
    1995): records within ``window − 1`` positions of each other in the
    global ``(key, id)`` sort order become candidate pairs — the
    classic ER blocking scheme for keys whose typos blocking-by-
    equality would split (:func:`blocking_eval` measures it,
    :func:`fs_weights` scores what it emits). Multi-pass SNM = call
    once per key and union.

    Scale shape — a global ORDER BY without the single-task window
    trap: key PREFIXES are order-aligned with the keys themselves, so
    (1) bucket by ``substr(key, 1, prefix_len)``, (2) row_number
    WITHIN each bucket (parallel windows), (3) bucket counts → driver
    (bounded by ``max_buckets``, loud raise beyond — the IVF-centroid
    collect pattern) → cumulative offsets rejoin as a broadcast, so
    ``rank = offset + local_rank`` is the exact global rank, and
    (4) pairs = one equi-join of the rank table to itself shifted by
    δ ∈ [1, window) (explode of a window-sized array, not a union).
    Ranks are unique (id tie-break), so the join is exactly-once.

    Returns ``(id_a, id_b, gap)``, ``gap`` = rank distance ∈
    [1, window). Comparisons are exactly ``(n − w/2)·(w − 1)``-ish by
    construction — linear in n, the whole point of SNM.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from pyspark.sql import Window

    r = records.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(key_col).cast("string").alias("key"))
    if r.where(F.col("key").isNull() | F.col("id").isNull()).limit(1).count():
        raise ValueError("sorted_neighborhood: NULL key or id "
                         "(sort position undefined); filter first")
    r = r.withColumn("bucket", F.substring("key", 1, prefix_len))
    counts = (r.groupBy("bucket").agg(F.count("*").alias("n"))
              .orderBy("bucket").collect())  # bounded: alphabet^prefix
    if len(counts) > max_buckets:
        raise ValueError(
            f"sorted_neighborhood: {len(counts)} prefix buckets exceed "
            f"max_buckets={max_buckets}; lower prefix_len")
    offsets, acc = [], 0
    for row in counts:
        offsets.append((row["bucket"], acc))
        acc += row["n"]
    spark = records.sparkSession
    off = spark.createDataFrame(offsets, "bucket string, off long")
    ranked = (r.withColumn(
        "lr", F.row_number().over(
            Window.partitionBy("bucket").orderBy("key", "id")))
        .join(F.broadcast(off), "bucket")
        .select("id", (F.col("off") + F.col("lr")).alias("rank")))
    left = ranked.select(
        F.col("id").alias("id_a"), "rank",
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("gap"))
    return (left.withColumn("rank", F.col("rank") + F.col("gap"))
            .join(ranked.withColumnRenamed("id", "id_b"), "rank")
            .select("id_a", "id_b", F.col("gap").cast("int")))


def sorted_neighborhood_oracle_sql(records_cte: str, window: int) -> str:
    """DuckDB twin of :func:`sorted_neighborhood`: one global
    row_number over (key, id) — the serial formulation the distributed
    bucket-offset rank reproduces exactly."""
    return f"""
with r as ({records_cte}),
ranked as (
  select cast(id as varchar) as id,
         row_number() over (order by cast(key as varchar),
                            cast(id as varchar)) as rank
  from r
)
select a.id as id_a, b.id as id_b, cast(b.rank - a.rank as int) as gap
from ranked a join ranked b
  on b.rank > a.rank and b.rank - a.rank < {window}
"""


def judge_kappa(
    pairs: DataFrame,
    a_col: str = "label_a",
    b_col: str = "label_b",
) -> DataFrame:
    """Cohen's kappa between two categorical raters — the standard
    chance-corrected agreement statistic for LLM-judge validation
    (raw agreement flatters any pair of judges that both say "good"
    90% of the time; kappa is what a rubric change actually moves).

    Exact integer arithmetic end to end: with n rows, D = #{a=b} and
    S = Σ_k n_a(k)·n_b(k) (marginal product over the shared label
    vocabulary), kappa = (n·D − S) / (n² − S) — an exact rational,
    floor-scaled to ppm with the pmod trick (floor division holds for
    NEGATIVE kappa too: pmod's non-negative remainder IS the floor
    decomposition). Degenerate n² = S (both raters constant on one
    label) reads as perfect trivial agreement → 10^6 by convention.

    Scale shape: one linear scan (count + diag in one partial agg),
    two label-sized marginal aggs joined on label, a 1-row combine.
    The ppm numerators need n² · 10^6 < 2^63 ⇒ n ≤ ~3·10^6 — sample
    or shard the rating table beyond that (a judge-agreement estimate
    does not need a billion rows; ANSI overflow is loud, not wrong).

    Returns one row: ``(n, n_agree, po_ppm, pe_ppm, kappa_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    a, b = F.col(a_col), F.col(b_col)
    base = (pairs.where(a.isNotNull() & b.isNotNull())
            .select(a.alias("a"), b.alias("b")))
    top = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("long"))
        .cast("long").alias("n_agree"))
    ma = base.groupBy(F.col("a").alias("k")).agg(
        F.count("*").cast("long").alias("na"))
    mb = base.groupBy(F.col("b").alias("k")).agg(
        F.count("*").cast("long").alias("nb"))
    s = (ma.join(mb, "k")
         .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
              .cast("long").alias("s")))

    def _floordiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    n, d = F.col("n"), F.col("n_agree")
    num = (n * d - F.col("s")) * F.lit(1_000_000)
    den = n * n - F.col("s")
    return (top.crossJoin(F.broadcast(s)).select(
        "n", "n_agree",
        _floordiv(d * F.lit(1_000_000), F.greatest(n, F.lit(1)))
        .alias("po_ppm"),
        _floordiv(F.col("s") * F.lit(1_000_000),
                  F.greatest(n * n, F.lit(1))).alias("pe_ppm"),
        F.when(den == 0, F.lit(1_000_000))
        .otherwise(_floordiv(num, den)).cast("long")
        .alias("kappa_ppm")))


def judge_kappa_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`judge_kappa`; ``pairs_sql`` yields
    (a, b). `//` floors; products cast to bigint pre-divide so no
    HUGEINT reaches the output."""
    return f"""
with b as materialized (
  select a, b from ({pairs_sql}) where a is not null and b is not null),
top as (select cast(count(*) as bigint) as n,
               cast(sum(case when a = b then 1 else 0 end) as bigint)
                 as n_agree from b),
ma as (select a as k, cast(count(*) as bigint) as na from b group by a),
mb as (select b as k, cast(count(*) as bigint) as nb from b group by b),
s as (select cast(coalesce(sum(na * nb), 0) as bigint) as s
      from ma join mb using (k))
select n, n_agree,
  cast((n_agree * 1000000) // greatest(n, 1) as bigint) as po_ppm,
  cast((s * 1000000) // greatest(n * n, 1) as bigint) as pe_ppm,
  cast(case when n * n - s = 0 then 1000000
       else ((n * n_agree - s) * 1000000) // (n * n - s) end
       as bigint) as kappa_ppm
from top cross join s
"""


_ROUGE_SPACE = "[ \t\n\r]+"


def rouge_overlap(
    pairs: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "candidate",
    ref_col: str = "reference",
) -> DataFrame:
    """ROUGE-1/-2 recall (distinct-n-gram variant) of a candidate
    text against a reference per pair — the summarization/response
    eval metric: what fraction of the reference's unigrams (and
    bigrams) does the candidate cover. Distinct-set semantics (each
    type counts once) — the clipped-multiset variant differs only on
    repeated tokens and the set form is what an engine can compute
    with joins alone.

    Deliberately RELATIONAL, not array-lambda: tokens posexplode to
    rows (the filter lambda touches only its element, so nothing
    re-evaluates), bigrams come from a (pair, pos)=(pair, pos+1)
    self-equijoin of the exploded table, overlaps are distinct
    equijoins — whole-stage codegen end to end, partial-agg shuffles
    keyed by (pair, gram). The zip_with-over-slices alternative
    re-inlines the token expression into the lambda (the
    set_similarity_join lesson) and is quadratic per row; here cost
    is linear in corpus tokens.

    Empty reference ⇒ recall 1 (nothing to recall — er_eval's
    convention); pairs vanish from no aggregate because the id
    universe left-joins back. Returns ``(pair_id, n_ref_uni,
    n_ref_bi, rouge1_bp, rouge2_bp)`` with basis-point floor scaling.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    def toks(c):
        return F.filter(F.split(F.lower(F.coalesce(c, F.lit(""))),
                                F.lit(_ROUGE_SPACE)),
                        lambda x: x != "")

    ids = pairs.select(F.col(id_col).alias("pid")).distinct()
    ex = {}
    for side, col in (("c", cand_col), ("r", ref_col)):
        e = (pairs.select(F.col(id_col).alias("pid"),
                          F.posexplode(toks(F.col(col)))
                          .alias("pos", "tok")))
        ex[side] = e
    uni = {s: ex[s].select("pid", "tok").distinct() for s in ex}
    bi = {}
    for s in ex:
        l = ex[s].select("pid", "pos", F.col("tok").alias("t1"))
        r = ex[s].select("pid", (F.col("pos") - 1).alias("pos"),
                         F.col("tok").alias("t2"))
        bi[s] = (l.join(r, ["pid", "pos"])
                 .select("pid", F.concat_ws(" ", "t1", "t2")
                         .alias("tok")).distinct())

    def counts(df, name):
        return df.groupBy("pid").agg(
            F.count("*").cast("long").alias(name))

    def inter(a, b, name):
        return counts(a.join(b, ["pid", "tok"], "left_semi"), name)

    nr1 = counts(uni["r"], "n_ref_uni")
    nr2 = counts(bi["r"], "n_ref_bi")
    i1 = inter(uni["r"], uni["c"], "i1")
    i2 = inter(bi["r"], bi["c"], "i2")

    def _recall_bp(i, n):
        num = F.coalesce(i, F.lit(0)) * F.lit(10_000)
        den = F.coalesce(n, F.lit(0))
        return (F.when(den == 0, F.lit(10_000))
                .otherwise((num - F.pmod(num, den)) / den)
                .cast("long"))

    out = (ids.join(nr1, "pid", "left").join(nr2, "pid", "left")
           .join(i1, "pid", "left").join(i2, "pid", "left"))
    return out.select(
        F.col("pid").alias(id_col),
        F.coalesce("n_ref_uni", F.lit(0)).cast("long")
        .alias("n_ref_uni"),
        F.coalesce("n_ref_bi", F.lit(0)).cast("long").alias("n_ref_bi"),
        _recall_bp(F.col("i1"), F.col("n_ref_uni")).alias("rouge1_bp"),
        _recall_bp(F.col("i2"), F.col("n_ref_bi")).alias("rouge2_bp"))


def rouge_overlap_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`rouge_overlap`; ``pairs_sql`` yields
    (pair_id, candidate, reference). List-lambda form (fine at oracle
    scale); bigram builds guard len >= 2 explicitly."""
    def toks(col):
        return (f"list_filter(string_split_regex(lower(coalesce({col}, "
                f"'')), '{_ROUGE_SPACE}'), x -> x <> '')")

    def bigrams(t):
        return (f"case when len({t}) >= 2 then list_transform("
                f"generate_series(1, len({t}) - 1), "
                f"i -> {t}[i] || ' ' || {t}[i + 1]) "
                f"else [] end")

    def ninter(a, b):
        return (f"len(list_filter(list_distinct({a}), "
                f"x -> list_contains({b}, x)))")

    return f"""
with p as materialized (
  select pair_id, {toks('candidate')} as tc, {toks('reference')} as tr
  from ({pairs_sql})),
g as materialized (
  select pair_id, list_distinct(tr) as ur, list_distinct(tc) as uc,
         list_distinct({bigrams('tr')}) as br,
         list_distinct({bigrams('tc')}) as bc
  from p)
select pair_id,
  cast(len(ur) as bigint) as n_ref_uni,
  cast(len(br) as bigint) as n_ref_bi,
  cast(case when len(ur) = 0 then 10000
       else ({ninter('ur', 'uc')} * 10000) // len(ur) end as bigint)
    as rouge1_bp,
  cast(case when len(br) = 0 then 10000
       else ({ninter('br', 'bc')} * 10000) // len(br) end as bigint)
    as rouge2_bp
from g
"""


def score_auc(
    scored: DataFrame,
    label_col: str = "is_pos",
    score_col: str = "score",
) -> DataFrame:
    """Binary ROC-AUC of a quality/classifier score — the
    threshold-free counterpart of :func:`classifier_eval` and the
    acceptance metric for every scorer feeding a corpus gate
    (`classifier_score`, `lm_surprisal`, `dsir`): AUC is exactly the
    Mann-Whitney probability P(score⁺ > score⁻) + ½·P(=), so it
    reads straight off per-score class counts — no pair table.

    Exact integer arithmetic: aggregate to one row per DISTINCT
    score (cp, cn), a running sum of negatives strictly below, then
    wins = Σ cp·cum_cn_below and ties = Σ cp·cn give
    ``auc_ppm = floor((2·wins + ties)·10⁶ / (2·n_pos·n_neg))``.
    One class absent ⇒ 500 000 (coin-flip) by convention.

    Scale shape: one linear scan with a map-side combine down to
    |distinct scores| rows, then ONE unpartitioned running-sum
    window over that bounded table — callers feed DISCRETIZED scores
    (the repo's scorers emit ppm/bp integers already; bucket raw
    doubles first), so the single window task is vocabulary-sized,
    never corpus-sized. Overflow contract: 2·n_pos·n_neg·10⁶ < 2⁶³
    ⇒ n ≲ 4·10⁶ rows — sample beyond that; ANSI raises loudly.

    Returns one row ``(n_pos, n_neg, tie_pairs, auc_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (scored
            .where(F.col(label_col).isNotNull()
                   & F.col(score_col).isNotNull())
            .select(F.col(score_col).alias("s"),
                    F.col(label_col).cast("boolean").alias("pos")))
    per = base.groupBy("s").agg(
        F.sum(F.col("pos").cast("long")).cast("long").alias("cp"),
        F.sum((~F.col("pos")).cast("long")).cast("long").alias("cn"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    per = per.withColumn(
        "below", F.coalesce(F.sum("cn").over(w), F.lit(0)))
    agg = per.agg(
        F.coalesce(F.sum("cp"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("cn"), F.lit(0)).cast("long").alias("n_neg"),
        F.coalesce(F.sum(F.col("cp") * F.col("below")), F.lit(0))
        .cast("long").alias("wins"),
        F.coalesce(F.sum(F.col("cp") * F.col("cn")), F.lit(0))
        .cast("long").alias("tie_pairs"))
    num = (F.lit(2) * F.col("wins") + F.col("tie_pairs")) \
        * F.lit(1_000_000)
    den = F.lit(2) * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        "n_pos", "n_neg", "tie_pairs",
        F.when(den == 0, F.lit(500_000))
        .otherwise(((num - F.pmod(num, den)) / den).cast("long"))
        .cast("long").alias("auc_ppm"))


def score_auc_oracle_sql(scored_sql: str) -> str:
    """DuckDB twin of :func:`score_auc`; ``scored_sql`` yields
    (s, pos). Products cast to bigint pre-divide — no HUGEINT out."""
    return f"""
with b as materialized (
  select s, pos from ({scored_sql})
  where s is not null and pos is not null),
per as (
  select s,
         cast(sum(case when pos then 1 else 0 end) as bigint) as cp,
         cast(sum(case when pos then 0 else 1 end) as bigint) as cn
  from b group by s),
run as (
  select cp, cn,
         cast(coalesce(sum(cn) over (order by s
           rows between unbounded preceding and 1 preceding), 0)
           as bigint) as below
  from per),
agg as (
  select cast(coalesce(sum(cp), 0) as bigint) as n_pos,
         cast(coalesce(sum(cn), 0) as bigint) as n_neg,
         cast(coalesce(sum(cp * below), 0) as bigint) as wins,
         cast(coalesce(sum(cp * cn), 0) as bigint) as tie_pairs
  from run)
select n_pos, n_neg, tie_pairs,
  cast(case when n_pos * n_neg = 0 then 500000
       else ((2 * wins + tie_pairs) * 1000000)
            // (2 * n_pos * n_neg) end as bigint) as auc_ppm
from agg
"""


def classifier_eval(
    pairs: DataFrame,
    gold_col: str = "gold",
    pred_col: str = "pred",
) -> DataFrame:
    """Per-class precision / recall / F1 of a categorical predictor
    against gold labels, plus a ``<macro>`` summary row — the
    confusion-matrix margins every labeling stage (speech acts, code
    router, language ID, LLM-judge rubrics) is accepted or rejected
    on.

    Exact ppm integers via the harmonic identity
    ``F1 = 2·tp / (n_gold + n_pred)`` — a single floor, no nested
    rounding; precision/recall floor over their own margins, with a
    0-denominator reading 0 (an unpredicted class has no precision
    claim). The macro row is the floor-of-mean of the per-class
    f1_ppm values over the class union — deterministic
    floor-of-floors, replayed identically by the twin.

    Scale shape: ONE corpus scan exploded to (role, class) charges
    ('g' gold margin, 'p' pred margin, 't' diagonal) with a
    map-side combine to the class-vocabulary-sized pivot; the macro
    row re-aggregates that bounded pivot (the union re-executes only
    the vocabulary-sized agg, never a second corpus scan, because
    the exploded base is persisted — release via
    :func:`~cow_spark.operators.dedup.release`).

    Returns per-class rows + the macro row:
    ``(label, n_gold, n_pred, tp, prec_ppm, rec_ppm, f1_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from ..operators.dedup import _attach_persisted

    g, p = F.col(gold_col), F.col(pred_col)
    base = (pairs.where(g.isNotNull() & p.isNotNull())
            .select(F.explode(F.array(
                F.struct(F.lit("g").alias("role"), g.alias("k")),
                F.struct(F.lit("p").alias("role"), p.alias("k")),
                F.struct(F.when(g == p, F.lit("t")).alias("role"),
                         g.alias("k")),
            )).alias("c"))
            .where(F.col("c.role").isNotNull())
            .select("c.role", "c.k"))
    cls = (base.groupBy("k").agg(
        F.sum((F.col("role") == "g").cast("long")).cast("long")
        .alias("n_gold"),
        F.sum((F.col("role") == "p").cast("long")).cast("long")
        .alias("n_pred"),
        F.sum((F.col("role") == "t").cast("long")).cast("long")
        .alias("tp"))).persist()

    def _ppm0(num, den):
        num = num * F.lit(1_000_000)
        return (F.when(den == 0, F.lit(0))
                .otherwise((num - F.pmod(num, den)) / den)
                .cast("long"))

    per = cls.select(
        F.col("k").alias("label"), "n_gold", "n_pred", "tp",
        _ppm0(F.col("tp"), F.col("n_pred")).alias("prec_ppm"),
        _ppm0(F.col("tp"), F.col("n_gold")).alias("rec_ppm"),
        _ppm0(F.lit(2) * F.col("tp"),
              F.col("n_gold") + F.col("n_pred")).alias("f1_ppm"))
    macro = per.agg(
        F.sum("n_gold").cast("long").alias("n_gold"),
        F.sum("n_pred").cast("long").alias("n_pred"),
        F.sum("tp").cast("long").alias("tp"),
        _ppm0(F.sum("prec_ppm"),
              F.count("*") * F.lit(1_000_000)).alias("prec_ppm"),
        _ppm0(F.sum("rec_ppm"),
              F.count("*") * F.lit(1_000_000)).alias("rec_ppm"),
        _ppm0(F.sum("f1_ppm"),
              F.count("*") * F.lit(1_000_000)).alias("f1_ppm"))
    macro = macro.select(F.lit("<macro>").alias("label"), "n_gold",
                         "n_pred", "tp", "prec_ppm", "rec_ppm",
                         "f1_ppm")
    return _attach_persisted(per.unionByName(macro), cls)


def classifier_eval_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`classifier_eval`; ``pairs_sql`` yields
    (gold, pred)."""
    return f"""
with b as materialized (
  select gold, pred from ({pairs_sql})
  where gold is not null and pred is not null),
cls as materialized (
  select k,
         cast(sum(case when role = 'g' then 1 else 0 end) as bigint)
           as n_gold,
         cast(sum(case when role = 'p' then 1 else 0 end) as bigint)
           as n_pred,
         cast(sum(case when role = 't' then 1 else 0 end) as bigint)
           as tp
  from (
    select 'g' as role, gold as k from b
    union all
    select 'p' as role, pred as k from b
    union all
    select 't' as role, gold as k from b where gold = pred)
  group by k),
per as materialized (
  select k as label, n_gold, n_pred, tp,
    cast(case when n_pred = 0 then 0
         else (tp * 1000000) // n_pred end as bigint) as prec_ppm,
    cast(case when n_gold = 0 then 0
         else (tp * 1000000) // n_gold end as bigint) as rec_ppm,
    cast(case when n_gold + n_pred = 0 then 0
         else (2 * tp * 1000000) // (n_gold + n_pred) end as bigint)
      as f1_ppm
  from cls)
select label, n_gold, n_pred, tp, prec_ppm, rec_ppm, f1_ppm from per
union all
select '<macro>',
  cast(sum(n_gold) as bigint), cast(sum(n_pred) as bigint),
  cast(sum(tp) as bigint),
  cast(case when count(*) = 0 then 0
       else sum(prec_ppm) // count(*) end as bigint),
  cast(case when count(*) = 0 then 0
       else sum(rec_ppm) // count(*) end as bigint),
  cast(case when count(*) = 0 then 0
       else sum(f1_ppm) // count(*) end as bigint)
from per
"""


def ks_test(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the score
    distributions of two named slices — the drift test
    :func:`~cow_spark.operators.terms.corpus_drift`'s binned profile
    can't give you: D = max_s |F_a(s) − F_b(s)| over the EXACT
    empirical CDFs, plus the score where the gap peaks (the natural
    threshold for a slice-aware gate).

    Exact integers: per distinct score (ca, cb), inclusive running
    sums (Ca, Cb), D's numerator is max |n_b·Ca − n_a·Cb| and
    ``d_ppm = floor(max·10⁶ / (n_a·n_b))``; the argmax reports the
    smallest attaining score (max(struct(diff, −s)) — deterministic
    under ties). Either slice empty ⇒ 10⁶ (maximally distinguishable)
    by convention. Group values outside {a, b} are ignored —
    explicit slice names, no silent 2-group assumption.

    Scale shape mirrors :func:`score_auc`: one scan → per-distinct-
    score combine → one bounded unpartitioned running-sum window
    (discretized integer scores). Overflow: n_a·n_b·10⁶ < 2⁶³.

    Returns one row ``(n_a, n_b, d_ppm, split_score)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (scored
            .where(F.col(group_col).isin(a, b)
                   & F.col(score_col).isNotNull())
            .select(F.col(score_col).cast("long").alias("s"),
                    (F.col(group_col) == a).alias("ga")))
    per = base.groupBy("s").agg(
        F.sum(F.col("ga").cast("long")).cast("long").alias("ca"),
        F.sum((~F.col("ga")).cast("long")).cast("long").alias("cb"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    per = per.select(
        "s",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"))
    tot = per.agg(F.coalesce(F.max("cum_a"), F.lit(0)).alias("n_a"),
                  F.coalesce(F.max("cum_b"), F.lit(0)).alias("n_b"))
    j = per.crossJoin(F.broadcast(tot)).select(
        "s", "n_a", "n_b",
        F.abs(F.col("n_b") * F.col("cum_a")
              - F.col("n_a") * F.col("cum_b")).alias("diff"))
    agg = j.groupBy("n_a", "n_b").agg(
        F.max(F.struct(F.col("diff"), (-F.col("s")).alias("ns")))
        .alias("m"))
    num = F.col("m.diff") * F.lit(1_000_000)
    den = F.col("n_a") * F.col("n_b")
    out = agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.when(den == 0, F.lit(1_000_000))
        .otherwise(((num - F.pmod(num, den)) / den).cast("long"))
        .cast("long").alias("d_ppm"),
        (-F.col("m.ns")).cast("long").alias("split_score"))
    empty = tot.where((F.col("n_a") + F.col("n_b")) == 0).select(
        F.lit(0).cast("long").alias("n_a"),
        F.lit(0).cast("long").alias("n_b"),
        F.lit(1_000_000).cast("long").alias("d_ppm"),
        F.lit(0).cast("long").alias("split_score"))
    return out.unionByName(empty)


def ks_test_oracle_sql(scored_sql: str, a: str = "a",
                       b: str = "b") -> str:
    """DuckDB twin of :func:`ks_test`; ``scored_sql`` yields
    (grp, s)."""
    return f"""
with base as materialized (
  select cast(s as bigint) as s, grp = '{a}' as ga
  from ({scored_sql})
  where grp in ('{a}', '{b}') and s is not null),
per as (
  select s,
         cast(sum(case when ga then 1 else 0 end) as bigint) as ca,
         cast(sum(case when ga then 0 else 1 end) as bigint) as cb
  from base group by s),
run as materialized (
  select s,
         cast(sum(ca) over (order by s) as bigint) as cum_a,
         cast(sum(cb) over (order by s) as bigint) as cum_b
  from per),
tot as materialized (
  select cast(coalesce(max(cum_a), 0) as bigint) as n_a,
         cast(coalesce(max(cum_b), 0) as bigint) as n_b from run),
diffs as materialized (
  select s, n_a, n_b,
         abs(n_b * cum_a - n_a * cum_b) as diff
  from run cross join tot),
agg as (
  select n_a, n_b, max(diff) as maxd,
         cast(min(case when diff = (select max(diff) from diffs)
                  then s end) as bigint) as split_score
  from diffs group by n_a, n_b)
select n_a, n_b,
  cast(case when n_a * n_b = 0 then 1000000
       else (maxd * 1000000) // (n_a * n_b) end as bigint) as d_ppm,
  split_score
from agg
union all
select 0, 0, 1000000, 0 from tot where n_a + n_b = 0
"""


def rank_corr(
    pairs: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Spearman rank correlation between two scores — "do my two
    quality scorers ORDER the corpus the same way", the agreement
    question :func:`judge_kappa` answers for categorical judges and
    this answers for continuous ones. Tie-broken variant: ranks are
    row_number over (value, id) — exact average-rank Spearman is not
    integer-expressible, and with a unique ``id`` the tiebreak is
    deterministic in BOTH engines (row_number over a non-unique
    ordering would let each engine pick different permutations of
    duplicate (x, y) rows and silently disagree).

    Exact two-stage floor on the displaced-rank identity
    ρ = 1 − 6·Σd²/(n(n²−1)): q = floor(6·Σd²/(n²−1)), ρ_ppm = 10⁶ −
    floor(q·10⁶/n) — deviation from the single-floor value < 1/n
    ppm, replayed verbatim by the twin. Overflow: 6·Σd² ≤ 2n³ < 2⁶³
    ⇒ n ≲ 1.6·10⁶ — a rank-correlation ESTIMATE samples anyway, and
    the two global row_number sorts are single-task (same bounded
    contract as :func:`score_auc`'s window). n < 2 ⇒ ρ = 10⁶.

    Returns one row ``(n, sum_d2, rho_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    x, y, i = F.col(x_col), F.col(y_col), F.col(id_col)
    base = (pairs.where(x.isNotNull() & y.isNotNull() & i.isNotNull())
            .select(x.alias("x"), y.alias("y"), i.alias("id")))
    rx = F.row_number().over(Window.orderBy("x", "id"))
    ry = F.row_number().over(Window.orderBy("y", "id"))
    r = base.select(
        (rx.cast("long") - ry.cast("long")).alias("d"))
    agg = r.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum(F.col("d") * F.col("d")), F.lit(0))
        .cast("long").alias("sum_d2"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    n = F.col("n")
    q = fdiv(F.lit(6) * F.col("sum_d2"), n * n - 1)
    return agg.select(
        "n", "sum_d2",
        F.when(n < 2, F.lit(1_000_000))
        .otherwise(F.lit(1_000_000) - fdiv(q * F.lit(1_000_000), n))
        .cast("long").alias("rho_ppm"))


def rank_corr_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`rank_corr`; ``pairs_sql`` yields
    (x, y, id)."""
    return f"""
with base as materialized (
  select x, y, id from ({pairs_sql})
  where x is not null and y is not null and id is not null),
r as (
  select cast(row_number() over (order by x, id) as bigint)
           - cast(row_number() over (order by y, id) as bigint) as d
  from base),
agg as (
  select cast(count(*) as bigint) as n,
         cast(coalesce(sum(d * d), 0) as bigint) as sum_d2 from r)
select n, sum_d2,
  cast(case when n < 2 then 1000000
       else 1000000 - (((6 * sum_d2) // (n * n - 1)) * 1000000) // n
       end as bigint) as rho_ppm
from agg
"""


def mann_whitney(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Mann–Whitney U between the score distributions of two named
    slices — the rank-based LOCATION test to :func:`ks_test`'s
    max-gap SHAPE test: does slice ``a`` systematically score higher
    than slice ``b``, robust to any monotone rescaling of the score.

    Exact integers via doubled ranks: per distinct score the pooled
    tie block starting at position ``start`` with ``m`` members
    contributes ``ca·(2·start + m − 1)`` to ``2·ΣR_a`` (twice the
    average-rank sum — average tied ranks are half-integers, so the
    doubled sum is exact where the textbook sum is not). Then
    ``u2 = 2·U_a = 2·ΣR_a − n_a·(n_a+1)`` and the common-language
    effect size ``cles_ppm = floor(u2·10⁶ / (2·n_a·n_b))`` —
    P(a > b) + ½·P(a = b), 500000 = indistinguishable. Either slice
    empty ⇒ cles 500000 by the same convention. Group values outside
    {a, b} are ignored.

    Scale shape mirrors :func:`ks_test`: one scan → per-distinct-
    score combine → one bounded unpartitioned running-sum window over
    discretized integer scores. Overflow: 2·ΣR_a ≤ 2·n² and
    u2·10⁶ ≤ 2·n_a·n_b·10⁶ ⇒ n ≲ 2·10⁶ pooled rows (an A/B eval
    scale; sample above it).

    Returns one row ``(n_a, n_b, u2, cles_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (scored
            .where(F.col(group_col).isin(a, b)
                   & F.col(score_col).isNotNull())
            .select(F.col(score_col).cast("long").alias("s"),
                    (F.col(group_col) == a).alias("ga")))
    per = base.groupBy("s").agg(
        F.sum(F.col("ga").cast("long")).cast("long").alias("ca"),
        F.sum((~F.col("ga")).cast("long")).cast("long").alias("cb"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    m = F.col("ca") + F.col("cb")
    blocks = per.select(
        "ca", "cb",
        (F.sum(m).over(w) - m).cast("long").alias("before"),
        m.cast("long").alias("m"))
    agg = blocks.agg(
        F.coalesce(F.sum("ca"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(
            F.sum(F.col("ca")
                  * (F.lit(2) * (F.col("before") + 1) + F.col("m")
                     - 1)),
            F.lit(0)).cast("long").alias("r2"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    na, nb = F.col("n_a"), F.col("n_b")
    u2 = (F.col("r2") - na * (na + 1)).alias("u2")
    return agg.select(
        "n_a", "n_b", u2.cast("long").alias("u2"),
        F.when(na * nb == 0, F.lit(500_000))
        .otherwise(fdiv((F.col("r2") - na * (na + 1))
                        * F.lit(1_000_000),
                        F.lit(2) * na * nb))
        .cast("long").alias("cles_ppm"))


def mann_whitney_oracle_sql(scored_sql: str, a: str = "a",
                            b: str = "b") -> str:
    """DuckDB twin of :func:`mann_whitney`; ``scored_sql`` yields
    (grp, s)."""
    return f"""
with base as materialized (
  select cast(s as bigint) as s, grp = '{a}' as ga
  from ({scored_sql})
  where grp in ('{a}', '{b}') and s is not null),
per as (
  select s,
         cast(sum(case when ga then 1 else 0 end) as bigint) as ca,
         cast(sum(case when ga then 0 else 1 end) as bigint) as cb
  from base group by s),
blocks as materialized (
  select ca, cb,
         cast(sum(ca + cb) over (order by s) - (ca + cb) as bigint)
           as before_n,
         cast(ca + cb as bigint) as m
  from per),
agg as (
  select cast(coalesce(sum(ca), 0) as bigint) as n_a,
         cast(coalesce(sum(cb), 0) as bigint) as n_b,
         cast(coalesce(sum(ca * (2 * (before_n + 1) + m - 1)), 0)
              as bigint) as r2
  from blocks)
select n_a, n_b,
  cast(r2 - n_a * (n_a + 1) as bigint) as u2,
  cast(case when n_a * n_b = 0 then 500000
       else ((r2 - n_a * (n_a + 1)) * 1000000)
            // (2 * n_a * n_b) end as bigint) as cles_ppm
from agg
"""


def wilson_bounds(
    outcomes: DataFrame,
    group_col: str,
    success_col: str,
) -> DataFrame:
    """Per-group Wilson score interval (z = 2, ≈95.45%) for a success
    rate — ranking judge verdicts, filter pass-rates, or tool success
    by a lower bound instead of the raw mean, so a 3/3 source does not
    outrank a 950/1000 one.

    With ``z² = 4`` the interval is
    ``(k + 2 ± 2·√(k·(n−k)/n + 1)) / (n + 4)``. The root runs on the
    exact integer-sqrt kernel (:func:`~cow_spark.functions.intmath.
    isqrt_col`) over the fixed-point radicand
    ``s = isqrt(4·10^8 · ⌊10^4·(k(n−k)+n)/n⌋)`` — i.e. ``⌊2·10^6·√·⌋``
    of a quantity within 10^-4 of the true radicand — then
    ``lb_ppm = max(0, ⌊((k+2)·10^6 − s) / (n+4)⌋)`` and symmetrically
    ``ub_ppm`` capped at 10^6. Every step is engine-independent
    integer arithmetic (the double sqrt seed is corrected to the exact
    integer floor), so the DuckDB twin replays it bit-for-bit; the
    result sits within a few ppm of textbook Wilson. Bounds: exact for
    ``n ≤ 10^6`` rows per group (radicand ≤ 10^18); ANSI aborts loudly
    past it — sample or shard groups above a million trials.

    Scale shape: one scan, one map-side-partial group-by, then pure
    per-row column math — no window, no second shuffle. NULL successes
    are excluded. Returns ``(grp, n, k, lb_ppm, ub_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from ..functions.intmath import isqrt_col

    base = (outcomes
            .where(F.col(success_col).isNotNull())
            .select(F.col(group_col).alias("grp"),
                    F.col(success_col).cast("boolean").cast("long")
                    .alias("s")))
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("k"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    n, k = F.col("n"), F.col("k")
    rad = fdiv((k * (n - k) + n) * F.lit(10_000), n) * F.lit(400_000_000)
    staged = agg.select("grp", "n", "k",
                        isqrt_col(rad).alias("root"))
    ctr = (F.col("k") + 2) * F.lit(1_000_000)
    den = F.col("n") + 4
    return staged.select(
        "grp", "n", "k",
        F.greatest(F.lit(0), fdiv(ctr - F.col("root"), den))
        .cast("long").alias("lb_ppm"),
        F.least(F.lit(1_000_000), fdiv(ctr + F.col("root"), den))
        .cast("long").alias("ub_ppm"))


def wilson_bounds_oracle_sql(outcomes_sql: str) -> str:
    """DuckDB twin of :func:`wilson_bounds`; ``outcomes_sql`` yields
    (grp, s) with s boolean-ish. The isqrt seed+2-correction chain is
    staged through CTEs (each round references its input ~5×)."""
    from ..functions.intmath import isqrt_fix_sql, isqrt_seed_sql

    return f"""
with base as (
  select grp, cast(cast(s as boolean) as bigint) as s
  from ({outcomes_sql}) where s is not null),
agg as (
  select grp, cast(count(*) as bigint) as n,
         cast(sum(s) as bigint) as k
  from base group by grp),
rad as (
  select grp, n, k,
         cast(((k * (n - k) + n) * 10000) // n * 400000000 as bigint)
           as x
  from agg),
t0 as (select grp, n, k, x,
              cast({isqrt_seed_sql('x')} as bigint) as t from rad),
t1 as (select grp, n, k, x,
              cast({isqrt_fix_sql('t', 'x')} as bigint) as t from t0),
t2 as (select grp, n, k,
              cast({isqrt_fix_sql('t', 'x')} as bigint) as root
       from t1)
select grp, n, k,
  cast(greatest(0, ((k + 2) * 1000000 - root) // (n + 4))
       as bigint) as lb_ppm,
  cast(least(1000000, ((k + 2) * 1000000 + root) // (n + 4))
       as bigint) as ub_ppm
from t2
"""


def runs_test(df: DataFrame, grp_col: str, ord_col: str,
              flag_col: str) -> DataFrame:
    """Wald–Wolfowitz runs test per group — is a binary sequence
    RANDOMLY ordered, or does it clump (drift, batch effects, a
    quality gate whose pass/fail streaks follow the crawl order)?
    ks_test/cusum_alarm read a score's level; this reads pure
    ordering: too FEW runs = clustering, too MANY = alternation.

    Exact integers end to end: runs ``R = 1 + Σ[x_t ≠ x_{t−1}]`` over
    the ``ord_col``-ordered sequence (``ord_col`` must be unique per
    group — equal keys would make the run count genuinely ambiguous),
    then with ``N1 = R·n − n − 2·n1·n0`` (the μ-centered numerator
    scaled by n) and ``D = 2·n1·n0·(2·n1·n0 − n)·(n − 1)`` (≥ 0
    always),

        z_ppm = sign(N1) · (10^6·|N1|·(n−1)) // ⌊√D⌋

    on the exact isqrt kernel — the magnitude-floored convention keeps
    +z/−z symmetric, and a degenerate group (one value only, or n=1)
    reads z = 0. Overflow contract: D grows as n⁵/4, so n ≤ 8000 per
    group (bucket or sample longer sequences); ANSI aborts loudly
    past it. One keyed window (lag) + one partial-agg groupBy; all
    downstream math on the group-sized table. Returns
    (grp, n, n1, runs, z_ppm).
    """
    from ..functions.intmath import isqrt_col

    base = df.select(F.col(grp_col).alias("grp"),
                     F.col(ord_col).alias("o"),
                     F.col(flag_col).cast("boolean").alias("x")) \
             .where(F.col("x").isNotNull())
    w = Window.partitionBy("grp").orderBy("o")
    prev = F.lag("x").over(w)
    ch = base.select(
        "grp", F.col("x").cast("long").alias("xi"),
        (prev.isNotNull() & (F.col("x") != prev)).cast("long")
        .alias("chg"))
    agg = ch.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xi").cast("long").alias("n1"),
        (F.lit(1) + F.sum("chg")).cast("long").alias("runs"))
    n, n1 = F.col("n"), F.col("n1")
    n0 = n - n1
    num = F.col("runs") * n - n - 2 * n1 * n0
    d = 2 * n1 * n0 * (2 * n1 * n0 - n) * (n - 1)
    root = isqrt_col(d)
    scored = agg.select(
        "grp", "n", "n1", "runs",
        num.alias("_num"), root.alias("_root"))
    mag = F.expr("(1000000 * abs(_num) * (n - 1)) div _root")
    z = (F.when(F.col("_root") > 0,
                F.when(F.col("_num") < 0, -mag).otherwise(mag))
         .otherwise(F.lit(0)))
    return scored.select("grp", "n", "n1", "runs",
                         z.cast("long").alias("z_ppm"))


def runs_test_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`runs_test`; ``rows_sql`` yields
    (grp, o, x) with x boolean-ish and o unique per group."""
    from ..functions.intmath import isqrt_fix_sql, isqrt_seed_sql

    return f"""
with base as (
  select grp, o, cast(x as boolean) as x
  from ({rows_sql}) where x is not null),
ch as (
  select grp, cast(x as bigint) as xi,
         case when lag(x) over (partition by grp order by o)
                   is not null
               and x <> lag(x) over (partition by grp order by o)
              then 1 else 0 end as chg
  from base),
agg as (
  select grp, cast(count(*) as bigint) as n,
         cast(sum(xi) as bigint) as n1,
         cast(1 + sum(chg) as bigint) as runs
  from ch group by grp),
terms as (
  select grp, n, n1, runs,
         cast(runs * n - n - 2 * n1 * (n - n1) as bigint) as num,
         cast(2 * n1 * (n - n1) * (2 * n1 * (n - n1) - n) * (n - 1)
              as bigint) as x
  from agg),
t0 as (select *, cast({isqrt_seed_sql('x')} as bigint) as t
       from terms),
t1 as (select grp, n, n1, runs, num, x,
              cast({isqrt_fix_sql('t', 'x')} as bigint) as t from t0),
t2 as (select grp, n, n1, runs, num,
              cast({isqrt_fix_sql('t', 'x')} as bigint) as root
       from t1)
select grp, n, n1, runs,
  cast(case when root > 0
            then sign(num) * ((1000000 * abs(num) * (n - 1)) // root)
            else 0 end as bigint) as z_ppm
from t2
"""


def ab_lift(df: DataFrame, exp_col: str, variant_col: str,
            success_col: str) -> DataFrame:
    """Two-proportion A/B comparison with a Newcombe score interval —
    the decision layer over :func:`wilson_bounds`: per experiment,
    the lift between its two variants and a 95%-ish (z=2) interval
    that respects the boundary (no normal-approx negative-rate
    nonsense at k≈0). An interval excluding 0 is the ship/rollback
    signal.

    Variants pair by name order (ascending — the lower-sorting name is
    side a, lift = p_a − p_b); experiments with ≠ 2 distinct variants
    are EXCLUDED (a 3-arm test needs pairwise calls — silently picking
    two arms would be a wrong answer). Per side, Wilson z=2 bounds on
    the exact isqrt kernel (the wilson_bounds radicand verbatim);
    then Newcombe:

        lo = d − ⌊√((p₁−l₁)² + (u₂−p₂)²)⌋
        hi = d + ⌊√((u₁−p₁)² + (p₂−l₂)²)⌋

    all in exact ppm. Plan hygiene note: the per-side Wilson columns
    materialize through their own projection BEFORE pairing, so the
    Newcombe radicals square COLUMN REFERENCES — inlining the full
    per-side isqrt trees into the final radicals multiplies the
    expression tree to analyzer-choking size (measured: 3 min → 13 s
    on the 3-experiment fixture). One partial-agg groupBy, one
    pivot-by-minmax, experiment-count-sized output. Returns (exp,
    variant_a, variant_b, n_a, k_a, n_b, k_b, lift_ppm, lo_ppm,
    hi_ppm).
    """
    from ..functions.intmath import isqrt_col

    per = (df.select(F.col(exp_col).alias("exp"),
                     F.col(variant_col).alias("var"),
                     F.col(success_col).cast("boolean").cast("long")
                     .alias("s"))
           .where(F.col("s").isNotNull())
           .groupBy("exp", "var")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("s").cast("long").alias("k")))
    n, k = F.col("n"), F.col("k")
    rad = ((((k * (n - k) + n) * F.lit(10_000)
             - F.pmod((k * (n - k) + n) * F.lit(10_000), n)) / n)
           .cast("long") * F.lit(400_000_000))
    rooted = per.select("exp", "var", "n", "k",
                        isqrt_col(rad).alias("_root"))
    root = F.col("_root")
    # numerator can only go negative where both engines clamp to 0
    # anyway (greatest below), so the floor/truncate edge is moot
    sides = rooted.select(
        "exp", "var", "n", "k",
        ((k * F.lit(1_000_000)
          - F.pmod(k * F.lit(1_000_000), n)) / n).cast("long")
        .alias("p"),
        F.greatest(
            F.lit(0),
            (((k + 2) * F.lit(1_000_000) - root
              - F.pmod((k + 2) * F.lit(1_000_000) - root, n + 4))
             / (n + 4)).cast("long")).alias("lb"),
        F.least(
            F.lit(1_000_000),
            (((k + 2) * F.lit(1_000_000) + root
              - F.pmod((k + 2) * F.lit(1_000_000) + root, n + 4))
             / (n + 4)).cast("long")).alias("ub"))
    paired = (sides.groupBy("exp")
              .agg(F.countDistinct("var").alias("_nv"),
                   F.min_by(F.struct("var", "n", "k", "p", "lb", "ub"),
                            F.col("var")).alias("_a"),
                   F.max_by(F.struct("var", "n", "k", "p", "lb", "ub"),
                            F.col("var")).alias("_b"))
              .where(F.col("_nv") == 2))
    flat = paired.select(
        "exp", F.col("_a.var").alias("variant_a"),
        F.col("_b.var").alias("variant_b"),
        F.col("_a.n").alias("n_a"), F.col("_a.k").alias("k_a"),
        F.col("_b.n").alias("n_b"), F.col("_b.k").alias("k_b"),
        F.col("_a.p").alias("_p1"), F.col("_a.lb").alias("_l1"),
        F.col("_a.ub").alias("_u1"),
        F.col("_b.p").alias("_p2"), F.col("_b.lb").alias("_l2"),
        F.col("_b.ub").alias("_u2"))
    p1, l1, u1 = F.col("_p1"), F.col("_l1"), F.col("_u1")
    p2, l2, u2 = F.col("_p2"), F.col("_l2"), F.col("_u2")
    d = p1 - p2
    lo = d - isqrt_col(((p1 - l1) * (p1 - l1)
                        + (u2 - p2) * (u2 - p2)).cast("long"))
    hi = d + isqrt_col(((u1 - p1) * (u1 - p1)
                        + (p2 - l2) * (p2 - l2)).cast("long"))
    return flat.select(
        "exp", "variant_a", "variant_b", "n_a", "k_a", "n_b", "k_b",
        d.cast("long").alias("lift_ppm"),
        lo.cast("long").alias("lo_ppm"),
        hi.cast("long").alias("hi_ppm"))


def ab_lift_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`ab_lift`; ``rows_sql`` yields
    (exp, var, s). Four isqrt chains (two Wilson roots, two Newcombe
    radicands) staged through parallel seed/fix CTE columns."""
    from ..functions.intmath import isqrt_fix_sql, isqrt_seed_sql

    return f"""
with base as (
  select exp, var, cast(cast(s as boolean) as bigint) as s
  from ({rows_sql}) where s is not null),
per as (
  select exp, var, cast(count(*) as bigint) as n,
         cast(sum(s) as bigint) as k
  from base group by exp, var),
paired as (
  select exp,
         min_by({{'v': var, 'n': n, 'k': k}}, var) as a,
         max_by({{'v': var, 'n': n, 'k': k}}, var) as b
  from per group by exp
  having count(distinct var) = 2),
rads as (
  select exp, a.v as va, b.v as vb,
         a.n as na, a.k as ka, b.n as nb, b.k as kb,
         cast(((a.k * (a.n - a.k) + a.n) * 10000) // a.n
              * 400000000 as bigint) as xa,
         cast(((b.k * (b.n - b.k) + b.n) * 10000) // b.n
              * 400000000 as bigint) as xb
  from paired),
s0 as (select *, cast({isqrt_seed_sql('xa')} as bigint) as ta,
              cast({isqrt_seed_sql('xb')} as bigint) as tb
       from rads),
s1 as (select exp, va, vb, na, ka, nb, kb, xa, xb,
              cast({isqrt_fix_sql('ta', 'xa')} as bigint) as ta,
              cast({isqrt_fix_sql('tb', 'xb')} as bigint) as tb
       from s0),
s2 as (select exp, va, vb, na, ka, nb, kb,
              cast({isqrt_fix_sql('ta', 'xa')} as bigint) as ra,
              cast({isqrt_fix_sql('tb', 'xb')} as bigint) as rb
       from s1),
bounds as (
  select exp, va, vb, na, ka, nb, kb,
         (ka * 1000000) // na as p1,
         greatest(0, ((ka + 2) * 1000000 - ra) // (na + 4)) as l1,
         least(1000000, ((ka + 2) * 1000000 + ra) // (na + 4)) as u1,
         (kb * 1000000) // nb as p2,
         greatest(0, ((kb + 2) * 1000000 - rb) // (nb + 4)) as l2,
         least(1000000, ((kb + 2) * 1000000 + rb) // (nb + 4)) as u2
  from s2),
nrad as (
  select *, cast((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2)
                 as bigint) as xlo,
            cast((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2)
                 as bigint) as xhi
  from bounds),
n0 as (select *, cast({isqrt_seed_sql('xlo')} as bigint) as tlo,
              cast({isqrt_seed_sql('xhi')} as bigint) as thi
       from nrad),
n1 as (select exp, va, vb, na, ka, nb, kb, p1, p2, xlo, xhi,
              cast({isqrt_fix_sql('tlo', 'xlo')} as bigint) as tlo,
              cast({isqrt_fix_sql('thi', 'xhi')} as bigint) as thi
       from n0),
n2 as (select exp, va, vb, na, ka, nb, kb, p1, p2,
              cast({isqrt_fix_sql('tlo', 'xlo')} as bigint) as rlo,
              cast({isqrt_fix_sql('thi', 'xhi')} as bigint) as rhi
       from n1)
select exp, va as variant_a, vb as variant_b,
       na as n_a, ka as k_a, nb as n_b, kb as k_b,
       cast(p1 - p2 as bigint) as lift_ppm,
       cast(p1 - p2 - rlo as bigint) as lo_ppm,
       cast(p1 - p2 + rhi as bigint) as hi_ppm
from n2
"""


def krippendorff_alpha(df: DataFrame, item_col: str, cat_col: str) -> DataFrame:
    """Krippendorff's alpha (nominal) — inter-annotator agreement when
    raters are MANY and ragged (every item judged by a different
    subset, missing judgments everywhere): the multi-judge
    generalization of :func:`judge_kappa`, and the number an
    LLM-judge ensemble must clear before its labels are trusted.

    Canonical coincidence form over items with ≥ 2 judgments:

        α = 1 − (n−1)·Σ_i Σ_c o_ic(n_i−o_ic)/(n_i−1)
                 / Σ_c n_c(n−n_c)

    Exact fixed point: the only non-integer is the per-item
    1/(n_i−1); each item's disagreement ``S_i = Σ_c o_ic(n_i−o_ic)``
    scales to ``t_i = ⌊10^6·S_i/(n_i−1)⌋`` (pmod-floored exactly, so
    the spec deviates from the real sum by < #items·10^-6 of a
    pair), and

        alpha_ppm = 10^6 − sign-magnitude ⌊10^6·(n−1)·Σt_i / (10^6·D_e)⌋

    with D_e = Σ_c n_c(n−n_c). Perfect agreement reads exactly 10^6;
    D_e = 0 (one category total) reads 10^6 by convention (nothing to
    disagree about). Overflow contract: (n−1)·do6 with do6 ≤ n·10^6
    bounds n at ~3·10^6 judgments — ANSI aborts loudly beyond.

    One scan → (item, cat) combine → item-sized and category-sized
    partial aggs → a 1-row result. NULL items/categories excluded.
    Returns (n_items, n_judgments, alpha_ppm).
    """
    base = (df.select(F.col(item_col).alias("it"),
                      F.col(cat_col).alias("c"))
            .where(F.col("it").isNotNull() & F.col("c").isNotNull()))
    oc = base.groupBy("it", "c").agg(
        F.count(F.lit(1)).cast("long").alias("o"))
    ni = oc.groupBy("it").agg(F.sum("o").cast("long").alias("ni")) \
        .where(F.col("ni") >= 2)
    j = oc.join(ni, "it")

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    si = j.groupBy("it", "ni").agg(
        F.sum(F.col("o") * (F.col("ni") - F.col("o"))).cast("long")
        .alias("s"))
    ti = si.select(
        "ni", fdiv(F.col("s") * F.lit(1_000_000), F.col("ni") - 1)
        .alias("t"))
    tot = ti.agg(F.sum("t").cast("long").alias("do6"),
                 F.sum("ni").cast("long").alias("n"))
    nc = (j.groupBy("c").agg(F.sum("o").cast("long").alias("nc"))
          .crossJoin(F.broadcast(tot))
          .groupBy("do6", "n")
          .agg(F.sum(F.col("nc") * (F.col("n") - F.col("nc")))
               .cast("long").alias("de")))
    # α = 1 − (n−1)·D_o/(n·D_e) with D_o carrying the 10^6 scale in
    # do6: the textbook form multiplies num and den by another 10^6,
    # which overflows int64 near n ≈ 3·10^4 (caught by the sf0.1
    # replay, r4) — the shared factor cancels EXACTLY under floor
    # (floor(a·k/(b·k)) = floor(a/b)), so divide it out of both limbs
    num = (F.col("n") - 1) * F.col("do6")
    ratio = fdiv(num, F.col("de"))
    n_items = ni.count()
    return nc.select(
        F.lit(n_items).cast("long").alias("n_items"),
        F.col("n").alias("n_judgments"),
        F.when(F.col("de") > 0,
               F.lit(1_000_000) - ratio)
        .otherwise(F.lit(1_000_000)).cast("long").alias("alpha_ppm"))


def krippendorff_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`krippendorff_alpha`; ``rows_sql`` yields
    (it, c)."""
    return f"""
with base as (
  select it, c from ({rows_sql})
  where it is not null and c is not null),
oc as (
  select it, c, cast(count(*) as bigint) as o
  from base group by it, c),
ni as (
  select it, cast(sum(o) as bigint) as ni from oc group by it
  having sum(o) >= 2),
j as materialized (select oc.it, oc.c, oc.o, ni.ni
                   from oc join ni on oc.it = ni.it),
si as (
  select it, ni, cast(sum(o * (ni - o)) as bigint) as s
  from j group by it, ni),
tot as (
  select cast(sum((s * 1000000) // (ni - 1)) as bigint) as do6,
         cast(sum(ni) as bigint) as n,
         cast(count(*) as bigint) as n_items
  from si),
de as (
  select cast(sum(nc * (n - nc)) as bigint) as de, do6, n, n_items
  from (select c, cast(sum(o) as bigint) as nc from j group by c)
       cross join tot
  group by do6, n, n_items)
select n_items, n as n_judgments,
  cast(case when de > 0 then
         1000000 - ((n - 1) * do6) // de
       else 1000000 end as bigint) as alpha_ppm
from de
"""


def kaplan_meier(
    df: DataFrame,
    group_col: str,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve per group with right-censoring —
    the duration analytics the retention triangle can't give: "how
    long until a user churns / a session dies / a job fails",
    counting still-alive (censored) units correctly instead of
    dropping them (the bias every naive mean-duration suffers).
    ``event_col`` is 1 for an observed event, 0 for censored-at-
    duration.

    Exact integer surface — survival is reported in LOG2 fixed point:

        S(t) = Π_{tᵢ ≤ t} (nᵢ − dᵢ)/nᵢ
        surv_log2_fp(t) = Σ (L(nᵢ−dᵢ) − L(nᵢ))   [1/1024-bit units]

    The product never materializes as a float (engines would drift);
    the log form is a plain cumulative sum of kernel values, ≤ 0,
    with 2^(fp/1024) recovering S client-side. When a step's
    n−d = 0 (everyone remaining dies) S hits exactly 0 and every
    later point reports NULL ``surv_log2_fp`` — a sticky flag, since
    SQL SUM would silently skip the −∞ term.

    Scale shape: (group, duration) partial agg → per-group windows
    over the DISTINCT-duration table (at-risk = reverse cumulative
    count, survival = forward cumulative sum — both ride one keyed
    sort); curve rows only at durations with ≥1 observed event, the
    KM convention. Returns ``(grp, t, n_risk, d, surv_log2_fp)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from ..functions.intmath import with_log2_fp

    base = (df.select(F.col(group_col).alias("g"),
                      F.col(duration_col).cast("long").alias("t"),
                      (F.col(event_col).cast("long") != 0).alias("ev"))
            .where(F.col(group_col).isNotNull()
                   & F.col(duration_col).isNotNull()
                   & F.col(event_col).isNotNull()))
    per_t = base.groupBy("g", "t").agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("ev").cast("long")).cast("long").alias("d"))
    w_desc = (Window.partitionBy("g").orderBy(F.col("t").desc())
              .rowsBetween(Window.unboundedPreceding, 0))
    risked = per_t.withColumn(
        "n_risk", F.sum("m").over(w_desc).cast("long"))
    ev_rows = risked.where(F.col("d") > 0).withColumn(
        "rem", (F.col("n_risk") - F.col("d")).cast("long"))
    ev_rows = with_log2_fp(ev_rows, "n_risk", "ln")
    # rem = 0 → log2(0) = −∞: with_log2_fp yields NULL there, and the
    # sticky-zero window below turns NULL into "survival exactly 0"
    ev_rows = with_log2_fp(ev_rows, "rem", "lr")
    w_asc = (Window.partitionBy("g").orderBy("t")
             .rowsBetween(Window.unboundedPreceding, 0))
    zero_seen = F.max((F.col("rem") == 0).cast("int")).over(w_asc)
    cum = F.sum(F.col("lr") - F.col("ln")).over(w_asc)
    return (ev_rows
            .withColumn("_z", zero_seen)
            .select(F.col("g").alias("grp"), "t", "n_risk", "d",
                    F.when(F.col("_z") == 0, cum).cast("long")
                    .alias("surv_log2_fp")))


def kaplan_meier_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`kaplan_meier`; ``rows_sql`` yields
    ``(g, t, ev)``."""
    from ..functions.intmath import log2_fp_sql

    ln = log2_fp_sql("n_risk")
    lr = log2_fp_sql("rem")
    return f"""
with base as (
  select g, cast(t as bigint) as t,
         case when cast(ev as bigint) <> 0 then 1 else 0 end as ev
  from ({rows_sql})
  where g is not null and t is not null and ev is not null),
per_t as (
  select g, t, cast(count(*) as bigint) as m,
         cast(sum(ev) as bigint) as d
  from base group by g, t),
risked as (
  select g, t, m, d,
         cast(sum(m) over (partition by g order by t desc
           rows between unbounded preceding and current row)
           as bigint) as n_risk
  from per_t),
ev_rows as (
  select g, t, d, n_risk, n_risk - d as rem
  from risked where d > 0),
kern as (
  select g, t, d, n_risk, rem,
         case when rem > 0 then {lr} - {ln} end as step
  from ev_rows),
curve as (
  select g, t, d, n_risk,
         max(case when rem = 0 then 1 else 0 end)
           over w as z,
         sum(step) over w as cum
  from kern
  window w as (partition by g order by t
               rows between unbounded preceding and current row))
select g as grp, t, n_risk, d,
       cast(case when z = 0 then cum end as bigint) as surv_log2_fp
from curve
"""


def benjamini_hochberg(
    df: DataFrame,
    family_col: str,
    test_col: str,
    p_col: str,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Benjamini-Hochberg FDR control per test family — the
    multiple-comparisons layer over this repo's test battery
    (:func:`chi_square`, :func:`ks_test`, :func:`mann_whitney`, …):
    run one drift test per slice × metric and a twentieth of them
    are "significant" by luck at α=0.05; BH keeps the EXPECTED
    false-discovery fraction at α by the step-up rule

        k* = max{ k : p₍ₖ₎ ≤ k·α/m },  reject ranks ≤ k*.

    All-integer: p in ppm, the comparison cross-multiplies
    (``p_ppm·m ≤ rank·alpha_ppm``) so no division ever happens;
    ranks break p-ties by test id (ties share the decision anyway —
    the step-up rule's monotonicity — but the RANK column must be
    deterministic for replay). Overflow: p_ppm·m < 2⁶³ for
    m < 9·10¹² tests.

    One family-keyed window (rank + the k* running max ride the same
    sort). Returns ``(family, test_id, p_ppm, rnk, rejected)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (df.select(F.col(family_col).alias("fam"),
                      F.col(test_col).cast("string").alias("tid"),
                      F.col(p_col).cast("long").alias("p_ppm"))
            .where(F.col(family_col).isNotNull()
                   & F.col(test_col).isNotNull()
                   & F.col(p_col).isNotNull()))
    w = Window.partitionBy("fam").orderBy("p_ppm", "tid")
    wall = Window.partitionBy("fam")
    ranked = (base
              .withColumn("rnk", F.row_number().over(w).cast("long"))
              .withColumn("m", F.count(F.lit(1)).over(wall)
                          .cast("long")))
    ok_rank = F.when(
        F.col("p_ppm") * F.col("m")
        <= F.col("rnk") * F.lit(int(alpha_ppm)), F.col("rnk"))
    kstar = F.max(ok_rank).over(wall)
    return (ranked.withColumn("_k", kstar)
            .select(F.col("fam").alias("family"),
                    F.col("tid").alias("test_id"), "p_ppm", "rnk",
                    (F.col("_k").isNotNull()
                     & (F.col("rnk") <= F.col("_k")))
                    .alias("rejected")))


def benjamini_hochberg_oracle_sql(rows_sql: str,
                                  alpha_ppm: int = 50_000) -> str:
    """DuckDB twin of :func:`benjamini_hochberg`; ``rows_sql`` yields
    ``(fam, tid, p_ppm)``."""
    return f"""
with base as (
  select fam, cast(tid as varchar) as tid,
         cast(p_ppm as bigint) as p_ppm
  from ({rows_sql})
  where fam is not null and tid is not null and p_ppm is not null),
ranked as (
  select fam, tid, p_ppm,
         cast(row_number() over (partition by fam
           order by p_ppm, tid) as bigint) as rnk,
         cast(count(*) over (partition by fam) as bigint) as m
  from base),
marked as (
  select fam, tid, p_ppm, rnk,
         max(case when p_ppm * m <= rnk * {int(alpha_ppm)}
             then rnk end) over (partition by fam) as kstar
  from ranked)
select fam as family, tid as test_id, p_ppm, rnk,
       (kstar is not null and rnk <= kstar) as rejected
from marked
"""


def conformal_threshold(
    df: DataFrame,
    group_col: str,
    split_col: str,
    score_col: str,
    alpha_ppm: int = 100_000,
    cal_label: str = "cal",
    eval_label: str = "eval",
) -> DataFrame:
    """Split-conformal threshold + achieved coverage per group — the
    distribution-free guarantee layer over every scorer in this repo
    (judge scores, :func:`~cow_spark.operators.quality.
    classifier_score`, surprisal): pick the calibration
    nonconformity quantile at rank ⌈(n+1)(1−α)⌉ and accepting
    eval points with score ≤ threshold covers ≥ 1−α in expectation —
    no assumption on the score distribution, which is exactly the
    setting of an LLM judge whose scale drifts.

    Exact spec: scores are pre-quantized ints (repo discipline);
    rank r = ((n_cal+1)·(10⁶−α)) ceil-div 10⁶, clamped to n_cal;
    ceil-div on positive ints is ``(x + d − 1) div d`` — NOT the
    ``−((−x) div d)`` identity, which requires FLOORING division and
    both engines truncate;
    the threshold is the r-th smallest calibration score (VALUE at
    rank — ties don't matter), coverage = eval points ≤ threshold in
    floor ppm. Groups with an empty calibration split report NULLs
    (no fake guarantee); empty eval reports NULL coverage.

    One group-keyed window on the calibration slice + one broadcast
    join onto the eval slice's group aggregate. Returns ``(grp,
    n_cal, rnk, threshold, n_eval, coverage_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (df.select(F.col(group_col).alias("g"),
                      F.col(split_col).alias("sp"),
                      F.col(score_col).cast("long").alias("s"))
            .where(F.col(group_col).isNotNull()
                   & F.col(split_col).isin(cal_label, eval_label)
                   & F.col(score_col).isNotNull()))
    cal = base.where(F.col("sp") == cal_label)
    w = Window.partitionBy("g").orderBy(F.col("s").asc())
    ranked = (cal.withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy("g"))))
    qn = 1_000_000 - int(alpha_ppm)
    rnk = F.least(
        F.expr(f"((_n + 1) * {qn} + 999999) div 1000000"),
        F.col("_n").cast("long")).cast("long")
    thr = (ranked.withColumn("_r", rnk)
           .where(F.col("_rn") == F.col("_r"))
           .groupBy("g")
           .agg(F.max("_n").cast("long").alias("n_cal"),
                F.max("_r").cast("long").alias("rnk"),
                F.min("s").cast("long").alias("threshold")))
    ev = base.where(F.col("sp") == eval_label)
    groups = base.select("g").distinct()
    evj = (ev.join(F.broadcast(thr), "g", "left")
           .groupBy("g")
           .agg(F.count("*").cast("long").alias("n_eval"),
                F.sum((F.col("s") <= F.col("threshold"))
                      .cast("long")).cast("long").alias("cov")))
    out = (groups.join(thr, "g", "left").join(evj, "g", "left"))
    cov_ppm = F.expr("(cov * 1000000) div n_eval")
    return out.select(
        F.col("g").alias("grp"), "n_cal", "rnk", "threshold",
        F.coalesce("n_eval", F.lit(0)).cast("long").alias("n_eval"),
        F.when(F.col("threshold").isNotNull()
               & (F.coalesce("n_eval", F.lit(0)) > 0), cov_ppm)
        .cast("long").alias("coverage_ppm"))


def conformal_threshold_oracle_sql(rows_sql: str,
                                   alpha_ppm: int = 100_000,
                                   cal_label: str = "cal",
                                   eval_label: str = "eval") -> str:
    """DuckDB twin of :func:`conformal_threshold`; ``rows_sql``
    yields ``(g, sp, s)``."""
    q = 1_000_000 - int(alpha_ppm)
    return f"""
with base as (
  select g, sp, cast(s as bigint) as s
  from ({rows_sql})
  where g is not null and sp in ('{cal_label}', '{eval_label}')
    and s is not null),
cal as (
  select g, s,
         row_number() over (partition by g order by s) as rn,
         count(*) over (partition by g) as n
  from base where sp = '{cal_label}'),
thr as (
  select g, cast(max(n) as bigint) as n_cal,
         cast(max(r) as bigint) as rnk,
         cast(min(s) as bigint) as threshold
  from (select g, s, rn, n,
               least(((n + 1) * {q} + 999999) // 1000000, n) as r
        from cal)
  where rn = r group by g),
ev as (
  select base.g, cast(count(*) as bigint) as n_eval,
         cast(sum(case when s <= threshold then 1 else 0 end)
              as bigint) as cov
  from base left join thr on base.g = thr.g
  where sp = '{eval_label}' group by base.g)
select g as grp, n_cal, rnk, threshold,
       cast(coalesce(n_eval, 0) as bigint) as n_eval,
       cast(case when threshold is not null
                  and coalesce(n_eval, 0) > 0
            then (cov * 1000000) // n_eval end as bigint)
         as coverage_ppm
from (select distinct g from base)
left join thr using (g) left join ev using (g)
"""


def cuped_adjust(
    df: DataFrame,
    arm_col: str,
    y_col: str,
    x_col: str,
) -> DataFrame:
    """CUPED variance reduction for A/B metrics — the standard
    pre-period-covariate adjustment (θ = cov(x,y)/var(x), pooled)
    that cuts experiment runtimes: :func:`ab_lift` decides FROM
    means, this makes those means decisively tighter when a
    pre-experiment covariate (last month's activity, baseline score)
    correlates with the metric.

    Exact integer spec: θ in ppm from the same decimal-lane sums as
    :func:`~.stats.grouped_linfit` (n·Σxy − ΣxΣy over n·Σx² −
    (Σx)²); the adjusted metric per unit is

        adj_ppm = y·10⁶ − θ_ppm·x + (θ_ppm·Σx) div n    [one floor]

    and the headline ``varred_ppm`` = 10⁶ − (n·Σadj² − (Σadj)²)·10⁶
    div (scaled y SSQ) — the fraction of metric variance the
    covariate removed, computed entirely in DECIMAL(38)/HUGEINT and
    cast to bigint only at the output. Zero x-variance (or n < 2)
    degrades gracefully: θ = 0, adjustment is the identity,
    varred 0.

    One pass of sums (1-row broadcast), one map over units, one
    per-arm aggregate. Returns per-arm ``(arm, n, mean_y_ppm,
    mean_adj_ppm, theta_ppm, varred_ppm)`` — θ/varred are global,
    repeated per row for a flat schema.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    d38 = "decimal(38,0)"
    base = (df.select(F.col(arm_col).cast("string").alias("arm"),
                      F.col(y_col).cast("long").alias("y"),
                      F.col(x_col).cast("long").alias("x"))
            .where(F.col(arm_col).isNotNull() & F.col(y_col).isNotNull()
                   & F.col(x_col).isNotNull()))
    g = base.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        * F.lit(1_000_000).cast(d38)
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    theta = F.when(
        (F.col("n") >= 2) & (den != 0),
        ((num - num % den) / den).cast("long")).otherwise(F.lit(0))
    g = g.withColumn("theta_ppm", theta.cast("long"))
    shift_num = F.col("theta_ppm").cast(d38) * F.col("sx")
    shift = ((shift_num - shift_num % F.col("n")) / F.col("n")) \
        .cast("long")
    g = g.select("n", "sx", "sy", "theta_ppm",
                 shift.alias("shift_ppm")).persist()
    j = base.crossJoin(F.broadcast(g))
    adj = (F.col("y") * F.lit(1_000_000)
           - F.col("theta_ppm") * F.col("x")
           + F.col("shift_ppm")).cast("long")
    ju = j.withColumn("adj", adj)
    tot = ju.agg(
        F.count("*").cast(d38).alias("tn"),
        F.sum(F.col("adj").cast(d38)).alias("sa"),
        F.sum(F.col("adj").cast(d38) * F.col("adj").cast(d38))
        .alias("saa"),
        F.sum((F.col("y") * F.lit(1_000_000)).cast(d38)).alias("sy6"),
        F.sum((F.col("y") * F.lit(1_000_000)).cast(d38)
              * (F.col("y") * F.lit(1_000_000)).cast(d38))
        .alias("syy6"))
    ssa = F.col("tn") * F.col("saa") - F.col("sa") * F.col("sa")
    ssy = F.col("tn") * F.col("syy6") - F.col("sy6") * F.col("sy6")
    vnum = ssa * F.lit(1_000_000).cast(d38)
    varred = F.when(
        ssy > 0,
        F.lit(1_000_000)
        - ((vnum - vnum % ssy) / ssy).cast("long")).otherwise(F.lit(0))
    tot = tot.select(varred.cast("long").alias("varred_ppm"))
    per_arm = (ju.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("(sum(y) * 1000000) div count(*)").cast("long")
        .alias("mean_y_ppm"),
        F.expr("sum(adj) div count(*)").cast("long")
        .alias("mean_adj_ppm"),
        F.max("theta_ppm").cast("long").alias("theta_ppm")))
    out = per_arm.crossJoin(F.broadcast(tot)).select(
        "arm", "n", "mean_y_ppm", "mean_adj_ppm", "theta_ppm",
        "varred_ppm")
    from ..operators.dedup import _attach_persisted
    return _attach_persisted(out, g)


def cuped_adjust_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`cuped_adjust`; ``rows_sql`` yields
    ``(arm, y, x)``. HUGEINT carries every square; bigint only at
    the output."""
    return f"""
with base as materialized (
  select cast(arm as varchar) as arm, cast(y as bigint) as y,
         cast(x as bigint) as x
  from ({rows_sql})
  where arm is not null and y is not null and x is not null),
g as materialized (
  select count(*) as n, sum(x) as sx, sum(y) as sy,
         sum(x * y) as sxy, sum(x * x) as sxx
  from base),
th as materialized (
  select n, sx,
         cast(case when n >= 2 and n * sxx - sx * sx <> 0
              then ((n * sxy - sx * sy) * 1000000)
                   // (n * sxx - sx * sx) else 0 end as bigint)
           as theta_ppm
  from g),
sh as materialized (
  select n, theta_ppm,
         cast((theta_ppm * sx) // n as bigint) as shift_ppm
  from th),
adjusted as materialized (
  select arm, y, theta_ppm,
         cast(y * 1000000 - theta_ppm * x + shift_ppm as bigint)
           as adj
  from base cross join sh),
tot as (
  select cast(case when count(*) * sum(cast(y as hugeint) * 1000000
                        * cast(y as hugeint) * 1000000)
                   - sum(cast(y as hugeint) * 1000000)
                     * sum(cast(y as hugeint) * 1000000) > 0
       then 1000000 -
         ((count(*) * sum(cast(adj as hugeint) * adj)
           - sum(cast(adj as hugeint)) * sum(cast(adj as hugeint)))
          * 1000000)
         // (count(*) * sum(cast(y as hugeint) * 1000000
                            * cast(y as hugeint) * 1000000)
             - sum(cast(y as hugeint) * 1000000)
               * sum(cast(y as hugeint) * 1000000))
       else 0 end as bigint) as varred_ppm
  from adjusted)
select arm, cast(count(*) as bigint) as n,
       cast((sum(y) * 1000000) // count(*) as bigint) as mean_y_ppm,
       cast(sum(adj) // count(*) as bigint) as mean_adj_ppm,
       cast(max(theta_ppm) as bigint) as theta_ppm,
       cast(max(varred_ppm) as bigint) as varred_ppm
from adjusted cross join tot
group by arm, varred_ppm
"""


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    y_col: str,
    treat_label: str = "treat",
    control_label: str = "control",
    pre_label: str = "pre",
    post_label: str = "post",
) -> DataFrame:
    """Difference-in-differences point estimate — the observational
    fallback when randomized :func:`ab_lift` isn't available (a
    pipeline change rolled out to one source/region at a date):
    (treat post − treat pre) − (control post − control pre), with
    the parallel-trends assumption as the documented caveat, not a
    hidden one.

    Floor grain stated exactly: each of the four cell means floors
    to ppm first (``Σy·10⁶ div n``), the estimate is the exact
    integer combination of the four — so the result is reproducible
    to the ppm, engine-identical. A missing cell (no rows) yields a
    NULL estimate rather than a fabricated zero. Returns one row
    ``(n_tp, n_tq, n_cp, n_cq, m_treat_pre, m_treat_post,
    m_ctrl_pre, m_ctrl_post, did_ppm)`` (q = post).

    One partial-agg groupBy over four cells; the pivot is a 4-row
    conditional aggregate.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (df.select(F.col(group_col).cast("string").alias("g"),
                      F.col(period_col).cast("string").alias("p"),
                      F.col(y_col).cast("long").alias("y"))
            .where(F.col(group_col).isin(treat_label, control_label)
                   & F.col(period_col).isin(pre_label, post_label)
                   & F.col(y_col).isNotNull()))
    cells = base.groupBy("g", "p").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("(sum(y) * 1000000) div count(*)").cast("long")
        .alias("m"))

    def pick(g, p, col):
        return F.max(F.when((F.col("g") == g) & (F.col("p") == p),
                            F.col(col)))

    out = cells.agg(
        F.coalesce(pick(treat_label, pre_label, "n"), F.lit(0))
        .cast("long").alias("n_tp"),
        F.coalesce(pick(treat_label, post_label, "n"), F.lit(0))
        .cast("long").alias("n_tq"),
        F.coalesce(pick(control_label, pre_label, "n"), F.lit(0))
        .cast("long").alias("n_cp"),
        F.coalesce(pick(control_label, post_label, "n"), F.lit(0))
        .cast("long").alias("n_cq"),
        pick(treat_label, pre_label, "m").alias("m_treat_pre"),
        pick(treat_label, post_label, "m").alias("m_treat_post"),
        pick(control_label, pre_label, "m").alias("m_ctrl_pre"),
        pick(control_label, post_label, "m").alias("m_ctrl_post"))
    did = ((F.col("m_treat_post") - F.col("m_treat_pre"))
           - (F.col("m_ctrl_post") - F.col("m_ctrl_pre")))
    return out.withColumn("did_ppm", did.cast("long"))


def diff_in_diff_oracle_sql(rows_sql: str,
                            treat_label: str = "treat",
                            control_label: str = "control",
                            pre_label: str = "pre",
                            post_label: str = "post") -> str:
    """DuckDB twin of :func:`diff_in_diff`; ``rows_sql`` yields
    ``(g, p, y)``."""
    t, c = treat_label, control_label
    pr, po = pre_label, post_label
    return f"""
with base as (
  select cast(g as varchar) as g, cast(p as varchar) as p,
         cast(y as bigint) as y
  from ({rows_sql})
  where g in ('{t}', '{c}') and p in ('{pr}', '{po}')
    and y is not null),
cells as (
  select g, p, cast(count(*) as bigint) as n,
         cast((sum(y) * 1000000) // count(*) as bigint) as m
  from base group by g, p),
flat as (
  select
    cast(coalesce(max(case when g = '{t}' and p = '{pr}' then n end),
                  0) as bigint) as n_tp,
    cast(coalesce(max(case when g = '{t}' and p = '{po}' then n end),
                  0) as bigint) as n_tq,
    cast(coalesce(max(case when g = '{c}' and p = '{pr}' then n end),
                  0) as bigint) as n_cp,
    cast(coalesce(max(case when g = '{c}' and p = '{po}' then n end),
                  0) as bigint) as n_cq,
    max(case when g = '{t}' and p = '{pr}' then m end) as m_treat_pre,
    max(case when g = '{t}' and p = '{po}' then m end) as m_treat_post,
    max(case when g = '{c}' and p = '{pr}' then m end) as m_ctrl_pre,
    max(case when g = '{c}' and p = '{po}' then m end) as m_ctrl_post
  from cells)
select n_tp, n_tq, n_cp, n_cq,
       m_treat_pre, m_treat_post, m_ctrl_pre, m_ctrl_post,
       cast((m_treat_post - m_treat_pre)
            - (m_ctrl_post - m_ctrl_pre) as bigint) as did_ppm
from flat
"""


def _fs_em_py(patterns: dict, n_attrs: int, rounds: int,
              p0: int, m0: int, u0: int):
    """The exact integer EM recurrence on a pattern-count profile —
    shared by the operator (driver-side on the collected profile) and
    the tests' brute-force twin. ``patterns`` maps a γ tuple of 0/1
    (length ``n_attrs``) to its pair count. All probabilities are
    ppm ints clamped to [1, 999999]; every division is a floor on
    non-negative ints (``//`` == ``div``), so the iterate is a pure
    function of (profile, rounds, init) and replays in SQL verbatim.
    """
    M = 1_000_000

    def clamp(v):
        return max(1, min(M - 1, int(v)))

    p = clamp(p0)
    m = [clamp(m0)] * n_attrs
    u = [clamp(u0)] * n_attrs
    total = sum(patterns.values())
    for _ in range(rounds):
        sw = 0          # Σ n·w            (w in ppm)
        swa = [0] * n_attrs
        sva = [0] * n_attrs
        for g, n in patterns.items():
            pm, pu = p, M - p
            for a in range(n_attrs):
                pm *= m[a] if g[a] else M - m[a]
                pu *= u[a] if g[a] else M - u[a]
            w = (pm * M) // (pm + pu)
            sw += n * w
            for a in range(n_attrs):
                if g[a]:
                    swa[a] += n * w
                    sva[a] += n * (M - w)
        if total == 0 or sw == 0 or sw == total * M:
            break
        p = clamp(sw // total)
        m = [clamp((swa[a] * M) // sw) for a in range(n_attrs)]
        u = [clamp((sva[a] * M) // (total * M - sw))
             for a in range(n_attrs)]
    return p, m, u, total


def fs_em(
    pairs: DataFrame,
    attrs: list[str],
    rounds: int = 8,
    init_p_ppm: int = 100_000,
    init_m_ppm: int = 900_000,
    init_u_ppm: int = 100_000,
) -> DataFrame:
    """EM estimation of the Fellegi-Sunter m/u parameters from
    UNLABELED candidate pairs — the Splink-style step that
    :func:`fs_weights` assumes already happened: given per-pair
    agreement vectors, the two-class mixture EM recovers P(agree |
    match), P(agree | non-match), and the match prevalence, which
    then feed the weight/threshold scoring. Classic identifiability
    caveats apply (conditional independence between attributes; label
    switching prevented by the m-favoring init) — stated here, not
    hidden.

    Exactness + scale split: the only corpus-scale work is ONE
    groupBy collapsing the pair table to its agreement-pattern
    profile (≤ 2^A rows, A = len(attrs) ≤ 16 enforced); the EM
    recurrence then runs driver-side on that profile in pure integer
    ppm arithmetic (:func:`_fs_em_py` — the k-means-centroid
    precedent for bounded driver math, and the reason the iterate is
    bit-replayable: the DuckDB twin unrolls the identical recurrence
    over the pivoted profile in HUGEINT). Products carry ppm^(A+1)
    scale — Python ints are unbounded, HUGEINT holds A ≤ 6 in the
    twin; the fixture uses 3.

    Input contract: ``pairs`` is tidy (id_a, id_b, attr, agree) and
    every pair must carry EVERY attribute exactly once — missing or
    duplicate attribute rows raise (a silent 0 would bias u
    downward). Returns one row per attribute ``(attr, m_ppm, u_ppm,
    p_ppm, n_pairs)`` with the global prevalence repeated (flat
    schema, the cuped convention).
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if not attrs or len(attrs) > 16:
        raise ValueError("fs_em: 1..16 attributes required")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    a_list = list(attrs)
    base = (pairs.select("id_a", "id_b", "attr",
                         (F.col("agree").cast("long") != 0)
                         .cast("int").alias("g"))
            .where(F.col("attr").isin(*a_list)))
    prof = (base.groupBy("id_a", "id_b")
            .agg(F.count("*").alias("_na"),
                 *[F.max(F.when(F.col("attr") == a, F.col("g")))
                   .alias(f"g{i}") for i, a in enumerate(a_list)])
            )
    null_g = sum([F.col(f"g{i}").isNull().cast("int")
                  for i in range(len(a_list))], F.lit(0))
    bad = prof.where((F.col("_na") != len(a_list)) | (null_g > 0))
    if not bad.isEmpty():
        raise ValueError(
            "fs_em: every pair must carry every attribute exactly "
            "once (missing or duplicate attribute rows found)")
    counts = (prof.groupBy(*[f"g{i}" for i in range(len(a_list))])
              .agg(F.count("*").cast("long").alias("n")).collect())
    patterns = {
        tuple(int(r[f"g{i}"]) for i in range(len(a_list))): int(r["n"])
        for r in counts}
    p, m, u, total = _fs_em_py(patterns, len(a_list), rounds,
                               init_p_ppm, init_m_ppm, init_u_ppm)
    spark = pairs.sparkSession
    rows = [(a, int(m[i]), int(u[i]), int(p), int(total))
            for i, a in enumerate(a_list)]
    return spark.createDataFrame(
        rows, "attr string, m_ppm long, u_ppm long, p_ppm long, "
              "n_pairs long")


def fs_em_oracle_sql(pairs_sql: str, attrs: list[str],
                     rounds: int = 8,
                     init_p_ppm: int = 100_000,
                     init_m_ppm: int = 900_000,
                     init_u_ppm: int = 100_000) -> str:
    """DuckDB twin of :func:`fs_em`: the profile pivot plus the EM
    recurrence UNROLLED round by round in HUGEINT (A ≤ 6 keeps the
    ppm^(A+1) products inside 128 bits). Every round is a pair of
    materialized CTEs (per-pattern weights, then the parameter row);
    clamps and floors mirror :func:`_fs_em_py` term by term."""
    A = len(attrs)
    if not (1 <= A <= 6):
        raise ValueError("fs_em oracle supports 1..6 attributes")
    M = 1_000_000
    gcols = ", ".join(f"g{i}" for i in range(A))
    pivots = ", ".join(
        "max(case when attr = '{a}' then g end) as g{i}".format(
            a=attrs[i].replace("'", "''"), i=i) for i in range(A))
    clamp = "greatest(1, least({M} - 1, {{v}}))".format(M=M)
    sql = [
        f"with tidy as materialized (select id_a, id_b, attr, "
        f"case when cast(agree as bigint) <> 0 then 1 else 0 end as g "
        f"from ({pairs_sql})),",
        f"prof as materialized (select {pivots}, "
        f"cast(count(*) as bigint) as _dummy_n from tidy "
        f"group by id_a, id_b),",
        f"pat as materialized (select {gcols}, "
        f"cast(count(*) as bigint) as n from prof group by {gcols}),",
        f"tot as materialized (select cast(sum(n) as bigint) as total "
        f"from pat),",
        "prm0 as materialized (select "
        f"cast({clamp.format(v=init_p_ppm)} as bigint) as p, "
        + ", ".join(
            f"cast({clamp.format(v=init_m_ppm)} as bigint) as m{i}, "
            f"cast({clamp.format(v=init_u_ppm)} as bigint) as u{i}"
            for i in range(A)) + "),",
    ]
    for k in range(1, rounds + 1):
        pm = " * ".join(
            f"cast(case when g{i} = 1 then m{i} else {M} - m{i} end "
            f"as hugeint)" for i in range(A))
        pu = " * ".join(
            f"cast(case when g{i} = 1 then u{i} else {M} - u{i} end "
            f"as hugeint)" for i in range(A))
        sql.append(
            f"w{k} as materialized (select pat.*, "
            f"((cast(p as hugeint) * {pm}) * {M}) // "
            f"(cast(p as hugeint) * {pm} "
            f"+ cast({M} - p as hugeint) * {pu}) as w "
            f"from pat cross join prm{k - 1}),")
        swa = ", ".join(
            f"cast(sum(case when g{i} = 1 then n * w else 0 end) "
            f"as hugeint) as swa{i}, "
            f"cast(sum(case when g{i} = 1 then n * ({M} - w) "
            f"else 0 end) as hugeint) as sva{i}" for i in range(A))
        sql.append(
            f"s{k} as materialized (select "
            f"cast(sum(n * w) as hugeint) as sw, {swa} from w{k}),")
        mupd = ", ".join(
            f"cast({clamp.format(v=f'(swa{i} * {M}) // sw')} "
            f"as bigint) as m{i}, "
            f"cast({clamp.format(v=f'(sva{i} * {M}) // (total * {M} - sw)')} "
            f"as bigint) as u{i}" for i in range(A))
        sql.append(
            f"prm{k} as materialized (select case when total = 0 "
            f"or sw = 0 or sw = total * {M} then prm{k - 1}.p else "
            f"cast({clamp.format(v='sw // total')} as bigint) end "
            f"as p, " +
            ", ".join(
                f"case when total = 0 or sw = 0 or sw = total * {M} "
                f"then prm{k - 1}.m{i} else "
                f"cast({clamp.format(v=f'(swa{i} * {M}) // sw')} "
                f"as bigint) end as m{i}, "
                f"case when total = 0 or sw = 0 or sw = total * {M} "
                f"then prm{k - 1}.u{i} else "
                f"cast({clamp.format(v=f'(sva{i} * {M}) // (total * {M} - sw)')} "
                f"as bigint) end as u{i}" for i in range(A))
            + f" from prm{k - 1} cross join s{k} cross join tot),")
    body = "\n".join(sql).rstrip()
    assert body.endswith("),")
    body = body[:-2] + ")"
    selects = " union all ".join(
        f"select '{attrs[i].replace(chr(39), chr(39) * 2)}' as attr, "
        f"m{i} as m_ppm, u{i} as u_ppm, p as p_ppm, total as n_pairs "
        f"from prm{rounds} cross join tot" for i in range(A))
    return body + "\n" + selects


def cascade_eval(
    df: DataFrame,
    score_col: str,
    small_ok_col: str,
    big_ok_col: str,
    thresholds_ppm: list[int],
    big_cost_ratio_ppm: int = 10_000_000,
) -> DataFrame:
    """Model-cascade routing sweep: serve with the SMALL model when
    its confidence clears the threshold, escalate to the BIG one
    below it — for each candidate threshold, the expected accuracy,
    escalation fraction, and blended cost. The router-tuning table
    behind every small-model-first serving stack (and behind
    distillation triage: rows where small fails and big succeeds are
    the distillation set :func:`~cow_spark.operators.simsearch.
    hard_negatives` then mines).

    Requires per-item CORRECTNESS LABELS for both tiers (an eval
    slice with gold answers or judge verdicts) — this is offline
    router tuning, not online inference. Exact integers: accuracy =
    (Σ routed-correct)·10⁶ div n; cost = 10⁶ + esc_frac·(ratio −
    10⁶) div 10⁶-style blend computed as
    ``(n_small·10⁶ + n_big·ratio) div n``.

    One pass: the bounded threshold array explodes against the
    scored rows (rows × |T| — the sweep's honest cost, map-side
    combinable) into a |T|-sized aggregate. NULL scores/labels drop.
    Returns ``(threshold_ppm, n, n_escalated, esc_ppm, acc_ppm,
    cost_ppm)`` sorted by threshold.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if not thresholds_ppm:
        raise ValueError("cascade_eval: thresholds_ppm must be "
                         "non-empty")
    ts = sorted(set(int(t) for t in thresholds_ppm))
    base = (df.select(F.col(score_col).cast("long").alias("s"),
                      (F.col(small_ok_col).cast("long") != 0)
                      .alias("sok"),
                      (F.col(big_ok_col).cast("long") != 0)
                      .alias("bok"))
            .where(F.col(score_col).isNotNull()
                   & F.col(small_ok_col).isNotNull()
                   & F.col(big_ok_col).isNotNull()))
    arr = F.array(*[F.lit(t).cast("long") for t in ts])
    ex = base.select("s", "sok", "bok",
                     F.explode(arr).alias("threshold_ppm"))
    esc = F.col("s") < F.col("threshold_ppm")
    correct = F.when(esc, F.col("bok")).otherwise(F.col("sok"))
    agg = (ex.groupBy("threshold_ppm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(esc.cast("long")).cast("long").alias("n_escalated"),
        F.sum(correct.cast("long")).cast("long").alias("_ok")))
    return (agg.select(
        "threshold_ppm", "n", "n_escalated",
        F.expr("(n_escalated * 1000000) div n").cast("long")
        .alias("esc_ppm"),
        F.expr("(_ok * 1000000) div n").cast("long").alias("acc_ppm"),
        F.expr(f"((n - n_escalated) * 1000000 + n_escalated "
               f"* {int(big_cost_ratio_ppm)}) div n").cast("long")
        .alias("cost_ppm"))
        .orderBy("threshold_ppm"))


def cascade_eval_oracle_sql(rows_sql: str, thresholds_ppm: list[int],
                            big_cost_ratio_ppm: int = 10_000_000
                            ) -> str:
    """DuckDB twin of :func:`cascade_eval`; ``rows_sql`` yields
    ``(s, sok, bok)``."""
    ts = sorted(set(int(t) for t in thresholds_ppm))
    arr = "[" + ", ".join(str(t) for t in ts) + "]"
    return f"""
with base as (
  select cast(s as bigint) as s,
         case when cast(sok as bigint) <> 0 then 1 else 0 end as sok,
         case when cast(bok as bigint) <> 0 then 1 else 0 end as bok
  from ({rows_sql})
  where s is not null and sok is not null and bok is not null),
ex as (
  select s, sok, bok,
         cast(unnest({arr}) as bigint) as threshold_ppm
  from base),
agg as (
  select threshold_ppm, cast(count(*) as bigint) as n,
         cast(sum(case when s < threshold_ppm then 1 else 0 end)
              as bigint) as n_escalated,
         cast(sum(case when s < threshold_ppm then bok else sok end)
              as bigint) as ok
  from ex group by threshold_ppm)
select threshold_ppm, n, n_escalated,
       cast((n_escalated * 1000000) // n as bigint) as esc_ppm,
       cast((ok * 1000000) // n as bigint) as acc_ppm,
       cast(((n - n_escalated) * 1000000
             + n_escalated * {int(big_cost_ratio_ppm)}) // n
            as bigint) as cost_ppm
from agg order by threshold_ppm
"""
