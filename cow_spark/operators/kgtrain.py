"""KG-embedding training data: filtered negative sampling.

Every translational / bilinear KG-embedding model (TransE, DistMult,
ComplEx, RotatE) trains on (positive triple, corrupted triple) pairs:
corrupt one side of a true (s, p, o) with a random entity, reject
corruptions that happen to be true ("filtered" sampling — scoring a
true triple as negative poisons the loss). At KG scale this is a
data-engineering job, not a model job, and it belongs next to the data.

Randomness is hash-randomness, the same discipline as random_walks and
weighted_sample: the corrupting entity for (triple, trial j) is
``entities[md5(s, p, o, j, salt) mod V]`` over the dense-indexed
entity vocabulary — reproducible across runs/retries/engines, so the
training set is an artifact you can diff, not a one-off.

Scale shape: the entity vocabulary gets a dense index from ONE
vocabulary-sized global sort (entity vocabularies are millions, not
trillions — and the index must be dense for the mod-V draw to be
uniform). Candidates explode n_trials per positive, equi-join the
vocabulary on the drawn index, anti-join the true-triple set (the one
corpus-scale shuffle — inherent to filtered sampling), then a
per-positive window keeps the first ``n_neg`` surviving trials. Draws
that collide with the positive's own entity or with any true triple
are skipped by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash60

NEG_SALT = "kgneg-v1"


def entity_vocab(triples: DataFrame) -> DataFrame:
    """``(ent, idx)`` — dense 0-based index over the distinct subjects
    and objects, ordered lexicographically (deterministic)."""
    ents = (triples.select(F.col("s").alias("ent"))
            .union(triples.select(F.col("o").alias("ent")))
            .where(F.col("ent").isNotNull())
            .distinct())
    w = Window.orderBy("ent")
    return ents.select(
        "ent", (F.row_number().over(w) - 1).cast("bigint").alias("idx"))


def negative_samples(
    triples: DataFrame,
    n_neg: int = 2,
    n_trials: int = 8,
    corrupt: str = "object",
    salt: str = NEG_SALT,
) -> DataFrame:
    """``(s, p, o, neg_s, neg_o, trial)`` — up to ``n_neg`` filtered
    corruptions per positive triple, corrupting the ``corrupt`` side
    ('object', 'subject', or 'both' = hash-decided per trial).

    ``n_trials`` bounds the redraw budget: a trial is discarded when
    its drawn entity equals the side it replaces or the corrupted
    triple exists in the positive set; survivors rank by trial index
    and the first ``n_neg`` win. With a vocabulary much larger than
    any entity's degree the expected survivor count is ~n_trials, so
    n_trials = 4x n_neg leaves the under-filled tail negligible — and
    deterministic, so a pytest can pin it.
    """
    if corrupt not in ("object", "subject", "both"):
        raise ValueError(f"corrupt must be object/subject/both, "
                         f"got {corrupt!r}")
    if n_neg < 1 or n_trials < n_neg:
        raise ValueError("need n_trials >= n_neg >= 1")
    pos = (triples.select("s", "p", "o")
           .where(F.col("s").isNotNull() & F.col("o").isNotNull())
           .distinct())
    vocab = entity_vocab(pos)
    v_count = vocab.count()
    if v_count == 0:
        return pos.sparkSession.createDataFrame(
            [], "s string, p string, o string, neg_s string, "
                "neg_o string, trial int")
    cand = pos.select(
        "s", "p", "o",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(n_trials - 1)),
            lambda j: portable_hash60(F.concat_ws(
                "\x1f", F.col("s"), F.col("p"), F.col("o"),
                j.cast("string"), F.lit(salt))) % v_count)
        ).alias("trial", "idx"))
    if corrupt == "both":
        side = (portable_hash60(F.concat_ws(
            "\x1f", F.col("s"), F.col("p"), F.col("o"),
            F.col("trial").cast("string"), F.lit(salt + "-side")))
            % 2 == 0)
    else:
        side = F.lit(corrupt == "subject")
    cand = (cand.join(vocab, "idx")
            .select("s", "p", "o", "trial",
                    F.when(side, F.col("ent")).otherwise(F.col("s"))
                    .alias("neg_s"),
                    F.when(side, F.col("o")).otherwise(F.col("ent"))
                    .alias("neg_o")))
    # self-collisions: the draw reproduced the entity it replaces
    cand = cand.where(
        (F.col("neg_s") != F.col("s")) | (F.col("neg_o") != F.col("o")))
    # filtered sampling: corrupted triple must not be a true triple
    truth = pos.select(F.col("s").alias("neg_s"), "p",
                       F.col("o").alias("neg_o"))
    cand = cand.join(truth, ["neg_s", "p", "neg_o"], "left_anti")
    w = Window.partitionBy("s", "p", "o").orderBy("trial")
    return (cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= n_neg).drop("_rn"))


def negative_samples_py(
    triples, n_neg=2, n_trials=8, corrupt="object", salt=NEG_SALT,
):
    """Pure-Python twin over (s, p, o) tuples."""
    import hashlib

    pos = sorted(set(triples))
    ents = sorted({s for s, _, _ in pos} | {o for _, _, o in pos})
    v = len(ents)
    truth = set(pos)
    out = []
    for s, p, o in pos:
        kept = 0
        for j in range(n_trials):
            if kept >= n_neg:
                break
            h = int(hashlib.md5(
                f"{s}\x1f{p}\x1f{o}\x1f{j}\x1f{salt}".encode()
            ).hexdigest()[:15], 16)
            ent = ents[h % v]
            if corrupt == "both":
                hs = int(hashlib.md5(
                    f"{s}\x1f{p}\x1f{o}\x1f{j}\x1f{salt}-side".encode()
                ).hexdigest()[:15], 16)
                subj_side = hs % 2 == 0
            else:
                subj_side = corrupt == "subject"
            ns, no = (ent, o) if subj_side else (s, ent)
            if (ns, no) == (s, o) or (ns, p, no) in truth:
                continue
            out.append((s, p, o, ns, no, j))
            kept += 1
    return sorted(out)


def ranking_eval(
    scored: DataFrame,
    query_col: str = "query",
    cand_col: str = "cand",
    score_col: str = "score",
    pos_col: str = "is_pos",
    ks: tuple[int, ...] = (1, 3, 10),
) -> DataFrame:
    """Per-query ranking metrics for a scored candidate table — the
    evaluation half of the KG-embedding loop :func:`negative_samples`
    feeds (and of :func:`~cow_spark.operators.simsearch` retrieval,
    :func:`~cow_spark.operators.graphrank.link_prediction` scoring):
    given (query, candidate, integer score, is-positive), rank every
    candidate within its query and read off the first-relevant rank.

    Returns one row per query: ``(query, n_cands, n_pos, best_rank,
    rr_ppm, hit_<k>...)`` where ``best_rank`` is the rank of the
    highest-ranked positive, ``rr_ppm = 1e6 div best_rank`` (so
    ``avg(rr_ppm)/1e6`` is MRR at ppm resolution, exact in any
    engine), and ``hit_k`` is 1 iff a positive ranks ≤ k. Ranking is
    ``row_number`` over (score desc, candidate asc) — the
    deterministic tie-break every replayable eval needs; scores must
    be integers for exactly that reason (float scores reintroduce
    cross-engine ulp flips at ties). Queries with no positive get NULL
    ``best_rank``/``rr_ppm`` and zero hits — the caller decides
    whether that's a harness bug (filtered eval) or a true zero.

    Scale shape: ONE keyed window sort per query group (queries are
    many, so the sort parallelizes; no giant-single-partition risk as
    long as per-query candidate lists are bounded, which filtered
    ranking evals guarantee by construction) + one partial-aggregated
    groupBy. No joins, no Python.
    """
    q = F.col(query_col)
    w = Window.partitionBy(q).orderBy(
        F.col(score_col).cast("long").desc(), F.col(cand_col).asc())
    ranked = scored.withColumn("_rk", F.row_number().over(w))
    pos = F.col(pos_col).cast("int") == 1
    aggs = [
        F.count("*").alias("n_cands"),
        F.sum(F.when(pos, 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.min(F.when(pos, F.col("_rk"))).cast("bigint").alias("best_rank"),
    ]
    out = ranked.groupBy(q.alias("query")).agg(*aggs)
    out = out.withColumn(
        "rr_ppm", F.expr("1000000 div best_rank").cast("bigint"))
    for k in ks:
        out = out.withColumn(
            f"hit_{k}",
            F.when(F.col("best_rank") <= k, 1).otherwise(0).cast("int"))
    return out.withColumn("n_cands", F.col("n_cands").cast("bigint"))


def metapath_counts(
    triples: DataFrame,
    max_mid_degree: int = 10_000,
    s: str = "s",
    p: str = "p",
    o: str = "o",
) -> DataFrame:
    """PRA-style two-step metapath features (Lao & Cohen 2010): for
    entity pairs (x, y), the number of typed paths ``x —p1→ z —p2→ y``
    per predicate pair — the path-ranking feature table KG link
    predictors train on (:func:`negative_samples` supplies the labels,
    :func:`ranking_eval` scores the model).

    Scale shape: in-edges ⋈ out-edges on the INTERMEDIATE node, so the
    candidate volume is Σ_z in(z)·out(z) — intermediates whose
    in·out product exceeds ``max_mid_degree`` are excluded up front
    (the degree-cap discipline of link_prediction/triangles: a
    celebrity middle node contributes quadratically many paths and no
    discriminative signal; PRA prunes hubs for the same reason). The
    cap is a documented semantic, not a silent truncation — excluded
    hubs are exactly ``in·out > cap``, reproducible cross-engine.
    Self-pairs (x = y, the z-return paths) are dropped. One partial-agg
    groupBy on (x, y, p1, p2) after the join.
    """
    t = (triples.select(F.col(s).cast("string").alias("s"),
                        F.col(p).cast("string").alias("p"),
                        F.col(o).cast("string").alias("o"))
         .where(F.col("s").isNotNull() & F.col("p").isNotNull()
                & F.col("o").isNotNull())
         .dropDuplicates())
    deg = (t.groupBy(F.col("o").alias("z")).agg(F.count("*").alias("ind"))
           .join(t.groupBy(F.col("s").alias("z"))
                 .agg(F.count("*").alias("outd")), "z")
           .where(F.col("ind") * F.col("outd") <= max_mid_degree)
           .select("z"))
    first = (t.join(deg, t["o"] == deg["z"])
             .select(F.col("s").alias("x"), F.col("p").alias("p1"),
                     F.col("o").alias("mid")))
    second = t.select(F.col("s").alias("mid"), F.col("p").alias("p2"),
                      F.col("o").alias("y"))
    return (first.join(second, "mid")
            .where(F.col("x") != F.col("y"))
            .groupBy("x", "y", "p1", "p2")
            .agg(F.count("*").cast("bigint").alias("n_paths")))


def metapath_counts_oracle_sql(triples_cte: str,
                               max_mid_degree: int = 10_000) -> str:
    """DuckDB twin of :func:`metapath_counts` — the same hub-capped
    join, serially planned."""
    return f"""
with t as (
  select distinct cast(s as varchar) as s, cast(p as varchar) as p,
         cast(o as varchar) as o
  from ({triples_cte})
  where s is not null and p is not null and o is not null
),
deg as (
  select i.z from
    (select o as z, count(*) as ind from t group by o) i
    join (select s as z, count(*) as outd from t group by s) u
      on i.z = u.z
  where i.ind * u.outd <= {max_mid_degree}
),
f as (select t.s as x, t.p as p1, t.o as mid from t
      join deg on t.o = deg.z)
select f.x, t.o as y, f.p1, t.p as p2,
       cast(count(*) as bigint) as n_paths
from f join t on t.s = f.mid
where f.x <> t.o
group by f.x, t.o, f.p1, t.p
"""


TRANSE_SALT = "transe-v1"


def transe_score(
    triples: DataFrame,
    dim: int = 16,
    half_range: int = 500,
) -> DataFrame:
    """TransE plausibility scores over (s, p, o) triples — the scoring
    layer of the KG-embedding stack this module feeds: triples +
    :func:`negative_samples` score here, then :func:`ranking_eval`
    turns scores into MRR / Hits@k. score(s, p, o) = −‖e_s + r_p −
    e_o‖₁ in EXACT integer arithmetic (higher = more plausible).

    Embeddings are hash-derived: component d of an entity/relation is
    ``pmod(md5_32(kind ⊕ name ⊕ d ⊕ salt), 2·half_range+1) −
    half_range`` — the deterministic stand-in this repo uses wherever a
    trained artifact would sit in production (multimodal's fake
    decoder, DSIR's hashed buckets): reproducible across runs, retries
    and engines, so the pipeline — corruption, scoring, ranking — is
    testable end-to-end and a real trained embedding table drops in as
    a join without touching the plumbing. L1 and integer components
    keep every sum int64-exact (|score| ≤ dim · 3 · half_range), so
    distributed and serial evaluation agree bit-for-bit — no ulp
    nondeterminism in the eval metric.

    Scale shape: MAP-ONLY — one fold over ``sequence(0, dim−1)`` per
    row, zero shuffles, zero Python; everything inside the lambda
    depends on the element index, so the HOF-lambda re-evaluation trap
    (CLAUDE.md) has nothing to re-evaluate but the row's own columns.
    """
    if dim < 1:
        raise ValueError(f"transe_score: dim must be >= 1, got {dim}")
    if half_range < 1:
        raise ValueError(
            f"transe_score: half_range must be >= 1, got {half_range}")
    mod = 2 * half_range + 1

    def comp(kind: str, name, d):
        from ..functions.hashing import portable_hash32
        h = portable_hash32(F.concat_ws(
            "\x01", F.lit(TRANSE_SALT), F.lit(kind), name,
            d.cast("string")))
        return F.pmod(h, F.lit(mod)) - F.lit(half_range)

    term = lambda d: F.abs(  # noqa: E731
        comp("e", F.col("s"), d) + comp("r", F.col("p"), d)
        - comp("e", F.col("o"), d))
    score = -F.aggregate(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + term(d))
    return triples.select("s", "p", "o", score.alias("score"))


def transe_score_sql(triples_cte: str, dim: int = 16,
                     half_range: int = 500) -> str:
    """DuckDB twin of :func:`transe_score`: same md5 components via
    generate_series, same integer L1 fold."""
    from ..functions.hashing import portable_hash32_sql

    mod = 2 * half_range + 1

    def comp(kind: str, name: str) -> str:
        h = portable_hash32_sql(
            f"'{TRANSE_SALT}' || chr(1) || '{kind}' || chr(1) || {name}"
            f" || chr(1) || cast(d as varchar)")
        return f"((({h}) % {mod} + {mod}) % {mod} - {half_range})"

    return f"""
with t as ({triples_cte})
select s, p, o,
       cast(-sum(abs({comp('e', 's')} + {comp('r', 'p')}
                     - {comp('e', 'o')})) as bigint) as score
from t, generate_series(0, {dim - 1}) g(d)
group by s, p, o
"""


def horn_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_conf_ppm: int = 0,
) -> DataFrame:
    """Closed-path Horn-rule mining — AMIE's core rule shape
    (Galárraga 2013) as one declarative plan: for every predicate
    triple (p1, p2, p3), how often does the 2-hop body
    ``(x, p1, y) ∧ (y, p2, z)`` predict the head ``(x, p3, z)``? The
    KG-completion profile run BEFORE training an embedding model:
    high-confidence rules are free supervision (and leakage — a rule
    the KG already encodes inflates link-prediction eval), low-
    confidence high-support rules are the interesting candidates.

    AMIE counting semantics on DISTINCT instantiations: ``support`` =
    distinct (x, z) pairs satisfying the body, ``n_matched`` = those
    also satisfying the head, ``confidence_ppm`` the floor-scaled
    standard confidence. One row per (p1, p2, p3) with support ≥
    ``min_support`` AND a matching head predicate; bodies whose pairs
    match no head predicate at all appear once with p3 NULL and
    n_matched 0 — the "no rule explains this path" signal
    (confidence_ppm 0). p1 = p2 loops and p3 ∈ {p1, p2} are kept:
    transitivity (p∧p⇒p) is a real and valuable rule.

    Scale shape: body = ONE self-equi-join on the bridge entity
    (shuffle keyed on entities, AQE-skew-splittable), deduped to
    distinct (p1, p2, x, z) BEFORE the head probe (the AMIE counting
    unit, and the fan-in bound); head probe = one more equi-join on
    (x, z). Output is predicate-vocabulary-cubed-bounded. At 100 TB
    you degree-cap the bridge first (the standard AMIE-at-scale move);
    the cap seam is the same filter the hub-probe uses elsewhere.
    """
    t = triples.select("s", "p", "o").where(
        F.col("s").isNotNull() & F.col("o").isNotNull())
    left = t.select(F.col("s").alias("x"), F.col("p").alias("p1"),
                    F.col("o").alias("y"))
    right = t.select(F.col("s").alias("y"), F.col("p").alias("p2"),
                     F.col("o").alias("z"))
    body = (left.join(right, "y")
            .select("p1", "p2", "x", "z").distinct())
    head = t.select(F.col("s").alias("x"), F.col("p").alias("p3"),
                    F.col("o").alias("z"))
    probed = body.join(head, ["x", "z"], "left")
    agg = (probed.groupBy("p1", "p2", "p3")
           .agg(F.countDistinct("x", "z").alias("n_matched")))
    support = (body.groupBy("p1", "p2")
               .agg(F.count("*").alias("support")))
    conf = F.col("n_matched") * F.lit(1_000_000)
    return (agg.join(F.broadcast(support), ["p1", "p2"])
            .where(F.col("support") >= min_support)
            .select("p1", "p2", "p3",
                    F.col("support").cast("long").alias("support"),
                    F.when(F.col("p3").isNotNull(),
                           F.col("n_matched"))
                    .otherwise(F.lit(0)).cast("long").alias("n_matched"),
                    F.when(F.col("p3").isNotNull(),
                           ((conf - F.pmod(conf, F.col("support")))
                            / F.col("support")).cast("long"))
                    .otherwise(F.lit(0)).alias("confidence_ppm"))
            .where(F.col("confidence_ppm") >= min_conf_ppm))


def type_predict(
    quads: DataFrame,
    type_pred: str = "rdf:type",
) -> DataFrame:
    """Multinomial naive-Bayes type prediction for UNTYPED subjects —
    the classic KG-completion baseline (SDType's statistical ancestor):
    a subject's predicate multiset is the feature vector, its
    ``type_pred`` classes are the labels, and every ratio lives in
    1/1024-bit integer log space so the DuckDB twin replays the argmax
    bit-exactly (floating-point log-sums tie-break differently across
    engines; integer fixed point cannot).

        score(c|s) = [l2(n_c) − l2(N)]
                   + Σ_{p ∈ feats(s)} [l2(c(p,c)+1) − l2(c(·,c)+|P|)]

    with l2 the integer log2 kernel and add-one smoothing, so unseen
    (p, c) pairs cost −l2(c(·,c)+|P|) rather than −∞.

    Scale shape: counts and the per-(predicate, class) weight table
    are (vocabulary × classes)-sized — built once via a bounded
    crossJoin (classes is a small side, broadcast). Untyped subjects'
    feature rows join the weight table on the predicate (fan-out =
    |classes|, bounded), partial-agg to (s, class), and the argmax is
    ONE more partial agg: min(struct(−score, class)) — deterministic
    tie-break to the lexicographically smallest class. No window, no
    per-subject sort. The log2 kernel runs on the weight/prior tables
    only, never per corpus row.

    Returns ``(s, predicted, score_fp, n_feats)`` for every subject
    that has features but no ``type_pred`` triple.
    """
    from ..functions.intmath import with_log2_fp

    typed = (quads.where((F.col("p") == type_pred)
                         & (F.col("o_kind") == "iri"))
             .select("s", F.col("o_lex").alias("cls")).distinct())
    feats = quads.where(F.col("p") != type_pred).select("s", "p")
    # training counts: every feature row of a typed subject, once per
    # class of that subject (multi-typed subjects train every label)
    tr = feats.join(typed, "s")
    cpc = tr.groupBy("cls", "p").agg(F.count("*").alias("cpc"))
    cc = tr.groupBy("cls").agg(F.count("*").alias("cc"))
    n_c = typed.groupBy("cls").agg(F.countDistinct("s").alias("n_c"))
    n_all = typed.agg(F.countDistinct("s").alias("n_all"))
    vocab = feats.select("p").distinct()
    v = vocab.agg(F.count("*").alias("v"))
    # prior_fp(c) = l2(n_c) − l2(N)
    # NB distinct temp names beyond case: Spark resolves column names
    # case-INsensitively by default, so "_l2n" vs "_l2N" would be ONE
    # column and withColumn would silently replace the first
    pri = with_log2_fp(
        n_c.crossJoin(F.broadcast(n_all)), "n_c", "_l2cls")
    pri = with_log2_fp(pri, "n_all", "_l2tot").select(
        "cls", (F.col("_l2cls") - F.col("_l2tot")).alias("prior_fp"))
    # weight_fp(p, c) = l2(cpc+1) − l2(cc+|P|), full (vocab × classes)
    grid = (vocab.crossJoin(F.broadcast(cc))
            .crossJoin(F.broadcast(v))
            .join(cpc, ["p", "cls"], "left")
            .select("p", "cls",
                    (F.coalesce("cpc", F.lit(0)) + 1).alias("_num"),
                    (F.col("cc") + F.col("v")).alias("_den")))
    w = with_log2_fp(grid, "_num", "_l2num")
    w = with_log2_fp(w, "_den", "_l2den").select(
        "p", "cls", (F.col("_l2num") - F.col("_l2den")).alias("w_fp"))
    untyped = (feats.select("s").distinct()
               .join(typed.select("s").distinct(), "s", "left_anti"))
    scored = (feats.join(untyped, "s")
              .join(w, "p")
              .groupBy("s", "cls")
              .agg(F.sum("w_fp").cast("long").alias("lik_fp"),
                   F.count("*").cast("long").alias("n_feats"))
              .join(F.broadcast(pri), "cls")
              .select("s", "cls", "n_feats",
                      (F.col("lik_fp") + F.col("prior_fp"))
                      .alias("score_fp")))
    best = (scored.groupBy("s")
            .agg(F.min(F.struct((-F.col("score_fp")).alias("neg"),
                                F.col("cls").alias("cls"),
                                F.col("n_feats").alias("nf")))
                 .alias("_b"))
            .select("s", F.col("_b.cls").alias("predicted"),
                    (-F.col("_b.neg")).cast("long").alias("score_fp"),
                    F.col("_b.nf").alias("n_feats")))
    return best


def type_predict_oracle_sql(quads_sql: str,
                            type_pred: str = "rdf:type") -> str:
    """DuckDB twin of :func:`type_predict`. ``quads_sql`` must yield
    (s, p, o_kind, o_lex). Counts cast to BIGINT before the log
    kernel (HUGEINT class); argmax via min(row(-score, cls))."""
    from ..functions.intmath import log2_fp_sql

    return f"""
with q as materialized ({quads_sql}),
typed as materialized (
  select distinct s, o_lex as cls from q
  where p = '{type_pred}' and o_kind = 'iri'),
feats as materialized (select s, p from q where p <> '{type_pred}'),
tr as materialized (
  select f.s, f.p, t.cls from feats f join typed t using (s)),
cpc as (select cls, p, cast(count(*) as bigint) as cpc
        from tr group by cls, p),
cc as materialized (select cls, cast(count(*) as bigint) as cc
                    from tr group by cls),
n_c as (select cls, cast(count(distinct s) as bigint) as n_c
        from typed group by cls),
n_all as (select cast(count(distinct s) as bigint) as n_all from typed),
vocab as materialized (select distinct p from feats),
v as (select cast(count(*) as bigint) as v from vocab),
pri as materialized (
  select cls, {log2_fp_sql('n_c')} - {log2_fp_sql('n_all')} as prior_fp
  from n_c cross join n_all),
grid as materialized (
  select vocab.p, cc.cls,
         cast(coalesce(cpc.cpc, 0) + 1 as bigint) as num,
         cast(cc.cc + v.v as bigint) as den
  from vocab cross join cc cross join v
  left join cpc on cpc.p = vocab.p and cpc.cls = cc.cls),
w as materialized (
  select p, cls, {log2_fp_sql('num')} - {log2_fp_sql('den')} as w_fp
  from grid),
untyped as materialized (
  select distinct s from feats anti join typed using (s)),
scored as materialized (
  select f.s, w.cls,
         cast(sum(w.w_fp) as bigint) as lik_fp,
         cast(count(*) as bigint) as n_feats
  from feats f join untyped u using (s) join w on w.p = f.p
  group by f.s, w.cls),
fin as (
  select s, {{'neg': -(lik_fp + prior_fp), 'cls': cls,
              'nf': n_feats}} as st
  from scored join pri using (cls))
select s, (min(st)).cls as predicted,
       cast(-((min(st)).neg) as bigint) as score_fp,
       cast((min(st)).nf as bigint) as n_feats
from fin group by s
"""
