"""KG summary statistics — the profile a data engineer pulls before
querying an unfamiliar graph (the reference offers nothing here; its
users run SPARQL aggregations in a store).

One partial-aggregated pass: per predicate, triple count, distinct
subjects/objects, and the literal share. At 100 TB the output is
vocabulary-sized (one row per predicate), so the shuffle carries
per-partition partials only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kg_statistics(quads: DataFrame, approx: bool = False) -> DataFrame:
    """(p, n_triples, n_subjects, n_objects, n_literals) per predicate.

    ``approx=True`` swaps the two exact distincts for HyperLogLog
    sketches (``approx_count_distinct``): two exact distincts in one
    aggregate compile to an Expand that doubles the shuffled rows —
    at the 100 TB scale a ±2% cardinality profile is the right trade,
    so that is the mode a production profile job should run. Exact
    stays the default because the DuckDB oracle replays it bit-for-bit.
    """
    cd = F.approx_count_distinct if approx else F.countDistinct
    return quads.groupBy("p").agg(
        F.count("*").alias("n_triples"),
        cd("s").alias("n_subjects"),
        cd("o_lex").alias("n_objects"),
        F.sum((F.col("o_kind") == "lit").cast("long")).alias("n_literals"),
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile of a transcript table — the batch twin
    of the streaming sessionizer's summary (turn/char counts, role mix,
    tool usage, event-time span). One partial-aggregated groupBy; at
    10^12 turns the shuffle carries per-partition partials keyed by
    conv_id (the table's natural bucketing key, so co-located layouts
    shuffle nothing)."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))
              ).alias("n_chars"),
        F.countDistinct("role").alias("n_roles"),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def column_profile(
    df: DataFrame,
    col: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """One-row distribution profile of a numeric column: count, min,
    max, floor(mean), and discrete percentiles — the corpus-audit view
    (doc length / token count distributions drive packing and filter
    thresholds).

    ``approx=False`` uses SQL-standard ``percentile_disc`` (an exact
    order statistic — integer in, integer out, no interpolation, so the
    DuckDB oracle replays it bit-for-bit). Exact percentiles buffer the
    group's values, so this is the AUDIT mode; at full corpus scale run
    ``approx=True`` (t-digest ``approx_percentile``, bounded memory,
    ±accuracy) — the same exact/approx split as
    :func:`kg_statistics`'s HLL mode.
    """
    c = F.col(col)
    aggs = [
        F.count(c).alias("n"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.floor(F.avg(c)).cast("long").alias("mean_floor"),
    ]
    for p in percentiles:
        # round, not int(): 0.29*100 is 28.999… in binary floats and
        # would truncate to the wrong label
        name = f"p{round(p * 100)}"
        if approx:
            aggs.append(F.percentile_approx(c, p).alias(name))
        else:
            # backtick the identifier — F.col handles odd names for the
            # other aggregates, the SQL string must do the same
            aggs.append(F.expr(
                f"percentile_disc({p}) within group (order by `{col}`)"
            ).alias(name))
    return df.agg(*aggs)


def source_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus datasheet — the one-call audit a dataset card
    starts from: ``(source, n_docs, n_tokens, n_empty, n_quality_pass,
    n_distinct_fp)`` where n_distinct_fp vs n_docs exposes each
    source's exact-duplicate mass and n_quality_pass applies the
    default :func:`~cow_spark.operators.quality.quality_filter` gates.

    One scan computes tokens/fingerprints, the quality gates join on
    the id (both sides partial-aggregate before the source-keyed final
    agg, whose output is |sources|-sized). Empty = no tokens (NULL text
    counts — its token count is NULL, not 0, and both engines treat it
    the same).
    """
    from ..functions.text import fingerprint, token_count
    from ..operators.quality import quality_filter

    q = quality_filter(df, id_col=id_col, text_col=text_col) \
        .select(F.col(id_col).alias("_qid"), "keep")
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        token_count(F.col(text_col)).alias("_nt"),
        fingerprint(F.col(text_col)).alias("_fp"))
    joined = base.join(q, base["_id"] == q["_qid"])
    return (
        joined.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.coalesce(F.sum("_nt"), F.lit(0)).cast("long")
             .alias("n_tokens"),
             F.sum(F.when(F.col("_nt").isNull() | (F.col("_nt") == 0), 1)
                   .otherwise(0)).cast("long").alias("n_empty"),
             F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
             .alias("n_quality_pass"),
             F.countDistinct("_fp").cast("long").alias("n_distinct_fp"))
    )


def cube_profile(
    docs: DataFrame,
    dims: tuple[str, ...] = ("source", "lang"),
    value_col: str = "n_chars",
) -> DataFrame:
    """OLAP CUBE over the corpus dimensions — every grouping-set
    subtotal (per source×lang, per source, per lang, grand total) in
    ONE pass: Spark's ``cube`` compiles to an Expand (2^|dims| copies
    map-side) + one partial-agg shuffle, not 2^|dims| scans. The
    data-card rollup a corpus datasheet wants. NULL dimension values
    are distinguished from subtotal rows by ``grouping_id`` (bit i set
    = dims[i] rolled up), so a genuinely-NULL ``lang`` never collides
    with the per-source subtotal."""
    gid = F.grouping_id(*[F.col(d) for d in dims]).cast("long")
    return (docs.cube(*dims)
            .agg(gid.alias("gid"),
                 F.count("*").alias("n_docs"),
                 F.sum(F.col(value_col).cast("long")).alias("v_sum")))


def property_table(
    quads: DataFrame,
    predicates: list[str],
    agg: str = "min",
) -> DataFrame:
    """RDF property-table layout: pivot a quad table into one wide row
    per subject with a column per predicate — the KG → feature-table
    bridge ML consumers want (and the classic triple-store physical
    layout). ``predicates`` is the FIXED column list (an unpinned
    pivot would scan once just to discover columns); multi-valued
    predicates collapse deterministically by ``agg`` (``min``/``max``
    of the lexical form — order-free, engine-exact), absent ones are
    NULL. One partial-agg shuffle on subject; the predicate filter
    prunes the scan."""
    if not predicates:
        raise ValueError("property_table: empty predicate list")
    if agg not in ("min", "max"):
        raise ValueError(f"agg must be min|max, got {agg!r}")
    fn = F.min if agg == "min" else F.max
    aggs = [fn(F.when(F.col("p") == p, F.col("o_lex")))
            .alias(f"p{i}") for i, p in enumerate(predicates)]
    return quads.where(F.col("p").isin(list(predicates))) \
        .groupBy(F.col("s")).agg(*aggs)


def characteristic_sets(quads: DataFrame) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011): group
    subjects by the exact SET of predicates they carry — the classic
    RDF structure summary a cardinality estimator (and a schema-
    discovery pass over a schemaless 100 TB graph) is built on. The
    reference emits fixed per-column predicates, so its output graphs
    have a handful of characteristic sets; a fused multi-source KG has
    thousands, and this table IS the answer to "what entity shapes
    live in this graph".

    Returns one row per distinct predicate set: ``(preds, n_preds,
    n_subjects, n_triples)`` where ``preds`` is the space-joined
    sorted distinct predicate list (IRIs cannot contain raw spaces, so
    the join is unambiguous; binary string sort — both engines'
    default collation). ``n_triples`` counts all triples of the set's
    subjects, so ``n_triples / (n_subjects * n_preds)`` reads off the
    mean multiplicity the estimator needs.

    Scale shape: one partial-aggregated groupBy(subject) — collect_set
    over the per-subject predicate handful, never the corpus — then a
    second groupBy over the set string, output bounded by distinct
    shapes (vocabulary-scale). No joins, no windows, no Python.
    """
    per_subj = quads.groupBy("s").agg(
        F.array_join(F.array_sort(F.collect_set("p")), " ").alias("preds"),
        F.count("*").alias("_nt"),
    )
    return (per_subj.groupBy("preds")
            .agg(F.count("*").alias("n_subjects"),
                 F.sum("_nt").alias("n_triples"))
            .select("preds",
                    (F.size(F.split("preds", " "))).alias("n_preds"),
                    "n_subjects", "n_triples"))


def taxonomy_rollup(
    broader: DataFrame,
    facts: DataFrame,
    child: str = "child",
    parent: str = "parent",
    concept: str = "concept",
    max_iter: int = 20,
) -> DataFrame:
    """Hierarchical rollup over a skos:broader-shaped taxonomy: for
    every concept, the facts assigned to it directly AND the facts
    anywhere under it — the KG-OLAP drill-up a concept scheme exists
    for (the reference mints the schemes via `collectionUrl`/
    `schemeUrl`, csvw.py:583-598; this aggregates along them).

    ``broader`` is (child, parent) concept edges; ``facts`` is
    (item, concept) assignments. Returns one row per concept in the
    universe (taxonomy nodes ∪ fact targets): ``(concept, n_direct,
    n_rollup)``. DAG multi-parent semantics: the ancestor CLOSURE is a
    set, so a fact under two paths to the same ancestor counts once
    there (the "items under concept" reading); it does count once at
    EACH distinct ancestor. A cyclic taxonomy raises — every concept
    in a cycle would roll up everything in it, which is never the
    intended scheme.

    Scale shape: the closure comes from :func:`..operators.canon.
    transitive_pairs` (path doubling, local fast-path for vocabulary-
    sized taxonomies — which they all are); facts join the closure on
    the child side (one shuffle, fan-out = ancestor-chain depth) and
    partial-aggregate to concept-sized counts. The corpus-scale facts
    table is never closed over, only joined.
    """
    from ..operators.canon import transitive_pairs

    b = (broader.select(F.col(child).cast("string").alias("src"),
                        F.col(parent).cast("string").alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .dropDuplicates())
    anc = transitive_pairs(b, max_iter=max_iter)
    # transitive_pairs never emits (x, x) rows, so a cycle shows up as
    # a MUTUAL pair instead: x reaches y and y reaches x. One self-join
    # on the vocabulary-sized closure detects it.
    mutual = anc.where(F.col("src") < F.col("dst")).join(
        anc.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"], "left_semi")
    if not mutual.isEmpty():
        raise ValueError("taxonomy_rollup: cyclic taxonomy "
                         "(a concept is its own ancestor)")
    f = facts.select(F.col(concept).cast("string").alias("c"))
    universe = (b.select(F.col("src").alias("c"))
                .union(b.select(F.col("dst").alias("c")))
                .union(f.select("c"))
                .distinct())
    up = (anc.select(F.col("src").alias("c"), F.col("dst").alias("anc"))
          .union(universe.select("c", F.col("c").alias("anc"))))
    direct = f.groupBy("c").agg(F.count("*").alias("n_direct"))
    rollup = (f.join(up, "c")
              .groupBy(F.col("anc").alias("c"))
              .agg(F.count("*").alias("n_rollup")))
    return (universe
            .join(direct, "c", "left")
            .join(rollup, "c", "left")
            .select(F.col("c").alias("concept"),
                    F.coalesce("n_direct", F.lit(0)).cast("bigint")
                    .alias("n_direct"),
                    F.coalesce("n_rollup", F.lit(0)).cast("bigint")
                    .alias("n_rollup")))


def taxonomy_rollup_oracle_sql(broader_cte: str, facts_cte: str) -> str:
    """DuckDB twin of :func:`taxonomy_rollup` — WITH RECURSIVE with a
    dedup UNION (the set-closure semantics; acyclic fixtures only,
    matching the operator's loud cycle raise)."""
    return f"""
with recursive
b as (
  select distinct cast(child as varchar) as child,
         cast(parent as varchar) as parent
  from ({broader_cte})
  where child is not null and parent is not null
),
f as (select cast(concept as varchar) as c from ({facts_cte})),
universe as (
  -- DuckDB trap: inside WITH RECURSIVE, a plain chained UNION in a
  -- non-recursive CTE loses its dedup semantics (behaves as UNION
  -- ALL) — dedup explicitly
  select distinct c from (
    select child as c from b union all select parent from b
    union all select c from f
  )
),
anc(c, anc) as (
  select c, c from universe
  union
  select a.c, b.parent from anc a join b on b.child = a.anc
),
direct as (select c, count(*) as n_direct from f group by c),
rollup as (
  select a.anc as c, count(*) as n_rollup
  from f join anc a on a.c = f.c group by a.anc
)
select u.c as concept,
       cast(coalesce(d.n_direct, 0) as bigint) as n_direct,
       cast(coalesce(r.n_rollup, 0) as bigint) as n_rollup
from universe u
left join direct d on d.c = u.c
left join rollup r on r.c = u.c
"""


def predicate_profile(quads: DataFrame) -> DataFrame:
    """Per-predicate cardinality profile — the functional /
    inverse-functional discovery pass that feeds
    :func:`cow_spark.operators.canon.ifp_sameas`: before merging
    entities on shared IFP values you need evidence for WHICH
    predicates actually behave inverse-functionally in this corpus
    (declared ``owl:InverseFunctionalProperty`` arcs are rare in fused
    multi-source KGs; observed cardinality is the practical signal).

    One row per predicate: ``(p, n_triples, n_subjects, n_objects,
    max_out, max_in, functional_ppm, inverse_functional_ppm)`` where
    ``max_out`` is the largest distinct-object fan of any subject
    under p (1 ⇔ observed-functional), ``max_in`` the largest
    distinct-subject fan of any object (1 ⇔ observed-inverse-
    functional), and the ppm columns are the floor-scaled share of
    subjects (objects) with exactly one distinct counterpart — the
    tolerance knob for dirty data where a handful of collisions
    shouldn't disqualify a predicate (ifp_sameas merges on values, so
    the caller screens candidates with e.g. ppm ≥ 999000 ∧ max_in ≤
    small-k).

    Objects are keyed on the full term (kind, lex, datatype, lang) with
    NULL components coalesced to a sentinel — ``concat_ws`` silently
    DROPS nulls, which would alias ``"x"@en`` with plain ``"x"``.

    Scale shape: two partial-aggregated groupBys — (p, s) then (p,
    o-term) — each reduced again to the vocabulary-sized per-predicate
    table, joined on p. Fan counts are distinct-counts inside the
    first aggregate (map-side combined); nothing corpus-sized survives
    the first shuffle. No windows, no Python.
    """
    sent = "\x00null\x00"
    okey = F.concat_ws(
        "\x01", F.col("o_kind"), F.col("o_lex"),
        F.coalesce(F.col("o_dt"), F.lit(sent)),
        F.coalesce(F.col("o_lang"), F.lit(sent)))
    t = quads.select("p", "s", okey.alias("ok"))

    def _ppm(num, den):
        x = num * F.lit(1_000_000)
        return ((x - F.pmod(x, den)) / den).cast("long")

    by_s = (t.groupBy("p", "s")
            .agg(F.countDistinct("ok").alias("fan"),
                 F.count("*").alias("nt"))
            .groupBy("p")
            .agg(F.sum("nt").alias("n_triples"),
                 F.count("*").alias("n_subjects"),
                 F.max("fan").alias("max_out"),
                 F.sum(F.when(F.col("fan") == 1, 1).otherwise(0))
                 .alias("_single_out")))
    by_o = (t.groupBy("p", "ok")
            .agg(F.countDistinct("s").alias("fan"))
            .groupBy("p")
            .agg(F.count("*").alias("n_objects"),
                 F.max("fan").alias("max_in"),
                 F.sum(F.when(F.col("fan") == 1, 1).otherwise(0))
                 .alias("_single_in")))
    return (by_s.join(by_o, "p")
            .select("p",
                    F.col("n_triples").cast("long").alias("n_triples"),
                    F.col("n_subjects").cast("long").alias("n_subjects"),
                    F.col("n_objects").cast("long").alias("n_objects"),
                    F.col("max_out").cast("long").alias("max_out"),
                    F.col("max_in").cast("long").alias("max_in"),
                    _ppm(F.col("_single_out"), F.col("n_subjects"))
                    .alias("functional_ppm"),
                    _ppm(F.col("_single_in"), F.col("n_objects"))
                    .alias("inverse_functional_ppm")))


def column_mi(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    frac_bits: int = 10,
) -> DataFrame:
    """Pairwise mutual information between categorical columns — the
    GRADED dependency profile between ``functional_deps``' boolean
    extreme (MI = H(dep) exactly when the FD holds) and independence
    (MI = 0): which metadata columns actually carry information about
    each other (does `source` predict `lang`?), the signal that drives
    stratification keys, partition-column choice, and leakage review
    of "harmless" metadata.

    One row per pair: ``(col_a, col_b, n, h_a_fp, h_b_fp, mi_fp,
    nmi_ppm)`` in the exact integer log2 fixed point (units
    1/2^frac_bits bits): entropies via the one-floor identity
    H = log2fp(N) − ⌊Σ c·log2fp(c) / N⌋ (role_entropy's rule), MI via
    ⌊Σ c_ab·(log2fp(c_ab) + log2fp(N) − log2fp(c_a) − log2fp(c_b)) /
    N⌋ — every division is a single pmod floor, so both engines agree
    bit-for-bit; ``nmi_ppm`` = floor-scaled MI / min(H_A, H_B), NULL
    when either column is constant (zero entropy — normalization is
    undefined, and NULL says so louder than a fake 0). NULL cells form
    their own category (groupBy semantics — a NULL lang is itself
    informative). MI can dip one fixed-point unit below 0 on
    independent columns (each log2fp truncates ≤ 1 ulp); the profile
    reports the honest signed value rather than clamping.

    Scale shape: per pair ONE column-pruned corpus groupBy to the
    contingency table (bounded by the domain product); marginals are
    WINDOW sums over that vocabulary-sized table (partition keys may
    legitimately be NULL — an equi-join on the category would silently
    drop the NULL category's mass); log2 columns are staged on
    vocabulary-sized frames only. int64 audit: each
    |term| ≤ c_ab · 4·63·2^frac, linear in N.
    """
    from pyspark.sql import Window
    from ..functions.intmath import with_log2_fp

    if not pairs:
        raise ValueError("column_mi: pairs must be non-empty")

    def _floor(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    outs = []
    for ca, cb in pairs:
        for c in (ca, cb):
            if c not in df.columns:
                raise KeyError(f"column_mi: unknown column {c!r}")
        cells = (df.select(F.col(ca).alias("_a"), F.col(cb).alias("_b"))
                 .groupBy("_a", "_b").agg(F.count("*").alias("c_ab")))
        j = (cells
             .withColumn("c_a",
                         F.sum("c_ab").over(Window.partitionBy("_a")))
             .withColumn("c_b",
                         F.sum("c_ab").over(Window.partitionBy("_b"))))
        j = with_log2_fp(j, "c_a", "l2a", frac_bits)
        j = with_log2_fp(j, "c_b", "l2b", frac_bits)
        j = with_log2_fp(j, "c_ab", "l2ab", frac_bits)
        term = F.col("c_ab") * (F.col("l2ab")
                                - F.col("l2a") - F.col("l2b"))
        agg = j.agg(F.sum("c_ab").alias("n"),
                    F.sum(term).alias("_s"),
                    F.sum(F.col("c_ab") * F.col("l2a")).alias("_sa"),
                    F.sum(F.col("c_ab") * F.col("l2b")).alias("_sb"))
        agg = with_log2_fp(agg, "n", "_l2n", frac_bits)
        h_a = F.col("_l2n") - _floor(F.col("_sa"), F.col("n"))
        h_b = F.col("_l2n") - _floor(F.col("_sb"), F.col("n"))
        # Σ c_ab·(l2ab − l2a − l2b) + N·l2N, one floor at the end
        mi = _floor(F.col("_s") + F.col("n") * F.col("_l2n"),
                    F.col("n"))
        hmin = F.least(h_a, h_b)
        outs.append(agg.select(
            F.lit(ca).alias("col_a"), F.lit(cb).alias("col_b"),
            F.col("n").cast("long").alias("n"),
            h_a.cast("long").alias("h_a_fp"),
            h_b.cast("long").alias("h_b_fp"),
            mi.alias("mi_fp"),
            F.when(hmin > 0,
                   _floor(mi * F.lit(1_000_000), hmin))
            .alias("nmi_ppm")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law in ppm;
# literal constants, so no cross-engine transcendental math exists
BENFORD_PPM = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution of a numeric column vs
    Benford's law — the numeric-data forensics screen (Nigrini's
    fraud/synthesis test applied to pipeline auditing): organically
    grown magnitudes (prices, counts, durations) follow
    P(d) = log10(1 + 1/d); fabricated, truncated, or unit-mangled
    columns don't, and the per-digit deviation says which digits
    moved.

    One row per digit that occurs: ``(digit, n, observed_ppm,
    expected_ppm, dev_ppm)`` — observed floor-scaled over the counted
    rows, expected the Benford constant, ``dev_ppm`` signed. Counted
    rows are those with ``|x| ≥ 1`` (the integer-part leading digit is
    exact in every engine; sub-unit magnitudes would need decimal
    rescaling whose float division flips digits cross-engine — they
    are EXCLUDED, not guessed, and NULLs with them). The integer part
    must fit int64 (ANSI raises loudly otherwise — a >9.2e18 "price"
    is its own finding).

    Scale shape: one map-side expression (abs → floor → leading char)
    + one partial-agg groupBy bounded by 9 digits + a 1-row broadcast
    total. No windows, no joins on data, no Python.
    """
    d = (df.select(F.abs(F.col(col)).alias("_v"))
         .where(F.col("_v") >= 1)
         .select(F.substring(F.floor("_v").cast("long").cast("string"),
                             1, 1).cast("int").alias("digit")))
    counts = d.groupBy("digit").agg(F.count("*").alias("n"))
    total = d.agg(F.count("*").alias("_tot"))
    exp_map = F.create_map(
        *[x for k, v in BENFORD_PPM.items() for x in (F.lit(k), F.lit(v))])
    obs = F.col("n") * F.lit(1_000_000)
    return (counts.crossJoin(F.broadcast(total))
            .select("digit",
                    F.col("n").cast("long").alias("n"),
                    ((obs - F.pmod(obs, F.col("_tot"))) / F.col("_tot"))
                    .cast("long").alias("observed_ppm"),
                    exp_map[F.col("digit")].cast("long")
                    .alias("expected_ppm"))
            .withColumn("dev_ppm",
                        (F.col("observed_ppm") - F.col("expected_ppm"))
                        .cast("long")))


def null_patterns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Missingness co-occurrence profile — which NULLs travel together
    (the missingno matrix as a table): a column that is NULL exactly
    when another is NULL means one upstream join or parser branch,
    not two independent gaps, and that changes the repair (fix the
    join) and the imputation (don't treat them as independent).

    Each row's pattern is the '0'/'1' mask over ``cols`` in the given
    order ('1' = NULL). One row per occurring pattern:
    ``(pattern, n_null_cols, n, share_ppm)``. The all-zeros pattern is
    the health row — its share is the table's complete-row rate.

    Scale shape: one map-side mask expression + one partial-agg
    groupBy bounded by 2^|cols| occurring patterns + a 1-row broadcast
    total. No windows, no joins on data, no Python.
    """
    if not cols:
        raise ValueError("null_patterns: cols must be non-empty")
    for c in cols:
        if c not in df.columns:
            raise KeyError(f"null_patterns: unknown column {c!r}")
    bits = [F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0"))
            for c in cols]
    pat = df.select(F.concat(*bits).alias("pattern"))
    counts = pat.groupBy("pattern").agg(F.count("*").alias("n"))
    total = pat.agg(F.count("*").alias("_tot"))
    share = F.col("n") * F.lit(1_000_000)
    ones = F.length(F.regexp_replace(F.col("pattern"), "0", ""))
    return (counts.crossJoin(F.broadcast(total))
            .select("pattern",
                    ones.cast("int").alias("n_null_cols"),
                    F.col("n").cast("long").alias("n"),
                    ((share - F.pmod(share, F.col("_tot")))
                     / F.col("_tot")).cast("long").alias("share_ppm")))


def key_skew(df: DataFrame, cols: list[str], k: int = 20) -> DataFrame:
    """Join/shuffle-key skew profile — the audit run BEFORE keying a
    corpus-scale shuffle on a column: every groupBy/join partitions by
    key hash, so one hot key = one straggler task, and the fix
    (broadcast, salt, AQE skew split) is chosen from exactly this
    table. Heavy-hitter share + the max/mean ratio quantify how bad.

    One row per top-``k`` key by count (ties broken by key value for
    determinism): ``(key, n, share_ppm, xmean_ppm, rank)`` — ``key``
    the '|'-joined rendering (NULLs as the '␀' sentinel so a NULL key,
    itself a classic skew source, is visible), ``share_ppm`` over all
    rows, ``xmean_ppm`` = n·10⁶ / (rows/distinct keys): 10⁶ = a
    perfectly even key, 10⁹ = a thousand-times-mean hot key.

    Scale shape: ONE partial-aggregated groupBy on the key (the thing
    being audited — unavoidable and exactly as expensive as the
    shuffle it predicts), then a top-k take (no global sort) + a 1-row
    broadcast of (rows, distinct). No windows, no Python.
    """
    from pyspark.sql import Window

    if not cols:
        raise ValueError("key_skew: cols must be non-empty")
    for c in cols:
        if c not in df.columns:
            raise KeyError(f"key_skew: unknown column {c!r}")
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("␀"))
               for c in cols])
    counts = (df.select(key.alias("key"))
              .groupBy("key").agg(F.count("*").alias("n")))
    tot = counts.agg(F.sum("n").alias("_rows"),
                     F.count("*").alias("_keys"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(k)
    share = F.col("n") * F.lit(1_000_000)
    xmean = F.col("n") * F.lit(1_000_000) * F.col("_keys")
    # the rank window runs over at most k rows post-limit — the one
    # place a global orderBy window is healthy
    return (top.crossJoin(F.broadcast(tot))
            .select("key", F.col("n").cast("long").alias("n"),
                    ((share - F.pmod(share, F.col("_rows")))
                     / F.col("_rows")).cast("long").alias("share_ppm"),
                    ((xmean - F.pmod(xmean, F.col("_rows")))
                     / F.col("_rows")).cast("long").alias("xmean_ppm"))
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("key"))).cast("int")))


def join_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join-cardinality estimate BEFORE running a corpus×corpus join —
    :func:`key_skew`'s sibling for two-sided planning: the exact inner
    equi-join output size is Σ_k c_left(k)·c_right(k) over matching
    keys, computable from two key histograms WITHOUT materializing a
    single joined row. The number that decides broadcast vs shuffle vs
    "this join is a mistake" (a 10¹² estimate on two 10⁹ tables means
    a hub key, and max_fanout names it).

    One row: ``(n_left, n_right, keys_left, keys_right, keys_matched,
    est_rows, max_fanout_key, max_fanout)`` — ``max_fanout`` the
    largest per-key product c_left·c_right (ties broken by key),
    NULLs excluded on both sides (SQL join semantics: NULL never
    matches).

    Scale shape: two column-pruned partial-agg groupBys (each as
    expensive as the join's OWN shuffle would be on that side — the
    audit costs what one pass costs), one key-domain-sized inner join
    of the histograms, one 1-row fold. int64 audit: est_rows can
    legitimately exceed int64 on adversarial inputs — kept as Spark
    decimal/DuckDB-compatible via per-key products capped into int64
    only after a loud overflow would have aborted under ANSI (the
    abort IS the finding: your join output exceeds 9.2e18 rows).
    """
    lk = (left.select(F.col(left_key).alias("k"))
          .where(F.col("k").isNotNull())
          .groupBy("k").agg(F.count("*").alias("cl")))
    rk = (right.select(F.col(right_key).alias("k"))
          .where(F.col("k").isNotNull())
          .groupBy("k").agg(F.count("*").alias("cr")))
    m = lk.join(rk, "k").select(
        "k", (F.col("cl") * F.col("cr")).cast("long").alias("prod"))
    lt = lk.agg(F.sum("cl").alias("n_left"),
                F.count("*").alias("keys_left"))
    rt = rk.agg(F.sum("cr").alias("n_right"),
                F.count("*").alias("keys_right"))
    # one lexicographic struct max gives (fanout, key) with the tie
    # rule (largest key wins) IDENTICAL in both engines — arg_max/
    # max_by tie-breaking is engine-unspecified
    mx = F.max(F.struct(F.col("prod").alias("p"),
                        F.col("k").cast("string").alias("kk")))
    mt = m.agg(F.count("*").alias("keys_matched"),
               F.coalesce(F.sum("prod"), F.lit(0)).alias("est_rows"),
               mx.alias("_mx"))
    mt = mt.select("keys_matched", "est_rows",
                   F.col("_mx.kk").alias("max_fanout_key"),
                   F.coalesce(F.col("_mx.p"), F.lit(0))
                   .alias("max_fanout"))
    return (lt.crossJoin(rt).crossJoin(mt)
            .select(F.col("n_left").cast("long").alias("n_left"),
                    F.col("n_right").cast("long").alias("n_right"),
                    F.col("keys_left").cast("long").alias("keys_left"),
                    F.col("keys_right").cast("long").alias("keys_right"),
                    F.col("keys_matched").cast("long")
                    .alias("keys_matched"),
                    F.col("est_rows").cast("long").alias("est_rows"),
                    F.col("max_fanout_key").cast("string")
                    .alias("max_fanout_key"),
                    F.col("max_fanout").cast("long").alias("max_fanout")))


def void_description(
    quads: DataFrame,
    dataset: str = "d:dataset",
    type_pred: str = "rdf:type",
    approx: bool = False,
) -> DataFrame:
    """VoID dataset description as (s, p, o_lex) triples — the
    machine-readable datasheet a published KG ships alongside its
    data (W3C VoID vocabulary). The reference converter emits data
    only; a 100 TB KG build needs this summary materialized with the
    graph so consumers can size queries without scanning it.

    Emits the dataset-level cardinalities (``void:triples`` /
    ``void:distinctSubjects`` / ``void:distinctObjects`` /
    ``void:properties`` / ``void:classes``) plus one
    property-partition node per predicate (``<dataset>/property/<p>``
    with its void:triples + void:distinctSubjects) and one
    class-partition node per ``type_pred`` class
    (``<dataset>/class/<c>`` with void:entities). Objects are counted
    on the full (kind, lex, dt, lang) term, so ``"1"^^xsd:int`` and
    ``"1"`` stay two objects.

    Scale shape: three passes over a column-pruned scan (dataset
    aggregate, property partition, class partition) — Spark does not
    CSE across union branches, so a caller combining this with other
    profiles should persist upstream. The dataset-level aggregate
    holds four exact distincts in ONE agg, which compiles to an
    Expand (~5x the shuffled rows); ``approx=True`` swaps them for
    HyperLogLog sketches (±2%), the mode a production profile should
    run (exact stays default — the DuckDB oracle replays it
    bit-for-bit). Partition branches are plain partial-agg groupBys.
    """
    cd = F.approx_count_distinct if approx else F.countDistinct
    oterm = F.concat_ws(
        "\x1f", F.col("o_kind"), F.col("o_lex"),
        F.coalesce(F.col("o_dt"), F.lit("")),
        F.coalesce(F.col("o_lang"), F.lit("")))
    q = quads.select("s", "p", "o_kind", "o_lex", oterm.alias("_ot"))
    d = q.agg(
        F.count("*").alias("void:triples"),
        cd("s").alias("void:distinctSubjects"),
        cd("_ot").alias("void:distinctObjects"),
        cd("p").alias("void:properties"),
        cd(F.when((F.col("p") == type_pred)
                  & (F.col("o_kind") == "iri"), F.col("o_lex")))
        .alias("void:classes"))
    stack = ", ".join(f"'{c}', `{c}`" for c in d.columns)
    dataset_rows = d.select(
        F.expr(f"stack({len(d.columns)}, {stack}) as (p, n)"))         .select(F.lit(dataset).alias("s"), "p",
                F.col("n").cast("string").alias("o_lex"))
    prop_rows = (
        q.groupBy("p")
        .agg(F.count("*").alias("nt"), cd("s").alias("ns"))
        .select(F.concat(F.lit(dataset), F.lit("/property/"),
                         F.col("p")).alias("s"),
                F.explode(F.array(
                    F.struct(F.lit("void:triples").alias("p"),
                             F.col("nt").cast("string").alias("o_lex")),
                    F.struct(F.lit("void:distinctSubjects").alias("p"),
                             F.col("ns").cast("string").alias("o_lex"))))
                .alias("x"))
        .select("s", "x.p", "x.o_lex"))
    class_rows = (
        q.where((F.col("p") == type_pred) & (F.col("o_kind") == "iri"))
        .groupBy(F.col("o_lex").alias("cls"))
        .agg(cd("s").alias("ne"))
        .select(F.concat(F.lit(dataset), F.lit("/class/"),
                         F.col("cls")).alias("s"),
                F.lit("void:entities").alias("p"),
                F.col("ne").cast("string").alias("o_lex")))
    return dataset_rows.unionByName(prop_rows).unionByName(class_rows)


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """Median/MAD robust outlier screen per group — the audit that
    catches corrupted numeric feeds (a stuck sensor, a mis-parsed
    currency) where mean/stddev screens are dragged by the very
    outliers they hunt. Integer-exact: the LOWER MEDIAN is defined as
    the ((n+1) div 2)-th smallest value (row_number selection — no
    quantile-function semantics to disagree across engines), MAD is
    the lower median of |x − med|, and a row is an outlier when
    |x − med| > k·MAD (k·0 = 0: any deviation from a constant group
    flags, the correct degenerate reading).

    Scale shape: two per-group sort windows (values, then deviations)
    plus group-sized joins — the EXACT-audit mode, same contract as
    :func:`column_profile`'s percentile_disc path; at full corpus
    scale run the histogram :mod:`~cow_spark.functions.sketch`
    quantiles instead. Returns ``(group, n, med, mad, n_outliers)``.
    """
    from pyspark.sql.window import Window

    g, v = F.col(group_col), F.col(value_col).cast("long")
    base = (df.where(v.isNotNull())
            .select(g.alias("g"), v.alias("v")))
    w = Window.partitionBy("g").orderBy("v")
    cw = Window.partitionBy("g")
    med = (base
           .withColumn("_rn", F.row_number().over(w))
           .withColumn("_n", F.count("*").over(cw))
           .where(F.col("_rn") == F.expr("(_n + 1) div 2"))
           .select("g", F.col("v").alias("med"),
                   F.col("_n").alias("n")))
    dev = (base.join(med, "g")
           .select("g", "v", "n", "med",
                   F.abs(F.col("v") - F.col("med")).alias("d")))
    wd = Window.partitionBy("g").orderBy("d")
    mad = (dev
           .withColumn("_rn", F.row_number().over(wd))
           .where(F.col("_rn") == F.expr("(n + 1) div 2"))
           .select("g", F.col("d").alias("mad")))
    return (dev.join(mad, "g")
            .groupBy("g")
            .agg(F.count("*").cast("long").alias("n"),
                 F.first("med").alias("med"),
                 F.first("mad").alias("mad"),
                 F.sum((F.col("d") > k * F.col("mad")).cast("long"))
                 .cast("long").alias("n_outliers")))


def robust_outliers_oracle_sql(rows_sql: str, k: int = 3) -> str:
    """DuckDB twin of :func:`robust_outliers`. ``rows_sql`` must yield
    (g, v). The lower-median index (n+1)//2 replays via `//`."""
    return f"""
with b as materialized (
  select g, cast(v as bigint) as v from ({rows_sql})
  where v is not null),
med as materialized (
  select g, v as med, n from (
    select g, v, row_number() over (partition by g order by v) as rn,
           count(*) over (partition by g) as n
    from b) t where rn = (n + 1) // 2),
dev as materialized (
  select b.g, b.v, med.n, med.med, abs(b.v - med.med) as d
  from b join med using (g)),
mad as (
  select g, d as mad from (
    select g, d, n, row_number() over (partition by g order by d) as rn
    from dev) t where rn = (n + 1) // 2)
select dev.g, cast(count(*) as bigint) as n,
       cast(min(dev.med) as bigint) as med,
       cast(min(mad.mad) as bigint) as mad,
       cast(sum(case when dev.d > {k} * mad.mad then 1 else 0 end)
            as bigint) as n_outliers
from dev join mad using (g)
group by dev.g
"""


def term_bursts(
    df: DataFrame,
    term_col: str = "term",
    bucket_col: str = "bucket",
    min_count: int = 5,
    lift_threshold_ppm: int = 2_000_000,
) -> DataFrame:
    """Burst detection over (term, time-bucket) observations — the
    Kleinberg-lite temporal screen a corpus/transcript monitor wants:
    a cell bursts when its observed count exceeds the independence
    expectation by ``lift_threshold_ppm`` (2x default) with at least
    ``min_count`` observations (a lone event is an anecdote).

        lift_ppm = floor(n(t,b) · N · 10^6 / (n(t) · n(b)))

    — exact ppm lift (observed/expected), the same pointwise-
    mutual-information shape collocations uses, on the time axis.
    Bucketing is the CALLER's column (day/hour/release) so the
    operator stays pure arithmetic.

    Shape: one (term, bucket) partial agg off the scan, two
    re-aggregations of it (term- and bucket-sized), a broadcast 1-row
    total; joins hit vocabulary-sized sides only. The numerator
    n·N·10^6 needs n·N < 9·10^12 per cell — pre-aggregate or shard by
    epoch beyond ~10^9 rows per job (ANSI overflow is loud, not
    wrong). Returns ``(term, bucket, n, lift_ppm, is_burst)``.
    """
    base = (df.where(F.col(term_col).isNotNull()
                     & F.col(bucket_col).isNotNull())
            .select(F.col(term_col).alias("term"),
                    F.col(bucket_col).alias("bucket")))
    tb = base.groupBy("term", "bucket").agg(
        F.count("*").cast("long").alias("n"))
    nt = tb.groupBy("term").agg(F.sum("n").cast("long").alias("nt"))
    nb = tb.groupBy("bucket").agg(F.sum("n").cast("long").alias("nb"))
    total = tb.agg(F.sum("n").cast("long").alias("total"))
    num = F.col("n") * F.col("total") * 1_000_000
    den = F.col("nt") * F.col("nb")
    return (tb.join(nt, "term").join(nb, "bucket")
            .crossJoin(F.broadcast(total))
            .select("term", "bucket", "n",
                    ((num - F.pmod(num, den)) / den).cast("long")
                    .alias("lift_ppm"))
            .withColumn(
                "is_burst",
                (F.col("n") >= min_count)
                & (F.col("lift_ppm") > lift_threshold_ppm)))


def term_bursts_oracle_sql(
    rows_sql: str,
    min_count: int = 5,
    lift_threshold_ppm: int = 2_000_000,
) -> str:
    """DuckDB twin of :func:`term_bursts`; ``rows_sql`` yields
    (term, bucket)."""
    return f"""
with b as materialized (
  select term, bucket from ({rows_sql})
  where term is not null and bucket is not null),
tb as materialized (
  select term, bucket, cast(count(*) as bigint) as n
  from b group by term, bucket),
nt as (select term, cast(sum(n) as bigint) as nt from tb group by term),
nb as (select bucket, cast(sum(n) as bigint) as nb
       from tb group by bucket),
tt as (select cast(sum(n) as bigint) as total from tb)
select tb.term, tb.bucket, tb.n,
       cast((tb.n * tt.total * 1000000) // (nt.nt * nb.nb) as bigint)
         as lift_ppm,
       tb.n >= {min_count} and
       (tb.n * tt.total * 1000000) // (nt.nt * nb.nb)
         > {lift_threshold_ppm} as is_burst
from tb join nt using (term) join nb using (bucket) cross join tt
"""


_RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def domain_range_infer(quads: DataFrame) -> DataFrame:
    """Schema induction from instance data — per predicate, the
    observed rdfs:domain / rdfs:range with its evidential support:
    the step that turns a freshly-extracted KG (no ontology yet) into
    a draft schema, and the drift alarm for an existing one (a
    predicate whose top subject type slips from 90% to 60% support
    means the extractor started mis-typing entities).

    Per predicate p (rdf:type itself excluded — it IS the typing
    relation): n triples; subjects joined to their rdf:type triples
    → the plurality subject type (tie → lexicographically smallest,
    via min(struct(−count, type)) — a partial-aggable argmax, no
    window) with support = floor(count·10⁶ / typed-subject triples);
    the same for IRI objects; plus the literal/IRI object split. A
    multi-typed subject charges each of its types once — support is
    over (triple, type) evidence pairs, the honest denominator when
    typing is not single-valued.

    Shape: the type map is built once (one filter of the quad scan);
    two fact-sized equi-joins (s→type, o→type), two (p, type)
    partial aggs collapsing to predicate-vocabulary-sized tables, one
    argmax agg each, and a final broadcast-sized assembly join. No
    driver collects, no windows.

    Returns ``(p, n_triples, n_obj_iri, n_obj_lit, subj_type,
    subj_typed, subj_support_ppm, obj_type, obj_typed,
    obj_support_ppm)`` — NULL type/0 support where no typed evidence
    exists. No reference counterpart; extension §2.11.
    """
    base = quads.where(F.col("p") != _RDF_TYPE_IRI)
    tmap = (quads.where((F.col("p") == _RDF_TYPE_IRI)
                        & (F.col("o_kind") == "iri"))
            .select(F.col("s").alias("node"),
                    F.col("o_lex").alias("type")).distinct())
    head = base.groupBy("p").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.sum((F.col("o_kind") == "iri").cast("long")).cast("long")
        .alias("n_obj_iri"),
        F.sum((F.col("o_kind") == "lit").cast("long")).cast("long")
        .alias("n_obj_lit"))

    def _plurality(ev, out_type, out_n, out_ppm):
        per = ev.groupBy("p", "type").agg(
            F.count("*").cast("long").alias("c"))
        tot = per.groupBy("p").agg(
            F.sum("c").cast("long").alias("tot"))
        top = per.groupBy("p").agg(
            F.min(F.struct((-F.col("c")).alias("nc"),
                           F.col("type").alias("t"))).alias("m"))
        num = (-F.col("m.nc")) * F.lit(1_000_000)
        return (top.join(tot, "p").select(
            "p",
            F.col("m.t").alias(out_type),
            F.col("tot").alias(out_n),
            ((num - F.pmod(num, F.col("tot"))) / F.col("tot"))
            .cast("long").alias(out_ppm)))

    sub = _plurality(
        base.select("p", F.col("s").alias("node")).join(tmap, "node"),
        "subj_type", "subj_typed", "subj_support_ppm")
    obj = _plurality(
        base.where(F.col("o_kind") == "iri")
        .select("p", F.col("o_lex").alias("node")).join(tmap, "node"),
        "obj_type", "obj_typed", "obj_support_ppm")
    out = head.join(sub, "p", "left").join(obj, "p", "left")
    return out.select(
        "p", "n_triples", "n_obj_iri", "n_obj_lit",
        "subj_type",
        F.coalesce("subj_typed", F.lit(0)).cast("long")
        .alias("subj_typed"),
        F.coalesce("subj_support_ppm", F.lit(0)).cast("long")
        .alias("subj_support_ppm"),
        "obj_type",
        F.coalesce("obj_typed", F.lit(0)).cast("long")
        .alias("obj_typed"),
        F.coalesce("obj_support_ppm", F.lit(0)).cast("long")
        .alias("obj_support_ppm"))


def domain_range_infer_oracle_sql(quads_sql: str) -> str:
    """DuckDB twin of :func:`domain_range_infer`; ``quads_sql``
    yields (s, p, o_kind, o_lex)."""
    t = _RDF_TYPE_IRI
    return f"""
with q as materialized (
  select s, p, o_kind, o_lex from ({quads_sql})),
base as materialized (select * from q where p <> '{t}'),
tmap as materialized (
  select distinct s as node, o_lex as typ from q
  where p = '{t}' and o_kind = 'iri'),
head as (
  select p, cast(count(*) as bigint) as n_triples,
         cast(sum(case when o_kind = 'iri' then 1 else 0 end)
              as bigint) as n_obj_iri,
         cast(sum(case when o_kind = 'lit' then 1 else 0 end)
              as bigint) as n_obj_lit
  from base group by p),
sev as materialized (
  select p, typ, cast(count(*) as bigint) as c
  from base join tmap on tmap.node = base.s group by 1, 2),
oev as materialized (
  select p, typ, cast(count(*) as bigint) as c
  from base join tmap on tmap.node = base.o_lex
  where base.o_kind = 'iri' group by 1, 2),
stop as (
  select p, min(struct_pack(nc := -c, t := typ)) as m,
         cast(sum(c) as bigint) as tot from sev group by p),
otop as (
  select p, min(struct_pack(nc := -c, t := typ)) as m,
         cast(sum(c) as bigint) as tot from oev group by p)
select head.p, n_triples, n_obj_iri, n_obj_lit,
  stop.m.t as subj_type,
  cast(coalesce(stop.tot, 0) as bigint) as subj_typed,
  cast(coalesce(((-stop.m.nc) * 1000000) // stop.tot, 0) as bigint)
    as subj_support_ppm,
  otop.m.t as obj_type,
  cast(coalesce(otop.tot, 0) as bigint) as obj_typed,
  cast(coalesce(((-otop.m.nc) * 1000000) // otop.tot, 0) as bigint)
    as obj_support_ppm
from head
left join stop on stop.p = head.p
left join otop on otop.p = head.p
"""


def gini_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative integer metric —
    the inequality profile of a corpus mixture (how concentrated are
    tokens across domains, triples across predicates, turns across
    sessions). 0 = perfectly even, →1 = one member holds everything.

    Exact integers via the sorted-rank identity
    ``G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)`` (x ascending, i 1-based),
    computed over tie blocks: a block of ``m`` copies of value ``v``
    after ``p`` smaller rows contributes ``v·(2·m·p + m·(m+1))`` to
    the doubled rank sum — ties never need fractional ranks. The final
    ppm division runs as two-limb long division (quotient at 10^3,
    remainder refined at 10^3) so every intermediate stays under
    int64 for ``n·Σx ≤ 9.2·10^15`` — document-count × token-total per
    group, comfortably past trillion-token mixtures per domain; ANSI
    aborts loudly beyond it rather than wrapping.

    Scale shape: one scan → per-(group, value) combine (map-side
    partial) → a running-count window per group over *distinct values
    only* (bounded by the value vocabulary, not rows) → one per-group
    aggregate. Rows with NULL or negative values are excluded.

    Returns one row per group: ``(grp, n, total, gini_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from pyspark.sql import Window

    base = (df
            .where(F.col(value_col).isNotNull()
                   & (F.col(value_col) >= 0))
            .select(F.col(group_col).alias("grp"),
                    F.col(value_col).cast("long").alias("v")))
    per = base.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    w = (Window.partitionBy("grp").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    blocks = per.select(
        "grp", "v", "m",
        (F.sum("m").over(w) - F.col("m")).cast("long").alias("p"))
    agg = blocks.groupBy("grp").agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("m")).cast("long").alias("total"),
        F.sum(F.col("v")
              * (F.lit(2) * F.col("m") * F.col("p")
                 + F.col("m") * (F.col("m") + 1)))
        .cast("long").alias("s2"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    n, total = F.col("n"), F.col("total")
    numer = (F.col("s2") - (n + 1) * total).cast("long")
    den = (n * total).cast("long")
    q1 = fdiv(numer * F.lit(1000), den)
    r1 = numer * F.lit(1000) - q1 * den
    return agg.select(
        "grp", "n", "total",
        F.when(total > 0,
               q1 * F.lit(1000) + fdiv(r1 * F.lit(1000), den))
        .otherwise(F.lit(0)).cast("long").alias("gini_ppm"))


def gini_index_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`gini_index`; ``rows_sql`` yields
    (grp, v). Same two-limb division — DuckDB would survive on
    HUGEINT, but replaying the bigint-staged steps keeps both engines
    on the identical integer path."""
    return f"""
with base as (
  select grp, cast(v as bigint) as v from ({rows_sql})
  where v is not null and v >= 0),
per as (
  select grp, v, cast(count(*) as bigint) as m
  from base group by grp, v),
blocks as materialized (
  select grp, v, m,
         cast(sum(m) over (partition by grp order by v) - m as bigint)
           as p
  from per),
agg as (
  select grp,
         cast(sum(m) as bigint) as n,
         cast(sum(v * m) as bigint) as total,
         cast(sum(v * (2 * m * p + m * (m + 1))) as bigint) as s2
  from blocks group by grp),
lim as (
  select grp, n, total,
         cast(s2 - (n + 1) * total as bigint) as numer,
         cast(n * total as bigint) as den
  from agg),
q as (
  select grp, n, total, numer, den,
         cast(case when total > 0 then (numer * 1000) // den
              else 0 end as bigint) as q1
  from lim)
select grp, n, total,
  cast(case when total > 0
       then q1 * 1000 + ((numer * 1000 - q1 * den) * 1000) // den
       else 0 end as bigint) as gini_ppm
from q
"""


def chi_square(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Chi-squared independence test + Cramér's V between two
    categorical columns — are language and source domain independent,
    does a judge's verdict depend on the model that answered, is a
    quality gate biased by register. column_mi answers in bits; this
    answers with the classical test statistic and a [0,1] effect size
    comparable across tables of different shape.

    Exact integers via ``χ² = N·(Σ O²/(R·C)) − N`` per cell, each term
    two-limb floored at 10^6 (quotient at the cell, remainder scaled
    by N) so intermediates stay under int64 for ``N ≤ 10^6`` pooled
    rows (sample above; ANSI aborts loudly). ``chi2_fp6`` is the
    sum-of-floors spec (within #cells·10^-6 of textbook);
    ``v_ppm = ⌊10^6·√(χ²/(N·min(r−1,c−1)))⌋`` rides the exact
    integer-sqrt kernel. A single-row or single-column table reads
    V = 0 by convention.

    Scale shape: one scan → per-cell combine (map-side partial), then
    everything downstream lives on the cells table — vocabulary² by
    contract — with broadcast joins for the margins and 1-row totals.
    NULL categories are excluded. Returns one row
    ``(n, r, c, chi2_fp6, v_ppm)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from ..functions.intmath import isqrt_col

    base = (df.where(F.col(a_col).isNotNull()
                     & F.col(b_col).isNotNull())
            .select(F.col(a_col).alias("a"), F.col(b_col).alias("b")))
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("o"))
    rows_m = cells.groupBy("a").agg(F.sum("o").cast("long").alias("rt"))
    cols_m = cells.groupBy("b").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"))

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    j = (cells
         .join(F.broadcast(rows_m), "a")
         .join(F.broadcast(cols_m), "b")
         .crossJoin(F.broadcast(tot)))
    o2 = (F.col("o") * F.col("o")).cast("long")
    rc = (F.col("rt") * F.col("ct")).cast("long")
    t1 = fdiv(o2 * F.lit(1_000_000), rc)
    rem = o2 * F.lit(1_000_000) - t1 * rc
    term = (t1 * F.col("n") + fdiv(rem * F.col("n"), rc)).cast("long")
    agg = j.groupBy("n", "r", "c").agg(
        (F.sum(term) - F.col("n") * F.lit(1_000_000))
        .cast("long").alias("chi2_fp6"))
    mind = F.least(F.col("r") - 1, F.col("c") - 1)
    q = fdiv(F.col("chi2_fp6"), F.col("n") * mind)
    r2 = F.col("chi2_fp6") - q * F.col("n") * mind
    v2 = q * F.lit(1_000_000) + fdiv(r2 * F.lit(1_000_000),
                                     F.col("n") * mind)
    return agg.select(
        "n", "r", "c", "chi2_fp6",
        F.when(mind >= 1, isqrt_col(v2))
        .otherwise(F.lit(0)).cast("long").alias("v_ppm"))


def chi_square_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`chi_square`; ``rows_sql`` yields (a, b).
    Same two-limb floors; the isqrt seed/fix chain is staged through
    CTEs."""
    from ..functions.intmath import isqrt_fix_sql, isqrt_seed_sql

    return f"""
with base as (
  select a, b from ({rows_sql}) where a is not null and b is not null),
cells as materialized (
  select a, b, cast(count(*) as bigint) as o from base group by a, b),
rm as (select a, cast(sum(o) as bigint) as rt from cells group by a),
cm as (select b, cast(sum(o) as bigint) as ct from cells group by b),
tot as (
  select cast(sum(o) as bigint) as n,
         cast(count(distinct a) as bigint) as r,
         cast(count(distinct b) as bigint) as c
  from cells),
terms as (
  select n, r, c,
         cast((o * o * 1000000) // (rt * ct) as bigint) as t1,
         cast(o * o * 1000000 - ((o * o * 1000000) // (rt * ct))
              * (rt * ct) as bigint) as rem,
         cast(rt * ct as bigint) as rc
  from cells
  join rm using (a) join cm using (b) cross join tot),
agg as (
  select n, r, c,
         cast(sum(t1 * n + (rem * n) // rc) - n * 1000000 as bigint)
           as chi2_fp6
  from terms group by n, r, c),
v2s as (
  select n, r, c, chi2_fp6,
         cast(least(r - 1, c - 1) as bigint) as mind
  from agg),
v2t as (
  select n, r, c, chi2_fp6, mind,
         cast(case when mind >= 1 then
           (chi2_fp6 // (n * mind)) * 1000000
           + ((chi2_fp6 - (chi2_fp6 // (n * mind)) * n * mind)
              * 1000000) // (n * mind)
         else 0 end as bigint) as x
  from v2s),
t0 as (select *, cast({isqrt_seed_sql('x')} as bigint) as t from v2t),
t1c as (select n, r, c, chi2_fp6, mind, x,
               cast({isqrt_fix_sql('t', 'x')} as bigint) as t from t0),
t2c as (select n, r, c, chi2_fp6, mind,
               cast({isqrt_fix_sql('t', 'x')} as bigint) as root
        from t1c)
select n, r, c, chi2_fp6,
  cast(case when mind >= 1 then root else 0 end as bigint) as v_ppm
from t2c
"""


_NS_PATTERN = "^(.*[/#])[^/#]*$"


def namespace_profile(quads: DataFrame) -> DataFrame:
    """Namespace induction over a quad table — the prefix block a
    serializer or SPARQL console needs, and the first vocabulary-drift
    question on an unfamiliar graph: which vocabularies does it use,
    where (subject/predicate/object/datatype/graph position), and how
    hard. The reference hard-codes its namespace table
    (`converter/csvw.py:43-57` `namespaces = {...}`); this induces the
    equivalent table from the data itself.

    Namespace = everything up to and including the LAST ``/`` or
    ``#`` (the rdflib/Turtle split rule); an IRI with neither
    separator (``urn:…``) groups under the empty namespace — counted
    honestly, not dropped. Prefixes are assigned deterministically:
    ``ns1, ns2, …`` by descending use count, namespace ascending on
    ties — byte-identical across reruns, so emitted prefix blocks
    diff cleanly between crawls.

    Scale shape: ONE scan (positions staged via ``explode(array(
    struct…))``, never a self-union that re-executes the upstream —
    the no-CSE-across-union-branches rule), partial-agg combine to
    the namespace-sized table, and the row_number window runs on that
    bounded table only. Returns
    ``(prefix, namespace, n_terms, n_uses, n_subj, n_pred, n_obj,
    n_dt, n_graph)``.
    """
    occ = quads.select(F.explode(F.array(
        F.struct(F.lit("s").alias("pos"), F.col("s").alias("iri")),
        F.struct(F.lit("p").alias("pos"), F.col("p").alias("iri")),
        F.struct(F.lit("o").alias("pos"),
                 F.when(F.col("o_kind") == "iri", F.col("o_lex"))
                 .alias("iri")),
        F.struct(F.lit("dt").alias("pos"), F.col("o_dt").alias("iri")),
        F.struct(F.lit("g").alias("pos"), F.col("g").alias("iri")),
    )).alias("e")).select("e.pos", "e.iri").where(F.col("iri").isNotNull())
    ns = occ.select(
        F.regexp_extract("iri", _NS_PATTERN, 1).alias("namespace"),
        "pos", "iri")
    agg = ns.groupBy("namespace").agg(
        F.countDistinct("iri").cast("long").alias("n_terms"),
        F.count(F.lit(1)).cast("long").alias("n_uses"),
        F.sum((F.col("pos") == "s").cast("long")).cast("long")
        .alias("n_subj"),
        F.sum((F.col("pos") == "p").cast("long")).cast("long")
        .alias("n_pred"),
        F.sum((F.col("pos") == "o").cast("long")).cast("long")
        .alias("n_obj"),
        F.sum((F.col("pos") == "dt").cast("long")).cast("long")
        .alias("n_dt"),
        F.sum((F.col("pos") == "g").cast("long")).cast("long")
        .alias("n_graph"))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("n_uses").desc(), F.col("namespace").asc())
    return agg.select(
        F.concat(F.lit("ns"), F.row_number().over(w).cast("string"))
        .alias("prefix"),
        "namespace", "n_terms", "n_uses", "n_subj", "n_pred",
        "n_obj", "n_dt", "n_graph")


def namespace_profile_oracle_sql(quads_sql: str) -> str:
    """DuckDB twin of :func:`namespace_profile`; ``quads_sql`` yields
    (g, s, p, o_kind, o_lex, o_dt, o_lang)."""
    return f"""
with q as materialized ({quads_sql}),
occ as (
  select pos, iri from (
    select 's' as pos, s as iri from q
    union all select 'p', p from q
    union all select 'o', case when o_kind = 'iri' then o_lex end from q
    union all select 'dt', o_dt from q
    union all select 'g', g from q)
  where iri is not null),
ns as (
  select regexp_extract(iri, '{_NS_PATTERN}', 1) as namespace, pos, iri
  from occ),
agg as (
  select namespace,
         cast(count(distinct iri) as bigint) as n_terms,
         cast(count(*) as bigint) as n_uses,
         cast(sum(case when pos = 's' then 1 else 0 end) as bigint)
           as n_subj,
         cast(sum(case when pos = 'p' then 1 else 0 end) as bigint)
           as n_pred,
         cast(sum(case when pos = 'o' then 1 else 0 end) as bigint)
           as n_obj,
         cast(sum(case when pos = 'dt' then 1 else 0 end) as bigint)
           as n_dt,
         cast(sum(case when pos = 'g' then 1 else 0 end) as bigint)
           as n_graph
  from ns group by namespace)
select 'ns' || cast(row_number() over
         (order by n_uses desc, namespace asc) as varchar) as prefix,
       namespace, n_terms, n_uses, n_subj, n_pred, n_obj, n_dt, n_graph
from agg
"""


def fano_factor(df: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """Index of dispersion (Fano factor) per key — the one-number
    burstiness verdict on a count series: F ≈ 1 is Poisson (memoryless
    arrivals), F ≫ 1 is bursty (retry storms, crawler loops, viral
    spikes), F < 1 is regular/throttled. :func:`~..operators.
    sessionize.lag_autocorr` profiles WHERE the memory sits; this
    ranks keys by HOW overdispersed they are, cheap enough to run on
    every key of a 100 TB event log.

    Exact integers: with n buckets, S = Σx, Q = Σx² per key,
    ``F = σ²/μ = (n·Q − S²)/(n·S)`` and

        fano_ppm = q·10^6 + (rem·10^6) // (n·S)

    two-limb floored (q/rem the quotient/remainder of the first
    division) so every intermediate stays under int64 while the
    result is the exact ⌊10^6·F⌋. Zero-sum keys read 0 by convention.
    Overflow contract: n·x_max < 3·10^9 (the n·Q term) and
    n·S < 9.2·10^12 (the remainder limb); ANSI aborts loudly.
    Values must be ≥ 0 (count series). One scan, one partial-agg
    groupBy, all math on the key-sized table. Returns
    (key, n, total, fano_ppm).
    """
    base = df.select(F.col(key_col).alias("key"),
                     F.col(val_col).cast("long").alias("x")) \
             .where(F.col("x").isNotNull() & (F.col("x") >= 0))
    agg = base.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q2"))
    # num = n·Σx² − S² ≥ 0 by Cauchy–Schwarz, so the pmod floor trick
    # (exact-ppm division, the gap_fill convention) applies directly
    num = F.col("n") * F.col("q2") - F.col("s") * F.col("s")
    den = F.col("n") * F.col("s")
    return agg.select(
        "key", "n", F.col("s").alias("total"),
        F.when(F.col("s") > 0,
               ((num - F.pmod(num, den)) / den).cast("long")
               * F.lit(1_000_000)
               + ((F.pmod(num, den) * 1_000_000
                   - F.pmod(F.pmod(num, den) * 1_000_000, den)) / den)
               .cast("long"))
        .otherwise(F.lit(0)).cast("long").alias("fano_ppm"))


def fano_factor_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`fano_factor`; ``rows_sql`` yields
    (key, x) with x ≥ 0."""
    return f"""
with base as (
  select key, cast(x as bigint) as x
  from ({rows_sql}) where x is not null and x >= 0),
agg as (
  select key, cast(count(*) as bigint) as n,
         cast(sum(x) as bigint) as s,
         cast(sum(x * x) as bigint) as q2
  from base group by key)
select key, n, s as total,
  cast(case when s > 0 then
    ((n * q2 - s * s) // (n * s)) * 1000000
    + ((n * q2 - s * s - ((n * q2 - s * s) // (n * s)) * (n * s))
       * 1000000) // (n * s)
  else 0 end as bigint) as fano_ppm
from agg
"""


def psi_drift(
    df: DataFrame,
    slice_col: str,
    bucket_col: str,
) -> DataFrame:
    """Population Stability Index per slice vs the pooled bucket
    distribution — the monitoring-industry name for "has this score/
    feature distribution moved", sibling to
    :func:`~cow_spark.operators.terms.jsd_slices` (term axis,
    pairwise) and :func:`cusum_alarm` (sequential): PSI reads per
    SLICE against the pooled expectation on an already-bucketed axis
    (score deciles, length bands, surprisal buckets), with the field
    folklore thresholds (0.1 drift-watch, 0.25 act) as the consumer.

    Exact integer surface: proportions floor to ppm and CLAMP at
    1 ppm (the standard zero-bucket smoothing — PSI is infinite on
    true zeros), and the log ratio rides the fixed-point log2 kernel:

        psi_fp = Σ_b (p_ppm − q_ppm)·(L(p_ppm) − L(q_ppm))

    in ppm·(1/1024-bit) units — log2 vs the textbook ln is the shared
    constant ln 2 (the AA-score argument), and L's monotonicity makes
    every term ≥ 0 exactly as in the real formula. Log2-PSI ≈
    textbook-PSI × 1.4427; thresholds scale once.

    Shape: one (slice, bucket) partial agg, one bucket-level pooled
    agg broadcast back, log2 kernel staged on the bucket-bounded
    table, one slice-sized sum. Returns ``(slice, n, n_buckets,
    psi_fp)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from ..functions.intmath import with_log2_fp

    base = (df.select(F.col(slice_col).alias("slc"),
                      F.col(bucket_col).alias("b"))
            .where(F.col(slice_col).isNotNull()
                   & F.col(bucket_col).isNotNull()))
    sb = base.groupBy("slc", "b").agg(F.count("*").alias("c"))
    slc_tot = sb.groupBy("slc").agg(F.sum("c").alias("n"))
    pooled = sb.groupBy("b").agg(F.sum("c").alias("cq"))
    pool_tot = pooled.agg(F.sum("cq").alias("nq"))
    j = (sb.join(slc_tot, "slc")
         .join(F.broadcast(pooled), "b")
         .crossJoin(F.broadcast(pool_tot)))
    p = F.greatest(F.expr("(c * 1000000) div n"), F.lit(1))
    q = F.greatest(F.expr("(cq * 1000000) div nq"), F.lit(1))
    j = j.withColumn("p", p.cast("long")).withColumn("q", q.cast("long"))
    j = with_log2_fp(j, "p", "lp")
    j = with_log2_fp(j, "q", "lq")
    return (j.groupBy("slc")
            .agg(F.max("n").cast("long").alias("n"),
                 F.count("*").cast("long").alias("n_buckets"),
                 F.sum((F.col("p") - F.col("q"))
                       * (F.col("lp") - F.col("lq")))
                 .cast("long").alias("psi_fp"))
            .select(F.col("slc").alias("slice"), "n", "n_buckets",
                    "psi_fp"))


def psi_drift_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`psi_drift`; ``rows_sql`` yields
    ``(slc, b)``."""
    from ..functions.intmath import log2_fp_sql

    lp = log2_fp_sql("p")
    lq = log2_fp_sql("q")
    return f"""
with base as (
  select slc, b from ({rows_sql})
  where slc is not null and b is not null),
sb as (select slc, b, cast(count(*) as bigint) as c
       from base group by slc, b),
slc_tot as (select slc, cast(sum(c) as bigint) as n
            from sb group by slc),
pooled as (select b, cast(sum(c) as bigint) as cq from sb group by b),
pool_tot as (select cast(sum(cq) as bigint) as nq from pooled),
j as (
  select sb.slc, sb.b, greatest((c * 1000000) // n, 1) as p,
         greatest((cq * 1000000) // nq, 1) as q, n
  from sb join slc_tot using (slc) join pooled using (b)
       cross join pool_tot),
t as (select slc, n, p, q, {lp} as lp, {lq} as lq from j)
select slc as slice, cast(max(n) as bigint) as n,
       cast(count(*) as bigint) as n_buckets,
       cast(sum((p - q) * (lp - lq)) as bigint) as psi_fp
from t group by slc
"""


def grouped_linfit(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group closed-form OLS line — slope/intercept in exact ppm
    from the four integer sums (n, Σx, Σy, Σxy, Σx²): the parametric
    complement to :func:`~cow_spark.operators.sessionize.mann_kendall`
    (rank trend) when the fitted RATE itself is the deliverable
    (tokens-per-turn growth, latency-per-tool-call, bytes-per-doc by
    snapshot).

        slope_ppm = (n·Σxy − Σx·Σy)·10⁶ div (n·Σx² − (Σx)²)
        icept_ppm = (Σy·10⁶ − slope_ppm·Σx) div n

    Signed divisions are truncating on BOTH engines (Spark ``div`` ↔
    DuckDB ``//``). The cross-products route through DECIMAL(38,0) —
    n·Σxy·10⁶ overflows int64 at unremarkable sizes, and the decimal
    lane is exact to 38 digits on the Spark side, HUGEINT on DuckDB's
    (cast back to bigint only at the ppm outputs, the HUGEINT-hasher
    rule). Degenerate groups (n < 2 or zero x-variance, e.g. all
    points at one x) report NULL slope/intercept rather than a fake
    line. One partial-agg shuffle; output is group-sized.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    d38 = "decimal(38,0)"
    base = (df.select(F.col(key_col).alias("k"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))
            .where(F.col(key_col).isNotNull() & F.col(x_col).isNotNull()
                   & F.col(y_col).isNotNull()))
    agg = base.groupBy("k").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        * F.lit(1_000_000).cast(d38)
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = ((num - num % den) / den).cast("long")
    out = agg.withColumn(
        "slope_ppm",
        F.when((F.col("n") >= 2) & (den != 0), slope))
    inum = (F.col("sy") * F.lit(1_000_000).cast(d38)
            - F.col("slope_ppm").cast(d38) * F.col("sx"))
    icept = ((inum - inum % F.col("n")) / F.col("n")).cast("long")
    return out.select(
        F.col("k").alias("key"), F.col("n").cast("long").alias("n"),
        "slope_ppm",
        F.when(F.col("slope_ppm").isNotNull(), icept)
        .alias("intercept_ppm"))


def grouped_linfit_oracle_sql(rows_sql: str) -> str:
    """DuckDB twin of :func:`grouped_linfit`; ``rows_sql`` yields
    ``(k, x, y)``. HUGEINT carries the cross-products; `//` truncates
    like Spark `div`; outputs cast to BIGINT."""
    return f"""
with base as (
  select k, cast(x as bigint) as x, cast(y as bigint) as y
  from ({rows_sql})
  where k is not null and x is not null and y is not null),
agg as (
  select k, count(*) as n, sum(x) as sx, sum(y) as sy,
         sum(x * y) as sxy, sum(x * x) as sxx
  from base group by k),
fit as (
  select k, n, sx, sy,
         case when n >= 2 and n * sxx - sx * sx <> 0
              then ((n * sxy - sx * sy) * 1000000)
                   // (n * sxx - sx * sx) end as slope
  from agg)
select k as key, cast(n as bigint) as n,
       cast(slope as bigint) as slope_ppm,
       cast(case when slope is not null
            then (sy * 1000000 - slope * sx) // n end as bigint)
         as intercept_ppm
from fit
"""
