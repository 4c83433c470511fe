"""E4 — canonicalization: connected components over the mention graph.

No COW counterpart (single-table converter); mandated by BASELINE.json
north_star ("canonicalization via salted-repartition connected-components
over the mention graph").

Algorithm: min-label propagation **with pointer jumping** (path doubling),
the DataFrame rendition of the alternating large-star/small-star scheme —
converges in O(log n) rounds on chains (plain propagation would need
O(diameter) — a 10k-node chain is in the fixtures precisely to catch
that). Each round:

  1. propagate: l(v) ← min(l(v), min_{u∈N(v)} l(u))   — one shuffle
     (groupBy(node).min — partial min aggregates map-side, so hot nodes
     in a skewed component never concentrate on one task)
  2. jump:      l(v) ← min(l(v), l(l(v)))             — self-join on label
  3. checkpoint every round — truncates the iterative lineage so plans
     don't grow exponentially (the classic iterative-Spark trap);
     ``localCheckpoint`` by default, or a RELIABLE checkpoint when the
     caller passes ``checkpoint_dir`` (see :func:`round_checkpoint`)

Component id = min node id in the component (deterministic across runs
and partitionings). Convergence = no label changed (count action/round).

Scale note: the label self-join probes with a heavily skewed key (every
node of a giant component shares one label) but the build side is unique
per node; AQE skew-join splitting plus the optional salt on the edge
table (``salt_edges``) keep task sizes bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """(src,dst) → undirected edge list, self-loops removed."""
    e = edges.select(F.col("src"), F.col("dst"))
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def round_checkpoint(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Per-round lineage cut for iterative loops.

    Default (``checkpoint_dir=None``): ``localCheckpoint`` — eager,
    fast, blocks live on executors. Right for local runs and for
    clusters where re-running the loop on executor loss is acceptable.

    ``checkpoint_dir`` set: a RELIABLE ``checkpoint`` into that
    directory (HDFS/S3 on a real cluster) — at 10^12-edge scale an
    executor loss mid-iteration must replay only the last round from
    durable storage, not restart the whole O(log n)-round loop from the
    source lineage. Sets the context's checkpoint dir on first use
    (idempotent for the same dir).

    Both paths end with :func:`_strip_carried_stats` — Spark 4's
    ``Dataset.checkpoint`` copies the origin plan's ESTIMATED stats
    into the new ``LogicalRDD`` (``originStats``), so while the plan
    TREE is truncated, the sizeInBytes VALUE compounds across rounds:
    every join multiplies its children's estimates, a self-join
    squares them, and after r rounds the driver is multiplying
    BigIntegers of 63·k^r bits inside ``SizeInBytesOnlyStatsPlanVisitor``
    on every plan analysis. Measured on Borůvka-over-CC (two nested
    iterative loops): round 3's planning took 188 s and round 4 was
    headed for hours — all driver-side Toom-Cook arithmetic, zero
    executor work. Stripping resets the leaf to defaultSizeInBytes;
    broadcast decisions for checkpointed tables then come from AQE's
    runtime sizes, which is where they belonged anyway."""
    if checkpoint_dir is None:
        return _strip_carried_stats(df.localCheckpoint())
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
    return _strip_carried_stats(df.checkpoint(eager=True))


def _strip_carried_stats(df: DataFrame) -> DataFrame:
    """Rewrap a checkpointed DataFrame's RDD in a fresh ``LogicalRDD``
    WITHOUT the origin plan's carried stats (see
    :func:`round_checkpoint`). ``internalCreateDataFrame`` is
    private[sql] in Scala, which compiles to a public method — if a
    future Spark removes it, fall back to the unstripped frame (the
    loops stay correct, only planning cost regresses)."""
    try:
        jdf = df._jdf
        jnew = df.sparkSession._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False)
        return DataFrame(jnew, df.sparkSession)
    except Exception:  # pragma: no cover - Spark-internal API drift
        return df


def salt_edges(edges: DataFrame, buckets: int = 64) -> DataFrame:
    """Explicit skew salt: repartition edges by (dst, salt(src)) so a hot
    destination's edges spread over ``buckets`` tasks.

    Honesty note on where this matters: INSIDE the CC loop this
    partitioning is discarded by the loop's own join/groupBy shuffles —
    there, skew is actually bounded by (a) map-side partial ``min`` in
    the propagate step and (b) AQE skew-join splitting in the pointer-
    jump self-join. Use salt_edges when *materializing* a skewed edge
    list (sink write, checkpoint) so no single task sorts/writes a hot
    destination's full edge set."""
    return edges.repartition(
        F.col("dst"), F.pmod(F.xxhash64(F.col("src")), F.lit(buckets))
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    salt_buckets: int | None = None,
    local_threshold: int = 0,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Edge list (src, dst) → (node, component) with component = min node.

    Nodes are any orderable type (string mention keys or long ids).

    ``local_threshold``: when > 0 and the (symmetrized, deduped) edge
    count is at or below it, solve with driver-side union-find instead of
    the iterative joins — identical output, one job instead of
    ~log(d)×3. This is NOT a scale path: it exists because running
    distributed rounds over a vocabulary-sized graph (the hub projection
    in :func:`canonical_entities` — thousands of nodes even when the
    corpus has billions of mentions) is pure scheduler overhead. Large
    graphs always take the distributed path; the threshold is an explicit
    opt-in, default off.

    Distributed algorithm (r5): alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"). Each round rewires the edge set itself —
    large-star hangs every larger neighbor of a node onto its
    neighborhood minimum, small-star does the same for the smaller
    neighbors — so path lengths roughly halve per round for BOTH
    chain-shaped and random structure, and the unique fixpoint is the
    star decomposition (every node directly attached to its
    component's minimum). Label propagation with pointer jumping —
    the previous shape — needs ~eccentricity(min) rounds on random
    graphs (local minima are jump sinks; measured 18 rounds on the
    14.7k-edge bench fixture, and only monotone-id chains actually
    double); star contraction is O(log² n) worst case, ~5-7 rounds in
    practice, and the edge set SHRINKS as stars form. Convergence is
    checked exactly: count-stable AND multiset-equal to the previous
    round (the exceptAll probe only runs once counts stop moving).
    At 10^12-edge scale this is the difference between O(E·log n)
    and O(E·diameter) total work.
    """
    e = symmetrize(edges)
    if salt_buckets:
        e = salt_edges(e, salt_buckets)

    # canonical undirected form: (hi, lo) with hi > lo
    E = round_checkpoint(
        e.select(F.greatest("src", "dst").alias("hi"),
                 F.least("src", "dst").alias("lo"))
        .dropDuplicates(["hi", "lo"]),
        checkpoint_dir,
    )
    prev_cnt = E.count()

    if local_threshold and prev_cnt <= local_threshold:
        return _cc_local(
            E.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))

    for _ in range(max_iter):
        # large-star: m(u) = min(N(u) ∪ {u}); every neighbor v > u
        # attaches to m(u). Output stays canonical: v > u ≥ m.
        nbrs = (E.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
                .unionByName(E.select(F.col("lo").alias("u"),
                                      F.col("hi").alias("v"))))
        lm = (nbrs.groupBy("u").agg(F.min("v").alias("mv"))
              .select("u", F.least("u", "mv").alias("m")))
        ls = (nbrs.join(lm, "u")
              .where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
              .where(F.col("hi") != F.col("lo"))
              .dropDuplicates(["hi", "lo"]))
        # small-star: m(u) = min of u's smaller neighbors; they and u
        # itself attach to m. Output canonical: v > m and u > m.
        sm = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        prev_E = E
        E = round_checkpoint(
            ls.join(sm, "hi")
            .select(F.col("lo").alias("v"), "m")
            .unionByName(sm.select(F.col("hi").alias("v"), "m"))
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .dropDuplicates(["hi", "lo"]),
            checkpoint_dir,
        )
        cnt = E.count()
        # exact convergence: equal counts, then a set-difference probe
        # (both sides are deduped checkpoints; the probe runs only once
        # counts stop moving, and star sets are the alternation's only
        # fixpoint — the paper's potential function rules out cycles)
        if cnt == prev_cnt and (
                E.exceptAll(prev_E).limit(1).count() == 0):
            break
        prev_cnt = cnt

    # at the star fixpoint every non-center appears as hi with its
    # component minimum as lo, and centers appear only as lo
    return (E.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
            .unionByName(E.select(F.col("lo").alias("node"),
                                  F.col("lo").alias("component")))
            .dropDuplicates(["node", "component"]))


def _cc_local(e: DataFrame) -> DataFrame:
    """Driver-side union-find for graphs under the local threshold;
    same (node, component=min node) contract as the distributed path."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for src, dst in e.select("src", "dst").toLocalIterator():
        for n in (src, dst):
            parent.setdefault(n, n)
        ra, rb = find(src), find(dst)
        if ra != rb:
            # union by min keeps component = min node id deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    from pyspark.sql.types import StructField, StructType

    node_t = e.schema["src"].dataType
    schema = StructType([StructField("node", node_t),
                         StructField("component", node_t)])
    return e.sparkSession.createDataFrame(rows, schema)


def canonical_entities(linked: DataFrame) -> DataFrame:
    """Build the mention graph from linking output and canonicalize.

    Two mentions are connected when they share a linked entity_id OR the
    same normalized surface form → components merge aliases that linking
    alone kept apart.

    Scale shape: mentions never enter the iterative CC. The mention graph
    is bipartite through hub nodes (one per entity_id, one per surface
    form), so its components are exactly the components of the **hub
    projection** — a graph whose size tracks the vocabulary (distinct
    entities + surface forms), not the corpus. CC runs on that small
    graph; mentions attach to their hub's component with one broadcast
    join. (A mention×mention self-join on entity_id would be quadratic in
    the hot entity's mention count — 30% of all mentions in the skew
    fixture.)
    """
    m = linked.select("mention_iri", "entity_id", "mention_norm")
    hub_edges = (
        m.select(
            F.concat(F.lit("urn:hub:entity:"), F.col("entity_id")).alias("src"),
            F.concat(F.lit("urn:hub:norm:"), F.col("mention_norm")).alias("dst"),
        )
        .distinct()
    )
    # hub graphs are vocabulary-sized; under ~200k edges the driver-local
    # union-find beats ~14 scheduled rounds (identical output, see
    # connected_components.local_threshold — bigger vocabularies go
    # distributed automatically)
    cc = connected_components(hub_edges, local_threshold=200_000)
    ecomp = F.broadcast(
        cc.where(F.col("node").startswith("urn:hub:entity:")).select(
            F.expr("substring(node, 16)").alias("entity_id"),
            F.col("component"),
        )
    )
    return (
        linked.join(ecomp, "entity_id")
        .withColumnRenamed("component", "canonical_id")
    )


def transitive_pairs(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    local_threshold: int = 2_000,
) -> DataFrame:
    """Directed transitive closure of an edge list: every (src, dst)
    connected by a path — property-path-lite (``p+``) for quad tables,
    e.g. skos:broader ancestor chains.

    Path doubling: each round joins the reachability set with itself
    (R ← R ∪ R∘R), so depth-d paths close in ⌈log₂ d⌉ rounds;
    ``localCheckpoint`` per round truncates the iterative lineage.
    Converges when a round adds no pair.

    ``local_threshold``: edge lists at or below this size close
    driver-side in one collect (the pagerank/CC local-twin pattern) —
    schema hierarchies and taxonomy relations are vocabulary-sized, and
    K doubling rounds each costing a join + dedup + count job are pure
    scheduler overhead there (measured: the rdfs_closure entry's two
    schema closures dominated its wall time). Identical output by
    construction (a closure is a set); ``0`` forces the distributed
    path. The local path computes the COMPLETE closure (no
    ``max_iter`` depth bound applies to it).

    Scale honesty: the OUTPUT is inherently |pairs|-sized — a complete
    closure of a deep/dense graph is quadratic in nodes, which no plan
    fixes. Use on hierarchy-shaped relations (taxonomies, org charts),
    where closures are near-linear, not on social-graph-dense edges.
    """
    r = round_checkpoint(
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(), checkpoint_dir)
    if local_threshold and r.count() <= local_threshold:
        rows = [(x["src"], x["dst"]) for x in r.collect()]
        adj: dict = {}
        for a, b in rows:
            adj.setdefault(a, set()).add(b)
        closed = set()
        for a in adj:
            seen: set = set()
            stack = list(adj[a])
            while stack:
                v = stack.pop()
                if v in seen:
                    continue
                seen.add(v)
                stack.extend(adj.get(v, ()))
            seen.discard(a)  # (a, a) never emitted, same as distributed
            closed.update((a, v) for v in seen)
        t_src = edges.schema["src"].dataType.simpleString()
        t_dst = edges.schema["dst"].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            sorted(closed), f"src {t_src}, dst {t_dst}")
    for _ in range(max_iter):
        hop = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        new_r = round_checkpoint(
            r.unionByName(hop).dropDuplicates(), checkpoint_dir)
        # convergence probe: row count is monotone under closure
        if new_r.count() == r.count():
            return new_r
        r = new_r
    import warnings

    warnings.warn(
        f"transitive_pairs did not converge within max_iter={max_iter} "
        "doubling rounds — the returned reachability set is INCOMPLETE "
        "for paths deeper than 2^max_iter; raise max_iter",
        stacklevel=2)
    return r


def quad_transitive_pairs(quads: DataFrame, predicate: str,
                          max_iter: int = 20) -> DataFrame:
    """Transitive closure of one predicate's (s, o-IRI) edges in a quad
    table — ``match_bgp``'s missing property-path operator."""
    edges = (
        quads.where((F.col("p") == predicate) & (F.col("o_kind") == "iri"))
        .select(F.col("s").alias("src"), F.col("o_lex").alias("dst"))
    )
    return transitive_pairs(edges, max_iter)


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def rewrite_canonical(
    quads: DataFrame,
    mapping: DataFrame,
    member_col: str = "member_iri",
    canonical_col: str = "canonical_iri",
    emit_sameas: bool = False,
    distinct: bool = True,
) -> DataFrame:
    """Apply an entity-resolution mapping to a quad table — the last
    step of the extract → link → canonicalize loop: every subject and
    every IRI object that appears in ``mapping`` is replaced by its
    canonical IRI (literals and unmapped IRIs pass through untouched).

    ``emit_sameas=True`` appends one ``member owl:sameAs canonical``
    quad per non-identity mapping row (in the default graph), so the
    original identifiers stay queryable after the rewrite.

    Rewriting collapses formerly-distinct quads onto one canonical
    form; ``distinct=True`` (set semantics, the RDF default) pays one
    dedup shuffle for it — pass False when the caller's sink dedups
    anyway. Scale shape: the mapping is entity-vocabulary-sized by
    construction (one row per resolved member), so both rewrites are
    broadcast left joins — the corpus-scale quads are never shuffled
    except by the optional dedup.

    The mapping must be FUNCTIONAL — exactly one canonical per member
    (what canonicalization produces by construction). A member with two
    canonical rows would fan every matching quad out into both
    rewrites; validate upstream if the mapping comes from elsewhere.
    """
    mp = mapping.select(F.col(member_col).alias("_m"),
                        F.col(canonical_col).alias("_c"))
    out = (
        quads.join(F.broadcast(mp), F.col("s") == F.col("_m"), "left")
        .withColumn("s", F.coalesce(F.col("_c"), F.col("s")))
        .drop("_m", "_c")
        .join(F.broadcast(mp),
              (F.col("o_kind") == "iri") & (F.col("o_lex") == F.col("_m")),
              "left")
        .withColumn("o_lex", F.coalesce(F.col("_c"), F.col("o_lex")))
        .drop("_m", "_c")
        .select(*quads.columns)
    )
    if emit_sameas:
        sameas = (
            mp.where(F.col("_m") != F.col("_c"))
            .select(F.lit(None).cast("string").alias("g"),
                    F.col("_m").alias("s"),
                    F.lit(OWL_SAMEAS).alias("p"),
                    F.lit("iri").alias("o_kind"),
                    F.col("_c").alias("o_lex"),
                    F.lit(None).cast("string").alias("o_dt"),
                    F.lit(None).cast("string").alias("o_lang"))
            .select(*quads.columns)
        )
        out = out.unionByName(sameas)
    return out.dropDuplicates() if distinct else out


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    local_threshold: int = 100_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Maintain a connected-components labeling under an edge batch
    WITHOUT re-running CC over the full graph: the KG-maintenance path
    for streaming/batched canonicalization (north_star's resumable
    pipeline keeps a 10^12-edge mention graph labeled; each ingest batch
    must merge in O(batch), not O(graph)).

    ``labels``: the existing ``(node, component)`` assignment (component
    = min node id, the :func:`connected_components` contract).
    ``new_edges``: the delta ``(src, dst)``. Returns the updated
    ``(node, component)`` for the union graph — provably equal to
    ``connected_components(old_edges ∪ new_edges)`` because components
    can only merge via a new edge, and a merged component's min node id
    is the min of the merged parts' ids.

    Shape: ONE hash join of the (bounded) endpoint set against
    ``labels`` resolves each delta endpoint to its current label (unseen
    nodes label themselves); CC then runs on the LABEL graph — at most
    2·|delta| nodes, delta-sized by construction — and the resulting
    merge map (old label → merged min) is delta-bounded, so the final
    rewrite is a broadcast left join against the labels table. The full
    corpus-scale labels table is scanned once and shuffled never.
    """
    e = symmetrize(new_edges)
    ends = e.select(F.col("src").alias("node")).distinct()
    # resolve delta endpoints to current labels (one join, delta-sized
    # probe side against the big labels table)
    lab = (ends.join(labels, "node", "left")
           .select("node",
                   F.coalesce(F.col("component"), F.col("node"))
                   .alias("label"))
           .persist())
    # label-graph edges: delta edges re-keyed to labels
    lsrc = lab.select(F.col("node").alias("src"),
                      F.col("label").alias("ls"))
    ldst = lab.select(F.col("node").alias("dst"),
                      F.col("label").alias("ld"))
    label_edges = (e.join(lsrc, "src").join(ldst, "dst")
                   .select(F.col("ls").alias("src"),
                           F.col("ld").alias("dst"))
                   .where(F.col("src") != F.col("dst"))
                   .distinct())
    merged = connected_components(
        label_edges, local_threshold=local_threshold,
        checkpoint_dir=checkpoint_dir)
    merge_map = merged.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("_old"), F.col("component").alias("_new"))
    # brand-new nodes (not in labels) enter as their own component first
    fresh = (ends.join(labels.select("node"), "node", "left_anti")
             .withColumn("component", F.col("node")))
    out = (labels.unionByName(fresh)
           .join(F.broadcast(merge_map),
                 F.col("component") == F.col("_old"), "left")
           .select("node",
                   F.coalesce(F.col("_new"), F.col("component"))
                   .alias("component")))
    lab.unpersist()
    return out


def ifp_sameas(
    quads: DataFrame,
    ifp_predicates: list[str],
    salt_buckets: int | None = None,
    local_threshold: int = 0,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """owl:InverseFunctionalProperty entity resolution: two subjects
    carrying the same literal value for an IFP (email, ISBN, ORCID …)
    denote the same entity, so shared values induce owl:sameAs merges.
    Returns ``(node, canonical)`` for every subject that carries at
    least one IFP value, canonical = the component minimum (entities
    chained through DIFFERENT properties merge transitively — A shares
    an email with B, B a phone with C ⇒ {A,B,C}).

    Scale shape — the LSH-bucket discipline applied to identity: each
    (property, value) group emits STAR edges to its min subject (one
    groupBy + one join back), never pairwise, so a hot value (the
    empty-string pathology, a shared support inbox) costs O(group)
    edges, not O(group²). The star tables are edge-shaped and bounded
    by the subject-value pair count; the corpus-scale value projection
    is deliberately NOT persisted (re-deriving a filter+project of the
    quad scan is cheaper than caching a corpus-sized table — link.py
    rule). Merging runs on :func:`connected_components` (min-label +
    pointer jumping, ``salt_buckets`` for hot-component skew).

    Reference parity: COW has no linking stage (csvw.py emits, never
    merges); this is north-star surface — the canonicalization COW
    leaves to a downstream triple store, done Spark-side.
    """
    if not ifp_predicates:
        raise ValueError("ifp_predicates must name at least one property")
    vals = (quads
            .where(F.col("p").isin(list(ifp_predicates))
                   & (F.col("o_kind") == "lit"))
            .select("s", "p", "o_lex").dropDuplicates())
    reps = vals.groupBy("p", "o_lex").agg(F.min("s").alias("rep"))
    star = (vals.join(reps, ["p", "o_lex"])
            .where(F.col("s") != F.col("rep"))
            .select(F.col("s").alias("src"), F.col("rep").alias("dst"))
            .dropDuplicates())
    comp = connected_components(
        star, salt_buckets=salt_buckets,
        local_threshold=local_threshold, checkpoint_dir=checkpoint_dir)
    subs = vals.select("s").distinct()
    return (subs.join(comp, subs["s"] == comp["node"], "left")
            .select(F.col("s").alias("node"),
                    F.coalesce(F.col("component"), F.col("s"))
                    .alias("canonical")))


def resolve_claims(
    claims: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    source_col: str = "source",
) -> DataFrame:
    """Truth discovery over conflicting multi-source assertions: for
    every (subject, predicate) where sources disagree on the object,
    elect the value with the most DISTINCT supporting sources, ties to
    the smallest object (deterministic; majority voting, the base case
    of TruthFinder/Dawid-Skene-style resolution). The KG-fusion step a
    multi-feed pipeline runs between per-source extraction and
    canonicalization — COW converts one CSV at a time and has no fusion
    notion (per-file convert loop, csvw_tool.py:88-118); a 10^12-turn
    pipeline ingesting N feeds needs one.

    Returns one row per (s, p): ``(s, p, o, support, n_sources,
    n_values)`` — elected object, its distinct-source support, total
    distinct sources asserting anything for this (s, p), and the
    number of distinct candidate values (1 = no conflict).

    Scale shape: two aggregate-sized shuffles (claims → per-value
    distinct-source counts → per-key argmax via ``min(struct)``), both
    with map-side partial aggregation; no self-joins, no windows over
    the corpus, output bounded by distinct (s, p).
    """
    per_val = (claims
               .groupBy(F.col(s_col).alias("s"), F.col(p_col).alias("p"),
                        F.col(o_col).alias("o"))
               .agg(F.countDistinct(F.col(source_col)).alias("support")))
    return (per_val
            .groupBy("s", "p")
            .agg(F.min(F.struct((-F.col("support")).alias("_neg"),
                                F.col("o").alias("o"))).alias("_win"),
                 F.sum("support").alias("_tot"),
                 F.count("*").alias("n_values"))
            .select("s", "p", F.col("_win.o").alias("o"),
                    (-F.col("_win._neg")).cast("long").alias("support"),
                    F.col("_tot").cast("long").alias("n_sources"),
                    F.col("n_values").cast("long").alias("n_values")))


def source_reliability(
    claims: DataFrame,
    resolved: DataFrame | None = None,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    source_col: str = "source",
) -> DataFrame:
    """Per-source agreement with the majority-elected values (one
    voting iteration of TruthFinder, kept integer-exact): for each
    source, the fraction of its claims whose object equals the
    :func:`resolve_claims` winner — floor-scaled to parts-per-million
    so the DuckDB twin replays it bit-exactly.

    ``resolved`` defaults to ``resolve_claims(claims)``; pass it in
    when already computed (the claims table is scanned once either
    way — the join probes the aggregate-sized resolved table, which
    Spark broadcasts when small).

    Returns ``(source, n_claims, n_agree, reliability_m)``.
    """
    if resolved is None:
        resolved = resolve_claims(claims, s_col, p_col, o_col, source_col)
    win = resolved.select(
        F.col("s"), F.col("p"), F.col("o").alias("_win_o"))
    j = (claims.select(F.col(s_col).alias("s"), F.col(p_col).alias("p"),
                       F.col(o_col).alias("o"),
                       F.col(source_col).alias("source"))
         .join(win, ["s", "p"], "left"))
    agree = F.when(F.col("o") == F.col("_win_o"), 1).otherwise(0)
    num = F.col("n_agree") * 1_000_000
    rel = ((num - F.pmod(num, F.col("n_claims"))) / F.col("n_claims"))
    return (j.groupBy("source")
            .agg(F.count("*").alias("n_claims"),
                 F.sum(agree).alias("n_agree"))
            .select("source",
                    F.col("n_claims").cast("long").alias("n_claims"),
                    F.col("n_agree").cast("long").alias("n_agree"),
                    # exact integer floor-div (pmod trick) — a double
                    # division's ulp could flip floor at exact quotients
                    rel.cast("long").alias("reliability_m")))


def bnode_canon(
    quads: DataFrame,
    rounds: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic blank-node relabeling of an RDF quad table — the
    canonicalization step RDFC-1.0/URDNA2015 performs before signing
    or diffing graphs. The reference's rdflib BNode ids are stable
    only within a run (csvw.py:305,351,524), so two conversions of the
    same input are not byte-comparable; this rewrites every ``_:``
    term to a label derived purely from the node's structural position
    (never from its input label), making output N-Quads run-invariant.

    Mechanics: labeled 1-WL over the quad incidence graph (the same
    hash-refine loop as :func:`.graphrank.wl_refine`, which documents
    the commutative-sum multiset hash and its scale shape). Ground
    terms are initialized with the hash of their own lexical form —
    they are the anchors — while every bnode starts from one shared
    color; ``rounds`` rounds of

        color' = H60(color, Σ H32(dir, graph|pred, neighbor color))

    propagate anchor identity through bnode chains. The canonical
    label is ``_:c<color>`` — the color VALUE, not a rank: assigning
    dense ranks would need a global sort of the orbit table, while the
    hash label is collision-bounded (60-bit) and needs no extra
    shuffle. Automorphic bnodes (indistinguishable by 1-WL) share a
    label by construction, and the final ``distinct()`` collapses
    their now-identical quads — the semantics RDF dataset canonical
    form requires. Literals key on (kind, lex, dt, lang) so equal
    lexical forms under different datatypes stay distinct anchors.

    Per round: one shuffle join + one partial-agg sum, lineage cut via
    :func:`round_checkpoint`; the rewrite is two key joins on the
    bnode-label table (bounded by the bnode count, not the quad
    count). Returns canonical (g, s, p, o_kind, o_lex, o_dt, o_lang).
    """
    from ..functions.hashing import portable_hash32, portable_hash60

    if rounds < 1:
        raise ValueError(f"bnode_canon: rounds must be >= 1, got {rounds}")
    okey = F.when(F.col("o_kind") == "iri", F.col("o_lex")).otherwise(
        F.concat_ws("\x1f", F.lit("L"), F.col("o_lex"),
                    F.coalesce(F.col("o_dt"), F.lit("")),
                    F.coalesce(F.col("o_lang"), F.lit(""))))
    e = quads.select(
        F.col("s").alias("sk"), okey.alias("ok"),
        F.concat_ws("|", F.coalesce(F.col("g"), F.lit("")),
                    F.col("p")).alias("lbl"))
    terms = round_checkpoint(
        e.select(F.col("sk").alias("node"), F.lit("o").alias("dir"),
                 "lbl", F.col("ok").alias("nbr"))
        .unionByName(
            e.select(F.col("ok").alias("node"), F.lit("i").alias("dir"),
                     "lbl", F.col("sk").alias("nbr"))),
        checkpoint_dir)
    colors = round_checkpoint(
        terms.select("node").distinct()
        .select("node", F.when(
            F.col("node").startswith("_:"),
            portable_hash60(F.lit("bn"))).otherwise(
            portable_hash60(F.concat(F.lit("gr|"), F.col("node"))))
            .alias("color")),
        checkpoint_dir)
    for _ in range(rounds):
        t = (terms
             .join(colors.select(F.col("node").alias("nbr"),
                                 F.col("color").alias("nc")), "nbr")
             .select("node", portable_hash32(
                 F.concat_ws("|", F.lit("bcE"), F.col("dir"), F.col("lbl"),
                             F.col("nc").cast("string"))).alias("term"))
             .groupBy("node").agg(F.sum("term").alias("ts")))
        colors = round_checkpoint(
            colors.join(t, "node", "left")
            .select("node", portable_hash60(
                F.concat_ws("|", F.lit("bcC"),
                            F.col("color").cast("string"),
                            F.coalesce(F.col("ts"), F.lit(-1))
                            .cast("string"))).alias("color")),
            checkpoint_dir)
    lab = colors.where(F.col("node").startswith("_:")).select(
        "node",
        F.concat(F.lit("_:c"), F.col("color").cast("string"))
        .alias("canon"))
    sl = lab.select(F.col("node").alias("s"), F.col("canon").alias("_sc"))
    ol = lab.select(F.col("node").alias("o_lex"),
                    F.col("canon").alias("_oc"))
    return (quads.join(sl, "s", "left").join(ol, "o_lex", "left")
            .select(
                "g", F.coalesce("_sc", "s").alias("s"), "p", "o_kind",
                # the o_lex join alone would also hit a LITERAL whose
                # lexical form happens to look like a bnode label —
                # only iri-kind objects take the canonical name
                F.when((F.col("o_kind") == "iri")
                       & F.col("_oc").isNotNull(), F.col("_oc"))
                .otherwise(F.col("o_lex")).alias("o_lex"),
                "o_dt", "o_lang")
            .distinct())


def bnode_canon_oracle_sql(quads_sql: str, rounds: int = 2) -> str:
    """DuckDB twin of :func:`bnode_canon`. ``quads_sql`` must yield
    (g, s, p, o_kind, o_lex, o_dt, o_lang). Twice-referenced CTEs are
    ``as materialized`` (DuckDB inlining trap); the per-round sum is
    cast to BIGINT inside its CTE (the r3 HUGEINT driver-red class);
    bnode detection uses ``starts_with`` because ``_`` is a LIKE
    wildcard."""
    from ..functions.hashing import portable_hash32_sql, portable_hash60_sql

    parts = [
        f"q as materialized ({quads_sql})",
        "e as materialized ("
        " select s as sk,"
        "  case when o_kind = 'iri' then o_lex"
        "   else concat_ws(chr(31), 'L', o_lex, coalesce(o_dt, ''),"
        "                  coalesce(o_lang, '')) end as ok,"
        "  concat_ws('|', coalesce(g, ''), p) as lbl"
        " from q)",
        "t as materialized ("
        " select sk as node, 'o' as dir, lbl, ok as nbr from e"
        " union all"
        " select ok as node, 'i' as dir, lbl, sk as nbr from e)",
        "c0 as materialized (select distinct node,"
        " case when starts_with(node, '_:') then "
        + portable_hash60_sql("'bn'")
        + " else " + portable_hash60_sql("concat('gr|', node)")
        + " end as color from t)",
    ]
    term = portable_hash32_sql(
        "concat_ws('|', 'bcE', t.dir, t.lbl, cast(c.color as varchar))")
    for k in range(1, rounds + 1):
        parts.append(
            f"a{k} as materialized ("
            f" select t.node, cast(sum({term}) as bigint) as ts"
            f" from t join c{k - 1} c on t.nbr = c.node"
            f" group by t.node)")
        nxt = portable_hash60_sql(
            "concat_ws('|', 'bcC', cast(c.color as varchar),"
            " cast(coalesce(a.ts, -1) as varchar))")
        parts.append(
            f"c{k} as materialized ("
            f" select c.node, {nxt} as color"
            f" from c{k - 1} c left join a{k} a on a.node = c.node)")
    parts.append(
        f"lab as materialized (select node,"
        f" '_:c' || cast(color as varchar) as canon"
        f" from c{rounds} where starts_with(node, '_:'))")
    return ("with " + ",\n".join(parts) + """
select distinct q.g,
       coalesce(ls.canon, q.s) as s,
       q.p, q.o_kind,
       case when q.o_kind = 'iri' and lo.canon is not null
            then lo.canon else q.o_lex end as o_lex,
       q.o_dt, q.o_lang
from q
left join lab ls on ls.node = q.s
left join lab lo on q.o_kind = 'iri' and lo.node = q.o_lex""")


def canon_conflicts(
    labels: DataFrame,
    claims: DataFrame,
    node_col: str = "node",
    comp_col: str = "comp",
    value_col: str = "v",
) -> DataFrame:
    """Merge-quality audit of a canonicalization: for every component
    of the entity-resolution output, how many member nodes carry a
    claim on some single-valued attribute (an IFP-like email/SSN/
    registration id) and how many DISTINCT values those claims take —
    more than one means the component merged records that a correct
    resolution would keep apart (an over-merge), the error
    :func:`er_eval` can only see when gold labels exist. This is the
    gold-free version: any functionally-single-valued attribute is a
    free audit signal.

    One node-keyed join (labels ⋈ claims) and one component-keyed
    partial agg; NULL claims count as unclaimed, never as a value.
    Returns ``(comp, n_nodes, n_claimed, n_values, has_conflict)``
    for EVERY component (callers filter has_conflict — the clean rows
    are the denominator an audit report needs).
    """
    lab = labels.select(F.col(node_col).alias("_n"),
                        F.col(comp_col).alias("comp"))
    cl = claims.select(F.col(node_col).alias("_n"),
                       F.col(value_col).alias("_v"))
    j = lab.join(cl, "_n", "left")
    return (j.groupBy("comp")
            .agg(F.countDistinct("_n").cast("long").alias("n_nodes"),
                 F.countDistinct(F.when(F.col("_v").isNotNull(),
                                        F.col("_n")))
                 .cast("long").alias("n_claimed"),
                 F.countDistinct("_v").cast("long").alias("n_values"))
            .withColumn("has_conflict", F.col("n_values") > 1))


def canon_conflicts_oracle_sql(labels_sql: str, claims_sql: str) -> str:
    """DuckDB twin of :func:`canon_conflicts`. ``labels_sql`` yields
    (node, comp); ``claims_sql`` yields (node, v)."""
    return f"""
with lab as materialized ({labels_sql}),
cl as materialized ({claims_sql})
select lab.comp,
       cast(count(distinct lab.node) as bigint) as n_nodes,
       cast(count(distinct case when cl.v is not null then lab.node end)
            as bigint) as n_claimed,
       cast(count(distinct cl.v) as bigint) as n_values,
       count(distinct cl.v) > 1 as has_conflict
from lab left join cl on cl.node = lab.node
group by lab.comp
"""
