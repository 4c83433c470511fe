"""RDFS (ρdf) entailment materialization over quad DataFrames.

The reference emits plain RDF and leaves inference to a downstream
triple store; here the minimal-RDFS closure (the ρdf fragment:
``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` / ``rdfs:domain`` /
``rdfs:range`` + ``rdf:type``) materializes as a DataFrame transform,
so BGP queries over the closure see entailed triples without a store.

One-pass completeness: for ρdf, applying the rules in the order
subPropertyOf* → domain/range → subClassOf* derives every entailed
instance triple without a fixed-point loop (Muñoz, Pérez & Gutierrez,
"Simple and Efficient Minimal RDFS", 2009). This implementation goes
further and folds the whole cascade into per-predicate rule SETS
computed on the vocabulary-sized schema:

  ``P(p)``   = {p} ∪ spo*(p)                      (superproperties)
  ``DOMC(p)``= sco*( ∪_{q ∈ P(p)} domain(q) )     (entailed s-types)
  ``RNGC(p)``= sco*( ∪_{q ∈ P(p)} range(q) )      (entailed o-types)
  ``CLS(c)`` = {c} ∪ sco*(c)                      (superclasses)

so the CORPUS is touched exactly once: one broadcast join on ``p``
(rule arrays), one broadcast join on ``o_lex`` for type triples
(class closure), one explode, one global dedup shuffle. The schema
side (every triple whose predicate is a ρdf keyword) is gathered in
one filtered scan and folded driver-side — vocabulary-sized by nature,
with a loud ``schema_limit`` guard for data mislabeled as schema.

Scope notes, deliberate:

- Entailed triples inherit the ``g`` of the triggering instance triple
  (quad-level closure: the same logical triple entailed in two graphs
  stays two rows — nanopub provenance survives inference).
- Entailed SCHEMA triples (``A sco C`` from ``A sco B, B sco C``) are
  NOT emitted: they have no single source graph, and instance-level
  completeness never needs them (the closures above already use
  sco*/spo*). The asserted schema rows pass through unchanged.
- ``rdf:type`` reached *via subPropertyOf* (some p declared
  ``spo rdf:type``) is handled: such derived type triples still get
  their sco* superclasses (the ``entails_type`` flag below).
- Literal-object triples never produce range typings (guarded on
  ``o_kind = 'iri'``), matching RDFS semantics on the fragment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import QUAD_COLS
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS_NS + "subClassOf"
RDFS_SUBPROP = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"


def _closure_pairs(pairs: set) -> set:
    """Transitive closure of a pair set (driver-side; schema-sized)."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    out = set()
    for a in adj:
        seen: set = set()
        stack = list(adj[a])
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(adj.get(v, ()))
        out.update((a, v) for v in seen if v != a)
    return out


def rdfs_closure(
    quads: DataFrame,
    schema_limit: int = 1_000_000,
) -> DataFrame:
    """Return ``quads`` ∪ every ρdf-entailed instance quad (deduped on
    the full quad).

    The schema (every triple whose predicate is a ρdf keyword) is
    gathered in ONE filtered pass over the corpus and folded into the
    rule tables driver-side — an RDFS schema is vocabulary-sized by
    nature (the largest published ontologies are ~10⁶ axioms, the
    default ``schema_limit``), and folding 4 closures + 3 rule maps in
    Python replaces ~10 scheduled jobs of tiny shuffles with one
    collect. A corpus whose "schema" exceeds the limit fails loudly
    (that is data mislabeled as schema, and broadcasting it would be
    wrong anyway)."""
    base = quads.select(*QUAD_COLS)

    # --- ONE schema scan, folded driver-side --------------------------
    kw = [RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE]
    sch_rows = (quads.where(F.col("p").isin(kw)
                            & (F.col("o_kind") == "iri"))
                .select("p", "s", "o_lex").dropDuplicates()
                .limit(schema_limit + 1).collect())
    if len(sch_rows) > schema_limit:
        raise ValueError(
            f"rdfs_closure: more than {schema_limit} schema triples — "
            "not a vocabulary; raise schema_limit only if this is a "
            "genuine (enormous) ontology")
    by_pred: dict = {k: set() for k in kw}
    for r in sch_rows:
        by_pred[r["p"]].add((r["s"], r["o_lex"]))
    sco = _closure_pairs(by_pred[RDFS_SUBCLASS])
    spo = _closure_pairs(by_pred[RDFS_SUBPROP])
    dom, rng = by_pred[RDFS_DOMAIN], by_pred[RDFS_RANGE]

    sup_p: dict = {}
    for a, b in spo:
        sup_p.setdefault(a, set()).add(b)
    cls_sup: dict = {}
    for a, b in sco:
        cls_sup.setdefault(a, set()).add(b)

    def _type_sets(sch: set) -> dict:
        """predicate -> sco*-closed classes via any superproperty."""
        direct: dict = {}
        for q, c in sch:
            direct.setdefault(q, set()).add(c)
        out: dict = {}
        for p in set(sup_p) | set(direct):
            cs = set()
            for q in {p} | sup_p.get(p, set()):
                cs |= direct.get(q, set())
            cs |= {u for c in cs for u in cls_sup.get(c, ())}
            if cs:
                out[p] = cs
        return out

    dom_c, rng_c = _type_sets(dom), _type_sets(rng)
    preds = sorted(set(sup_p) | set(dom_c) | set(rng_c))
    spark = quads.sparkSession
    rules = spark.createDataFrame(
        [(p, sorted(sup_p.get(p, ())), sorted(dom_c.get(p, ())),
          sorted(rng_c.get(p, ())), RDF_TYPE in sup_p.get(p, ()))
         for p in preds],
        "_rp string, super_props array<string>, "
        "dom_classes array<string>, rng_classes array<string>, "
        "entails_type boolean")
    cls_up = spark.createDataFrame(
        [(c, sorted(ups)) for c, ups in sorted(cls_sup.items())],
        "src string, sup_classes array<string>")

    # --- the single corpus pass ---------------------------------------
    empty = F.array().cast("array<string>")
    j = (base
         .join(F.broadcast(rules), base["p"] == rules["_rp"], "left")
         .withColumn("_sp", F.coalesce("super_props", empty))
         .withColumn("_dc", F.coalesce("dom_classes", empty))
         .withColumn("_rc", F.when(F.col("o_kind") == "iri",
                                   F.coalesce("rng_classes", empty))
                     .otherwise(empty))
         .drop("_rp", "super_props", "dom_classes", "rng_classes"))
    is_type = (F.col("p") == RDF_TYPE) | F.coalesce(
        F.col("entails_type"), F.lit(False))
    j = (j.withColumn("_is_type", is_type & (F.col("o_kind") == "iri"))
         .drop("entails_type")
         .join(F.broadcast(cls_up),
               F.col("_is_type") & (F.col("o_lex") == cls_up["src"]),
               "left")
         .withColumn("_cc", F.coalesce("sup_classes", empty))
         .drop("src", "sup_classes", "_is_type"))

    t = F.struct(*[F.col(c) for c in QUAD_COLS])
    null_s = F.lit(None).cast("string")
    derived = F.concat(
        F.array(t),
        F.transform("_sp", lambda q: F.struct(
            F.col("g"), F.col("s"), q.alias("p"), F.col("o_kind"),
            F.col("o_lex"), F.col("o_dt"), F.col("o_lang"))),
        F.transform("_dc", lambda c: F.struct(
            F.col("g"), F.col("s"), F.lit(RDF_TYPE).alias("p"),
            F.lit("iri").alias("o_kind"), c.alias("o_lex"),
            null_s.alias("o_dt"), null_s.alias("o_lang"))),
        F.transform("_rc", lambda c: F.struct(
            F.col("g"), F.col("o_lex").alias("s"),
            F.lit(RDF_TYPE).alias("p"), F.lit("iri").alias("o_kind"),
            c.alias("o_lex"), null_s.alias("o_dt"),
            null_s.alias("o_lang"))),
        F.transform("_cc", lambda c: F.struct(
            F.col("g"), F.col("s"), F.lit(RDF_TYPE).alias("p"),
            F.lit("iri").alias("o_kind"), c.alias("o_lex"),
            null_s.alias("o_dt"), null_s.alias("o_lang"))),
    )
    return (j.select(F.explode(derived).alias("q"))
            .select(*[F.col(f"q.{c}").alias(c) for c in QUAD_COLS])
            .dropDuplicates())


def rdfs_closure_py(quads):
    """Pure-Python twin of :func:`rdfs_closure` (fixed-point — the
    semantics, not the plan). ``quads`` = iterable of 7-tuples in
    QUAD_COLS order; returns the closure as a set of 7-tuples."""
    qs = set(tuple(q) for q in quads)

    def closure(pairs):
        out = set(pairs)
        while True:
            new = {(a, d) for (a, b) in out for (c, d) in out
                   if b == c and a != d} - out
            if not new:
                return out
            out |= new

    sco = closure({(s, o) for (_, s, p, k, o, _, _) in qs
                   if p == RDFS_SUBCLASS and k == "iri"})
    spo = closure({(s, o) for (_, s, p, k, o, _, _) in qs
                   if p == RDFS_SUBPROP and k == "iri"})
    dom = {(s, o) for (_, s, p, k, o, _, _) in qs
           if p == RDFS_DOMAIN and k == "iri"}
    rng = {(s, o) for (_, s, p, k, o, _, _) in qs
           if p == RDFS_RANGE and k == "iri"}

    while True:
        new = set()
        for (g, s, p, k, o, dt, lg) in qs:
            for (a, b) in spo:
                if a == p:
                    new.add((g, s, b, k, o, dt, lg))
            for (a, c) in dom:
                if a == p:
                    new.add((g, s, RDF_TYPE, "iri", c, None, None))
            if k == "iri":
                for (a, c) in rng:
                    if a == p:
                        new.add((g, o, RDF_TYPE, "iri", c, None, None))
                if p == RDF_TYPE:
                    for (a, b) in sco:
                        if a == o:
                            new.add((g, s, RDF_TYPE, "iri", b, None, None))
        new -= qs
        if not new:
            return qs
        qs |= new


OWL_NS = "http://www.w3.org/2002/07/owl#"
OWL_SYMMETRIC = OWL_NS + "SymmetricProperty"
OWL_TRANSITIVE = OWL_NS + "TransitiveProperty"
OWL_INVERSE_OF = OWL_NS + "inverseOf"


def owl_property_closure(
    quads: DataFrame,
    schema_limit: int = 100_000,
    max_iter: int = 20,
    local_threshold: int = 2_000,
) -> DataFrame:
    """Return ``quads`` ∪ the OWL property-semantics entailments:

    - ``P rdf:type owl:SymmetricProperty`` → (s P o) ⊢ (o P s)
    - ``P owl:inverseOf Q``               → (s P o) ⊢ (o Q s), both ways
    - ``P rdf:type owl:TransitiveProperty`` → the p-edge closure

    Complete fixpoint without iterating the corpus: the swap rules
    (symmetric/inverse) apply in ONE explode pass, and transitive
    closure runs per declared-transitive property on the ALREADY
    swapped edge set — closure of a symmetric relation is symmetric,
    and the inverse of a closed relation is the swap of the closure,
    so re-applying the swap rules to the closure rows (one more map)
    finishes the fixpoint. Deeper interactions through
    ``rdfs:subPropertyOf`` are rdfs_closure's job — compose by running
    :func:`rdfs_closure` first (documented scope cut, same fragment
    discipline as ρdf).

    Provenance (quad-level, rdfs_closure's contract extended):
    single-trigger entailments (swaps) inherit the triggering quad's
    ``g``; multi-edge entailments (closure pairs not asserted under
    the same predicate) get ``g = NULL`` — they have no single source
    graph. Closure rows that merely restate an existing (s,p,o) pair
    are anti-joined away rather than duplicated per graph.

    Scale shape: one vocabulary-sized schema scan folded driver-side
    (loud ``schema_limit``); one broadcast join + explode over the
    corpus; per transitive property one :func:`canon.transitive_pairs`
    run over that property's edges only (hierarchy-shaped by
    assumption — the closure contract of transitive_pairs applies).
    Literal objects never swap or close (a literal cannot be a
    subject), matching OWL semantics on the fragment.

    Documented deviation: reflexive self-pairs entailed by a property
    that is both symmetric and transitive (``a P a`` via a-b-a) are
    NOT emitted — transitive_pairs never produces them, matching the
    engine's ``p+`` property-path semantics.
    """
    from ..operators.canon import transitive_pairs

    base = quads.select(*QUAD_COLS)

    sch_rows = (quads.where(
        ((F.col("p") == RDF_TYPE)
         & F.col("o_lex").isin([OWL_SYMMETRIC, OWL_TRANSITIVE]))
        | (F.col("p") == OWL_INVERSE_OF))
        .where(F.col("o_kind") == "iri")
        .select("p", "s", "o_lex").dropDuplicates()
        .limit(schema_limit + 1).collect())
    if len(sch_rows) > schema_limit:
        raise ValueError(
            f"owl_property_closure: more than {schema_limit} schema "
            "triples — not a vocabulary; raise schema_limit only for a "
            "genuine (enormous) ontology")
    symmetric, transitive = set(), set()
    inverses: dict = {}
    for r in sch_rows:
        if r["p"] == OWL_INVERSE_OF:
            inverses.setdefault(r["s"], set()).add(r["o_lex"])
            inverses.setdefault(r["o_lex"], set()).add(r["s"])
        elif r["o_lex"] == OWL_SYMMETRIC:
            symmetric.add(r["s"])
        else:
            transitive.add(r["s"])

    preds = sorted(symmetric | set(inverses))
    spark = quads.sparkSession
    if preds:
        rules = spark.createDataFrame(
            [(p, p in symmetric, sorted(inverses.get(p, ())))
             for p in preds],
            "_rp string, is_sym boolean, inv_props array<string>")
    else:
        rules = spark.createDataFrame(
            [], "_rp string, is_sym boolean, inv_props array<string>")

    def expand(df: DataFrame) -> DataFrame:
        """One pass: rows ∪ symmetric swaps ∪ inverse swaps."""
        empty = F.array().cast("array<string>")
        j = (df.join(F.broadcast(rules), df["p"] == rules["_rp"], "left")
             .withColumn("_swappable",
                         F.coalesce("is_sym", F.lit(False))
                         & (F.col("o_kind") == "iri"))
             .withColumn("_inv", F.when(F.col("o_kind") == "iri",
                                        F.coalesce("inv_props", empty))
                         .otherwise(empty))
             .drop("_rp", "is_sym", "inv_props"))
        t = F.struct(*[F.col(c) for c in QUAD_COLS])
        sym_swap = F.when(F.col("_swappable"), F.array(F.struct(
            F.col("g"), F.col("o_lex").alias("s"), F.col("p"),
            F.lit("iri").alias("o_kind"), F.col("s").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("o_lang")))) \
            .otherwise(F.array().cast(
                "array<struct<g:string,s:string,p:string,o_kind:string,"
                "o_lex:string,o_dt:string,o_lang:string>>"))
        inv_swap = F.transform("_inv", lambda q: F.struct(
            F.col("g"), F.col("o_lex").alias("s"), q.alias("p"),
            F.lit("iri").alias("o_kind"), F.col("s").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("o_lang")))
        return (j.select(F.explode(F.concat(F.array(t), sym_swap,
                                            inv_swap)).alias("q"))
                .select(*[F.col(f"q.{c}").alias(c) for c in QUAD_COLS])
                .dropDuplicates())

    e1 = expand(base)
    if not transitive:
        return e1

    extras = []
    for p in sorted(transitive):
        pe = (e1.where((F.col("p") == p) & (F.col("o_kind") == "iri"))
              .select(F.col("s").alias("src"), F.col("o_lex").alias("dst")))
        closed = transitive_pairs(pe, max_iter=max_iter,
                                  local_threshold=local_threshold)
        new_pairs = closed.join(pe.dropDuplicates(), ["src", "dst"],
                                "left_anti")
        extras.append(new_pairs.select(
            F.lit(None).cast("string").alias("g"),
            F.col("src").alias("s"), F.lit(p).alias("p"),
            F.lit("iri").alias("o_kind"), F.col("dst").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("o_lang")))
    new_rows = extras[0]
    for x in extras[1:]:
        new_rows = new_rows.unionByName(x)
    # swap rules re-applied to the NEW closure rows only (one more
    # bounded pass) — finishes the symmetric/inverse interaction
    return e1.unionByName(expand(new_rows)).dropDuplicates()


RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"


def rdf_list_members(quads: DataFrame, max_len: int = 512) -> DataFrame:
    """Unroll every ``rdf:List`` in the graph to ``(head, pos, member,
    member_kind)`` rows — ordered collections are THE place RDF hides
    sequence data (the reference itself stores each table's column
    order as an rdf:List, csvw.py:308; SPARQL has no list accessor
    short of brittle ``rdf:rest*/rdf:first`` property paths that lose
    the position).

    A list head is a cons node (bearing ``rdf:first`` or ``rdf:rest``)
    that is not the object of any ``rdf:rest`` triple — interior nodes
    hang off some head; ``pos`` is the cons node's distance from its
    head along ``rdf:rest``. Member kind/lexical form come from the
    cons node's ``rdf:first`` object unchanged (IRI or literal).

    Distance-aware path doubling: ``rdf:rest`` is functional (a cons
    cell has ONE tail), so every (ancestor, descendant) pair has a
    unique path and the doubled join ``r ⋈ r`` produces each pair
    exactly once with the exact distance — ⌈log2 max_len⌉ rounds close
    chains up to ``max_len``; the reach table is Σ L² per list, fine
    for the schema/metadata lists this exists for and loudly bounded
    by ``max_len``. Malformed data fails loudly, never truncates: a
    cons node with two ``rdf:rest`` tails (ambiguous order) and a
    chain still growing after closure (cycle or > max_len) both raise.
    """
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    rest = (quads.where((F.col("p") == RDF_REST)
                        & (F.col("o_kind") == "iri"))
            .select(F.col("s").alias("n"), F.col("o_lex").alias("nxt"))
            .dropDuplicates())
    multi = (rest.groupBy("n").agg(F.count("*").alias("c"))
             .where(F.col("c") > 1).limit(1).collect())
    if multi:
        raise ValueError(
            f"rdf_list_members: cons node {multi[0]['n']!r} has "
            f"{multi[0]['c']} rdf:rest tails — ambiguous list order")
    first = (quads.where(F.col("p") == RDF_FIRST)
             .select(F.col("s").alias("n"),
                     F.col("o_lex").alias("member"),
                     F.col("o_kind").alias("member_kind"))
             .dropDuplicates())
    multi_f = (first.groupBy("n").agg(F.count("*").alias("c"))
               .where(F.col("c") > 1).limit(1).collect())
    if multi_f:
        raise ValueError(
            f"rdf_list_members: cons node {multi_f[0]['n']!r} has "
            f"{multi_f[0]['c']} distinct rdf:first values")
    cons = (rest.select("n").union(first.select("n")).distinct())
    heads = cons.join(
        rest.where(F.col("nxt") != RDF_NIL)
        .select(F.col("nxt").alias("n")).distinct(),
        "n", "left_anti").select(F.col("n").alias("head"))

    # reach(a, b, d): b is a's d-step rdf:rest descendant (cons cells
    # only — nil never enters: it bears no rdf:first and edges INTO it
    # are dropped from the hop relation)
    hop = (rest.where(F.col("nxt") != RDF_NIL)
           .select(F.col("n").alias("a"), F.col("nxt").alias("b"),
                   F.lit(1).cast("int").alias("d")))
    reach = hop
    rounds = max(1, (max_len - 1).bit_length())
    for _ in range(rounds):
        doubled = (reach.alias("x")
                   .join(reach.alias("y"), F.col("x.b") == F.col("y.a"))
                   .select(F.col("x.a").alias("a"),
                           F.col("y.b").alias("b"),
                           (F.col("x.d") + F.col("y.d")).alias("d")))
        grown = reach.unionByName(doubled).dropDuplicates(["a", "b"])
        reach = grown.localCheckpoint(eager=True)
    bad = (reach.where((F.col("d") >= max_len)
                       | (F.col("a") == F.col("b")))
           .limit(1).collect())
    if bad:
        raise ValueError(
            "rdf_list_members: rdf:rest cycle or chain length >= "
            f"max_len ({max_len}) at {bad[0]['a']!r}; raise max_len "
            "if the data is genuinely that long")
    pos0 = heads.select(F.col("head"), F.col("head").alias("n"),
                        F.lit(0).cast("int").alias("pos"))
    posn = heads.join(reach, heads["head"] == reach["a"]) \
        .select("head", F.col("b").alias("n"), F.col("d").alias("pos"))
    return (pos0.unionByName(posn)
            .join(first, "n")
            .select("head", "pos", "member", "member_kind"))


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_CONTAINER_TYPES = (_RDF_NS + "Seq", _RDF_NS + "Bag", _RDF_NS + "Alt")


def rdf_container_members(quads: DataFrame) -> DataFrame:
    """Unroll every RDF container (``rdf:Seq``/``rdf:Bag``/``rdf:Alt``)
    to ``(container, ctype, pos, member, member_kind)`` rows — the
    OTHER way RDF encodes collections (:func:`rdf_list_members` covers
    the cons-cell encoding): membership is a flat fan of positional
    predicates ``rdf:_1, rdf:_2, …``, so unlike lists there is no
    chain to close — this is a MAP-ONLY pass (one predicate-prefix
    filter + integer extract) plus one small left join for the
    container's declared type (NULL when untyped; Bag semantics make
    ``pos`` meaningless there but the arc still carries it).

    The graph is reported as-is: duplicate positions (two ``rdf:_1``
    arcs — legal if pathological RDF) yield one row per distinct
    (container, pos, member, kind) fact rather than raising — a
    container is a fan, not a chain, so there is no ambiguity to
    protect against, only multiplicity. Positions longer than 18
    digits are dropped (they exceed int64; no real vocabulary mints
    them) — filtered BEFORE the cast so ANSI mode cannot abort.
    """
    pos_pat = r"^http://www\.w3\.org/1999/02/22-rdf-syntax-ns#_([0-9]+)$"
    digits = F.regexp_extract(F.col("p"), pos_pat, 1)
    arcs = (quads
            .where(F.col("p").startswith(_RDF_NS + "_"))
            .select(F.col("s").alias("container"),
                    digits.alias("_d"),
                    F.col("o_lex").alias("member"),
                    F.col("o_kind").alias("member_kind"))
            .where((F.length("_d") > 0) & (F.length("_d") <= 18))
            # try_cast, not cast: a CONSTANT predicate in a union branch
            # (e.g. a lit rdf:type arc) constant-folds the extract to ''
            # at OPTIMIZATION time, before the filter can reject it —
            # ANSI cast would abort the whole job from the driver
            .select("container",
                    F.col("_d").try_cast("long").alias("pos"),
                    "member", "member_kind")
            .where(F.col("pos").isNotNull())
            .dropDuplicates())
    types = (quads
             .where((F.col("p") == RDF_TYPE)
                    & (F.col("o_kind") == "iri")
                    & F.col("o_lex").isin(list(_CONTAINER_TYPES)))
             .select(F.col("s").alias("container"),
                     F.col("o_lex").alias("ctype"))
             .dropDuplicates())
    return (arcs.join(types, "container", "left")
            .select("container", "ctype", "pos", "member", "member_kind"))


_REIF_ROLES = (_RDF_NS + "subject", _RDF_NS + "predicate",
               _RDF_NS + "object")
_STATEMENT = _RDF_NS + "Statement"


def rdf_reified_statements(quads: DataFrame) -> DataFrame:
    """Unroll RDF reification — the THIRD collection/annotation encoding
    next to :func:`rdf_list_members` (cons chains) and
    :func:`rdf_container_members` (positional fans): a statement node
    carries ``rdf:subject`` / ``rdf:predicate`` / ``rdf:object`` arcs
    describing a triple ABOUT which other triples (provenance, belief,
    temporal scope) are asserted. The reference's nanopub model is the
    graph-scoped answer to the same need (csvw.py assertion/provenance
    graphs); legacy vocabularies (PROV-O qualified forms, Wikidata
    statement nodes, pre-RDF-star annotation) still ship reification,
    so a KG-construction engine must be able to flatten it.

    Output: one row per complete reification —
    ``(stmt, s, s_kind, p, o_kind, o_lex, o_dt, o_lang, declared)``
    where ``declared`` marks an explicit ``rdf:type rdf:Statement``
    arc (reification is legal without it).  The graph is reported
    as-is, the container convention: a statement node with two
    ``rdf:subject`` arcs yields one row per distinct role combination
    (multiplicity is a fact to surface, not an error to hide), and a
    literal-valued ``rdf:subject``/``rdf:predicate`` — invalid RDF but
    representable — passes through with ``s_kind='lit'`` so the caller
    can quarantine rather than silently lose it. A literal-valued
    ``rdf:predicate`` names no property at all — the node counts as
    incomplete. Incomplete nodes (missing any of the three roles) do
    not emit: they describe no triple.

    Shape at scale: reification arcs are a predicate-filtered slice of
    the corpus (three constant ``isin`` predicates pushed to the scan,
    one pass), then two stmt-keyed joins between role tables each
    bounded by the slice — the corpus never re-shuffles, and the
    ``declared`` flag is one more left join on the same key. No
    iteration, no closure: reification is a flat 3-arc star.
    """
    roles = (quads
             .where(F.col("p").isin(*_REIF_ROLES, RDF_TYPE))
             .select("s", "p", "o_kind", "o_lex", "o_dt", "o_lang")
             .dropDuplicates())
    subj = (roles.where(F.col("p") == _REIF_ROLES[0])
            .select(F.col("s").alias("stmt"),
                    F.col("o_lex").alias("rs"),
                    F.col("o_kind").alias("rs_kind")))
    pred = (roles.where((F.col("p") == _REIF_ROLES[1])
                        & (F.col("o_kind") == "iri"))
            .select(F.col("s").alias("stmt"),
                    F.col("o_lex").alias("rp")))
    obj = (roles.where(F.col("p") == _REIF_ROLES[2])
           .select(F.col("s").alias("stmt"),
                   F.col("o_kind").alias("ro_kind"),
                   F.col("o_lex").alias("ro_lex"),
                   F.col("o_dt").alias("ro_dt"),
                   F.col("o_lang").alias("ro_lang")))
    decl = (roles.where((F.col("p") == RDF_TYPE)
                        & (F.col("o_kind") == "iri")
                        & (F.col("o_lex") == _STATEMENT))
            .select(F.col("s").alias("stmt"),
                    F.lit(True).alias("declared")))
    return (subj.join(pred, "stmt").join(obj, "stmt")
            .join(decl, "stmt", "left")
            .select(F.col("stmt"),
                    F.col("rs").alias("s"),
                    F.col("rs_kind").alias("s_kind"),
                    F.col("rp").alias("p"),
                    F.col("ro_kind").alias("o_kind"),
                    F.col("ro_lex").alias("o_lex"),
                    F.col("ro_dt").alias("o_dt"),
                    F.col("ro_lang").alias("o_lang"),
                    F.coalesce(F.col("declared"), F.lit(False))
                    .alias("declared")))


OWL_CHAIN = OWL_NS + "propertyChainAxiom"


def owl_chain_closure(
    quads: DataFrame,
    schema_limit: int = 100_000,
    max_iter: int = 10,
) -> DataFrame:
    """Return ``quads`` ∪ the ``owl:propertyChainAxiom`` entailments:
    for each axiom ``P owl:propertyChainAxiom (Q R)``,
    ``Q(x,y) ∧ R(y,z) ⊢ P(x,z)`` — hasParent∘hasBrother ⊆ hasUncle,
    locatedIn∘partOf ⊆ locatedIn, the composition rules that turn a
    flat extraction into a navigable graph. Chains may FEED each
    other (an entailed head edge can be another chain's leg), so the
    rule set runs to fixpoint with a loud ``max_iter`` guard.

    Scope contract (loud, not fine print): chains of length exactly 2
    and IRI members only — a longer axiom RAISES with the offending
    list named. N-ary chains factor into binary ones through named
    intermediate properties; silently truncating or part-applying a
    3-chain would entail wrong triples. List parsing rides
    :func:`rdf_list_members` (its malformed-list failures — double
    tails, cycles — propagate loudly).

    Provenance: entailed rows get ``g = NULL`` (two triggering edges,
    no single source graph — the :func:`owl_property_closure`
    convention) and entailments that restate an existing (s, p, o)
    are anti-joined away rather than duplicated.

    Scale shape: axioms + lists are schema-sized and collect under
    ``schema_limit``; the corpus never iterates — only edges whose
    predicate is a chain leg or head enter the loop (predicate filter
    pushed to the scan), each round is one broadcast(chains) join +
    one middle-node equi-join on that bounded edge set, fixpoint
    detected by an empty-delta count with per-round localCheckpoint
    lineage cuts.
    """
    base = quads.select(*QUAD_COLS)
    ax_rows = (quads.where((F.col("p") == OWL_CHAIN)
                           & (F.col("o_kind") == "iri"))
               .select("s", "o_lex").dropDuplicates()
               .limit(schema_limit + 1).collect())
    if len(ax_rows) > schema_limit:
        raise ValueError(
            f"owl_chain_closure: more than {schema_limit} chain "
            "axioms — not a vocabulary; raise schema_limit only for "
            "a genuine (enormous) ontology")
    if not ax_rows:
        return base
    list_heads = {r["o_lex"]: r["s"] for r in ax_rows}
    members = (rdf_list_members(quads)
               .where(F.col("head").isin(sorted(list_heads)))
               .collect())
    by_list: dict = {}
    for r in members:
        by_list.setdefault(r["head"], []).append(r)
    chains = []
    for lst, hp in sorted(list_heads.items()):
        rows = sorted(by_list.get(lst, []), key=lambda r: r["pos"])
        if len(rows) != 2 or any(r["member_kind"] != "iri"
                                 for r in rows):
            raise ValueError(
                f"owl_chain_closure: axiom for {hp!r} has a chain of "
                f"length {len(rows)} (list {lst!r}) — only binary IRI "
                "chains are supported; factor longer chains through "
                "named intermediate properties")
        chains.append((hp, rows[0]["member"], rows[1]["member"]))

    spark = quads.sparkSession
    cdf = spark.createDataFrame(
        chains, "hp string, q1 string, q2 string")
    relevant = sorted({p for c in chains for p in c})
    edges = (base.where((F.col("o_kind") == "iri")
                        & F.col("p").isin(relevant))
             .select("s", "p", F.col("o_lex").alias("o"))
             .dropDuplicates())
    cur = edges.localCheckpoint(eager=True)
    for i in range(max_iter + 1):
        a, b = cur.alias("a"), cur.alias("b")
        step = (a.join(F.broadcast(cdf), F.col("a.p") == F.col("q1"))
                .join(b, (F.col("a.o") == F.col("b.s"))
                      & (F.col("b.p") == F.col("q2")))
                .select(F.col("a.s").alias("s"),
                        F.col("hp").alias("p"),
                        F.col("b.o").alias("o"))
                .dropDuplicates())
        new = step.join(cur, ["s", "p", "o"], "left_anti")
        if new.isEmpty():
            break
        if i == max_iter:
            raise ValueError(
                f"owl_chain_closure: no fixpoint after {max_iter} "
                "rounds — pathological chain feeding; raise max_iter "
                "if the ontology genuinely composes that deep")
        cur = cur.unionByName(new).localCheckpoint(eager=True)
    asserted = (base.where(F.col("o_kind") == "iri")
                .select("s", "p", F.col("o_lex").alias("o"))
                .dropDuplicates())
    derived = cur.join(asserted, ["s", "p", "o"], "left_anti")
    return base.unionByName(derived.select(
        F.lit(None).cast("string").alias("g"), "s", "p",
        F.lit("iri").alias("o_kind"), F.col("o").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang")))


def owl_chain_oracle_sql(quads_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`owl_chain_closure` for well-formed
    binary chains; ``quads_sql`` yields QUAD_COLS. The fixpoint
    unrolls to ``rounds`` chained materialized CTEs (a converged
    round is a no-op, so any rounds ≥ the fixture's convergence depth
    replays exactly)."""
    parts = [
        f"q as materialized ({quads_sql})",
        f"ax as (select distinct s as hp, o_lex as lst from q"
        f" where p = '{OWL_CHAIN}' and o_kind = 'iri')",
        f"chains as materialized (select ax.hp, f1.o_lex as q1,"
        f" f2.o_lex as q2"
        f" from ax"
        f" join q f1 on f1.s = ax.lst and f1.p = '{RDF_FIRST}'"
        f" join q r1 on r1.s = ax.lst and r1.p = '{RDF_REST}'"
        f" join q f2 on f2.s = r1.o_lex and f2.p = '{RDF_FIRST}')",
        "e0 as materialized (select distinct s, p, o_lex as o from q"
        " where o_kind = 'iri' and p in"
        " (select q1 from chains union select q2 from chains"
        " union select hp from chains))",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"e{k} as materialized (select s, p, o from e{k - 1}"
            f" union"
            f" select a.s, c.hp as p, b.o as o"
            f" from e{k - 1} a join chains c on a.p = c.q1"
            f" join e{k - 1} b on b.s = a.o and b.p = c.q2)")
    body = ",\n".join(parts)
    return f"""with {body}
select g, s, p, o_kind, o_lex, o_dt, o_lang from q
union all
select null, d.s, d.p, 'iri', d.o, null, null
from (select s, p, o from e{rounds}
      except
      select s, p, o_lex from q where o_kind = 'iri') d
"""
