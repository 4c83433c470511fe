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
side (every triple whose predicate is a ρdf keyword) is closed with
``canon.transitive_pairs`` path doubling — vocabulary-sized by nature.

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
from ..operators.canon import transitive_pairs

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_SUBCLASS = RDFS_NS + "subClassOf"
RDFS_SUBPROP = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"


def _schema_edges(quads: DataFrame, pred: str) -> DataFrame:
    return (quads.where((F.col("p") == pred) & (F.col("o_kind") == "iri"))
            .select(F.col("s").alias("src"), F.col("o_lex").alias("dst"))
            .dropDuplicates())


def rdfs_closure(
    quads: DataFrame,
    max_depth: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Return ``quads`` ∪ every ρdf-entailed instance quad (deduped on
    the full quad). ``max_depth`` bounds the schema hierarchies' path
    doubling (2^20 deep is beyond any real taxonomy; non-convergence
    fails loudly inside :func:`transitive_pairs`'s contract)."""
    base = quads.select(*QUAD_COLS)

    # --- vocabulary-sized schema closure ------------------------------
    sco = transitive_pairs(_schema_edges(quads, RDFS_SUBCLASS),
                           max_iter=max_depth,
                           checkpoint_dir=checkpoint_dir)
    spo = transitive_pairs(_schema_edges(quads, RDFS_SUBPROP),
                           max_iter=max_depth,
                           checkpoint_dir=checkpoint_dir)
    dom = _schema_edges(quads, RDFS_DOMAIN)
    rng = _schema_edges(quads, RDFS_RANGE)

    # CLS(c) as a lookup table (closure WITHOUT the reflexive row — the
    # asserted triple itself always passes through via the explode)
    cls_up = sco.groupBy("src").agg(
        F.collect_set("dst").alias("sup_classes"))

    # P(p) \ {p} per predicate, plus the reflexive hop for rule folding
    spo_refl = spo.unionByName(
        spo.select("src", "dst")
        .select(F.explode(F.array("src", "dst")).alias("src"))
        .select("src", F.col("src").alias("dst"))
    ).unionByName(
        dom.select("src").union(rng.select("src"))
        .select("src", F.col("src").alias("dst"))
    ).dropDuplicates()

    # DOMC / RNGC: superproperty-folded, then sco*-closed
    def _typed(sch: DataFrame) -> DataFrame:
        eff = (spo_refl.join(
            sch.select(F.col("src").alias("dst"),
                       F.col("dst").alias("cls")), "dst")
            .select("src", "cls"))
        up = (eff.join(sco.withColumnRenamed("src", "cls")
                       .withColumnRenamed("dst", "sup"), "cls")
              .select("src", F.col("sup").alias("cls")))
        return eff.unionByName(up).dropDuplicates()

    dom_c = _typed(dom).groupBy("src").agg(
        F.collect_set("cls").alias("dom_classes"))
    rng_c = _typed(rng).groupBy("src").agg(
        F.collect_set("cls").alias("rng_classes"))
    super_p = (spo.groupBy("src").agg(
        F.collect_set("dst").alias("super_props"))
        .withColumn("entails_type",
                    F.array_contains("super_props", RDF_TYPE)))

    rules = (super_p
             .join(dom_c, "src", "outer")
             .join(rng_c, "src", "outer")
             .withColumnRenamed("src", "_rp"))

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
