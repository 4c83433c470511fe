"""ρdf entailment materialization: one-pass Spark closure vs the
fixed-point Python twin, idempotence, graph provenance, and the
scale-shape gate (rule tables broadcast, corpus JVM-only)."""

from cow_spark.model import QUAD_SCHEMA
from cow_spark.plans.entail import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_closure,
    rdfs_closure_py,
)

G = "g:default"

_FULL = [
    # schema: 3-deep class chain, 2-deep property chain, dom+rng,
    # a second hierarchy for the range class, and the pathological
    # "subPropertyOf rdf:type" property
    (G, "c:Doc", RDFS_SUBCLASS, "iri", "c:Res", None, None),
    (G, "c:Res", RDFS_SUBCLASS, "iri", "c:Thing", None, None),
    (G, "c:Src", RDFS_SUBCLASS, "iri", "c:Prov", None, None),
    (G, "p:hasSrc", RDFS_SUBPROP, "iri", "p:rel", None, None),
    (G, "p:rel", RDFS_SUBPROP, "iri", "p:linked", None, None),
    (G, "p:hasSrc", RDFS_DOMAIN, "iri", "c:Doc", None, None),
    (G, "p:hasSrc", RDFS_RANGE, "iri", "c:Src", None, None),
    (G, "p:title", RDFS_DOMAIN, "iri", "c:Doc", None, None),
    (G, "p:isa", RDFS_SUBPROP, "iri", RDF_TYPE, None, None),
    # instance: IRI object, literal object, asserted type (dedups with
    # the domain-derived one), type-via-subPropertyOf, a second graph,
    # and a rule-less row that must pass through untouched
    (G, "d:1", "p:hasSrc", "iri", "s:web", None, None),
    (G, "d:1", "p:title", "lit", "hello", None, None),
    (G, "d:2", RDF_TYPE, "iri", "c:Doc", None, None),
    (G, "d:3", "p:isa", "iri", "c:Src", None, None),
    ("g:other", "d:1", "p:hasSrc", "iri", "s:ftp", None, None),
    (G, "d:4", "p:other", "lit", "x", None, None),
]


def _spark_closure(spark, quads):
    df = spark.createDataFrame(quads, QUAD_SCHEMA)
    return {tuple(r) for r in rdfs_closure(df).collect()}


def test_closure_matches_fixed_point_twin(spark):
    got = _spark_closure(spark, _FULL)
    want = rdfs_closure_py(_FULL)
    assert got == want
    # spot-check each rule family fired
    assert (G, "d:1", "p:linked", "iri", "s:web", None, None) in got
    assert (G, "d:1", RDF_TYPE, "iri", "c:Thing", None, None) in got
    assert (G, "s:web", RDF_TYPE, "iri", "c:Prov", None, None) in got
    assert (G, "d:3", RDF_TYPE, "iri", "c:Prov", None, None) in got
    # entailed quads inherit the triggering instance triple's graph
    assert ("g:other", "s:ftp", RDF_TYPE, "iri", "c:Src", None, None) in got
    assert (G, "s:ftp", RDF_TYPE, "iri", "c:Src", None, None) not in got


def test_closure_deep_hierarchy_and_idempotence(spark):
    chain = [(G, f"c:{i}", RDFS_SUBCLASS, "iri", f"c:{i + 1}", None, None)
             for i in range(9)]
    inst = [(G, "x", RDF_TYPE, "iri", "c:0", None, None)]
    got = _spark_closure(spark, chain + inst)
    assert got == rdfs_closure_py(chain + inst)
    assert (G, "x", RDF_TYPE, "iri", "c:9", None, None) in got
    # closure of the closure adds nothing
    again = _spark_closure(spark, sorted(got, key=str))
    assert again == got


def test_closure_without_schema_is_passthrough(spark):
    quads = [(G, "d:1", "p:x", "lit", "v", None, None),
             (G, "d:2", RDF_TYPE, "iri", "c:C", None, None)]
    assert _spark_closure(spark, quads) == set(quads)


def test_closure_literal_objects_never_range_typed(spark):
    quads = [(G, "p:x", RDFS_RANGE, "iri", "c:C", None, None),
             (G, "d:1", "p:x", "lit", "not-an-iri", None, None)]
    got = _spark_closure(spark, quads)
    assert got == rdfs_closure_py(quads)
    assert not any(r[2] == RDF_TYPE and r[1] == "not-an-iri" for r in got)


def test_closure_plan_broadcasts_rules_no_python(spark):
    df = spark.createDataFrame(_FULL, QUAD_SCHEMA)
    plan = rdfs_closure(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the two corpus-side joins (rule arrays on p, class closure on
    # o_lex) must both broadcast; the vocabulary-sized schema-table
    # outer joins may legitimately sort-merge (both sides tiny)
    assert plan.count("BroadcastHashJoin") >= 2
    # downstream of the explode (printed ABOVE it) only the dedup
    # shuffle remains — no join of any kind touches the exploded corpus
    head = plan[:plan.index("Generate explode")]
    assert "Join" not in head


# ---------------------------------------------------------------------------
# SPARQL GRAPH scoping (bgp.py graph=) — lives here with the other
# KG-semantics additions of round 3
# ---------------------------------------------------------------------------


def test_match_bgp_graph_scoping(spark):
    from cow_spark.plans.bgp import match_bgp

    E = "https://example.com/"
    schema = ("g string, s string, p string, o_kind string, o_lex string, "
              "o_dt string, o_lang string")
    quads = spark.createDataFrame([
        (E + "g1", E + "a", E + "p", "lit", "x", None, None),
        (E + "g1", E + "a", E + "q", "lit", "y", None, None),
        (E + "g2", E + "a", E + "p", "lit", "x2", None, None),
        (E + "g2", E + "b", E + "p", "lit", "xb", None, None),
        (E + "g2", E + "b", E + "q", "lit", "yb", None, None),
    ], schema)
    # constant scope
    r1 = {(r["s"], r["v"]) for r in match_bgp(
        quads, [("?s", E + "p", "?v")], graph=E + "g1").collect()}
    assert r1 == {(E + "a", "x")}
    # variable scope: binds g and unifies it across patterns
    r2 = {(r["s"], r["v"], r["w"], r["gg"]) for r in match_bgp(
        quads, [("?s", E + "p", "?v"), ("?s", E + "q", "?w")],
        graph="?gg").collect()}
    assert r2 == {(E + "a", "x", "y", E + "g1"),
                  (E + "b", "xb", "yb", E + "g2")}
    # WITHOUT scoping the cross-graph conjunction also matches
    r3 = {(r["s"], r["v"], r["w"]) for r in match_bgp(
        quads, [("?s", E + "p", "?v"), ("?s", E + "q", "?w")]).collect()}
    assert (E + "a", "x2", "y") in r3
    # optional inherits the constant scope
    r4 = {(r["s"], r["v"], r["w"]) for r in match_bgp(
        quads, [("?s", E + "p", "?v")],
        optional=[("?s", E + "q", "?w")], graph=E + "g2").collect()}
    assert r4 == {(E + "a", "x2", None), (E + "b", "xb", "yb")}


def test_match_bgp_graph_validation(spark):
    import pytest as _pt

    from cow_spark.plans.bgp import match_bgp

    E = "https://example.com/"
    quads = spark.createDataFrame(
        [(E + "g1", E + "a", E + "p", "iri", E + "b", None, None)],
        "g string, s string, p string, o_kind string, o_lex string, "
        "o_dt string, o_lang string")
    with _pt.raises(ValueError, match="graph VARIABLE"):
        match_bgp(quads, [("?s", E + "p+", "?v")], graph="?g")
    with _pt.raises(ValueError, match="unnamed graph"):
        match_bgp(quads, [("?s", E + "p", "?v")], graph="?")
    # graph var repeated as a pattern var: per-pattern equality filter
    same = match_bgp(quads, [("?x", E + "p", "?v")], graph="?x")
    assert same.count() == 0  # g != s in the fixture


# ---------------------------------------------------------------------------
# SHACL-lite shape validation (plans/validate.py:shape_report)
# ---------------------------------------------------------------------------


def test_shape_report_all_constraint_kinds(spark):
    from cow_spark.plans.validate import _RDF_TYPE as T
    from cow_spark.plans.validate import shape_report

    X = "http://www.w3.org/2001/XMLSchema#integer"
    schema = ("g string, s string, p string, o_kind string, "
              "o_lex string, o_dt string, o_lang string")
    quads = spark.createDataFrame([
        (None, "d1", T, "iri", "c:Doc", None, None),
        (None, "d1", "p:src", "iri", "s:a", None, None),
        (None, "d1", "p:n", "lit", "5", X, None),
        (None, "d2", T, "iri", "c:Doc", None, None),
        (None, "d2", "p:src", "iri", "s:a", None, None),
        (None, "d2", "p:src", "iri", "s:b", None, None),
        (None, "d2", "p:n", "lit", "7", None, None),
        (None, "d3", T, "iri", "c:Doc", None, None),
        (None, "d3", "p:n", "lit", "x", "other", None),
        (None, "d4", T, "iri", "c:Other", None, None),  # not a focus
        (None, "d4", "p:n", "lit", "bad", None, None),
        (None, "d5", T, "iri", "c:Doc", None, None),
        (None, "d5", "p:src", "lit", "not-iri", None, None),
        (None, "d5", "p:n", "lit", "9", X, None),
    ], schema)
    shapes = [
        {"target_class": "c:Doc", "property": "p:src",
         "min_count": 1, "max_count": 1, "node_kind": "iri"},
        {"target_class": "c:Doc", "property": "p:n",
         "min_count": 1, "datatype": X},
    ]
    got = sorted(tuple(r) for r in shape_report(quads, shapes).collect())
    assert got == sorted([
        (0, "d2", "max_count", "2"),
        (0, "d3", "min_count", "0"),
        (0, "d5", "node_kind", "1"),
        (1, "d2", "datatype", "1"),
        (1, "d3", "datatype", "1"),
    ])
    # a conforming KG is an empty report
    ok = [q for q in quads.collect()
          if q["s"] == "d1"]
    clean = spark.createDataFrame(ok, schema)
    assert shape_report(clean, shapes).count() == 0


def test_shape_report_validation_and_plan(spark):
    import pytest as _pt

    from cow_spark.plans.validate import _RDF_TYPE as T
    from cow_spark.plans.validate import shape_report

    quads = spark.createDataFrame(
        [(None, "d", T, "iri", "c:C", None, None)],
        "g string, s string, p string, o_kind string, o_lex string, "
        "o_dt string, o_lang string")
    with _pt.raises(ValueError, match="empty shape"):
        shape_report(quads, [])
    with _pt.raises(ValueError, match="unknown keys"):
        shape_report(quads, [{"target_class": "c", "property": "p",
                              "min": 1}])
    with _pt.raises(ValueError, match="node_kind"):
        shape_report(quads, [{"target_class": "c", "property": "p",
                              "node_kind": "blank"}])
    out = shape_report(quads, [{"target_class": "c:C", "property": "p:x",
                                "min_count": 1}])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# OLAP cube profile + RDF property table (plans/stats.py)
# ---------------------------------------------------------------------------


def test_cube_profile_grouping_sets(spark):
    from pyspark.sql import functions as F

    from cow_spark.plans.stats import cube_profile

    docs = spark.createDataFrame(
        [("a", "en", 10), ("a", "de", 20), ("b", "en", 5),
         ("b", None, 7)],  # genuine NULL lang, not a subtotal
        "source string, lang string, n_chars int")
    got = {(r["source"], r["lang"], r["gid"]): (r["n_docs"], r["v_sum"])
           for r in cube_profile(docs).collect()}
    # detail rows (gid 0), per-source (gid 1), per-lang (gid 2), grand (3)
    assert got[("a", "en", 0)] == (1, 10)
    assert got[("b", None, 0)] == (1, 7)      # genuine NULL, gid 0
    assert got[("b", None, 1)] == (2, 12)     # source subtotal, gid 1
    assert got[(None, "en", 2)] == (2, 15)
    assert got[(None, None, 3)] == (4, 42)
    assert len(got) == 4 + 2 + 3 + 1


def test_property_table_pivot_semantics(spark):
    import pytest as _pt

    from cow_spark.plans.stats import property_table

    schema = ("g string, s string, p string, o_kind string, "
              "o_lex string, o_dt string, o_lang string")
    quads = spark.createDataFrame([
        (None, "d1", "p:a", "lit", "x", None, None),
        (None, "d1", "p:b", "lit", "y", None, None),
        (None, "d2", "p:a", "lit", "m", None, None),
        (None, "d2", "p:a", "lit", "k", None, None),  # multi-valued
        (None, "d2", "p:ignored", "lit", "z", None, None),
    ], schema)
    got = {r["s"]: (r["p0"], r["p1"]) for r in
           property_table(quads, ["p:a", "p:b"]).collect()}
    assert got == {"d1": ("x", "y"), "d2": ("k", None)}
    got_max = {r["s"]: r["p0"] for r in
               property_table(quads, ["p:a"], agg="max").collect()}
    assert got_max["d2"] == "m"
    with _pt.raises(ValueError):
        property_table(quads, [])
    with _pt.raises(ValueError):
        property_table(quads, ["p:a"], agg="first")
    plan = property_table(quads, ["p:a"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# OWL property closure (symmetric / inverseOf / transitive)
# ---------------------------------------------------------------------------

QS = ("g string, s string, p string, o_kind string, o_lex string, "
      "o_dt string, o_lang string")


def _owl_rows(*rows):
    return [(g, s, p, k, o, None, None) for (g, s, p, k, o) in rows]


def test_owl_symmetric_and_inverse_swaps_inherit_graph(spark):
    from cow_spark.plans.entail import (OWL_INVERSE_OF, OWL_SYMMETRIC,
                                        RDF_TYPE, owl_property_closure)

    quads = spark.createDataFrame(_owl_rows(
        ("gx", "knows", RDF_TYPE, "iri", OWL_SYMMETRIC),
        ("gx", "parentOf", OWL_INVERSE_OF, "iri", "childOf"),
        ("gx", "a", "knows", "iri", "b"),
        ("gx", "a", "knows", "lit", "not-a-node"),   # literal: no swap
        ("gx", "p1", "parentOf", "iri", "c1"),
        ("gy", "c2", "childOf", "iri", "p2"),        # inverse works both ways
    ), QS)
    out = {(r["g"], r["s"], r["p"], r["o_lex"])
           for r in owl_property_closure(quads).collect()}
    assert ("gx", "b", "knows", "a") in out
    assert ("not-a-node", "knows", "a") not in {t[1:] for t in out}
    assert ("gx", "c1", "childOf", "p1") in out
    assert ("gy", "p2", "parentOf", "c2") in out
    # literal row passes through unchanged
    assert ("gx", "a", "knows", "not-a-node") in out


def test_owl_transitive_closure_null_graph_and_no_restatement(spark):
    from cow_spark.plans.entail import (OWL_TRANSITIVE, RDF_TYPE,
                                        owl_property_closure)

    quads = spark.createDataFrame(_owl_rows(
        ("gx", "anc", RDF_TYPE, "iri", OWL_TRANSITIVE),
        ("gx", "a", "anc", "iri", "b"),
        ("gy", "b", "anc", "iri", "c"),
        ("gz", "a", "anc", "iri", "c"),   # already asserted: no NULL-g dup
        ("gx", "c", "anc", "iri", "d"),
    ), QS)
    rows = owl_property_closure(quads).collect()
    derived = {(r["g"], r["s"], r["o_lex"])
               for r in rows if r["p"] == "anc"}
    assert (None, "a", "d") in derived and (None, "b", "d") in derived
    # (a, c) exists only under its asserted graph — not re-derived
    assert (None, "a", "c") not in derived and ("gz", "a", "c") in derived


def test_owl_symmetric_transitive_interaction_and_guard(spark):
    import pytest as _pt

    from cow_spark.plans.entail import (OWL_SYMMETRIC, OWL_TRANSITIVE,
                                        OWL_INVERSE_OF, RDF_TYPE,
                                        owl_property_closure)

    quads = spark.createDataFrame(_owl_rows(
        ("g", "near", RDF_TYPE, "iri", OWL_SYMMETRIC),
        ("g", "near", RDF_TYPE, "iri", OWL_TRANSITIVE),
        ("g", "near", OWL_INVERSE_OF, "iri", "far"),
        ("g", "a", "near", "iri", "b"),
        ("g", "b", "near", "iri", "c"),
    ), QS)
    out = {(r["s"], r["p"], r["o_lex"])
           for r in owl_property_closure(quads).collect()}
    # closure over the symmetrized edges reaches every ordered pair of
    # DISTINCT nodes; self-pairs (a near a via a-b-a) are deliberately
    # NOT emitted — transitive_pairs' no-self-pair contract, matching
    # the p+ property-path semantics (documented deviation)
    for x in "abc":
        for y in "abc":
            if x == y:
                assert (x, "near", y) not in out, (x, y)
            else:
                assert (x, "near", y) in out, (x, y)
    # and the inverse property mirrors the entailed rows too
    assert ("c", "far", "a") in out and ("a", "far", "c") in out

    with _pt.raises(ValueError, match="schema"):
        owl_property_closure(quads, schema_limit=1)


def _lq(s, p, o, kind="iri"):
    return (None, s, p, kind, o, None, None)


_LQ_SCHEMA = ("g string, s string, p string, o_kind string, "
              "o_lex string, o_dt string, o_lang string")


def test_rdf_list_members_orders_and_kinds(spark):
    """Chain of 3 + singleton list: positions exact, member kinds pass
    through, non-list noise ignored, nil never a member."""
    import pytest

    from cow_spark.plans.entail import (RDF_FIRST, RDF_NIL, RDF_REST,
                                        rdf_list_members)

    rows = [
        _lq("L0", RDF_FIRST, "m0", "literal"), _lq("L0", RDF_REST, "L1"),
        _lq("L1", RDF_FIRST, "m1"), _lq("L1", RDF_REST, "L2"),
        _lq("L2", RDF_FIRST, "m2"), _lq("L2", RDF_REST, RDF_NIL),
        _lq("S0", RDF_FIRST, "solo"), _lq("S0", RDF_REST, RDF_NIL),
        _lq("X", "other", "noise"),
    ]
    out = sorted((r["head"], r["pos"], r["member"], r["member_kind"])
                 for r in rdf_list_members(
                     spark.createDataFrame(rows, _LQ_SCHEMA)).collect())
    assert out == [("L0", 0, "m0", "literal"), ("L0", 1, "m1", "iri"),
                   ("L0", 2, "m2", "iri"), ("S0", 0, "solo", "iri")]
    with pytest.raises(ValueError, match="max_len"):
        rdf_list_members(spark.createDataFrame(rows, _LQ_SCHEMA),
                         max_len=2)


def test_rdf_list_members_malformed_fail_loudly(spark):
    import pytest

    from cow_spark.plans.entail import (RDF_FIRST, RDF_REST,
                                        rdf_list_members)

    cyc = [_lq("A", RDF_REST, "B"), _lq("B", RDF_REST, "A"),
           _lq("A", RDF_FIRST, "x"), _lq("B", RDF_FIRST, "y")]
    with pytest.raises(ValueError, match="cycle"):
        rdf_list_members(spark.createDataFrame(cyc, _LQ_SCHEMA))
    two_tails = [_lq("A", RDF_REST, "B"), _lq("A", RDF_REST, "C"),
                 _lq("A", RDF_FIRST, "x")]
    with pytest.raises(ValueError, match="rdf:rest tails"):
        rdf_list_members(spark.createDataFrame(two_tails, _LQ_SCHEMA))
    two_firsts = [_lq("A", RDF_FIRST, "x"), _lq("A", RDF_FIRST, "y")]
    with pytest.raises(ValueError, match="rdf:first"):
        rdf_list_members(spark.createDataFrame(two_firsts, _LQ_SCHEMA))


def test_rdf_container_members(spark):
    """Typed Seq/Bag containers unroll with exact positions; untyped
    containers get NULL ctype; duplicate arcs collapse to distinct
    facts; non-positional rdf-namespace predicates and >18-digit
    positions are ignored; member kinds pass through."""
    from cow_spark.plans.entail import RDF_TYPE, rdf_container_members

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = [
        _lq("C1", RDF_TYPE, RDF + "Seq"),
        _lq("C1", RDF + "_1", "a"),
        _lq("C1", RDF + "_2", "lit-b", "lit"),
        _lq("C1", RDF + "_10", "c"),           # numeric, not lexical, order
        _lq("C1", RDF + "_2", "lit-b", "lit"),  # duplicate arc collapses
        _lq("C2", RDF + "_1", "x"),             # untyped container
        # two rdf:_1 arcs: legal multiplicity, both reported
        _lq("C2", RDF + "_1", "y"),
        # noise that must not match
        _lq("C1", RDF + "first", "nope"),
        _lq("C1", RDF + "_9999999999999999999", "too-big"),
        _lq("C3", RDF_TYPE, RDF + "Bag"),       # typed but memberless
    ]
    got = {(r.container, r.ctype, r.pos, r.member, r.member_kind)
           for r in rdf_container_members(
               spark.createDataFrame(rows, _LQ_SCHEMA)).collect()}
    assert got == {
        ("C1", RDF + "Seq", 1, "a", "iri"),
        ("C1", RDF + "Seq", 2, "lit-b", "lit"),
        ("C1", RDF + "Seq", 10, "c", "iri"),
        ("C2", None, 1, "x", "iri"),
        ("C2", None, 1, "y", "iri"),
    }


def test_rdf_reified_statements_semantics(spark):
    """Complete reifications flatten with term fields intact; the
    declared flag tracks the rdf:type arc; incomplete nodes (missing
    any role, or a literal rdf:predicate) emit nothing; duplicate
    subject arcs yield one row per combination; a literal rdf:subject
    passes through flagged s_kind='lit' for quarantine."""
    from cow_spark.plans.entail import rdf_reified_statements

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = [
        # R1: declared, literal object with dt + lang fields
        (None, "R1", RDF + "type", "iri", RDF + "Statement", None, None),
        (None, "R1", RDF + "subject", "iri", "s1", None, None),
        (None, "R1", RDF + "predicate", "iri", "p1", None, None),
        (None, "R1", RDF + "object", "lit", "v1", "xsd:string", "en"),
        # R2: undeclared, IRI object, TWO subject arcs -> two rows
        (None, "R2", RDF + "subject", "iri", "s2a", None, None),
        (None, "R2", RDF + "subject", "iri", "s2b", None, None),
        (None, "R2", RDF + "predicate", "iri", "p2", None, None),
        (None, "R2", RDF + "object", "iri", "o2", None, None),
        # R3: incomplete (no object) -> nothing
        (None, "R3", RDF + "subject", "iri", "s3", None, None),
        (None, "R3", RDF + "predicate", "iri", "p3", None, None),
        # R4: literal predicate -> incomplete -> nothing
        (None, "R4", RDF + "subject", "iri", "s4", None, None),
        (None, "R4", RDF + "predicate", "lit", "not-a-prop", None, None),
        (None, "R4", RDF + "object", "iri", "o4", None, None),
        # R5: literal subject passes through flagged
        (None, "R5", RDF + "subject", "lit", "weird", None, None),
        (None, "R5", RDF + "predicate", "iri", "p5", None, None),
        (None, "R5", RDF + "object", "iri", "o5", None, None),
        # noise: a non-reification quad sharing the node id
        (None, "R1", "http://ex/other", "iri", "x", None, None),
    ]
    schema = ("g string, s string, p string, o_kind string, "
              "o_lex string, o_dt string, o_lang string")
    got = {tuple(r) for r in rdf_reified_statements(
        spark.createDataFrame(rows, schema)).collect()}
    assert got == {
        ("R1", "s1", "iri", "p1", "lit", "v1", "xsd:string", "en", True),
        ("R2", "s2a", "iri", "p2", "iri", "o2", None, None, False),
        ("R2", "s2b", "iri", "p2", "iri", "o2", None, None, False),
        ("R5", "weird", "lit", "p5", "iri", "o5", None, None, False),
    }
