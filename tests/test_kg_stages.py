"""E1 mentions → E3 linking → E4 canonicalization, plus E6 resume and
E7 nanopub provenance."""

import pyspark.sql.functions as F
import pytest

from cow_spark.operators.canon import canonical_entities, connected_components
from cow_spark.operators.extract import extract_quads
from cow_spark.operators.link import link_mentions
from cow_spark.operators.mentions import (
    detect_mentions,
    detect_mentions_arrow,
    gazetteer_pattern,
)
from cow_spark.plans.nanopub import NanopubContext, assemble_nanopub, dataset_sha1
from cow_spark.plans.resume import run_with_resume
from cow_spark.spec.mapping import MappingSpec
from cow_spark.spec.presets import transcripts_default_spec
from cow_spark.sources.transcripts import (
    CITIES,
    PERSONS,
    entities_df,
    transcripts_df,
    transcripts_rows,
)


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts_df(spark, 600).cache()


def test_mentions_jvm_matches_python(spark, tdf):
    import re

    pat = gazetteer_pattern(PERSONS + CITIES)
    got = detect_mentions(tdf, pat)
    rows = transcripts_rows(600)
    want = []
    rx = re.compile(pat)
    for r in rows:
        for pos, m in enumerate(rx.findall(r["text"])):
            want.append((r["conv_id"], r["turn_idx"], pos, m))
    got_set = {
        (r.conv_id, r.turn_idx, r.mention_pos, r.mention) for r in got.collect()
    }
    assert got_set == set(want)
    assert len(want) > 100
    # skew fixture: Person00 dominates (~30% of person mentions)
    p0 = sum(1 for *_k, m in want if m == "Person00")
    assert p0 > len(want) * 0.1


def test_mentions_arrow_path_agrees(spark, tdf):
    import re

    pat = gazetteer_pattern(PERSONS + CITIES)

    def factory():
        rx = re.compile(pat)
        return lambda text: rx.findall(text)

    jvm = detect_mentions(tdf, pat).select("conv_id", "turn_idx", "mention_pos", "mention")
    arrow = detect_mentions_arrow(tdf, factory).select(
        "conv_id", "turn_idx", "mention_pos", "mention"
    )
    assert jvm.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(jvm).count() == 0


def test_linking_broadcast_and_exact_names(spark, tdf):
    pat = gazetteer_pattern(PERSONS + CITIES)
    mentions = detect_mentions(tdf, pat)
    ents = entities_df(spark, 200)
    linked = link_mentions(mentions, ents, min_score=0.5)
    # every gazetteer surface form exists verbatim in the dictionary
    assert linked.count() == mentions.count()
    assert linked.where(F.col("score") < 1.0).count() == 0
    # physical plan uses a broadcast join (scale requirement)
    plan = linked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # linking is deterministic: exact name → exactly one entity
    amb = (
        linked.groupBy("mention_norm")
        .agg(F.countDistinct("entity_id").alias("n"))
        .where("n > 1")
        .count()
    )
    assert amb == 0


def test_connected_components_chain_star(spark):
    # 3 known components: size 2, a 50-chain, and a 10,000-node chain
    # (FIXTURES.md F5). The 10k chain has diameter 9,999 — plain min-label
    # propagation would need ~10k rounds; pointer jumping must converge
    # within max_iter=25 (O(log n)), so this asserts the doubling works.
    edges = [("a0", "a1")]
    edges += [(f"c{i:05d}", f"c{i+1:05d}") for i in range(49)]
    edges += [(f"k{i:05d}", f"k{i+1:05d}") for i in range(9_999)]
    df = spark.createDataFrame(edges, "src string, dst string")
    cc = connected_components(df).collect()
    comp = {r.node: r.component for r in cc}
    assert comp["a1"] == "a0"
    assert all(comp[f"c{i:05d}"] == "c00000" for i in range(50))
    assert comp["k09999"] == "k00000" and comp["k05000"] == "k00000"
    assert len({c for c in comp.values()}) == 3


def test_canonicalization_merges_aliases(spark):
    # same entity via two normalized forms + shared entity id
    linked = spark.createDataFrame(
        [
            ("c1", 0, 0, "Amsterdam", "amsterdam", "m1", "ent-1", 1.0),
            ("c2", 1, 0, "AMSTERDAM", "amsterdam", "m2", "ent-1", 0.9),
            ("c3", 2, 0, "Adam", "adam", "m3", "ent-1", 0.6),
            ("c4", 3, 0, "Berlin", "berlin", "m4", "ent-2", 1.0),
        ],
        "conv_id string, turn_idx int, mention_pos int, mention string, "
        "mention_norm string, mention_iri string, entity_id string, score double",
    )
    out = canonical_entities(linked)
    comps = {r.mention_iri: r.canonical_id for r in out.collect()}
    assert comps["m1"] == comps["m2"] == comps["m3"]  # via ent-1 hub
    assert comps["m4"] != comps["m1"]


def test_rewrite_canonical_closes_the_loop(spark):
    """rewrite_canonical: subjects and IRI objects collapse onto the
    canonical IRI (literals untouched), duplicates merge under set
    semantics, and owl:sameAs links preserve the original ids."""
    from cow_spark.operators.canon import OWL_SAMEAS, rewrite_canonical

    E = "https://example.com/"
    quads = spark.createDataFrame(
        [
            (None, E + "ada1", E + "knows", "iri", E + "bert", None, None),
            (None, E + "ada2", E + "knows", "iri", E + "bert", None, None),
            (None, E + "bert", E + "boss", "iri", E + "ada2", None, None),
            (None, E + "ada1", E + "name", "lit", "ada2", None, None),
        ],
        "g string, s string, p string, o_kind string, o_lex string, "
        "o_dt string, o_lang string")
    mapping = spark.createDataFrame(
        [(E + "ada2", E + "ada1")], "member_iri string, canonical_iri string")

    got = {(r.s, r.p, r.o_kind, r.o_lex) for r in
           rewrite_canonical(quads, mapping, emit_sameas=True).collect()}
    assert got == {
        # the two knows-quads collapsed into one canonical form
        (E + "ada1", E + "knows", "iri", E + "bert"),
        # object position rewritten too
        (E + "bert", E + "boss", "iri", E + "ada1"),
        # literal position: never rewritten regardless of value
        (E + "ada1", E + "name", "lit", "ada2"),
        (E + "ada2", OWL_SAMEAS, "iri", E + "ada1"),
    }


def test_resume_equals_fresh(spark, tmp_path):
    spec = MappingSpec.from_json(transcripts_default_spec())
    df = transcripts_df(spark, 300)

    def proc(d):
        return extract_quads(d, spec, passthrough=["_bucket"])

    out1, man1 = str(tmp_path / "o1"), str(tmp_path / "m1")
    # fresh full run
    b = run_with_resume(df, "conv_id", 8, proc, out1, man1)
    assert sorted(b) == sorted(set(b))
    full = spark.read.parquet(out1).drop("_bucket")

    # interrupted run: first only 3 buckets completed, then resume
    out2, man2 = str(tmp_path / "o2"), str(tmp_path / "m2")
    from cow_spark.plans.resume import bucket_of

    part = df.where(bucket_of(F.col("conv_id"), 8).isin([0, 1, 2]))
    run_with_resume(part, "conv_id", 8, proc, out2, man2)
    resumed = run_with_resume(df, "conv_id", 8, proc, out2, man2)
    assert not set(resumed) & {0, 1, 2} or part.count() == 0
    resumed_full = spark.read.parquet(out2).drop("_bucket")
    assert full.exceptAll(resumed_full).count() == 0
    assert resumed_full.exceptAll(full).count() == 0
    # idempotence: a third run does nothing
    assert run_with_resume(df, "conv_id", 8, proc, out2, man2) == []


def test_resume_survives_empty_manifest_dir(spark, tmp_path):
    """A crash during the first manifest write can leave a manifest
    directory holding only _temporary/_SUCCESS — that must read as 'no
    completed buckets', not permanently block resume on the
    unable-to-infer-schema error."""
    import os

    from cow_spark.plans.resume import completed_buckets

    man = tmp_path / "manifest"
    os.makedirs(man / "_temporary")
    (man / "_SUCCESS").touch()
    assert completed_buckets(spark, str(man)).count() == 0

    spec = MappingSpec.from_json(transcripts_default_spec())
    df = transcripts_df(spark, 100)

    def proc(d):
        return extract_quads(d, spec, passthrough=["_bucket"])

    out = str(tmp_path / "out")
    assert run_with_resume(df, "conv_id", 4, proc, out, str(man)) != []


def test_nanopub_virtuoso_compat_names_every_graph(spark):
    """virtuoso_compat replaces the spine's NULL graph with the
    deterministic urn:uuid (ref util/__init__.py:164-166 uses a random
    uuid4 — ours must be stable across runs)."""
    spec = MappingSpec.from_json(transcripts_default_spec())
    quads = extract_quads(transcripts_df(spark, 100), spec)
    ctx = NanopubContext("https://example.com/id", "transcripts",
                         "a" * 40, "2026-08-17T00:00")
    out = assemble_nanopub(quads, ctx, "transcripts", virtuoso_compat=True)
    gs = [r.g for r in out.select("g").distinct().collect()]
    assert None not in gs
    urn = ctx.default_graph_urn()
    assert urn.startswith("urn:uuid:") and urn in gs
    assert urn == ctx.default_graph_urn()  # deterministic
    # default mode unchanged: spine lives in the (NULL) default graph
    plain = assemble_nanopub(quads, ctx, "transcripts")
    assert None in {r.g for r in plain.select("g").distinct().collect()}


def test_nanopub_assembly(spark):
    spec = MappingSpec.from_json(transcripts_default_spec())
    df = transcripts_df(spark, 200)
    quads = extract_quads(df, spec)
    ctx = NanopubContext(
        base="https://example.com/id",
        name="transcripts",
        source_hash=dataset_sha1("snapshot-42"),
        timestamp="2026-08-16T10:00",
    )
    out = assemble_nanopub(quads, ctx, source_path="transcripts@snapshot-42")
    # assertion quads all land in the assertion graph
    n_assert = out.where(F.col("g") == ctx.assertion).count()
    assert n_assert == quads.count()
    # spine present
    spine = {(r.s, r.p, r.o_lex) for r in out.where(F.col("g").isNull()).collect()}
    assert (ctx.np_uri, "http://www.nanopub.org/nschema#hasAssertion", ctx.assertion) in spine
    # per-partition metrics sum to the assertion count
    metric = out.where(
        F.col("p") == "https://example.com/id/vocab/n_triples"
    ).agg(F.sum(F.col("o_lex").cast("long"))).first()[0]
    assert metric == quads.count()
    # determinism: same inputs → identical provenance set
    out2 = assemble_nanopub(quads, ctx, source_path="transcripts@snapshot-42")
    assert out.exceptAll(out2).count() == 0


def test_cc_local_path_matches_distributed(spark):
    edges = [("a0", "a1")]
    edges += [(f"c{i:05d}", f"c{i+1:05d}") for i in range(49)]
    edges += [("hub", f"s{i:05d}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    dist = {(r.node, r.component)
            for r in connected_components(df).collect()}
    local = {(r.node, r.component)
             for r in connected_components(df, local_threshold=10**6).collect()}
    assert dist == local


def test_transitive_pairs_paths_and_quad_variant(spark):
    """Path doubling closes a depth-8 chain in ≤4 rounds (max_iter=4)
    and the quad variant extracts one predicate's IRI edges."""
    from cow_spark.operators.canon import quad_transitive_pairs, transitive_pairs

    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
    e = spark.createDataFrame(chain, "src string, dst string")
    got = {(r.src, r.dst) for r in transitive_pairs(e, max_iter=4).collect()}
    want = {(f"n{i}", f"n{j}") for i in range(9) for j in range(i + 1, 9)}
    assert got == want

    B = "http://www.w3.org/2004/02/skos/core#broader"
    quads = spark.createDataFrame(
        [(None, "a", B, "iri", "b", None, None),
         (None, "b", B, "iri", "c", None, None),
         (None, "a", "other", "iri", "z", None, None),
         (None, "a", B, "lit", "not-an-iri", None, None)],
        "g string, s string, p string, o_kind string, o_lex string, "
        "o_dt string, o_lang string")
    got = {(r.src, r.dst)
           for r in quad_transitive_pairs(quads, B).collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "c")}


def test_transitive_pairs_local_and_distributed_identical(spark):
    """The driver-local fast path (edge count <= local_threshold) and
    the path-doubling distributed path return the identical pair set —
    including cycles, where neither emits reflexive (a, a) pairs."""
    from cow_spark.operators.canon import transitive_pairs

    edges = ([(f"n{i}", f"n{i+1}") for i in range(6)]     # chain
             + [("c0", "c1"), ("c1", "c2"), ("c2", "c0")]  # 3-cycle
             + [("n2", "c0"), ("x", "x")])                 # bridge + self
    e = spark.createDataFrame(edges, "src string, dst string")
    local = {(r.src, r.dst) for r in transitive_pairs(e).collect()}
    dist = {(r.src, r.dst)
            for r in transitive_pairs(e, local_threshold=0).collect()}
    assert local == dist
    assert ("c0", "c0") not in local          # no reflexive pairs
    assert ("n0", "c2") in local              # chain → bridge → cycle
    # empty input closes empty on the local path too
    empty = spark.createDataFrame([], "src string, dst string")
    assert transitive_pairs(empty).count() == 0


# ---------------------------------------------------------------------------
# IFP-based entity resolution (owl:InverseFunctionalProperty semantics)
# ---------------------------------------------------------------------------


def _ifp_quad(s, p, lex, kind="lit"):
    return (None, s, p, kind, lex, None, None)


def test_ifp_sameas_merges_across_properties(spark):
    """A shares an email with B; B shares a phone with C ⇒ {A,B,C}
    one entity. D's only collision is on a NON-IFP predicate and on an
    IRI-valued email (both must be ignored), so D stays singleton."""
    from cow_spark.operators.canon import ifp_sameas

    schema = ("g string, s string, p string, o_kind string, o_lex string, "
              "o_dt string, o_lang string")
    quads = spark.createDataFrame([
        _ifp_quad("A", "email", "x@example.com"),
        _ifp_quad("B", "email", "x@example.com"),
        _ifp_quad("B", "phone", "555-1234"),
        _ifp_quad("C", "phone", "555-1234"),
        _ifp_quad("D", "label", "x@example.com"),      # non-IFP predicate
        _ifp_quad("D", "email", "x@example.com", kind="iri"),  # not a literal
        _ifp_quad("D", "phone", "999"),
    ], schema)
    got = {r["node"]: r["canonical"] for r in ifp_sameas(
        quads, ["email", "phone"]).collect()}
    assert got == {"A": "A", "B": "A", "C": "A", "D": "D"}

    with pytest.raises(ValueError, match="at least one property"):
        ifp_sameas(quads, [])


def test_ifp_sameas_hot_value_is_star_not_pairwise(spark):
    """A shared value with n subjects must contribute n-1 edges (star),
    not n(n-1)/2 — asserted on the plan's absence of a self-join of the
    value projection with itself at equal (p, o_lex) on both sides, and
    on the result still merging the whole group."""
    from cow_spark.operators.canon import ifp_sameas

    schema = ("g string, s string, p string, o_kind string, o_lex string, "
              "o_dt string, o_lang string")
    rows = [_ifp_quad(f"u{i}", "email", "shared@example.com")
            for i in range(50)]
    quads = spark.createDataFrame(rows, schema)
    out = ifp_sameas(quads, ["email"])
    got = {r["node"]: r["canonical"] for r in out.collect()}
    assert len(got) == 50 and set(got.values()) == {"u0"}


# ---------------------------------------------------------------------------
# ER pair-level evaluation
# ---------------------------------------------------------------------------


def _clusters(spark, mapping):
    return spark.createDataFrame(
        [(n, c) for n, c in mapping.items()], "node string, canonical string")


def test_er_eval_exact_and_known_case(spark):
    from cow_spark.plans.parity import er_eval

    gold = _clusters(spark, {"a": "a", "b": "a", "c": "a"})
    # exact match: everything 1.0
    r = er_eval(gold, gold).collect()[0]
    assert (r["precision_m"], r["recall_m"], r["f1_m"]) == (
        1_000_000, 1_000_000, 1_000_000)
    # pred {a,b},{c} vs gold {a,b,c}: tp=1, pred=1, gold=3
    pred = _clusters(spark, {"a": "a", "b": "a", "c": "c"})
    r = er_eval(pred, gold).collect()[0]
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (1, 1, 3)
    assert r["precision_m"] == 1_000_000
    assert r["recall_m"] == 333_333      # floor(1/3 * 1e6)
    assert r["f1_m"] == 500_000


def test_er_eval_missing_gold_nodes_are_singletons(spark):
    from cow_spark.plans.parity import er_eval

    pred = _clusters(spark, {"a": "a", "b": "a"})
    gold = _clusters(spark, {"a": "a"})   # b absent from gold
    r = er_eval(pred, gold).collect()[0]
    # the predicted (a,b) pair is wrong (b is a gold singleton)
    assert (r["n_nodes"], r["tp_pairs"], r["pred_pairs"],
            r["gold_pairs"]) == (2, 0, 1, 0)
    assert r["precision_m"] == 0 and r["recall_m"] == 1_000_000


def test_er_eval_missing_pred_nodes_are_singletons(spark):
    """Symmetric rule: the node universe is pred ∪ gold — a gold-only
    node counts as a pred singleton (a left join would drop it and
    inflate recall)."""
    from cow_spark.plans.parity import er_eval

    pred = _clusters(spark, {"a": "a"})   # b, c absent from pred
    gold = _clusters(spark, {"a": "g", "b": "g", "c": "g"})
    r = er_eval(pred, gold).collect()[0]
    # gold has C(3,2)=3 pairs; pred asserts none → tp=0, recall=0
    assert (r["n_nodes"], r["tp_pairs"], r["pred_pairs"],
            r["gold_pairs"]) == (3, 0, 0, 3)
    assert r["precision_m"] == 1_000_000 and r["recall_m"] == 0


def test_blocking_eval_known_counts(spark):
    from cow_spark.plans.parity import blocking_eval

    # 4 nodes, gold {a,b,c} + {d}; blocks: b1={a,b,c}, b2={a,b} (dup
    # co-blocked pair a-b must count once for completeness, twice for
    # comparisons), b3={d}
    blocks = spark.createDataFrame(
        [("a", "b1"), ("b", "b1"), ("c", "b1"),
         ("a", "b2"), ("b", "b2"), ("d", "b3")],
        "node string, block string")
    gold = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("c", "g1"), ("d", "d")],
        "node string, canonical string")
    r = blocking_eval(blocks, gold).collect()[0]
    assert (r["n_nodes"], r["n_blocks"]) == (4, 3)
    assert r["comparisons"] == 4          # C(3,2) + C(2,2->1) + 0
    assert r["total_pairs"] == 6
    assert r["gold_pairs"] == 3
    assert r["co_blocked_pairs"] == 3     # a-b (deduped), a-c, b-c
    assert r["reduction_m"] == 333_333    # floor((1 - 4/6) * 1e6)
    assert r["completeness_m"] == 1_000_000


def test_blocking_eval_missed_pairs_lower_completeness(spark):
    from cow_spark.plans.parity import blocking_eval

    blocks = spark.createDataFrame(
        [("a", "b1"), ("b", "b1"), ("c", "b2")], "node string, block string")
    gold = spark.createDataFrame(
        [("a", "g"), ("b", "g"), ("c", "g")], "node string, canonical string")
    r = blocking_eval(blocks, gold).collect()[0]
    # only a-b co-blocked of the 3 gold pairs
    assert r["co_blocked_pairs"] == 1 and r["gold_pairs"] == 3
    assert r["completeness_m"] == 333_333


# ---------------------------------------------------------------------------
# r4: recency coreference + multi-source claim resolution
# ---------------------------------------------------------------------------


def test_coref_resolve_recency_rule(spark):
    """Anaphoric turns inherit the most recent prior mention, own
    mentions win over antecedents, conversations are isolated, and
    turns before a conversation's first mention stay NULL."""
    from cow_spark.operators.mentions import coref_resolve

    rows = [
        ("c1", 0, "no entity here"),
        ("c1", 1, "Ask Person01 about Oslo"),
        ("c1", 2, "sounds good"),
        ("c1", 3, "note: whatever"),
        ("c1", 4, "Meeting with Person02"),
        ("c1", 5, "ok"),
        ("c2", 0, "still nothing"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {(r.conv_id, r.turn_idx):
           (r.mention, r.antecedent, r.antecedent_turn, r.resolved)
           for r in coref_resolve(df, r"Person[0-9]{2}").collect()}
    assert out[("c1", 0)] == (None, None, None, None)
    assert out[("c1", 1)] == ("Person01", None, None, "Person01")
    assert out[("c1", 2)] == (None, "Person01", 1, "Person01")
    assert out[("c1", 3)] == (None, "Person01", 1, "Person01")
    # own mention wins; the antecedent column still reports the prior one
    assert out[("c1", 4)] == ("Person02", "Person01", 1, "Person02")
    assert out[("c1", 5)] == (None, "Person02", 4, "Person02")
    # c2 never sees c1's mentions
    assert out[("c2", 0)] == (None, None, None, None)
    assert len(out) == len(rows)


def test_resolve_claims_majority_and_ties(spark):
    """Distinct-source majority wins; duplicate claims from one source
    count once; ties break to the smallest object; n_values counts
    candidates."""
    from cow_spark.operators.canon import resolve_claims

    rows = [
        # s1.p: v1 backed by feeds a+b, v2 by c (majority v1)
        ("s1", "p", "v1", "a"), ("s1", "p", "v1", "b"),
        ("s1", "p", "v2", "c"),
        # s2.p: tie (a says x, b says y) -> min object "x"
        ("s2", "p", "y", "b"), ("s2", "p", "x", "a"),
        # s3.p: one source repeating itself three times is support 1
        ("s3", "p", "z", "a"), ("s3", "p", "z", "a"), ("s3", "p", "z", "a"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, source string")
    got = {(r.s, r.p): (r.o, r.support, r.n_sources, r.n_values)
           for r in resolve_claims(df).collect()}
    assert got[("s1", "p")] == ("v1", 2, 3, 2)
    assert got[("s2", "p")] == ("x", 1, 2, 2)
    assert got[("s3", "p")] == ("z", 1, 1, 1)


def test_source_reliability_ppm(spark):
    """Reliability = floor(agree/claims * 1e6): feed c disagrees with
    both elected values, feeds a/b agree with everything they say."""
    from cow_spark.operators.canon import resolve_claims, source_reliability

    rows = [
        ("s1", "p", "v1", "a"), ("s1", "p", "v1", "b"), ("s1", "p", "v2", "c"),
        ("s2", "p", "w", "a"), ("s2", "p", "w", "c"),
    ]
    df = spark.createDataFrame(rows, "s string, p string, o string, source string")
    got = {r.source: (r.n_claims, r.n_agree, r.reliability_m)
           for r in source_reliability(df).collect()}
    assert got["a"] == (2, 2, 1_000_000)
    assert got["b"] == (1, 1, 1_000_000)
    assert got["c"] == (2, 1, 500_000)
    # precomputed resolved table gives the identical answer
    pre = resolve_claims(df)
    again = {r.source: r.reliability_m
             for r in source_reliability(df, resolved=pre).collect()}
    assert again == {s: v[2] for s, v in got.items()}


def test_corpus_drift_identical_and_shifted(spark):
    """Identical corpora drift 0 at every bucket; a token swap moves
    exactly the buckets hosting the swapped tokens; one empty side
    aborts (ANSI division by zero total)."""
    import pytest as _pt
    from cow_spark.operators.terms import corpus_drift

    a = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha beta",)], "text string")
    same = corpus_drift(a, a, n_buckets=64).collect()
    assert same and all(r.tvd_ppm_contrib == 0 for r in same)
    assert all(r.cnt_a == r.cnt_b for r in same)
    b = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha DELTA",)], "text string")
    moved = corpus_drift(a, b, n_buckets=64).collect()
    assert sum(r.tvd_ppm_contrib for r in moved) > 0
    # totals equal (5 tokens each) so ppm sums are comparable
    assert sum(r.cnt_a for r in moved) == sum(r.cnt_b for r in moved) == 5
    empty = spark.createDataFrame([], "text string")
    with _pt.raises(Exception, match="DIVIDE_BY_ZERO|zero"):
        corpus_drift(a, empty, n_buckets=64).collect()
    with _pt.raises(ValueError, match="n_buckets"):
        corpus_drift(a, b, n_buckets=1)


def test_fs_weights_matches_log2_twin_and_validates(spark):
    """Weights replay the Python log2 twin exactly; inverted or
    out-of-range (m, u) and unknown pair attributes fail loudly."""
    import pytest

    from cow_spark.functions.intmath import log2_fp_py
    from cow_spark.plans.parity import fs_weights

    pairs = spark.createDataFrame(
        [("a", "b", "name", 1), ("a", "b", "city", 1),
         ("a", "c", "name", 0), ("a", "c", "city", 1)],
        "id_a string, id_b string, attr string, agree int")
    params = spark.createDataFrame(
        [("name", 900_000, 10_000), ("city", 800_000, 200_000)],
        "attr string, m_ppm long, u_ppm long")
    w_na = log2_fp_py(900_000) - log2_fp_py(10_000)
    w_nd = log2_fp_py(100_000) - log2_fp_py(990_000)
    w_ca = log2_fp_py(800_000) - log2_fp_py(200_000)
    rows = {(r["id_a"], r["id_b"]): r
            for r in fs_weights(pairs, params, 0, 5000).collect()}
    assert rows[("a", "b")]["weight_fp"] == w_na + w_ca
    assert rows[("a", "b")]["decision"] == "match"
    assert rows[("a", "c")]["weight_fp"] == w_nd + w_ca
    assert rows[("a", "c")]["decision"] == "nonmatch"
    with pytest.raises(ValueError, match="u_ppm < m_ppm"):
        fs_weights(pairs, spark.createDataFrame(
            [("name", 10_000, 900_000), ("city", 800_000, 200_000)],
            "attr string, m_ppm long, u_ppm long"), 0, 1)
    with pytest.raises(ValueError, match="no \\(m, u\\)"):
        fs_weights(pairs, params.where("attr = 'name'"), 0, 1)
    with pytest.raises(ValueError, match="lower_fp"):
        fs_weights(pairs, params, 10, 1)


def test_quote_attribution_spans_and_caps(spark):
    """Leftmost-first indices, speaker carry, unbalanced quote never
    closes, >400-char span refused by the pattern cap, newline blocks
    a span from crossing lines."""
    from cow_spark.operators.mentions import quote_attribution

    long = "x" * 401
    t = spark.createDataFrame(
        [("c1", 0, "user", 'He said "hello" then "bye"'),
         ("c1", 1, "assistant", "no quotes"),
         ("c1", 2, "tool", 'unbalanced " quote'),
         ("c1", 3, "user", f'"{long}"'),
         ("c1", 4, "user", '"spans\nlines"'),
         ("c2", 0, "user", 'Tell X: "see you in Oslo"\non Monday')],
        "conv_id string, turn_idx int, role string, text string")
    got = sorted((r["conv_id"], r["turn_idx"], r["speaker"],
                  r["quote_idx"], r["quote"], r["quote_chars"])
                 for r in quote_attribution(t).collect())
    assert got == [
        ("c1", 0, "user", 0, "hello", 5),
        ("c1", 0, "user", 1, "bye", 3),
        ("c2", 0, "user", 0, "see you in Oslo", 15),
    ]


def test_allen_relations_all_eleven_and_binning(spark):
    """Every in-contact Allen relation reachable; exactly-once across
    bin boundaries (tiny bin forces multi-bin intervals); cross-key
    pairs never meet; corrupt rows dropped; runaway span raises."""
    import pytest

    from cow_spark.operators.intervals import allen_relations

    iv = spark.createDataFrame(
        [("a", "k", 0, 10), ("b", "k", 0, 10),   # equals
         ("c", "k", 0, 5), ("d", "k", 5, 10),    # meets / starts family
         ("e", "k", 2, 8), ("g", "k", 3, 7),     # overlaps / during
         ("x", "k2", 0, 1),                       # isolated key
         ("bad", "k", 9, 3),                      # lo > hi: dropped
         (None, "k", 0, 1)],                      # NULL id: dropped
        "id string, key string, lo_us long, hi_us long")
    rows = {(r["id_a"], r["id_b"]): r["rel"]
            for r in allen_relations(iv, bin_us=4).collect()}
    assert rows[("a", "b")] == "equals"
    assert rows[("a", "c")] == "started_by"
    assert rows[("a", "d")] == "finished_by"
    assert rows[("a", "e")] == "contains"
    assert rows[("c", "d")] == "meets"
    assert rows[("c", "e")] == "overlaps"
    assert rows[("d", "e")] == "overlapped_by"
    assert rows[("e", "g")] == "contains"
    assert not [k for k in rows if "x" in k or "bad" in k or None in k]
    # each unordered pair exactly once despite multi-bin intervals
    assert len(rows) == len(set(rows))
    got_dup = allen_relations(
        spark.createDataFrame([("p", "k", 1, 3), ("q", "k", 0, 9)],
                              "id string, key string, lo_us long, hi_us long"),
        bin_us=2).collect()
    assert [(r["id_a"], r["id_b"], r["rel"])
            for r in got_dup] == [("p", "q", "during")]
    with pytest.raises(ValueError, match="max_bins_per_interval"):
        allen_relations(
            spark.createDataFrame([("r", "k", 0, 10_000)],
                                  "id string, key string, lo_us long, "
                                  "hi_us long"),
            bin_us=2, max_bins_per_interval=100)


def _bn_quads(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("s", T.StringType()),
        T.StructField("p", T.StringType()),
        T.StructField("o_kind", T.StringType()),
        T.StructField("o_lex", T.StringType()),
        T.StructField("o_dt", T.StringType()),
        T.StructField("o_lang", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


def test_bnode_canon_input_label_invariance(spark):
    """The canonical output must not depend on the INPUT bnode labels —
    the property that makes two runs of the reference byte-comparable
    after relabeling (rdflib BNodes are run-local, csvw.py:305)."""
    from cow_spark.operators.canon import bnode_canon

    base = [
        ("g", "e:r1", "p:rt", "iri", "_:a", None, None),
        ("g", "_:a", "p:st", "lit", "X", None, None),
        ("g", "_:a", "p:nx", "iri", "_:b", None, None),
        ("g", "_:b", "p:pr", "lit", "Y", None, None),
        ("g", "e:r2", "p:rt", "iri", "_:c", None, None),
        ("g", "_:c", "p:st", "lit", "Z", None, None),
    ]
    ren = {"_:a": "_:zz9", "_:b": "_:q", "_:c": "_:a"}  # permuted names
    relab = [(g, ren.get(s, s), p, k, ren.get(o, o) if k == "iri" else o,
              dt, lg) for g, s, p, k, o, dt, lg in base]
    out1 = sorted(map(tuple, bnode_canon(_bn_quads(spark, base)).collect()))
    out2 = sorted(map(tuple, bnode_canon(_bn_quads(spark, relab)).collect()))
    assert out1 == out2
    # and the bnode labels really were rewritten to _:c<hash> form
    assert all(not s.startswith("_:") or s.startswith("_:c")
               for _, s, *_ in out1)


def test_bnode_canon_automorphic_orbit_collapses(spark):
    """Anchor-free twins are 1-WL-indistinguishable: they share a
    canonical label and their quads collapse to one row; a literal
    whose lexical form LOOKS like a bnode label stays untouched."""
    from cow_spark.operators.canon import bnode_canon

    rows = [
        ("g", "_:u1", "p:tw", "lit", "x", None, None),
        ("g", "_:u2", "p:tw", "lit", "x", None, None),
        ("g", "_:u3", "p:tw", "lit", "x", None, None),
        ("g", "e:r", "p:note", "lit", "_:u1", None, None),  # literal decoy
    ]
    out = bnode_canon(_bn_quads(spark, rows)).collect()
    assert len(out) == 2
    lit = [r for r in out if r.p == "p:note"][0]
    assert lit.o_lex == "_:u1"  # literal lexical form untouched
    tw = [r for r in out if r.p == "p:tw"][0]
    assert tw.s.startswith("_:c")


def test_bnode_canon_distinguishes_datatyped_literals(spark):
    """Literal anchors key on (kind, lex, dt, lang): two bnodes whose
    only difference is their leaf's DATATYPE must get different
    canonical labels."""
    from cow_spark.operators.canon import bnode_canon

    rows = [
        ("g", "_:a", "p:v", "lit", "1", "xsd:int", None),
        ("g", "_:b", "p:v", "lit", "1", None, None),
    ]
    out = bnode_canon(_bn_quads(spark, rows)).collect()
    assert len(out) == 2
    labels = {r.o_dt: r.s for r in out}
    assert labels["xsd:int"] != labels[None]


def test_void_description_values(spark):
    """VoID counts on a hand-checkable graph: 2 subjects, 3 predicates,
    2 classes; datatyped vs plain '1' are two distinct objects."""
    from cow_spark.plans.stats import void_description

    rows = [
        ("g", "e:a", "rdf:type", "iri", "c:X", None, None),
        ("g", "e:a", "p:v", "lit", "1", "xsd:int", None),
        ("g", "e:b", "rdf:type", "iri", "c:Y", None, None),
        ("g", "e:b", "p:v", "lit", "1", None, None),
        ("g", "e:b", "p:w", "lit", "1", None, None),
    ]
    out = {(r.s, r.p): r.o_lex
           for r in void_description(_bn_quads(spark, rows),
                                     dataset="d:t").collect()}
    assert out[("d:t", "void:triples")] == "5"
    assert out[("d:t", "void:distinctSubjects")] == "2"
    # c:X, c:Y, "1"^^xsd:int, "1"plain  → 4 distinct object terms
    assert out[("d:t", "void:distinctObjects")] == "4"
    assert out[("d:t", "void:properties")] == "3"
    assert out[("d:t", "void:classes")] == "2"
    assert out[("d:t/property/p:v", "void:triples")] == "2"
    assert out[("d:t/property/p:v", "void:distinctSubjects")] == "2"
    assert out[("d:t/class/c:X", "void:entities")] == "1"
    assert out[("d:t/class/c:Y", "void:entities")] == "1"


def test_canon_conflicts_flags_overmerge_only(spark):
    """Component g1 merges two claim values (conflict); g2 has two
    claimants agreeing (clean); g3 has members but no claims (clean,
    n_values 0); NULL claims never count as values."""
    from cow_spark.operators.canon import canon_conflicts

    labels = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("c", "g2"), ("d", "g2"),
         ("e", "g3")], "node string, comp string")
    claims = spark.createDataFrame(
        [("a", "x@1"), ("b", "y@2"), ("c", "z@3"), ("d", "z@3"),
         ("e", None)], "node string, v string")
    got = {r.comp: (r.n_nodes, r.n_claimed, r.n_values, r.has_conflict)
           for r in canon_conflicts(labels, claims).collect()}
    assert got == {"g1": (2, 2, 2, True),
                   "g2": (2, 2, 1, False),
                   "g3": (1, 0, 0, False)}
