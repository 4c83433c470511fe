"""Filtered negative sampling for KG-embedding training."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.kgtrain import (
    entity_vocab,
    negative_samples,
    negative_samples_py,
)

_TRIPLES = [(f"e{i}", "p0" if i % 2 == 0 else "p1", f"e{(i * 3 + 1) % 15}")
            for i in range(15)]


def _df(spark, triples=_TRIPLES):
    return spark.createDataFrame(triples, "s string, p string, o string")


def test_negative_samples_match_python_twin(spark):
    for corrupt in ("object", "subject", "both"):
        got = sorted(
            (r["s"], r["p"], r["o"], r["neg_s"], r["neg_o"], r["trial"])
            for r in negative_samples(
                _df(spark), corrupt=corrupt).collect())
        assert got == negative_samples_py(_TRIPLES, corrupt=corrupt), corrupt


def test_negatives_are_never_true_triples(spark):
    truth = set(_TRIPLES)
    rows = negative_samples(_df(spark), n_neg=3, n_trials=12).collect()
    assert rows
    for r in rows:
        assert (r["neg_s"], r["p"], r["neg_o"]) not in truth
        assert (r["neg_s"], r["neg_o"]) != (r["s"], r["o"])
        # object corruption keeps the subject
        assert r["neg_s"] == r["s"]
    per_pos: dict = {}
    for r in rows:
        per_pos.setdefault((r["s"], r["p"], r["o"]), []).append(r["trial"])
    assert all(len(t) <= 3 for t in per_pos.values())


def test_entity_vocab_dense_and_sorted(spark):
    v = entity_vocab(_df(spark)).orderBy("idx").collect()
    ents = [r["ent"] for r in v]
    assert ents == sorted(ents)
    assert [r["idx"] for r in v] == list(range(len(v)))


def test_negative_samples_validation_and_empty(spark):
    with pytest.raises(ValueError):
        negative_samples(_df(spark), corrupt="none")
    with pytest.raises(ValueError):
        negative_samples(_df(spark), n_neg=4, n_trials=2)
    empty = spark.createDataFrame([], "s string, p string, o string")
    assert negative_samples(empty).count() == 0


def test_negative_samples_plan_stays_jvm(spark):
    out = negative_samples(_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ranking_eval_metrics_and_ties(spark):
    """Known ranks: tie broken by candidate asc; no-positive query
    yields NULL best_rank/rr_ppm and zero hits."""
    from cow_spark.operators.kgtrain import ranking_eval

    scored = spark.createDataFrame(
        [("q1", "c1", 100, 0), ("q1", "c2", 90, 1), ("q1", "c3", 80, 0),
         ("q2", "c1", 50, 1), ("q2", "c2", 50, 0),
         ("q3", "c9", 10, 0)],
        "query string, cand string, score long, is_pos int")
    rows = {r["query"]: r for r in ranking_eval(scored).collect()}
    assert rows["q1"]["best_rank"] == 2 and rows["q1"]["rr_ppm"] == 500_000
    assert rows["q1"]["hit_1"] == 0 and rows["q1"]["hit_3"] == 1
    # q2: tie at score 50 → c1 (asc) ranks first → positive at rank 1
    assert rows["q2"]["best_rank"] == 1 and rows["q2"]["rr_ppm"] == 1_000_000
    assert rows["q3"]["best_rank"] is None and rows["q3"]["rr_ppm"] is None
    assert (rows["q3"]["hit_1"], rows["q3"]["hit_10"]) == (0, 0)
    assert rows["q1"]["n_cands"] == 3 and rows["q1"]["n_pos"] == 1


def test_transe_score_matches_serial_twin(spark):
    """Bit-exact vs a hashlib twin of the same embedding arithmetic;
    identical triples score identically; param validation raises."""
    import hashlib

    import pytest

    from cow_spark.operators.kgtrain import TRANSE_SALT, transe_score

    def comp(kind, name, d, half_range=7):
        mod = 2 * half_range + 1
        raw = f"{TRANSE_SALT}\x01{kind}\x01{name}\x01{d}".encode()
        h = int(hashlib.md5(raw).hexdigest()[:8], 16)
        return h % mod - half_range

    def serial(s, p, o, dim=4, half_range=7):
        return -sum(
            abs(comp("e", s, d, half_range) + comp("r", p, d, half_range)
                - comp("e", o, d, half_range))
            for d in range(dim))

    rows = [("a", "r1", "b"), ("a", "r1", "a"), ("c", "r2", "b")]
    df = spark.createDataFrame(rows, "s string, p string, o string")
    got = {(r.s, r.p, r.o): r.score
           for r in transe_score(df, dim=4, half_range=7).collect()}
    assert got == {(s, p, o): serial(s, p, o) for s, p, o in rows}
    with pytest.raises(ValueError):
        transe_score(df, dim=0)
    with pytest.raises(ValueError):
        transe_score(df, half_range=0)


def test_alias_table_priors_and_pruning(spark):
    """Counts, survivors-only denominator, deterministic tie-break
    rank, NULL filtering, min_count validation."""
    import pytest

    from cow_spark.operators.link import alias_table

    rows = (
        [("obama", "e_barack")] * 5
        + [("obama", "e_michelle")] * 3
        + [("obama", "e_typo")] * 1        # pruned at min_count=2
        + [("paris", "e_city")] * 2
        + [("paris", "e_person")] * 2      # tie -> min entity ranks 1
        + [(None, "e_x"), ("ghost", None)]  # NULLs dropped
    )
    df = spark.createDataFrame(rows, "mention_norm string, entity_id string")
    got = {(r.surface, r.entity): r
           for r in alias_table(df, min_count=2).collect()}
    assert set(got) == {("obama", "e_barack"), ("obama", "e_michelle"),
                        ("paris", "e_city"), ("paris", "e_person")}
    ob = got[("obama", "e_barack")]
    # denominator excludes the pruned typo row: 8, not 9
    assert (ob.n_links, ob.n_surface, ob.prior_ppm, ob.rank) == \
        (5, 8, 625000, 1)
    om = got[("obama", "e_michelle")]
    assert (om.n_links, om.prior_ppm, om.rank) == (3, 375000, 2)
    pc, pp = got[("paris", "e_city")], got[("paris", "e_person")]
    assert (pc.rank, pp.rank) == (1, 2)  # tie broken by min entity
    assert pc.prior_ppm == pp.prior_ppm == 500000
    with pytest.raises(ValueError):
        alias_table(df, min_count=0)


def test_type_predict_learns_separable_classes(spark):
    """Perfectly class-correlated features: every untyped subject must
    take its feature's class; typed subjects never appear."""
    from cow_spark.operators.kgtrain import type_predict

    rows = []
    for i in range(6):
        cls = "c:A" if i % 2 == 0 else "c:B"
        feat = "f:ea" if i % 2 == 0 else "f:eb"
        if i < 4:  # typed training subjects
            rows.append((f"s{i}", "rdf:type", "iri", cls))
        rows.append((f"s{i}", feat, "lit", "x"))
    q = spark.createDataFrame(
        rows, "s string, p string, o_kind string, o_lex string")
    got = {r.s: (r.predicted, r.n_feats)
           for r in type_predict(q).collect()}
    assert got == {"s4": ("c:A", 1), "s5": ("c:B", 1)}


def test_type_predict_tie_breaks_to_smallest_class(spark):
    """Symmetric training data → identical scores; the argmax must
    deterministically pick the lexicographically smallest class."""
    from cow_spark.operators.kgtrain import type_predict

    rows = [
        ("t1", "rdf:type", "iri", "c:B"), ("t1", "f:x", "lit", "x"),
        ("t2", "rdf:type", "iri", "c:A"), ("t2", "f:x", "lit", "x"),
        ("u", "f:x", "lit", "x"),
    ]
    q = spark.createDataFrame(
        rows, "s string, p string, o_kind string, o_lex string")
    out = type_predict(q).collect()
    assert len(out) == 1 and out[0].predicted == "c:A"


def test_type_predict_multi_typed_subject_trains_both(spark):
    """A subject typed A AND B contributes its features to both
    classes' counts (and is itself never predicted)."""
    from cow_spark.operators.kgtrain import type_predict

    rows = [
        ("m", "rdf:type", "iri", "c:A"), ("m", "rdf:type", "iri", "c:B"),
        ("m", "f:only", "lit", "x"),
        ("t", "rdf:type", "iri", "c:C"), ("t", "f:other", "lit", "x"),
        ("u", "f:only", "lit", "x"),
    ]
    q = spark.createDataFrame(
        rows, "s string, p string, o_kind string, o_lex string")
    out = {r.s: r.predicted for r in type_predict(q).collect()}
    # f:only seen under A and B equally, never under C → tie A/B → A
    assert out == {"u": "c:A"}
