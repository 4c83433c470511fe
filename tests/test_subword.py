"""BPE subword training: Python-twin parity, the known Sennrich-style
merge order, early stop, and segmentation compression."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cow_spark.operators.subword import (
    bpe_segment,
    bpe_segment_arrow,
    bpe_train,
    bpe_train_py,
    word_symbol_table,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _counts(texts):
    wc: dict = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


_CORPUS = ["low low low low low",
           "lower lower newest newest",
           "newest newest newest newest",
           "widest widest widest"]


def test_bpe_train_matches_python_twin(spark):
    got = [(r["merge_idx"], r["a"], r["b"], r["c"])
           for r in bpe_train(_docs(spark, _CORPUS), 10)
           .orderBy("merge_idx").collect()]
    assert got == bpe_train_py(_counts(_CORPUS), 10)
    # the classic first merges on this corpus: 'es' then 'est' or
    # 'est</w>' chains out of 'newest'/'widest' (9 occurrences)
    assert got[0][1:3] == ("e", "s") and got[0][3] == 9


def test_bpe_stops_when_fully_merged(spark):
    # one distinct word of 2 chars + </w>: only 2+1 merge rounds exist
    got = bpe_train(_docs(spark, ["ab ab ab"]), 10).collect()
    assert len(got) == 2  # (a,b) then (ab,</w>); then single symbol
    twin = bpe_train_py({"ab": 3}, 10)
    assert [(r["merge_idx"], r["a"], r["b"], r["c"]) for r in
            sorted(got, key=lambda r: r["merge_idx"])] == twin


def test_word_symbol_table_strips_separator_and_frames(spark):
    rows = word_symbol_table(
        _docs(spark, ["ab a\x1fb"])).orderBy("s").collect()
    # both tokens normalize to 'ab' (separator byte stripped)
    assert len(rows) == 1 and rows[0]["cnt"] == 2
    assert rows[0]["s"] == "\x1fa\x1fb\x1f</w>\x1f"


def test_bpe_segment_compresses_with_merges(spark):
    docs = _docs(spark, _CORPUS)
    merges = [(r["a"], r["b"]) for r in
              bpe_train(docs, 8).orderBy("merge_idx").collect()]
    none = bpe_segment(docs, []).collect()
    some = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    for r in none:
        # zero merges: chars + </w> per word
        txt = _CORPUS[r["doc_id"]]
        want = sum(len(w) + 1 for w in txt.split())
        assert r["n_subwords"] == want
        assert some[r["doc_id"]]["n_subwords"] < want
        assert some[r["doc_id"]]["n_tokens"] == r["n_tokens"]


def test_bpe_segment_empty_doc_and_cap(spark):
    import pytest

    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "hi")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bpe_segment(docs, []).collect()}
    assert out[0]["n_tokens"] == 0 and out[0]["n_subwords"] == 0
    assert out[1]["n_tokens"] == 0
    assert out[2]["n_subwords"] == 3
    with pytest.raises(ValueError):
        bpe_segment(docs, [("a", "b")] * 257)


def test_bpe_segment_arrow_matches_column_path(spark):
    docs = _docs(spark, _CORPUS + ["", "a\x1fb low"])
    merges = [(r["a"], r["b"]) for r in
              bpe_train(docs, 8).orderBy("merge_idx").collect()]
    col = sorted(map(tuple, bpe_segment(docs, merges).collect()))
    arrow = sorted(map(tuple, bpe_segment_arrow(docs, merges).collect()))
    assert arrow == col


def test_bpe_segment_arrow_uncapped(spark):
    # >256 merges is the Arrow path's reason to exist; a repeated merge
    # is idempotent after its first application, so 300 copies of
    # ('l','o') must equal the Column path's single application.
    docs = _docs(spark, _CORPUS)
    arrow = sorted(map(tuple,
                       bpe_segment_arrow(docs, [("l", "o")] * 300)
                       .collect()))
    col = sorted(map(tuple, bpe_segment(docs, [("l", "o")]).collect()))
    assert arrow == col


def test_bpe_plan_stays_jvm_side(spark):
    words = word_symbol_table(_docs(spark, _CORPUS))
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
