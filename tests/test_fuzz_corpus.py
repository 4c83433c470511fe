"""Hypothesis fuzz for the corpus operators: properties that must hold
on ARBITRARY input, checked against pure-Python twins. Spark runs once
per property over a batched corpus (one job per case would be
minutes); hypothesis drives the corpus generation, the assertion loops
per document."""

import os
import re
import string
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.corpus import pack_sequences
from cow_spark.operators.pii import PII_PATTERNS, pii_scan

_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .-@#\n\t:/",
    max_size=120)


@settings(max_examples=12, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=25))
def test_pii_scan_matches_python_re_on_random_text(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scan(df).collect()}
    for i, t in enumerate(texts):
        red = t
        for name, pat, tag in PII_PATTERNS:
            assert got[i][f"n_{name}"] == len(re.findall(pat, t)), (i, name)
            red = re.sub(pat, tag.replace("\\", "\\\\"), red)
        assert got[i]["redacted"] == red, i


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=400),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=64))
def test_pack_sequences_invariants_on_random_lengths(spark, lens, ctx):
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(lens)],
        "doc_id long, text string")
    rows = sorted(pack_sequences(docs, context=ctx, n_shards=3).collect(),
                  key=lambda r: (r["shard"], r["doc_id"]))
    offs: dict = {}
    for r in rows:
        off = offs.get(r["shard"], 0)
        assert r["n_tokens"] == lens[r["doc_id"]]
        assert r["start_off"] == off
        end = off + r["n_tokens"]
        assert r["bin_first"] == off // ctx
        assert r["bin_last"] == max((end - 1) // ctx, off // ctx)
        assert r["n_bins"] == r["bin_last"] - r["bin_first"] + 1
        offs[r["shard"]] = end
    assert len(rows) == len(lens)
