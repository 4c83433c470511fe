"""Hypothesis fuzz for the late-r4 operators: properties that must
hold on ARBITRARY input, checked against pure-Python serial twins
(the repo's fuzz discipline — one Spark job per property over a
batched corpus, hypothesis drives the generation)."""

import math
import os
import string
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cow_spark.functions.text import sentences, soundex
from cow_spark.operators.corpus import pareto_frontier
from cow_spark.operators.sessionize import decay_score


def _soundex_py(name: str):
    code_map = {}
    for letters, d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                       ("L", "4"), ("MN", "5"), ("R", "6")):
        for ch in letters:
            code_map[ch] = d
    letters = [c for c in name.upper() if c.isalpha()
               and c in string.ascii_uppercase]
    if not letters:
        return None
    out = letters[0]
    last = code_map.get(letters[0], "0")
    for ch in letters[1:]:
        c = code_map.get(ch)
        if c is not None:
            if c != last:
                out += c
            last = c
        elif ch in "HW":
            pass
        else:
            last = "0"
    return (out[:4] + "0000")[:4]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(
    alphabet=string.ascii_letters + " '-.éxyz0123456789",
    max_size=20), min_size=1, max_size=30))
def test_soundex_matches_python_twin(spark, names):
    df = spark.createDataFrame(list(enumerate(names)),
                               "i long, n string")
    got = {r.i: r.sx for r in
           df.select("i", soundex(F.col("n")).alias("sx")).collect()}
    for i, n in enumerate(names):
        assert got[i] == _soundex_py(n), (n, got[i], _soundex_py(n))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(
    alphabet=string.ascii_letters + " .!?\t\n,0123456789",
    max_size=80), min_size=1, max_size=20))
def test_sentences_cover_all_nonspace_content(spark, texts):
    """Invariant: concatenating the sentences recovers every
    non-whitespace character of the input in order (the split only
    eats boundary whitespace)."""
    df = spark.createDataFrame(list(enumerate(texts)),
                               "i long, t string")
    got = {r.i: list(r.s) for r in
           df.select("i", sentences(F.col("t")).alias("s")).collect()}
    ws = set(" \t\n\r\f\x0b")
    for i, t in enumerate(texts):
        joined = "".join(got[i])
        assert ([c for c in joined if c not in ws]
                == [c for c in t if c not in ws]), (t, got[i])
        assert all(s for s in got[i])  # no empty sentences


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=40))
def test_pareto_frontier_matches_bruteforce(spark, pts):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(r.id for r in pareto_frontier(df, "x", "y").collect())
    brute = sorted(
        i for i, x, y in rows
        if not any(qx >= x and qy >= y and (qx > x or qy > y)
                   for _, qx, qy in rows))
    assert got == brute, (pts, got, brute)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=25),
       st.integers(1, 999_999))
def test_decay_score_matches_serial_fold(spark, xs, decay):
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "g string, t int, x long")
    r = decay_score(df, "g", "t", "x", decay_ppm=decay).collect()[0]
    acc = 0
    for x in xs:
        acc = (acc * decay) // 1_000_000 + x
    assert (r.n, r.score) == (len(xs), acc), (xs, decay)
