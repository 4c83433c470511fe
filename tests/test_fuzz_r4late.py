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


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=0, max_size=60))
def test_fuzz_bradley_terry_matches_python_twin(spark, ms):
    """Arbitrary small tournaments (self-matches included — they must
    drop) fold to the exact same int64 MM iterate as the serial
    twin."""
    from cow_spark.operators.dialogue import (bradley_terry,
                                              bradley_terry_py)

    matches = [(f"p{w}", f"p{l}") for w, l in ms]
    if not [1 for w, l in matches if w != l]:
        return
    from cow_spark.operators.dedup import release

    df = spark.createDataFrame(matches,
                               "winner string, loser string")
    out = bradley_terry(df, rounds=5)
    got = {r.player: (r.rating_fp, r.wins, r.n_matches)
           for r in out.collect()}
    release(out)  # the operator now hands its cached partials over
    assert got == bradley_terry_py(matches, rounds=5)


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.tuples(st.integers(-50, 50), st.integers(-40, 40)),
    min_size=1, max_size=25, unique_by=lambda p: p[0]))
def test_fuzz_mann_kendall_brute_force(spark, series):
    """S, pair count, tie-corrected var·18 and the exact Sen median
    agree with brute-force enumeration on arbitrary integer series
    (negative values and slopes included)."""
    from cow_spark.operators.sessionize import mann_kendall

    rows = [("k", t, x) for t, x in series]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = mann_kendall(df, "k", "t", "x").collect()[0]
    pairs = [(a, b) for a in series for b in series if a[0] < b[0]]
    s = sum((xj > xi) - (xj < xi) for (_, xi), (_, xj) in pairs)
    n = len(series)
    from collections import Counter
    ties = Counter(x for _, x in series)
    var18 = (n * (n - 1) * (2 * n + 5)
             - sum(c * (c - 1) * (2 * c + 5)
                   for c in ties.values() if c >= 2))
    assert (r.n_pairs, r.s_stat, r.var18) == (len(pairs), s, var18)
    if pairs:
        # python // floors, matching the operator's pmod-floor spec
        slopes = sorted(((xj - xi) * 1_000_000) // (tj - ti)
                        for (ti, xi), (tj, xj) in pairs)
        med = slopes[((len(slopes) - 1) * 500_000) // 1_000_000]
        assert r.sen_slope_ppm == med
    else:
        assert r.sen_slope_ppm is None


def _holt_py(xs, a=300_000, b=100_000):
    m = 1_000_000

    def tdiv(num, den):
        q = abs(num) // den
        return q if num >= 0 else -q

    l, bb = xs[0], (xs[1] - xs[0] if len(xs) >= 2 else 0)
    for x in xs[1:]:
        ln = tdiv(a * x + (m - a) * (l + bb), m)
        bn = tdiv(b * (ln - l) + (m - b) * bb, m)
        l, bb = ln, bn
    return l, bb


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-10_000, 10_000), min_size=1,
                max_size=30))
def test_fuzz_holt_matches_truncating_python_fold(spark, xs):
    """The Spark HOF fold equals a serial TRUNCATING-division fold on
    arbitrary signed series — pinning that `div` is truncation (the
    DuckDB `//` pair), not floor."""
    from cow_spark.operators.sessionize import holt_forecast

    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, o long, x long")
    r = holt_forecast(df, "k", "o", "x", horizon=1).collect()[0]
    l, bb = _holt_py(xs)
    assert (r.level, r.trend, r.forecast) == (l, bb, l + bb)


@settings(max_examples=15, deadline=None)
@given(st.dictionaries(
    st.tuples(st.integers(0, 1), st.integers(0, 1), st.integers(0, 1)),
    st.integers(1, 500), min_size=1, max_size=8))
def test_fuzz_fs_em_recurrence_is_total(spark, patterns):
    """The integer EM recurrence never divides by zero, stays inside
    [1, 999999] ppm, and is idempotent once frozen — on ARBITRARY
    pattern profiles including all-agree and all-disagree."""
    from cow_spark.plans.parity import _fs_em_py

    p, m, u, total = _fs_em_py(patterns, 3, 8,
                               100_000, 900_000, 100_000)
    assert total == sum(patterns.values())
    for v in [p, *m, *u]:
        assert 1 <= v <= 999_999
    p2, m2, u2, _ = _fs_em_py(patterns, 3, 16,
                              100_000, 900_000, 100_000)
    # more rounds never crashes; values stay in range
    for v in [p2, *m2, *u2]:
        assert 1 <= v <= 999_999
