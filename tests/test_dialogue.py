"""Dialogue-structure operators: SFT pairs and context windows."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.dialogue import conversation_windows, sft_pairs

_CONV = [
    # conv A: clean user→assistant pair, then a tool interruption
    ("a", 0, "user", "hi there"),
    ("a", 1, "assistant", "hello"),
    ("a", 2, "user", "look this up"),
    ("a", 3, "tool", "result: 42"),
    ("a", 4, "assistant", "it is 42"),
    # conv B: empty response must not mine a pair
    ("b", 0, "user", "ping"),
    ("b", 1, "assistant", ""),
]
_DDL = "conv_id string, turn_idx int, role string, text string"


def test_sft_pairs_adjacency_and_emptiness(spark):
    df = spark.createDataFrame(_CONV, _DDL)
    got = {(r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"])
           for r in sft_pairs(df).collect()}
    # only the contiguous non-empty pair survives: the tool turn breaks
    # (a,2)->(a,4), and (b,0)'s response is empty
    assert got == {("a", 0): ("hi there", "hello")}


def test_conversation_windows_order_and_content(spark):
    df = spark.createDataFrame(_CONV, _DDL)
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in conversation_windows(df, n_context=3).collect()}
    assert set(got) == {("a", 1), ("a", 4)}
    assert got[("a", 1)]["context"] == "user: hi there"
    assert got[("a", 1)]["target"] == "hello"
    # oldest-to-newest frame order, tool turn included in context
    assert got[("a", 4)]["context"] == (
        "assistant: hello\nuser: look this up\ntool: result: 42")
    assert got[("a", 4)]["target"] == "it is 42"


def test_conversation_windows_bounded_context(spark):
    rows = [("c", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(10)]
    df = spark.createDataFrame(rows, _DDL)
    out = conversation_windows(df, n_context=2).collect()
    for r in out:
        # never more than n_context lines
        assert len(r["context"].split("\n")) <= 2


def test_tool_transitions_markov_stats(spark):
    """Transition mining: START/END sentinels, per-conversation order,
    fixed-point conditional probabilities summing to ~scale per prev."""
    from cow_spark.operators.dialogue import tool_transitions

    rows = [
        # conv A tools in order: search, calc, search
        ("a", 1, "tool", "search"), ("a", 3, "tool", "calc"),
        ("a", 5, "tool", "search"),
        # conv B: single browse call
        ("b", 0, "tool", "browse"),
        # conv C: no tools at all -> contributes nothing
        ("c", 0, "user", None),
        # out-of-order turn_idx input must not matter: calc before search
        ("d", 9, "tool", "calc"), ("d", 2, "tool", "search"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")
    got = {(r.prev, r.next): (r.n, r.p_fp)
           for r in tool_transitions(df).collect()}
    assert got == {
        ("^START", "search"): (2, 666),  # convs a, d (of 3 starts)
        ("^START", "browse"): (1, 333),
        ("search", "calc"): (2, 666),    # a:1->3, d:2->9 (of 3 search)
        ("search", "$END"): (1, 333),    # a ends after search
        ("calc", "search"): (1, 500),    # a:3->5
        ("calc", "$END"): (1, 500),      # d ends after calc
        ("browse", "$END"): (1, 1000),
    }
    # per-prev probabilities sum to scale (up to div truncation)
    from collections import defaultdict
    sums = defaultdict(int)
    for (p, _), (_, pf) in got.items():
        sums[p] += pf
    assert all(1000 - 3 <= s <= 1000 for s in sums.values()), dict(sums)


def test_turn_coherence_exact_values(spark):
    """Hand-computed Jaccard ppm per transition, floored mean, min,
    threshold count; empty↔empty transition is vacuously coherent."""
    from cow_spark.operators.dialogue import turn_coherence

    rows = [
        # conv A: t0 {a,b,c}, t1 {b,c,d} J=2/4=0.5; t1→t2 {x} J=0/4=0
        ("A", 0, "u", "a b c"),
        ("A", 1, "a", "b c d"),
        ("A", 2, "u", "x"),
        # conv B: both empty → 1e6; then empty→{q} J=0/1=0
        ("B", 0, "u", ""),
        ("B", 1, "a", "  "),
        ("B", 2, "u", "q"),
        # conv C: single turn → no transitions, absent from output
        ("C", 0, "u", "solo"),
        # conv D: duplicate tokens collapse: {a} vs {a} J=1
        ("D", 0, "u", "a a a"),
        ("D", 1, "a", "A"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    got = {r.conv_id: r for r in
           turn_coherence(df, threshold_ppm=400_000).collect()}
    assert set(got) == {"A", "B", "D"}
    a = got["A"]
    assert (a.n_transitions, a.min_jac_ppm, a.n_incoherent) == (2, 0, 1)
    assert a.mean_jac_ppm == (500_000 + 0) // 2
    b = got["B"]
    assert (b.n_transitions, b.mean_jac_ppm, b.min_jac_ppm,
            b.n_incoherent) == (2, 500_000, 0, 1)
    d = got["D"]
    assert (d.n_transitions, d.mean_jac_ppm, d.min_jac_ppm,
            d.n_incoherent) == (1, 1_000_000, 1_000_000, 0)


def test_turn_coherence_orders_by_turn_idx_not_input_order(spark):
    from cow_spark.operators.dialogue import turn_coherence

    rows = [("A", 2, "u", "c d"), ("A", 0, "u", "a b"), ("A", 1, "a", "b c")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    r = turn_coherence(df).first()
    # 0→1: {a,b}∩{b,c}=1/3; 1→2: {b,c}∩{c,d}=1/3
    assert r.n_transitions == 2
    assert r.mean_jac_ppm == 333_333


def test_prefix_duplicates_exact_relation(spark):
    """Proper prefixes, identical twins (one direction, min-id first),
    divergence-after-prefix excluded, role changes break the prefix,
    gappy turn_idx compares by dense sequence."""
    from cow_spark.operators.dialogue import prefix_duplicates

    rows = [
        # P1 = first 2 turns of FULL; P2 diverges at turn 2
        ("FULL", 0, "u", "hi"), ("FULL", 1, "a", "hello"),
        ("FULL", 2, "u", "more"),
        ("P1", 0, "u", "hi"), ("P1", 1, "a", "hello"),
        ("P2", 0, "u", "hi"), ("P2", 1, "a", "DIFFERENT"),
        # identical twins
        ("T1", 0, "u", "x"), ("T2", 0, "u", "x"),
        # same text, different role: NOT a prefix of T1/T2
        ("R1", 0, "a", "x"),
        # gappy indices: dense rank makes G1 ≡ P1's sequence
        ("G1", 5, "u", "hi"), ("G1", 9, "a", "hello"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    got = {(r.conv_a, r.conv_b, r.prefix_len)
           for r in prefix_duplicates(df).collect()}
    assert got == {
        ("P1", "FULL", 2), ("G1", "FULL", 2),
        ("G1", "P1", 2), ("P1", "G1", 2),  # equal-content, equal-length?
        ("T1", "T2", 1),
    } - {("P1", "G1", 2), ("G1", "P1", 2)} | {
        # equal-length identical pair keeps min-id direction only
        ("G1", "P1", 2),
    }


def test_prefix_duplicates_no_false_positives(spark):
    import random

    from cow_spark.operators.dialogue import prefix_duplicates

    rnd = random.Random(3)
    rows = []
    for c in range(20):
        for i in range(rnd.randint(1, 5)):
            rows.append((f"c{c}", i, "u", f"t{c}-{i}"))  # all distinct
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    assert prefix_duplicates(df).count() == 0


def test_role_entropy_pins(spark):
    """Hand-checked fixed-point entropies: 50/50 two-role conv = 1.0
    bit exactly, single-turn conv = 0, monologue = 0 with majority
    10^6, three-way uniform matches the kernel twin."""
    from cow_spark.functions.intmath import log2_fp_py
    from cow_spark.operators.dialogue import role_entropy

    rows = (
        [("c1", i, "user" if i % 2 == 0 else "assistant", "t")
         for i in range(4)]
        + [("c2", 0, "user", "t")]
        + [("c3", i, "assistant", "t") for i in range(5)]
        + [("c4", i, ["user", "assistant", "tool"][i], "t")
           for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    got = {r.conv_id: r for r in role_entropy(df).collect()}
    c1 = got["c1"]
    assert (c1.n_turns, c1.n_roles, c1.majority_ppm) == (4, 2, 500000)
    assert c1.entropy_fp == 1024  # exactly 1 bit
    assert (got["c2"].entropy_fp, got["c2"].majority_ppm) == (0, 1000000)
    assert (got["c3"].entropy_fp, got["c3"].majority_ppm) == (0, 1000000)
    c4 = got["c4"]
    # H = log2fp(3) - floor(3*1*log2fp(1)/3) = log2_fp_py(3)
    assert c4.entropy_fp == log2_fp_py(3)
    assert c4.majority_ppm == 333333


def test_tool_latency_gaps_and_unanswered(spark):
    """Exact integer gaps, unanswered trailing tool turn counted but
    untimed, negative out-of-order gap surfaces in min_us."""
    from cow_spark.operators.dialogue import tool_latency

    rows = [
        ("c1", 0, "user", None, "2024-01-01 00:00:00"),
        ("c1", 1, "tool", "search", "2024-01-01 00:00:05"),
        ("c1", 2, "assistant", None, "2024-01-01 00:00:08"),  # 3 s
        ("c1", 3, "tool", "search", "2024-01-01 00:00:10"),   # trailing
        ("c2", 0, "tool", "calc", "2024-01-01 00:01:00"),
        ("c2", 1, "user", None, "2024-01-01 00:00:59"),       # -1 s
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string,"
              " ts_s string").withColumn("ts", F.to_timestamp("ts_s"))
    got = {r.tool: r for r in tool_latency(df).collect()}
    s = got["search"]
    assert (s.n_calls, s.n_timed, s.mean_us) == (2, 1, 3_000_000)
    assert (s.min_us, s.max_us) == (3_000_000, 3_000_000)
    c = got["calc"]
    assert (c.n_calls, c.n_timed) == (1, 1)
    assert (c.mean_us, c.min_us) == (-1_000_000, -1_000_000)


def test_topic_segments_boundaries(spark):
    """Segment opens on first turn and on every sub-threshold
    transition; empty↔empty stays coherent; segment ids dense per
    conversation and independent across conversations."""
    from cow_spark.operators.dialogue import topic_segments

    rows = [
        ("c1", 0, "the quick brown fox"),
        ("c1", 1, "the quick brown dog"),      # high overlap
        ("c1", 2, "unrelated topic entirely"),  # boundary
        ("c1", 3, ""),                           # vs tokens: jac 0 -> boundary
        ("c1", 4, ""),                           # empty-empty: coherent
        ("c2", 0, "solo"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")
    got = {(r.conv_id, r.turn_idx): r
           for r in topic_segments(df, threshold_ppm=300_000).collect()}
    assert got[("c1", 0)].jac_ppm is None
    assert got[("c1", 0)].segment_start
    assert got[("c1", 0)].segment_id == 0
    assert got[("c1", 1)].segment_id == 0 and not got[("c1", 1)].segment_start
    assert got[("c1", 1)].jac_ppm == 600000  # |∩|=3, |∪|=5
    assert got[("c1", 2)].segment_id == 1 and got[("c1", 2)].segment_start
    assert got[("c1", 3)].segment_id == 2   # text->empty = 0 overlap
    assert got[("c1", 4)].segment_id == 2   # empty<->empty coherent
    assert got[("c1", 4)].jac_ppm == 1_000_000
    assert got[("c2", 0)].segment_id == 0 and got[("c2", 0)].segment_start


def test_tool_ngrams_support(spark):
    """Overlapping occurrences, conversation support, short-conv
    denominator exclusion, min_count filter, n<2 raises."""
    from cow_spark.operators.dialogue import tool_ngrams

    rows = [
        ("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"), ("c1", 3, "b"),
        ("c2", 0, "a"), ("c2", 1, "b"),
        ("c3", 0, "a"),                      # too short for n=2? no: 1 tool
    ]
    df = spark.createDataFrame(
        [(c, t, tool, tool) for c, t, tool in rows],
        "conv_id string, turn_idx int, role string, tool string")
    got = {r.gram: r for r in tool_ngrams(df, n=2).collect()}
    # c3 has no complete bigram -> denominator is 2 conversations
    assert got["a>b"].n == 3 and got["a>b"].n_convs == 2
    assert got["a>b"].support_ppm == 1_000_000
    assert got["b>a"].n == 1 and got["b>a"].n_convs == 1
    assert got["b>a"].support_ppm == 500_000
    tri = {r.gram: r for r in tool_ngrams(df, n=3).collect()}
    assert set(tri) == {"a>b>a", "b>a>b"}
    assert tool_ngrams(df, n=2, min_count=2).count() == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        tool_ngrams(df, n=1)


def test_action_loops_runs(spark):
    """Interleaved non-tool turns don't break runs; min_run filters;
    run coordinates exact; per-conversation independence."""
    from cow_spark.operators.dialogue import action_loops

    rows = [
        ("c1", 0, "search"), ("c1", 1, None), ("c1", 2, "search"),
        ("c1", 3, "search"), ("c1", 4, "calc"), ("c1", 5, "search"),
        ("c2", 0, "calc"), ("c2", 1, "calc"), ("c2", 2, "calc"),
        ("c2", 3, "calc"),
    ]
    df = spark.createDataFrame(
        [(c, t, "assistant", tool) for c, t, tool in rows],
        "conv_id string, turn_idx int, role string, tool string")
    got = {(r.conv_id, r.tool): r
           for r in action_loops(df, min_run=3).collect()}
    assert set(got) == {("c1", "search"), ("c2", "calc")}
    s = got[("c1", "search")]
    assert (s.run_len, s.start_turn, s.end_turn) == (3, 0, 3)
    c = got[("c2", "calc")]
    assert (c.run_len, c.start_turn, c.end_turn) == (4, 0, 3)
    assert action_loops(df, min_run=5).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        action_loops(df, min_run=1)


def test_speech_acts_distribution(spark):
    """Question/command/statement/empty classes, precedence, and
    within-role conditional shares."""
    from cow_spark.operators.dialogue import speech_acts

    rows = [
        ("user", "What time is it"),           # interrogative opener
        ("user", "the train leaves at 9?"),    # terminal ?
        ("user", "the sky is blue."),          # statement
        ("user", "   "),                        # empty after trim
        ("assistant", "Please book the 9am train"),  # command
        ("assistant", "It departs from track 2."),
    ]
    df = spark.createDataFrame(
        [(f"c{i}", 0, r, t) for i, (r, t) in enumerate(rows)],
        "conv_id string, turn_idx int, role string, text string")
    got = {(r.role, r.act): r for r in speech_acts(df).collect()}
    assert got[("user", "question")].n == 2
    assert got[("user", "question")].share_ppm == 500_000
    assert got[("user", "statement")].share_ppm == 250_000
    assert got[("user", "empty")].n == 1
    assert got[("assistant", "command")].share_ppm == 500_000
    assert ("assistant", "question") not in got


def test_render_conversations_template(spark):
    """Turn order via struct sort, NULL text renders empty, custom
    template tokens, n_chars exact."""
    from cow_spark.operators.dialogue import render_conversations

    df = spark.createDataFrame(
        [("c1", 1, "assistant", "hi there"),
         ("c1", 0, "user", "hello"),
         ("c1", 2, "user", None),
         ("c2", 0, "user", "solo")],
        "conv_id string, turn_idx int, role string, text string")
    got = {r.conv_id: r for r in render_conversations(df).collect()}
    assert got["c1"].rendered == "user: hello\nassistant: hi there\nuser: "
    assert got["c1"].n_turns == 3
    assert got["c1"].n_chars == len(got["c1"].rendered)
    custom = {r.conv_id: r.rendered for r in render_conversations(
        df, sep=" | ", line_fmt="<{role}>{text}</{role}>").collect()}
    assert custom["c2"] == "<user>solo</user>"


def test_conversation_outcome_labels(spark):
    """resolved/error/abandoned/open with error-over-resolved
    precedence scoped to the closing two turns."""
    from cow_spark.operators.dialogue import conversation_outcome

    rows = [
        ("c1", 0, "user", "book it"),
        ("c1", 1, "assistant", "Done, confirmed."),
        ("c2", 0, "user", "run it"),
        ("c2", 1, "assistant", "error: failed"),
        ("c2", 2, "user", "thanks anyway"),
        ("c3", 0, "assistant", "hello"),
        ("c3", 1, "user", "are you there"),
        ("c4", 0, "user", "hm"),
        ("c4", 1, "assistant", "let me check that for you"),
        ("c5", 0, "user", "it crashed with an error"),   # early error
        ("c5", 1, "assistant", "try again"),
        ("c5", 2, "assistant", "any luck"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    got = {r.conv_id: r for r in conversation_outcome(df).collect()}
    assert got["c1"].outcome == "resolved"
    assert got["c2"].outcome == "error"        # precedence over thanks
    assert got["c3"].outcome == "abandoned"
    assert got["c3"].last_role == "user"
    assert got["c4"].outcome == "open"
    assert got["c5"].outcome == "open"         # error outside last two


def test_turn_gaps_profile(spark):
    """Per role-pair exact micros, negative out-of-order gaps surface
    in min_us, first turns excluded."""
    import datetime as dt
    from cow_spark.operators.dialogue import turn_gaps

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", t0),
        ("c1", 1, "assistant", t0 + dt.timedelta(seconds=2)),
        ("c1", 2, "user", t0 + dt.timedelta(seconds=5)),
        ("c1", 3, "assistant", t0 + dt.timedelta(seconds=1)),  # ooo
        ("c2", 0, "user", t0),
        ("c2", 1, "assistant", t0 + dt.timedelta(seconds=4)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp")
    got = {(r.prev_role, r.role): r for r in turn_gaps(df).collect()}
    ua = got[("user", "assistant")]
    assert (ua.n, ua.mean_us) == (3, (2_000_000 + 4_000_000 - 4_000_000) // 3)
    assert ua.min_us == -4_000_000
    assert ua.max_us == 4_000_000
    assert got[("assistant", "user")].n == 1


def test_bradley_terry_matches_python_twin_and_orders(spark):
    """The int64 MM iterate equals the serial twin bit-for-bit;
    a player who beats everyone outranks everyone; NULL and
    self-matches drop."""
    from cow_spark.operators.dialogue import (bradley_terry,
                                              bradley_terry_py)

    matches = ([("champ", "b")] * 3 + [("champ", "c")] * 3
               + [("b", "c"), ("c", "b"), ("b", "c")]
               + [("champ", None), (None, "b"), ("c", "c")])
    df = spark.createDataFrame(matches, "winner string, loser string")
    got = {r.player: (r.rating_fp, r.wins, r.n_matches)
           for r in bradley_terry(df, rounds=8).collect()}
    assert got == bradley_terry_py(matches, rounds=8)
    ratings = {p: v[0] for p, v in got.items()}
    assert ratings["champ"] > ratings["b"] > ratings["c"]
    # wins/match bookkeeping excludes the dropped rows
    assert got["champ"][1:] == (6, 6)
    assert got["b"][1:] == (2, 9 - 3)


def test_bradley_terry_symmetric_round_robin_is_flat(spark):
    """A perfectly balanced tournament (everyone 1-1 against everyone)
    converges to equal ratings — the normalizer's gauge."""
    from cow_spark.operators.dialogue import bradley_terry

    ps = ["a", "b", "c", "d"]
    matches = [(x, y) for x in ps for y in ps if x != y]
    df = spark.createDataFrame(matches, "winner string, loser string")
    rows = bradley_terry(df, rounds=6).collect()
    assert len({r.rating_fp for r in rows}) == 1
    assert all(r.wins == 3 and r.n_matches == 6 for r in rows)


def test_bradley_terry_empty_and_validation(spark):
    from cow_spark.operators.dialogue import bradley_terry
    import pytest

    e = spark.createDataFrame([], "winner string, loser string")
    assert bradley_terry(e, rounds=2).collect() == []
    with pytest.raises(ValueError):
        bradley_terry(e, rounds=0)
