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
