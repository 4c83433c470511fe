"""as-of join semantics: backward match, inclusive equal-ts, tie
determinism, tolerance expiry, no-match NULLs — and the plan shape
(one keyed shuffle, never a range/nested-loop join)."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.asof import asof_join  # noqa: E402


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),   # after r10 and r10b -> tie, max order
            (2, "u1", _ts(5)),    # exactly AT r5 -> inclusive
            (3, "u1", _ts(1)),    # before any right row -> NULL
            (4, "u2", _ts(50)),   # only match is 45 min old
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 100),
            ("u1", _ts(8), 200),   # same ts as the next row
            ("u1", _ts(8), 201),   # greater right_order -> must win
            ("u2", _ts(5), 300),
        ],
        "user_id string, ts timestamp, view_id long",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", right_cols=["view_id"],
                    right_order="view_id")
    got = {r["event_id"]: r["asof_view_id"] for r in out.collect()}
    assert got == {1: 201, 2: 100, 3: None, 4: 300}


def test_asof_tolerance_expires_old_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", right_cols=["view_id"],
                    right_order="view_id",
                    tolerance_us=10 * 60 * 1_000_000)  # 10 min
    got = {r["event_id"]: r["asof_view_id"] for r in out.collect()}
    # u2's only view is 45 min stale -> dropped; u1 matches unchanged
    assert got == {1: 201, 2: 100, 3: None, 4: None}
    # the matched timestamp expires with it (whole struct, not per-col)
    row4 = {r["event_id"]: r["asof_ts"] for r in out.collect()}
    assert row4[4] is None


def test_asof_string_order_column(spark):
    """ADVICE r2: a non-numeric string right_order (the default is the
    first carried column, commonly a string payload) must not hit an
    ANSI cast-to-long abort; ties resolve by the column's natural
    ordering (greatest wins)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(5), "bronze"),
         ("u1", _ts(8), "gold"),     # same ts as next; "silver" > "gold"
         ("u1", _ts(8), "silver")],
        "user_id string, ts timestamp, state string",
    )
    # explicit string order column AND the implicit default (first
    # carried column) both exercise the string path
    for kwargs in ({"right_order": "state"}, {}):
        out = asof_join(left, right, on="user_id", right_cols=["state"],
                        **kwargs)
        got = {r["event_id"]: r["asof_state"] for r in out.collect()}
        assert got == {1: "silver"}


def test_asof_plan_is_one_keyed_shuffle(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", right_cols=["view_id"],
                    right_order="view_id")
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct",
                "SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan, f"range-join shape leaked in: {bad}"
    import re
    # formatted mode lists every node twice (tree + details); count the
    # detail headers ("(6) Exchange") for the true node count
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
