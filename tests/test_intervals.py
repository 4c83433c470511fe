"""Interval operators: SCD2 intervalize semantics, binned interval-join
exactness (vs a brute-force range join), guard behavior, and the
no-theta-join plan bound."""

import datetime as dt
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cow_spark.operators.intervals import interval_join, intervalize  # noqa: E402


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_intervalize_scd2(spark):
    upd = spark.createDataFrame(
        [("u1", 1, _ts(0), "a"), ("u1", 2, _ts(10), "b"),
         ("u1", 3, _ts(10), "c"),   # same-instant: zero-length interval
         ("u2", 4, _ts(5), "x")],
        "user_id string, event_id long, ts timestamp, state string",
    )
    out = intervalize(upd, order_col="event_id")
    got = {r["event_id"]: (r["valid_from"], r["valid_to"])
           for r in out.collect()}
    assert got[1] == (_ts(0), _ts(10))
    assert got[2] == (_ts(10), _ts(10))   # closed immediately
    assert got[3] == (_ts(10), None)      # open/current row
    assert got[4] == (_ts(5), None)


def _points(spark):
    return spark.createDataFrame(
        [("u1", 10, _ts(0)),        # at lo -> inclusive
         ("u1", 11, _ts(15)),       # inside two overlapping intervals
         ("u1", 12, _ts(30)),       # at hi -> exclusive
         ("u2", 13, _ts(15))],      # other key, no interval
        "user_id string, point_id long, ts timestamp",
    )


def _ivs(spark):
    return spark.createDataFrame(
        [("u1", 100, _ts(0), _ts(30)),
         ("u1", 101, _ts(14), _ts(16)),
         ("u1", 102, _ts(40), _ts(40)),    # empty -> never matches
         ("u2", 103, _ts(20), _ts(25))],
        "user_id string, iv_id long, lo timestamp, hi timestamp",
    )


def test_interval_join_semantics(spark):
    out = interval_join(_points(spark), _ivs(spark), "lo", "hi",
                        on="user_id", bin_us=60_000_000)  # 1 min bins
    got = sorted((r["point_id"], r["iv_iv_id"]) for r in out.collect())
    assert got == [(10, 100), (11, 100), (11, 101)]


def test_interval_join_matches_bruteforce(spark):
    """Binning is an optimization only: result set == naive range join,
    across bin sizes straddling / exceeding the interval lengths."""
    p, iv = _points(spark), _ivs(spark)
    naive = sorted(
        p.join(iv, on="user_id")
        .where((F.col("lo") <= F.col("ts")) & (F.col("ts") < F.col("hi")))
        .select("point_id", "iv_id").collect())
    for bin_us in (1_000_000, 60_000_000, 3_600_000_000):
        got = sorted(
            interval_join(p, iv, "lo", "hi", on="user_id", bin_us=bin_us)
            .select("point_id", F.col("iv_iv_id").alias("iv_id")).collect())
        assert got == naive, bin_us


def test_interval_join_guard_drops_long_and_open(spark):
    iv = spark.createDataFrame(
        [("u1", 1, _ts(0), _ts(50)),     # 50 bins > cap
         ("u1", 2, _ts(0), None),        # open
         ("u1", 3, _ts(14), _ts(16))],
        "user_id string, iv_id long, lo timestamp, hi timestamp",
    )
    out = interval_join(_points(spark), iv, "lo", "hi", on="user_id",
                        bin_us=60_000_000, max_bins_per_interval=10,
                        audit_drops=True)
    assert sorted((r["point_id"], r["iv_iv_id"]) for r in out.collect()) \
        == [(11, 3)]
    # cap=None with an open interval present: +infinity cannot be
    # binned and nothing bounds the fan-out — must raise, not silently
    # drop the open rows (ADVICE r2: the old emptiness filter swallowed
    # them before the guard ran)
    import pytest
    with pytest.raises(ValueError, match="open intervals"):
        interval_join(_points(spark), iv, "lo", "hi", on="user_id",
                      bin_us=60_000_000, max_bins_per_interval=None)
    # close the open interval -> cap=None keeps the long interval
    closed = iv.withColumn("hi", F.coalesce(F.col("hi"), F.lit(_ts(59))))
    out2 = interval_join(_points(spark), closed, "lo", "hi", on="user_id",
                         bin_us=60_000_000, max_bins_per_interval=None)
    assert sorted((r["point_id"], r["iv_iv_id"]) for r in out2.collect()) \
        == [(10, 1), (10, 2), (11, 1), (11, 2), (11, 3), (12, 1), (12, 2)]


def test_interval_join_plan_is_equijoin(spark):
    """The join must plan as an equi-join on (key, bin) — never a
    BroadcastNestedLoop / cartesian theta join."""
    out = interval_join(_points(spark), _ivs(spark), "lo", "hi",
                        on="user_id", bin_us=60_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
