"""Batch sessionization: gap splits, per-key numbering, equal-ts
cohesion, and the one-keyed-shuffle plan bound."""

import datetime as dt
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.sessionize import session_summary, sessionize  # noqa: E402


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _events(spark):
    return spark.createDataFrame(
        [
            ("u1", 1, _ts(0)),
            ("u1", 2, _ts(10)),    # 10 min gap -> same session
            ("u1", 3, _ts(50)),    # 40 min gap -> new session
            ("u1", 4, _ts(50)),    # same instant -> same session
            ("u2", 5, _ts(0)),     # numbering is per key
        ],
        "user_id string, event_id long, ts timestamp",
    )


def test_sessionize_gap_splits(spark):
    out = sessionize(_events(spark), gap_us=30 * 60 * 1_000_000,
                     order_col="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_session_summary(spark):
    out = session_summary(_events(spark), gap_us=30 * 60 * 1_000_000,
                          order_col="event_id")
    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["dur_us"])
           for r in out.collect()}
    assert got == {
        ("u1", 1): (2, 600_000_000),
        ("u1", 2): (2, 0),
        ("u2", 1): (1, 0),
    }


def test_sessionize_plan_one_shuffle(spark):
    out = session_summary(_events(spark), order_col="event_id")
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # two Exchanges total: the (key) window sort and the per-session
    # partial-aggregated groupBy; both windows share ONE sort
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1, plan


def test_funnel_semantics(spark):
    """Funnel: step order enforced, repeated steps don't double-count,
    the horizon caps later steps relative to step one, and users off
    the funnel report stage 0."""
    from cow_spark.operators.sessionize import funnel

    rows = [
        # u1: clean view -> click -> purchase
        ("u1", "view", _ts(0)), ("u1", "click", _ts(1)),
        ("u1", "purchase", _ts(2)),
        # u2: click BEFORE view never counts; no click after the view
        ("u2", "click", _ts(0)), ("u2", "view", _ts(1)),
        ("u2", "purchase", _ts(2)),   # purchase without click: stage 1
        # u3: view only
        ("u3", "view", _ts(5)),
        # u4: purchase then error events only -> stage 0
        ("u4", "purchase", _ts(0)), ("u4", "error", _ts(1)),
        # u5: slow click outside a 10-minute horizon
        ("u5", "view", _ts(0)), ("u5", "click", _ts(20)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")

    got = {r.user: (r.stage_reached, r.t_first_us, r.t_last_us)
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    us = lambda m: int(_ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got["u1"] == (3, us(0), us(2))
    assert got["u2"] == (1, us(1), us(1))
    assert got["u3"] == (1, us(5), us(5))
    assert got["u4"] == (0, None, None)
    assert got["u5"][0] == 2  # no horizon: slow click still counts

    capped = {r.user: r.stage_reached
              for r in funnel(df, ["view", "click", "purchase"],
                              horizon_s=600).collect()}
    assert capped["u5"] == 1  # 20-minute click outside the horizon
    assert capped["u1"] == 3  # fast path unaffected


def test_retention_cohort_triangle(spark):
    """Retention: cohorts anchor on first activity, offsets count whole
    periods, re-activity within one period counts once, offsets beyond
    max_periods drop."""
    from cow_spark.operators.sessionize import retention

    rows = [
        # u1: first week W0, active W0 twice (counts once) and W2
        ("u1", _ts(0)), ("u1", _ts(30)),
        ("u1", dt.datetime(2024, 1, 15, 0, 0)),   # W2 (Jan 1 is a Monday)
        # u2: first W0 only
        ("u2", _ts(1)),
        # u3: first W1
        ("u3", dt.datetime(2024, 1, 10, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {(r.cohort.isoformat(), r.period_offset): r.n_users
           for r in retention(df, period="week", max_periods=4).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # u1, u2
        ("2024-01-01", 2): 1,   # u1 back in week 2
        ("2024-01-08", 0): 1,   # u3's own cohort
    }

    # beyond max_periods: dropped
    far = spark.createDataFrame(
        rows + [("u2", dt.datetime(2024, 6, 1, 0, 0))],
        "user_id string, ts timestamp")
    got2 = {(r.cohort, r.period_offset)
            for r in retention(far, period="week", max_periods=4).collect()}
    assert all(off <= 4 for _, off in got2)


# ---------------------------------------------------------------------------
# rolling anomaly detection
# ---------------------------------------------------------------------------


def _anomaly_py(rows, window=20, min_prev=5, k=3, scale=1000):
    import math
    out = {}
    by_key: dict = {}
    for eid, key, ts, val in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        hist = by_key.setdefault(key, [])
        prev = hist[-window:]
        n, s1 = len(prev), sum(prev)
        s2 = sum(x * x for x in prev)
        v = math.floor(val * scale)
        dev = v * n - s1
        flag = 1 if (n >= min_prev and dev * dev > k * k * (n * s2 - s1 * s1)) else 0
        out[eid] = flag
        hist.append(v)
    return out


def test_rolling_anomaly_matches_python_twin(spark):
    from datetime import datetime, timedelta

    from cow_spark.operators.sessionize import rolling_anomaly

    t0 = datetime(2026, 1, 1)
    rows = [(i, f"u{i % 3}", t0 + timedelta(minutes=i),
             float((i * 37) % 50) / 7.0) for i in range(120)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double")
    got = {r["event_id"]: r["is_anomaly"]
           for r in rolling_anomaly(df).collect()}
    assert got == _anomaly_py(rows)


def test_rolling_anomaly_flags_planted_spike_only(spark):
    from datetime import datetime, timedelta

    from cow_spark.operators.sessionize import rolling_anomaly

    t0 = datetime(2026, 1, 1)
    # steady noise around 10 with one 100x spike at i=30
    rows = [(i, "u", t0 + timedelta(seconds=i),
             1000.0 if i == 30 else 10.0 + (i % 3) * 0.1)
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double")
    flagged = {r["event_id"] for r in rolling_anomaly(df).collect()
               if r["is_anomaly"] == 1}
    assert 30 in flagged
    # no false alarms in the steady region (events after the spike may
    # legitimately deviate while the spike sits in their window)
    assert not (flagged - set(range(30, 51)))
    # cold start: first min_prev events can never be flagged
    assert not (flagged & set(range(5)))


def test_rolling_anomaly_single_shuffle(spark):
    from datetime import datetime

    from cow_spark.operators.sessionize import rolling_anomaly

    df = spark.createDataFrame(
        [(1, "u", datetime(2026, 1, 1), 1.0)],
        "event_id long, user_id string, ts timestamp, value double")
    out = rolling_anomaly(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# gap_fill
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402


def test_gap_fill_zero_fills_cumsums_and_ffills(spark):
    from cow_spark.operators.sessionize import gap_fill

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", 5),
         (1, "2024-01-01 00:50:00", 7),   # same bucket as above
         (1, "2024-01-01 03:20:00", 2),   # two-gap jump
         (2, "2024-01-01 01:00:00", 9)],  # single-bucket user
        "user_id long, ts string, v long"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {(r["user_id"], r["bucket"]): r for r in gap_fill(
        ev, key="user_id", ts_col="ts", value_col="v").collect()}
    base = 473352  # 2024-01-01 00:00 UTC in epoch hours
    u1 = [out[(1, base + i)] for i in range(4)]
    assert [r["n_events"] for r in u1] == [2, 0, 0, 1]
    assert [r["cum_events"] for r in u1] == [2, 2, 2, 3]
    # bucket max then forward fill across the gap
    assert [r["last_val"] for r in u1] == [7, 7, 7, 2]
    assert (2, base + 1) in out and len(out) == 5


def test_gap_fill_span_guard_raises(spark):
    import pytest as _pt

    from cow_spark.operators.sessionize import gap_fill

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2030-01-01 00:00:00")],
        "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    with _pt.raises(ValueError, match="spans more than"):
        gap_fill(ev, key="user_id", ts_col="ts",
                 max_buckets_per_key=1000)
    # widening the bucket brings it under the cap
    assert gap_fill(ev, key="user_id", ts_col="ts",
                    bucket_us=365 * 24 * 3_600 * 1_000_000).count() >= 6


def test_mann_kendall_hand_values(spark):
    """Strictly increasing series: S = C(n,2), slope exact; tied x
    values reduce var18 by t(t-1)(2t+5); a single point and an
    all-equal-timestamp series report n_pairs=0 / NULL slope."""
    from cow_spark.operators.sessionize import mann_kendall

    rows = ([("a", t, 10 + 3 * t) for t in range(6)]
            + [("b", 0, 9), ("b", 1, 9), ("b", 2, 7), ("b", 3, 5),
               ("b", 4, 5)]
            + [("c", 10, 1)]
            + [("d", 5, 1), ("d", 5, 2), ("d", 5, 3)])
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {r.key: r for r in mann_kendall(df, "k", "t", "x").collect()}
    a = got["a"]
    assert (a.n, a.n_pairs, a.s_stat) == (6, 15, 15)
    assert a.var18 == 6 * 5 * 17 and a.sen_slope_ppm == 3_000_000
    b = got["b"]
    # two tie groups of 2: var18 = 5*4*15 - 2*(2*1*9) = 264
    assert b.var18 == 264 and b.s_stat == -8
    # negative slope floors toward -inf (pmod floor): median of the
    # 10 pairwise slopes, lower middle
    assert b.sen_slope_ppm == -1_333_334
    assert (got["c"].n_pairs, got["c"].sen_slope_ppm) == (0, None)
    assert (got["d"].n_pairs, got["d"].s_stat) == (0, 0)


def test_mann_kendall_brute_force_twin(spark):
    """S, pair count, and the exact lower-middle Sen median agree
    with a brute-force Python enumeration on an awkward series."""
    from cow_spark.operators.sessionize import mann_kendall

    series = [(0, 5), (2, -1), (3, -1), (7, 12), (8, 0), (13, 12)]
    rows = [("k", t, x) for t, x in series]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = mann_kendall(df, "k", "t", "x").collect()[0]
    pairs = [(series[i], series[j])
             for i in range(len(series)) for j in range(len(series))
             if series[i][0] < series[j][0]]
    s = sum((xj > xi) - (xj < xi) for (_, xi), (_, xj) in pairs)
    slopes = sorted(((xj - xi) * 1_000_000) // (tj - ti)
                    for (ti, xi), (tj, xj) in pairs)
    med = slopes[((len(slopes) - 1) * 500_000) // 1_000_000]
    assert (r.n_pairs, r.s_stat, r.sen_slope_ppm) == (len(pairs), s, med)


def test_holt_forecast_linear_fixed_point_and_edges(spark):
    """On exactly linear data the integer Holt iterate sits at its
    fixed point (level = last value, trend = slope) for ANY α/β —
    positive and negative slopes; n=1 and n=2 seed paths pinned;
    alpha validation raises."""
    import pytest
    from cow_spark.operators.sessionize import holt_forecast

    rows = ([("up", t, 100 + 10 * t) for t in range(12)]
            + [("down", t, 500 - 25 * t) for t in range(10)]
            + [("one", 0, 42)]
            + [("two", 0, 7), ("two", 1, 9)])
    df = spark.createDataFrame(rows, "k string, o long, x long")
    d = {r.key: r for r in
         holt_forecast(df, "k", "o", "x", horizon=2).collect()}
    assert (d["up"].level, d["up"].trend, d["up"].forecast) \
        == (210, 10, 230)
    assert (d["down"].level, d["down"].trend) == (275, -25)
    assert (d["one"].level, d["one"].trend, d["one"].forecast) \
        == (42, 0, 42)
    assert (d["two"].level, d["two"].trend) == (9, 2)
    with pytest.raises(ValueError):
        holt_forecast(df, "k", "o", "x", alpha_ppm=2_000_000)
