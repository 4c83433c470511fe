"""Batch sessionization — gap-based session ids over an event log, the
batch twin of ``streaming/stream.py:stream_conversation_sessions``
(same rule: events more than ``gap_us`` apart in event time start a new
session; the streaming side additionally needs the watermark to decide
when a split is FINAL, a concern batch doesn't have because the whole
timeline is present).

Gaps-and-islands in two windows over ONE sort: lag() marks the
session-opening events, a running sum of those marks numbers the
sessions. Both windows share (partition key, ordering), so Catalyst
plans a single Exchange + Sort — the same one-keyed-shuffle bound as
any per-key window, and the sort is the event table's natural layout
(a bucketed/sorted source shuffles nothing). Skew bound: a hot key's
timeline sorts on one task, like every keyed-window operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    order_col: str | None = None,
) -> DataFrame:
    """Append ``session_id`` (1-based, per key, in time order): a new
    session starts at the first event of the key and at every event
    more than ``gap_us`` after its predecessor. ``order_col`` breaks
    equal-timestamp ties deterministically (required when they can
    occur; events at the same instant always share a session either
    way — the tiebreak only pins predecessor identity).
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_us = F.unix_micros(F.lag(ts_col, 1).over(w).cast("timestamp"))
    opens = (
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp")) - prev_us
           > F.lit(int(gap_us)))
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(opens.cast("long")).over(running))


def session_summary(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    order_col: str | None = None,
) -> DataFrame:
    """Per-session profile (key, session_id, n_events, first/last ts,
    duration): :func:`sessionize` then one partial-aggregated groupBy —
    the session table a funnel/engagement job starts from."""
    return (
        sessionize(df, key, ts_col, gap_us, order_col)
        .groupBy(key, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            (F.unix_micros(F.max(ts_col).cast("timestamp"))
             - F.unix_micros(F.min(ts_col).cast("timestamp"))
             ).cast("long").alias("dur_us"),
        )
    )
