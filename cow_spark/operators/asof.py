"""As-of (temporal) join — pair each left row with the LATEST right row
at-or-before its timestamp, per key. The last-touch-attribution /
state-at-time-of-event primitive every event-log pipeline needs; the
reference has no analogue (its model is row-at-a-time CSV), and Spark
has no ASOF JOIN operator (DuckDB and pandas do).

Why not a range join: ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` plus
an argmax plans as an exploding theta join — every left row matches its
key's entire right history (quadratic within a key), then a window
throws almost all of it away. At 10^12 events that is the dominant cost
of the job.

This implementation is the scalable shape: tag both sides, union, ONE
shuffle on the key, and a running last-non-null window over the merged
timeline. Cost is a sort-merge on (key, ts) — identical to any keyed
window aggregation, independent of right-side density, and the sort is
exactly the table's natural layout, so a bucketed/sorted source shuffles
nothing. Skewed keys behave like any window partition (AQE cannot split
a window partition; a hot key's timeline sorts on one task — the same
bound DuckDB's single-key ASOF scan has).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    right_order: str | None = None,
    tolerance_us: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` on the same ``on`` key (inclusive: a right
    row AT the left row's timestamp matches).

    ``right_cols``: right columns to carry (default: all but the key
    and timestamp). They appear on the output as ``{prefix}{col}``,
    plus ``{prefix}ts`` (the matched row's timestamp); all NULL when no
    right row precedes the left row.

    ``right_order``: deterministic tiebreak among right rows sharing
    (key, ts) — the row with the greatest value wins. Required when
    such ties are possible; defaults to the first carried column.

    ``tolerance_us``: maximum lookback in microseconds — a match older
    than ``left.ts - tolerance_us`` is discarded (NULLs, like no
    match). The C4-style "state expires" guard.

    Semantics twin: ``ASOF JOIN`` in DuckDB/pandas ``merge_asof``
    (direction='backward', allow_exact_matches=True).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    if right_order is None:
        right_order = right_cols[0] if right_cols else ts_col

    # The matched-row payload travels as ONE struct so every carried
    # column comes from the same right row (per-column running-last
    # could mix rows if carried columns were independently NULL).
    rpayload = F.struct(
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    rtype = right.select(rpayload.alias("_r")).schema["_r"].dataType

    # _ord stays in right_order's NATIVE type: casting to long would
    # abort under Spark 4 ANSI mode the moment the tiebreak column is a
    # non-numeric string (the default right_order is the first carried
    # column, commonly a string payload). "Greatest wins" means greatest
    # in the column's natural ordering; left rows carry NULL (they never
    # compete — _side already separates them).
    ordtype = right.schema[right_order].dataType
    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(ordtype).alias("_ord"),
        F.lit(None).cast(rtype).alias("_rrow"),
    )
    r2 = right.select(
        *[
            F.col(c) if c in (on, ts_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        F.col(right_order).alias("_ord"),
        rpayload.alias("_rrow"),
    )

    # Merged per-key timeline. Right rows sort BEFORE left rows at an
    # equal timestamp (_side 0 < 1) — that one bit is the inclusive
    # at-or-before semantics; _ord makes same-(key,ts) right rows
    # deterministic (greatest right_order wins, it sorts last).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"),
                 F.col("_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rrow", ignorenulls=True).over(w)
    if tolerance_us is not None:
        fresh = (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(matched["_rts"].cast("timestamp"))
        ) <= F.lit(int(tolerance_us))
        matched = F.when(fresh, matched)

    return (
        l2.unionByName(r2)
        .withColumn("_m", matched)
        .where(F.col("_side") == 1)
        .select(
            *lcols,
            F.col("_m")["_rts"].alias(f"{prefix}ts"),
            *[F.col("_m")[c].alias(f"{prefix}{c}") for c in right_cols],
        )
    )
