"""KG summary statistics — the profile a data engineer pulls before
querying an unfamiliar graph (the reference offers nothing here; its
users run SPARQL aggregations in a store).

One partial-aggregated pass: per predicate, triple count, distinct
subjects/objects, and the literal share. At 100 TB the output is
vocabulary-sized (one row per predicate), so the shuffle carries
per-partition partials only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kg_statistics(quads: DataFrame, approx: bool = False) -> DataFrame:
    """(p, n_triples, n_subjects, n_objects, n_literals) per predicate.

    ``approx=True`` swaps the two exact distincts for HyperLogLog
    sketches (``approx_count_distinct``): two exact distincts in one
    aggregate compile to an Expand that doubles the shuffled rows —
    at the 100 TB scale a ±2% cardinality profile is the right trade,
    so that is the mode a production profile job should run. Exact
    stays the default because the DuckDB oracle replays it bit-for-bit.
    """
    cd = F.approx_count_distinct if approx else F.countDistinct
    return quads.groupBy("p").agg(
        F.count("*").alias("n_triples"),
        cd("s").alias("n_subjects"),
        cd("o_lex").alias("n_objects"),
        F.sum((F.col("o_kind") == "lit").cast("long")).alias("n_literals"),
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile of a transcript table — the batch twin
    of the streaming sessionizer's summary (turn/char counts, role mix,
    tool usage, event-time span). One partial-aggregated groupBy; at
    10^12 turns the shuffle carries per-partition partials keyed by
    conv_id (the table's natural bucketing key, so co-located layouts
    shuffle nothing)."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))
              ).alias("n_chars"),
        F.countDistinct("role").alias("n_roles"),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def column_profile(
    df: DataFrame,
    col: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """One-row distribution profile of a numeric column: count, min,
    max, floor(mean), and discrete percentiles — the corpus-audit view
    (doc length / token count distributions drive packing and filter
    thresholds).

    ``approx=False`` uses SQL-standard ``percentile_disc`` (an exact
    order statistic — integer in, integer out, no interpolation, so the
    DuckDB oracle replays it bit-for-bit). Exact percentiles buffer the
    group's values, so this is the AUDIT mode; at full corpus scale run
    ``approx=True`` (t-digest ``approx_percentile``, bounded memory,
    ±accuracy) — the same exact/approx split as
    :func:`kg_statistics`'s HLL mode.
    """
    c = F.col(col)
    aggs = [
        F.count(c).alias("n"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.floor(F.avg(c)).cast("long").alias("mean_floor"),
    ]
    for p in percentiles:
        # round, not int(): 0.29*100 is 28.999… in binary floats and
        # would truncate to the wrong label
        name = f"p{round(p * 100)}"
        if approx:
            aggs.append(F.percentile_approx(c, p).alias(name))
        else:
            # backtick the identifier — F.col handles odd names for the
            # other aggregates, the SQL string must do the same
            aggs.append(F.expr(
                f"percentile_disc({p}) within group (order by `{col}`)"
            ).alias(name))
    return df.agg(*aggs)
