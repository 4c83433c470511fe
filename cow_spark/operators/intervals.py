"""Interval operators over event logs — the two temporal primitives
that complement :mod:`cow_spark.operators.asof`:

- :func:`intervalize` — SCD2 history build: an update log (key, ts,
  state...) becomes validity intervals ``[valid_from, valid_to)`` via
  one lead() window (one keyed shuffle, the same sort as sessionize).
- :func:`interval_join` — point-in-interval join WITHOUT the
  quadratic theta join. ``p JOIN i ON p.k = i.k AND i.lo <= p.ts AND
  p.ts < i.hi`` plans as BroadcastNestedLoop / exploding sort-merge:
  every point meets every interval of its key before the range filter
  prunes. At 10^12 events that is the job. The scalable shape is
  BINNING (the classic range-join optimization, same idea as
  Databricks' rangeJoin binSize hint and Flink's interval join):
  quantize time into fixed bins, explode each interval into the bins
  it overlaps, map each point to its single bin, equi-join on
  (key, bin), then apply the exact range residual. Each qualifying
  (point, interval) pair meets in EXACTLY one bin — the point's own —
  so the join needs no post-dedup; cost is one hash/sort-merge
  equi-join sized by interval_len/bin_us, chosen by the caller to
  match the data's interval scale.

The reference has no temporal model at all (row-at-a-time CSV); these
are north-star extension operators (SURVEY.md §2.9).
"""

from __future__ import annotations

import logging
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def intervalize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """SCD2: each update row becomes the state valid on
    ``[valid_from, valid_to)`` — ``valid_from`` its own timestamp,
    ``valid_to`` the NEXT update's timestamp for the key (NULL on the
    current/open row). One lead() window = one keyed shuffle; zero-
    length intervals (two updates at the same instant) are kept — the
    earlier one is closed immediately, ``order_col`` decides which of
    the equal-timestamp updates is "later" (required when ties can
    occur).
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col, 1).over(w))
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    on: str | None = None,
    ts_col: str = "ts",
    bin_us: int = 3_600_000_000,
    interval_cols: Sequence[str] | None = None,
    prefix: str = "iv_",
    max_bins_per_interval: int = 10_000,
    audit_drops: bool = False,
) -> DataFrame:
    """Inner-join each point to every interval with
    ``lo <= point.ts < hi`` (and equal ``on`` key when given),
    many-to-many. Interval columns are carried as ``{prefix}{col}``.

    ``bin_us`` sizes the time quantum: an interval explodes into
    ``ceil(len/bin_us)+1`` join rows, so pick it near the TYPICAL
    interval length (1h default). Intervals longer than
    ``max_bins_per_interval * bin_us`` are dropped — the same
    log-and-drop guard as the LSH ``bucket_cap`` (dedup.py): one
    open-ended year-long interval must not fan out into 10^5 rows
    silently (``audit_drops=True`` counts and warns, at the cost of
    one extra pass over the intervals table). NULL ``hi`` (open
    intervals from :func:`intervalize`) cannot be binned: the guard
    log-and-drops them like over-long intervals; with
    ``max_bins_per_interval=None`` they raise ``ValueError`` instead
    (nothing would bound the fan-out). Close open intervals first
    (e.g. ``coalesce(valid_to, now)``).

    Exactly-once pairing: the point contributes its single bin; the
    interval contributes every bin it overlaps; they can only meet in
    the point's bin, so the equi-join emits each qualifying pair once.
    """
    if interval_cols is None:
        interval_cols = [
            c for c in intervals.columns
            if c not in (on, lo_col, hi_col)
        ]

    lo_us = F.unix_micros(F.col(lo_col).cast("timestamp"))
    hi_us = F.unix_micros(F.col(hi_col).cast("timestamp"))
    lo_bin = F.floor(lo_us / bin_us)
    # [lo, hi): the last covered instant is hi-1; empty/negative
    # intervals produce an empty sequence via the filter below
    hi_bin = F.floor((hi_us - 1) / bin_us)
    n_bins = hi_bin - lo_bin + 1

    # NULL hi (open intervals) is handled on the RAW table — the
    # `hi_us > lo_us` emptiness filter below evaluates to NULL on them
    # and would silently swallow them before any guard or audit ran.
    null_hi = F.col(hi_col).isNull()
    if max_bins_per_interval is None:
        # +infinity cannot be binned, and with the guard disabled
        # nothing bounds the fan-out — fail loudly instead of losing
        # the rows. One early-exit existence probe over the (usually
        # dimension-sized) intervals table.
        if not intervals.where(null_hi).isEmpty():
            raise ValueError(
                f"interval_join: NULL {hi_col} (open intervals) cannot "
                "be binned; close them first (e.g. coalesce(valid_to, "
                "now)) or set max_bins_per_interval to log-and-drop "
                "them")
    elif audit_drops:
        # opt-in: one extra pass over the raw intervals table (BEFORE
        # the emptiness filter, so NULL-hi rows are counted too); the
        # default path adds zero jobs
        n_dropped = intervals.where(
            null_hi
            | ((hi_us > lo_us) & (n_bins > max_bins_per_interval))
        ).count()
        if n_dropped:
            log.warning(
                "interval_join: dropping %d open or >%d-bin intervals "
                "(bin_us=%d) — raise bin_us or close open intervals",
                n_dropped, max_bins_per_interval, bin_us)
    iv = intervals.where(~null_hi & (hi_us > lo_us))
    if max_bins_per_interval is not None:
        iv = iv.where(n_bins <= max_bins_per_interval)

    iv_b = iv.select(
        *([F.col(on)] if on else []),
        F.col(lo_col).alias("_lo"),
        F.col(hi_col).alias("_hi"),
        *[F.col(c).alias(f"{prefix}{c}") for c in interval_cols],
        F.explode(F.sequence(lo_bin, hi_bin)).alias("_bin"),
    )
    p_b = points.withColumn(
        "_bin", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                        / bin_us))

    keys = ([on] if on else []) + ["_bin"]
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        p_b.join(iv_b, on=keys)
        .where((F.unix_micros(F.col("_lo").cast("timestamp")) <= ts_us)
               & (ts_us < F.unix_micros(F.col("_hi").cast("timestamp"))))
        .withColumn(f"{prefix}lo", F.col("_lo"))
        .withColumn(f"{prefix}hi", F.col("_hi"))
        .drop("_bin", "_lo", "_hi")
    )


ALLEN_RELATIONS = (
    "equals", "starts", "started_by", "finishes", "finished_by",
    "during", "contains", "meets", "met_by", "overlaps", "overlapped_by",
)


def allen_relations(
    intervals: DataFrame,
    id_col: str = "id",
    key_col: str = "key",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    bin_us: int = 3_600_000_000,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Classify every *in-contact* pair of closed integer intervals
    sharing a ``key`` into its Allen relation — the temporal-KG
    primitive that turns per-entity validity/session intervals into
    qualitative ``before/during/overlaps`` edges (Allen 1983). Emits
    ``(key, id_a, id_b, rel)`` once per unordered pair (``id_a <
    id_b``, relation read a→b); the two *disjoint* relations
    (precedes/preceded-by) are deliberately NOT emitted — they are the
    quadratic almost-everything and any consumer can derive them from
    absence, which is what keeps this join bounded.

    Pair generation is the exactly-once binning trick shared with
    :func:`interval_join`: each interval explodes into its covering
    ``bin_us`` bins (loud ``max_bins_per_interval`` guard — a runaway
    interval must not fan out silently), pairs equi-join on (key, bin),
    and only the bin containing ``greatest(lo_a, lo_b)`` keeps the
    pair, so no post-join dedup shuffle. Rows with NULL endpoints or
    ``lo > hi`` are dropped up front (same discipline as
    interval_join's guard: corrupt intervals don't classify). All
    endpoint comparisons are integer — the 13-way case expression is
    engine-exact by construction. Touching pairs (``hi_a == lo_b``)
    are in contact under closed semantics: that's ``meets``.
    """
    iv = (intervals.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(key_col).cast("string").alias("key"),
        F.col(lo_col).cast("long").alias("lo"),
        F.col(hi_col).cast("long").alias("hi"))
        .where(F.col("id").isNotNull() & F.col("key").isNotNull()
               & F.col("lo").isNotNull() & F.col("hi").isNotNull()
               & (F.col("lo") <= F.col("hi"))))
    lo_bin = F.expr(f"(lo - pmod(lo, {bin_us})) div {bin_us}")
    hi_bin = F.expr(f"(hi - pmod(hi, {bin_us})) div {bin_us}")
    n_bins = hi_bin - lo_bin + 1
    over = iv.where(n_bins > max_bins_per_interval).limit(1).collect()
    if over:
        raise ValueError(
            f"allen_relations: interval {over[0]['id']!r} spans more "
            f"than max_bins_per_interval ({max_bins_per_interval}) "
            f"bins of {bin_us} us — widen bin_us or split the interval")
    binned = iv.select(
        "id", "key", "lo", "hi",
        F.explode(F.sequence(lo_bin, hi_bin)).alias("bin"))
    a, b = binned.alias("a"), binned.alias("b")
    la, ha = F.col("a.lo"), F.col("a.hi")
    lb, hb = F.col("b.lo"), F.col("b.hi")
    pairs = (a.join(b, (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.bin") == F.col("b.bin"))
                    & (F.col("a.id") < F.col("b.id")))
             .where((la <= hb) & (lb <= ha))
             .where(F.col("a.bin")
                    == F.expr(f"(greatest(a.lo, b.lo) "
                              f"- pmod(greatest(a.lo, b.lo), {bin_us}))"
                              f" div {bin_us}")))
    rel = (F.when((la == lb) & (ha == hb), "equals")
           .when((la == lb) & (ha < hb), "starts")
           .when((la == lb) & (ha > hb), "started_by")
           .when((ha == hb) & (la > lb), "finishes")
           .when((ha == hb) & (la < lb), "finished_by")
           .when((la > lb) & (ha < hb), "during")
           .when((la < lb) & (ha > hb), "contains")
           .when(ha == lb, "meets")
           .when(hb == la, "met_by")
           .when((la < lb) & (lb <= ha) & (ha < hb), "overlaps")
           .otherwise("overlapped_by"))
    return pairs.select(F.col("a.key").alias("key"),
                        F.col("a.id").alias("id_a"),
                        F.col("b.id").alias("id_b"),
                        rel.alias("rel"))


def coalesce_intervals(
    intervals: DataFrame,
    key: str = "key",
    lo: str = "lo_us",
    hi: str = "hi_us",
    merge_touching: bool = True,
) -> DataFrame:
    """Interval coalescing (temporal PACK): merge overlapping — and,
    with ``merge_touching``, abutting — validity intervals per key
    into their minimal disjoint cover. The temporal-normalization dual
    of :func:`intervalize` (that builds per-update intervals; this
    collapses redundant ones after union/dedup of multi-source
    histories, e.g. before :func:`allen_relations` or a kg_snapshot
    re-derivation).

    Classic gaps-and-islands on integers: one window per key ordered
    by (lo, hi) carries the running max of prior ``hi``; a row whose
    ``lo`` exceeds it (or equals it, when touching intervals stay
    separate) opens a new island; the island id is the running count
    of opens, and one groupBy folds each island to its envelope.
    Returns ``(key, lo, hi, n_merged)``.

    Scale shape: ONE keyed shuffle shared by the window sort and the
    island groupBy (same partitioning) — the sessionize pattern;
    all-integer comparisons, no Python. Corrupt rows (``hi < lo``,
    NULL bounds) raise via an up-front bounded check rather than
    silently skewing envelopes.
    """
    iv = intervals.select(
        F.col(key).cast("string").alias("key"),
        F.col(lo).cast("long").alias("lo"),
        F.col(hi).cast("long").alias("hi"))
    bad = iv.where(F.col("key").isNull() | F.col("lo").isNull()
                   | F.col("hi").isNull() | (F.col("hi") < F.col("lo")))
    if not bad.isEmpty():
        raise ValueError("coalesce_intervals: NULL bounds or hi < lo; "
                         "clean the history first")
    w = (Window.partitionBy("key").orderBy("lo", "hi")
         .rowsBetween(Window.unboundedPreceding, -1))
    run = F.max("hi").over(w)
    opens = F.when(
        run.isNull()
        | (F.col("lo") > run if merge_touching else F.col("lo") >= run),
        1).otherwise(0)
    return (iv.withColumn("_open", opens)
            .withColumn("_island", F.sum("_open").over(
                Window.partitionBy("key").orderBy("lo", "hi")
                .rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("key", "_island")
            .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"),
                 F.count("*").cast("int").alias("n_merged"))
            .select("key", "lo", "hi", "n_merged"))


def coalesce_intervals_oracle_sql(intervals_cte: str,
                                  merge_touching: bool = True) -> str:
    """DuckDB twin of :func:`coalesce_intervals` — the same
    gaps-and-islands windows, serially planned.

    The row order must be pinned to a TOTAL order before the stacked
    windows run: DuckDB evaluates the open-flag window and the
    running-sum window in separate passes, each free to order
    duplicate ``(lo, hi)`` rows differently — the flag then rides a
    DIFFERENT duplicate than the sum counts, splitting one island in
    two (caught by the sf0.1 replay, r4: duplicated intervals made
    the twin NONDETERMINISTIC, 209 vs 210 rows across runs). A
    materialized ``row_number`` freezes one arbitrary-but-fixed order
    (duplicates are interchangeable, so which one wins is
    value-irrelevant); both windows then order by it. Spark's side
    never had the hazard — same-spec windows share one physical sort.
    """
    cmp = ">" if merge_touching else ">="
    return f"""
with iv as materialized (
  select cast(key as varchar) as key, cast(lo as bigint) as lo,
         cast(hi as bigint) as hi,
         row_number() over (partition by key order by lo, hi) as rn
  from ({intervals_cte})
),
marked as materialized (
  select key, lo, hi, rn,
         case when max(hi) over (partition by key order by rn
                rows between unbounded preceding and 1 preceding)
              is null
           or lo {cmp} max(hi) over (partition by key order by rn
                rows between unbounded preceding and 1 preceding)
         then 1 else 0 end as _open
  from iv
),
islands as (
  select key, lo, hi,
         sum(_open) over (partition by key order by rn
           rows between unbounded preceding and current row) as _island
  from marked
)
select key, cast(min(lo) as bigint) as lo, cast(max(hi) as bigint) as hi,
       cast(count(*) as int) as n_merged
from islands group by key, _island
"""
