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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    event_col: str = "event_type",
    ts_col: str = "ts",
    horizon_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: how far does each user get through
    ``steps`` (view → click → purchase …), where a step only counts
    after the previous one and — with ``horizon_s`` — within that many
    seconds of completing step one. Returns per-user
    ``(user, stage_reached, t_first_us, t_last_us)`` with epoch-micros
    timestamps of the first-step and deepest-step events; feed a
    ``groupBy("stage_reached")`` for the classic funnel counts.

    Plan: ONE groupBy per user collecting the (bounded, per-user)
    event list, sorted in-array by (time, event) — deterministic under
    timestamp ties — then a single fold (``F.aggregate``) walking the
    sequence with a (stage, t0, t_last) accumulator. No window over a
    global sort, no per-step self-join: k funnel steps cost the same
    one pass (the k-join relational encoding grows a shuffle per step).
    Out-of-bounds step lookup uses 0-based ``F.get`` (NULL-safe under
    ANSI, where ``element_at`` throws). Rows with a NULL user fold into
    one NULL group (groupBy semantics) — filter them upstream if that
    is not the intent.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    horizon_us = None if horizon_s is None else int(horizon_s) * 1_000_000

    per_user = (
        events.select(F.col(user_col).alias("user"),
                      # NTZ timestamps need the cast; the session is
                      # pinned UTC so the instant matches DuckDB's
                      # epoch_us over the same naive value
                      F.unix_micros(F.col(ts_col).cast("timestamp"))
                      .alias("t"),
                      F.col(event_col).alias("e"))
        .groupBy("user")
        .agg(F.array_sort(F.collect_list(F.struct("t", "e"))).alias("_ev"))
    )
    init = F.struct(F.lit(0).alias("s"),
                    F.lit(None).cast("bigint").alias("t0"),
                    F.lit(None).cast("bigint").alias("tl"))

    def step(acc, x):
        can = (acc["s"] < n) & (x["e"] == F.get(steps_arr, acc["s"]))
        if horizon_us is not None:
            can = can & ((acc["s"] == 0)
                         | (x["t"] - acc["t0"] <= horizon_us))
        return F.struct(
            F.when(can, acc["s"] + 1).otherwise(acc["s"]).alias("s"),
            F.when(can & (acc["s"] == 0), x["t"]).otherwise(acc["t0"])
            .alias("t0"),
            F.when(can, x["t"]).otherwise(acc["tl"]).alias("tl"))

    folded = per_user.select(
        "user", F.aggregate("_ev", init, step).alias("_f"))
    return folded.select(
        "user", F.col("_f.s").alias("stage_reached"),
        F.col("_f.t0").alias("t_first_us"),
        F.col("_f.tl").alias("t_last_us"))


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention: group users by their FIRST-activity period
    (the cohort), then count how many are active again k periods later
    — the classic retention triangle. Returns
    ``(cohort, period_offset, n_users)`` with ``cohort`` the truncated
    first-activity date and ``period_offset`` in [0, max_periods].

    Plan: per-user first-activity via one partial-agg groupBy (min over
    the raw timestamps, no window), then (user, period) distinct
    activity joined back to the per-user cohort — a user-keyed join
    against a per-user table, the only corpus-scale shuffle — and one
    final vocabulary-sized aggregation (cohorts × offsets rows).
    ``period`` is any ``date_trunc`` unit; offsets beyond
    ``max_periods`` are dropped (they would make the output unbounded
    in corpus time-span, not in corpus size).
    """
    ev = events.select(F.col(user_col).alias("user"),
                       F.date_trunc(period, F.col(ts_col)).alias("p"))
    first = ev.groupBy("user").agg(F.min("p").alias("cohort"))
    active = ev.distinct()
    per = (
        active.join(first, "user")
        .select("user", "cohort",
                _period_offset(period).alias("off"))
        .where(F.col("off") <= max_periods)
    )
    return (
        per.groupBy("cohort", "off")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(F.col("cohort").cast("date").alias("cohort"),
                F.col("off").cast("int").alias("period_offset"),
                "n_users")
    )


def _period_offset(period: str):
    """Whole periods between cohort and activity timestamps — exact
    integer arithmetic on epoch days/seconds, identical in DuckDB
    (datediff month semantics differ between engines, so month-family
    units count month-index deltas explicitly)."""
    if period in ("week", "day"):
        days = F.datediff(F.col("p").cast("date"),
                          F.col("cohort").cast("date"))
        return days / (7 if period == "week" else 1)
    if period in ("month", "quarter", "year"):
        months = ((F.year("p") - F.year("cohort")) * 12
                  + (F.month("p") - F.month("cohort")))
        step = {"month": 1, "quarter": 3, "year": 12}[period]
        return months / step
    raise ValueError(f"unsupported retention period {period!r}")


def rolling_anomaly(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
    window: int = 20,
    min_prev: int = 5,
    k: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags over an ordered event
    stream — the standard metric-spike screen (a value more than ``k``
    standard deviations from the mean of the previous ``window``
    events of the same key).

    All arithmetic is integer fixed-point so a replay is bit-exact:
    values floor-scale by ``scale``; the test |v - s1/n| > k*sqrt(var)
    is squared into (v*n - s1)^2 > k^2 * (n*s2 - s1^2) — no division,
    no sqrt, no float in sight. Rolling n/s1/s2 come from ONE window
    pass (rowsBetween(-window, -1), ordered by (ts, tie_col) for a
    deterministic frame under equal timestamps).

    Scale shape: one keyed shuffle shared by all three running sums —
    the same single-sort discipline as :func:`sessionize`. Events with
    fewer than ``min_prev`` predecessors are never flagged (cold
    start). Headroom: |value|*scale must stay under ~2.1e9 for the
    squared terms to fit a signed 64-bit integer at window<=100, k<=5
    — generous for metric streams; raise consciously, not blindly.

    Returns ``(tie_col, key_col, ts, v_fp, n_prev, s1, s2,
    is_anomaly)``.
    """
    if window < 1 or min_prev < 1 or k < 1:
        raise ValueError("window, min_prev, k must all be >= 1")
    v_fp = F.floor(F.col(value_col) * scale).cast("bigint")
    base = events.select(
        F.col(tie_col), F.col(key_col), F.col(ts_col).alias("ts"),
        v_fp.alias("v_fp"))
    w = (Window.partitionBy(key_col)
         .orderBy(F.col("ts"), F.col(tie_col))
         .rowsBetween(-window, -1))
    roll = base.select(
        tie_col, key_col, "ts", "v_fp",
        F.count("v_fp").over(w).alias("n_prev"),
        F.coalesce(F.sum("v_fp").over(w), F.lit(0)).alias("s1"),
        F.coalesce(F.sum(F.col("v_fp") * F.col("v_fp")).over(w),
                   F.lit(0)).alias("s2"))
    dev = F.col("v_fp") * F.col("n_prev") - F.col("s1")
    var_n2 = (F.col("n_prev") * F.col("s2")
              - F.col("s1") * F.col("s1"))
    return roll.select(
        tie_col, key_col, "ts", "v_fp", "n_prev", "s1", "s2",
        F.when((F.col("n_prev") >= min_prev)
               & (dev * dev > k * k * var_n2), 1)
        .otherwise(0).alias("is_anomaly"))


def gap_fill(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    bucket_us: int = 3_600 * 1_000_000,
    max_buckets_per_key: int = 100_000,
) -> DataFrame:
    """Densified per-key time series: one row per (key, bucket) over
    the key's observed [first, last] bucket span — gap buckets appear
    with ``n_events = 0``, ``cum_events`` keeps the running total, and
    (when ``value_col`` is given) ``last_val`` forward-fills the most
    recent observed bucket maximum across the gap. The resample step
    every downstream rate/retention/feature computation assumes —
    window functions alone can't produce rows that aren't there.

    Per-bucket ``last_val`` is the bucket's MAX of ``value_col`` (a
    deterministic tie-break that replays identically in any engine;
    "last by timestamp" needs a total order the fixture may not have).

    Shape: one partial-agg groupBy(key, bucket); a per-key min/max agg
    (key-sized); sequence+explode builds the grid WITHOUT a shuffle on
    the corpus (the grid derives from the key-sized span table, then
    one key+bucket join pulls the observations in); the cumsum/ffill
    windows share one (key, bucket) sort. The explode is bounded by
    span/bucket — a key whose span exceeds ``max_buckets_per_key``
    fails loudly (a 30-year-span user at hourly buckets is a data bug,
    not a reason to OOM an executor).
    """
    # cast: parquet naive timestamps load as TIMESTAMP_NTZ, which
    # unix_micros rejects; under the pinned-UTC session the cast is
    # the identity epoch mapping (same rule as sessionize).
    # Bucket = FLOOR division (the DuckDB twin's `//`): a plain
    # cast-to-long truncates toward zero, mis-bucketing pre-1970
    # timestamps. pmod yields a non-negative remainder, so the
    # subtraction makes the dividend an exact multiple and the
    # division exact — integer-floor semantics for any sign.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b = ((us - F.pmod(us, F.lit(bucket_us))) / F.lit(bucket_us)) \
        .cast("long").alias("bucket")
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.max(F.col(value_col)).alias("bucket_val"))
    per = (events.where(F.col(ts_col).isNotNull()
                        & F.col(key).isNotNull())
           .groupBy(F.col(key), b).agg(*aggs))
    spans = per.groupBy(key).agg(F.min("bucket").alias("lo"),
                                 F.max("bucket").alias("hi"))
    overflow = spans.where(
        F.col("hi") - F.col("lo") >= max_buckets_per_key)
    bad = overflow.select(key).limit(1).collect()
    if bad:
        raise ValueError(
            f"gap_fill: key {bad[0][0]!r} spans more than "
            f"{max_buckets_per_key} buckets — widen bucket_us or split "
            "the series; refusing to explode an unbounded grid")
    grid = spans.select(
        F.col(key),
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket"))
    j = grid.join(per, [key, "bucket"], "left")
    w = (Window.partitionBy(key).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cols = [
        F.col(key), F.col("bucket"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.sum(F.coalesce("n_events", F.lit(0))).over(w)
        .alias("cum_events"),
    ]
    if value_col is not None:
        cols.append(F.last("bucket_val", ignorenulls=True).over(w)
                    .alias("last_val"))
    return j.select(*cols)


def basket_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_count: int = 2,
    max_basket_size: int = 256,
) -> DataFrame:
    """Association rules A→B over transactional baskets (a session's
    tool calls, a conversation's entity mentions, a user's event
    types): support, confidence, and lift in exact ppm — the
    signal behind "sessions that call search also call fetch" style
    co-usage findings, where raw co-counts mislead (lift corrects for
    item popularity the way PMI does for collocations).

    Scale discipline is apriori's: items below ``min_count`` baskets
    never enter the pair join (frequent-item pruning), and baskets
    larger than ``max_basket_size`` are EXCLUDED outright — at corpus
    scale those are bots/logs, and one 10^5-item basket alone would
    emit 10^10 pairs. Both caps are explicit parameters, not silent
    defaults buried in the plan. The pair table is built by ONE
    within-basket self-equijoin of the pruned item set; everything
    else is group-keyed partial aggs.

    Exactness: support = floor(c_ab·10⁶/n), confidence =
    floor(c_ab·10⁶/c_a), lift = floor(c_ab·n·10⁶/(c_a·c_b)) — the
    lift numerator needs c_ab·n·10⁶ < 2⁶³ ⇒ n_baskets·c_ab ≲ 9·10¹²;
    sample beyond that (ANSI raises loudly, it does not wrap).

    Returns ``(ante, cons, n_both, n_ante, n_cons, support_ppm,
    confidence_ppm, lift_ppm)`` for ordered pairs, both directions.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    bi = (baskets
          .where(F.col(basket_col).isNotNull()
                 & F.col(item_col).isNotNull())
          .select(F.col(basket_col).alias("bk"),
                  F.col(item_col).cast("string").alias("it"))
          .distinct())
    sized = (bi.groupBy("bk")
             .agg(F.count("*").alias("sz"))
             .where(F.col("sz") <= int(max_basket_size))
             .select("bk"))
    bi = bi.join(sized, "bk", "left_semi")
    n = bi.select("bk").distinct().agg(
        F.count("*").cast("long").alias("n_baskets"))
    ic = (bi.groupBy("it").agg(F.count("*").cast("long").alias("c"))
          .where(F.col("c") >= int(min_count)))
    freq = bi.join(ic.select("it"), "it", "left_semi")
    a = freq.select("bk", F.col("it").alias("ante"))
    b = freq.select("bk", F.col("it").alias("cons"))
    pairs = (a.join(b, "bk")
             .where(F.col("ante") != F.col("cons"))
             .groupBy("ante", "cons")
             .agg(F.count("*").cast("long").alias("n_both")))
    ca = ic.select(F.col("it").alias("ante"), F.col("c").alias("n_ante"))
    cb = ic.select(F.col("it").alias("cons"), F.col("c").alias("n_cons"))

    def _ppm(num, den):
        num = num * F.lit(1_000_000)
        return (F.when(den == 0, F.lit(0))
                .otherwise((num - F.pmod(num, den)) / den)
                .cast("long"))

    out = (pairs.join(ca, "ante").join(cb, "cons")
           .crossJoin(F.broadcast(n)))
    return out.select(
        "ante", "cons", "n_both", "n_ante", "n_cons",
        _ppm(F.col("n_both"), F.col("n_baskets")).alias("support_ppm"),
        _ppm(F.col("n_both"), F.col("n_ante")).alias("confidence_ppm"),
        _ppm(F.col("n_both") * F.col("n_baskets"),
             F.col("n_ante") * F.col("n_cons")).alias("lift_ppm"))


def basket_rules_oracle_sql(
    baskets_sql: str,
    min_count: int = 2,
    max_basket_size: int = 256,
) -> str:
    """DuckDB twin of :func:`basket_rules`; ``baskets_sql`` yields
    (bk, it)."""
    return f"""
with bi0 as materialized (
  select distinct bk, cast(it as varchar) as it from ({baskets_sql})
  where bk is not null and it is not null),
ok as (select bk from bi0 group by bk
       having count(*) <= {int(max_basket_size)}),
bi as materialized (select bi0.* from bi0 join ok using (bk)),
n as (select cast(count(distinct bk) as bigint) as n_baskets from bi),
ic as materialized (
  select it, cast(count(*) as bigint) as c from bi group by it
  having count(*) >= {int(min_count)}),
freq as materialized (select bi.* from bi join ic using (it)),
pairs as (
  select a.it as ante, b.it as cons,
         cast(count(*) as bigint) as n_both
  from freq a join freq b using (bk)
  where a.it <> b.it
  group by 1, 2)
select ante, cons, n_both, ca.c as n_ante, cb.c as n_cons,
  cast((n_both * 1000000) // n_baskets as bigint) as support_ppm,
  cast((n_both * 1000000) // ca.c as bigint) as confidence_ppm,
  cast((n_both * n_baskets * 1000000) // (ca.c * cb.c) as bigint)
    as lift_ppm
from pairs
join ic ca on ca.it = pairs.ante
join ic cb on cb.it = pairs.cons
cross join n
"""


def cusum_alarm(
    series: DataFrame,
    key_col: str = "key",
    seq_col: str = "seq",
    value_col: str = "value",
    ref: int = 0,
    slack: int = 0,
    threshold: int = 10,
) -> DataFrame:
    """One-sided CUSUM drift detector per keyed series — the
    change-point test :func:`rolling_anomaly`'s fixed window can't
    give you: a SMALL sustained shift accumulates until the statistic
    crosses ``threshold``, while a single spike decays immediately.
    The streaming-monitor classic (Page 1954), here over integer
    fixed-point values (scale doubles to micros/ppm upstream).

    The textbook recursion S_t = max(0, S_{t-1} + x_t − ref − slack)
    looks inherently sequential; it is NOT: with prefix sums
    P_t = Σ_{i≤t}(x_i − ref − slack), the identity
    ``S_t = P_t − min(0, min_{j≤t} P_j)`` turns it into a cumulative
    sum plus a running min — two stock window frames over (key, seq),
    zero iteration, zero Python. One shuffle on the key.

    ``seq`` must be unique per key (event index / timestamp micros) —
    the window orders by it alone, so duplicated seq values would be
    nondeterministic; callers with ties pre-rank. Overflow: |P_t| stays
    in int64 as long as n·max|x−ref−slack| < 2⁶³ — loud under ANSI.

    Returns the full per-row signal ``(key, seq, value, cusum,
    alarm)``; alarms are rows with cusum ≥ threshold (callers keep
    the first per key via min(struct(seq, …)) or filter).
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (series
            .where(F.col(key_col).isNotNull()
                   & F.col(seq_col).isNotNull()
                   & F.col(value_col).isNotNull())
            .select(F.col(key_col).alias("key"),
                    F.col(seq_col).cast("long").alias("seq"),
                    F.col(value_col).cast("long").alias("value")))
    d = (F.col("value") - F.lit(int(ref)) - F.lit(int(slack)))
    w = (Window.partitionBy("key").orderBy("seq")
         .rowsBetween(Window.unboundedPreceding, 0))
    p = base.withColumn("pf", F.sum(d).over(w))
    p = p.withColumn(
        "lowest", F.least(F.lit(0), F.min("pf").over(w)))
    return p.select(
        "key", "seq", "value",
        (F.col("pf") - F.col("lowest")).cast("long").alias("cusum"),
        ((F.col("pf") - F.col("lowest")) >= F.lit(int(threshold)))
        .alias("alarm"))


def cusum_alarm_oracle_sql(
    series_sql: str,
    ref: int = 0,
    slack: int = 0,
    threshold: int = 10,
) -> str:
    """DuckDB twin of :func:`cusum_alarm`; ``series_sql`` yields
    (key, seq, value)."""
    k = int(ref) + int(slack)
    return f"""
with base as materialized (
  select key, cast(seq as bigint) as seq,
         cast(value as bigint) as value
  from ({series_sql})
  where key is not null and seq is not null and value is not null),
p as (
  select key, seq, value,
         cast(sum(value - {k}) over (partition by key order by seq
           rows between unbounded preceding and current row)
           as bigint) as pf
  from base),
q as (
  select key, seq, value, pf,
         least(0, min(pf) over (partition by key order by seq
           rows between unbounded preceding and current row))
           as lowest
  from p)
select key, seq, value,
       cast(pf - lowest as bigint) as cusum,
       (pf - lowest) >= {int(threshold)} as alarm
from q
"""


def lag_autocorr(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    val_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Lag-k autocorrelation of a per-key series — does activity
    (events per hour, tokens per crawl day) carry MEMORY: r₁ ≈ 0 is
    Poisson-ish, high r₁ means bursts persist, an r₂₄ spike on hourly
    buckets is a daily cycle. rolling_anomaly flags single points;
    this profiles the series' correlation structure.

    Floored-mean spec (exact, both engines): with ``m = S div n`` per
    key and ``d_t = x_t − m``,

        r_k = sign·(10^6·|Σ_t d_t·d_{t+k}|) div (Σ_t d_t²)

    — pairs skip the tail (lead NULL) and the denominator runs over
    all rows, the standard ACF shape; the floored mean deviates from
    the exact mean by < 1, a deliberate trade for integer-exact
    cross-engine replay (runs_test's signed magnitude-floor
    convention; a constant series reads 0). Values must be ≥ 0
    (count/magnitude series — ``div`` truncation equals floor only
    there) and the overflow contract is n·x_max² < 9.2·10^12 per key.

    The series is the ORDERED OBSERVED sequence — absent buckets are
    skipped, not zero-filled; compose with :func:`gap_fill` first
    when calendar lags are wanted. ``ord_col`` must be unique per
    key. One ordered window pass (whole-partition sum/count ride the
    same shuffle), one explode to (row, lag), one partial-agg groupBy
    — key-count-bounded output. Returns
    (key, lag, n, n_pairs, r_ppm).
    """
    if max_lag < 1:
        raise ValueError(f"lag_autocorr: max_lag must be >= 1, "
                         f"got {max_lag}")
    base = (df.select(F.col(key_col).alias("key"),
                      F.col(ord_col).alias("o"),
                      F.col(val_col).cast("long").alias("x"))
            .where(F.col("x").isNotNull() & (F.col("x") >= 0)))
    wp = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("o")
    m = F.expr("s div n")
    staged = base.select(
        "key",
        F.sum("x").over(wp).alias("s"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.col("x"),
        *[F.lead("x", k).over(wo).alias(f"_l{k}")
          for k in range(1, max_lag + 1)],
    ).select(
        "key", "n", (F.col("x") - m).alias("d"),
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("lag"),
                     (F.col(f"_l{k}") - m).alias("dl"))
            for k in range(1, max_lag + 1)])).alias("e"))
    agg = staged.groupBy("key", F.col("e.lag").alias("lag")).agg(
        F.max("n").cast("long").alias("n"),
        F.count("e.dl").cast("long").alias("n_pairs"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("_den"),
        F.sum(F.when(F.col("e.dl").isNotNull(),
                     F.col("d") * F.col("e.dl"))
              .otherwise(F.lit(0))).cast("long").alias("_num"))
    mag = F.expr("(1000000 * abs(_num)) div _den")
    r = (F.when(F.col("_den") > 0,
                F.when(F.col("_num") < 0, -mag).otherwise(mag))
         .otherwise(F.lit(0)))
    return agg.select("key", "lag", "n", "n_pairs",
                      r.cast("long").alias("r_ppm"))


def lag_autocorr_oracle_sql(series_sql: str, max_lag: int = 3) -> str:
    """DuckDB twin of :func:`lag_autocorr`; ``series_sql`` yields
    (key, o, x) with x ≥ 0 and o unique per key."""
    leads = ", ".join(
        f"lead(x, {k}) over (partition by key order by o) as l{k}"
        for k in range(1, max_lag + 1))
    stacks = ", ".join(
        f"{{'lag': {k}, 'dl': l{k} - m}}"
        for k in range(1, max_lag + 1))
    return f"""
with base as (
  select key, o, cast(x as bigint) as x
  from ({series_sql}) where x is not null and x >= 0),
st as (
  select key, x,
         sum(x) over (partition by key) // count(*)
           over (partition by key) as m,
         count(*) over (partition by key) as n,
         {leads}
  from base),
ex as (
  select key, n, x - m as d,
         unnest([{stacks}]) as e
  from st),
agg as (
  select key, e.lag as lag, cast(max(n) as bigint) as n,
         cast(count(e.dl) as bigint) as n_pairs,
         cast(sum(d * d) as bigint) as den,
         cast(sum(case when e.dl is not null then d * e.dl
                       else 0 end) as bigint) as num
  from ex group by key, e.lag)
select key, lag, n, n_pairs,
  cast(case when den > 0
            then sign(num) * ((1000000 * abs(num)) // den)
            else 0 end as bigint) as r_ppm
from agg
"""


def decay_score(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    val_col: str,
    decay_ppm: int = 900_000,
    max_points: int = 100_000,
) -> DataFrame:
    """Exponentially-decayed score per key — the "what have you done
    lately" aggregate behind source-reliability and freshness ranking:
    newest observation counts fully, each older one is discounted by
    ``decay_ppm/10^6`` per STEP,

        y ← (y · decay_ppm) div 10^6 + x     (oldest → newest)

    Per-step (not per-time-gap) decay is the spec — compose with
    :func:`gap_fill` first when calendar decay is wanted; the floor at
    every step makes the fold EXACT and cross-engine (both sides
    replay the identical integer sequence — a float Σx·λ^k would
    diverge in the 15th digit and hash-mismatch). Overflow contract:
    the fold converges to ≤ x_max·10^6/(10^6 − decay_ppm), and that
    bound times decay_ppm must stay under 2^53 (the exact-division
    precondition) — x_max/(1 − λ) < 9·10^9, satisfied by any count
    series. Values must be ≥ 0.

    A fold is inherently sequential, so the series is staged as a
    per-key array (``collect_list`` → ``array_sort``) and folded by
    one HOF ``aggregate`` — one keyed shuffle, no window, no Python.
    That bounds per-key memory by the series length: ``max_points``
    RAISES (ANSI-loud inside the expression) rather than truncating —
    bucket or pre-aggregate longer series upstream. ``ord_col`` must
    be unique per key (ties would make the fold order ambiguous).
    Returns (key, n, score).
    """
    base = (df.select(F.col(key_col).alias("key"),
                      F.col(ord_col).alias("o"),
                      F.col(val_col).cast("long").alias("x"))
            .where(F.col("x").isNotNull() & (F.col("x") >= 0)))
    arr = base.groupBy("key").agg(
        F.array_sort(F.collect_list(F.struct("o", "x"))).alias("pts"))
    guarded = arr.select(
        "key",
        F.when(F.size("pts") > max_points,
               F.raise_error(F.concat(
                   F.lit(f"decay_score: series exceeds max_points="
                         f"{max_points} for key "),
                   F.col("key").cast("string"))))
        .otherwise(F.transform("pts", lambda s: s["x"])).alias("xs"))
    # exact step: acc·d − pmod(acc·d, 10^6) is a multiple of 10^6, and
    # the contract keeps acc·d < 2^53 so the double division is exact
    # before the cast (the repo-wide pmod floor trick's precondition)
    def _step(acc, x):
        ad = acc * F.lit(decay_ppm)
        return (((ad - F.pmod(ad, F.lit(1_000_000))) / F.lit(1_000_000))
                .cast("long") + x)

    fold = F.aggregate("xs", F.lit(0).cast("long"), _step)
    return guarded.select(
        "key", F.size("xs").cast("long").alias("n"),
        fold.cast("long").alias("score"))


def decay_score_oracle_sql(series_sql: str,
                           decay_ppm: int = 900_000) -> str:
    """DuckDB twin of :func:`decay_score`; ``series_sql`` yields
    (key, o, x) with x ≥ 0 and o unique per key. ``list_reduce`` has
    no init argument, so 0 is prepended as the seed (scalar
    accumulators carry correctly; only LIST-typed ones reset)."""
    return f"""
with base as (
  select key, o, cast(x as bigint) as x
  from ({series_sql}) where x is not null and x >= 0),
arr as (
  select key, list(x order by o) as xs
  from base group by key)
select key, cast(len(xs) as bigint) as n,
  cast(list_reduce(list_prepend(cast(0 as bigint), xs),
         (acc, x) -> (acc * {decay_ppm}) // 1000000 + x)
       as bigint) as score
from arr
"""


def attribution(
    df: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    lookback_us: int = 86_400_000_000,
) -> DataFrame:
    """First-touch / last-touch conversion attribution — which channel
    OPENED the path and which one CLOSED it: for every
    ``conversion_type`` event, the earliest and latest non-conversion
    touch by the same user within ``lookback_us`` gets the credit;
    conversions with no in-window touch credit ``(none)`` (they must
    stay visible — dropping them silently inflates every channel).

    Deterministic: ties on the touch timestamp break by ``id_col``
    (min/max over the (ts, id, type) struct), so two same-instant
    touches attribute identically on every engine. Returns one row
    per channel, ``(channel, first_touch, last_touch)`` conversion
    counts, '(none)' included when it earned credit.

    Scale shape: conversions ⋈ touches is USER-KEYED with the range
    predicate applied inside the join — per-user fan-out is bounded
    by per-user activity in the lookback (the sessionize family's
    skew contract: screen bot users upstream); then one per-conversion
    min_by/max_by partial agg and one channel-sized count. No
    windows, no corpus sort.
    """
    base = df.select(F.col(user_col).alias("u"),
                     F.col(ts_col).cast("timestamp").alias("t"),
                     F.col(type_col).alias("ch"),
                     F.col(id_col).alias("i")) \
             .where(F.col(user_col).isNotNull()
                    & F.col(ts_col).isNotNull())
    conv = base.where(F.col("ch") == conversion_type) \
        .select(F.col("u").alias("cu"), F.col("t").alias("ct"),
                F.col("i").alias("ci"))
    touch = base.where(F.col("ch") != conversion_type)
    tus = F.unix_micros(F.col("t"))
    cus = F.unix_micros(F.col("ct"))
    # the range predicate rides the JOIN condition — a post-filter
    # would silently drop conversions whose touches are all
    # out-of-window instead of crediting '(none)'
    j = conv.join(
        touch,
        (F.col("cu") == F.col("u")) & (tus <= cus)
        & (cus - tus <= F.lit(lookback_us)),
        "left")
    per_conv = j.groupBy("ci").agg(
        F.min_by(F.struct(F.col("t"), F.col("i"), F.col("ch")),
                 F.struct(F.col("t"), F.col("i"))).alias("_f"),
        F.max_by(F.struct(F.col("t"), F.col("i"), F.col("ch")),
                 F.struct(F.col("t"), F.col("i"))).alias("_l"))
    credited = per_conv.select(
        F.coalesce(F.col("_f.ch"), F.lit("(none)")).alias("first_ch"),
        F.coalesce(F.col("_l.ch"), F.lit("(none)")).alias("last_ch"))
    first = credited.groupBy(F.col("first_ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("first_touch"))
    last = credited.groupBy(F.col("last_ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("last_touch"))
    return (first.join(last, "channel", "full")
            .select("channel",
                    F.coalesce("first_touch", F.lit(0)).cast("long")
                    .alias("first_touch"),
                    F.coalesce("last_touch", F.lit(0)).cast("long")
                    .alias("last_touch")))


def attribution_oracle_sql(events_sql: str, conversion_type: str,
                           lookback_us: int = 86_400_000_000) -> str:
    """DuckDB twin of :func:`attribution`; ``events_sql`` yields
    (u, t, ch, i). ``full`` is a reserved word — the outer join
    aliases sides explicitly."""
    return f"""
with base as (
  select u, t, ch, i from ({events_sql})
  where u is not null and t is not null),
conv as (
  select u, t as ct, i as ci from base
  where ch = '{conversion_type}'),
touch as (select * from base where ch <> '{conversion_type}'),
j as (
  select conv.ci, touch.t, touch.i, touch.ch
  from conv left join touch on conv.u = touch.u
    and epoch_us(touch.t) <= epoch_us(conv.ct)
    and epoch_us(conv.ct) - epoch_us(touch.t) <= {lookback_us}),
per_conv as (
  -- DuckDB min_by/max_by reject STRUCT keys: encode the (t, i)
  -- order as a zero-padded string (lexicographic ≡ numeric here)
  select ci,
         coalesce(min_by(ch, lpad(cast(epoch_us(t) as varchar), 20,
                                  '0') || '|'
                         || lpad(cast(i as varchar), 12, '0')),
                  '(none)') as first_ch,
         coalesce(max_by(ch, lpad(cast(epoch_us(t) as varchar), 20,
                                  '0') || '|'
                         || lpad(cast(i as varchar), 12, '0')),
                  '(none)') as last_ch
  from j group by ci),
f as (select first_ch as channel,
             cast(count(*) as bigint) as first_touch
      from per_conv group by first_ch),
l as (select last_ch as channel,
             cast(count(*) as bigint) as last_touch
      from per_conv group by last_ch)
select coalesce(f.channel, l.channel) as channel,
       cast(coalesce(first_touch, 0) as bigint) as first_touch,
       cast(coalesce(last_touch, 0) as bigint) as last_touch
from f full outer join l on f.channel = l.channel
"""


def mann_kendall(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "t",
    val_col: str = "x",
) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope per series — the
    distribution-free "is this metric drifting, and how fast" screen
    over per-entity metric series (daily quality scores, hourly
    latencies, per-snapshot corpus stats): :func:`rolling_anomaly`
    flags POINT breaks, :func:`~cow_spark.plans.stats.cusum_alarm`
    localizes a mean SHIFT, this ranks sustained monotone TREND
    without assuming a distribution or fitting a line by least
    squares (one outlier owns an OLS fit; it moves a rank statistic
    by one).

    Exact integer surface, engine-replayable end to end:

    - pairs = all row pairs with strictly increasing timestamp
      (equal-``ts`` pairs are excluded: their slope is undefined and
      classic MK's index order is meaningless for them);
    - ``s_stat`` = Σ sign(x_j − x_i) over those pairs (CASE sign, not
      libm signum);
    - ``sen_slope_ppm`` = the exact order statistic at 0-based rank
      ``(n_pairs−1)·5·10^5 div 10^6`` (lower middle — the repo's
      no-interpolation quantile spec) of floor((x_j−x_i)·10^6 /
      (t_j−t_i)), floor via the pmod trick so negative slopes floor
      identically to DuckDB ``//``;
    - ``var18`` = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5) — 18·Var(S) kept
      as the exact integer (callers needing z divide by 18 and sqrt
      client-side; shipping a float sqrt would break replay).

    Scale shape: the pair table is an equi-join on the series key
    with a range predicate — O(n²/2) rows PER KEY, the honest cost of
    an exact rank statistic. That is the right trade for per-entity
    series whose length is calendar-bounded (the intended input;
    bucket with :func:`gap_fill` first so n per key is days/hours,
    not events). Corpus-wide million-point series want a windowed
    approximation instead — out of scope here by contract. One
    keyed shuffle builds the pairs; the median rides a per-key window
    over the pair table; ties/var are one more partial agg on the
    deduplicated (key, x) counts.

    Returns ``(key, n, n_pairs, s_stat, var18, sen_slope_ppm)``;
    single-point / all-tied-timestamp series report n_pairs=0 with
    NULL slope and s_stat=0.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    base = (df.select(F.col(key_col).alias("k"),
                      F.col(ts_col).cast("long").alias("t"),
                      F.col(val_col).cast("long").alias("x"))
            .where(F.col(key_col).isNotNull()
                   & F.col(ts_col).isNotNull()
                   & F.col(val_col).isNotNull()))
    l = base.select("k", F.col("t").alias("ti"), F.col("x").alias("xi"))
    r = base.select("k", F.col("t").alias("tj"), F.col("x").alias("xj"))
    num = (F.col("xj") - F.col("xi")) * F.lit(1_000_000)
    den = F.col("tj") - F.col("ti")
    pairs = (l.join(r, "k")
             .where(F.col("ti") < F.col("tj"))
             .select("k",
                     F.when(F.col("xj") > F.col("xi"), F.lit(1))
                     .when(F.col("xj") < F.col("xi"), F.lit(-1))
                     .otherwise(F.lit(0)).cast("long").alias("sgn"),
                     ((num - F.pmod(num, den)) / den).cast("long")
                     .alias("slope_ppm")))
    w = Window.partitionBy("k").orderBy(F.col("slope_ppm").asc())
    ranked = (pairs
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_np", F.count(F.lit(1)).over(
                  Window.partitionBy("k"))))
    med_i = F.expr("((_np - 1) * 500000) div 1000000") + 1
    stats = (ranked.groupBy("k").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("sgn").cast("long").alias("s_stat"),
        F.max(F.when(F.col("_rn") == med_i, F.col("slope_ppm")))
        .alias("sen_slope_ppm")))
    n_tbl = base.groupBy("k").agg(F.count("*").cast("long").alias("n"))
    ties = (base.groupBy("k", "x").agg(F.count("*").alias("c"))
            .where(F.col("c") >= 2)
            .groupBy("k").agg(
                F.sum(F.expr("c * (c - 1) * (2 * c + 5)"))
                .cast("long").alias("tie18")))
    var18 = (F.expr("n * (n - 1) * (2 * n + 5)")
             - F.coalesce(F.col("tie18"), F.lit(0))).cast("long")
    return (n_tbl.join(ties, "k", "left").join(stats, "k", "left")
            .select(F.col("k").alias("key"), "n",
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.coalesce("s_stat", F.lit(0)).cast("long")
                    .alias("s_stat"),
                    var18.alias("var18"),
                    F.col("sen_slope_ppm").cast("long")
                    .alias("sen_slope_ppm")))


def mann_kendall_oracle_sql(series_sql: str) -> str:
    """DuckDB twin of :func:`mann_kendall`; ``series_sql`` yields
    ``(k, t, x)``. Same pair construction, CASE sign, identical
    lower-middle rank pick; every SUM casts to BIGINT before it can
    reach the output as HUGEINT. DuckDB ``//`` TRUNCATES toward zero
    on negative dividends (unlike the Spark side's pmod floor), so
    the slope subtracts an explicitly non-negative remainder first —
    the quotient is then exact and truncation equals floor."""
    return f"""
with base as materialized (
  select k, cast(t as bigint) as t, cast(x as bigint) as x
  from ({series_sql})
  where k is not null and t is not null and x is not null),
pairs as materialized (
  select k,
         case when num > 0 then 1
              when num < 0 then -1 else 0 end as sgn,
         (num - ((num % dt + dt) % dt)) // dt as slope_ppm
  from (select l.k as k, (r.x - l.x) * 1000000 as num,
               r.t - l.t as dt
        from base l join base r on l.k = r.k and l.t < r.t)),
ranked as (
  select k, sgn, slope_ppm,
         row_number() over (partition by k order by slope_ppm) as rn,
         count(*) over (partition by k) as np
  from pairs),
stats as (
  select k, cast(count(*) as bigint) as n_pairs,
         cast(sum(sgn) as bigint) as s_stat,
         cast(max(case when rn = ((np - 1) * 500000) // 1000000 + 1
                       then slope_ppm end) as bigint) as sen_slope_ppm
  from ranked group by k),
n_tbl as (select k, cast(count(*) as bigint) as n from base group by k),
ties as (
  select k, cast(sum(c * (c - 1) * (2 * c + 5)) as bigint) as tie18
  from (select k, x, count(*) as c from base group by k, x)
  where c >= 2 group by k)
select n_tbl.k as key, n,
       cast(coalesce(n_pairs, 0) as bigint) as n_pairs,
       cast(coalesce(s_stat, 0) as bigint) as s_stat,
       cast(n * (n - 1) * (2 * n + 5)
            - coalesce(tie18, 0) as bigint) as var18,
       sen_slope_ppm
from n_tbl
left join ties on n_tbl.k = ties.k
left join stats on n_tbl.k = stats.k
"""


def holt_forecast(
    df: DataFrame,
    key_col: str,
    ord_col: str,
    val_col: str,
    alpha_ppm: int = 300_000,
    beta_ppm: int = 100_000,
    horizon: int = 1,
    max_points: int = 100_000,
) -> DataFrame:
    """Holt double-exponential smoothing per series — the level+trend
    forecast that closes the time-series family: :func:`mann_kendall`
    DETECTS a sustained trend, :func:`decay_score` discounts history,
    this EXTRAPOLATES it (capacity planning on event volumes, drift
    projection on quality metrics). Seasonal Holt-Winters is the same
    fold with a third accumulator — out of scope until a fixture
    needs it.

    Exact signed integer recurrence (α, β in ppm; all divisions are
    TRUNCATING ``div`` — Spark ``div`` and DuckDB ``//`` both
    truncate toward zero, the aligned signed pair, unlike the
    pmod-floor trick which is floor — pinned by a negative-trend
    test):

        l₀ = x₀ ; b₀ = x₁ − x₀ (0 when n = 1);  for t ≥ 1:
        lₜ = (α·xₜ + (10⁶−α)·(lₜ₋₁+bₜ₋₁)) div 10⁶
        bₜ = (β·(lₜ−lₜ₋₁) + (10⁶−β)·bₜ₋₁) div 10⁶

    forecast = lₙ + horizon·bₙ. Overflow: 10⁶·(|x|+|l|+|b|) must stay
    in int64 — |x| ≤ ~4·10¹² (ANSI aborts loudly beyond).

    Like every sequential fold here, the series stages as a per-key
    sorted array and folds in ONE HOF ``aggregate`` with a struct
    accumulator — one keyed shuffle, no window, no Python;
    ``max_points`` raises rather than truncating, ``ord_col`` must be
    unique per key. Returns ``(key, n, level, trend, forecast)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if not (0 <= alpha_ppm <= 1_000_000 and 0 <= beta_ppm <= 1_000_000):
        raise ValueError("holt_forecast: alpha/beta must be in [0, 1e6]")
    base = (df.select(F.col(key_col).alias("key"),
                      F.col(ord_col).alias("o"),
                      F.col(val_col).cast("long").alias("x"))
            .where(F.col("x").isNotNull() & F.col("key").isNotNull()))
    arr = base.groupBy("key").agg(
        F.array_sort(F.collect_list(F.struct("o", "x"))).alias("pts"))
    guarded = arr.select(
        "key",
        F.when(F.size("pts") > max_points,
               F.raise_error(F.concat(
                   F.lit(f"holt_forecast: series exceeds max_points="
                         f"{max_points} for key "),
                   F.col("key").cast("string"))))
        .otherwise(F.transform("pts", lambda s: s["x"])).alias("xs"))

    m = F.lit(1_000_000)
    a, b_ = F.lit(alpha_ppm), F.lit(beta_ppm)

    def tdiv(num, den):
        # truncating integer division on signed ints (== DuckDB //)
        return ((num - num % den) / den).cast("long")

    l0 = F.element_at("xs", 1)
    b0 = F.when(F.size("xs") >= 2,
                F.element_at("xs", 2) - l0).otherwise(F.lit(0)) \
        .cast("long")
    seed = F.struct(l0.cast("long").alias("l"), b0.alias("b"))
    tail = F.expr("slice(xs, 2, greatest(size(xs) - 1, 0))")

    def _step(acc, x):
        lp, bp = acc["l"], acc["b"]
        ln = tdiv(a * x + (m - a) * (lp + bp), m)
        bn = tdiv(b_ * (ln - lp) + (m - b_) * bp, m)
        return F.struct(ln.alias("l"), bn.alias("b"))

    fin = F.aggregate(tail, seed, _step)
    return guarded.where(F.size("xs") >= 1).select(
        "key", F.size("xs").cast("long").alias("n"),
        fin["l"].cast("long").alias("level"),
        fin["b"].cast("long").alias("trend"),
        (fin["l"] + F.lit(int(horizon)) * fin["b"]).cast("long")
        .alias("forecast"))


def holt_forecast_oracle_sql(
    series_sql: str,
    alpha_ppm: int = 300_000,
    beta_ppm: int = 100_000,
    horizon: int = 1,
) -> str:
    """DuckDB twin of :func:`holt_forecast`; ``series_sql`` yields
    (key, o, x).

    The two-register accumulator is STRING-ENCODED (``'l|b'``), the
    subword.py/soundex escape hatch, because a two-FIELD struct
    accumulator is unreliable here: when one field's expression
    references a field an earlier field reassigns, DuckDB 1.0
    evaluates the shared subexpression against the REASSIGNED value
    on some plans (aggregate-built input lists) and the ORIGINAL on
    others (literal-seeded lists) — the same lambda returned two
    different folds on value-identical lists (r4, pinned by the
    Spark↔oracle equality tests). A single string field has nothing
    to reassign mid-step, so both registers advance atomically."""
    m, a, b = 1_000_000, int(alpha_ppm), int(beta_ppm)
    L = "cast(string_split(acc, '|')[1] as bigint)"
    B = "cast(string_split(acc, '|')[2] as bigint)"
    X = "cast(e as bigint)"
    ln = f"(({a} * {X} + {m - a} * ({L} + {B})) // {m})"
    bn = f"(({b} * ({ln} - {L}) + {m - b} * {B}) // {m})"
    step = f"cast({ln} as varchar) || '|' || cast({bn} as varchar)"
    return f"""
with base as (
  select key, o, cast(x as bigint) as x
  from ({series_sql})
  where x is not null and key is not null),
arr as (
  select key, list(x order by o) as xs
  from base group by key),
folded as (
  select key, len(xs) as n,
         string_split(list_reduce(
           list_prepend(
             cast(xs[1] as varchar) || '|' ||
             cast(case when len(xs) >= 2
                  then xs[2] - xs[1] else 0 end as varchar),
             list_transform(xs[2:], x -> cast(x as varchar))),
           (acc, e) -> {step}), '|') as f
  from arr)
select key, cast(n as bigint) as n,
       cast(f[1] as bigint) as level,
       cast(f[2] as bigint) as trend,
       cast(cast(f[1] as bigint)
            + {int(horizon)} * cast(f[2] as bigint) as bigint)
         as forecast
from folded
"""


def absorption_probs(
    transitions: DataFrame,
    target: str,
    rounds: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    n_col: str = "n",
) -> DataFrame:
    """Absorption probability per state: from each state of the
    empirical transition graph (the :func:`event_transitions`-shaped
    ``(src, dst, n)`` counts), the probability of reaching ``target``
    BEFORE getting stuck in any other absorbing state — the
    conversion/escalation analytics a Markov-chain funnel answers
    that the linear :func:`funnel` can't (cycles, branches, many
    exits). p(target) = 1, p(other sink) = 0, interior states iterate

        p'(s) = (Σ_{s'} n(s,s')·p(s')) div n(s)        [ppm]

    ``rounds`` fixed-point rounds (probabilities rise monotonically
    from 0 under floor — each round adds paths of one more step, so
    the iterate is the exact "absorbed within k steps" lower bound,
    a MEANINGFUL truncation, not an error). Absorbing = no outgoing
    edges, plus ``target`` itself even if it has out-edges
    (first-hit semantics: mass stops there).

    Scale shape: the corpus-sized event log is already reduced to
    the state-pair count table upstream; each round is one
    state-keyed join + partial agg on that bounded table, lineage
    cut per round (the pagerank discipline). Returns
    ``(state, p_ppm, n_out)`` over all states (sinks included:
    target 10⁶, other sinks 0, their ``n_out`` 0 when no
    out-edges).
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from .canon import round_checkpoint

    e = (transitions
         .select(F.col(src_col).cast("string").alias("s"),
                 F.col(dst_col).cast("string").alias("d"),
                 F.col(n_col).cast("long").alias("n"))
         .where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull()
                & F.col(n_col).isNotNull() & (F.col(n_col) > 0))
         # target is absorbing by fiat: drop its out-edges so its
         # mass never leaks back into the chain
         .where(F.col("s") != F.lit(target))
         .persist())
    states = (e.select(F.col("s").alias("st"))
              .union(e.select(F.col("d").alias("st")))
              .union(e.sparkSession.createDataFrame(
                  [(str(target),)], "st string"))
              .distinct().persist())
    outdeg = e.groupBy("s").agg(F.sum("n").alias("n_out"))
    p = states.select(
        "st",
        F.when(F.col("st") == target, F.lit(1_000_000))
        .otherwise(F.lit(0)).cast("long").alias("p"))
    for _ in range(rounds):
        nxt = (e.join(p.select(F.col("st").alias("d"),
                               F.col("p").alias("pd")), "d")
               .groupBy("s")
               .agg(F.expr("sum(n * pd)").cast("long").alias("mass"),
                    F.sum("n").cast("long").alias("tot")))
        p = (states.join(nxt, states.st == nxt.s, "left")
             .select("st",
                     F.when(F.col("st") == target, F.lit(1_000_000))
                     .when(F.col("mass").isNotNull(),
                           F.expr("mass div tot"))
                     .otherwise(F.lit(0)).cast("long").alias("p")))
        p = round_checkpoint(p, None)
    out = (p.join(outdeg, p.st == outdeg.s, "left")
           .select(F.col("st").alias("state"),
                   F.col("p").alias("p_ppm"),
                   F.coalesce("n_out", F.lit(0)).cast("long")
                   .alias("n_out")))
    # Keep both cached partials alive for the caller's action (the
    # final outdeg join re-reads e) — hand the handles over via the
    # repo's attach/release pattern instead of unpersisting at
    # plan-build time.
    from .dedup import _attach_persisted

    return _attach_persisted(out, e, states)


def absorption_probs_oracle_sql(trans_sql: str, target: str,
                                rounds: int = 16) -> str:
    """DuckDB twin of :func:`absorption_probs`; ``trans_sql`` yields
    ``(s, d, n)``. Unrolled MATERIALIZED CTE per round, SUMs cast to
    BIGINT."""
    t = target.replace("'", "''")
    sql = [
        f"with e as materialized (select s, d, cast(n as bigint) as n "
        f"from ({trans_sql}) where s is not null and d is not null "
        f"and n is not null and n > 0 and s <> '{t}'),",
        "outdeg as materialized (select s, cast(sum(n) as bigint) "
        "as n_out from e group by s),",
        f"states as materialized (select distinct st from ("
        f"select s as st from e union all select d from e "
        f"union all select '{t}')),",
        f"p0 as materialized (select st, cast(case when st = '{t}' "
        "then 1000000 else 0 end as bigint) as p from states),",
    ]
    for k in range(1, rounds + 1):
        prev = f"p{k - 1}"
        sql.append(
            f"m{k} as (select e.s, cast(sum(e.n * pp.p) as bigint) "
            f"as mass, cast(sum(e.n) as bigint) as tot "
            f"from e join {prev} pp on e.d = pp.st group by e.s),")
        sql.append(
            f"p{k} as materialized (select st, cast(case "
            f"when st = '{t}' then 1000000 "
            f"when mass is not null then mass // tot "
            f"else 0 end as bigint) as p "
            f"from states left join m{k} on states.st = m{k}.s),")
    body = "\n".join(sql).rstrip()
    assert body.endswith("),")
    body = body[:-2] + ")"
    return body + (
        f"\nselect st as state, p as p_ppm,"
        f" cast(coalesce(n_out, 0) as bigint) as n_out"
        f" from p{rounds} left join outdeg on p{rounds}.st = outdeg.s")
