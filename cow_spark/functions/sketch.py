"""Mergeable cardinality sketches (HyperLogLog) with engine-portable
determinism.

The reference has no analytics layer at all (users point a SPARQL store
at its N-Quads); at 100 TB the first question about any freshly built
KG or crawl corpus is a cardinality profile — distinct subjects per
predicate, distinct users per event type, distinct domains per source —
and exact ``count(distinct)`` is a full shuffle of every key. Spark's
built-in ``approx_count_distinct`` answers it with HyperLogLog but its
register values are JVM-private, so nothing downstream can *audit* the
sketch, merge it with registers produced elsewhere, or replay it in
another engine.

This module rebuilds the sketch from first principles (Flajolet et al.
2007) on the repo's portable md5 hash, so the register table is a plain
DataFrame any engine reproduces bit-for-bit:

- ``hll_registers``: one partial-aggregated ``groupBy`` — at any corpus
  size the shuffle carries at most ``groups x m`` (register, max-rho)
  partials, never raw keys. That is the whole scale story: the exact
  distinct's shuffle is O(distinct keys); the sketch's is O(1) per
  group.
- ``hll_merge``: register-wise ``max`` — sketches from different
  sources/partitions/engines union losslessly (the property that makes
  per-shard profiling embarrassingly parallel).
- ``hll_estimate``: the standard raw/linear-counting estimator, in
  arithmetic chosen clause-by-clause to be bit-identical across Spark
  and DuckDB: the harmonic sum is an exact integer (``2^(50-rho)``
  units), the raw estimate is one IEEE double division of Python-folded
  constants (deterministic by IEEE-754), and the linear-counting branch
  runs on the repo's integer log2 kernel (no libm anywhere).

Determinism contract: registers with rho > 50 contribute 0 to the
harmonic sum — the same truncation in both engines; it only matters
beyond ~2^50 distincts per bucket, far past the sketch's useful range.
NULL keys are skipped, matching ``count(distinct)`` semantics.

Streaming: ``hll_registers`` is a plain groupBy/max, so it runs
unchanged as a Structured Streaming stateful aggregation — state is
the m-register table, not the key set, which is the whole point of
maintaining a live cardinality profile over an unbounded stream
(pinned by ``tests/test_sketch.py`` stream-equals-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import portable_hash60
from .intmath import log2_fp_py, with_log2_fp

HLL_SALT = "hll-v1"
#: fixed-point scale of the harmonic sum: empty register = 2^50 units
S_BITS = 50
#: ln(2) * 10^6, floored — fixed-point factor for the linear branch
LN2_FP = 693_147
_POW2 = [2 ** i for i in range(S_BITS + 1)]


def _alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    b: int = 6,
    salt: str = HLL_SALT,
) -> DataFrame:
    """``(group_cols..., bucket, r)`` — the HLL register table of the
    distinct ``key_col`` values per group: ``bucket`` = low ``b`` bits
    of the 60-bit md5 hash, ``r`` = max over keys of (leading-zero run
    of the remaining ``60 - b`` bits, plus 1).

    One groupBy with map-side combine; the shuffle payload per group is
    bounded by ``m = 2^b`` rows regardless of corpus size. NULL keys
    are dropped (``count(distinct)`` semantics).
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    w_bits = 60 - b
    hashed = (
        df.where(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            portable_hash60(
                F.concat_ws("\x1f", F.col(key_col).cast("string"),
                            F.lit(salt))).alias("_h"),
        )
        .select(
            *group_cols,
            (F.col("_h") % m).alias("bucket"),
            F.expr(f"_h div {m}").alias("_w"),
        )
    )
    rho = (
        F.when(F.col("_w") == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits + 1) - F.length(F.bin(F.col("_w"))))
        .cast("int")
    )
    return (
        hashed.select(*group_cols, "bucket", rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("r"))
    )


def hll_merge(regs: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union two (or more, pre-unioned) register tables losslessly:
    register-wise ``max`` per group. ``merge(regs(A) ∪ regs(B)) ==
    regs(A ∪ B)`` exactly — the property that lets per-shard sketches
    roll up without touching raw keys again."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("r").alias("r"))


def hll_estimate(
    regs: DataFrame,
    group_cols: tuple[str, ...] = (),
    b: int = 6,
) -> DataFrame:
    """Per-group estimate from a register table:

    ``(group_cols..., m, n_regs, v_empty, s_fp, est_raw, est_linear,
    est)`` where ``s_fp`` is the harmonic sum in exact ``2^-50`` units,
    ``est_raw = floor(alpha_m * m^2 * 2^50 / s_fp)``, ``est_linear`` is
    linear counting ``floor(m * ln(m / v_empty))`` on the integer log2
    kernel, and ``est`` applies the standard small-range switch (use
    linear counting when empty registers exist and the raw estimate is
    below ``2.5 m``). Every column is an exact integer except the two
    IEEE-deterministic floor()s, so a DuckDB replay is bit-identical.
    """
    m = 1 << b
    pow2 = F.array(*[F.lit(p) for p in _POW2])
    # alpha * m^2 * 2^50 folded in PYTHON to one double literal: both
    # engines then perform a single IEEE division + floor — the only
    # float math in the sketch, deterministic by IEEE-754
    c_raw = _alpha(m) * (m * m) * float(2 ** S_BITS)
    unit = F.when(
        F.col("r") <= S_BITS,
        F.element_at(pow2, (F.lit(S_BITS + 1) - F.col("r")).cast("int")),
    ).otherwise(F.lit(0)).cast("bigint")
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_regs"),
        F.sum(unit).alias("_s_used"),
    )
    agg = agg.select(
        *group_cols,
        F.lit(m).alias("m"),
        "n_regs",
        (F.lit(m) - F.col("n_regs")).alias("v_empty"),
        (F.col("_s_used")
         + (F.lit(m) - F.col("n_regs")).cast("bigint") * (2 ** S_BITS)
         ).alias("s_fp"),
    )
    est_raw = F.when(
        F.col("s_fp") > 0,
        F.floor(F.lit(c_raw) / F.col("s_fp")),
    ).cast("bigint")
    agg = agg.withColumn("est_raw", est_raw)
    # linear counting on the exact log2 kernel: ln(m/V) = (log2(m) -
    # log2(V)) * ln2;  log2_fp(m) = b << 10 exactly (power of two)
    agg = with_log2_fp(agg, "v_empty", "_l2v")
    assert log2_fp_py(m) == b << 10
    # integral `div`, not float-divide-then-floor: a double quotient a
    # hair under an integer can round UP across the floor boundary
    agg = agg.withColumn(
        "_lin_num",
        F.lit(m) * (F.lit(b << 10) - F.col("_l2v")) * F.lit(LN2_FP))
    agg = agg.withColumn(
        "est_linear",
        F.when(F.col("v_empty") >= 1,
               F.expr(f"_lin_num div {1024 * 1_000_000}")).cast("bigint"))
    chosen = (
        F.when(
            (F.col("v_empty") > 0) & (F.col("est_raw") < (5 * m) // 2),
            F.col("est_linear"),
        ).otherwise(F.col("est_raw"))
    )
    return agg.select(
        *group_cols, "m", "n_regs", "v_empty", "s_fp",
        "est_raw", "est_linear", chosen.alias("est"),
    )


def hll_py(values, b: int = 6, salt: str = HLL_SALT) -> dict[int, int]:
    """Pure-Python register twin (tests): ``{bucket: r}``."""
    import hashlib

    m = 1 << b
    w_bits = 60 - b
    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(
            f"{v}\x1f{salt}".encode()).hexdigest()[:15], 16)
        bucket, w = h % m, h // m
        rho = w_bits + 1 if w == 0 else w_bits + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def hll_estimate_py(regs: dict[int, int], b: int = 6) -> dict:
    """Pure-Python estimate twin of :func:`hll_estimate`."""
    import math

    m = 1 << b
    v_empty = m - len(regs)
    s_fp = v_empty * (2 ** S_BITS) + sum(
        2 ** (S_BITS - r) for r in regs.values() if r <= S_BITS)
    c_raw = _alpha(m) * (m * m) * float(2 ** S_BITS)
    est_raw = math.floor(c_raw / s_fp) if s_fp > 0 else None
    est_linear = (
        m * ((b << 10) - log2_fp_py(v_empty)) * LN2_FP
        // (1024 * 1_000_000)
        if v_empty >= 1 else None
    )
    est = (est_linear
           if v_empty > 0 and est_raw is not None and est_raw < (5 * m) // 2
           else est_raw)
    return {"m": m, "n_regs": len(regs), "v_empty": v_empty, "s_fp": s_fp,
            "est_raw": est_raw, "est_linear": est_linear, "est": est}


# ---------------------------------------------------------------------------
# Bloom filter (portable, auditable membership sketch)
# ---------------------------------------------------------------------------

BLOOM_SALT = "bloom-v1"
#: bits per filter word — 63, not 64: bit 63 of a signed bigint is the
#: sign, and 1<<63 overflows/wraps differently across engines
WORD_BITS = 63
_WPOW2 = [2 ** i for i in range(WORD_BITS)]


def _bloom_positions(key, n_bits: int, k_hashes: int, salt: str):
    """k probe positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod n_bits from two md5 draws — portable and
    2 hashes per key instead of k. Returns a Column array<bigint>."""
    h1 = portable_hash60(F.concat_ws("\x1f", key, F.lit(salt), F.lit("a")))
    h2 = portable_hash60(F.concat_ws("\x1f", key, F.lit(salt), F.lit("b")))
    # reduce BEFORE the multiply: (h1 + i*h2) with h2 ~ 2^60 and i < 16
    # stays under 2^63, but only if h1/h2 are first taken mod n_bits
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda i: (h1 % n_bits + i * (h2 % n_bits)) % n_bits,
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 17,
    k_hashes: int = 5,
    salt: str = BLOOM_SALT,
) -> DataFrame:
    """Build a Bloom filter over the distinct ``key_col`` values as a
    plain ``(word_idx, bits)`` table — ``ceil(n_bits/63)`` rows total,
    independent of corpus size.

    Why as a DataFrame: at 100 TB the filter IS the semi-join
    optimization — build it over the right side's keys (one map-side
    pass + a bit_or aggregate whose shuffle is filter-sized, not
    key-sized), broadcast it, and pre-drop left rows before the real
    join. Spark's runtime bloom pushdown does this invisibly when the
    planner feels like it; this one is explicit, persistable next to
    the dataset it summarizes, mergeable across shards (bit_or of the
    word tables), and bit-reproducible in any engine with md5 (the
    DuckDB oracle replays it exactly).

    ``n_bits`` is a FIXED design parameter, not derived from the data
    (a count-dependent size would make the sketch irreproducible);
    size it for the expected key count (~10 bits/key for ~1% FPR at
    k=5-7). NULL keys are skipped.
    """
    if n_bits < WORD_BITS:
        raise ValueError(f"n_bits must be >= {WORD_BITS}, got {n_bits}")
    wpow2 = F.array(*[F.lit(p) for p in _WPOW2])
    pos = df.where(F.col(key_col).isNotNull()).select(
        F.explode(_bloom_positions(
            F.col(key_col).cast("string"), n_bits, k_hashes, salt)
        ).alias("_pos"))
    return (
        pos.select(
            F.expr(f"_pos div {WORD_BITS}").alias("word_idx"),
            F.element_at(
                wpow2, (F.col("_pos") % WORD_BITS + 1).cast("int"))
            .alias("_bit"))
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_probe(
    queries: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = 1 << 17,
    k_hashes: int = 5,
    salt: str = BLOOM_SALT,
) -> DataFrame:
    """Annotate ``queries`` with ``maybe_present`` (1 = all k probe
    bits set — present or false positive; 0 = definitely absent).

    The filter table is broadcast (word-count rows); each query row
    explodes to its k probe positions, one hash equi-join on
    ``word_idx``, then an all-bits-set re-aggregation per query. The
    corpus/query side is never shuffled on key. Build and probe MUST
    share ``n_bits``/``k_hashes``/``salt`` — a mismatch silently
    probes the wrong positions, so pin them in one place.
    """
    wpow2 = F.array(*[F.lit(p) for p in _WPOW2])
    probes = queries.select(
        "*",
        F.posexplode(_bloom_positions(
            F.col(key_col).cast("string"), n_bits, k_hashes, salt))
        .alias("_i", "_pos"))
    probes = probes.select(
        *queries.columns, "_i",
        F.expr(f"_pos div {WORD_BITS}").alias("word_idx"),
        F.element_at(wpow2, (F.col("_pos") % WORD_BITS + 1).cast("int"))
        .alias("_bit"))
    joined = probes.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0))
           .bitwiseAND(F.col("_bit")) == F.col("_bit")).cast("int")
    return (
        joined.groupBy(*queries.columns)
        .agg(F.min(hit).alias("maybe_present"))
    )


def bloom_py(values, n_bits: int = 1 << 17, k_hashes: int = 5,
             salt: str = BLOOM_SALT) -> dict[int, int]:
    """Pure-Python twin of :func:`bloom_build`: ``{word_idx: bits}``."""
    import hashlib

    words: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h1 = int(hashlib.md5(
            f"{v}\x1f{salt}\x1fa".encode()).hexdigest()[:15], 16)
        h2 = int(hashlib.md5(
            f"{v}\x1f{salt}\x1fb".encode()).hexdigest()[:15], 16)
        for i in range(k_hashes):
            pos = (h1 % n_bits + i * (h2 % n_bits)) % n_bits
            w, b = pos // WORD_BITS, pos % WORD_BITS
            words[w] = words.get(w, 0) | (1 << b)
    return words


# ---------------------------------------------------------------------------
# Count-min sketch (portable frequency sketch)
# ---------------------------------------------------------------------------

CMS_SALT = "cms-v1"


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 2048,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over ``key_col``
    as a plain ``(row_idx, col_idx, c)`` table — ``depth x width``
    cells max, independent of corpus size or key cardinality.

    The frequency complement of the HLL/Bloom family: point-frequency
    estimates with one-sided error (never under-counts) over a key
    domain too large to count exactly — per-domain hit counts, hot
    entities for skew planning, n-gram frequencies. The shuffle
    carries at most depth·width partials (map-side combined); exact
    counting shuffles every distinct key. Sketches merge by cell-wise
    SUM (linear — unlike Bloom/HLL's idempotent or/max, adding a shard
    twice double-counts). ``weight_col`` aggregates arbitrary
    non-negative integer weights instead of row counts. NULL keys are
    skipped.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"depth >= 1 and width >= 2 required, "
                         f"got {depth}x{width}")
    w = (F.col(weight_col).cast("bigint") if weight_col
         else F.lit(1).cast("bigint"))
    rows = df.where(F.col(key_col).isNotNull()).select(
        w.alias("_w"),
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: portable_hash60(F.concat_ws(
                "\x1f", F.col(key_col).cast("string"), F.lit(salt),
                i.cast("string"))) % width)).alias("row_idx", "col_idx"),
    )
    return (rows.groupBy("row_idx", "col_idx")
            .agg(F.sum("_w").alias("c")))


def cms_query(
    queries: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Annotate ``queries`` with ``est_count`` = min over the sketch's
    depth rows (0 when a cell was never touched). Broadcast join on
    the (row, col) cell key; the query side never shuffles. Build and
    query must share depth/width/salt."""
    probes = queries.select(
        "*",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: portable_hash60(F.concat_ws(
                "\x1f", F.col(key_col).cast("string"), F.lit(salt),
                i.cast("string"))) % width)).alias("row_idx", "col_idx"),
    )
    joined = probes.join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
    return (joined.groupBy(*queries.columns)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .alias("est_count")))


def cms_py(pairs, depth: int = 4, width: int = 2048,
           salt: str = CMS_SALT) -> dict[tuple[int, int], int]:
    """Pure-Python twin of :func:`cms_build` over (key, weight)."""
    import hashlib

    cells: dict[tuple[int, int], int] = {}
    for k, w in pairs:
        if k is None:
            continue
        for i in range(depth):
            h = int(hashlib.md5(
                f"{k}\x1f{salt}\x1f{i}".encode()).hexdigest()[:15], 16)
            cell = (i, h % width)
            cells[cell] = cells.get(cell, 0) + w
    return cells


# ---------------------------------------------------------------------------
# Histogram quantile sketch — the order-statistics member of the sketch
# family (HLL = cardinality, Bloom = membership, CMS = frequency, this =
# quantiles). Spark's approx_percentile answers the same question but its
# KLL state is JVM-private; this sketch is a plain (group, bucket, c)
# DataFrame any engine reproduces bit-for-bit, merges by cell-wise SUM
# (linear, like CMS), and replays in DuckDB.
#
# Bucketing is HDR-histogram style, pure integer: values are floor-scaled
# to ints, |v| < 2^k maps to itself (exact), larger values keep the top
# k+1 significant bits — relative error <= 2^-k on every estimate, with
# the bucket id a monotone function of the value so quantiles are order-
# exact over buckets. Negatives mirror to bucket(-|v|) = -bucket(|v|)-1.
# Bit length comes from length(bin(x)) — identical (no leading zeros) in
# Spark and DuckDB. Domain bound: |value|*scale must fit a signed 64-bit
# int (the floor-scale convention used repo-wide).

HIST_K = 5


def _hist_stage(vi, k: int):
    """Column stages (au, e, bucket) for a scaled long value ``vi``."""
    lim = 1 << k
    au = F.abs(vi)
    e = F.length(F.bin(au)) - F.lit(1)
    return au, e, lim


def hist_build(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    scale: int = 100,
    k: int = HIST_K,
) -> DataFrame:
    """``(group..., bucket, c)`` — the mergeable quantile sketch. One
    partial-aggregated groupBy: the shuffle carries at most
    ``groups x buckets`` partials (buckets <= 2^(k+1) per power of two
    of range — a few hundred total), never raw values. NULL values are
    skipped, matching ``percentile``'s semantics."""
    lim = 1 << k
    vi = F.floor(F.col(value_col) * scale).cast("long")
    staged = (df.where(F.col(value_col).isNotNull())
              .select(*group_cols, vi.alias("vi"))
              .select("*", F.abs(F.col("vi")).alias("au"))
              .select("*", (F.length(F.bin("au")) - 1).alias("e")))
    pb = F.when(F.col("au") < lim, F.col("au")).otherwise(
        (F.col("e") - k + 1) * lim
        + F.expr(f"shiftright(au, cast(e - {k} as int))") - lim)
    bucket = F.when(F.col("vi") >= 0, pb).otherwise(-pb - 1)
    return (staged.select(*group_cols, bucket.alias("bucket"))
            .groupBy(*group_cols, "bucket")
            .agg(F.count("*").alias("c")))


def hist_merge(hist: DataFrame,
               group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union shard sketches by cell-wise SUM (linear — double-adding a
    shard double-counts, exactly like :func:`cms_build` shards)."""
    return (hist.groupBy(*group_cols, "bucket")
            .agg(F.sum("c").alias("c")))


def hist_quantiles(
    hist: DataFrame,
    percents: tuple[int, ...] = (50, 90, 99),
    group_cols: tuple[str, ...] = (),
    k: int = HIST_K,
) -> DataFrame:
    """``(group..., p<P>_fp ...)`` — per-group quantile estimates in the
    SCALED integer domain (divide by the build scale outside if a float
    is wanted; kept integer here so engines can't diverge). Estimate =
    the bucket's scaled-domain upper bound at the first bucket whose
    cumulative count reaches ceil(p/100 * n) — the classic inverted-CDF
    definition over buckets, conservative by <= 2^-k relative error.
    One sort of the bucket-sized table; no touch of the raw data."""
    from pyspark.sql.window import Window

    lim = 1 << k
    # stage pb (positive-domain bucket) and its (shift, m) decomposition
    # as real columns so the shiftleft exprs read them by name
    pre = (hist.select(
        *group_cols, "bucket", "c",
        F.when(F.col("bucket") >= 0, F.col("bucket"))
         .otherwise(-F.col("bucket") - 1).alias("pb"))
        .select("*",
                (F.floor(F.col("pb") / lim).cast("long") - 1).alias("sh"),
                (F.col("pb") % lim).alias("m")))
    # large-path bounds: hi = ((lim + m + 1) << (e-k)) - 1,
    #                    lo = (lim + m) << (e-k); sh = e - k
    pos_hi = F.when(F.col("pb") < lim, F.col("pb")).otherwise(
        F.expr(f"shiftleft(cast({lim} + m + 1 as bigint), "
               f"cast(sh as int))") - 1)
    pos_lo = F.when(F.col("pb") < lim, F.col("pb")).otherwise(
        F.expr(f"shiftleft(cast({lim} + m as bigint), cast(sh as int))"))
    hi_fp = F.when(F.col("bucket") >= 0, pos_hi).otherwise(-pos_lo)

    w_ord = (Window.partitionBy(*[F.col(c) for c in group_cols])
             .orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*[F.col(c) for c in group_cols])
    staged = (pre.select(*group_cols, "bucket", "c",
                         hi_fp.alias("hi_fp"))
              .select("*", F.sum("c").over(w_ord).alias("cum"),
                      F.sum("c").over(w_all).alias("n")))
    aggs = [F.min(F.when(F.col("cum") * 100 >= F.col("n") * p,
                         F.col("hi_fp"))).alias(f"p{p}_fp")
            for p in percents]
    return staged.groupBy(*group_cols).agg(*aggs)


def hist_py(values, scale: int = 100, k: int = HIST_K) -> dict[int, int]:
    """Pure-Python twin of :func:`hist_build` (single group)."""
    import math

    lim = 1 << k
    out: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        vi = math.floor(v * scale)
        au = abs(vi)
        if au < lim:
            pb = au
        else:
            e = au.bit_length() - 1
            pb = (e - k + 1) * lim + (au >> (e - k)) - lim
        b = pb if vi >= 0 else -pb - 1
        out[b] = out.get(b, 0) + 1
    return out


def hist_quantiles_py(bucket_counts: dict[int, int],
                      percents=(50, 90, 99), k: int = HIST_K):
    """Pure-Python twin of :func:`hist_quantiles` (single group)."""
    lim = 1 << k

    def hi(b: int) -> int:
        pb = b if b >= 0 else -b - 1
        if pb < lim:
            ph, pl = pb, pb
        else:
            t = pb // lim
            e = t + k - 1
            m = pb % lim
            ph = ((lim + m + 1) << (e - k)) - 1
            pl = (lim + m) << (e - k)
        return ph if b >= 0 else -pl

    items = sorted(bucket_counts.items())
    n = sum(c for _, c in items)
    res = {}
    for p in percents:
        cum = 0
        val = None
        for b, c in items:
            cum += c
            if cum * 100 >= n * p:
                val = hi(b)
                break
        res[f"p{p}_fp"] = val
    return res


KMV_BITS = 44          # hash space [0, 2^44): (k-1)*2^44 stays << 2^63
KMV_SPACE = 1 << KMV_BITS


def kmv_distinct(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    k: int = 64,
    shards: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) distinct-count sketch
    per group — the ORDER-STATISTIC sibling of the HLL profile above.
    Where HLL only unions, a KMV sketch supports intersection/Jaccard
    estimates between groups (the k smallest hashes are a uniform
    sample of each set), which is why theta sketches are the
    warehouse-standard for audience-overlap questions.

    Deterministic md5 hashing capped to 44 bits (``pmod``, the
    prefix_duplicates discipline — (k−1)·2^44 must stay inside int64
    under ANSI); estimate = (k−1)·2^44 div h_k, the unbiased KMV
    estimator, EXACT (= n) whenever a group holds fewer than k
    distinct values.

    Scale shape: min-k is not a partial aggregate in the DataFrame
    API, so it runs as TWO bounded window passes — per (group,
    hash-shard) row_number keeps ≤ k·shards rows per group with task
    size |group distincts|/shards, then the per-group pass sorts ≤
    k·shards rows. The k smallest of a union are each among the k
    smallest of their shard, so the split is lossless; ``shards``
    scales with corpus (4096 at 100 TB), never with k. No collect_set
    (whose per-group state is distinct-count-sized), no global sort.

    Returns ``(group…, n_kept, kmv_threshold, est_distinct)`` — keep
    n_kept/threshold: they ARE the mergeable sketch state (union =
    min-k of concatenated sketches, see the pytest pin).
    """
    if k < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    g = [F.col(c) for c in group_cols]
    h = F.pmod(
        portable_hash60(F.concat(F.lit("kmv|"),
                                 F.col(value_col).cast("string"))),
        F.lit(KMV_SPACE)).alias("_h")
    dist = (df.where(F.col(value_col).isNotNull())
            .select(*g, h).distinct())
    w1 = (Window.partitionBy(*group_cols,
                             F.pmod(F.col("_h"), F.lit(shards)))
          .orderBy("_h"))
    w2 = Window.partitionBy(*group_cols).orderBy("_h")
    kept = (dist.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k)
            .withColumn("_r2", F.row_number().over(w2))
            .where(F.col("_r2") <= k))
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"({k - 1} * {KMV_SPACE}L) div greatest(1L, kmv_threshold)"))
    return (kept.groupBy(*group_cols)
            .agg(F.count("*").cast("long").alias("n_kept"),
                 F.max("_h").alias("kmv_threshold"))
            .select(*group_cols, "n_kept", "kmv_threshold",
                    est.cast("long").alias("est_distinct")))


def kmv_distinct_oracle_sql(
    rows_sql: str,
    group_cols: tuple[str, ...],
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_distinct`. ``rows_sql`` must yield the
    group columns plus a ``v`` varchar value column. One row_number
    pass replaces the two-level shard split (provably the same k
    minima); sums/counts cast to BIGINT (the HUGEINT class)."""
    from .hashing import portable_hash60_sql

    gl = ", ".join(group_cols)
    h = portable_hash60_sql("concat('kmv|', v)")
    return f"""
with r as materialized ({rows_sql}),
d as materialized (
  select distinct {gl}, {h} % {KMV_SPACE} as h
  from r where v is not null),
t as (
  select {gl}, h,
         row_number() over (partition by {gl} order by h) as rn
  from d)
select {gl}, cast(count(*) as bigint) as n_kept,
       cast(max(h) as bigint) as kmv_threshold,
       cast(case when count(*) < {k} then count(*)
            else ({k - 1} * {KMV_SPACE}) // greatest(1, max(h))
            end as bigint) as est_distinct
from t where rn <= {k}
group by {gl}
"""


def kmv_jaccard(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    shards: int = 64,
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups from
    their KMV sketches — the operation HLL cannot do and the reason
    theta sketches exist: the bottom-k hashes of a set are a uniform
    sample, so within the union's bottom-k the fraction present in
    both sets estimates Jaccard, and intersection = J · |A ∪ B|.

        jaccard_ppm = 10^6 · |bottom-k(A∪B) ∩ A ∩ B| div k_u
        est_inter   = jaccard_ppm · est_union div 10^6

    with k_u = |bottom-k(A∪B)| (exact when the union is smaller than
    k, in which case est_union is exact too). All floors replay in
    DuckDB bit-for-bit.

    Scale shape: per-group bottom-k via the :func:`kmv_distinct`
    shard→merge window pair (bounded tasks); the pair stage works on
    SKETCHES only — group_pairs × 2k rows, never data × data. Group
    count is the caller's contract (profile dimensions: sources,
    languages, splits — dozens, not millions); the output is
    |groups|²/2 rows.

    Returns ``(g1, g2, k_union, n_both, est_union, est_inter,
    jaccard_ppm)`` for every unordered group pair with g1 < g2.
    """
    if k < 2:
        raise ValueError(f"kmv_jaccard: k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    h = F.pmod(
        portable_hash60(F.concat(F.lit("kmv|"),
                                 F.col(value_col).cast("string"))),
        F.lit(KMV_SPACE)).alias("_h")
    dist = (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("g"), h).distinct())
    w1 = (Window.partitionBy("g", F.pmod(F.col("_h"), F.lit(shards)))
          .orderBy("_h"))
    w2 = Window.partitionBy("g").orderBy("_h")
    kept = (dist.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k)
            .withColumn("_r2", F.row_number().over(w2))
            .where(F.col("_r2") <= k)
            .select("g", "_h"))
    gs = kept.select("g").distinct()
    pairs = (gs.select(F.col("g").alias("g1"))
             .join(gs.select(F.col("g").alias("g2")),
                   F.col("g1") < F.col("g2")))
    # per pair: union of the two sketches' values, flagged by side
    u = (pairs.join(kept.select(F.col("g").alias("g1"),
                                F.col("_h").alias("h1")), "g1")
         .select("g1", "g2", F.col("h1").alias("_h"),
                 F.lit(1).alias("_a"), F.lit(0).alias("_b"))
         .unionByName(
             pairs.join(kept.select(F.col("g").alias("g2"),
                                    F.col("_h").alias("h2")), "g2")
             .select("g1", "g2", F.col("h2").alias("_h"),
                     F.lit(0).alias("_a"), F.lit(1).alias("_b")))
         .groupBy("g1", "g2", "_h")
         .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b")))
    wp = Window.partitionBy("g1", "g2").orderBy("_h")
    topu = (u.withColumn("_r", F.row_number().over(wp))
            .where(F.col("_r") <= k))
    agg = (topu.groupBy("g1", "g2")
           .agg(F.count("*").cast("long").alias("k_union"),
                F.max("_h").alias("_hk"),
                F.sum((F.col("_a") * F.col("_b"))).cast("long")
                .alias("n_both")))
    est_u = F.when(
        F.col("k_union") < k, F.col("k_union")).otherwise(
        F.expr(f"({k - 1} * {KMV_SPACE}L) div greatest(1L, _hk)"))
    out = agg.select(
        "g1", "g2", "k_union", "n_both",
        est_u.cast("long").alias("est_union"),
        F.expr("(n_both * 1000000) div k_union").alias("jaccard_ppm"))
    return out.select(
        "g1", "g2", "k_union", "n_both", "est_union",
        F.expr("(jaccard_ppm * est_union) div 1000000").cast("long")
        .alias("est_inter"),
        F.col("jaccard_ppm").cast("long").alias("jaccard_ppm"))


def kmv_jaccard_oracle_sql(rows_sql: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_jaccard`. ``rows_sql`` must yield
    (g, v)."""
    from .hashing import portable_hash60_sql

    h = portable_hash60_sql("concat('kmv|', v)")
    return f"""
with r as materialized ({rows_sql}),
d as materialized (
  select distinct g, {h} % {KMV_SPACE} as h
  from r where v is not null),
kept as materialized (
  select g, h from (
    select g, h, row_number() over (partition by g order by h) as rn
    from d) t where rn <= {k}),
gs as (select distinct g from kept),
pairs as materialized (
  select a.g as g1, b.g as g2
  from gs a join gs b on a.g < b.g),
u as materialized (
  select g1, g2, h, max(a) as a, max(b) as b from (
    select p.g1, p.g2, kk.h, 1 as a, 0 as b
    from pairs p join kept kk on kk.g = p.g1
    union all
    select p.g1, p.g2, kk.h, 0, 1
    from pairs p join kept kk on kk.g = p.g2
  ) group by g1, g2, h),
topu as (
  select * from (
    select g1, g2, h, a, b,
           row_number() over (partition by g1, g2 order by h) as rn
    from u) t where rn <= {k}),
agg as (
  select g1, g2, cast(count(*) as bigint) as k_union,
         cast(max(h) as bigint) as hk,
         cast(sum(a * b) as bigint) as n_both
  from topu group by g1, g2)
select g1, g2, k_union, n_both,
       cast(case when k_union < {k} then k_union
            else ({k - 1} * {KMV_SPACE}) // greatest(1, hk)
            end as bigint) as est_union,
       cast(((n_both * 1000000) // k_union)
            * (case when k_union < {k} then k_union
               else ({k - 1} * {KMV_SPACE}) // greatest(1, hk) end)
            // 1000000 as bigint) as est_inter,
       cast((n_both * 1000000) // k_union as bigint) as jaccard_ppm
from agg
"""


def ams_f2(
    df: DataFrame,
    val_col: str,
    estimators: int = 32,
    salt: str = "ams",
) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-moment sketch: estimate
    F₂ = Σ_v f(v)² — the self-join size of the value column — from
    one pass, WITHOUT building the frequency table. The planning
    use-case: F₂/n is the expected fan-out of an equi-join on this
    key, so the sketch prices a join or a groupBy skew BEFORE running
    it (the sampling sibling of :func:`~..plans.stats.join_estimate`,
    mergeable like every sketch here: per-shard Z vectors just add).

    Each estimator j keeps Z_j = Σ_rows sign_j(v) with four-wise-ish
    independent ±1 signs from the portable md5 (training-free,
    engine-replayable); E[Z_j²] = F₂. The estimate is the exact
    lower-middle MEDIAN of the Z² values (the repo's no-interpolation
    rank spec) — median-of-individuals is the variance-tamed classic;
    callers needing tighter bounds raise ``estimators``.

    Exact surface: signs, sums, squares, and the median rank are all
    integers — the sketch is bit-replayable in DuckDB, and the
    pytest checks the estimate against exact F₂ within the AMS error
    bound on a skewed fixture. Overflow: |Z| ≤ n rows ⇒ Z² < 2⁶³ for
    n < 3·10⁹ per shard.

    Shape: one explode by the estimator count (rows × ``estimators``
    — the honest sketch cost, map-side combinable) into an
    ``estimators``-sized aggregate; the median rides a 1-partition
    sort of ``estimators`` rows. Returns one row
    ``(n_rows, n_estimators, f2_est)``.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if estimators < 1:
        raise ValueError(f"estimators must be >= 1, got {estimators}")
    from .hashing import portable_hash32

    base = (df.select(F.col(val_col).cast("string").alias("v"))
            .where(F.col(val_col).isNotNull()))
    ex = base.select(
        "v", F.explode(F.sequence(
            F.lit(0), F.lit(int(estimators) - 1))).alias("j"))
    sign = 1 - 2 * F.pmod(portable_hash32(F.concat_ws(
        "\x1f", F.lit(salt), F.col("j").cast("string"), F.col("v"))),
        F.lit(2))
    z = (ex.groupBy("j")
         .agg(F.sum(sign).cast("long").alias("z"),
              F.count("*").cast("long").alias("n")))
    zz = z.select("j", "n", (F.col("z") * F.col("z")).alias("z2"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("z2").asc())
    ranked = (zz.withColumn("_rn", F.row_number().over(w))
              .withColumn("_m", F.count(F.lit(1)).over(
                  Window.partitionBy())))
    med_i = F.expr("((_m - 1) * 500000) div 1000000") + 1
    return ranked.agg(
        F.max("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_estimators"),
        F.max(F.when(F.col("_rn") == med_i, F.col("z2")))
        .cast("long").alias("f2_est"))


def ams_f2_oracle_sql(vals_sql: str, estimators: int = 32,
                      salt: str = "ams") -> str:
    """DuckDB twin of :func:`ams_f2`; ``vals_sql`` yields ``(v)``."""
    from .hashing import portable_hash32_sql

    h = portable_hash32_sql(
        f"'{salt}' || chr(31) || cast(j as varchar) || chr(31) || v")
    return f"""
with base as (
  select cast(v as varchar) as v from ({vals_sql})
  where v is not null),
ex as (
  select v, unnest(generate_series(0, {int(estimators) - 1})) as j
  from base),
z as (
  select j, cast(sum(1 - 2 * ({h} % 2)) as bigint) as z,
         cast(count(*) as bigint) as n
  from ex group by j),
zz as (
  select j, n, z * z as z2,
         row_number() over (order by z * z) as rn,
         count(*) over () as m
  from z)
select cast(max(n) as bigint) as n_rows,
       cast(count(*) as bigint) as n_estimators,
       cast(max(case when rn = ((m - 1) * 500000) // 1000000 + 1
                then z2 end) as bigint) as f2_est
from zz
"""
