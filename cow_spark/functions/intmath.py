"""Exact fixed-point integer math kernels.

``log2_fp`` computes ``~floor(2^frac_bits * log2(v))`` for integer v >= 1
with PURE integer arithmetic (bit-length + Q30 mantissa squaring) — no
libm anywhere, so Spark and DuckDB produce bit-identical values where a
float ``log()`` differs in the last ulp across platforms and flips
floor() boundaries. Deviation from the mathematical floor is at most 1
unit (mantissa truncation), and — the property that matters — it is the
SAME deviation in every engine.

The mantissa-squaring recurrence reuses its state each step, so it
cannot be one nested Column expression (the tree would double per step);
:func:`with_log2_fp` stages each step as a real column. Intended for
vocabulary-sized frames (term statistics, model tables), where 10 staged
integer columns are free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q = 30          # mantissa fixed-point: m in [2^30, 2^31)
_POW2 = [2 ** i for i in range(63)]


def with_log2_fp(df: DataFrame, src: str, out: str,
                 frac_bits: int = 10) -> DataFrame:
    """Add ``out`` = fixed-point log2 of integer column ``src`` (>= 1),
    in units of ``1 / 2**frac_bits`` bits. Rows where ``src`` is NULL
    or < 1 get NULL."""
    pow2 = F.array(*[F.lit(p) for p in _POW2])
    v = F.col(src).cast("bigint")
    b = (F.length(F.bin(v)) - 1).alias("_l2b")
    df = df.withColumn("_l2b", b)
    m0 = F.when(
        F.col("_l2b") <= Q,
        v * F.element_at(pow2, (Q + 1 - F.col("_l2b")).cast("int"))
    ).otherwise(
        F.expr(f"{src} div element_at("
               f"array({', '.join(str(p) + 'L' for p in _POW2)}), "
               f"cast(_l2b - {Q - 1} as int))"))
    df = df.withColumn("_l2m", m0).withColumn("_l2f", F.lit(0).cast("bigint"))
    for _ in range(frac_bits):
        m2 = F.expr(f"(_l2m * _l2m) div {2 ** Q}")
        hi = m2 >= 2 ** (Q + 1)
        df = (df.withColumn("_l2f",
                            F.col("_l2f") * 2 + F.when(hi, 1).otherwise(0))
              .withColumn("_l2m",
                          F.when(hi, F.expr(f"((_l2m * _l2m) div {2 ** Q}) div 2"))
                          .otherwise(m2).cast("bigint")))
    return (
        df.withColumn(
            out,
            F.when(v >= 1,
                   F.col("_l2b") * (2 ** frac_bits) + F.col("_l2f"))
            .otherwise(F.lit(None).cast("bigint")))
        .drop("_l2b", "_l2m", "_l2f")
    )


def log2_fp_py(v: int, frac_bits: int = 10) -> int:
    """Python twin of :func:`with_log2_fp` (tests, driver-side checks)."""
    if v < 1:
        raise ValueError("log2_fp_py requires v >= 1")
    b = v.bit_length() - 1
    m = v * (1 << (Q - b)) if b <= Q else v // (1 << (b - Q))
    frac = 0
    for _ in range(frac_bits):
        m = (m * m) >> Q
        frac <<= 1
        if m >= (1 << (Q + 1)):
            frac |= 1
            m >>= 1
    return (b << frac_bits) + frac


_ISQRT_MAX_T = 3037000499  # floor(sqrt(2^63 - 1)); (t+1)^2 would overflow


def isqrt_col(x: Column) -> Column:
    """Exact ``floor(sqrt(x))`` for bigint ``0 <= x < 2^63`` as a pure
    Column (NULL for negative/NULL input). The libm double sqrt seeds
    within ±1 of the true floor (int64→double conversion and IEEE sqrt
    are both correctly rounded in every engine: absolute error ≤
    sqrt(x)·2^-52 < 10^-6), then two integer correction rounds pin the
    exact value — the result is engine-independent even where the
    double seed is not. The seed subtree is duplicated by the
    corrections; that is fine (one libm call, bounded fan-out).

    The increment guard ``t < _ISQRT_MAX_T`` keeps ``(t+1)^2`` inside
    int64 under ANSI mode (CASE evaluates lazily in both engines).
    """

    def _fix(t: Column) -> Column:
        up = (F.when(t < _ISQRT_MAX_T,
                     F.when((t + 1) * (t + 1) <= x, F.lit(1))
                     .otherwise(F.lit(0)))
              .otherwise(F.lit(0)))
        down = F.when(t * t > x, F.lit(1)).otherwise(F.lit(0))
        return t + up - down

    seed = F.least(F.floor(F.sqrt(x.cast("double"))).cast("bigint"),
                   F.lit(_ISQRT_MAX_T))
    return F.when(x >= 0, _fix(_fix(seed)).cast("bigint"))


def isqrt_seed_sql(x: str) -> str:
    """DuckDB seed for :func:`isqrt_col`: double sqrt, floored, capped.
    Stage the result as a CTE column, then apply :func:`isqrt_fix_sql`
    twice (each round references its input ~5×, so staging keeps the
    SQL linear instead of 25× duplicated)."""
    return (f"least(cast(floor(sqrt(cast({x} as double))) as bigint), "
            f"{_ISQRT_MAX_T})")


def isqrt_fix_sql(t: str, x: str) -> str:
    """One integer correction round of :func:`isqrt_col` in DuckDB SQL;
    ``t``/``x`` should be simple column references."""
    up = (f"(case when {t} < {_ISQRT_MAX_T} then "
          f"(case when ({t} + 1) * ({t} + 1) <= {x} then 1 else 0 end) "
          f"else 0 end)")
    down = f"(case when {t} * {t} > {x} then 1 else 0 end)"
    return f"({t} + {up} - {down})"


def log2_fp_sql(e: str) -> str:
    """DuckDB rendering of :func:`with_log2_fp` (frac_bits=10): bit-length
    integer part + 10 Q30 mantissa-squaring steps via list_reduce. NB the
    struct_pack field ORDER: DuckDB evaluates the lambda's fields
    sequentially and a later field sees the earlier field's reassignment
    of ``acc.m`` — ``f`` must come before ``m``."""
    pow2 = "[" + ", ".join(str(2 ** i) for i in range(63)) + "]"
    b = f"(length(bin(cast({e} as bigint))) - 1)"
    m0 = (f"(case when {b} <= 30 "
          f"then cast({e} as bigint) * ({pow2})[31 - {b}] "
          f"else cast({e} as bigint) // ({pow2})[{b} - 29] end)")
    red = (
        "list_reduce(list_transform(range(11), "
        f"i -> struct_pack(m := {m0}, f := cast(0 as bigint))), "
        "(acc, x) -> struct_pack("
        "f := acc.f * 2 + case when ((acc.m * acc.m) // 1073741824) "
        ">= 2147483648 then 1 else 0 end, "
        "m := case when ((acc.m * acc.m) // 1073741824) >= 2147483648 "
        "then ((acc.m * acc.m) // 1073741824) // 2 "
        "else ((acc.m * acc.m) // 1073741824) end))"
    )
    return f"({b} * 1024 + ({red}).f)"
