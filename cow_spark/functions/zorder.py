"""Z-order (Morton) interleaving for multi-dimensional data layout.

Why this exists at 100 TB: parquet/Iceberg file skipping prunes on
per-file min/max column statistics. Sorting a table by ONE key gives
that key tight per-file ranges and leaves every other dimension
spanning the full domain in every file — a filter on the second
dimension prunes nothing. Interleaving the bits of d bucketized
dimensions into one sort key (the Morton / Z space-filling curve) gives
EVERY participating dimension locality: each file covers a small
hyper-rectangle, so min/max stats prune on any of them. This is the
same layout strategy Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``,
built here from plain column expressions (no per-row Python, no UDF).

The curve key is pure integer bit arithmetic, so the DuckDB oracle
replays it bit-exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(dims: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each dimension column into
    one Morton key (dimension j contributes bit i to output bit
    ``i*d + j`` — dim 0 owns the least-significant lane).

    Inputs must be non-negative integers already bucketized to
    ``< 2**bits`` (use :func:`bucketize`); values are masked to
    ``bits`` width, so out-of-range inputs wrap rather than collide
    across lanes. ``d * bits`` must fit a long (≤ 63). The expansion is
    a flat ``d*bits``-term bitwise-OR tree — small enough to stay
    inside whole-stage codegen (unlike dim-64 vector unrolls; see
    simsearch.py's measured dead end, this is ≤ 64 cheap terms).
    """
    d = len(dims)
    if d < 1:
        raise ValueError("zvalue needs at least one dimension")
    if d * bits > 63:
        raise ValueError(f"{d} dims x {bits} bits exceeds a long")
    terms = [
        F.shiftleft(
            F.shiftright(dim.cast("long"), i).bitwiseAND(F.lit(1)),
            i * d + j)
        for j, dim in enumerate(dims)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue_sql(dim_exprs: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zvalue` over SQL expressions (same bit
    layout). Every term is individually parenthesized: DuckDB follows
    PostgreSQL in giving ALL bitwise operators one precedence level with
    left associativity, so an unparenthesized ``a << 1 | b << 3`` chain
    reassociates into nested shifts (observed: shift-overflow errors and
    garbage keys)."""
    d = len(dim_exprs)
    terms = [
        f"(((({e}) >> {i}) & 1) << {i * d + j})"
        for j, e in enumerate(dim_exprs)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def bucketize(c: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into ``[0, 2**bits)`` lanes by linear
    scaling over ``[lo, hi]`` (clamped). Integer arithmetic on the
    scaled value keeps the oracle exact: the caller picks lo/hi from
    domain knowledge or a previous min/max pass."""
    n = (1 << bits) - 1
    span = hi - lo
    scaled = F.floor((c.cast("double") - F.lit(lo)) * F.lit(n)
                     / F.lit(span)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n), scaled))


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[str],
    bits: int = 16,
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Materialize ``df`` in Z-order over already-bucketized integer
    ``dims`` columns: range-partition by the Morton key (equal-size
    files, no hot task whatever the dim skew — same reasoning as
    ``salt_edges`` at sink boundaries) and sort within partitions, so
    every file's min/max stats cover a small hyper-rectangle in dim
    space. ``n_files=None`` keeps the session shuffle parallelism."""
    z = zvalue([F.col(c) for c in dims], bits).alias("_z")
    staged = df.withColumn("_z", z)
    parts = ([F.col("_z")] if n_files is None
             else [n_files, F.col("_z")])
    (staged.repartitionByRange(*parts)
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.format(fmt).mode("overwrite").save(path))
