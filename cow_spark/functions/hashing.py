"""Portable deterministic hashing (engine ↔ oracle parity).

Spark's xxhash64/hash are JVM-specific; the correctness gate replays our
queries in DuckDB, so the dedup/sketch operators hash via md5 (bit-exact
in both engines):

    Spark : cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)   -- 60 bits
    DuckDB: cast(concat('0x', substr(md5(x), 1, 15)) as bigint)

xxhash64 stays the choice for *internal* keys (salting, bucketing) where
no cross-engine replay is needed — it's measurably cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(c: Column) -> Column:
    """60-bit non-negative hash from the md5 hex prefix."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash32(c: Column) -> Column:
    """32-bit hash (8 hex chars) — enough for sketch bits."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash60` for oracle SQL strings."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def portable_hash32_sql(expr: str) -> str:
    return f"cast(concat('0x', substr(md5({expr}), 1, 8)) as bigint)"
