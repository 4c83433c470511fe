"""HyperLogLog sketch: register parity vs the pure-Python twin,
lossless mergeability, estimator accuracy, and the scale-shape gate
(the shuffle carries registers, not keys)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cow_spark.functions.sketch import (
    hll_estimate,
    hll_estimate_py,
    hll_merge,
    hll_py,
    hll_registers,
)


def _regs_dict(df, grp=None):
    rows = df.collect()
    if grp is None:
        return {r["bucket"]: r["r"] for r in rows}
    out = {}
    for r in rows:
        out.setdefault(r[grp], {})[r["bucket"]] = r["r"]
    return out


def test_registers_match_python_twin(spark):
    vals = [f"user-{i}" for i in range(500)] + ["user-3", None, "user-7"]
    df = spark.createDataFrame([Row(k=v) for v in vals])
    got = _regs_dict(hll_registers(df, "k"))
    assert got == hll_py(vals)


def test_estimate_matches_python_twin_and_is_accurate(spark):
    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    regs = hll_registers(df, "k", b=6)
    est_row = hll_estimate(regs, b=6).collect()[0].asDict()
    py = hll_estimate_py(hll_py(f"k{i}" for i in range(n)), b=6)
    assert est_row == py
    # m=64 -> sigma ~ 1.04/8 = 13%; allow 3 sigma
    assert abs(est_row["est"] - n) / n < 0.4


def test_small_range_uses_linear_counting(spark):
    df = spark.createDataFrame([Row(k=f"v{i}") for i in range(30)])
    row = hll_estimate(hll_registers(df, "k"), b=6).collect()[0]
    assert row["v_empty"] > 0
    assert row["est"] == row["est_linear"]
    # linear counting at n << m is tight
    assert abs(row["est"] - 30) <= 6


def test_merge_is_lossless(spark):
    a = spark.range(0, 3_000).select(F.col("id").cast("string").alias("k"))
    b_ = spark.range(1_500, 5_000).select(
        F.col("id").cast("string").alias("k"))
    whole = _regs_dict(hll_registers(a.union(b_), "k"))
    merged = _regs_dict(
        hll_merge(hll_registers(a, "k").union(hll_registers(b_, "k"))))
    assert merged == whole


def test_grouped_registers(spark):
    rows = [Row(g=i % 3, k=f"u{i % 40}") for i in range(200)]
    df = spark.createDataFrame(rows)
    got = _regs_dict(hll_registers(df, "k", ("g",)), grp="g")
    for g in (0, 1, 2):
        want = hll_py({f"u{i % 40}" for i in range(200) if i % 3 == g})
        assert got[g] == want


def test_bad_b_rejected(spark):
    df = spark.createDataFrame([Row(k="x")])
    with pytest.raises(ValueError):
        hll_registers(df, "k", b=2)


def test_register_table_is_bounded_and_jvm_only(spark):
    """Scale gate: the aggregate's output is <= m rows per group and the
    plan crosses into Python zero times."""
    df = spark.range(50_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("string").alias("k"))
    regs = hll_registers(df, "k", ("g",), b=6)
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert regs.count() <= 4 * 64
    # partial aggregation (map-side combine) is present: two HashAggregate
    # levels around the exchange
    assert plan.count("HashAggregate") >= 2
