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


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_build_matches_python_twin(spark):
    from cow_spark.functions.sketch import bloom_build, bloom_py

    vals = [f"key-{i}" for i in range(1000)] + [None, "key-5"]
    df = spark.createDataFrame([Row(k=v) for v in vals])
    got = {r["word_idx"]: r["bits"]
           for r in bloom_build(df, "k", n_bits=1 << 12).collect()}
    assert got == bloom_py(vals, n_bits=1 << 12)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from cow_spark.functions.sketch import bloom_build, bloom_probe

    present = spark.range(2000).select(
        F.concat(F.lit("in"), F.col("id")).alias("k"))
    absent = spark.range(2000).select(
        F.concat(F.lit("out"), F.col("id")).alias("k"))
    filt = bloom_build(present, "k", n_bits=1 << 15)
    hits_in = bloom_probe(present, filt, "k", n_bits=1 << 15)
    assert hits_in.where(F.col("maybe_present") == 0).count() == 0
    fp = bloom_probe(absent, filt, "k", n_bits=1 << 15) \
        .where(F.col("maybe_present") == 1).count()
    # n=2000, m=2^15, k=5 -> theoretical fpr ~0.2%; allow 2%
    assert fp < 40


def test_bloom_shard_merge_is_build_of_union(spark):
    from cow_spark.functions.sketch import bloom_build

    a = spark.range(0, 800).select(F.col("id").cast("string").alias("k"))
    b_ = spark.range(500, 1500).select(F.col("id").cast("string").alias("k"))
    whole = {r["word_idx"]: r["bits"]
             for r in bloom_build(a.union(b_), "k", n_bits=1 << 12).collect()}
    merged = {r["word_idx"]: r["bits"] for r in (
        bloom_build(a, "k", n_bits=1 << 12)
        .union(bloom_build(b_, "k", n_bits=1 << 12))
        .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    ).collect()}
    assert merged == whole


def test_bloom_probe_plan_broadcasts_filter_no_python(spark):
    from cow_spark.functions.sketch import bloom_build, bloom_probe

    keys = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    out = bloom_probe(keys, bloom_build(keys, "k"), "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_bloom_param_validation(spark):
    from cow_spark.functions.sketch import bloom_build

    df = spark.createDataFrame([Row(k="x")])
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_bits=10)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_build_matches_python_twin(spark):
    from cow_spark.functions.sketch import cms_build, cms_py

    rows = [Row(k=f"k{i % 50}", w=i % 3 + 1) for i in range(500)]
    df = spark.createDataFrame(rows)
    got = {(r["row_idx"], r["col_idx"]): r["c"]
           for r in cms_build(df, "k", "w", width=256).collect()}
    assert got == cms_py([(r.k, r.w) for r in rows], width=256)


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    from cow_spark.functions.sketch import cms_build, cms_query

    df = spark.createDataFrame(
        [Row(k=f"key{i % 20}") for i in range(400)])
    sk = cms_build(df, "k")  # 20 keys in 4x2048 cells: no collisions
    q = spark.createDataFrame(
        [Row(k=f"key{i}") for i in range(20)] + [Row(k="absent")])
    est = {r["k"]: r["est_count"] for r in cms_query(q, sk, "k").collect()}
    for i in range(20):
        assert est[f"key{i}"] == 20  # exact when sparse
    assert est["absent"] == 0


def test_cms_merge_is_cellwise_sum(spark):
    from cow_spark.functions.sketch import cms_build

    a = spark.range(0, 600).select((F.col("id") % 37).cast("string").alias("k"))
    b_ = spark.range(0, 400).select((F.col("id") % 23).cast("string").alias("k"))
    whole = {(r["row_idx"], r["col_idx"]): r["c"]
             for r in cms_build(a.union(b_), "k", width=128).collect()}
    merged = {(r["row_idx"], r["col_idx"]): r["c"] for r in (
        cms_build(a, "k", width=128).union(cms_build(b_, "k", width=128))
        .groupBy("row_idx", "col_idx").agg(F.sum("c").alias("c"))
    ).collect()}
    assert merged == whole


def test_cms_validation_and_plan(spark):
    from cow_spark.functions.sketch import cms_build

    df = spark.createDataFrame([Row(k="x")])
    with pytest.raises(ValueError):
        cms_build(df, "k", depth=0)
    sk = cms_build(spark.range(1000).select(
        F.col("id").cast("string").alias("k")), "k")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# streaming sketch maintenance
# ---------------------------------------------------------------------------


def test_hll_registers_as_streaming_aggregation(spark, tmp_path):
    """hll_registers is a plain groupBy/max, so it runs unchanged as a
    Structured Streaming stateful aggregation — complete-mode register
    table over a file stream equals the batch sketch over the same
    rows (sketch state is m registers, not the key set)."""
    from cow_spark.functions.sketch import hll_registers

    src = str(tmp_path / "landing")
    batch = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    batch.repartition(4).write.parquet(src)
    stream = spark.readStream.schema("g string, k string") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (hll_registers(stream, "k", ("g",))
         .writeStream.outputMode("complete")
         .format("memory").queryName("hll_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["g"], r["bucket"]): r["r"]
           for r in spark.table("hll_stream").collect()}
    want = {(r["g"], r["bucket"]): r["r"]
            for r in hll_registers(batch, "k", ("g",)).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hist_build_matches_python_twin(spark):
    from cow_spark.functions.sketch import hist_build, hist_py

    vals = ([0.0, 0.01, -0.01, 0.31, -0.32, 1.0, -1.0, 123.45, -123.45,
             9999.99, -9999.99, None]
            + [i * 0.37 for i in range(400)]
            + [-i * 1.13 for i in range(200)])
    df = spark.createDataFrame([Row(v=v) for v in vals],
                               schema="v double")
    got = {r["bucket"]: r["c"] for r in hist_build(df, "v").collect()}
    assert got == hist_py(vals)


def test_hist_quantiles_match_twin_and_error_bound(spark):
    import math

    from cow_spark.functions.sketch import (
        hist_build, hist_py, hist_quantiles, hist_quantiles_py)

    vals = [((i * 2654435761) % 100000) / 7.0 - 3000.0 for i in range(5000)]
    df = spark.createDataFrame([Row(v=v) for v in vals], schema="v double")
    sk = hist_build(df, "v")
    got = hist_quantiles(sk).collect()[0].asDict()
    want = hist_quantiles_py(hist_py(vals))
    assert got == want
    # estimate within 2^-k relative error of the true scaled quantile
    scaled = sorted(math.floor(v * 100) for v in vals)
    for p in (50, 90, 99):
        true = scaled[math.ceil(p / 100 * len(scaled)) - 1]
        est = got[f"p{p}_fp"]
        assert est >= true  # upper-bound convention
        assert abs(est - true) <= max(abs(true) * 2 ** -5, 1)


def test_hist_merge_is_buildwise_sum(spark):
    from cow_spark.functions.sketch import hist_build, hist_merge

    a = spark.range(0, 3000).select(
        ((F.col("id") % 211) * 0.93 - 40).alias("v"),
        (F.col("id") % 2).alias("g"))
    b_ = spark.range(3000, 5000).select(
        ((F.col("id") % 97) * 1.7 - 11).alias("v"),
        (F.col("id") % 2).alias("g"))
    whole = {(r["g"], r["bucket"]): r["c"] for r in
             hist_build(a.union(b_), "v", ("g",)).collect()}
    merged = {(r["g"], r["bucket"]): r["c"] for r in hist_merge(
        hist_build(a, "v", ("g",)).union(hist_build(b_, "v", ("g",))),
        ("g",)).collect()}
    assert merged == whole


def test_hist_sketch_bounded_and_jvm_only(spark):
    from cow_spark.functions.sketch import hist_build, hist_quantiles

    df = spark.range(200000).select(
        (F.col("id") * 0.011).alias("v"))
    sk = hist_build(df, "v")
    n_buckets = sk.count()
    # 200k values over [0, 2200): buckets are log-bounded, not row-bound
    # (exact below 2^5, then 32 per power of two up to 2^18 -> <= 480)
    assert n_buckets <= 480
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    qplan = (hist_quantiles(sk)._jdf.queryExecution()
             .executedPlan().toString())
    assert "BatchEvalPython" not in qplan and "ArrowEvalPython" not in qplan


def test_hist_build_as_streaming_aggregation(spark, tmp_path):
    """hist_build is one groupBy/count, so it runs unchanged as a
    Structured Streaming stateful aggregation — complete-mode bucket
    table over a file stream equals the batch sketch (state is the
    log-bounded bucket set, not the value set)."""
    from cow_spark.functions.sketch import hist_build

    src = str(tmp_path / "landing")
    batch = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") % 211) * 0.93 - 40).alias("v"))
    batch.repartition(4).write.parquet(src)
    stream = spark.readStream.schema("g string, v double") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (hist_build(stream, "v", ("g",))
         .writeStream.outputMode("complete")
         .format("memory").queryName("hist_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["g"], r["bucket"]): r["c"]
           for r in spark.table("hist_stream").collect()}
    want = {(r["g"], r["bucket"]): r["c"]
            for r in hist_build(batch, "v", ("g",)).collect()}
    assert got == want


class TestKMV:
    def test_exact_below_k(self, spark):
        from cow_spark.functions.sketch import kmv_distinct

        df = spark.createDataFrame(
            [("g", f"v{i % 7}") for i in range(50)], "g string, v string")
        row = kmv_distinct(df, ("g",), "v", k=64).collect()[0]
        assert row.n_kept == 7 and row.est_distinct == 7

    def test_estimate_within_bound(self, spark):
        """KMV relative error ~ 1/sqrt(k-1); at k=256 over 5000
        distincts a 20% corridor is lax enough to be deterministic and
        tight enough to catch a broken estimator (which is off by
        orders of magnitude)."""
        from cow_spark.functions.sketch import kmv_distinct

        n = 5000
        df = spark.createDataFrame(
            [("g", f"val-{i}") for i in range(n)], "g string, v string")
        row = kmv_distinct(df, ("g",), "v", k=256).collect()[0]
        assert row.n_kept == 256
        assert 0.8 * n < row.est_distinct < 1.2 * n

    def test_union_merge_property(self, spark):
        """Sketch of A ∪ B == min-k merge of sketch(A) and sketch(B):
        the mergeability contract that makes KMV a sketch rather than
        a sample. Verified via the threshold/estimate of the union."""
        from cow_spark.functions.sketch import kmv_distinct

        a = spark.createDataFrame(
            [("g", f"a{i}") for i in range(400)], "g string, v string")
        b = spark.createDataFrame(
            [("g", f"a{i}") for i in range(200, 600)],
            "g string, v string")
        u = kmv_distinct(a.union(b), ("g",), "v", k=64).collect()[0]
        # merge by hand: k smallest of the two sketches' kept hashes
        from cow_spark.functions.hashing import portable_hash60
        from cow_spark.functions.sketch import KMV_SPACE
        import hashlib

        def h(v):
            return int(hashlib.md5(f"kmv|{v}".encode())
                       .hexdigest()[:15], 16) % KMV_SPACE

        hs = sorted({h(f"a{i}") for i in range(600)})[:64]
        assert u.kmv_threshold == hs[-1]
        assert u.est_distinct == (63 * KMV_SPACE) // hs[-1]

    def test_null_values_ignored(self, spark):
        from cow_spark.functions.sketch import kmv_distinct

        df = spark.createDataFrame(
            [("g", "x"), ("g", None), ("g", "y")], "g string, v string")
        row = kmv_distinct(df, ("g",), "v", k=8).collect()[0]
        assert row.n_kept == 2 and row.est_distinct == 2

    def test_k_validation(self, spark):
        import pytest as _pt

        from cow_spark.functions.sketch import kmv_distinct

        df = spark.createDataFrame([("g", "x")], "g string, v string")
        with _pt.raises(ValueError):
            kmv_distinct(df, ("g",), "v", k=1)


def test_ams_f2_estimates_within_bound_and_merges(spark):
    """The sign-sketch estimate lands within the coarse AMS band of
    exact F2 on a skewed corpus, is deterministic, and NULLs drop;
    estimator-count validation raises."""
    import random

    import pytest
    from cow_spark.functions.sketch import ams_f2

    rng = random.Random(3)
    vals = ([f"k{rng.randint(0, 50)}" for _ in range(2000)]
            + ["hot"] * 500 + [None] * 5)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    r1 = ams_f2(df, "v", estimators=64).collect()[0]
    r2 = ams_f2(df, "v", estimators=64).collect()[0]
    assert tuple(r1) == tuple(r2)
    from collections import Counter
    c = Counter(v for v in vals if v is not None)
    f2 = sum(n * n for n in c.values())
    assert r1.n_rows == 2500
    assert 0.4 < r1.f2_est / f2 < 2.5
    with pytest.raises(ValueError):
        ams_f2(df, "v", estimators=0)
