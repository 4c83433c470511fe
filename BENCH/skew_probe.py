"""Skew evidence for the iterative graph operators (VERDICT r2 #6).

Builds a deliberately hot-keyed graph — one hub node owns 50% of all
edges (a giant star component), the other 50% are disjoint pairs — and
measures connected_components / pagerank with and without
``salt_edges``, verifying bit-equal outputs. A third probe isolates the
case the salt exists for: *materializing* a skewed edge list
partitioned by key (unsalted: the hub's whole edge set lands in one
task; salted: spread over ``buckets`` tasks).

Run: ``python BENCH/skew_probe.py [--edges 1000000]`` — prints one JSON
line per probe plus a summary table row for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cow_spark.operators.canon import connected_components, salt_edges  # noqa: E402
from cow_spark.operators.graphrank import pagerank  # noqa: E402
from cow_spark.session import get_session  # noqa: E402


def hot_graph(spark, n_edges: int):
    """50% of edges into node 0 (hub star), 50% disjoint pairs.

    Deterministic via spark.range — no RNG; src ids of the star start
    at 2 so the pair region (>= 10^9) never collides.
    """
    m = n_edges // 2
    star = spark.range(m).select(
        (F.col("id") + 2).alias("src"), F.lit(0).cast("long").alias("dst"))
    pairs = spark.range(m).select(
        (F.lit(1_000_000_000) + 2 * F.col("id")).alias("src"),
        (F.lit(1_000_000_000) + 2 * F.col("id") + 1).alias("dst"))
    return star.unionByName(pairs)


def checksum(df, cols):
    """Order-independent exact checksum: sum + count of xxhash64 rows
    (decimal sum — a bigint sum overflows under ANSI)."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    row = df.select(F.count("*").alias("n"),
                    F.sum(h.cast("decimal(38,0)")).alias("s")).head()
    return (row["n"], row["s"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_session(master=f"local[{args.cpus}]",
                        app_name="cow_spark-skew-probe",
                        shuffle_partitions=2 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    edges = hot_graph(spark, args.edges).persist()
    n = edges.count()  # materialize once; both variants read the same input
    out: dict[str, float | int] = {"edges": n, "cpus": args.cpus}

    # Interleaved best-of-2 per variant: whichever variant runs first
    # pays the loop's codegen/JIT warm-up for both (a fixed order showed
    # a spurious 1.5x "win" for whichever ran second) — alternate the
    # order and take each variant's min.
    sums: dict[str, set] = {}

    def timed(key, fn, check_cols):
        t0 = time.perf_counter()
        res = fn()
        s = checksum(res, check_cols)
        dt = time.perf_counter() - t0
        out[key] = round(min(out.get(key, float("inf")), dt), 2)
        sums.setdefault(key, set()).add(s)

    # --- connected components: salted vs unsalted, equal output ---
    for salt_first in (False, True):
        order = (64, None) if salt_first else (None, 64)
        for salt in order:
            key = "cc_salted_s" if salt else "cc_unsalted_s"
            timed(key, lambda s=salt: connected_components(
                edges, salt_buckets=s), ["node", "component"])
    assert sums["cc_unsalted_s"] == sums["cc_salted_s"], sums
    out["cc_equal"] = True

    # --- pagerank: pre-salted edge layout vs raw, equal ranks ---
    salted = salt_edges(edges, 64)
    for salt_first in (False, True):
        pair = [("pr_unsalted_s", edges), ("pr_salted_s", salted)]
        if salt_first:
            pair.reverse()
        for key, e in pair:
            timed(key, lambda ee=e: pagerank(ee, iterations=3),
                  ["node", "rank_fp"])
    assert sums["pr_unsalted_s"] == sums["pr_salted_s"], sums
    out["pr_equal"] = True

    # --- materialization: where the salt is the whole story ---
    # REAL sorted parquet write of a bigger hub-heavy edge list (a noop
    # sink neither sorts nor serializes, so it can't show the
    # straggler): keyed-but-unsalted, the hub's edges sort+encode in
    # ONE task; salted they spread over the buckets.
    import shutil
    import tempfile

    big = hot_graph(spark, args.edges * 8).persist()
    big.count()
    tmp = tempfile.mkdtemp(prefix="skew_probe_")
    for key, part in (("write_by_dst_s", big.repartition(F.col("dst"))),
                      ("write_salted_s", salt_edges(big, 64))):
        t0 = time.perf_counter()
        part.sortWithinPartitions("dst", "src").write.mode("overwrite") \
            .parquet(f"{tmp}/{key}")
        out[key] = round(time.perf_counter() - t0, 2)
    shutil.rmtree(tmp, ignore_errors=True)
    big.unpersist()

    edges.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
