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

    # --- connected components: salted vs unsalted, equal output ---
    sums = {}
    for label, salt in (("cc_unsalted_s", None), ("cc_salted_s", 64)):
        t0 = time.perf_counter()
        cc = connected_components(edges, salt_buckets=salt)
        sums[label] = checksum(cc, ["node", "component"])
        out[label] = round(time.perf_counter() - t0, 2)
    assert sums["cc_unsalted_s"] == sums["cc_salted_s"], sums
    out["cc_equal"] = True

    # --- pagerank: pre-salted edge layout vs raw, equal ranks ---
    for label, e in (("pr_unsalted_s", edges),
                     ("pr_salted_s", salt_edges(edges, 64))):
        t0 = time.perf_counter()
        pr = pagerank(e, iterations=3)
        sums[label] = checksum(pr, ["node", "rank_fp"])
        out[label] = round(time.perf_counter() - t0, 2)
    assert sums["pr_unsalted_s"] == sums["pr_salted_s"], sums
    out["pr_equal"] = True

    # --- materialization: where the salt is the whole story ---
    # partition-by-key write of the hot edge list: unsalted, the hub's
    # 50% of all edges serialize in ONE task; salted they spread.
    t0 = time.perf_counter()
    edges.repartition(F.col("dst")).write.format("noop") \
        .mode("overwrite").save()
    out["write_by_dst_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    salt_edges(edges, 64).write.format("noop").mode("overwrite").save()
    out["write_salted_s"] = round(time.perf_counter() - t0, 2)

    edges.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
