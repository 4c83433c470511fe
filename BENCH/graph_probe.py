"""Scale probes for the round-3 graph-ML additions.

The driver fixtures for khop_sample / node2vec_walks / link_prediction /
clustering_coefficient / personalized_pagerank are ~1.4k-node graphs
(correctness-sized). This probe runs each on a deterministic ~1M-edge
power-law-ish graph (src = id, dst = id mod (id // k + 1) — hub-heavy
like real entity graphs) and prints throughput, so BENCH/BASELINE.md
carries evidence at 3 orders of magnitude above the fixtures.

Run: ``python BENCH/graph_probe.py [--edges 1000000]`` — one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cow_spark.session import get_session  # noqa: E402


def big_graph(spark, n_edges: int):
    """Deterministic hub-heavy graph: node i links to i mod (i//64 + 1),
    so early nodes are hubs (node 0's degree ~ thousands) and the tail
    is sparse — the degree shape entity graphs actually have."""
    return spark.range(1, n_edges + 1).select(
        F.concat(F.lit("n"), F.col("id")).alias("src"),
        F.concat(F.lit("n"), (F.col("id") % (F.col("id") / 64 + 1)
                              .cast("long"))).alias("dst"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    args = ap.parse_args()
    spark = get_session(master="local[32]", shuffle_partitions=64,
                        app_name="graph-probe")
    spark.sparkContext.setLogLevel("ERROR")
    g = big_graph(spark, args.edges)
    g.write.format("noop").mode("overwrite").save()  # warm

    out: dict = {"edges": args.edges}

    from cow_spark.operators import dedup
    from cow_spark.operators.graphrank import (
        clustering_coefficient,
        khop_sample,
        link_prediction,
        node2vec_walks,
        personalized_pagerank,
    )

    seeds = spark.range(1, 2_000).select(
        F.concat(F.lit("n"), F.col("id") * 499).alias("node"))

    t0 = time.perf_counter()
    n = khop_sample(g, seeds, k=2, fanout=8).count()
    out["khop_k2_f8_s"] = round(time.perf_counter() - t0, 2)
    out["khop_rows"] = n

    t0 = time.perf_counter()
    n = node2vec_walks(g, walk_len=3, walks_per_node=1).count()
    out["node2vec_len3_s"] = round(time.perf_counter() - t0, 2)
    out["node2vec_rows"] = n

    t0 = time.perf_counter()
    lp = link_prediction(g, min_cn=1, max_pivot_degree=200)
    n = lp.count()
    dedup.release(lp)
    out["linkpred_cap200_s"] = round(time.perf_counter() - t0, 2)
    out["linkpred_rows"] = n

    t0 = time.perf_counter()
    cc = clustering_coefficient(g)
    n = cc.count()
    dedup.release(cc)
    out["lcc_s"] = round(time.perf_counter() - t0, 2)
    out["lcc_rows"] = n

    t0 = time.perf_counter()
    n = personalized_pagerank(g, seeds, iterations=5,
                              local_threshold=0).count()
    out["ppr_5it_s"] = round(time.perf_counter() - t0, 2)
    out["ppr_rows"] = n

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
