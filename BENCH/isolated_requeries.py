"""Isolated best-of-2 re-measure of the queries the r4 verdict flagged
as regressed (>1.4x vs r3), plus incremental_canon (slowest entry).

Each query runs in THE SAME fresh session but with nothing else
interleaved (the r4 sweep measured them mid-234-query pass; r4's
BASELINE.md shows +/-15-20% ambient drift in that mode). Usage::

    python BENCH/isolated_requeries.py [sf_dir]

Prints one JSON line {name: best_of_2_seconds}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from cow_spark.session import get_session  # noqa: E402

QUERIES = [
    "entity_link", "text_stats", "minhash_bands", "bpe_segment",
    "ivf_topk", "semdedup", "incremental_canon",
    # drifted >1.3x in the r5 recorded sweep — isolated check
    "scc", "ktruss", "weighted_paths",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(master=f"local[{cpus}]",
                        app_name="isolated-requeries",
                        shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.format(
        "noop").mode("overwrite").save()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _warm(s):
        return s

    spark.range(1000).selectExpr("cast(id as string) s") \
        .select(_warm("s")).write.format("noop").mode("overwrite").save()

    qmap = entry.queries()
    out: dict[str, float] = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            for cached in getattr(df, "_cow_persisted", ()):
                cached.unpersist()
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
