"""Scaling pair for the late-r4 operators (north_rule freshness):
the SAME job at two parallelism levels on identical input.

Job A — corpus text stack: cdc_chunks + char_entropy +
distinct_ngrams over the sf0.1 documents table replicated ``--rep``×
(deterministic doc ids, so results are parallelism-invariant).
Job B — bradley_terry over a synthetic ``--matches``-row match log
(spark.range arithmetic, 997 players, 6 MM rounds).

Usage (run each leg in its own process for honest JVM sizing):

    python BENCH/scaling_r4ops.py --cores 8
    python BENCH/scaling_r4ops.py --cores 32

Prints one JSON line per invocation; BENCH/BASELINE.md records the
pair + strong-scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--rep", type=int, default=40)
    ap.add_argument("--matches", type=int, default=5_000_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cow_spark.operators.dedup import cdc_chunks
    from cow_spark.operators.dialogue import bradley_terry
    from cow_spark.operators.quality import char_entropy
    from cow_spark.operators.terms import distinct_ngrams
    from cow_spark.session import get_session

    spark = get_session(
        master=f"local[{args.cores}]",
        app_name=f"scaling-r4ops-{args.cores}",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(f"{args.sf_dir}/documents.parquet")
            .crossJoin(spark.range(args.rep).withColumnRenamed("id", "_r"))
            .selectExpr("cast(doc_id as long) * 1000 + _r as doc_id",
                        "text", "lang")
            .repartition(4 * args.cores)
            .persist())
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).first()[0]

    def run(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    t_corpus = (run(cdc_chunks(docs))
                + run(char_entropy(docs))
                + run(distinct_ngrams(docs, "lang")))
    docs.unpersist()

    m = (spark.range(args.matches)
         .select(
             F.concat(F.lit("p"), ((F.col("id") * 7919) % 997)
                      .cast("string")).alias("winner"),
             F.concat(F.lit("p"), ((F.col("id") * 104729 + 1) % 997)
                      .cast("string")).alias("loser"))
         .repartition(4 * args.cores))
    t_bt = run(bradley_terry(m, rounds=6))

    print(json.dumps({
        "cores": args.cores,
        "n_docs": int(n_docs),
        "corpus_chars": int(n_chars),
        "corpus_stack_s": round(t_corpus, 2),
        "corpus_chars_per_s": round(n_chars / t_corpus, 0),
        "bt_matches": args.matches,
        "bradley_terry_s": round(t_bt, 2),
        "bt_matches_per_s": round(args.matches / t_bt, 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
