"""Scaling-evidence harness (north_rule: N vs 4N executors, sandbox
stand-in = local[8] vs local[32] on identical input).

Runs the flagship full-spec extraction at both parallelism levels and
prints one JSON line with both throughputs + strong/weak efficiency.
Pin the low-parallelism run yourself for strict methodology:

    taskset -c 0-7 python BENCH/scaling.py --cores 8 --slots 4000000
    python BENCH/scaling.py --cores 32 --slots 4000000

or let this script run both in-process (unpinned, single invocation):

    python BENCH/scaling.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cores: int, slots: int, execs: int = 0,
             exec_cores: int = 4, exec_mem_mb: int = 4096) -> dict:
    """One timed run. ``execs > 0`` switches to ``local-cluster`` mode —
    N separate executor JVMs × exec_cores each, the direct sandbox
    analogue of the north_rule's "N vs 4N executors"."""
    from cow_spark.operators.extract import extract_quads
    from cow_spark.session import get_session
    from cow_spark.sources.transcripts import transcripts_df
    from cow_spark.spec.mapping import MappingSpec
    from cow_spark.spec.presets import transcripts_full_spec

    if execs:
        master = f"local-cluster[{execs},{exec_cores},{exec_mem_mb}]"
        cores = execs * exec_cores
    else:
        master = f"local[{cores}]"
    spark = get_session(
        master=master,
        app_name=f"cow_spark-scaling-{cores}",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.default.parallelism": str(4 * cores)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spec = MappingSpec.from_json(transcripts_full_spec())
    warm = extract_quads(transcripts_df(spark, 10_000), spec, dedup="none")
    warm.write.format("noop").mode("overwrite").save()
    q = extract_quads(transcripts_df(spark, slots), spec, dedup="none")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    n_turns = transcripts_df(spark, slots).count()
    spark.stop()
    return {
        "cores": cores,
        "slots": slots,
        "seconds": round(best, 2),
        "turns": n_turns,
        "turns_per_sec": round(n_turns / best, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--slots", type=int, default=4_000_000)
    ap.add_argument("--execs", type=int, default=0,
                    help="local-cluster mode: N executor JVMs x 4 cores")
    ap.add_argument("--pair-execs", type=int, default=0, metavar="N",
                    help="run the north_rule pair in one invocation: "
                         "N executor JVMs vs 4N executor JVMs "
                         "(local-cluster, separate JVM per executor, "
                         "real serialized shuffles) + the weak-scaling "
                         "leg (slots/4 at N execs)")
    args = ap.parse_args()

    if args.pair_execs:
        n = args.pair_execs
        low = run_once(0, args.slots, execs=n)
        high = run_once(0, args.slots, execs=4 * n)
        weak_low = run_once(0, args.slots // 4, execs=n)
        print(json.dumps({
            "metric": "scaling_efficiency_executors",
            "executors_low": n, "executors_high": 4 * n,
            "low": low, "high": high, "weak_low": weak_low,
            "strong_scaling_efficiency": round(
                (low["seconds"] / high["seconds"]) / 4, 3),
            "weak_scaling_efficiency": round(
                weak_low["seconds"] / high["seconds"], 3),
            "unit": "ratio",
        }))
        return

    if args.cores or args.execs:
        print(json.dumps(run_once(args.cores or 0, args.slots,
                                  execs=args.execs)))
        return

    low = run_once(8, args.slots)
    high = run_once(32, args.slots)
    weak_low = run_once(8, args.slots // 4)
    strong_eff = (low["seconds"] / high["seconds"]) / 4
    weak_eff = weak_low["seconds"] / high["seconds"]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "low": low, "high": high, "weak_low": weak_low,
        "strong_scaling_efficiency": round(strong_eff, 3),
        "weak_scaling_efficiency": round(weak_eff, 3),
        "unit": "ratio",
    }))


if __name__ == "__main__":
    main()
