"""spark-submit scaling job (north_rule: "spark-submit --py-files at N
and 4N executors"): times the flagship extraction on whatever cluster
spark-submit provided — the master is deliberately NOT set in code
(get_session leaves a submitted master untouched; see session.py).

    python scripts/make_pyfiles.py dist/cow_spark.zip
    spark-submit --master local-cluster[1,4,4096] \
        --py-files dist/cow_spark.zip scripts/submit_scale.py 2000000
    spark-submit --master local-cluster[4,4,4096] \
        --py-files dist/cow_spark.zip scripts/submit_scale.py 2000000

Prints one JSON line per run; efficiency = T(N)/T(4N)/4.
"""
import json
import sys
import time

from cow_spark.operators.extract import extract_quads
from cow_spark.session import get_session
from cow_spark.sources.transcripts import transcripts_df
from cow_spark.spec.mapping import MappingSpec
from cow_spark.spec.presets import transcripts_full_spec

slots = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
spark = get_session(app_name="cow_spark-submit-scale", ship_package=False)
spark.sparkContext.setLogLevel("ERROR")
# size SQL shuffles to the cluster spark-submit actually gave us
cores = spark.sparkContext.defaultParallelism
spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))

spec = MappingSpec.from_json(transcripts_full_spec())
warm = extract_quads(transcripts_df(spark, 10_000), spec, dedup="none")
warm.write.format("noop").mode("overwrite").save()
q = extract_quads(transcripts_df(spark, slots), spec, dedup="none")
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
n = transcripts_df(spark, slots).count()
print(json.dumps({"master": spark.sparkContext.master, "slots": slots,
                  "seconds": round(best, 2), "turns": n,
                  "turns_per_sec": round(n / best, 1)}))
spark.stop()
