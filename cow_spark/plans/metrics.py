"""A3/P17 — conversion metrics + quarantine accounting.

The reference keeps ad-hoc counters (skipped multiprocessing padding,
KeyError columns — csvw.py:491-492,504,529,554-555) and prints
tracebacks for per-column failures (csvw.py:551-552). Here failures are
*data*, not logs: one pass computes per-partition input rows, emitted
quads, and suppressed emissions (null-skips + failed templates/IRIs),
so lineage rows (plans.nanopub) can carry real numbers and a 100 TB run
can alert on quarantine spikes without grepping executor logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extract import compile_rules
from ..spec.mapping import MappingSpec


def extraction_metrics(df: DataFrame, spec: MappingSpec) -> DataFrame:
    """Per-partition metrics for a mapping run over ``df``.

    Returns (partition_id, n_rows, n_emitted, n_suppressed):
    - n_emitted: emissions whose condition held and terms were valid
    - n_suppressed: emissions whose null/skip condition held OR whose
      template render / IRI validation nulled a term (COW's caught
      per-column exception path, csvw.py:544-552)

    Single scan, partial aggregation, ~#partitions result rows.
    """
    emissions, cache = compile_rules(spec, df)
    staged = cache.staged(df).withColumn("_pid", F.spark_partition_id())
    ok_exprs = []
    for i, e in enumerate(emissions):
        ok = (
            e.cond
            & e.s.isNotNull()
            & e.p.isNotNull()
            & e.o_lex.isNotNull()
        )
        ok_exprs.append(F.when(ok, 1).otherwise(0).alias(f"_ok{i}"))
    n = len(emissions)
    per_row = staged.select(
        "_pid", *ok_exprs
    ).select(
        "_pid",
        sum([F.col(f"_ok{i}") for i in range(n)], F.lit(0)).alias("_emitted"),
    )
    return (
        per_row.groupBy("_pid")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_emitted").alias("n_emitted"),
            (F.count("*") * n - F.sum("_emitted")).alias("n_suppressed"),
        )
        .withColumnRenamed("_pid", "partition_id")
    )
