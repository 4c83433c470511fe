"""E6 — checkpoint/resume via a per-partition completion manifest.

No COW counterpart (a crashed COW run restarts from row 0). At 10^12
turns a restart must skip finished work: the input is bucketed by
``hash(conv_id)``; each bucket that completes writes a manifest row; a
restart anti-joins the manifest and processes only the remainder.

The unit of resumability is the *bucket* (stable function of the data),
not the Spark task partition (scheduler-dependent) — so resume produces
byte-identical output regardless of cluster size. Invariant tested:
resume-equals-fresh.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(col, n_buckets: int):
    """Stable bucket id = pmod(xxhash64(key), n) — the Parquet-world
    stand-in for Iceberg's bucket(N, conv_id) partition transform."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Read the manifest through Spark so the probe works on ANY
    filesystem the cluster can reach (s3a://, hdfs://, local) — an
    os.path probe is driver-local only and would silently disable resume
    (and duplicate output) on distributed storage."""
    try:
        return spark.read.parquet(manifest_path).select("bucket").distinct()
    except Exception as e:
        msg = str(e)
        # missing path = nothing completed; ALSO treat a directory with
        # no readable parquet as empty — a crash during the very first
        # manifest write can leave only _temporary/_SUCCESS behind, and
        # the schema-inference error would otherwise block resume forever
        if ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg
                or "Unable to infer schema" in msg):
            return spark.createDataFrame([], "bucket int")
        raise


def run_with_resume(
    df: DataFrame,
    key_col: str,
    n_buckets: int,
    process_fn: Callable[[DataFrame], DataFrame],
    output_path: str,
    manifest_path: str,
) -> list[int]:
    """Process only not-yet-completed buckets; append output + manifest.

    ``process_fn`` maps a bucket-subset DataFrame (which carries a
    ``_bucket`` column) → result DataFrame that **preserves** ``_bucket``
    (e.g. ``extract_quads(df, spec, passthrough=["_bucket"])``) and must
    be a pure function of its input. Returns the buckets processed.

    Output lands under ``output_path`` partitioned by bucket, so a re-run
    appends only new bucket directories (idempotent under at-most-once
    manifest append; on a real deployment manifest+data commit together
    via an Iceberg transaction — this is the Parquet fallback).
    """
    spark = df.sparkSession
    work = df.withColumn("_bucket", bucket_of(F.col(key_col), n_buckets))
    done = completed_buckets(spark, manifest_path)
    todo = work.join(
        F.broadcast(done), work["_bucket"] == done["bucket"], "left_anti"
    )
    buckets = [r._bucket for r in todo.select("_bucket").distinct().collect()]
    if not buckets:
        return []
    result = process_fn(todo)
    assert "_bucket" in result.columns, "process_fn must preserve _bucket"
    # dynamic partition overwrite REPLACES each touched bucket directory
    # instead of appending, so a crash between the data write and the
    # manifest write leaves the rerun idempotent (the bucket is simply
    # rewritten) rather than duplicating its rows
    (
        result.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(output_path)
    )
    spark.createDataFrame([(int(b),) for b in buckets], "bucket int").write.mode(
        "append"
    ).parquet(manifest_path)
    return buckets


