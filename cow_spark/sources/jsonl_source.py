"""JSONL transcript source with schema enforcement + quarantine.

Conversation/agent logs commonly land as JSON-lines; this scans them
into the canonical transcripts schema (BASELINE.json input_hint) with
the engine's P17 error policy: malformed rows never fail the job, they
land in a quarantine DataFrame for accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_jsonl_transcripts(
    spark: SparkSession,
    path: str,
    schema: str = TRANSCRIPTS_DDL,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): schema-enforced scan of JSONL transcripts.

    PERMISSIVE mode routes unparseable lines and type-mismatched fields
    into ``_corrupt_record``; the scan is cached before splitting
    because Spark refuses a query that references ONLY the corrupt
    column of a raw JSON scan (the row must be materialized first).
    Quarantine rows carry the raw line for replay/debugging — the
    per-row error-isolation contract (P17) at the source boundary.
    """
    df = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line"))
    return good, quarantine
