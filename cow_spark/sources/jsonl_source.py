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

    Two independent scans instead of one cached split: caching would
    pin the corpus-scale raw scan in memory for the session (the repo
    persists only bounded tables), and Spark refuses a query that
    references ONLY the corrupt column of a raw JSON scan. So ``good``
    is a DROPMALFORMED scan, and ``quarantine`` re-reads the file as
    text and keeps the lines ``from_json`` flags as corrupt — the raw
    line travels with the quarantine row for replay/debugging (the
    per-row error-isolation contract, P17, at the source boundary).
    """
    good = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    parsed = spark.read.text(path).select(
        "value",
        F.from_json(
            "value", schema + ", _corrupt_record string",
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_j"),
    )
    quarantine = (
        parsed.where(F.col("_j._corrupt_record").isNotNull())
        .select(F.col("value").alias("raw_line"))
    )
    return good, quarantine
