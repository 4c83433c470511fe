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


def extract_json(
    df: DataFrame,
    json_col: str,
    fields: list[tuple],
) -> DataFrame:
    """Typed extraction from an EMBEDDED JSON column — the
    semi-structured sibling of the JSONL file source above (real
    event/transcript tables carry a `props`-style JSON string per
    row; reading it is a projection problem, not an ingestion one).
    ``fields`` is ``(name, path, dtype)`` with ``path`` a JSONPath
    like ``$.k`` or ``$.a.b``, dtype ``string | int | long | double |
    boolean``.

    Row-preserving: every input row survives with the extracted
    columns appended plus ``json_ok`` (false = the cell wasn't a JSON
    object — extraction columns are NULL, and counting false rows is
    the corpus's JSON health metric). Typed fields go through
    ``try_cast`` — a string where a number should be yields NULL, not
    an ANSI abort (P17 discipline). Missing paths are NULL with
    ``json_ok`` true: absence is data, damage is not.

    Scale shape: one map-side projection (``get_json_object`` per
    field + one object-shape probe), zero shuffles, zero Python. For
    HOT paths extracted millions of times prefer a one-shot
    ``from_json`` with an explicit schema; this per-path form is the
    schema-free profile/audit tool.
    """
    if not fields:
        raise ValueError("extract_json: fields must be non-empty")
    src = F.col(json_col)
    # an object cell round-trips through $ extraction; scalars/arrays/
    # garbage do not start with '{' after trim
    ok = F.trim(src).startswith("{") & \
        F.get_json_object(src, "$").isNotNull()
    cols = [df[c] for c in df.columns]
    for f in fields:
        name, path = f[0], f[1]
        dtype = f[2] if len(f) > 2 else "string"
        v = F.when(ok, F.get_json_object(src, path))
        if dtype != "string":
            v = v.try_cast(dtype)
        cols.append(v.alias(name))
    cols.append(ok.alias("json_ok"))
    return df.select(*cols)
