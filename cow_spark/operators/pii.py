"""PII detection and redaction for training-data pipelines.

A standard pre-training stage the reference has no counterpart for
(extension family, SURVEY.md §2.9): scan `text` for personally
identifiable information and either count it (audit mode) or replace it
with typed placeholder tags (redaction mode).

Spark shape: pure Column regex expressions — whole-stage codegen, zero
Python, linear scan, no shuffle. The pattern set is deliberately limited
to the regex subset shared by Java's engine (Spark) and RE2 (DuckDB):
no backreferences, no lookaround — so every detector is
oracle-replayable cross-engine.

Redaction order is FIXED (ssn before phone, email before anything that
could match its digits) because the detectors overlap on digit runs;
both the Spark path and the SQL twin apply the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name → (pattern, placeholder). Order matters: applied top to bottom.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-type match counts over raw text (audit mode — counts are
    computed BEFORE redaction, so overlapping types each see the
    original text)."""
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def redact(c: Column) -> Column:
    """Replace every PII span with its placeholder tag, in the fixed
    PII_PATTERNS order (ssn's xxx-xx-xxxx would otherwise be half-eaten
    by the phone detector)."""
    out = c
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_scan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One linear pass: (doc_id, n_<type>..., n_pii, redacted).

    At 100 TB this is scan-bound and embarrassingly parallel — no
    shuffle, no Python boundary; the regex forest compiles into one
    WholeStageCodegen span (pinned by tests/test_plans.py).
    """
    counts = pii_counts(F.col(text_col))
    cols = [F.col(id_col).alias("doc_id")]
    total = None
    for name, c in counts.items():
        cols.append(c.alias(f"n_{name}"))
        total = c if total is None else total + c
    cols.append(total.alias("n_pii"))
    cols.append(redact(F.col(text_col)).alias("redacted"))
    return df.select(*cols)
