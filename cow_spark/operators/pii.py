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


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns —
    the structured-data privacy gate next to :func:`pii_scan`'s free-
    text one: before a table with user-describing columns (source,
    region, age bucket, device) joins a training corpus, every
    quasi-identifier combination must be shared by ≥ k rows
    (re-identification resistance, Sweeney 2002) and carry ≥ l
    distinct sensitive values (attribute-disclosure resistance,
    Machanavajjhala 2007 — a 10 000-row group is still leaky if all
    its rows share one diagnosis).

    Returns one row per DISTINCT quasi-identifier combination:
    ``(<quasi_cols...>, group_size, distinct_sensitive, k_violation,
    l_violation)`` — the audit table a release decision (suppress,
    generalize, pass) is made from. NULL quasi-identifier values form
    their own group (NULL-safe grouping is what groupBy does; a NULL
    region is itself a fingerprint).

    Scale shape: ONE partial-aggregated groupBy over the
    quasi-identifier tuple (count + distinct-count map-side combined);
    output is bounded by distinct QI combinations — if that approaches
    the row count the data is failing the audit anyway and the flags
    say so. No joins, no windows, no Python.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_audit: quasi_cols must be non-empty")
    if k < 1 or l < 1:
        raise ValueError(f"k_anonymity_audit: k and l must be >= 1, "
                         f"got k={k} l={l}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").alias("group_size"),
                 F.countDistinct(sensitive_col).alias("distinct_sensitive"))
            .select(*quasi_cols,
                    F.col("group_size").cast("long").alias("group_size"),
                    F.col("distinct_sensitive").cast("long")
                    .alias("distinct_sensitive"),
                    (F.col("group_size") < k).alias("k_violation"),
                    (F.col("distinct_sensitive") < l).alias("l_violation")))
