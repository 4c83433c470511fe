"""Distributed triple-set parity metric (BASELINE.json: P/R ≥ 0.95 vs
reference N-Quads on (s,p,o), graph names excluded — they embed a
run-dependent hash+timestamp, util/__init__.py:174-208).

Precision/recall computed with joins (semi-join counts), never a
collect — usable against a reference dump of any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import object_term

TRIPLE_KEY = ["s", "p", "o"]


def as_triple_set(quads: DataFrame) -> DataFrame:
    """Quads → distinct (s, p, o-term) rows."""
    return quads.select(
        "s", "p",
        object_term(F.col("o_kind"), F.col("o_lex"), F.col("o_dt"),
                    F.col("o_lang")).alias("o"),
    ).distinct()


def parse_nquads(lines: DataFrame) -> DataFrame:
    """N-Quads text lines → (s, p, o-term) rows (graph + trailing dot
    stripped). Regex-based, adequate for reference dumps with IRI
    subjects/predicates (the reference emits no blank-node subjects)."""
    pat = r"^<([^>]*)>\s+<([^>]*)>\s+(.*?)(?:\s+<[^>]*>)?\s+\.\s*$"
    return lines.select(
        F.regexp_extract("value", pat, 1).alias("s"),
        F.regexp_extract("value", pat, 2).alias("p"),
        F.regexp_extract("value", pat, 3).alias("o"),
    ).where(F.col("s") != "").distinct()


def precision_recall(candidate: DataFrame, reference: DataFrame) -> dict:
    """P/R of candidate vs reference triple sets (distinct rows)."""
    cand = candidate.select(TRIPLE_KEY).distinct()
    ref = reference.select(TRIPLE_KEY).distinct()
    n_cand = cand.count()
    n_ref = ref.count()
    n_inter = cand.join(ref, TRIPLE_KEY, "left_semi").count()
    return {
        "candidate": n_cand,
        "reference": n_ref,
        "intersection": n_inter,
        "precision": n_inter / n_cand if n_cand else 1.0,
        "recall": n_inter / n_ref if n_ref else 1.0,
    }
