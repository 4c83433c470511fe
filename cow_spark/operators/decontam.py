"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard pre-training hygiene step (no reference counterpart —
extension family, SURVEY.md §2.9): any training document containing an
``n``-gram that also appears in a benchmark/eval document is
"contaminated" and must be dropped (or audited) before training.

Spark shape, sized for 100 TB:

- The corpus side is exploded into distinct n-grams — linear work,
  pipelined with the scan, never materialized.
- The benchmark side is TINY by definition (eval sets are thousands of
  docs, not billions). Its distinct gram set is aggregated and
  **broadcast**, so the probe join is a broadcast hash join — the
  corpus never shuffles on gram.
- The only shuffle is the per-doc partial-count aggregation
  (map-side combine, doc-count-sized output).

`tests/test_plans.py` pins the broadcast and the absence of any Python
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens
from .dedup import shingles_from_tokens


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, gram) — distinct word n-grams per document. Documents
    shorter than ``n`` words contribute their full normalized text as a
    single gram (shared semantics with the dedup shingle builder, so a
    verbatim short eval doc still contaminates its copies).

    The token array is STAGED as a real column before the shingle
    builder's higher-order transform — HOF lambdas are interpreted and
    re-evaluate captured subtrees per element, so an inline tokens()
    expression would re-tokenize the document once per shingle
    position (CLAUDE.md gotcha; same staging as minhash_signatures)."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("_tok"),
    )
    return staged.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("_tok"), n,
                                       distinct=True)).alias("gram"),
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_hit_grams) for every corpus document sharing at least
    one ``n``-gram with ``benchmark``; clean documents are absent
    (anti-join against this result to decontaminate).

    ``n_hit_grams`` counts the document's DISTINCT grams that appear
    anywhere in the benchmark set — an auditable contamination strength,
    not a bare flag.
    """
    bench_grams = F.broadcast(
        _doc_grams(benchmark, id_col, text_col, n).select("gram").distinct()
    )
    hits = _doc_grams(corpus, id_col, text_col, n).join(bench_grams, "gram")
    return hits.groupBy("doc_id").agg(
        F.count("*").alias("n_hit_grams"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """The corpus minus every contaminated document (left-anti join on
    the contamination result — one broadcastable doc-id set when
    contamination is rare, AQE handles the general case)."""
    bad = contamination(corpus, benchmark, id_col, text_col, n)
    return corpus.join(bad.select("doc_id"),
                       corpus[id_col] == bad["doc_id"], "left_anti")
