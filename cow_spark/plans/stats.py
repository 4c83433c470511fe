"""KG summary statistics — the profile a data engineer pulls before
querying an unfamiliar graph (the reference offers nothing here; its
users run SPARQL aggregations in a store).

One partial-aggregated pass: per predicate, triple count, distinct
subjects/objects, and the literal share. At 100 TB the output is
vocabulary-sized (one row per predicate), so the shuffle carries
per-partition partials only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kg_statistics(quads: DataFrame) -> DataFrame:
    """(p, n_triples, n_subjects, n_objects, n_literals) per predicate."""
    return quads.groupBy("p").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o_lex").alias("n_objects"),
        F.sum((F.col("o_kind") == "lit").cast("long")).alias("n_literals"),
    )
