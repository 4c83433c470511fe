"""Static golden N-Quads fixtures (FIXTURES.md F3): engine output must
match the checked-in files at P/R ≥ 0.95 (achieved: 1.0) — the durable
form of the parity target, independent of the in-process oracle."""

import os

import pyspark.sql.functions as F

from cow_spark.operators.extract import extract_quads
from cow_spark.plans.parity import as_triple_set, parse_nquads, precision_recall
from cow_spark.spec.mapping import MappingSpec
from cow_spark.spec.presets import transcripts_default_spec, transcripts_full_spec
from cow_spark.sources.transcripts import transcripts_df

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "golden")


def check(spark, name, quads):
    golden = parse_nquads(spark.read.text(os.path.join(GOLDEN, f"{name}.nq")))
    m = precision_recall(as_triple_set(quads), golden)
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, (name, m)
    assert m["precision"] == 1.0 and m["recall"] == 1.0, (name, m)


def test_transcripts_goldens(spark):
    df = transcripts_df(spark, 800)
    for name, sd in [("transcripts_default", transcripts_default_spec()),
                     ("transcripts_full", transcripts_full_spec())]:
        check(spark, name, extract_quads(df, MappingSpec.from_json(sd)))


def test_csv_persons_golden(spark):
    from scripts.gen_goldens import CSV_ROWS, CSV_SPEC

    # _row = file order (the oracle's enumerate order), set explicitly
    df = spark.createDataFrame(
        [(i, *r.values()) for i, r in enumerate(CSV_ROWS)],
        "_row long, personID string, surname string, male string, occupation string",
    )
    check(spark, "csv_persons",
          extract_quads(df, MappingSpec.from_json(CSV_SPEC)))
