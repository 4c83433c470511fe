"""Triple extraction vs the pure-Python COW-semantics oracle.

The engine's quads (set of (s, p, o-term)) must match the oracle exactly
on the synthetic transcripts (P/R = 1.0 ≥ the 0.95 target) for both the
default and the every-operator spec, plus CSV-shaped all-string fixtures
(the reference's native domain).
"""

import pyspark.sql.functions as F
import pytest

from cow_spark import oracle
from cow_spark.model import object_term
from cow_spark.operators.extract import extract_quads
from cow_spark.spec.mapping import MappingSpec, SpecError
from cow_spark.spec.presets import transcripts_default_spec, transcripts_full_spec
from cow_spark.sources.transcripts import transcripts_df, transcripts_rows


def quad_triples(qdf) -> set[tuple[str, str, str]]:
    rows = qdf.select(
        "s",
        "p",
        object_term(
            F.col("o_kind"), F.col("o_lex"), F.col("o_dt"), F.col("o_lang")
        ).alias("o"),
    ).collect()
    return {(r.s, r.p, r.o) for r in rows}


def prf(got: set, want: set) -> tuple[float, float]:
    inter = len(got & want)
    return (
        inter / len(got) if got else 1.0,
        inter / len(want) if want else 1.0,
    )


N = 400  # slots → ~200 turns


@pytest.mark.parametrize(
    "spec_dict",
    [transcripts_default_spec(), transcripts_full_spec()],
    ids=["default", "full"],
)
def test_transcripts_specs_match_oracle(spark, spec_dict):
    spec = MappingSpec.from_json(spec_dict)
    df = transcripts_df(spark, N)
    got = quad_triples(extract_quads(df, spec))
    want = oracle.convert_rows(transcripts_rows(N), spec)
    p, r = prf(got, want)
    assert (p, r) == (1.0, 1.0), (
        f"P={p} R={r}; engine-only={sorted(got - want)[:5]} "
        f"oracle-only={sorted(want - got)[:5]}"
    )


def test_csv_shaped_all_string_fixture(spark):
    # the reference's native domain: all-string rows, _row subject key,
    # null sentinels, empty cells (FIXTURES.md F6-style)
    rows = [
        {"personID": "p1", "surname": "de Vries", "male": "1", "occupation": "smith"},
        {"personID": "p2", "surname": "", "male": "0", "occupation": "N/A"},
        {"personID": "p 3", "surname": 'q"x', "male": ".", "occupation": "mason"},
    ]
    spec_dict = {
        "@base": "https://example.com/id/persons",
        "url": "persons",
        "tableSchema": {
            "aboutUrl": "{_row}",
            "null": "N/A",
            "columns": [
                {"name": "personID", "@id": "https://example.com/id/persons/vocab/variable/personID"},
                {"name": "surname", "datatype": "string", "lang": "nl"},
                {"name": "male", "null": ["."], "datatype": "boolean"},
                {
                    "name": "occupation",
                    "valueUrl": "occupation/{occupation}",
                    "schemeUrl": "scheme/occupations",
                },
            ],
        },
    }
    spec = MappingSpec.from_json(spec_dict)
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "personID string, surname string, male string, occupation string",
    ).withColumn("_row", F.monotonically_increasing_id())
    # small-scale parity path: single partition → _row == file order
    df = df.coalesce(1).withColumn(
        "_row", F.row_number().over(__import__("pyspark").sql.Window.orderBy("_row")) - 1
    )
    got = quad_triples(extract_quads(df, spec))
    want = oracle.convert_rows(rows, spec, with_row_index=True)
    assert got == want
    # sanity: the empty surname and the '.'-null male are skipped
    assert not any("surname" in p and '""' in o for _, p, o in got)


def test_dedup_and_partition_invariance(spark):
    spec = MappingSpec.from_json(transcripts_default_spec())
    df = transcripts_df(spark, N)
    q1 = quad_triples(extract_quads(df, spec))
    q2 = quad_triples(extract_quads(df.repartition(7), spec))
    assert q1 == q2  # output set independent of partitioning
    cnt = extract_quads(df, spec).count()
    assert cnt == extract_quads(df, spec).dropDuplicates().count()


def test_validator_rejects_bad_spec():
    bad = {
        "@base": "https://example.com/id/x",
        "tableSchema": {
            "aboutUrl": "{missing_col}/{other}",
            "columns": [{"name": "a", "propertyUrl": "{undefined_thing}"}],
        },
    }
    spec = MappingSpec.from_json(bad)
    with pytest.raises(SpecError):
        spec.validate(headers=["a"])
    good = MappingSpec.from_json(transcripts_default_spec())
    good.validate(["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def test_partition_dedup_matches_cow_chunk_semantics(spark):
    """dedup='partition' (COW per-chunk parity): set semantics within a
    task partition; with one partition it equals global dedup, with many
    it sits between raw and global."""
    from cow_spark.operators.extract import extract_quads
    from cow_spark.spec.mapping import MappingSpec
    from cow_spark.spec.presets import transcripts_full_spec
    from cow_spark.sources.transcripts import transcripts_df

    spec = MappingSpec.from_json(transcripts_full_spec())
    t = transcripts_df(spark, 400)
    n_raw = extract_quads(t, spec, dedup="none").count()
    n_global = extract_quads(t, spec, dedup="global").count()
    n_part = extract_quads(t.repartition(4), spec, dedup="partition").count()
    n_one = extract_quads(t.coalesce(1), spec, dedup="partition").count()
    assert n_global <= n_part <= n_raw
    assert n_one == n_global
    # partition-deduped set == global set up to multiplicity
    p = extract_quads(t.repartition(4), spec, dedup="partition").dropDuplicates()
    g = extract_quads(t, spec, dedup="global")
    assert p.exceptAll(g).count() == 0 and g.exceptAll(p).count() == 0
