"""Edge-semantics parity: engine Column lowering vs the exact Jinja
renderer (the oracle's engine), pinned after review findings — missing
fields, jinja |int coercion under ANSI mode, skolem null keys, SKOS
all-or-nothing suppression, lang-render failure, empty-spec passthrough."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.extract import extract_quads
from cow_spark.spec.mapping import MappingSpec, SpecError
from cow_spark.spec.templates import compile_template, render_template_py


def _engine_render(spark, pattern: str, row: dict):
    df = spark.createDataFrame(
        [tuple(row.values())],
        ", ".join(f"{k} string" for k in row))
    cols = {k: F.coalesce(F.col(k), F.lit("")) for k in row}
    out = df.select(compile_template(pattern).column(cols).alias("v"))
    return out.first().v


CASES = [
    # ({row}, pattern) — engine must agree with exact jinja-then-format
    ({"a": "x"}, "pre {{missing}} post"),          # echo Undefined → ''
    ({"a": "x"}, "{{missing|lower}}!"),            # soft filter → ''
    ({"a": "x"}, "{{missing|length}}!"),           # length → '0'
    ({"a": "x"}, "n={{'%05d'|format(a|int)}}"),    # non-numeric → 0
    ({"a": "3.7"}, "n={{'%05d'|format(a|int)}}"),  # float-ish → 3
    ({"a": ""}, "n={{'%05d'|format(a|int)}}"),     # empty → 0
    ({"a": "12"}, "n={{'%05d'|format(a|int)}}"),   # numeric
    ({"a": "x"}, "{% if missing == 'q' %}T{% else %}F{% endif %}"),
    ({"a": "x"}, "{% if missing != 'q' %}T{% else %}F{% endif %}"),
    ({"a": "x"}, "k-{missing}"),                   # format KeyError → skip
]


@pytest.mark.parametrize("row,pattern", CASES)
def test_static_lowering_matches_jinja(spark, row, pattern):
    want = render_template_py(pattern, row)
    got = _engine_render(spark, pattern, row)
    assert got == want, f"{pattern!r} on {row}: engine={got!r} jinja={want!r}"


def test_fmtint_never_aborts_under_ansi(spark):
    """ANSI mode is Spark 4's default; a bad cell must skip, not crash."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame([("x",), ("12",), ("",)], "a string")
    c = compile_template("{{'%05d'|format(a|int)}}").column(
        {"a": F.coalesce(F.col("a"), F.lit(""))})
    got = sorted(r.v for r in df.select(c.alias("v")).collect())
    assert got == ["00000", "00000", "00012"]


def test_skolem_null_position_no_collision(spark):
    from cow_spark.functions.iri import skolem_iri

    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None)],
        "x string, y string, z string")
    out = df.select(skolem_iri("https://ex.com/sk", "x", "y", "z")
                    .alias("iri")).collect()
    assert out[0].iri != out[1].iri


def test_scheme_render_failure_suppresses_whole_column(spark):
    spec = MappingSpec.from_json({
        "@base": "https://ex.com/id",
        "url": "t",
        "tableSchema": {
            "aboutUrl": "{k}",
            "columns": [{
                "name": "v",
                "valueUrl": "concept/{v}",
                # format-stage field absent from the input → render skip
                "schemeUrl": "scheme/{missing}",
            }],
        },
    })
    df = spark.createDataFrame([("r1", "a")], "k string, v string")
    assert extract_quads(df, spec).count() == 0  # main triple gone too


def test_lang_render_failure_skips_triple(spark):
    spec = MappingSpec.from_json({
        "@base": "https://ex.com/id",
        "url": "t",
        "tableSchema": {
            "aboutUrl": "{k}",
            "columns": [{
                "name": "v", "datatype": "string", "lang": "{missing}",
            }],
        },
    })
    df = spark.createDataFrame([("r1", "hello")], "k string, v string")
    assert extract_quads(df, spec).count() == 0


def test_empty_spec_keeps_passthrough_schema(spark):
    spec = MappingSpec.from_json({
        "@base": "https://ex.com/id", "url": "t",
        "tableSchema": {"aboutUrl": "{k}", "columns": []},
    })
    df = spark.createDataFrame([("r1", "x")], "k string, v string")
    out = extract_quads(df, spec, passthrough=["k"])
    assert "k" in out.columns and out.count() == 0


def test_missing_subject_field_fails_fast(spark):
    spec = MappingSpec.from_json({
        "@base": "https://ex.com/id", "url": "t",
        "tableSchema": {"columns": [{"name": "v"}]},  # default {_row}
    })
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(SpecError, match="_row"):
        extract_quads(df, spec)


def test_numeric_jinja_conditional_skips_like_py3_reference(spark):
    """docs/index.rst:605 compares a string cell to an int — py3 Jinja
    raises, the reference's per-column catch skips. Engine and oracle
    must both skip (PARITY 'Known reference quirks')."""
    tpl = "{% if gdp > 100000 %}rich{% else %}poor{% endif %}"
    assert render_template_py(tpl, {"gdp": "104906"}) is None
    spec = MappingSpec.from_json({
        "@base": "https://ex.com/id", "url": "t",
        "tableSchema": {
            "aboutUrl": "{k}",
            "columns": [{"name": "gdp", "valueUrl": tpl}],
        },
    })
    df = spark.createDataFrame([("r1", "104906")], "k string, gdp string")
    assert extract_quads(df, spec).count() == 0
