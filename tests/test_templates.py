"""Template compiler: classification + static/Jinja parity (SURVEY.md P4)."""

import pyspark.sql.functions as F
import pytest

from cow_spark.spec.templates import (
    compile_template,
    render_template_py,
    stringify,
    stringify_py,
)


def test_classification():
    assert compile_template("https://x/{conv_id}/t/{turn_idx}").kind == "static"
    assert compile_template("https://x/{{conv_id}}").kind == "static"
    assert compile_template("https://x/constant").kind == "const"
    assert compile_template("{% if a %}x{% endif %}").kind == "jinja"
    assert compile_template("{{t|float() * 1000}}").kind == "jinja"
    assert compile_template("{a[0]}").kind == "jinja"  # odd braces → jinja
    assert compile_template("{turn_idx:05d}").kind == "jinja"  # fmt spec → exact path


def test_render_py_two_stage_order():
    # Jinja first, then str.format (docs/index.rst:567-585)
    row = {"Country": "Qatar", "_row": 1}
    assert (
        render_template_py("http://e.com/{_row}/{{Country}}", row)
        == "http://e.com/1/Qatar"
    )


def test_render_py_failure_is_none():
    assert render_template_py("{missing}", {"a": "1"}) is None
    assert render_template_py("{% if x %}{{ x + 1 }}{% endif %}", {"x": "a"}) is None


@pytest.mark.parametrize(
    "pattern",
    [
        "https://x/{conv_id}/turn/{turn_idx}",
        "{conv_id}",
        "{{conv_id}}--{turn_idx}",
        "plain constant",
        "",
    ],
)
def test_static_path_matches_python(spark, pattern):
    rows = [
        {"conv_id": "c-1", "turn_idx": 7},
        {"conv_id": "x y", "turn_idx": 0},
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    ct = compile_template(pattern)
    assert ct.kind in ("static", "const")
    rowmap = {f.name: stringify(df[f.name], f.dataType) for f in df.schema.fields}
    got = [r.v for r in df.select(ct.column(rowmap).alias("v")).collect()]
    want = [
        render_template_py(pattern, {k: stringify_py(v) for k, v in r.items()})
        for r in rows
    ]
    assert got == want


def test_static_lowering_classification():
    assert compile_template("{% if role == 'tool' %}A{% else %}B{% endif %}").kind == "ifelse"
    assert compile_template("x/{% if a == 'b' %}{conv_id}{% endif %}").kind == "ifelse"
    assert compile_template("{{text|length}}").kind == "static"
    assert compile_template("{{text|lower}}").kind == "static"
    assert compile_template("{{'%05d'|format(turn_idx|int)}}").kind == "static"
    # nested / non-literal comparisons stay on the exact path
    assert compile_template("{% if a == b %}x{% endif %}").kind == "jinja"
    assert compile_template("{% for x in y %}z{% endfor %}").kind == "jinja"


@pytest.mark.parametrize(
    "pattern",
    [
        "{% if role == 'tool' %}T-{tool}{% else %}chat{% endif %}",
        "p/{% if role != 'user' %}m{% endif %}/s",
        "{{text|length}}",
        "len={{text|length}} up={{role|upper}}",
        "{{'%05d'|format(turn_idx|int)}}",
    ],
)
def test_lowered_paths_match_exact_renderer(spark, pattern):
    rows = [
        {"role": "tool", "tool": "calc", "text": "a b c", "turn_idx": 7},
        {"role": "user", "tool": None, "text": "", "turn_idx": 12345},
    ]
    df = spark.createDataFrame(
        rows, "role string, tool string, text string, turn_idx int")
    ct = compile_template(pattern)
    assert ct.kind in ("static", "ifelse"), ct.kind
    rowmap = {f.name: stringify(df[f.name], f.dataType) for f in df.schema.fields}
    got = [r.v for r in df.select(ct.column(rowmap).alias("v")).collect()]
    want = [
        render_template_py(pattern, {k: stringify_py(v) for k, v in r.items()})
        for r in rows
    ]
    assert got == want


def test_jinja_path_matches_python(spark):
    # replace() filter is not lowerable → exact Arrow-batched renderer
    pattern = ("{% if role == 'tool' %}T-{{tool|replace('c','k')}}"
               "{% else %}chat{% endif %}")
    rows = [
        {"role": "tool", "tool": "calc"},
        {"role": "user", "tool": None},
    ]
    df = spark.createDataFrame(rows, "role string, tool string")
    ct = compile_template(pattern)
    assert ct.kind == "jinja"
    rowmap = {f.name: stringify(df[f.name], f.dataType) for f in df.schema.fields}
    got = [r.v for r in df.select(ct.column(rowmap).alias("v")).collect()]
    assert got == ["T-kalk", "chat"]
    want = [
        render_template_py(pattern, {k: stringify_py(v) for k, v in r.items()})
        for r in rows
    ]
    assert got == want


def test_stringify_py_matches_spark(spark):
    import datetime

    rows = [
        (1, "a", datetime.datetime(2026, 1, 1, 12, 30, 5), 2.5),
        (None, None, None, None),
    ]
    df = spark.createDataFrame(rows, "i int, s string, t timestamp, d double")
    cols = [stringify(df[f.name], f.dataType).alias(f.name) for f in df.schema.fields]
    got = [tuple(r) for r in df.select(cols).collect()]
    want = [tuple(stringify_py(v) for v in r) for r in rows]
    assert got == want
