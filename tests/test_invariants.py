"""Property-based invariants (SURVEY.md §5.2-4).

- any template the classifier routes to a static path must agree with
  the exact two-stage Jinja renderer on arbitrary row values
- per-turn text equality under stable (conv_id, turn_idx) ordering
  (BASELINE.json input_hint invariant)
- extraction idempotence: re-running yields the identical triple set
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cow_spark.spec.templates import (
    compile_template,
    render_template_py,
    stringify,
    stringify_py,
)

_IDENT = st.sampled_from(["conv_id", "turn_idx", "role", "text"])
# 'ghost' is deliberately absent from the row — exercises the Undefined
# semantics (echo/filters -> '', |length -> '0', format field -> skip,
# |int inside |format -> render failure)
_IDENT_G = st.sampled_from(["conv_id", "turn_idx", "role", "text", "ghost"])
# literal fragments: no braces (brace-bearing literals route to jinja,
# which is exact by construction), no '%' (format-string interactions)
_LIT = st.text(
    alphabet=string.ascii_letters + string.digits + " /:-_.~é✓",
    max_size=8,
)
_VALUE = st.text(
    alphabet=string.ascii_letters + string.digits + " .:_é",
    max_size=12,
)


@st.composite
def templates(draw):
    n = draw(st.integers(1, 5))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 5))
        if kind == 0:
            parts.append(draw(_LIT))
        elif kind == 1:
            parts.append("{%s}" % draw(_IDENT_G))
        elif kind == 2:
            parts.append("{{%s}}" % draw(_IDENT_G))
        elif kind == 3:
            parts.append("{{%s|%s}}" % (draw(_IDENT_G),
                                        draw(st.sampled_from(
                                            ["lower", "upper", "length"]))))
        elif kind == 4:
            # jinja |int coercion path (non-numeric -> 0, ghost -> fail)
            parts.append("{{'%%0%dd'|format(%s|int)}}" % (
                draw(st.integers(1, 6)), draw(_IDENT_G)))
        else:
            parts.append(
                "{%% if %s == '%s' %%}%s{%% else %%}%s{%% endif %%}" % (
                    draw(_IDENT_G), draw(_VALUE), draw(_LIT), draw(_LIT)))
    return "".join(parts)


@settings(max_examples=60, deadline=None)
@given(tpl=templates(),
       conv=_VALUE, role=_VALUE, text=_VALUE, turn=st.integers(0, 10**6))
def test_static_paths_agree_with_exact_renderer(spark, tpl, conv, role, text, turn):
    ct = compile_template(tpl)
    row_py = {"conv_id": conv, "turn_idx": stringify_py(turn),
              "role": role, "text": text}
    want = render_template_py(tpl, row_py)
    if ct.kind == "jinja":
        return  # exact path by definition
    df = spark.createDataFrame(
        [(conv, turn, role, text)],
        "conv_id string, turn_idx int, role string, text string")
    rowmap = {f.name: stringify(df[f.name], f.dataType)
              for f in df.schema.fields}
    got = df.select(ct.column(rowmap).alias("v")).first().v
    assert got == want, f"{tpl!r}: {got!r} != {want!r} ({ct.kind})"


def test_per_turn_text_equality_under_stable_ordering(spark):
    """input_hint invariant: ordering by (conv_id, turn_idx) is stable and
    per-turn text survives the pipeline byte-identically."""
    from pyspark.sql import functions as F

    from cow_spark.sources.transcripts import transcripts_df, transcripts_rows

    n = 500
    df = transcripts_df(spark, n).repartition(7)
    got = [
        (r.conv_id, r.turn_idx, r.text)
        for r in df.orderBy("conv_id", "turn_idx").collect()
    ]
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in transcripts_rows(n)
    )
    assert got == want
    # (conv_id, turn_idx) is a dense unique key
    dup = (
        df.groupBy("conv_id", "turn_idx").count().where(F.col("count") > 1)
    ).count()
    assert dup == 0


def test_extraction_idempotent(spark):
    from cow_spark.operators.extract import extract_quads
    from cow_spark.spec.mapping import MappingSpec
    from cow_spark.spec.presets import transcripts_full_spec
    from cow_spark.sources.transcripts import transcripts_df

    spec = MappingSpec.from_json(transcripts_full_spec())
    df = transcripts_df(spark, 300)
    a = extract_quads(df, spec)
    b = extract_quads(df, spec)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


# -- round-2 primitives: fuzzed against pure-Python twins ------------------


@given(st.text(alphabet=string.ascii_letters + string.digits + "/#.:-_~%é",
               min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_split_iri_invariants(iri):
    """When split_iri succeeds: ns+local == iri, local is a valid
    NCName, and ns is non-empty; otherwise it raises ValueError."""
    from cow_spark.sources.xmlser import split_iri

    try:
        ns, local = split_iri(iri)
    except ValueError:
        return
    assert ns + local == iri and ns and local
    assert local[0].isalpha() or local[0] == "_"
    assert all(ch.isalnum() or ch in "_-." for ch in local)


@given(st.lists(st.text(alphabet=string.ascii_lowercase + " ", max_size=8),
                max_size=8))
@settings(max_examples=100, deadline=None)
def test_duplicate_line_fraction_matches_python(spark, lines):
    from cow_spark.operators.quality import duplicate_line_fraction
    import pyspark.sql.functions as F

    text = "\n".join(lines)
    got = spark.createDataFrame([(text,)], "t string").select(
        duplicate_line_fraction(F.col("t")).alias("f")).collect()[0].f
    nonblank = [l for l in lines if l.strip()]
    want = (1 - len(set(nonblank)) / len(nonblank)) if nonblank else 0.0
    assert abs(got - want) < 1e-9
