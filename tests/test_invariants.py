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


# -- BGP matcher fuzzed against a brute-force python evaluator -------------

_BGP_NS = {"ex": "https://ex.org/v/"}
_SUBJ = ["https://ex.org/a", "https://ex.org/b", "https://ex.org/c"]
_PRED = ["https://ex.org/v/p", "https://ex.org/v/q"]
_LITS = ["ada", "bert", "x"]
_IRIS = ["https://ex.org/a", "https://ex.org/z"]


def _py_resolve(t):
    if ":" in t and not t.startswith(("https://", "urn:")):
        pfx, rest = t.split(":", 1)
        if pfx in _BGP_NS and not rest.startswith("//"):
            return _BGP_NS[pfx] + rest
    return t


def _py_match_one(rows, pat):
    s, p, o = pat
    out = []
    for (qs, qp, qk, ql) in rows:
        b = {}
        if s.startswith("?"):
            b[s[1:]] = qs
        elif _py_resolve(s) != qs:
            continue
        if p.startswith("?"):
            b[p[1:]] = qp
        elif _py_resolve(p) != qp:
            continue
        if o.startswith("?"):
            b[o[1:]] = ql
        else:
            ro = _py_resolve(o)
            if ro != o or ro.startswith(("https://", "urn:")):
                if not (qk == "iri" and ql == ro):
                    continue
            elif not (qk == "lit" and ql == o):
                continue
        out.append(b)
    # per-pattern set semantics (mirrors the engine's dropDuplicates)
    seen, dedup = set(), []
    for b in out:
        key = tuple(sorted(b.items()))
        if key not in seen:
            seen.add(key)
            dedup.append(b)
    return dedup


def _py_bgp(rows, patterns, optional=(), not_exists=()):
    sols = [dict()]
    for pat in patterns:
        part = _py_match_one(rows, pat)
        new = []
        for b in sols:
            for m in part:
                if all(b.get(k, m[k]) == m[k] for k in m):
                    new.append({**b, **m})
        # set semantics after each join
        seen, sols = set(), []
        for b in new:
            key = tuple(sorted(b.items()))
            if key not in seen:
                seen.add(key)
                sols.append(b)
    for pat in optional:
        part = _py_match_one(rows, pat)
        pvars = {k for m in part for k in m}
        new = []
        for b in sols:
            hits = [m for m in part
                    if all(b.get(k, m[k]) == m[k] for k in m)]
            if hits:
                new.extend({**b, **m} for m in hits)
            else:
                new.append({**b, **{k: None for k in pvars if k not in b}})
        seen, sols = set(), []
        for b in new:
            key = tuple(sorted(b.items()))
            if key not in seen:
                seen.add(key)
                sols.append(b)
    for pat in not_exists:
        part = _py_match_one(rows, pat)
        sols = [b for b in sols
                if not any(all(b.get(k, m[k]) == m[k]
                               for k in m if k in b) for m in part)]
    return sols


_TERM_S = st.sampled_from(["?x", "?y"] + _SUBJ + ["ex:a"])
_TERM_P = st.sampled_from(["?p"] + _PRED + ["ex:p", "ex:q"])
_TERM_O = st.sampled_from(["?o", "?x"] + _LITS + _IRIS + ["ex:z"])
_QUAD = st.tuples(st.sampled_from(_SUBJ), st.sampled_from(_PRED),
                  st.sampled_from(["iri", "lit"]),
                  st.sampled_from(_LITS + _IRIS))
_PAT = st.tuples(_TERM_S, _TERM_P, _TERM_O)


@given(st.lists(_QUAD, min_size=1, max_size=8, unique=True),
       st.lists(_PAT, min_size=1, max_size=2),
       st.lists(_PAT, max_size=1), st.lists(_PAT, max_size=1))
@settings(max_examples=60, deadline=None)
def test_bgp_matches_bruteforce(spark, rows, pats, opt, neg):
    from hypothesis import assume
    from cow_spark.plans.bgp import match_bgp

    # engine constraint: every pattern must bind ≥1 var; optional /
    # not_exists must share a var with the required bindings
    def pat_vars(p):
        return {t[1:] for t in p if t.startswith("?")}

    assume(all(pat_vars(p) for p in pats + opt + neg))
    req_vars = set().union(*[pat_vars(p) for p in pats])
    assume(all(pat_vars(p) & req_vars for p in opt + neg))
    # keep each pattern's vars distinct (repeated-var-in-one-pattern
    # equality is pinned separately)
    assume(all(len(pat_vars(p)) == len([t for t in p if t.startswith("?")])
               for p in pats + opt + neg))

    q = spark.createDataFrame(
        [(None, s, p, k, l, None, None) for s, p, k, l in rows],
        "g string, s string, p string, o_kind string, o_lex string, "
        "o_dt string, o_lang string")
    got_df = match_bgp(q, pats, namespaces=_BGP_NS,
                       optional=opt or None, not_exists=neg or None)
    cols = sorted(got_df.columns)
    got = sorted(tuple(r[c] for c in cols) for r in got_df.collect())
    quad_rows = [(s, p, k, l) for s, p, k, l in rows]
    want_sols = _py_bgp(quad_rows, pats, opt, neg)
    want = sorted(tuple(b.get(c) for c in cols) for b in want_sols)
    assert got == want, (pats, opt, neg, rows)


# -- dedup composition invariants on random corpora ------------------------

_WORDS = ["spark", "plan", "data", "shuffle", "join", "scan", "quad"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=6).map(" ".join)


@given(st.lists(_DOC, min_size=1, max_size=12))
@settings(max_examples=15, deadline=None)
def test_near_duplicate_groups_invariants(spark, texts):
    """Structural invariants that hold for EVERY corpus regardless of
    what LSH finds: one row per doc, exactly one canonical per group,
    group_id = min member id, and byte-identical docs always share a
    group (the exact-fingerprint edges guarantee it even when LSH
    buckets are capped)."""
    from collections import defaultdict

    from cow_spark.operators.dedup import near_duplicate_groups, release

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    g = near_duplicate_groups(df, threshold=0.5, bucket_cap=3)
    rows = g.collect()
    release(g)
    assert sorted(r.doc_id for r in rows) == list(range(len(texts)))
    groups = defaultdict(list)
    for r in rows:
        groups[r.group_id].append(r)
    for gid, members in groups.items():
        assert gid == min(m.doc_id for m in members)
        assert sum(1 for m in members if m.is_canonical) == 1
        assert next(m for m in members if m.is_canonical).doc_id == gid
    # normalized-identical docs must share a group
    by_text = defaultdict(list)
    for i, t in enumerate(texts):
        by_text[" ".join(t.split())].append(i)
    gid_of = {r.doc_id: r.group_id for r in rows}
    for same in by_text.values():
        assert len({gid_of[i] for i in same}) == 1, (texts, rows)


# --- exact-substring dedup vs python twin ---------------------------------

_WORD = st.sampled_from(["a", "b", "c", "dd", "ee", "ff"])
_DOC_TOKS = st.lists(_WORD, min_size=0, max_size=14)


@given(st.lists(_DOC_TOKS, min_size=1, max_size=6), st.integers(2, 4))
@settings(max_examples=40, deadline=None)
def test_remove_duplicated_spans_matches_python(spark, docs_toks, k):
    """remove_duplicated_spans == brute-force python twin on random
    corpora from a tiny alphabet (duplicated k-grams are common, so the
    island-merge and coverage logic is exercised hard)."""
    from collections import Counter

    from cow_spark.operators.dedup import remove_duplicated_spans

    rows = [(i, " ".join(t)) for i, t in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.kept_tok, r.cleaned_text)
           for r in remove_duplicated_spans(df, k=k).collect()}

    grams = Counter()
    for t in docs_toks:
        for i in range(len(t) - k + 1):
            grams[tuple(t[i:i + k])] += 1
    for d, t in enumerate(docs_toks):
        covered = [False] * len(t)
        for i in range(len(t) - k + 1):
            if grams[tuple(t[i:i + k])] >= 2:
                for j in range(i, i + k):
                    covered[j] = True
        keep = [w for w, c in zip(t, covered) if not c]
        assert got[d] == (len(keep), " ".join(keep)), (d, t, k)


@given(st.lists(_DOC_TOKS, min_size=1, max_size=5),
       st.integers(2, 3), st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_winnowing_subset_and_guarantee(spark, docs_toks, k, w):
    """Winnowing picks are a subset of the doc's k-gram positions, at
    least one per full window, and every k-gram shared between two docs
    whose window happens to select it in both is discoverable — the
    hard guarantee (span >= w+k-1) is pinned in the unit test; here we
    fuzz structural invariants on random corpora."""
    from cow_spark.operators.dedup import winnowing_fingerprints

    rows = [(i, " ".join(t)) for i, t in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    picks = {}
    for r in winnowing_fingerprints(df, k=k, w=w).collect():
        picks.setdefault(r.doc_id, set()).add(r.pos)
    for d, t in enumerate(docs_toks):
        n_grams = len(t) - k + 1
        got = picks.get(d, set())
        if n_grams < 1:
            assert got == set(), (d, t)
            continue
        # subset of valid positions
        assert all(0 <= p <= n_grams - 1 for p in got), (d, got)
        if n_grams < w:
            # short doc: the single partial trailing window picks the
            # global min — exactly one fingerprint, never invisible
            assert len(got) == 1, (d, t, got)
            continue
        # every full window [j-w+1, j] contains a pick
        for j in range(w - 1, n_grams):
            assert any(j - w + 1 <= p <= j for p in got), (d, j, got)
