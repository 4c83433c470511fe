"""Basic-graph-pattern matching over quad DataFrames.

The query face of the engine: the reference has no query surface at all
(its .nq output is meant for a downstream triple store), so simple
"find all bindings of this triple pattern conjunction" workflows force
a store round-trip. Here a BGP compiles to a filter per pattern plus
natural joins on shared variables — a declarative plan Catalyst can
reorder, broadcast, and push down like any other (the quads table's
flat columns give parquet min/max pruning on ``p``, the most selective
position in practice).

Not full SPARQL, but the working core is here: OPTIONAL and FILTER NOT
EXISTS (:func:`match_bgp`), FILTER (:func:`filter_bindings`), GROUP BY
(:func:`aggregate_bindings`), CONSTRUCT (:func:`construct_quads`),
UNION (:func:`union_bgp`), MINUS (:func:`minus_bgp`), and property
paths: one-or-more closure ``p+`` (``canon.transitive_pairs``),
sequence ``p1 / p2`` (space-slash-space — bare ``/`` is IRI body),
alternation ``p1|p2``, and inverse ``^p``, composable per step
(``^p+`` = closure of the inverse), plus zero-or-more ``p*`` /
zero-or-one ``p?`` (zero-length solutions = identity over the graph's
node set, per SPARQL §18.4 ZeroOrMorePath) and negated property sets
``!p`` / ``!(p1|p2)`` (any predicate NOT in the set). Not supported:
``+``/``*``/``?`` over an alternation, inverse members inside a
negated set — documented deviations that fail loud. This covers the
select-join-derive core that accounts for most KG lookups, at table
scan speed.
"""

from __future__ import annotations

import operator
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://|^urn:")


def _is_var(t: str) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _resolve(term: str, namespaces: dict[str, str] | None) -> str:
    if namespaces and ":" in term and not _ABS_IRI.match(term):
        pfx, rest = term.split(":", 1)
        if pfx in namespaces and not rest.startswith("//"):
            return namespaces[pfx] + rest
    return term


#: sequence-step separator in predicate path expressions. IRIs contain
#: bare '/' everywhere, so the separator is space-slash-space (the
#: SPARQL textual form allows the whitespace); IRIs can never contain
#: spaces, so the split is unambiguous.
_SEQ_SEP = " / "
_ALT_SPLIT = re.compile(r"(?<!\\)\|")


def _expand_paths(patterns):
    """Rewrite sequence (``p1 / p2``) and inverse (``^p``) path steps
    into plain triple patterns chained through fresh internal variables
    (``?__ppN`` — a reserved prefix, dropped from the result schema).

    Sequence: ``(s, 'p1 / p2', o)`` → ``(s, p1, ?__pp0), (?__pp0, p2,
    o)`` — the natural-join machinery evaluates the chain like any
    other conjunction (Catalyst reorders/broadcasts it). Inverse flips
    one step's endpoints: ``(s, '^p', o)`` → ``(o, p, s)``. Steps
    compose: each sequence step may carry ``^`` and/or the existing
    ``+`` closure (``^p+`` = closure of the inverse, by endpoint swap)
    or an alternation (handled downstream as a predicate ``isin``).
    """
    out, n = [], 0
    for s, p, o in patterns:
        for t in (s, o):
            if _is_var(t) and t.startswith("?__pp"):
                raise ValueError(
                    f"variable {t} uses the reserved internal-path "
                    "prefix '?__pp'")
        if not isinstance(p, str) or _is_var(p) or not (
                _SEQ_SEP in p or p.startswith("^")):
            out.append((s, p, o))
            continue
        steps = ([x.strip() for x in p.split(_SEQ_SEP)]
                 if _SEQ_SEP in p else [p])
        if any(not st or st == "^" for st in steps):
            raise ValueError(f"empty step in property path {p!r}")
        cur = s
        for i, st in enumerate(steps):
            if i < len(steps) - 1:
                nxt = f"?__pp{n}"
                n += 1
            else:
                nxt = o
            if st.startswith("^"):
                out.append((nxt, st[1:], cur))
            else:
                out.append((cur, st, nxt))
            cur = nxt
    return out


def _alternates(p: str) -> list[str] | None:
    """``p1|p2|p3`` predicate alternation → the unescaped alternate
    list, or None when ``p`` is a single predicate. Raw ``|`` can never
    appear in an IRI (it must be %-encoded), so the split is safe;
    ``\\|`` escapes a genuinely weird one. ``+`` closure over an
    alternation is rejected (close each alternate separately)."""
    if not _ALT_SPLIT.search(p):
        return None
    alts = _ALT_SPLIT.split(p)
    if any(not a for a in alts):
        raise ValueError(f"empty alternate in predicate path {p!r}")
    for mod in "+*?":
        if any(a.endswith(mod) and not a.endswith("\\" + mod)
               for a in alts):
            raise ValueError(
                f"{mod!r} closure over an alternation is not supported: "
                f"{p!r} (write each closed alternate as its own pattern)")
    return [_unescape(a) for a in alts]


def _unescape(p: str) -> str:
    for ch in "|+*?":
        p = p.replace("\\" + ch, ch)
    return p


def _negated(p: str) -> list[str] | None:
    """``!p`` / ``!(p1|p2)`` negated property set → the member list, or
    None when ``p`` is not negated. An IRI can never start with ``!``
    (schemes start with a letter), so the marker is unambiguous.
    Inverse members (``!(p|^q)``) and path modifiers inside the set
    fail loud — documented deviations."""
    if not p.startswith("!"):
        return None
    body = p[1:]
    if body.startswith("(") and body.endswith(")"):
        body = body[1:-1]
    if not body:
        raise ValueError(f"empty negated property set {p!r}")
    alts = _ALT_SPLIT.split(body)
    if any(not a for a in alts):
        raise ValueError(f"empty member in negated property set {p!r}")
    if any(a.startswith("^") for a in alts):
        raise ValueError(
            f"inverse members in a negated property set are not "
            f"supported: {p!r}")
    for mod in "+*?":
        if any(a.endswith(mod) and not a.endswith("\\" + mod)
               for a in alts):
            raise ValueError(
                f"path modifiers inside a negated property set are not "
                f"supported: {p!r}")
    return [_unescape(a) for a in alts]


def _path_bindings(quads, s, p, o, namespaces, mode="+"):
    """Bindings of a closure property-path pattern ``(s, base<mode>, o)``
    with mode ``+`` (one-or-more), ``*`` (zero-or-more) or ``?``
    (zero-or-one) — or the existence boolean for the all-constant case.
    The ``+``/``*`` closure (``canon.transitive_pairs``, path doubling)
    materializes eagerly; edges are the base predicate's IRI-object
    triples (documented deviation: literal objects don't participate,
    consistent with the traversal needing IRI nodes anyway).

    Zero-length solutions (``*``/``?``, SPARQL §18.4): with a constant
    endpoint the identity pair ``(c, c)`` always holds (per spec, even
    for a term absent from the graph); with both endpoints variable the
    identity domain is the graph's node set — every subject plus every
    object lexical form of the (graph-scoped) quads, one distinct over
    two projected columns. ``?x base* ?x`` therefore binds every node.
    """
    from ..operators.canon import transitive_pairs

    base = _resolve(p[:-1], namespaces)
    edges = (quads.where((F.col("p") == base) & (F.col("o_kind") == "iri"))
             .select(F.col("s").alias("src"), F.col("o_lex").alias("dst"))
             .dropDuplicates())
    closure = transitive_pairs(edges) if mode in "+*" else edges
    if mode in "*?":
        ident = _identity_pairs(quads, s, o, namespaces)
        closure = closure.unionByName(ident).dropDuplicates()
    return _endpoint_bindings(closure, s, p, o, namespaces)


def _identity_pairs(quads, s, o, namespaces):
    """Zero-length path solutions (SPARQL §18.4): the ``(c, c)`` pair
    for a constant endpoint (per spec, even when the term is absent
    from the graph), else identity over the graph's node set."""
    if not _is_var(s):
        c = _resolve(s, namespaces)
        return quads.sparkSession.createDataFrame(
            [(c, c)], "src string, dst string")
    if not _is_var(o):
        c = _resolve(o, namespaces)
        return quads.sparkSession.createDataFrame(
            [(c, c)], "src string, dst string")
    nodes = (quads.select(F.col("s").alias("n"))
             .unionByName(quads.select(F.col("o_lex").alias("n")))
             .dropDuplicates())
    return nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))


def _endpoint_bindings(closure, s, p, o, namespaces):
    """Shared tail of every path-pattern form: constrain/bind the
    endpoint columns of a ``(src, dst)`` pair set against the pattern's
    subject/object terms; the all-constant case returns the existence
    boolean."""
    cols = []
    if _is_var(s):
        if not s[1:]:
            raise ValueError(f"unnamed variable in pattern {(s, p, o)}")
        cols.append(F.col("src").alias(s[1:]))
    else:
        closure = closure.where(F.col("src") == _resolve(s, namespaces))
    if _is_var(o):
        name = o[1:]
        if not name:
            raise ValueError(f"unnamed variable in pattern {(s, p, o)}")
        if _is_var(s) and name == s[1:]:
            # ?x base+ ?x: cyclic self-reachability — the closure drops
            # self-pairs (documented deviation), so this is empty
            closure = closure.where(F.col("src") == F.col("dst"))
        else:
            cols.append(F.col("dst").alias(name))
    else:
        closure = closure.where(F.col("dst") == _resolve(o, namespaces))
    if not cols:
        return closure.limit(1).count() > 0
    return closure.select(*cols).dropDuplicates()


#: bounded-length path modifier ``p{m,n}``. Unescaped braces are
#: illegal in IRIs (they must be %-encoded), so the suffix is
#: unambiguous — no escape form needed.
_RANGE_PATH = re.compile(r"^(.+)\{(\d+),(\d+)\}$")


def _range_path_bindings(quads, s, p, o, namespaces, base, lo, hi,
                         checkpoint_dir=None):
    """Bindings of a bounded-length path pattern ``(s, base{m,n}, o)``
    — a path of length l with m ≤ l ≤ n exists (the ``elt{n,m}`` form
    of the SPARQL 1.1 drafts, kept by Jena/Virtuoso; the unbounded
    closures cover ``+``/``*``). WALK semantics: length-k pairs are
    the k-fold composition of the edge relation (union of
    compositions, per the draft's definition) — not simple paths.
    ``m = 0`` adds the zero-length identity exactly like ``*``
    (§18.4: over the node set, or the constant endpoint's self-pair).

    k-hop reachability is the bounded-radius traversal the unbounded
    closure can't express: "entities within 3 ownership hops",
    "co-mention neighbours at distance 2..4". Cost shape: n−1
    composition joins, each edge-shaped and deduplicated, with a
    lineage cut per round (``round_checkpoint``) — the edge set is
    built once, persisted, released before return. Unlike ``+`` (path
    doubling, log rounds to the full closure), the LINEAR rounds here
    are the point: only radius ≤ n is ever materialized, so a hub's
    10^12-pair full closure is never built when n = 3.
    """
    from ..operators.canon import round_checkpoint

    if hi < lo:
        raise ValueError(f"path range {{{lo},{hi}}} has max < min")
    if hi > 64:
        raise ValueError(
            f"path range {{{lo},{hi}}}: bound {hi} > 64 — use the "
            "unbounded closure '+'/'*' (path doubling) instead of a "
            "linear 64-round traversal")
    base = _resolve(base, namespaces)
    edges = (quads.where((F.col("p") == base) & (F.col("o_kind") == "iri"))
             .select(F.col("s").alias("src"), F.col("o_lex").alias("dst"))
             .dropDuplicates()
             .persist())
    try:
        acc = None
        cur = edges
        for k in range(1, hi + 1):
            if k > 1:
                cur = (cur.join(edges.select(
                            F.col("src").alias("dst"),
                            F.col("dst").alias("nxt")), "dst")
                       .select("src", F.col("nxt").alias("dst"))
                       .dropDuplicates())
                cur = round_checkpoint(cur, checkpoint_dir)
            if k >= max(lo, 1):
                acc = cur if acc is None else (
                    acc.unionByName(cur).dropDuplicates())
        if acc is None:  # lo == hi == 0: pure identity
            acc = quads.sparkSession.createDataFrame(
                [], "src string, dst string")
        if lo == 0:
            acc = (acc.unionByName(_identity_pairs(quads, s, o, namespaces))
                   .dropDuplicates())
        # materialize through the final distinct before releasing the
        # shared edge cache (the tail's existence probe / downstream
        # joins re-execute otherwise)
        acc = round_checkpoint(acc, checkpoint_dir)
    finally:
        edges.unpersist()
    return _endpoint_bindings(acc, s, p, o, namespaces)


def match_bgp(
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    namespaces: dict[str, str] | None = None,
    optional: list[tuple[str, str, str]] | None = None,
    not_exists: list[tuple[str, str, str]] | None = None,
    graph: str | None = None,
) -> DataFrame:
    """Bindings of a conjunction of triple patterns.

    Each pattern is ``(s, p, o)``; ``'?name'`` marks a variable (bound
    column ``name`` in the result), anything else is a constant —
    prefixed names resolve through ``namespaces``, absolute IRIs and
    ``urn:`` match IRI terms, everything else matches literal lexical
    forms. Variables in object position bind the lexical form
    (``o_lex``) whatever the term kind.

    Patterns are ordered most-constants-first (static selectivity) and
    each pattern's projection is deduplicated before joining, so
    duplicate quads across graphs can't multiply bindings. Patterns
    sharing no variable with the accumulated bindings cross-join —
    correct BGP semantics, worth knowing when writing the query.

    ``optional``: entries whose variables bind when they match and stay
    NULL otherwise (left join on the shared vars — SPARQL OPTIONAL);
    ``not_exists``: entries whose match REMOVES a binding row
    (left-anti join — FILTER NOT EXISTS). Each entry is one pattern
    tuple or a LIST of patterns matching as a group (the SPARQL block
    form ``OPTIONAL { p1 . p2 }``); both join on the variables shared
    with the required bindings, and unshared vars in not_exists entries
    act as existential wildcards.

    Property paths: a constant predicate ending in ``+`` (``ex:under+``)
    matches one-or-more hops of the base predicate over IRI objects —
    the bindings come from ``canon.transitive_pairs`` (path doubling;
    runs EAGERLY at plan-build time, log-depth rounds). ``*`` and ``?``
    add the zero-length solutions per SPARQL §18.4: identity over the
    graph's node set when both endpoints are variables, the ``(c, c)``
    pair when an endpoint is constant. ``!p`` / ``!(p1|p2)`` negated
    property sets match any predicate NOT in the set. Deviation from
    SPARQL: under ``+`` a node cyclically reachable from itself is NOT
    returned as ``(x, x)`` (the closure drops self-pairs; ``*`` restores
    identity for every node), and closure over an alternation / inverse
    members inside a negated set fail loud. An IRI that genuinely ends
    in ``+``/``*``/``?`` is matched exactly by escaping (``...\\+``).

    ``graph``: SPARQL ``GRAPH`` scoping for the whole query (the
    ``GRAPH g { ... }`` block form, optional/not_exists included). A
    constant restricts matching to that named graph — the nanopub
    workflow's "query one run's assertion graph". A variable
    (``'?g'``) binds each match's source graph as a result column and
    unifies across patterns (all patterns must match in the SAME
    graph, per SPARQL). Property-path patterns reject a graph
    VARIABLE — the transitive closure spans graphs and carries no
    single provenance (scope them with a constant instead).
    """
    if not patterns:
        raise ValueError("empty pattern list")
    patterns = _expand_paths(patterns)
    gvar: str | None = None
    if graph is not None:
        if _is_var(graph):
            gvar = graph[1:]
            if not gvar:
                raise ValueError("unnamed graph variable")
        else:
            quads = quads.where(F.col("g") == _resolve(graph, namespaces))
            graph = None
    order = sorted(patterns,
                   key=lambda t: -sum(not _is_var(x) for x in t))
    out: DataFrame | None = None
    # a failed all-constant existence gate must still return the SCHEMA
    # the variable patterns promise — process var patterns first, then
    # apply gates as limit(0) on the accumulated bindings
    gates_failed = False
    order = ([t for t in order if any(_is_var(x) for x in t)]
             + [t for t in order if not any(_is_var(x) for x in t)])
    for s, p, o in order:
        neg = (None if not isinstance(p, str) or _is_var(p)
               else _negated(p))
        alts = (None if neg is not None or not isinstance(p, str)
                or _is_var(p) else _alternates(p))
        if alts is not None or neg is not None:
            pass  # alternation / negated set: predicate branch below
        elif isinstance(p, str) and len(p) >= 2 and p[-2] == "\\" \
                and p[-1] in "+*?":
            # escaped literal modifier: the (rare but legal) IRI that
            # really ends in '+'/'*'/'?' — exact match, no path meaning
            p = p[:-2] + p[-1]
        elif (isinstance(p, str) and not _is_var(p) and len(p) > 1
                and (p[-1] in "+*?" or _RANGE_PATH.match(p))):
            if gvar is not None:
                raise ValueError(
                    f"property-path pattern {(s, p, o)} cannot bind a "
                    "graph VARIABLE — the closure spans graphs; scope "
                    "with a constant graph instead")
            rng = _RANGE_PATH.match(p)
            if rng is not None:
                part = _range_path_bindings(
                    quads, s, p, o, namespaces, rng.group(1),
                    int(rng.group(2)), int(rng.group(3)))
            else:
                part = _path_bindings(quads, s, p, o, namespaces,
                                      mode=p[-1])
            if isinstance(part, bool):  # all-constant: existence gate
                gates_failed = gates_failed or not part
                continue
            if out is None:
                out = part
            else:
                shared = sorted(set(out.columns) & set(part.columns))
                out = (out.join(part, shared) if shared
                       else out.crossJoin(part))
            continue
        df = quads
        cols = []
        seen: set[str] = set()

        def bind(col, term):
            name = term[1:]
            if not name:
                raise ValueError(f"unnamed variable in pattern {(s, p, o)}")
            if name in seen:  # repeated var inside ONE pattern: equality
                df_filter.append(F.col(col) == F.col(_first[name]))
            else:
                seen.add(name)
                _first[name] = col
                cols.append(F.col(col).alias(name))

        _first: dict[str, str] = {}
        df_filter: list = []
        if _is_var(s):
            bind("s", s)
        else:
            df = df.where(F.col("s") == _resolve(s, namespaces))
        if _is_var(p):
            bind("p", p)
        elif neg is not None:
            df = df.where(~F.col("p").isin(
                [_resolve(a, namespaces) for a in neg]))
        elif alts is not None:
            df = df.where(F.col("p").isin(
                [_resolve(a, namespaces) for a in alts]))
        else:
            df = df.where(F.col("p") == _resolve(p, namespaces))
        if _is_var(o):
            bind("o_lex", o)
        else:
            ro = _resolve(o, namespaces)
            # a prefixed name denotes an IRI by construction (RDF);
            # comparing the RAW 'pfx:local' against literals would make
            # the same term mean different things per position
            if ro != o or _ABS_IRI.match(ro):
                df = df.where((F.col("o_kind") == "iri")
                              & (F.col("o_lex") == ro))
            else:
                df = df.where((F.col("o_kind") == "lit")
                              & (F.col("o_lex") == o))
        if gvar is not None:
            bind("g", graph)
        for cond in df_filter:
            df = df.where(cond)

        if not cols:
            # all-constant pattern: an existence gate — applied after
            # the bindings schema is fully built (loop order above)
            if df.limit(1).count() == 0:
                gates_failed = True
            continue
        part = df.select(*cols).dropDuplicates()
        if out is None:
            out = part
        else:
            shared = sorted(set(out.columns) & set(part.columns))
            out = out.join(part, shared) if shared else out.crossJoin(part)
    if out is None:  # every pattern was a constant: boolean result
        return quads.sparkSession.range(0 if gates_failed else 1).select(
            F.lit(True).alias("matched"))
    if gates_failed:
        out = out.limit(0)
    for pat in (optional or []):
        part = _group_bindings(quads, pat, namespaces, graph)
        shared = sorted(set(out.columns) & set(part.columns))
        if not shared:
            raise ValueError(
                f"optional pattern {pat} shares no variable with the "
                "required bindings — the left join would be a cross")
        out = out.join(part, shared, "left")
    for pat in (not_exists or []):
        part = _group_bindings(quads, pat, namespaces, graph)
        shared = sorted(set(out.columns) & set(part.columns))
        if not shared:
            raise ValueError(
                f"not_exists pattern {pat} shares no variable with the "
                "required bindings — it can only be an existence gate, "
                "write it as a required all-constant pattern instead")
        out = out.join(part.select(*shared).dropDuplicates(), shared,
                       "left_anti")
    internal = [c for c in out.columns if c.startswith("__pp")]
    if internal:
        keep = [c for c in out.columns if c not in internal]
        if not keep:
            # every surviving column was an internal chain variable:
            # an all-constant sequence — boolean existence result
            return quads.sparkSession.range(
                0 if out.limit(1).count() == 0 else 1
            ).select(F.lit(True).alias("matched"))
        # set semantics on the user-visible projection (each pattern's
        # own projection was already deduplicated; removing the chain
        # variables can re-collapse rows)
        out = out.drop(*internal).dropDuplicates()
    return out


def _group_bindings(quads, pat, namespaces, graph=None):
    """An optional/not_exists entry is either ONE pattern tuple or a
    LIST of patterns forming a group: the group matches as a unit (its
    patterns join on their shared variables via a recursive
    :func:`match_bgp`) before the left / left-anti join against the
    required bindings — SPARQL's ``OPTIONAL { p1 . p2 }`` /
    ``FILTER NOT EXISTS { p1 . p2 }`` block semantics."""
    group = pat if isinstance(pat, list) else [pat]
    got = match_bgp(quads, group, namespaces, graph=graph)
    if got.columns == ["matched"]:
        raise ValueError(
            f"pattern group {pat} binds no variable; optional/not_exists "
            "entries need at least one")
    return got


_AGG_FNS = {
    "count": lambda c: F.count(c),
    "count_distinct": lambda c: F.countDistinct(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    # object lexical forms are strings; numeric aggregates parse them
    # with try_cast (ANSI-safe — a non-numeric literal becomes NULL and
    # is skipped, exactly SPARQL's error-as-unbound aggregate behavior)
    "sum": lambda c: F.sum(c.try_cast("long")),
    # avg: exact-long sum / exact count, one IEEE divide — bit-identical
    # across engines as long as the sum stays under 2^53 (lexical forms
    # are corpus counters, not astronomic); SPARQL's numeric-promotion
    # semantics via the same try_cast discipline as sum
    "avg": lambda c: F.avg(c.try_cast("long")),
    # GROUP_CONCAT: SPARQL leaves element order implementation-defined;
    # we pin lexicographic order so results are deterministic (and
    # replayable in any engine with an ordered string_agg)
    "group_concat": lambda c: F.array_join(
        F.array_sort(F.collect_list(c)), ","),
    # SAMPLE: any one binding — pinned to min() for determinism
    "sample": lambda c: F.min(c),
}


_CMP = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
        "<=": operator.le, ">": operator.gt, ">=": operator.ge}


def filter_bindings(
    bindings: DataFrame,
    filters: list[tuple[str, str, object]],
) -> DataFrame:
    """SPARQL-style FILTER over bound variables: each filter is
    ``(var, op, value)`` with op in = != < <= > >= regex.

    Typing follows SPARQL's effective-boolean-value discipline: a
    NUMERIC ``value`` compares via ``try_cast`` of the lexical form
    (a non-numeric binding is a type error → row filtered, never a
    task failure — ANSI mode would abort the job on a plain cast); a
    string value compares lexically; ``regex`` is an rlike. All pure
    Column predicates, pushed down by Catalyst like any other filter.
    """
    out = bindings
    for var, op, value in filters:
        c = F.col(var)
        if op == "regex":
            cond = c.rlike(str(value))
        elif op in _CMP:
            if isinstance(value, bool):
                raise ValueError("boolean FILTER values are not supported")
            if isinstance(value, int):
                # decimal, not double: exact past 2^53 (a double
                # comparison equates 2^53+1 with 2^53), yet still
                # numeric-promoting for fractional lexicals
                # ("99.5" > 99 is true, per SPARQL)
                cond = _CMP[op](c.try_cast("decimal(38,9)"), F.lit(value))
            elif isinstance(value, float):
                cond = _CMP[op](c.try_cast("double"), F.lit(value))
            else:
                cond = _CMP[op](c, F.lit(value))
        else:
            raise ValueError(f"unknown FILTER op {op!r}; "
                             f"supported: {sorted(_CMP) + ['regex']}")
        out = out.where(cond)
    return out


def aggregate_bindings(
    bindings: DataFrame,
    group_vars: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """SPARQL-style ``GROUP BY`` over a BGP's bindings: ``group_vars``
    name binding columns, ``aggs`` maps output-column → (fn, var) with
    fn in count / count_distinct / min / max / sum.

    Same shuffle shape as any groupBy — partial aggregation map-side,
    result sized by the group-key cardinality. ``sum`` parses lexical
    forms leniently (non-numeric → NULL → skipped), mirroring SPARQL's
    treatment of type errors inside aggregates.
    """
    exprs = []
    for out_name, (fn, var) in sorted(aggs.items()):
        if fn not in _AGG_FNS:
            raise ValueError(f"unknown aggregate {fn!r}; "
                             f"supported: {sorted(_AGG_FNS)}")
        exprs.append(_AGG_FNS[fn](F.col(var)).alias(out_name))
    return bindings.groupBy(*group_vars).agg(*exprs)


def union_bgp(
    quads: DataFrame,
    groups: list[list[tuple[str, str, str]]],
    namespaces: dict[str, str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """SPARQL UNION: the bindings of each pattern group, stacked.
    Groups may bind different variable sets — variables absent from a
    branch come back NULL (SPARQL's unbound), columns aligned by name.
    ``distinct=True`` adds the SELECT DISTINCT dedup.

    Each branch filters the quads differently, so separate scans per
    branch are inherent to UNION — but remember there is no CSE across
    union branches: if ``quads`` is itself an expensive derivation,
    persist it before calling, or every branch re-runs that pipeline.
    """
    if not groups or any(not g for g in groups):
        raise ValueError("union_bgp needs non-empty pattern groups")
    parts = [match_bgp(quads, list(g), namespaces) for g in groups]
    for g, p in zip(groups, parts):
        if p.columns == ["matched"]:
            raise ValueError(
                f"union branch {g} binds no variable — an all-constant "
                "branch cannot contribute bindings")
    all_vars = sorted(set().union(*[set(p.columns) for p in parts]))
    aligned = [
        p.select(*[
            F.col(v) if v in p.columns
            else F.lit(None).cast("string").alias(v)
            for v in all_vars])
        for p in parts
    ]
    out = aligned[0]
    for p in aligned[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates() if distinct else out


def construct_quads(
    bindings: DataFrame,
    templates: list[tuple[str, str, str]],
    namespaces: dict[str, str] | None = None,
    graph: str | None = None,
    distinct: bool = True,
) -> DataFrame:
    """SPARQL-CONSTRUCT analog: materialize new quads from BGP bindings.

    Each template is ``(s, p, o)`` with ``'?name'`` referencing a binding
    column and anything else a constant (prefixed names resolve through
    ``namespaces`` as in :func:`match_bgp`). Per SPARQL semantics a
    binding row whose referenced variable is NULL (e.g. an unmatched
    OPTIONAL) constructs nothing for that template, and the result is a
    graph — set semantics — so duplicates are dropped unless
    ``distinct=False``.

    Term kinds: subject/predicate positions are IRIs by construction
    (the caller binds IRI-valued variables there, as in SPARQL).
    Object constants follow :func:`match_bgp`'s rule (prefixed/absolute
    → IRI, else plain literal); object *variables* carry only a lexical
    form (``match_bgp`` binds ``o_lex``), so the kind is re-derived per
    row: absolute-IRI / urn: shapes are IRIs, everything else a plain
    literal. Typed/lang literals are the extraction pipeline's job —
    CONSTRUCT covers rewrite/entailment-style derivation.

    Plan shape: ONE ``explode(array(struct...))`` over the templates —
    a per-template union would re-execute the upstream BGP T times (no
    CSE across union branches). Zero shuffles beyond the bindings
    themselves unless ``distinct`` adds its dedup exchange.
    """
    if not templates:
        raise ValueError("empty template list")

    def iri_term(t: str, pos: str) -> Column:
        if _is_var(t):
            return F.col(t[1:])
        r = _resolve(t, namespaces)
        if r == t and not _ABS_IRI.match(r):
            raise ValueError(f"{pos} constant {t!r} is not an IRI")
        return F.lit(r)

    structs = []
    for s, p, o in templates:
        sc, pc = iri_term(s, "subject"), iri_term(p, "predicate")
        if _is_var(o):
            oc = F.col(o[1:])
            kind = F.when(
                oc.rlike("^[A-Za-z][A-Za-z0-9+.-]*://|^urn:"),
                F.lit("iri")).otherwise(F.lit("lit"))
        else:
            ro = _resolve(o, namespaces)
            is_iri = ro != o or bool(_ABS_IRI.match(ro))
            oc = F.lit(ro if is_iri else o)
            kind = F.lit("iri" if is_iri else "lit")
        structs.append(F.struct(
            sc.cast("string").alias("s"), pc.cast("string").alias("p"),
            kind.alias("o_kind"), oc.cast("string").alias("o_lex")))
    out = (
        bindings.select(F.explode(F.array(*structs)).alias("_q"))
        .select("_q.*")
        .where(F.col("s").isNotNull() & F.col("p").isNotNull()
               & F.col("o_lex").isNotNull())
        .select(F.lit(graph).cast("string").alias("g"), "s", "p",
                "o_kind", "o_lex",
                F.lit(None).cast("string").alias("o_dt"),
                F.lit(None).cast("string").alias("o_lang"))
    )
    return out.dropDuplicates() if distinct else out


def solution_modifiers(
    bindings: DataFrame,
    order_by: list[tuple[str, str]],
    limit: int | None = None,
    offset: int = 0,
    select: list[str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """SPARQL solution modifiers over a BGP's bindings: projection,
    DISTINCT, ORDER BY (asc/desc, NULLs last like SPARQL's
    unbound-sorts-lowest rule inverted per direction is a vendor
    choice — we pin NULLS LAST both directions), OFFSET, LIMIT.

    ``order_by`` must impose a TOTAL order on the surviving rows or
    LIMIT/OFFSET would return an engine-dependent slice — that is a
    correctness bug, not a style preference, so callers list enough
    tie-break variables (typically ending in the subject var).

    Scale shape: ORDER+LIMIT without OFFSET compiles to Spark's
    TakeOrderedAndProject (per-partition top-k, no global sort of the
    full binding set). An OFFSET forces ranking past the skip window —
    still a top-(offset+limit) — and an unbounded ORDER BY (no limit)
    is a real global sort, priced accordingly. DISTINCT applies before
    ordering, SPARQL's evaluation order (projection → distinct →
    order → slice).
    """
    if not order_by and (limit is not None or offset):
        raise ValueError("LIMIT/OFFSET without ORDER BY returns an "
                         "engine-dependent slice; pass order_by")
    if offset < 0 or (limit is not None and limit < 0):
        raise ValueError("offset and limit must be non-negative")
    out = bindings.select(*select) if select else bindings
    if distinct:
        out = out.distinct()
    cols = []
    for var, direction in order_by:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc/desc, "
                             f"got {direction!r}")
        c = F.col(var)
        cols.append(c.asc_nulls_last() if direction == "asc"
                    else c.desc_nulls_last())
    if cols:
        out = out.orderBy(*cols)
    if offset and limit is not None:
        # top-(offset+limit) FIRST (TakeOrdered, per-partition top-k),
        # then rank only that bounded slice — the unpartitioned
        # row_number window is fine over offset+limit rows, where over
        # the full binding set it would single-task the world
        out = out.limit(offset + limit)
        w = Window.orderBy(*cols)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") > offset).drop("_rn"))
    elif limit is not None:
        out = out.limit(limit)
    elif offset:
        # OFFSET with no LIMIT is inherently a global rank — priced
        # accordingly (prefer keyset pagination at scale)
        w = Window.orderBy(*cols)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") > offset).drop("_rn"))
    return out


def minus_bgp(
    bindings: DataFrame,
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    namespaces: dict[str, str] | None = None,
    graph: str | None = None,
) -> DataFrame:
    """SPARQL MINUS: remove every binding row for which the ``patterns``
    group has a compatible solution sharing at least one bound variable.

    This is the semantics that differs from FILTER NOT EXISTS
    (``match_bgp(not_exists=...)``) exactly where SPARQL says it does:
    a MINUS group sharing NO variable with the left bindings removes
    NOTHING (domain intersection empty → incompatible by definition),
    while NOT EXISTS would wipe the result wherever the group matches at
    all. Spec: SPARQL 1.1 §8.3.

    ``patterns`` is a plain conjunctive group (no OPTIONAL inside —
    SPARQL allows it, this engine's MINUS does not), so every shared
    variable is BOUND on the right side. Left rows may carry NULLs from
    their own OPTIONALs; per the spec an unbound var is compatible with
    anything and contributes nothing to the domain intersection.

    Scale shape: rows with all shared vars bound — the corpus-scale
    case — are removed with one hash LEFT ANTI join on the shared
    columns against the deduplicated right projection. Rows with a NULL
    in a shared var (only possible downstream of OPTIONAL) take a
    conditional anti-join (nested-loop against the deduped right side);
    that residue is OPTIONAL-miss-sized, never corpus-sized, and rows
    with ALL shared vars NULL survive outright without joining.
    """
    right = match_bgp(quads, patterns, namespaces, graph=graph)
    shared = [c for c in bindings.columns if c in right.columns]
    if not shared:
        return bindings
    r = right.select(*shared).dropDuplicates()
    all_bound = None
    for v in shared:
        c = F.col(v).isNotNull()
        all_bound = c if all_bound is None else (all_bound & c)
    solid = bindings.where(all_bound)
    holey = bindings.where(~all_bound)
    out = solid.join(r, shared, "left_anti")
    # residue path: compatible = every shared var equal-or-left-NULL;
    # removable only when at least one shared var is bound on the left.
    # (The two branches each scan `bindings` — no CSE across a union;
    # persist an expensive bindings pipeline before calling, as with
    # union_bgp. The residue side is empty unless OPTIONAL ran upstream.)
    rr = r.select(*[F.col(v).alias(f"_m_{v}") for v in shared])
    compat = None
    some_bound = None
    for v in shared:
        eq = (F.col(v) == F.col(f"_m_{v}")) | F.col(v).isNull()
        compat = eq if compat is None else (compat & eq)
        nb = F.col(v).isNotNull()
        some_bound = nb if some_bound is None else (some_bound | nb)
    survivors = holey.join(rr, compat & some_bound, "left_anti")
    return out.unionByName(survivors)


def values_clause(
    bindings: DataFrame,
    rows: list[dict],
) -> DataFrame:
    """SPARQL ``VALUES``: join an inline solution sequence into the
    bindings. Each dict maps variable name (no ``?``) → lexical value;
    a missing key or ``None`` is ``UNDEF`` (compatible with anything,
    contributes no constraint). Variables not yet in ``bindings``
    extend the schema; rows sharing no bound variable cross-join (the
    spec's compatibility with everything).

    Scale shape: the inline table is literal data — always broadcast.
    Bindings rows with every shared variable bound (the corpus-scale
    case) take one broadcast hash join per UNDEF-pattern group;
    NULL-carrying rows (possible only downstream of OPTIONAL) take the
    conditional broadcast join. Per SPARQL §10.2 a binding-side unbound
    variable is compatible with any VALUES entry and the merged row
    takes the VALUES side's value.
    """
    if not rows:
        raise ValueError("VALUES needs at least one row")
    vnames: list[str] = sorted({k for r in rows for k in r})
    if not vnames:
        raise ValueError("VALUES rows bind no variables")
    for v in vnames:
        if v.startswith("?"):
            raise ValueError(
                f"VALUES variable {v!r}: pass names without the '?'")
    spark = bindings.sparkSession
    vdf = spark.createDataFrame(
        [tuple(r.get(v) for v in vnames) for r in rows],
        ", ".join(f"`{v}` string" for v in vnames))
    shared = [v for v in vnames if v in bindings.columns]
    fresh = [v for v in vnames if v not in bindings.columns]
    if not shared:
        return bindings.crossJoin(F.broadcast(vdf.dropDuplicates()))
    vren = vdf.select(
        *[F.col(v).alias(f"_v_{v}") for v in shared],
        *[F.col(v) for v in fresh]).dropDuplicates()
    compat = None
    for v in shared:
        eq = (F.col(f"_v_{v}").isNull() | F.col(v).isNull()
              | (F.col(v) == F.col(f"_v_{v}")))
        compat = eq if compat is None else (compat & eq)
    joined = bindings.join(F.broadcast(vren), compat)
    keep = [c for c in bindings.columns if c not in shared]
    merged = [F.coalesce(F.col(v), F.col(f"_v_{v}")).alias(v)
              for v in shared]
    return joined.select(*keep, *merged, *fresh)


def ask_bgp(
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    namespaces: dict[str, str] | None = None,
    graph: str | None = None,
) -> DataFrame:
    """SPARQL ``ASK``: one ``(matched=true)`` row iff the pattern group
    has any solution, else empty — the engine's established boolean
    convention (all-constant gates already return it). ``limit(1)``
    makes the underlying scan stop at first match; no driver action."""
    out = match_bgp(quads, patterns, namespaces, graph=graph)
    if out.columns == ["matched"]:
        return out
    return out.limit(1).select(F.lit(True).alias("matched"))


def bind_expr(
    bindings: DataFrame,
    var: str,
    expr: "Column | str",
) -> DataFrame:
    """SPARQL ``BIND(expr AS ?var)``: extend each solution with a
    computed binding. ``expr`` is a pyspark Column (or a SQL expression
    string) over the already-bound variables; per SPARQL §10.1 the
    target variable must not be in scope yet.

    Pure projection — no shuffle, folds into whatever stage produced
    the bindings, and Catalyst sees through it for pushdown (a FILTER
    on the bound variable lands next to the source scan when the
    expression is deterministic).
    """
    if var in bindings.columns:
        raise ValueError(
            f"BIND target ?{var} is already bound (SPARQL §10.1: the "
            "variable introduced by BIND must not be in scope)")
    col = F.expr(expr) if isinstance(expr, str) else expr
    return bindings.withColumn(var, col)


def describe_cbd(
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    var: str,
    namespaces: dict[str, str] | None = None,
) -> DataFrame:
    """SPARQL ``DESCRIBE ?var WHERE { ... }``: every quad whose subject
    is a solution value of ``?var`` — the concise-bounded-description
    under this engine's skolemized-IRI model (no blank nodes to chase,
    csvw skolemization per SURVEY §2.3, so subject-match IS the CBD).

    Plan shape: the pattern's distinct subjects are a small derived
    table joined back into the quad set with a LEFT SEMI join — Spark
    broadcasts it when it fits (solution sets are query-sized, the
    quad corpus never re-shuffles), and only ``s`` is read from the
    probe side.
    """
    subjects = (match_bgp(quads, patterns, namespaces)
                .select(F.col(var).alias("s")).distinct())
    return quads.join(F.broadcast(subjects), "s", "left_semi")


def having_bindings(
    grouped: DataFrame,
    filters: list[tuple[str, str, object]],
) -> DataFrame:
    """SPARQL ``HAVING``: FILTER applied to aggregate_bindings output.
    Aggregate columns are already typed (count/sum are longs), so the
    comparison is direct — no lexical re-parse; same pure-Column
    predicate discipline as filter_bindings."""
    out = grouped
    for var, op, value in filters:
        if op not in _CMP:
            raise ValueError(f"unknown HAVING op {op!r}; "
                             f"supported: {sorted(_CMP)}")
        out = out.where(_CMP[op](F.col(var), F.lit(value)))
    return out


def _plain_patterns_only(patterns, op: str) -> None:
    for s, p, o in patterns:
        if isinstance(p, str) and not _is_var(p):
            if (p.startswith(("^", "!")) or _SEQ_SEP in p
                    or (p.endswith(("+", "*", "?"))
                        and not p.endswith(("\\+", "\\*", "\\?")))
                    or _RANGE_PATH.match(p)
                    or _ALT_SPLIT.search(p)):
                raise ValueError(
                    f"{op}: property-path forms are not supported in "
                    f"templates ({p!r}) — paths describe reachability, "
                    "which has no per-quad footprint")


def delete_where(
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    namespaces: dict[str, str] | None = None,
    graph: str | None = None,
) -> DataFrame:
    """SPARQL ``DELETE WHERE { patterns }`` analog: remove every quad
    that instantiates one of the patterns under some solution of the
    WHOLE group (shared variables constrain across patterns, exactly
    like the match). Returns the surviving quads.

    Each pattern anti-joins the quad table against the DISTINCT
    projection of the group's bindings over that pattern's variables,
    with constants filtering exactly as :func:`match_bgp` matched them
    — full quad identity (datatype, language tag, graph) survives on
    non-matching rows, nothing is re-instantiated. Object variables
    compare by lexical form (bindings are lexical): an IRI and a
    literal sharing a lexical form both match — documented deviation,
    unreachable for IRI-shaped values. ``graph`` (constant) scopes
    both the match and the deletion footprint.

    Plan: the bindings evaluate once per referenced projection; every
    anti-join's build side is a solution-set projection (query-sized,
    broadcast) — the corpus passes through ``len(patterns)`` anti-joins
    without shuffling. Property paths are rejected loudly (reachability
    has no quad-level deletion footprint).
    """
    _plain_patterns_only(patterns, "delete_where")
    b = match_bgp(quads, patterns, namespaces, graph=graph)
    all_const = [pat for pat in patterns
                 if not any(_is_var(t) for t in pat)]
    gate_open = True
    if all_const:
        gate_open = b.limit(1).count() > 0
    out = quads
    for s, p, o in patterns:
        conds = []
        proj = []
        if graph is not None:
            conds.append(F.col("g") == F.lit(graph))
        if _is_var(s):
            proj.append(F.col(s[1:]).alias(f"_del_{s[1:]}"))
            conds.append(F.col("s") == F.col(f"_del_{s[1:]}"))
        else:
            conds.append(F.col("s") == F.lit(_resolve(s, namespaces)))
        if _is_var(p):
            proj.append(F.col(p[1:]).alias(f"_del_{p[1:]}"))
            conds.append(F.col("p") == F.col(f"_del_{p[1:]}"))
        else:
            conds.append(F.col("p") == F.lit(_resolve(p, namespaces)))
        if _is_var(o):
            proj.append(F.col(o[1:]).alias(f"_del_{o[1:]}"))
            conds.append(F.col("o_lex") == F.col(f"_del_{o[1:]}"))
        else:
            ro = _resolve(o, namespaces)
            kind = "iri" if (ro != o or _ABS_IRI.match(ro)) else "lit"
            conds.append((F.col("o_kind") == kind)
                         & (F.col("o_lex") == F.lit(ro)))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        if proj:
            bp = b.select(*proj).dropDuplicates()
            out = out.join(F.broadcast(bp), cond, "left_anti")
        elif gate_open:
            out = out.where(~cond)
    return out


def insert_where(
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    templates: list[tuple[str, str, str]],
    namespaces: dict[str, str] | None = None,
    graph: str | None = None,
    insert_graph: str | None = None,
) -> DataFrame:
    """SPARQL ``INSERT { templates } WHERE { patterns }`` analog: the
    quad table extended with every template instantiation
    (:func:`construct_quads` does the deriving — NULL-variable rows
    construct nothing, set semantics on the derived rows).

    The inserted side is bindings-sized; it anti-joins the existing
    quads on full null-safe quad identity so already-present rows are
    not duplicated — the CORPUS is never re-shuffled for a dedup (the
    union's set semantics costs only the small side). Assumes the
    input is already a quad SET (extraction dedups; ``dedup='none'``
    callers own their duplicates).
    """
    from ..model import QUAD_COLS

    _plain_patterns_only(templates, "insert_where")
    b = match_bgp(quads, patterns, namespaces, graph=graph)
    ins = construct_quads(b, templates, namespaces, graph=insert_graph)
    base = quads.select(*QUAD_COLS)
    cond = None
    for c in QUAD_COLS:
        eq = ins[c].eqNullSafe(base[c])
        cond = eq if cond is None else (cond & eq)
    fresh = ins.join(base, cond, "left_anti")
    return base.unionByName(fresh)


def update_where(
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
    delete_templates: list[tuple[str, str, str]] | None = None,
    insert_templates: list[tuple[str, str, str]] | None = None,
    namespaces: dict[str, str] | None = None,
    graph: str | None = None,
) -> DataFrame:
    """``DELETE { d } INSERT { i } WHERE { patterns }``: the composed
    update — deletion templates restricted to the WHERE patterns
    themselves (the DELETE WHERE fragment; arbitrary delete templates
    would need term re-instantiation, see delete_where). Per SPARQL
    Update §3.1.3 the WHERE bindings evaluate ONCE against the
    original store; deletes apply first, then the inserts derived
    from those original bindings — an INSERT whose WHERE matches the
    rows being deleted still fires."""
    from ..model import QUAD_COLS

    out = quads.select(*QUAD_COLS)
    if delete_templates is not None:
        if delete_templates != patterns:
            raise ValueError(
                "update_where supports DELETE WHERE semantics only: "
                "delete_templates must equal the WHERE patterns")
        out = delete_where(quads, patterns, namespaces, graph=graph)
    if insert_templates:
        _plain_patterns_only(insert_templates, "update_where")
        # bindings from the ORIGINAL store, not the post-delete one
        b = match_bgp(quads, patterns, namespaces, graph=graph)
        ins = construct_quads(b, insert_templates, namespaces)
        cond = None
        for c in QUAD_COLS:
            eq = ins[c].eqNullSafe(out[c])
            cond = eq if cond is None else (cond & eq)
        fresh = ins.join(out, cond, "left_anti")
        out = out.unionByName(fresh)
    return out
