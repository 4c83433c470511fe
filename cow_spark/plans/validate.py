"""Typed-literal validation for quad tables — the KG QA pass.

The reference emits typed literals from CSV cells without checking that
the lexical form actually inhabits the declared datatype (a dirty cell
becomes `"3.7abc"^^xsd:integer` and every downstream consumer chokes at
its own time). This audit finds them up front.

Validation is by REGEX over the lexical form, not try_cast: cast
leniency differs between engines ('+5', '3.7', whitespace), while a
character-class regex in the Java∩RE2 subset evaluates identically in
Spark and the DuckDB oracle. The check is lexical-space membership (for
dates, including month/day digit ranges); calendar pathologies like
Feb 31 are out of scope and documented as such.

Known true positive on this engine's own output: the canonical
timestamp rendering (`spec/templates.py:TS_FMT`, space-separated like
COW emits from SQL-style cells) is NOT in xsd:dateTime's lexical space,
which requires the 'T' separator — the validator flags those quads by
design, exactly as it would flag the reference's. Declare such columns
untyped or template the 'T' form if strict XSD consumers are downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"

# lexical-space patterns (Java ∩ RE2: no backrefs, no \d shorthand
# ambiguity — explicit classes)
DATATYPE_PATTERNS: dict[str, str] = {
    XSD + "integer": r"^[+-]?[0-9]+$",
    XSD + "int": r"^[+-]?[0-9]+$",
    XSD + "long": r"^[+-]?[0-9]+$",
    XSD + "nonNegativeInteger": r"^[+]?[0-9]+$",
    XSD + "decimal": r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$",
    XSD + "double": (r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)"
                     r"([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$"),
    XSD + "float": (r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)"
                    r"([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$"),
    XSD + "boolean": r"^(true|false|0|1)$",
    XSD + "date": r"^-?[0-9]{4,}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])$",
    XSD + "dateTime": (r"^-?[0-9]{4,}-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])"
                       r"T([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]"
                       r"(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$"),
    XSD + "gYear": r"^-?[0-9]{4,}$",
    XSD + "anyURI": r"^[A-Za-z][A-Za-z0-9+.-]*:",
}


def validate_typed_literals(quads: DataFrame) -> DataFrame:
    """Audit every typed literal in a quads table against its declared
    datatype's lexical space. Returns the VIOLATIONS —
    ``(s, p, o_lex, o_dt, reason)`` with reason ``invalid-lexical`` —
    plus ``unknown-datatype`` rows for datatypes this validator has no
    pattern for (surfaced, not silently passed: an unknown datatype is
    itself a spec smell worth seeing).

    One scan, zero shuffles: the datatype dispatch compiles to a single
    chained CASE over :data:`DATATYPE_PATTERNS` (vocabulary-sized,
    literal — never a join), entirely inside whole-stage codegen.
    """
    lit_rows = quads.where(
        (F.col("o_kind") == "lit") & F.col("o_dt").isNotNull())
    ok = None
    for dt, pat in DATATYPE_PATTERNS.items():
        branch_ok = F.col("o_lex").rlike(pat)
        cond = F.col("o_dt") == dt
        ok = (F.when(cond, branch_ok) if ok is None
              else ok.when(cond, branch_ok))
    verdict = ok.otherwise(F.lit(None))  # NULL = unknown datatype
    known = F.col("o_dt").isin(list(DATATYPE_PATTERNS))
    return (
        lit_rows.withColumn("_ok", verdict)
        .where(F.col("o_lex").isNull() | F.col("_ok").isNull()
               | ~F.col("_ok"))
        .select(
            "s", "p", "o_lex", "o_dt",
            # a NULL lexical form makes rlike NULL even for a known
            # datatype — report it as its own reason, not as unknown
            F.when(F.col("o_lex").isNull(), F.lit("null-lexical"))
            .when(~known, F.lit("unknown-datatype"))
            .otherwise(F.lit("invalid-lexical")).alias("reason"))
    )


def integrity_report(
    quads: DataFrame,
    functional_preds: list[str],
    dangling_prefix: str | None = None,
) -> DataFrame:
    """Structural KG QA, the complement of the lexical audit above:

    - ``functional-violation``: a subject with more than one DISTINCT
      object under a predicate declared functional (owl:Functional-
      Property semantics — 'everyone has exactly one parent/birthdate';
      two values means an upstream merge or extraction bug). Reported
      per (p, node=s) with n = the distinct-object count.
    - ``dangling-reference``: an IRI object that never occurs as a
      subject — at KG scale these are broken joins waiting to happen
      (BGP patterns silently match nothing). Reported per (p, node=o)
      with n = how many quads point at it. Pass ``dangling_prefix``
      (typically the KG's own base IRI) to scope the check to
      INTERNAL references: external vocabulary/entity IRIs are
      *expected* to be undefined in-graph, and leaf IRIs a mapping
      deliberately never describes (e.g. per-turn conversation links)
      are findings to triage, not necessarily bugs.

    Returns ``(check, p, node, n)``. Scale shape: one groupBy per
    check plus one left-anti join of distinct objects vs distinct
    subjects — aggregate-sized shuffles, corpus touched twice. A
    healthy KG returns zero FUNCTIONAL rows; the dangling section is
    the triage list for the declared namespace. Run it as a publish
    gate next to :func:`validate_typed_literals`.
    """
    func = quads.sparkSession.createDataFrame(
        [(p,) for p in functional_preds] or [("\x00none",)], "p string")
    obj_key = F.concat_ws(
        "\x1f", F.col("o_kind"),
        F.coalesce(F.col("o_lex"), F.lit("\x00")),
        F.coalesce(F.col("o_dt"), F.lit("\x00")),
        F.coalesce(F.col("o_lang"), F.lit("\x00")))
    violations = (
        quads.join(F.broadcast(func), "p")
        .groupBy("p", F.col("s").alias("node"))
        .agg(F.countDistinct(obj_key).alias("n"))
        .where(F.col("n") > 1)
        .select(F.lit("functional-violation").alias("check"),
                "p", "node", "n"))
    iri_objs = quads.where(F.col("o_kind") == "iri")
    if dangling_prefix is not None:
        iri_objs = iri_objs.where(
            F.col("o_lex").startswith(dangling_prefix))
    subjects = quads.select(F.col("s").alias("node")).distinct()
    dangling = (
        iri_objs.groupBy("p", F.col("o_lex").alias("node"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .join(subjects, "node", "left_anti")
        .select(F.lit("dangling-reference").alias("check"),
                "p", "node", "n"))
    return violations.unionByName(dangling)


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SHAPE_KEYS = {"target_class", "property", "min_count", "max_count",
               "datatype", "node_kind"}


def shape_report(quads: DataFrame, shapes: list[dict]) -> DataFrame:
    """SHACL-lite shape validation — the declarative publish gate the
    W3C shapes stack provides, re-expressed as joins/aggregates. Each
    shape is a dict: ``target_class`` (focus = every subject typed
    with it), ``property``, and any of ``min_count`` (default 0),
    ``max_count`` (None = unbounded), ``datatype`` (required ``o_dt``
    on literal objects), ``node_kind`` (``'iri'``/``'lit'``).

    Returns one row PER VIOLATED CONSTRAINT:
    ``(shape_idx, focus, constraint, actual)`` with ``constraint`` in
    ``min_count | max_count | datatype | node_kind`` and ``actual``
    the offending value rendered as a string (the count, or the number
    of offending triples). Conforming focus nodes emit nothing; an
    empty result is a pass.

    Plan shape: the shape list is a broadcast literal table; focus
    selection is one join of the type triples against it, the
    constraint stats are ONE aggregate over (shape, focus) of the
    property triples (corpus filtered by the broadcast join on ``p``
    first, then semi-joined to focus), and min_count=0-vs-missing is a
    left join from the focus side. No shape-count-many passes over the
    corpus.
    """
    if not shapes:
        raise ValueError("shape_report: empty shape list")
    for i, sh in enumerate(shapes):
        unknown = set(sh) - _SHAPE_KEYS
        if unknown or "target_class" not in sh or "property" not in sh:
            raise ValueError(
                f"shape {i}: needs target_class+property, unknown keys "
                f"{sorted(unknown)}")
        if sh.get("node_kind") not in (None, "iri", "lit"):
            raise ValueError(f"shape {i}: node_kind must be iri|lit")
    spark = quads.sparkSession
    shape_df = spark.createDataFrame(
        [(i, sh["target_class"], sh["property"],
          int(sh.get("min_count", 0) or 0), sh.get("max_count"),
          sh.get("datatype"), sh.get("node_kind"))
         for i, sh in enumerate(shapes)],
        "shape_idx int, target_class string, property string, "
        "min_count int, max_count int, datatype string, "
        "node_kind string")

    focus = (quads.where((F.col("p") == _RDF_TYPE)
                         & (F.col("o_kind") == "iri"))
             .select(F.col("s").alias("focus"),
                     F.col("o_lex").alias("target_class"))
             .dropDuplicates()
             .join(F.broadcast(shape_df), "target_class")
             .select("shape_idx", "focus", "min_count", "max_count"))

    vals = (quads.join(
        F.broadcast(shape_df.select("shape_idx",
                                    F.col("property").alias("p"),
                                    "datatype", "node_kind")), "p")
        .select("shape_idx", F.col("s").alias("focus"),
                "o_kind", "o_dt", "datatype", "node_kind"))
    stats = (vals.groupBy("shape_idx", "focus").agg(
        F.count("*").alias("n"),
        F.sum(F.when(
            F.col("datatype").isNotNull()
            & ((F.col("o_kind") != "lit")
               | ~F.col("o_dt").eqNullSafe(F.col("datatype"))),
            1).otherwise(0)).alias("n_bad_dt"),
        F.sum(F.when(
            F.col("node_kind").isNotNull()
            & (F.col("o_kind") != F.col("node_kind")),
            1).otherwise(0)).alias("n_bad_kind")))

    j = (focus.join(stats, ["shape_idx", "focus"], "left")
         .select("shape_idx", "focus", "min_count", "max_count",
                 F.coalesce("n", F.lit(0)).alias("n"),
                 F.coalesce("n_bad_dt", F.lit(0)).alias("n_bad_dt"),
                 F.coalesce("n_bad_kind", F.lit(0)).alias("n_bad_kind")))
    null_v = F.lit(None).cast("string")
    # sentinel NULL-field structs keep the array type uniform; the
    # post-explode filter drops them
    viol = F.array(
        F.when(F.col("n") < F.col("min_count"), F.struct(
            F.lit("min_count").alias("constraint"),
            F.col("n").cast("string").alias("actual"))).otherwise(
            F.struct(null_v.alias("constraint"), null_v.alias("actual"))),
        F.when(F.col("max_count").isNotNull()
               & (F.col("n") > F.col("max_count")), F.struct(
            F.lit("max_count").alias("constraint"),
            F.col("n").cast("string").alias("actual"))).otherwise(
            F.struct(null_v.alias("constraint"), null_v.alias("actual"))),
        F.when(F.col("n_bad_dt") > 0, F.struct(
            F.lit("datatype").alias("constraint"),
            F.col("n_bad_dt").cast("string").alias("actual"))).otherwise(
            F.struct(null_v.alias("constraint"), null_v.alias("actual"))),
        F.when(F.col("n_bad_kind") > 0, F.struct(
            F.lit("node_kind").alias("constraint"),
            F.col("n_bad_kind").cast("string").alias("actual"))).otherwise(
            F.struct(null_v.alias("constraint"), null_v.alias("actual"))),
    )
    return (j.select("shape_idx", "focus", F.explode(viol).alias("v"))
            .where(F.col("v.constraint").isNotNull())
            .select("shape_idx", "focus",
                    F.col("v.constraint").alias("constraint"),
                    F.col("v.actual").alias("actual")))


# precedence for schema-skeleton datatype inference: first type whose
# pattern every non-null cell matches wins. integer before boolean on
# purpose (an all-0/1 column reads as counts, not flags; a true/false
# column fails the numeric patterns and lands on boolean), date before
# dateTime (a pure date column fails the dateTime pattern and vice
# versa, so order only breaks the never-matching-both tie), anyURI
# last of the specifics (its scheme-prefix pattern is the loosest).
INFER_PRECEDENCE: tuple[str, ...] = (
    XSD + "integer", XSD + "decimal", XSD + "double", XSD + "boolean",
    XSD + "date", XSD + "dateTime", XSD + "anyURI",
)


def infer_datatypes(
    df: DataFrame,
    columns: list[str] | None = None,
    null_values: tuple[str, ...] = ("",),
) -> DataFrame:
    """Schema-skeleton datatype inference: per column, the most
    specific XSD datatype every non-null cell matches — the upgrade to
    the reference's skeleton builder, which hard-codes ``"datatype":
    "string"`` for every column (csvw.py:140) and leaves the user to
    hand-edit types in. Patterns are :data:`DATATYPE_PATTERNS` (shared
    with :func:`validate_typed_literals`, so what inference claims,
    validation accepts), precedence :data:`INFER_PRECEDENCE`; a column
    with zero non-null cells (or matching nothing) stays xsd:string.

    ``null_values``: sentinel strings treated as null alongside real
    NULLs (the reference's parseOnEmpty/null-list semantics).

    Returns one row per column: ``(column, n_rows, n_null,
    datatype)``. Scale shape: ONE aggregate pass — per column a count
    + null count + one all-match flag per candidate type (min over a
    regexp boolean), no explode, no per-column jobs, no Python; the
    unpivot happens on the 1-row aggregate.
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("infer_datatypes: no columns to profile")
    aggs, total = [], F.count(F.lit(1)).alias("__n")
    for c in cols:
        v = F.col(c).cast("string")
        isnull = v.isNull() | v.isin(*null_values)
        aggs.append(F.sum(F.when(isnull, 1).otherwise(0))
                    .cast("bigint").alias(f"__null_{c}"))
        for i, dt in enumerate(INFER_PRECEDENCE):
            pat = DATATYPE_PATTERNS[dt]
            ok = F.when(isnull, True).otherwise(v.rlike(pat))
            aggs.append(F.min(ok).alias(f"__ok_{i}_{c}"))
    one = df.agg(total, *aggs)
    per_col = []
    for c in cols:
        dt = F.lit(XSD + "string")
        for i in range(len(INFER_PRECEDENCE) - 1, -1, -1):
            nonempty = F.col("__n") > F.col(f"__null_{c}")
            dt = F.when(F.col(f"__ok_{i}_{c}") & nonempty,
                        F.lit(INFER_PRECEDENCE[i])).otherwise(dt)
        per_col.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            dt.alias("datatype")))
    return (one.select(F.explode(F.array(*per_col)).alias("r"))
            .select("r.*"))


def infer_datatypes_oracle_sql(
    table_cte: str,
    columns: list[str],
    null_values: tuple[str, ...] = ("",),
) -> str:
    """DuckDB twin of :func:`infer_datatypes` — same patterns (RE2 vs
    Java divergence avoided by the explicit-class discipline), same
    precedence, one aggregate + a VALUES unpivot."""
    nv = ", ".join("'" + s.replace("'", "''") + "'" for s in null_values)
    aggs = ["count(*) as __n"]
    sel = []
    for c in columns:
        v = f"cast({c} as varchar)"
        isnull = f"({v} is null or {v} in ({nv}))"
        aggs.append(f"sum(case when {isnull} then 1 else 0 end)"
                    f" as __null_{c}")
        for i, dt in enumerate(INFER_PRECEDENCE):
            pat = DATATYPE_PATTERNS[dt].replace("'", "''")
            aggs.append(
                f"min(case when {isnull} then true else "
                f"regexp_matches({v}, '{pat}') end) as __ok_{i}_{c}")
        branches = " ".join(
            f"when __ok_{i}_{c} and __n > __null_{c}"
            f" then '{INFER_PRECEDENCE[i]}'"
            for i in range(len(INFER_PRECEDENCE)))
        sel.append(
            f"select '{c}' as column, cast(__n as bigint) as n_rows,"
            f" cast(__null_{c} as bigint) as n_null,"
            f" case {branches} else '{XSD}string' end as datatype"
            f" from one")
    unpivot = "\nunion all\n".join(sel)
    return f"""
with t as ({table_cte}),
one as (select {', '.join(aggs)} from t)
{unpivot}
"""


def inclusion_deps(
    tables: dict[str, DataFrame],
    pairs: list[tuple[str, str, str, str]],
) -> DataFrame:
    """Instance-based inclusion-dependency check — the FK-discovery
    pass of schema profiling (Bellman's "does column A ⊆ column B",
    De Marchi 2002): the reference's CSVW vocabulary carries
    ``foreignKeys`` but its converter never reads them (csvw.py has no
    FK handling); here candidate key relationships are VERIFIED
    against the data before a mapping spec or a join plan relies on
    them.

    ``pairs`` is a bounded list of (left_table, left_col, right_table,
    right_col). One row each: ``(lhs, rhs, n_left, n_contained,
    containment_ppm, exact)`` over DISTINCT non-NULL values (SQL FK
    semantics ignore NULLs); ``exact`` ⇔ every left value appears on
    the right. ``containment_ppm`` is the floor-scaled share — the
    dirty-data tolerance knob (a 999 993 ppm containment is a real FK
    with six orphan rows, and the profile says exactly that).

    Scale shape: per pair, two column-pruned distinct aggregations and
    one left-semi-shaped join on the distinct values (value-domain
    sized, not row sized); the pair list is schema-bounded, so the
    union of per-pair plans is as wide as the schema, never the data.
    """
    if not pairs:
        raise ValueError("inclusion_deps: pairs must be non-empty")
    outs = []
    for lt, lc, rt, rc in pairs:
        if lt not in tables or rt not in tables:
            raise KeyError(f"inclusion_deps: unknown table in "
                           f"({lt!r}, {rt!r})")
        lv = (tables[lt].select(F.col(lc).alias("v"))
              .where(F.col("v").isNotNull()).distinct())
        rv = (tables[rt].select(F.col(rc).alias("v"))
              .where(F.col("v").isNotNull()).distinct())
        hit = lv.join(rv, "v", "left_semi")
        n_l = lv.agg(F.count("*").alias("n_left"))
        n_c = hit.agg(F.count("*").alias("n_contained"))
        x = F.col("n_contained") * F.lit(1_000_000)
        outs.append(
            n_l.crossJoin(n_c).select(
                F.lit(f"{lt}.{lc}").alias("lhs"),
                F.lit(f"{rt}.{rc}").alias("rhs"),
                F.col("n_left").cast("long").alias("n_left"),
                F.col("n_contained").cast("long").alias("n_contained"),
                F.when(F.col("n_left") > 0,
                       ((x - F.pmod(x, F.col("n_left")))
                        / F.col("n_left")).cast("long"))
                .alias("containment_ppm"),
                (F.col("n_contained") == F.col("n_left")).alias("exact")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def functional_deps(
    df: DataFrame,
    pairs: list[tuple],
) -> DataFrame:
    """Instance-based functional-dependency check — the intra-table
    half of schema discovery next to :func:`inclusion_deps`' cross-
    table one (TANE / Huhtala 1999 verified on candidate pairs, not
    searched): does ``det → dep`` hold, i.e. does every determinant
    value map to exactly one dependent value? The reference's CSVW
    vocabulary carries ``primaryKey`` but its converter never verifies
    it (csvw.py trusts the spec); here key and derived-column claims
    are VERIFIED against the data before a mapping or a dedup key
    relies on them.

    ``pairs`` is a bounded list of ``(det, dep)`` where ``det`` is a
    column name or a tuple of column names (composite determinants are
    the common real case — a PK claim is just an FD from the key
    tuple). One row each: ``(lhs, rhs, n_groups, n_violating,
    compliance_ppm, exact)`` — ``n_violating`` counts determinant
    groups seeing ≥ 2 distinct dependent values, ``compliance_ppm``
    the floor-scaled share of clean groups (the dirty-data tolerance
    knob: 999 990 ppm is a real FD with one contradicting group, and
    the profile says exactly that). NULL determinant values form their
    own group (groupBy semantics — a NULL key is itself a key claim);
    a NULL dependent counts as one distinct value alongside non-NULLs,
    so {NULL, 'x'} violates — countDistinct alone would hide it.

    Scale shape: per pair ONE column-pruned corpus groupBy on the
    determinant tuple (count-distinct partial-aggregated map-side),
    reduced straight to a single row; the pair list is schema-bounded,
    so the plan union is as wide as the schema, never the data.
    """
    if not pairs:
        raise ValueError("functional_deps: pairs must be non-empty")
    outs = []
    for det, dep in pairs:
        det_cols = [det] if isinstance(det, str) else list(det)
        for c in det_cols + [dep]:
            if c not in df.columns:
                raise KeyError(f"functional_deps: unknown column {c!r}")
        nd = (F.countDistinct(dep)
              + F.max(F.when(F.col(dep).isNull(), 1).otherwise(0)))
        g = (df.select(*det_cols, dep)
             .groupBy(*det_cols)
             .agg(nd.alias("_nd")))
        # coalesce: an empty table has 0 groups and the SUM over no
        # rows is NULL — the profile row should say 0/0 exact, not NULL
        viol = F.coalesce(F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)),
                          F.lit(0))
        agg = g.agg(F.count("*").alias("n_groups"),
                    viol.alias("n_violating"))
        clean = (F.col("n_groups") - F.col("n_violating")) \
            * F.lit(1_000_000)
        outs.append(agg.select(
            F.lit(",".join(det_cols)).alias("lhs"),
            F.lit(dep).alias("rhs"),
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("n_violating").cast("long").alias("n_violating"),
            F.when(F.col("n_groups") > 0,
                   ((clean - F.pmod(clean, F.col("n_groups")))
                    / F.col("n_groups")).cast("long"))
            .alias("compliance_ppm"),
            (F.col("n_violating") == 0).alias("exact")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


_PAIR_OPS = ("equals", "disjoint", "less_than")


def shape_pairs(
    quads: DataFrame,
    constraints: list[tuple],
) -> DataFrame:
    """SHACL property-PAIR constraints — the half of the shapes stack
    :func:`shape_report` (per-property cardinality/kind) doesn't
    cover: ``sh:equals`` / ``sh:disjoint`` / ``sh:lessThan`` relate
    TWO predicates on the same focus node (checkout must equal
    checkin+fee, an alias must never equal the canonical name, a
    start must precede an end). Each constraint is ``(op, p1, p2)``
    with op in ``equals | disjoint | less_than``.

    Semantics on the VALUE SETS per focus subject (the SHACL reading):
    ``equals`` — the two predicates' object-value sets must be equal
    (violation rows name values present on one side only);
    ``disjoint`` — no shared value (violations name each shared one);
    ``less_than`` — every p1 value must sort strictly below every p2
    value (violations name each (v1 ≥ min v2) offender, lexical
    ordering — cast upstream if numeric order is meant). One row per
    violating (constraint, focus, value): ``(constraint_idx, op,
    focus, value)``; empty = pass.

    Plan shape: ONE scan filtered to the constrained predicates (the
    filter reaches the scan; the constraint list is schema-bounded),
    self-joined per focus on the two predicate roles — both sides
    pre-aggregated to DISTINCT (focus, value) so the join is value-set
    sized; less_than joins against the 1-row-per-focus min(p2). No
    corpus×corpus pair table.
    """
    if not constraints:
        raise ValueError("shape_pairs: empty constraint list")
    for i, (op, _p1, _p2) in enumerate(constraints):
        if op not in _PAIR_OPS:
            raise ValueError(f"constraint {i}: unknown op {op!r}")
    outs = []
    base = quads.select("s", "p", F.col("o_lex").alias("v"))
    for i, (op, p1, p2) in enumerate(constraints):
        a = (base.where(F.col("p") == p1)
             .select("s", "v").distinct())
        b = (base.where(F.col("p") == p2)
             .select("s", "v").distinct())
        if op == "equals":
            only_a = a.join(b, ["s", "v"], "left_anti")
            only_b = b.join(a, ["s", "v"], "left_anti")
            bad = only_a.unionByName(only_b).distinct()
        elif op == "disjoint":
            bad = a.join(b, ["s", "v"], "left_semi")
        else:  # less_than: v1 must be < EVERY v2 == < min(v2)
            m = b.groupBy("s").agg(F.min("v").alias("_min2"))
            bad = (a.join(m, "s")
                   .where(F.col("v") >= F.col("_min2"))
                   .select("s", "v"))
        outs.append(bad.select(
            F.lit(i).cast("int").alias("constraint_idx"),
            F.lit(op).alias("op"),
            F.col("s").alias("focus"),
            F.col("v").alias("value")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def fd_repair(
    df: DataFrame,
    det: str,
    dep: str,
) -> DataFrame:
    """Majority-vote repair of a violated functional dependency — the
    acting half of :func:`functional_deps` (which only reports): when
    ``det → dep`` SHOULD hold (a code table, a canonical name, a
    unit), minority and NULL dependent values inside each determinant
    group are replaced by the group's majority value (HoloClean's
    simplest signal, deterministic: ties break to the SMALLEST value,
    groups whose dependents are all NULL stay NULL).

    Returns the full input row set with ``dep`` repaired plus
    ``(<dep>_orig, repaired)`` for audit — a repair that hides what it
    changed is corruption with extra steps.

    Plan shape: one (det, dep) count aggregate (domain-bounded), ONE
    lexicographic struct max per determinant picks (count, value)
    majority — the same engine-identical tie rule as join_estimate —
    then one broadcast-sized join back on the determinant (the
    majority table is determinant-domain sized, NOT corpus sized).
    """
    counts = (df.where(F.col(dep).isNotNull())
              .groupBy(det, dep).agg(F.count("*").alias("_c")))
    # max over (count, REVERSED value) == smallest value among ties;
    # strings can't negate, so order by (count asc → use max on count,
    # tie on value) needs min_by semantics: take max count, then min
    # value among rows at max count — two bounded aggregates
    per_det = counts.groupBy(det).agg(F.max("_c").alias("_cmax"))
    majority = (counts.join(per_det, det)
                .where(F.col("_c") == F.col("_cmax"))
                .groupBy(det)
                .agg(F.min(dep).alias("_maj")))
    out = df.join(F.broadcast(majority), det, "left")
    fixed = F.coalesce(F.col("_maj"), F.col(dep))
    return (out
            .withColumn(f"{dep}_orig", F.col(dep))
            .withColumn("repaired",
                        ~(F.col(dep).eqNullSafe(fixed)))
            .withColumn(dep, fixed)
            .drop("_maj"))


def key_discovery(
    df: DataFrame,
    candidates: list[tuple[str, ...]],
) -> DataFrame:
    """Candidate-key profile — the uniqueness side of the dependency
    audit (:func:`functional_deps` finds what columns DETERMINE,
    :func:`inclusion_deps` what they REFERENCE; this finds what
    IDENTIFIES): for each candidate column set, exact distinct count,
    duplicate mass, NULL-bearing rows, and the verdict. SQL keys
    cannot contain NULLs, so ``is_key`` requires zero null rows AND
    full uniqueness — a (unique-but-nullable) set reports
    ``is_unique`` true, ``is_key`` false, which is exactly the
    distinction a migration to a keyed store needs.

    One aggregate holds all candidates' exact distincts (one Expand,
    |candidates|+1 shuffled copies — candidates is a short list by
    contract); tuple values hash through the NULL-sentinel concat
    (concat_ws silently drops NULLs — the iri.py discipline — so
    (NULL,'x') and ('x',NULL) stay distinct tuples).

    Returns ``(candidate, n_rows, n_distinct, n_dup_rows, n_null_rows,
    is_unique, is_key)`` sorted by nothing (callers order).
    """
    from ..functions.iri import NULL_SENTINEL

    if not candidates:
        raise ValueError("key_discovery: empty candidate list")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for i, cols in enumerate(candidates):
        if not cols:
            raise ValueError("key_discovery: empty column tuple")
        tup = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"),
                                 F.lit(NULL_SENTINEL)) for c in cols])
        has_null = None
        for c in cols:
            cond = F.col(c).isNull()
            has_null = cond if has_null is None else (has_null | cond)
        aggs.append(F.countDistinct(tup).cast("long").alias(f"_d{i}"))
        aggs.append(F.sum(has_null.cast("long")).cast("long")
                    .alias(f"_n{i}"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(",".join(cols)).alias("candidate"),
                 F.col(f"_d{i}").alias("n_distinct"),
                 F.col(f"_n{i}").alias("n_null_rows"))
        for i, cols in enumerate(candidates)])
    ex = one.select("n_rows", F.explode(rows).alias("x")).select(
        "x.candidate", "n_rows", "x.n_distinct", "x.n_null_rows")
    return ex.select(
        "candidate", "n_rows", "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
        "n_null_rows",
        (F.col("n_distinct") == F.col("n_rows")).alias("is_unique"),
        ((F.col("n_distinct") == F.col("n_rows"))
         & (F.col("n_null_rows") == 0)).alias("is_key"))


def key_discovery_oracle_sql(
    table_sql: str,
    candidates: list[tuple[str, ...]],
) -> str:
    """DuckDB twin of :func:`key_discovery`; one union branch per
    candidate (the oracle optimizes for clarity, not scans). The NULL
    sentinel is assembled with chr(0) — embedding a literal NUL in a
    SQL string kills the DuckDB parser mid-statement (CLAUDE.md)."""
    sentinel = "chr(0) || 'null' || chr(0)"
    parts = []
    for cols in candidates:
        tup = ", ".join(
            f"coalesce(cast({c} as varchar), {sentinel})"
            for c in cols)
        nul = " or ".join(f"{c} is null" for c in cols)
        parts.append(f"""
select '{",".join(cols)}' as candidate,
       cast(count(*) as bigint) as n_rows,
       cast(count(distinct concat_ws(chr(31), {tup})) as bigint)
         as n_distinct,
       cast(count(*) - count(distinct concat_ws(chr(31), {tup}))
            as bigint) as n_dup_rows,
       cast(sum(case when {nul} then 1 else 0 end) as bigint)
         as n_null_rows
from ({table_sql})""")
    u = " union all ".join(parts)
    return f"""
select candidate, n_rows, n_distinct, n_dup_rows, n_null_rows,
       n_distinct = n_rows as is_unique,
       n_distinct = n_rows and n_null_rows = 0 as is_key
from ({u})
"""


def schema_diff(df_a: DataFrame, df_b: DataFrame) -> DataFrame:
    """Column-level drift report between two snapshots of "the same"
    table — the data-contract check a pipeline runs before swapping in
    a new crawl/export: which columns appeared, vanished, changed
    type, or went newly-NULL. infer_datatypes reads one table's cells;
    this compares two tables' shapes.

    Per column (union of both schemas, sorted): presence status
    (``both`` / ``a_only`` / ``b_only``), the engine type on each
    side, ``type_changed``, and the exact NULL rate
    ``(nulls·10^6) div n`` per side (NULL for an absent side; 0 on an
    empty table). A type change OR an absent side OR a null-rate jump
    is the alert condition — the caller picks thresholds.

    Scale shape: types come from the schema objects (free); null
    counts are ONE single-pass aggregate per side (every column's
    ``sum(isnull)`` rides the same scan — no per-column jobs),
    collected as one row each (bounded by column count). The report
    itself is column-count-sized. Returns (column, status, type_a,
    type_b, type_changed, null_ppm_a, null_ppm_b).
    """
    def _side(df):
        types = {f.name: f.dataType.simpleString()
                 for f in df.schema.fields}
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_z_{i}")
            for i, c in enumerate(types)]
        row = df.agg(*aggs).collect()[0]
        n = row["_n"]
        nulls = {c: (row[f"_z_{i}"] or 0)
                 for i, c in enumerate(types)}
        return types, n, nulls

    ta, na, za = _side(df_a)
    tb, nb, zb = _side(df_b)
    rows = []
    for c in sorted(set(ta) | set(tb)):
        in_a, in_b = c in ta, c in tb
        status = "both" if in_a and in_b else (
            "a_only" if in_a else "b_only")
        ppm_a = ((za[c] * 1_000_000) // na if in_a and na > 0
                 else (0 if in_a else None))
        ppm_b = ((zb[c] * 1_000_000) // nb if in_b and nb > 0
                 else (0 if in_b else None))
        rows.append((c, status, ta.get(c), tb.get(c),
                     in_a and in_b and ta[c] != tb[c], ppm_a, ppm_b))
    return df_a.sparkSession.createDataFrame(
        rows, "column string, status string, type_a string, "
              "type_b string, type_changed boolean, "
              "null_ppm_a long, null_ppm_b long")
