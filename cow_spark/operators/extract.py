"""Triple extraction: compiled mapping rules → quads DataFrame.

The reference's convert loop is row-at-a-time Python: for each row, for
each column spec, expand templates → emit (s, p, o) into an rdflib graph
(src/converter/csvw.py:488-604). Here the whole mapping compiles **once on
the driver** to Column expressions; execution is a single scan:

    scan → [per-rule term expressions] → explode(array(rule structs))
         → filter(valid) → dropDuplicates → quads

Design notes for 100 TB:
- one pass over the input: all rules are evaluated inside one projection,
  so Catalyst prunes the scan to exactly the referenced columns and the
  whole expression forest stays in whole-stage codegen (except templates
  that genuinely need Jinja — those run as Arrow-batched pandas UDFs).
- the only shuffle is the optional global dedup (COW dedups per chunk via
  rdflib set semantics, csvw.py:460-462; global `distinct` is a superset
  of that — it can only *remove* duplicate triples, which is safe for
  precision/recall — and is the engine default; `dedup='none'` keeps the
  raw stream for sinks that dedup on write, e.g. an Iceberg MERGE).
- every distinct template is materialized once per row in a staging
  projection (see _ExprCache) — shared across all rules instead of
  re-inlined per rule.
- null/skip semantics (csvw.py:916-930, 476-487, 520-533) compile to
  boolean conditions; a failed template render or invalid IRI yields NULL
  and the triple is filtered, mirroring COW's per-column exception
  containment (csvw.py:544-552) without ever failing a task.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.iri import iri_encode, is_valid_iri
from ..model import (
    PROV,
    RDF,
    SKOS,
    XSD_ANYURI,
    XSD_LINKURI,
    XSD_STRING,
    QUAD_COLS,
)
from ..spec.mapping import ColumnSpec, MappingSpec
from ..spec.templates import compile_template, stringify


@dataclass
class Emission:
    """One (s, p, o) triple pattern guarded by an emit condition."""

    cond: Column
    s: Column
    p: Column
    o_kind: Column
    o_lex: Column
    o_dt: Column
    o_lang: Column

    def struct(self) -> Column:
        body = F.struct(
            self.s.alias("s"),
            self.p.alias("p"),
            self.o_kind.alias("o_kind"),
            self.o_lex.alias("o_lex"),
            self.o_dt.alias("o_dt"),
            self.o_lang.alias("o_lang"),
        )
        return F.when(self.cond, body)


class _ExprCache:
    """Template → computed-once intermediate column.

    Every distinct template (subject/predicate/value URL, literal value,
    lang) is materialized once per row in a staging projection and
    referenced by name from all rule structs. Without this the full
    expression tree (13-deep replace chain + RLIKE, or a pandas UDF) is
    inlined verbatim into every rule of the explode array — at 8+ rules
    the generated method overflows janino's 64KB limit and the whole
    stage silently falls back to interpreted evaluation.
    """

    def __init__(self, row: dict[str, Column]):
        self.row = row
        # two projection layers: layer 1 may reference layer-0 aliases
        self.layers: list[dict[str, Column]] = [{}, {}]
        self._by_key: dict[tuple, str] = {}
        self._n = 0

    def _add(self, key: tuple, col: Column, layer: int = 0) -> str:
        name = self._by_key.get(key)
        if name is None:
            name = f"_t{self._n}"
            self._n += 1
            self._by_key[key] = name
            self.layers[layer][name] = col
        return name

    def url(self, template: str) -> Column:
        """≅ expandURL (csvw.py:897-914): render + iribaker-encode +
        validate, with raise-on-invalid replaced by NULL-and-filter."""
        ename = self._add(
            ("enc", template),
            iri_encode(compile_template(template).column(self.row)),
        )
        vname = self._add(
            ("valid", template), is_valid_iri(F.col(ename)), layer=1
        )
        return F.when(F.col(vname), F.col(ename))

    def value(self, template: str) -> Column:
        name = self._add(
            ("val", template), compile_template(template).column(self.row)
        )
        return F.col(name)

    def staged(self, df: DataFrame) -> DataFrame:
        for layer in self.layers:
            if layer:
                df = df.select("*", *[c.alias(n) for n, c in layer.items()])
        return df


def _first_brace_fragment(template: str) -> str:
    """COW's _extract_between_braces (csvw.py:624-625): value[find('{'):find('}')+1]."""
    return template[template.find("{") : template.find("}") + 1]


_S = lambda: F.lit(None).cast("string")  # noqa: E731


def compile_rules(
    spec: MappingSpec, df: DataFrame
) -> tuple[list[Emission], _ExprCache]:
    """Compile the mapping spec against the input schema → emissions +
    the shared-expression staging cache."""
    # Canonical stringified row view: every template / null check sees the
    # same strings the CSV reference would (SQL NULL ≡ '').
    row: dict[str, Column] = {
        f.name: stringify(df[f.name], f.dataType) for f in df.schema.fields
    }
    input_cols = set(df.columns)
    cache = _ExprCache(row)

    # fail fast when the default subject can never render: a format-stage
    # field ({x} / fmtint) missing from the input NULLs the subject for
    # EVERY row → silently empty output (the '{_row}' skeleton default on
    # a table without _row is the classic case — see
    # csv_source.with_row_index)
    subject_tpl = compile_template(spec.about_url)
    hard_missing = [
        name for kind, name, *_ in
        (subject_tpl.parts if subject_tpl.kind == "static" else ())
        if kind in ("ref", "fmtint") and name not in row
    ]
    if hard_missing:
        from ..spec.mapping import SpecError

        raise SpecError(
            f"default subject template {spec.about_url!r} references "
            f"column(s) {hard_missing} absent from the input; add them "
            "or (for '_row') apply csv_source.with_row_index first"
        )

    sdv = spec.namespaces["sdv"]
    default_subject = cache.url(spec.about_url)

    emissions: list[Emission] = []
    for cs in spec.columns:
        emissions.extend(
            _compile_column(cs, spec, row, input_cols, default_subject, sdv,
                            cache)
        )
    return emissions, cache


def _null_skip_condition(
    cs: ColumnSpec, spec: MappingSpec, row: dict[str, Column], input_cols: set[str]
) -> Column:
    """True when the rule should emit (cell not null/empty/cross-null).

    isValueNull (csvw.py:916-930): empty + parseOnEmpty → keep; empty or
    value in column nulls or value == schema null → skip.
    Cross-column form (csvw.py:476-487,523-533): skip when any referenced
    other column equals its null value — applies to virtual columns too
    (the KeyError path at csvw.py:528-533).
    """
    cond = F.lit(True)
    if cs.name in input_cols:
        val = row[cs.name]
        nulls = list(cs.nulls) + list(spec.schema_nulls)
        empty = F.length(val) == 0
        keep_nonempty = ~val.isin(nulls) if nulls else F.lit(True)
        cond = F.when(empty, F.lit(cs.parse_on_empty)).otherwise(keep_nonempty)
    if cs.null_on:
        cross = reduce(
            or_,
            [
                (row[name] == F.lit(nv)) if name in row else F.lit(False)
                for name, nv in cs.null_on
            ],
        )
        cond = cond & ~cross
    return cond


def _value_null_check(
    value: Column, cs: ColumnSpec, spec: MappingSpec
) -> Column:
    """isValueNull applied to an arbitrary string (used for the valueUrl
    basename suppression, csvw.py:577-581)."""
    nulls = list(cs.nulls) + list(spec.schema_nulls)
    empty = F.length(value) == 0
    in_nulls = value.isin(nulls) if nulls else F.lit(False)
    return F.when(empty, F.lit(not cs.parse_on_empty)).otherwise(in_nulls)


def _compile_column(
    cs: ColumnSpec,
    spec: MappingSpec,
    row: dict[str, Column],
    input_cols: set[str],
    default_subject: Column,
    sdv: str,
    cache: _ExprCache,
) -> list[Emission]:
    cond = _null_skip_condition(cs, spec, row, input_cols)

    # subject (csvw.py:569-572)
    s = cache.url(cs.about_url) if cs.about_url else default_subject

    # predicate (csvw.py:871-894; the default-ns branch at :885-887 is dead
    # — namespaces() yields tuples — so the sdv fallback always fires)
    p_template = cs.property_url if cs.property_url else sdv + (cs.name or "")
    p = cache.url(p_template)

    out: list[Emission] = []

    if cs.value_url is not None:
        o = cache.url(cs.value_url)
        # suppression: if basename(object IRI) is null-valued, drop the
        # triple (COW: return o=None then g.add throws → caught → skipped,
        # csvw.py:577-581,544-552 — we reproduce the *observable* skip)
        basename = F.regexp_extract(o, "([^/]*)$", 1)
        cond = cond & ~_value_null_check(basename, cs, spec)

        if cs.virtual and cs.datatype == XSD_ANYURI:
            # virtual anyURI override (csvw.py:583-586): o = IRI(raw cell).
            # A virtual column has no cell → KeyError → skipped in COW.
            if cs.name in input_cols:
                o = cache.url("{" + cs.name + "}")
            else:
                return []
        if cs.virtual and cs.datatype == XSD_LINKURI and cs.about_url:
            # linkURI (csvw.py:588-592): s and o re-derived from the first
            # {...} fragment of aboutUrl/valueUrl
            s = cache.url(_first_brace_fragment(cs.about_url))
            o = cache.url(_first_brace_fragment(cs.value_url))

        cond = cond & o.isNotNull()

        # a failed collection/scheme render aborts the WHOLE column for
        # that row in COW (expandURL raises → per-column catch at
        # csvw.py:544-552 skips main triple too) — fold their validity
        # into the shared condition before emitting anything
        coll = cache.url(cs.collection_url) if cs.collection_url else None
        scheme = cache.url(cs.scheme_url) if cs.scheme_url else None
        if coll is not None:
            cond = cond & coll.isNotNull()
        if scheme is not None:
            cond = cond & scheme.isNotNull()

        out.append(Emission(cond, s, p, F.lit("iri"), o, _S(), _S()))

        rdf_type = F.lit(RDF + "type")
        if coll is not None:
            # SKOS collection (csvw.py:627-631)
            out.append(Emission(cond, coll, rdf_type, F.lit("iri"),
                                F.lit(SKOS + "Collection"), _S(), _S()))
            out.append(Emission(cond, o, rdf_type, F.lit("iri"),
                                F.lit(SKOS + "Concept"), _S(), _S()))
            out.append(Emission(cond, coll, F.lit(SKOS + "member"),
                                F.lit("iri"), o, _S(), _S()))
        if scheme is not None:
            # SKOS scheme (csvw.py:633-637)
            out.append(Emission(cond, scheme, rdf_type, F.lit("iri"),
                                F.lit(SKOS + "Scheme"), _S(), _S()))
            out.append(Emission(cond, o, rdf_type, F.lit("iri"),
                                F.lit(SKOS + "Concept"), _S(), _S()))
            out.append(Emission(cond, o, F.lit(SKOS + "inScheme"),
                                F.lit("iri"), scheme, _S(), _S()))
    else:
        # literal branch (csvw.py:600-622)
        if cs.value is not None:
            value = cache.value(cs.value)
        elif cs.name in input_cols:
            value = row[cs.name]
        else:
            # no value template and no backing cell → COW raises per row →
            # triple skipped (csvw.py:606-612)
            return []
        cond = cond & value.isNotNull()

        if cs.datatype == XSD_ANYURI:
            o = cache.url(cs.value if cs.value is not None else "{" + (cs.name or "") + "}")
            out.append(Emission(cond & o.isNotNull(), s, p,
                                F.lit("iri"), o, _S(), _S()))
        elif cs.datatype == XSD_STRING and cs.lang is not None:
            # a failed lang-template render skips the triple in COW
            # (render raises inside _process_column → per-column catch);
            # emitting a plain literal instead would diverge from the oracle
            lang = cache.value(cs.lang)
            out.append(Emission(cond & lang.isNotNull(), s, p,
                                F.lit("lit"), value, _S(), lang))
        elif cs.datatype is not None:
            out.append(Emission(cond, s, p, F.lit("lit"), value,
                                F.lit(cs.datatype), _S()))
        else:
            out.append(Emission(cond, s, p, F.lit("lit"), value, _S(), _S()))

    # column-provenance triple (csvw.py:548-549): (p, prov:wasDerivedFrom,
    # column @id) alongside every emitted triple; constant rows collapse in
    # the map-side partial dedup so the per-row emission is effectively free
    if cs.id and out:
        out.append(
            Emission(out[0].cond, p, F.lit(PROV + "wasDerivedFrom"),
                     F.lit("iri"), F.lit(cs.id), _S(), _S())
        )
    return out


def extract_quads(
    df: DataFrame,
    spec: MappingSpec,
    graph: str | None = None,
    dedup: str = "global",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Run the compiled mapping over ``df`` → quads DataFrame.

    ``graph``: constant assertion-graph IRI (all chunks of a COW run share
    one assertion graph, csvw.py:460-462). ``dedup``: 'global' (engine
    default, superset of reference semantics) | 'partition' (exact COW
    per-chunk parity, no shuffle) | 'none'.
    ``passthrough``: input columns carried onto every emitted quad
    (lineage/bucket keys for checkpoint-resume, E6).
    """
    pt = passthrough or []
    emissions, cache = compile_rules(spec, df)
    if not emissions:
        # empty result keeps the full contract schema incl. passthrough
        from pyspark.sql.types import StringType, StructField, StructType

        fields = [StructField(c, StringType()) for c in QUAD_COLS]
        fields += [df.schema[c] for c in pt]
        return df.sparkSession.createDataFrame([], StructType(fields))

    arr = F.array(*[e.struct() for e in emissions])
    q = (
        cache.staged(df).select(*pt, F.explode(arr).alias("q"))
        .where(F.col("q").isNotNull())
        .select(*pt, "q.*")
        .where(F.col("s").isNotNull() & F.col("p").isNotNull()
               & F.col("o_lex").isNotNull())
        .withColumn("g", F.lit(graph).cast("string"))
        .select(*QUAD_COLS, *pt)
    )
    if dedup == "global":
        q = q.dropDuplicates(QUAD_COLS + pt)
    elif dedup == "none":
        pass
    elif dedup == "partition":
        # COW-parity mode: set semantics WITHIN each task partition only
        # (each reference chunk dedups via its own rdflib Graph,
        # csvw.py:460-462; duplicates across chunks survive). No shuffle —
        # an Arrow-batched per-partition hash set whose memory tracks the
        # partition's distinct quads, exactly like COW's per-chunk graph.
        q = _dedup_within_partitions(q)
    else:
        raise ValueError(
            f"unknown dedup mode {dedup!r}: use 'global' (engine "
            "default), 'partition' (COW per-chunk parity), or 'none'")
    return q


def _dedup_within_partitions(q: DataFrame) -> DataFrame:
    import pandas as pd  # noqa: F401 (executor-side)

    schema = q.schema

    def _key(v):
        # hashable + NaN-stable keys for arbitrary passthrough columns
        # (numpy arrays are unhashable; NaN != NaN would never dedup)
        if hasattr(v, "tolist"):
            v = v.tolist()
        if isinstance(v, (list, tuple)):
            return tuple(_key(x) for x in v)
        if isinstance(v, float) and v != v:
            return "\x00nan"
        return v

    def drop_seen(batches):
        seen: set = set()
        for b in batches:
            mask = []
            for tup in b.itertuples(index=False, name=None):
                k = tuple(_key(x) for x in tup)
                if k in seen:
                    mask.append(False)
                else:
                    seen.add(k)
                    mask.append(True)
            yield b[mask]

    return q.mapInPandas(drop_seen, schema=schema)
