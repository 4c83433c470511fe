"""Pure-Python reference-semantics oracle.

Follows the reference converter's emission semantics *literally*
(src/converter/csvw.py:488-637 — row loop, null checks, template
expansion, IRI minting, literal construction, SKOS handling, per-column
exception containment) so golden triple sets can be produced without the
reference's dependencies (rdflib/iribaker are not installable in this
sandbox; jinja2 — the same engine COW uses — is available).

The engine's Spark output is tested set-wise against this oracle
(P/R ≥ 0.95 target, graph names excluded: they embed a run timestamp +
file hash in the reference, util/__init__.py:174-208).

This module is deliberately row-at-a-time and small-scale only.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from .functions.iri import iri_encode_py, is_valid_iri_py
from .model import (
    PROV,
    RDF,
    SKOS,
    XSD_ANYURI,
    XSD_LINKURI,
    XSD_STRING,
    object_term_py,
)
from .spec.mapping import ColumnSpec, MappingSpec
from .spec.templates import render_template_py, stringify_py

Triple = tuple[str, str, str]  # (s IRI, p IRI, o as N-Triples term)


class _Skip(Exception):
    """Column-level skip ≅ COW's caught per-column exception (csvw.py:551)."""


def _expand_url(template: str, row: Mapping[str, object]) -> str:
    rendered = render_template_py(template, row)
    if rendered is None:
        raise _Skip(f"template failed: {template!r}")
    iri = iri_encode_py(rendered)
    if not is_valid_iri_py(iri):
        raise _Skip(f"invalid IRI: {iri!r}")
    return iri


def _is_value_null(value: str, cs: ColumnSpec, spec: MappingSpec) -> bool:
    # csvw.py:916-930
    if len(value) == 0 and cs.parse_on_empty:
        return False
    if len(value) == 0 or value in cs.nulls or value in spec.schema_nulls:
        return True
    return False


def _first_brace_fragment(template: str) -> str:
    return template[template.find("{") : template.find("}") + 1]


def convert_rows(
    raw_rows: Iterable[Mapping[str, object]],
    spec: MappingSpec,
    with_row_index: bool = False,
) -> set[Triple]:
    """Convert rows → set of (s, p, o-term) triples, COW semantics."""
    sdv = spec.namespaces["sdv"]
    triples: set[Triple] = set()

    for idx, raw in enumerate(raw_rows):
        row: dict[str, object] = {k: stringify_py(v) for k, v in raw.items()}
        if with_row_index:
            row["_row"] = idx  # int, as COW injects it (csvw.py:507)

        try:
            default_subject = _expand_url(spec.about_url, row)
        except _Skip:
            # COW would abort the whole chunk here (raise outside the
            # per-column try, csvw.py:511); we skip the row — documented
            # deviation, never exercised by fixtures
            continue

        for cs in spec.columns:
            try:
                triples.update(
                    _process_column(cs, spec, row, default_subject, sdv)
                )
            except _Skip:
                continue
    return triples


def _process_column(
    cs: ColumnSpec,
    spec: MappingSpec,
    row: dict[str, object],
    default_subject: str,
    sdv: str,
) -> list[Triple]:
    # null checks (csvw.py:520-533): cell nulls for real columns, the
    # cross-column form also on the KeyError/virtual path
    if cs.name in row:
        if _is_value_null(str(row[cs.name]), cs, spec):
            return []
    if cs.null_on and any(
        str(row.get(name)) == nv for name, nv in cs.null_on if name in row
    ):
        return []

    s = _expand_url(cs.about_url, row) if cs.about_url else default_subject
    p_template = cs.property_url if cs.property_url else sdv + (cs.name or "")
    p = _expand_url(p_template, row)

    out: list[Triple] = []

    if cs.value_url is not None:
        o_iri = _expand_url(cs.value_url, row)
        basename = o_iri.rsplit("/", 1)[-1]
        if _is_value_null(basename, cs, spec):
            raise _Skip("valueUrl basename null")  # csvw.py:577-581

        if cs.virtual and cs.datatype == XSD_ANYURI:
            if cs.name not in row:
                raise _Skip("virtual anyURI without cell")  # csvw.py:583-585
            o_iri = iri_encode_py(str(row[cs.name]))
            if not is_valid_iri_py(o_iri):
                raise _Skip("invalid anyURI cell")
        if cs.virtual and cs.datatype == XSD_LINKURI and cs.about_url:
            s = _expand_url(_first_brace_fragment(cs.about_url), row)
            o_iri = _expand_url(_first_brace_fragment(cs.value_url), row)

        out.append((s, p, f"<{o_iri}>"))
        if cs.collection_url:
            coll = _expand_url(cs.collection_url, row)
            out.append((coll, RDF + "type", f"<{SKOS}Collection>"))
            out.append((o_iri, RDF + "type", f"<{SKOS}Concept>"))
            out.append((coll, SKOS + "member", f"<{o_iri}>"))
        if cs.scheme_url:
            scheme = _expand_url(cs.scheme_url, row)
            out.append((scheme, RDF + "type", f"<{SKOS}Scheme>"))
            out.append((o_iri, RDF + "type", f"<{SKOS}Concept>"))
            out.append((o_iri, SKOS + "inScheme", f"<{scheme}>"))
    else:
        # literal branch (csvw.py:600-622)
        if cs.value is not None:
            value = render_template_py(cs.value, row)
            if value is None:
                raise _Skip("value template failed")
        elif cs.name in row:
            value = str(row[cs.name])
        else:
            raise _Skip("no name/value")  # csvw.py:606-612

        if cs.datatype == XSD_ANYURI:
            o_iri = iri_encode_py(value)
            if not is_valid_iri_py(o_iri):
                raise _Skip("invalid anyURI literal")
            out.append((s, p, f"<{o_iri}>"))
        elif cs.datatype == XSD_STRING and cs.lang is not None:
            lang = render_template_py(cs.lang, row)
            if lang is None:
                raise _Skip("lang template failed")
            out.append((s, p, object_term_py("lit", value, None, lang)))
        elif cs.datatype is not None:
            out.append((s, p, object_term_py("lit", value, cs.datatype, None)))
        else:
            out.append((s, p, object_term_py("lit", value, None, None)))

    # column provenance (csvw.py:548-549)
    if cs.id:
        out.append((p, PROV + "wasDerivedFrom", f"<{cs.id}>"))
    return out
