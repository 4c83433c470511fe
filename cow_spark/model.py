"""Data model: RDF terms, quads, namespaces, XSD datatypes, N-Quads rendering.

Quads are plain DataFrames with flat columns (no nested structs in the
stored table — flat columns give Parquet column pruning + min/max stats):

    g       string   graph IRI (nullable → triple in the default graph)
    s       string   subject IRI (absolute, already %-encoded)
    p       string   predicate IRI
    o_kind  string   'iri' | 'lit'
    o_lex   string   object IRI or raw literal lexical form (COW keeps the
                     lexical form verbatim: Literal(..., normalize=False),
                     reference src/converter/csvw.py:621)
    o_dt    string   literal datatype IRI, null for plain/lang literals
    o_lang  string   language tag, null unless lang-tagged

The reference's output model is an rdflib Dataset of named graphs
(reference src/converter/util/__init__.py:148-248); ours is one quads
DataFrame + rendering to N-Quads lines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# --------------------------------------------------------------------------
# Namespaces (constant dict — the reference loads these from a *mutable*
# YAML side-channel, src/converter/util/namespaces.yaml; we deliberately
# keep them immutable per-spec, rebasing sdr/sdv from the spec @base).
# --------------------------------------------------------------------------

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
PROV = "http://www.w3.org/ns/prov#"
NP = "http://www.nanopub.org/nschema#"
CSVW = "http://www.w3.org/ns/csvw#"

DEFAULT_BASE = "https://example.com/id"

BASE_NAMESPACES: dict[str, str] = {
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "skos": SKOS,
    "prov": PROV,
    "np": NP,
    "csvw": CSVW,
    "owl": "http://www.w3.org/2002/07/owl#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
    "qb": "http://purl.org/linked-data/cube#",
    "sem": "http://semanticweb.cs.vu.nl/2009/11/sem/",
    "time": "http://www.w3.org/2006/time#",
    "geo": "http://www.opengis.net/ont/geosparql#",
    "bio": "http://purl.org/vocab/bio/0.1/",
    "bibo": "http://purl.org/ontology/bibo/",
    "wgs84": "http://www.w3.org/2003/01/geo/wgs84_pos#",
    # trailing slash is NOT the W3C form, but it is byte-for-byte what the
    # reference ships (util/namespaces.yaml:37-38) — parity wins here
    "xml": "http://www.w3.org/XML/1998/namespace/",
}


def namespaces_for_base(base: str = DEFAULT_BASE) -> dict[str, str]:
    """Namespace table with sdr/sdv rebased from the spec @base.

    Mirrors process_namespaces (reference src/converter/util/__init__.py:86-93)
    minus the write-back-to-disk side effect.
    """
    ns = dict(BASE_NAMESPACES)
    b = base.rstrip("/")
    ns["sdr"] = b + "/"
    ns["sdv"] = b + "/vocab/"
    return ns


# XSD short-name table (subset of the CSVW @context, reference csvw.json).
_XSD_SHORT = {
    n: XSD + n
    for n in [
        "string", "integer", "int", "long", "short", "byte", "decimal",
        "double", "float", "boolean", "date", "dateTime", "dateTimeStamp",
        "time", "duration", "gYear", "gMonth", "gDay", "gYearMonth",
        "gMonthDay", "anyURI", "base64Binary", "hexBinary", "QName",
        "normalizedString", "token", "language", "Name", "NCName",
        "nonNegativeInteger", "positiveInteger", "negativeInteger",
        "nonPositiveInteger", "unsignedInt", "unsignedLong",
        # COW invention: both s and o re-derived from the {..} fragment
        # (reference src/converter/csvw.py:588-592)
        "linkURI",
    ]
}

XSD_ANYURI = XSD + "anyURI"
XSD_LINKURI = XSD + "linkURI"
XSD_STRING = XSD + "string"


def datatype_iri(dt: str | None, namespaces: dict[str, str]) -> str | None:
    """Resolve a spec datatype (short name, prefixed, or absolute) to an IRI."""
    if dt is None:
        return None
    if dt in _XSD_SHORT:
        return _XSD_SHORT[dt]
    if ":" in dt:
        pfx, rest = dt.split(":", 1)
        if pfx in namespaces and not rest.startswith("//"):
            return namespaces[pfx] + rest
    return dt


# --------------------------------------------------------------------------
# Quad schema
# --------------------------------------------------------------------------

QUAD_COLS = ["g", "s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]
TRIPLE_COLS = ["s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]

QUAD_SCHEMA = StructType([StructField(c, StringType(), True) for c in QUAD_COLS])


# --------------------------------------------------------------------------
# N-Quads rendering (pure Column expressions → whole-stage codegen)
# --------------------------------------------------------------------------


def nq_escape(c: Column) -> Column:
    """Escape a literal lexical form per the N-Triples grammar.

    Matches rdflib's nquads literal escaping (backslash first, then quote,
    newline, carriage return, tab).
    """
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def object_term(
    o_kind: Column, o_lex: Column, o_dt: Column, o_lang: Column
) -> Column:
    """Render the object as an N-Triples term string.

    iri           → <iri>
    typed literal → "lex"^^<dt>     (raw lexical, COW normalize=False)
    lang literal  → "lex"@lang
    plain literal → "lex"
    """
    lit = F.concat(F.lit('"'), nq_escape(o_lex), F.lit('"'))
    return (
        F.when(o_kind == "iri", F.concat(F.lit("<"), o_lex, F.lit(">")))
        .when(o_dt.isNotNull(), F.concat(lit, F.lit("^^<"), o_dt, F.lit(">")))
        .when(o_lang.isNotNull(), F.concat(lit, F.lit("@"), o_lang))
        .otherwise(lit)
    )


def to_nquads_lines(quads: DataFrame, graph: str | None = None) -> DataFrame:
    """Quads DataFrame → single-column DataFrame of N-Quads lines.

    ``graph`` overrides/defaults the g column (a constant assertion-graph
    IRI, mirroring how every chunk of the reference writes into one shared
    named graph, src/converter/csvw.py:460-462).
    """
    g = quads["g"] if "g" in quads.columns else F.lit(None).cast("string")
    if graph is not None:
        g = F.coalesce(g, F.lit(graph))
    gpart = F.when(g.isNotNull(), F.concat(F.lit(" <"), g, F.lit(">"))).otherwise(
        F.lit("")
    )
    line = F.concat(triple_line(quads), gpart, F.lit(" ."))
    return quads.select(line.alias("value"))


def triple_line(quads: DataFrame):
    """``<s> <p> obj`` rendering shared by every text serialization —
    the single source of term/escaping behavior (N-Quads, N-Triples,
    Turtle, TriG all build on it)."""
    return F.concat(
        F.lit("<"), quads["s"], F.lit("> <"), quads["p"], F.lit("> "),
        object_term(quads["o_kind"], quads["o_lex"],
                    quads["o_dt"], quads["o_lang"]),
    )


def object_term_py(
    o_kind: str, o_lex: str, o_dt: str | None, o_lang: str | None
) -> str:
    """Pure-Python twin of :func:`object_term` (used by the oracle/tests)."""
    if o_kind == "iri":
        return f"<{o_lex}>"
    esc = (
        o_lex.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if o_dt is not None:
        return f'"{esc}"^^<{o_dt}>'
    if o_lang is not None:
        return f'"{esc}"@{o_lang}'
    return f'"{esc}"'
