"""Driver-side streaming RDF/XML and TriX writers (SURVEY.md S8).

The reference produces these formats by re-parsing its finished .nq file
into an in-memory rdflib ConjunctiveGraph and serializing it
(/root/reference/src/csvw_tool.py:61-78, format/extension table
src/converter/csvw.py:39-41). A single XML document has one root
element, so this surface is inherently single-writer — but it never has
to be single-*memory*: we stream sorted quads through the driver with
``toLocalIterator`` (one partition resident at a time), where the
reference materializes the entire graph in RAM first. The distributed
sinks (nquads/nt/turtle/trig/n3, :mod:`.sinks`) remain the scale path;
XML is a compatibility export.

Both writers emit a *correct subset* of their grammars:

- RDF/XML: one ``rdf:Description`` per subject (subject-sorted input
  makes the grouping a streaming operation), object IRIs as
  ``rdf:resource``, literals as element text with ``rdf:datatype`` /
  ``xml:lang``. Predicate IRIs are split namespace/local-name at the
  longest NCName suffix (the same rule rdflib applies); predicates with
  no valid split raise, as rdflib's serializer does. Graph names are
  dropped (RDF/XML has no named-graph syntax; rdflib's ConjunctiveGraph
  xml serialization likewise flattens to the union of graphs).
- TriX (W3C note syntax): ``<graph><uri>g</uri><triple>...`` blocks,
  quads sorted by graph so each graph is one contiguous block; the
  default graph becomes a ``<graph>`` with no ``<uri>``.
"""

from __future__ import annotations

import gzip as _gzip
from typing import IO

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from xml.sax.saxutils import escape, quoteattr

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"

# C0 controls that XML 1.0 cannot represent at all (not even as charrefs)
_XML_ILLEGAL = {chr(c) for c in range(0x20)} - {"\t", "\n", "\r"}


def _text(value: str) -> str:
    """Escape literal lexical text for element content.

    ``saxutils.escape`` alone is not enough: a raw carriage return in
    element text is silently normalized to \\n by every conforming XML
    parser (XML 1.0 §2.11) — the literal would round-trip different
    from the .nq output — so \\r must be a character reference. C0
    controls other than tab/newline/CR are ill-formed in XML 1.0 in any
    form; refuse them loudly rather than emit an unparseable document
    (rdflib's serializers emit them raw, producing broken files)."""
    bad = _XML_ILLEGAL.intersection(value)
    if bad:
        raise ValueError(
            f"literal contains control character(s) {sorted(map(ord, bad))} "
            "that XML 1.0 cannot represent; use an N-Quads-family format "
            "for this data")
    return escape(value).replace("\r", "&#13;")


def _name_start(ch: str) -> bool:
    return ch.isalpha() or ch == "_"


def _name_char(ch: str) -> bool:
    return ch.isalnum() or ch in "_-."


def split_iri(iri: str) -> tuple[str, str]:
    """Split an IRI into (namespace, NCName local part) at the longest
    valid-NCName suffix. Raises ValueError when no split exists (e.g.
    the IRI ends in '/'), matching rdflib's refusal to serialize such a
    predicate in RDF/XML."""
    i = len(iri)
    while i > 0 and _name_char(iri[i - 1]):
        i -= 1
    while i < len(iri) and not _name_start(iri[i]):
        i += 1
    local = iri[i:]
    if not local or i == 0:
        raise ValueError(
            f"cannot split {iri!r} into namespace + XML NCName; "
            "this predicate is not serializable as RDF/XML")
    return iri[:i], local


def _open(path: str, gzip_out: bool) -> IO[str]:
    if gzip_out:
        return _gzip.open(path, "wt", encoding="utf-8", newline="\n")
    return open(path, "w", encoding="utf-8", newline="\n")


class _cleanup_on_error:
    """Delete the partial output file if the write body raises — a
    mid-stream failure (e.g. an unrepresentable control character N rows
    in) must not leave a truncated-but-parseable-looking XML artifact
    for downstream globs to pick up."""

    def __init__(self, path: str):
        self.path = path

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            import os

            if os.path.exists(self.path):
                os.unlink(self.path)
        return False


def write_rdf_xml(
    quads: DataFrame,
    path: str,
    gzip_out: bool = False,
    pretty: bool = False,
) -> None:
    """Serialize the union of graphs as one RDF/XML document.

    ``pretty`` is accepted for the reference's xml / pretty-xml flag
    pair; the output is already subject-grouped and indented, which is
    the observable difference between rdflib's two xml serializers, so
    both flags produce the same document here.
    """
    del pretty  # cosmetic distinction only — see docstring
    rows = (
        quads.select("s", "p", "o_kind", "o_lex", "o_dt", "o_lang")
        .dropDuplicates()
        .sort("s", "p", "o_lex")
    )
    with _cleanup_on_error(path), _open(path, gzip_out) as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(f"<rdf:RDF xmlns:rdf={quoteattr(RDF_NS)}>\n")
        cur = None
        for r in rows.toLocalIterator():
            if r.s != cur:
                if cur is not None:
                    f.write("  </rdf:Description>\n")
                f.write(f"  <rdf:Description rdf:about={quoteattr(r.s)}>\n")
                cur = r.s
            ns, local = split_iri(r.p)
            # per-element default xmlns keeps the writer namespace-table
            # free (no two-pass prefix collection over the stream)
            if r.o_kind == "iri":
                f.write(
                    f"    <{local} xmlns={quoteattr(ns)} "
                    f"rdf:resource={quoteattr(r.o_lex)}/>\n")
            else:
                attr = ""
                if r.o_dt is not None:
                    attr = f" rdf:datatype={quoteattr(r.o_dt)}"
                elif r.o_lang is not None:
                    attr = f" xml:lang={quoteattr(r.o_lang)}"
                f.write(
                    f"    <{local} xmlns={quoteattr(ns)}{attr}>"
                    f"{_text(r.o_lex)}</{local}>\n")
        if cur is not None:
            f.write("  </rdf:Description>\n")
        f.write("</rdf:RDF>\n")


_NO_GRAPH = object()


def write_trix(
    quads: DataFrame,
    path: str,
    graph: str | None = None,
    gzip_out: bool = False,
) -> None:
    """Serialize quads as one TriX document (named graphs preserved)."""
    g = quads["g"] if "g" in quads.columns else F.lit(None).cast("string")
    if graph is not None:
        g = F.coalesce(g, F.lit(graph))
    rows = (
        quads.select(g.alias("g"), "s", "p", "o_kind", "o_lex", "o_dt",
                     "o_lang")
        .dropDuplicates()
        .sort(F.col("g").asc_nulls_first(), "s", "p", "o_lex")
    )
    with _cleanup_on_error(path), _open(path, gzip_out) as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(f"<TriX xmlns={quoteattr(TRIX_NS)}>\n")
        cur = _NO_GRAPH
        for r in rows.toLocalIterator():
            if cur is _NO_GRAPH or r.g != cur:
                if cur is not _NO_GRAPH:
                    f.write("  </graph>\n")
                f.write("  <graph>\n")
                if r.g is not None:
                    f.write(f"    <uri>{escape(r.g)}</uri>\n")
                cur = r.g
            if r.o_kind == "iri":
                obj = f"<uri>{escape(r.o_lex)}</uri>"
            elif r.o_dt is not None:
                obj = (f"<typedLiteral datatype={quoteattr(r.o_dt)}>"
                       f"{_text(r.o_lex)}</typedLiteral>")
            elif r.o_lang is not None:
                obj = (f"<plainLiteral xml:lang={quoteattr(r.o_lang)}>"
                       f"{_text(r.o_lex)}</plainLiteral>")
            else:
                obj = f"<plainLiteral>{_text(r.o_lex)}</plainLiteral>"
            f.write(
                f"    <triple><uri>{escape(r.s)}</uri>"
                f"<uri>{escape(r.p)}</uri>{obj}</triple>\n")
        if cur is not _NO_GRAPH:
            f.write("  </graph>\n")
        f.write("</TriX>\n")
