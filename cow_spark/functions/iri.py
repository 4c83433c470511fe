"""Vectorized IRI encoding + validation + deterministic skolem minting.

The reference pipes every rendered URL through ``iribaker.to_iri`` then
validates with ``rfc3987.parse(rule='IRI')`` (src/converter/csvw.py:897-914).
iribaker percent-encodes characters that are illegal in an IRI while
*keeping* non-ASCII (IRIs allow ucschar) and existing %-escapes
("resistant to double-quoting").

We reproduce the observable behavior with a chain of literal ``replace``
expressions (JVM-side, whole-stage codegen) over the characters that are
actually illegal in an IRI: space, the <>"{}|\\^` set, and common C0
controls. Unicode passes through untouched; '%' is left alone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (char, %XX) — replacements introduce only '%'+hex, none of which appear
# in the search set, so the chain order is irrelevant (except doc order).
IRI_ESCAPES: list[tuple[str, str]] = [
    (" ", "%20"),
    ('"', "%22"),
    ("<", "%3C"),
    (">", "%3E"),
    ("\\", "%5C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
]

# IRI scheme per RFC 3987: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) ":"
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*:"


def iri_encode(c: Column) -> Column:
    """Percent-encode IRI-illegal characters (iribaker-equivalent)."""
    for ch, esc in IRI_ESCAPES:
        c = F.replace(c, F.lit(ch), F.lit(esc))
    return c


def iri_encode_py(s: str) -> str:
    """Pure-Python twin of :func:`iri_encode` (oracle/tests)."""
    for ch, esc in IRI_ESCAPES:
        s = s.replace(ch, esc)
    return s


def is_valid_iri(c: Column) -> Column:
    """Post-encoding sanity validation: absolute IRI with a scheme.

    The reference *raises* on invalid IRIs (csvw.py:911) which, combined
    with its per-column try/except, silently drops the triple — we express
    the same net semantics as a boolean used to null the term (quarantined,
    never a task failure).
    """
    return c.isNotNull() & c.rlike(_SCHEME_RE)


def is_valid_iri_py(s: str) -> bool:
    import re

    return s is not None and re.match(_SCHEME_RE, s) is not None


# --------------------------------------------------------------------------
# Skolem IRI minting (BASELINE.json north_star E2): deterministic hashes
# replace COW's {_row}-template minting — no global row index at 10^12 rows.
# --------------------------------------------------------------------------

SKOLEM_SEP = "\x1f"  # unit separator — cannot appear in key columns


def skolem_iri(base: str, *parts: Column, alg: str = "sha1") -> Column:
    """Mint ``<base>/<hash>`` deterministically from key columns.

    sha1 for collision safety at 10^12 scale; 'md5' variant exists so the
    DuckDB oracle can reproduce it (DuckDB 1.0 lacks sha1).
    """
    # concat_ws silently DROPS null parts, which would collide distinct
    # key tuples that differ only in null position ((a,NULL,b) == (a,b,
    # NULL)) — coalesce each part to a sentinel no real string contains
    safe = [
        F.coalesce(
            (p if isinstance(p, Column) else F.col(p)).cast("string"),
            F.lit(NULL_SENTINEL),
        )
        for p in parts
    ]
    payload = F.concat_ws(SKOLEM_SEP, *safe)
    h = F.sha1(payload) if alg == "sha1" else F.md5(payload)
    return F.concat(F.lit(base.rstrip("/") + "/"), h)


NULL_SENTINEL = "\x00null\x00"


def skolem_iri_py(base: str, *parts: str | None, alg: str = "sha1") -> str:
    import hashlib

    safe = [NULL_SENTINEL if p is None else p for p in parts]
    payload = SKOLEM_SEP.join(safe).encode("utf-8")
    h = getattr(hashlib, alg)(payload).hexdigest()
    return base.rstrip("/") + "/" + h
