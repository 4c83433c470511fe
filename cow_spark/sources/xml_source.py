"""XML record source (stdlib-only).

Catalog exports, feed dumps, legacy tool output — record-oriented XML
(`<items><item ...>...</item>...</items>`) is still a common shape for
the metadata that rides along with a corpus. This reads one record
element per row into a DataFrame using ``xml.etree.ElementTree``'s
incremental ``iterparse`` (Python stdlib; no spark-xml jar, no pip),
the same no-extra-deps discipline as the SQLite / fixed-width / .npy
readers. The reference has no XML *input* at all — it only writes
RDF/XML (csvw.py's serialization list); corpus-prep surface.

Scale contract (explicit, not fine print): a single XML document has
no record boundaries visible to a splitter — element nesting can span
any byte range — so ingestion is DRIVER-SIDE and streamed: iterparse
holds one record subtree at a time (each record element is ``clear()``ed
after extraction, so memory is bounded by the largest single record,
not the file). That is the right shape for DIMENSION tables — the
broadcast side of joins — and the wrong shape for facts: ``max_rows``
RAISES when hit rather than silently truncating, the ``read_sqlite``
contract. A corpus that ships as XML should be exploded into per-record
files or converted upstream; this reader is for the catalog next to it.

Field addressing: ``"@name"`` reads an attribute of the record
element; ``"child"`` reads the text of the first direct child element
with that tag (missing → NULL, empty element → NULL — both engines'
NULL semantics, not ``''``, so downstream coalesce/sentinel discipline
applies unchanged). Everything lands as string; cast downstream with
``try_cast`` (ANSI discipline — a dirty cell must not abort the job).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_xml(
    spark: SparkSession,
    path: str,
    record_tag: str,
    fields: list[str],
    max_rows: int = 5_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Stream record elements named ``record_tag`` from the XML file
    at ``path``; one row per record, one string column per entry in
    ``fields`` (``"@attr"`` = attribute, ``"tag"`` = first direct
    child's text). Column names drop the ``@``. Malformed XML raises
    ``xml.etree.ElementTree.ParseError`` — a truncated feed must fail
    loudly, not yield a silently short table. ``num_partitions``
    repartitions the result (a driver-ingested frame is otherwise one
    input split — the `_load_spread` lesson).
    """
    names = [f.lstrip("@") for f in fields]
    rows: list[tuple] = []
    for _event, el in ET.iterparse(path, events=("end",)):
        if el.tag != record_tag:
            continue
        vals = []
        for f in fields:
            if f.startswith("@"):
                vals.append(el.get(f[1:]))
            else:
                child = el.find(f)
                vals.append(None if child is None else child.text)
        rows.append(tuple(vals))
        if len(rows) > max_rows:
            raise ValueError(
                f"read_xml: document exceeds max_rows={max_rows} — "
                f"explode the records into splittable files upstream "
                f"instead of driver-side ingestion")
        el.clear()
    schema = T.StructType(
        [T.StructField(n, T.StringType(), True) for n in names])
    df = spark.createDataFrame(rows, schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def write_xml_fixture(path: str, root_tag: str, record_tag: str,
                      records: list[dict]) -> None:
    """Write a small record-oriented XML fixture (tests / driver
    entries): each dict becomes one record element — ``"@k"`` keys as
    attributes, plain keys as child elements with text content; None
    values are omitted (exercising the missing-field → NULL path)."""
    root = ET.Element(root_tag)
    for rec in records:
        el = ET.SubElement(root, record_tag)
        for k, v in rec.items():
            if v is None:
                continue
            if k.startswith("@"):
                el.set(k[1:], str(v))
            else:
                ET.SubElement(el, k).text = str(v)
    ET.ElementTree(root).write(path, encoding="utf-8",
                               xml_declaration=True)
