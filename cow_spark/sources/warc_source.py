"""WARC (Web ARChive) text source — the container format web-scale
training corpora actually arrive in (Common Crawl ships WARC/WET), so
a corpus-prep engine that cannot scan it natively starts every run
with an out-of-band unpack. The reference reads loose CSV files only
(csvw.py); corpus-prep surface, SURVEY.md §2.11.

Spark-first design — the reader is ONE declarative text scan, no
Python in the data path:

- ``spark.read.option("lineSep", "WARC/1.0\\r\\n").text(path)`` splits
  the archive into records on the version line. Hadoop's line reader
  handles custom multi-byte delimiters ACROSS split boundaries, so an
  uncompressed (or per-file-gzip) archive scans splittable and
  parallel — the property tar fundamentally lacks (tar_source.py is
  driver-side by contract; WARC at corpus scale is why).
- header/payload separation, header-field extraction, and the
  Content-Length parse are Column expressions (substring_index /
  regexp_extract / try_cast) — whole-stage codegen, zero
  BatchEvalPython.

Delimiter-split vs Content-Length: the split trusts that no payload
contains ``WARC/1.0\\r\\n`` at a record-start position. Real WARC
readers walk Content-Length offsets instead — unsplittable without an
index. The reader keeps the parallel fast path and makes the trust
LOUD: ``strict=True`` (default) verifies ``octet_length(payload) ==
Content-Length`` per record and raises listing the first offenders —
a payload that embeds the delimiter mis-splits into records whose
lengths cannot reconcile, so corruption is detected, never silently
ingested (the tar reader's strict-decode discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELIM = "WARC/1.0\r\n"
_HDR_SEP = "\r\n\r\n"


def read_warc(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    max_bad: int = 5,
) -> DataFrame:
    """Scan WARC record bodies at ``path`` (file/dir/glob) into
    ``(rec_type, uri, warc_date, content_length, n_bytes, text)`` —
    one row per record, the pre-delimiter preamble dropped. Payload
    ``text`` excludes the record-terminating CRLF CRLF; ``n_bytes``
    is its octet length (== ``content_length`` for a well-formed
    archive; ``strict`` enforces that)."""
    raw = (spark.read.option("lineSep", _DELIM).text(path)
           .where(F.col("value").contains(_HDR_SEP)))
    hdr = F.substring_index(F.col("value"), _HDR_SEP, 1)
    # payload = chunk minus "<header>\r\n\r\n" prefix minus the
    # "\r\n\r\n" record terminator (always present in canonical WARC)
    body = F.expr(
        "substring(value, length(substring_index(value, '\r\n\r\n', 1))"
        " + 5)")
    payload = F.expr(
        "case when endswith(_body, '\r\n\r\n')"
        " then left(_body, length(_body) - 4) else _body end")
    rec = (raw.select(hdr.alias("_hdr"), body.alias("_body"))
           .select(
               F.regexp_extract("_hdr", r"WARC-Type: *([^\r\n]+)", 1)
               .alias("rec_type"),
               F.regexp_extract("_hdr",
                                r"WARC-Target-URI: *([^\r\n]+)", 1)
               .alias("uri"),
               F.regexp_extract("_hdr", r"WARC-Date: *([^\r\n]+)", 1)
               .alias("warc_date"),
               F.regexp_extract("_hdr",
                                r"Content-Length: *([0-9]{1,18})", 1)
               .try_cast("long").alias("content_length"),
               payload.alias("text"))
           .withColumn("n_bytes", F.octet_length("text").cast("long"))
           .select("rec_type", "uri", "warc_date", "content_length",
                   "n_bytes", "text"))
    if strict:
        bad = (rec.where(F.col("content_length").isNull()
                         | (F.col("n_bytes")
                            != F.col("content_length")))
               .limit(max_bad).collect())
        if bad:
            heads = [(r.uri, r.content_length, r.n_bytes) for r in bad]
            raise ValueError(
                "read_warc: payload length != Content-Length (corrupt "
                f"archive or delimiter collision): {heads}")
    return rec


def warc_record(uri: str, date: str, payload: str,
                rec_type: str = "response") -> bytes:
    """One canonical WARC/1.0 record (CRLF headers, CRLF CRLF
    terminator); ``Content-Length`` is the payload's octet length —
    the invariant ``read_warc(strict=True)`` re-verifies."""
    p = payload.encode("utf-8")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(p)}\r\n"
            f"\r\n").encode("ascii")
    return head + p + b"\r\n\r\n"


def write_warc_fixture(path: str, records) -> None:
    """Write ``records`` of ``(uri, date, payload[, rec_type])`` as a
    canonical uncompressed WARC file (tests/fixtures only — corpus
    WARCs come from the crawler)."""
    with open(path, "wb") as fh:
        for rec in records:
            fh.write(warc_record(*rec))
