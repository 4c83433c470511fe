"""CSV source with COW dialect semantics (SURVEY.md S1-S5) + ``_row``.

The reference streams CSV rows as string dicts with an injected global
0-based row index ``_row`` (src/converter/csvw.py:369-374,489,507). Spark
reads CSV distributed; a *global* row index is inherently a sequential
concept, so:

- ``read_csv``: dialect-aware scan, everything as string (COW's model —
  no type inference at convert time, SURVEY.md §1.2).
- ``with_row_index``: exact global ``_row``. Two modes:
  * ``order_by`` given → window row_number (one total sort; fine at
    CSV-parity scale, documented as not-for-10^12-rows).
  * default → zipWithIndex-free monotonic path: per-partition offsets
    computed from partition sizes (two passes, no sort) — the standard
    scalable global-index recipe; stable for a fixed file layout since
    Spark's file scan order is deterministic per input split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def detect_encoding(path: str, sample_bytes: int = 1 << 16) -> str:
    """S2 — driver-side encoding detection for ``build`` mode.

    The reference uses chardet (csvw.py:64-74; unavailable offline);
    this stdlib heuristic covers the practical cases: BOMs win, then a
    clean UTF-8 decode of a sample, else iso-8859-1 (never fails —
    chardet's usual fallback for 8-bit western data). All returned
    names are accepted by BOTH Spark's JVM CSV reader and Python's
    codecs (Spark rejects names like 'utf-8-sig'/'latin-1'; it strips a
    UTF-8 BOM itself, verified empirically).
    """
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    # 4-byte UTF-32 BOMs first — the UTF-32LE BOM starts with the
    # UTF-16LE BOM bytes and would otherwise misdetect
    for bom, enc in [(b"\xff\xfe\x00\x00", "utf-32"),
                     (b"\x00\x00\xfe\xff", "utf-32"),
                     (b"\xef\xbb\xbf", "utf-8"),
                     (b"\xff\xfe", "utf-16le"),
                     (b"\xfe\xff", "utf-16be")]:
        if head.startswith(bom):
            return enc
    # trim a possibly-truncated trailing multibyte sequence (the sample
    # boundary can split a UTF-8 char) before validating
    trimmed = head
    for _ in range(3):
        if trimmed and trimmed[-1] & 0xC0 == 0x80:
            trimmed = trimmed[:-1]
        else:
            break
    if trimmed and trimmed[-1] & 0xC0 == 0xC0:
        trimmed = trimmed[:-1]
    try:
        trimmed.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso-8859-1"


def sniff_delimiter(path: str, encoding: str = "utf-8",
                    candidates: str = ",;\t|") -> str:
    """S3 — delimiter sniffing on the header line, same stdlib Sniffer
    the reference uses (csv.Sniffer().sniff, csvw.py:76-82)."""
    import csv as _csv

    with open(path, encoding=encoding, errors="replace") as f:
        header = f.readline()
    try:
        return _csv.Sniffer().sniff(header, delimiters=candidates).delimiter
    except _csv.Error:
        return ","


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    quotechar: str = '"',
    encoding: str = "utf-8",
    header: bool = True,
) -> DataFrame:
    df = (
        spark.read.option("sep", delimiter)
        .option("quote", quotechar)
        .option("encoding", encoding)
        .option("header", header)
        .option("inferSchema", False)
        .csv(path)
    )
    # COW model: every cell is a string; empty cell == "" not NULL. Spark's
    # CSV reader yields NULL for empty unquoted fields no matter the
    # nullValue/emptyValue options — normalize here. df[c] (not F.col(c))
    # resolves dotted headers like 'lat.deg' literally instead of as
    # struct-field access.
    return df.select(
        *[F.coalesce(df[c], F.lit("")).alias(c) for c in df.columns]
    )


def with_row_index(df: DataFrame, order_by: list[str] | None = None) -> DataFrame:
    """Add COW's ``_row`` (global 0-based index, header excluded)."""
    if order_by:
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn("_row", F.row_number().over(w) - 1)
    # scalable path: monotonic id → per-partition dense offsets
    tagged = df.withColumn("_mid", F.monotonically_increasing_id())
    part = F.shiftright(F.col("_mid"), 33)
    w = Window.partitionBy(part).orderBy("_mid")
    counts = (
        tagged.groupBy(part.alias("_p"))
        .agg(F.count("*").alias("_n"))
        .withColumn("_offset", F.coalesce(
            F.sum("_n").over(Window.orderBy("_p").rowsBetween(
                Window.unboundedPreceding, -1)), F.lit(0)))
    )
    return (
        tagged.withColumn("_p", part)
        .withColumn("_rank", F.row_number().over(w) - 1)
        .join(F.broadcast(counts.select("_p", "_offset")), "_p")
        .withColumn("_row", (F.col("_offset") + F.col("_rank")).cast("long"))
        .drop("_mid", "_p", "_rank", "_offset")
    )
