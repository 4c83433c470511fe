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
    clean UTF-8 decode of a sample, then :func:`_detect_8bit`'s
    byte-frequency heuristic (Japanese multibyte, Cyrillic single-byte,
    else iso-8859-1 — chardet's usual fallback for 8-bit western data).
    All returned names are accepted by BOTH Spark's JVM CSV reader and
    Python's codecs (Spark rejects names like 'utf-8-sig'/'latin-1'; it
    strips a UTF-8 BOM itself, verified empirically). The 2-byte BOMs
    return 'utf-16' — NOT 'utf-16le'/'utf-16be': Java's UTF-16LE/BE
    charsets do not consume a BOM (only UTF-16 does), and Python's
    'utf-16' likewise uses-and-consumes it.
    """
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    # 4-byte UTF-32 BOMs first — the UTF-32LE BOM starts with the
    # UTF-16LE BOM bytes and would otherwise misdetect
    for bom, enc in [(b"\xff\xfe\x00\x00", "utf-32"),
                     (b"\x00\x00\xfe\xff", "utf-32"),
                     (b"\xef\xbb\xbf", "utf-8"),
                     (b"\xff\xfe", "utf-16"),
                     (b"\xfe\xff", "utf-16")]:
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
        return _detect_8bit(trimmed)


def _detect_8bit(data: bytes) -> str:
    """Classify non-UTF-8 8-bit data (the chardet-shaped corner of S2).

    1. Japanese multibyte: a strict shift_jis / euc-jp decode that
       actually yields kana/CJK is near-conclusive (random Western
       8-bit data fails the strict decode).
    2. Single-byte non-Latin scripts (whole words are high bytes, mean
       run length ≥ ~3) split by where their letters live in the
       codepage — the same byte-distribution signals chardet models:

       - **Thai (tis-620)**: the consonants ก-ธ sit at 0xA1-0xBF, a
         range Cyrillic/Greek/Hebrew text barely touches — ≥25% of high
         bytes there is Thai.
       - **Greek (iso-8859-7)**: nearly every Greek word carries one
         tonos-accented vowel (ά έ ή ί at 0xDC-0xDF, ό ύ ώ at
         0xFC-0xFE), so those bytes run ~8-20% of high bytes while
         windows-1251 Russian puts rare letters there (~3%); require
         lowercase mass at 0xE1-0xF9 too so koi8-r (lowercase at
         0xC0-0xDF) can't match.
       - **Hebrew (windows-1255)**: the alphabet is exactly 0xE0-0xFA
         and Hebrew uses nothing else (no case!), while Russian text
         always spills into 0xFB-0xFF (ы ь э ю я) and capitals.
       - **Cyrillic**: windows-1251 puts lowercase at 0xE0-0xFF where
         koi8-r puts it at 0xC0-0xDF — lowercase dominance picks the
         codepage (the classic russian-charset discriminator).
    3. Everything else: iso-8859-1, the previous behavior (chardet's
       usual fallback for 8-bit western data).
    """
    for enc, name in [("shift_jis", "shift_jis"), ("euc_jp", "euc-jp")]:
        # the sample boundary can cut a double-byte char — retry with up
        # to 2 trailing bytes dropped before declaring a strict-decode
        # failure (the UTF-8 trim upstream doesn't align these codecs)
        dec = None
        for drop in range(3):
            try:
                dec = data[:len(data) - drop].decode(enc)
                break
            except UnicodeDecodeError:
                continue
        if dec is None:
            continue
        # MAJORITY of non-ASCII chars must be kana/CJK, not merely any:
        # Thai tis-620 bytes strictly decode under shift_jis too (0xA1-
        # 0xDF are single-byte halfwidth katakana, and 0xE0+ lead pairs
        # yield scattered CJK), but real Japanese text is ≥90% kana/CJK
        # while misread Thai stays well under half
        non_ascii = [ch for ch in dec if ord(ch) > 0x7F]
        jp = sum(1 for ch in non_ascii
                 if "぀" <= ch <= "ヿ" or "一" <= ch <= "鿿")
        if non_ascii and jp / len(non_ascii) >= 0.5:
            return name
    runs, cur = [], 0
    for b in data:
        if b >= 0x80:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    if runs and sum(runs) / len(runs) >= 2.5:
        hi = [b for b in data if b >= 0x80]
        n = len(hi)
        thai = sum(1 for b in hi if 0xA1 <= b <= 0xBF)
        if thai / n >= 0.25:
            return "tis-620"
        tonos = sum(1 for b in hi if 0xDC <= b <= 0xDF or 0xFC <= b <= 0xFE)
        greek_lower = sum(1 for b in hi if 0xE1 <= b <= 0xF9)
        if tonos / n >= 0.05 and greek_lower / n >= 0.5:
            return "iso-8859-7"
        hebrew = sum(1 for b in hi if 0xE0 <= b <= 0xFA)
        if hebrew / n >= 0.95:
            return "windows-1255"
        lower_1251 = sum(1 for b in hi if b >= 0xE0)
        lower_koi8 = sum(1 for b in hi if 0xC0 <= b <= 0xDF)
        return "windows-1251" if lower_1251 >= lower_koi8 else "koi8-r"
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


# Spark's CSV reader accepts ONLY these charsets (CSVOptions validates);
# anything else — windows-1251, koi8-r, shift_jis, ... — must be
# transcoded before the scan.
_SPARK_CSV_CHARSETS = frozenset(
    ["us-ascii", "iso-8859-1", "utf-8", "utf-16", "utf-16be", "utf-16le",
     "utf-32"])


def _transcode_to_utf8(path: str, encoding: str) -> str:
    """Stream-transcode a CSV into a UTF-8 temp file (driver-side).

    The reference decodes every CSV in the Python process with its
    chardet-detected encoding (csvw.py:64-74), so a driver-side pass is
    exactly its cost model; this only runs for charsets Spark's scanner
    refuses, on the CSV build/convert surface (not the 100 TB path —
    production-scale inputs are parquet)."""
    import atexit
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(
        suffix=".csv", prefix=os.path.basename(path) + ".utf8.")
    atexit.register(lambda: os.path.exists(tmp) and os.unlink(tmp))
    # newline='' on BOTH ends: universal-newline mode would rewrite a
    # bare \r (or \r\n) inside quoted cells to \n — mutating field data
    # and handing Spark's byte-level line split a fake row boundary
    with open(path, "r", encoding=encoding, newline="") as src, \
            os.fdopen(fd, "w", encoding="utf-8", newline="") as dst:
        while chunk := src.read(1 << 20):
            dst.write(chunk)
    return tmp


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    quotechar: str = '"',
    encoding: str = "utf-8",
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """Dialect-aware all-string CSV scan.

    ``multiline=True`` is required for cells containing quoted line
    breaks (\\r or \\n inside quotes): Hadoop's default record split is
    byte-level and quote-blind. It costs input splittability (whole
    file = one task), which is why it is not the default — the
    reference's Python csv reader handles embedded breaks natively but
    reads serially anyway."""
    if encoding.lower().replace("_", "-") not in _SPARK_CSV_CHARSETS:
        path = _transcode_to_utf8(path, encoding)
        encoding = "utf-8"
    reader = (
        spark.read.option("sep", delimiter)
        .option("quote", quotechar)
        .option("encoding", encoding)
        .option("header", header)
        .option("inferSchema", False)
        .option("multiLine", multiline)
    )
    if encoding.lower().replace("_", "-") in (
            "utf-16", "utf-16le", "utf-16be", "utf-32", "utf-32le",
            "utf-32be"):
        # Hadoop's line splitting is byte-level '\n' — in UTF-16 a
        # newline is 0A 00, so the default reader corrupts every row.
        # multiLine routes the file through a stream decoder with the
        # declared charset (whole file = one split; acceptable for the
        # CSV build/convert surface, which is not the 100 TB path).
        reader = reader.option("multiLine", True)
    df = reader.csv(path)
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


def parse_fixed_width(
    lines: DataFrame,
    spec: list[tuple],
    value_col: str = "value",
) -> DataFrame:
    """Fixed-width record parser — the mainframe/legacy-feed sibling of
    the delimited reader (COW's world is CSV; real corpus ingestion
    also meets COBOL-style exports where fields live at byte offsets):
    ``spec`` is a list of ``(name, start, width[, dtype])`` with START
    1-BASED (the convention every fixed-width layout document uses),
    dtype one of ``string | int | long | decimal(p,s)``.

    Each field is ``trim(substring(line, start, width))``; empty
    strings become NULL (a blank fixed-width cell means absent);
    non-string dtypes go through ``try_cast`` — a dirty cell becomes
    NULL instead of aborting the 100 TB job under ANSI (the same
    null-and-filter discipline as the extractor's P17). Lines shorter
    than a field's extent yield NULL for it (substring past the end is
    '' in both engines).

    One map-side projection, zero shuffles; pair with
    ``spark.read.text`` (each input split parses independently, so
    parallelism is the file-split count exactly like CSV).
    """
    if not spec:
        raise ValueError("parse_fixed_width: empty spec")
    cols = []
    for f in spec:
        name, start, width = f[0], f[1], f[2]
        dtype = f[3] if len(f) > 3 else "string"
        if start < 1 or width < 1:
            raise ValueError(
                f"parse_fixed_width: field {name!r} needs 1-based "
                f"start and positive width, got ({start}, {width})")
        raw = F.trim(F.substring(F.col(value_col), start, width))
        v = F.when(F.length(raw) > 0, raw)
        if dtype != "string":
            v = v.try_cast(dtype)
        cols.append(v.alias(name))
    return lines.select(*cols)


def read_fixed_width(
    spark,
    path: str,
    spec: list[tuple],
) -> DataFrame:
    """``spark.read.text`` + :func:`parse_fixed_width` — the
    file-facing wrapper (S-family source)."""
    return parse_fixed_width(spark.read.text(path), spec)
