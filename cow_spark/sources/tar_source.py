"""Tar archive text source (stdlib-only).

Corpus drops and eval sets routinely arrive as ``docs.tar.gz`` — one
text file per document. This streams the archive's regular files into
a DataFrame via ``tarfile`` (stdlib; transparent gz/bz2/xz via
``r:*``), the same no-extra-deps discipline as the SQLite / XML /
fixed-width / .npy readers. The reference reads loose CSV files only
(csvw.py); corpus-prep surface.

Scale contract (explicit, not fine print): tar has NO random access —
member offsets are only discoverable by scanning, and compression
makes byte-splitting meaningless — so ingestion is DRIVER-SIDE and
streamed member-by-member (memory bounded by the largest single
member). Right for eval sets, seed corpora, and blocklist drops — the
broadcast side; wrong for a training corpus: ``max_files`` and
``max_bytes`` RAISE rather than truncate, and a corpus that trips
them should be exploded to parquet/loose files upstream (where Spark
splits natively).

Decoding is strict: a member that does not decode in the declared
encoding raises — a silently mojibake'd document poisons every
downstream dedup/quality signal (the encoding-health screen exists to
catch exactly that upstream).
"""

from __future__ import annotations

import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_tar_text(
    spark: SparkSession,
    path: str,
    suffix: str | None = None,
    encoding: str = "utf-8",
    max_files: int = 1_000_000,
    max_bytes: int = 1 << 31,
    num_partitions: int | None = None,
) -> DataFrame:
    """Stream the archive at ``path`` into
    ``(member string, n_bytes long, text string)`` rows — regular
    files only (directories/links skipped), optionally filtered to
    names ending in ``suffix``. ``num_partitions`` repartitions the
    result (a driver-ingested frame is otherwise one input split —
    the `_load_spread` lesson).
    """
    rows: list[tuple] = []
    total = 0
    with tarfile.open(path, "r:*") as tf:
        for member in tf:
            if not member.isreg():
                continue
            if suffix is not None and not member.name.endswith(suffix):
                continue
            if len(rows) + 1 > max_files:
                raise ValueError(
                    f"read_tar_text: archive exceeds max_files="
                    f"{max_files} — explode it to splittable files "
                    f"upstream instead of driver-side ingestion")
            total += member.size
            if total > max_bytes:
                raise ValueError(
                    f"read_tar_text: archive exceeds max_bytes="
                    f"{max_bytes} — explode it to splittable files "
                    f"upstream instead of driver-side ingestion")
            fh = tf.extractfile(member)
            data = fh.read() if fh is not None else b""
            rows.append((member.name, len(data),
                         data.decode(encoding)))
    schema = T.StructType([
        T.StructField("member", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("text", T.StringType(), False)])
    df = spark.createDataFrame(rows, schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def write_tar_fixture(path: str, members: dict[str, str],
                      mode: str = "w:gz") -> None:
    """Write a small text tar fixture (tests / driver entries): one
    regular file per ``members`` entry, UTF-8 encoded, deterministic
    member order (dict order) and zeroed timestamps so the archive
    bytes are rerun-stable."""
    import io

    with tarfile.open(path, mode) as tf:
        for name, text in members.items():
            data = text.encode("utf-8")
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
