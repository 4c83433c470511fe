"""NumPy ``.npy`` embedding-matrix source.

Embedding dumps from training runs ship as ``.npy``/sharded ``.npy``
files far more often than as parquet; this scans a glob of them into
the engine's canonical ``(path, row_idx, vec)`` shape so the ANN /
dedup stack (simsearch.py, dedup.py) can consume model artifacts
directly. The reference has no binary sources at all (CSV only,
csvw.py) — this is corpus-prep surface, same family as the fixed-width
reader.

Scale contract: Spark's ``binaryFile`` source yields ONE row per file
(whole content in memory), so a file must fit an executor — shard
embedding dumps at write time (the universal .npy convention:
``part-00000.npy`` …). Parallelism = number of files; the Arrow
``mapInPandas`` parse is the only Python crossing and emits bounded
batches, never one giant pandas frame per file.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession

NPY_SCHEMA = "path string, row_idx bigint, vec array<double>"


def _parse_npy_batches(batches):
    """mapInPandas kernel: each input row is one .npy file; emit
    (path, row_idx, vec) in bounded chunks. 2-D float arrays only —
    anything else is a data bug and fails the task loudly."""
    import numpy as np
    import pandas as pd

    chunk = 4096
    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            arr = np.load(io.BytesIO(bytes(content)), allow_pickle=False)
            if arr.ndim != 2:
                raise ValueError(
                    f"read_npy: {path} has ndim={arr.ndim}, want a "
                    f"2-D (rows × dim) embedding matrix")
            arr = np.ascontiguousarray(arr, dtype=np.float64)
            for lo in range(0, arr.shape[0], chunk):
                part = arr[lo:lo + chunk]
                yield pd.DataFrame({
                    "path": [path] * part.shape[0],
                    "row_idx": range(lo, lo + part.shape[0]),
                    "vec": [row.tolist() for row in part],
                })


def read_npy(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``.npy`` matrix files at ``path`` (file/dir/glob) into
    ``(path, row_idx, vec: array<double>)``.

    float32 inputs upcast exactly (every float32 is a float64);
    ``row_idx`` is the 0-based row within its file — a global id, when
    needed, is ``(path, row_idx)`` or a post-hoc zipWithIndex-free
    ``hash(path, row_idx)``. Pickled object arrays are refused
    (``allow_pickle=False`` — a data file must not execute code).
    """
    raw = (spark.read.format("binaryFile").load(path)
           .select("path", "content"))
    return raw.mapInPandas(_parse_npy_batches, NPY_SCHEMA)


def write_npy_shard(matrix, path: str) -> None:
    """Driver-side helper to materialize one .npy shard (fixtures,
    round trips). ``matrix`` is any numpy-convertible 2-D sequence."""
    import numpy as np

    np.save(path, np.asarray(matrix))
