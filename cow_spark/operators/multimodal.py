"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a small typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages sized by bytes, not rows.

The decode kernels themselves are **stubbed** in this environment (no
image/audio libraries in the container): ``decoder='real'`` raises
``NotImplementedError`` with the integration point documented, while
``decoder='fake'`` produces deterministic md5-derived features so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and fully tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, content binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    f"features array<float>"
)


def media_from_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture adapter: wrap document text bytes as fake media
    payloads (deterministic; exercises the binary-column plumbing)."""
    return df.select(
        F.col("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: md5-seeded floats."""
    h = hashlib.md5(payload or b"").digest()
    out = []
    for i in range(dim):
        out.append(((h[i % 16] * 31 + i * 7) % 256) / 255.0)
    return out


def extract_features(
    media: DataFrame,
    decoder: str = "fake",
    batch_rows: int = 256,
) -> DataFrame:
    """binary payloads → feature vectors via Arrow-batched mapInPandas.

    ``decoder='real'`` is the integration point for PIL/librosa/ffmpeg —
    not available in this container, so it raises with instructions.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "real":
            raise NotImplementedError(
                "real decoders (PIL/librosa/pyav) are not installed in this "
                "environment; plug them in here — the batch contract is: "
                "pd.DataFrame[doc_id, media_type, content] → "
                "pd.DataFrame[doc_id, media_type, n_bytes, features]"
            )
        for b in batches:
            feats = [_fake_features(c) for c in b["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "n_bytes": [len(c or b"") for c in b["content"]],
                    "features": [np.array(f, dtype=np.float32) for f in feats],
                }
            )

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "doc_id bigint, media_type string, content binary, "
    "width int, height int, duration_ms int"
)


def resize_media(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    decoder: str = "fake",
) -> DataFrame:
    """Resize image payloads to (width, height) via Arrow-batched
    ``mapInPandas`` — the training-ingest normalization step.

    Same stub contract as :func:`extract_features`: ``decoder='real'``
    is the PIL integration point (unavailable offline) and raises with
    the batch contract; ``decoder='fake'`` emits a deterministic
    payload of exactly width×height bytes derived from the source bytes
    (md5-keyed tiling), so batch sizing, schema, and metadata rewrite
    are real and testable. Non-image rows pass through untouched.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "real":
            raise NotImplementedError(
                "real image decode/resize (PIL) is not installed in this "
                "environment; plug it in here — batch contract: "
                "pd.DataFrame[doc_id, media_type, content, width, height] → "
                "same columns with content resized and width/height updated"
            )
        for b in batches:
            out_content, out_w, out_h = [], [], []
            for mt, c, w, h in zip(b["media_type"], b["content"],
                                   b["width"], b["height"]):
                if isinstance(mt, str) and mt.startswith("image/"):
                    seed = hashlib.md5(c or b"").digest()
                    n = width * height
                    out_content.append((seed * (n // 16 + 1))[:n])
                    out_w.append(width)
                    out_h.append(height)
                else:
                    out_content.append(c)
                    out_w.append(w)
                    out_h.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "media_type": b["media_type"],
                    "content": out_content,
                    "width": out_w,
                    "height": out_h,
                    # carried through untouched so resize composes with
                    # sample_frames over mixed image+video corpora
                    "duration_ms": b["duration_ms"],
                }
            )

    return media.select(
        "doc_id", "media_type", "content", "width", "height", "duration_ms"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 250
) -> DataFrame:
    """Frame-sampling plan for video rows: explode sample timestamps
    JVM-side (the decode of each sampled frame is the stubbed kernel).

    Deliberately does NOT carry ``content`` through the explode — that
    would copy the full video payload into every frame row (a 60 s clip
    at 250 ms = 241 copies of the binary in Tungsten rows). The decode
    stage joins content back by doc_id, or better, runs decode in the
    same mapInPandas stage as the sampling so each payload crosses once.
    """
    video = media.where(F.col("media_type").startswith("video/"))
    stamps = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return video.select(
        "doc_id",
        F.explode(stamps).alias("frame_ms"),
    )
