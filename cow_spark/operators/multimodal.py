"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a small typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages sized by bytes, not rows.

Three decoder tiers:

- ``decoder='fake'`` (default here): deterministic md5-derived features
  — exercises the Spark-side plumbing (schema, batching, partitioning,
  UDF signatures) with zero format assumptions.
- ``decoder='stdlib'``: REAL decode of the two formats the Python
  standard library + numpy can parse without any external dependency —
  binary PPM (P6) images and PCM WAV audio. This proves the
  ``decoder='real'`` integration seam end-to-end (bytes → pixels/samples
  → features / resized bytes) inside the offline container.
- ``decoder='real'``: the PIL/librosa/pyav integration point — those
  libraries are not in this container, so it raises
  ``NotImplementedError`` with the batch contract documented.
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


# ---------------------------------------------------------------------------
# stdlib decoders: binary PPM (P6) + PCM WAV — no external dependencies
# ---------------------------------------------------------------------------


def decode_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6, maxval 255) payload → (w, h, HxWx3 uint8).

    P6 grammar: ``P6 <ws> width <ws> height <ws> maxval <single-ws> raw
    RGB bytes``; ``#`` comments may appear in the header whitespace."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    i += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    if len(data) - i < need:
        raise ValueError("truncated P6 payload")
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=i)
    return w, h, px.reshape(h, w, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a PCM WAV payload → (n_channels, framerate, int samples).

    8/16-bit PCM via the stdlib ``wave`` module; samples centered
    (8-bit is unsigned on disk)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        fr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    elif sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return nch, fr, x


def _stdlib_features(media_type: str, payload: bytes,
                     dim: int = FEATURE_DIM) -> list[float]:
    """Real features from really-decoded bytes (integer-exact stats, so
    re-runs and the pure-Python test twin agree bit-for-bit):

    - PPM image: [1, w, h, mean/std per RGB channel (0-1), min, max]
    - PCM WAV:   [2, n_channels, framerate/48k, n_samples, rms/2^15,
                  zero-crossing rate, peak/2^15]

    Types without a stdlib decoder (e.g. video/mp4) raise — the caller
    decides the policy (the fake kernel remains the placeholder tier).
    """
    # float discipline: integer sums stay exact; every float op below is
    # a single IEEE-correctly-rounded primitive (division, multiply,
    # math.sqrt) in a fixed order, so a SQL oracle computing the same
    # expressions reproduces the doubles bit-for-bit. No `** 0.5` / no
    # numpy reductions on floats (pow/pairwise-sum give no such
    # guarantee).
    import math

    out: list[float]
    if media_type == "image/x-portable-pixmap":
        w, h, px = decode_ppm(payload)
        n = w * h
        sums = [int(s) for s in px.sum(axis=(0, 1), dtype=np.int64)]
        sqs = [int(q) for q in
               (px.astype(np.int64) ** 2).sum(axis=(0, 1))]
        means = [s / n for s in sums]
        out = [1.0, float(w), float(h),
               *(m / 255.0 for m in means),
               *(math.sqrt(q / n - m * m) / 255.0
                 for q, m in zip(sqs, means)),
               float(int(px.min())) / 255.0,
               float(int(px.max())) / 255.0]
    elif media_type == "audio/wav":
        nch, fr, x = decode_wav(payload)
        n = max(len(x), 1)
        rms = math.sqrt(int((x ** 2).sum()) / n)            # exact sum
        zc = int(((x[:-1] >= 0) != (x[1:] >= 0)).sum()) if len(x) > 1 else 0
        peak = int(np.abs(x).max()) if len(x) else 0
        out = [2.0, float(nch), fr / 48000.0, float(len(x)),
               rms / 32768.0, zc / n, peak / 32768.0]
    else:
        raise ValueError(
            f"no stdlib decoder for {media_type!r} (PPM and WAV only); "
            "route other types through decoder='fake' or plug a real "
            "decoder into decoder='real'")
    return (out + [0.0] * dim)[:dim]


def synthetic_ppm_bytes(seed: int, width: int = 8, height: int = 6) -> bytes:
    """Deterministic P6 gradient fixture (integer-exact pixels)."""
    y, x = np.mgrid[0:height, 0:width]
    px = np.stack([(x * 7 + seed) % 256,
                   (y * 11 + 2 * seed) % 256,
                   (x + y + 3 * seed) % 256], axis=-1).astype(np.uint8)
    return encode_ppm(px)


def synthetic_wav_bytes(seed: int, n_frames: int = 400,
                        framerate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM fixture (integer sawtooth)."""
    import io
    import wave

    i = np.arange(n_frames)
    x = ((i * (seed * 2 + 3)) % 20000 - 10000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def synthetic_media_df(spark, n: int) -> DataFrame:
    """Really-decodable media fixture: alternating P6 PPM / PCM WAV
    payloads with honest metadata (the stdlib-decoder test corpus)."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "image/x-portable-pixmap",
                         bytearray(synthetic_ppm_bytes(i)), 8, 6, None))
        else:
            rows.append((i, "audio/wav",
                         bytearray(synthetic_wav_bytes(i)), None, None,
                         400 * 1000 // 8000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame,
    decoder: str = "fake",
    batch_rows: int = 256,
) -> DataFrame:
    """binary payloads → feature vectors via Arrow-batched mapInPandas.

    ``decoder='stdlib'`` really decodes PPM/WAV payloads (pure stdlib +
    numpy — the in-container proof of the integration seam);
    ``decoder='real'`` is the PIL/librosa/ffmpeg integration point —
    not available in this container, so it raises with instructions.
    """
    if decoder not in ("fake", "stdlib", "real"):
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
            if decoder == "fake":
                feats = [_fake_features(c) for c in b["content"]]
            else:
                feats = [_stdlib_features(mt, c)
                         for c, mt in zip(b["content"], b["media_type"])]
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

    Same tier contract as :func:`extract_features`: ``decoder='real'``
    is the PIL integration point (unavailable offline) and raises with
    the batch contract; ``decoder='stdlib'`` really decodes P6 PPM
    payloads, nearest-neighbor-resamples the pixel grid, and re-encodes
    P6 (image types it cannot decode raise — a resize stage must never
    silently pass an image through); ``decoder='fake'`` emits a
    deterministic payload of exactly width×height bytes derived from
    the source bytes (md5-keyed tiling), so batch sizing, schema, and
    metadata rewrite are real and testable. Non-image rows pass through
    untouched on every tier.
    """
    if decoder not in ("fake", "stdlib", "real"):
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
                    if decoder == "stdlib":
                        if mt != "image/x-portable-pixmap":
                            raise ValueError(
                                f"stdlib resize cannot decode {mt!r} "
                                "(P6 PPM only) — use decoder='real' "
                                "with PIL for other image formats")
                        sw, sh, px = decode_ppm(c)
                        # nearest-neighbor: floor source-index mapping,
                        # integer-exact and order-independent
                        ys = (np.arange(height) * sh) // height
                        xs = (np.arange(width) * sw) // width
                        out_content.append(encode_ppm(px[ys][:, xs]))
                    else:
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


RVID_MAGIC = b"RVID"

FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, src_frame int, width int, "
    "height int, content binary, pixel_sum bigint"
)


def synthetic_rvid_bytes(seed: int, width: int = 4, height: int = 3,
                         n_frames: int = 10) -> bytes:
    """Deterministic raw-video fixture: ``RVID`` magic + struct header
    (``<HHI`` width/height/n_frames) + n_frames × w·h·3 RGB bytes with
    pixel (x,y,f,c) = (x·7 + y·11 + f·13 + c·5 + seed) mod 256 — the
    integer-exact formula the driver oracle re-derives without ever
    seeing the bytes (the PPM/WAV fixture discipline)."""
    import struct

    f, y, x, c = np.mgrid[0:n_frames, 0:height, 0:width, 0:3]
    px = ((x * 7 + y * 11 + f * 13 + c * 5 + seed) % 256) \
        .astype(np.uint8)
    return (RVID_MAGIC + struct.pack("<HHI", width, height, n_frames)
            + px.tobytes())


def decode_rvid(data: bytes) -> tuple[int, int, np.ndarray]:
    """RVID container → (width, height, frames[n,h,w,3] uint8);
    truncated or foreign payloads raise loudly."""
    import struct

    if data[:4] != RVID_MAGIC:
        raise ValueError("decode_rvid: not an RVID payload")
    w, h, n = struct.unpack("<HHI", data[4:12])
    body = np.frombuffer(data, dtype=np.uint8, offset=12)
    if body.size != n * h * w * 3:
        raise ValueError(
            f"decode_rvid: truncated payload ({body.size} bytes for "
            f"{n}×{h}×{w}×3)")
    return w, h, body.reshape(n, h, w, 3)


def synthetic_video_df(spark, n: int) -> DataFrame:
    """RVID fixture corpus with honest metadata (frame count varies
    8..12 so the even-sampling rule has real work to do)."""
    rows = []
    for i in range(n):
        nf = 8 + i % 5
        rows.append((i, "video/x-rvid",
                     bytearray(synthetic_rvid_bytes(i, n_frames=nf)),
                     4, 3, nf * 40))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    n_frames: int = 4,
    decoder: str = "stdlib",
    batch_rows: int = 64,
) -> DataFrame:
    """Evenly sample ``n_frames`` frames per video payload — the
    video-ingest step every multimodal training pipeline runs before
    per-frame feature extraction. Sampled frames re-encode as P6 PPM,
    so the output composes directly with :func:`resize_media` /
    :func:`extract_features`; ``pixel_sum`` (Σ of the frame's RGB
    bytes) rides along as the brightness-proxy metadata and the
    oracle-checkable scalar.

    Sampling rule (exact, both engines): ``src = (idx·(N−1)) div
    (k−1)`` for k > 1 — endpoints always included — and ``[0]`` for
    k = 1; videos with fewer than k frames emit every frame once
    (idx = src). Non-video rows are ignored (this is a frame
    extractor, not a passthrough — filter upstream).

    Decoder tiers as everywhere in this module: ``'stdlib'`` REALLY
    parses the RVID container (struct + numpy slicing, in-container
    proof of the seam); ``'real'`` is the pyav/ffmpeg integration
    point and raises with the batch contract; ``'fake'`` emits
    md5-derived bytes with real plumbing. Arrow-batched
    ``mapInPandas``; each batch holds ≤ ``batch_rows`` payloads so
    executor memory is bounded by payload size, not row count.
    """
    if decoder not in ("fake", "stdlib", "real"):
        raise ValueError(decoder)

    def _indices(total: int, k: int) -> list[int]:
        if total <= 0:
            return []
        if total <= k:
            return list(range(total))
        if k == 1:
            return [0]
        return [(i * (total - 1)) // (k - 1) for i in range(k)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "real":
            raise NotImplementedError(
                "real video decode (pyav/ffmpeg) is not installed in "
                "this environment; plug it in here — the batch "
                "contract is: pd.DataFrame[doc_id, media_type, "
                "content] → FRAMES_SCHEMA rows, one per sampled frame")
        for b in batches:
            out: dict = {k: [] for k in (
                "doc_id", "frame_idx", "src_frame", "width", "height",
                "content", "pixel_sum")}
            for did, mt, payload in zip(b["doc_id"], b["media_type"],
                                        b["content"]):
                if not str(mt).startswith("video/"):
                    continue
                data = bytes(payload or b"")
                if decoder == "stdlib":
                    w, h, frames = decode_rvid(data)
                    idxs = _indices(frames.shape[0], n_frames)
                    for fi, src in enumerate(idxs):
                        fr = frames[src]
                        out["doc_id"].append(did)
                        out["frame_idx"].append(fi)
                        out["src_frame"].append(src)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["content"].append(encode_ppm(fr))
                        out["pixel_sum"].append(int(fr.sum()))
                else:  # fake: plumbing-true, format-free
                    for fi, src in enumerate(_indices(n_frames,
                                                      n_frames)):
                        fake = hashlib.md5(
                            data + bytes([fi])).digest()
                        out["doc_id"].append(did)
                        out["frame_idx"].append(fi)
                        out["src_frame"].append(src)
                        out["width"].append(0)
                        out["height"].append(0)
                        out["content"].append(fake)
                        out["pixel_sum"].append(
                            int(sum(fake)))
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "content") \
        .mapInPandas(run, schema=FRAMES_SCHEMA)


def synthetic_gated_wav_bytes(seed: int, n_frames: int = 400,
                              block: int = 80,
                              framerate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM with PLANTED silence: sample i is
    the integer sawtooth ``(i·(2·seed+3)) % 20000 − 10000`` inside
    odd ``block``-sample stretches and 0 inside even ones — the
    closed form an oracle can re-derive without touching bytes."""
    import io
    import wave

    i = np.arange(n_frames)
    amp = (i * (seed * 2 + 3)) % 20000 - 10000
    x = np.where((i // block) % 2 == 1, amp, 0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


ENERGY_SCHEMA = ("doc_id bigint, frame_idx bigint, n_samples bigint, "
                 "energy bigint")


def audio_frame_energy(media: DataFrame, frame: int = 80,
                       ) -> DataFrame:
    """PCM payloads → per-frame integer energy rows ``(doc_id,
    frame_idx, n_samples, energy)`` with ``energy = Σ|sample|`` over
    each ``frame``-sample window (int64-exact; channels interleave
    into the sum — mono fixtures sidestep the ambiguity). The decode
    is the ONLY Python crossing, Arrow-batched mapInPandas over the
    binary column (the multimodal discipline: bytes never reach a
    row-Python UDF); everything downstream is Column algebra."""
    if frame < 1:
        raise ValueError(f"frame must be >= 1, got {frame}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "frame_idx": [], "n_samples": [],
                   "energy": []}
            for doc, c in zip(b["doc_id"], b["content"]):
                _, _, x = decode_wav(bytes(c))
                a = np.abs(x)
                for f0 in range(0, len(x), frame):
                    w = a[f0:f0 + frame]
                    out["doc_id"].append(doc)
                    out["frame_idx"].append(f0 // frame)
                    out["n_samples"].append(len(w))
                    out["energy"].append(int(w.sum()))
            yield pd.DataFrame(out)

    return media.select("doc_id", "content").mapInPandas(
        run, schema=ENERGY_SCHEMA)


def audio_segments(media: DataFrame, frame: int = 80,
                   threshold: int = 1) -> DataFrame:
    """Energy-threshold activity segmentation (VAD-lite): frames with
    ``energy ≥ threshold`` group into maximal consecutive runs — the
    speech/music spans a transcription or captioning stage would be
    fed, and the silence-trim for audio-token budgeting. Real
    spectral VAD (librosa/webrtcvad) plugs into the same frame table;
    the energy gate is the stdlib-provable tier (the multimodal_stdlib
    contract).

    Segmentation is the classic islands trick on the frame table:
    ``frame_idx − row_number`` is constant within a consecutive
    active run (frame_idx is unique per doc, so the order is total —
    no window-tie hazard). Returns ``(doc_id, seg_idx, start_frame,
    n_frames, energy_sum)`` with ``seg_idx`` dense per doc in start
    order; silent documents yield no rows.

    Scale shape: the frame table is corpus-duration-sized (one row
    per ~10 ms); one doc-keyed window + one groupBy ride the same
    shuffle, segment table is run-bounded. Energies are exact ints —
    the oracle re-derives them from the fixture's closed form via
    generate_series, never decoding a byte.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    from pyspark.sql.window import Window

    en = audio_frame_energy(media, frame)
    act = en.where(F.col("energy") >= int(threshold))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    isl = act.withColumn(
        "_g", F.col("frame_idx") - F.row_number().over(w))
    seg = (isl.groupBy("doc_id", "_g")
           .agg(F.min("frame_idx").alias("start_frame"),
                F.count("*").cast("long").alias("n_frames"),
                F.sum("energy").cast("long").alias("energy_sum")))
    ws = Window.partitionBy("doc_id").orderBy("start_frame")
    return seg.select(
        "doc_id",
        (F.row_number().over(ws) - 1).cast("int").alias("seg_idx"),
        F.col("start_frame").cast("long").alias("start_frame"),
        "n_frames", "energy_sum")
