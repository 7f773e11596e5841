"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode/feature-extraction run as Arrow-batched UDFs
over ``mapInPandas`` so payload bytes never become per-row Python
objects in the planning layer.

Decoders resolve at import time behind optional dependencies
(VERDICT r3 next-steps #5): image decode uses PIL when installed,
audio decode uses the stdlib ``wave`` module (always available — the
real audio path executes everywhere), video demux would use
PyAV/ffmpeg when installed. Where a real decoder is absent the
deterministic fake stands in (flag- or auto-selected), so the
Spark-side plumbing — schema, batch shapes, partitioning, UDF
signatures — is identical on both paths and swapping in a decoder
changes no plan shape.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "extract_features",
           "frame_sample", "resize_images", "decode_image", "decode_audio",
           "HAS_PIL", "HAS_AV"]

# canonical media column group: payload + typed metadata
MEDIA_SCHEMA = ("payload binary, media_type string, width int, height int, "
                "sample_rate int, duration_ms int")

try:  # optional image decoder
    from PIL import Image as _PILImage
    HAS_PIL = True
except ImportError:  # pragma: no cover - env-dependent
    _PILImage = None
    HAS_PIL = False

try:  # optional video demuxer
    import av as _av  # noqa: F401
    HAS_AV = True
except ImportError:
    _av = None
    HAS_AV = False


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode via PIL → ``uint8`` array ``(h, w, 3)``.

    Raises :class:`NotImplementedError` when PIL is not installed —
    callers that can degrade (``extract_features(use_fake=None)``)
    auto-select the deterministic fake instead.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL — not installed in this "
            "environment; extract_features(use_fake=None) degrades "
            "to the deterministic fake")
    img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Real audio decode for WAV payloads via the stdlib ``wave``
    module → ``(float32 mono samples in [-1, 1], sample_rate)``.

    No optional dependency: this real path executes in every
    environment. Non-WAV/compressed payloads raise ``wave.Error``
    (callers auto-degrade the same way as images).
    """
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n, width, rate, ch = (w.getnframes(), w.getsampwidth(),
                              w.getframerate(), w.getnchannels())
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {width} unsupported")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def _image_features(payload: bytes, dim: int) -> np.ndarray:
    """Decode + embed: 8×8 grayscale thumbnail → first ``dim`` pixels
    normalized to [0, 1] (a stand-in embedder with a REAL decode)."""
    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((8, 8))
    flat = np.asarray(img, dtype=np.float32).ravel() / 255.0
    reps = int(np.ceil(dim / flat.size))
    return np.tile(flat, reps)[:dim]


def _audio_features(payload: bytes, dim: int) -> np.ndarray:
    """Decode + embed: per-segment RMS energy over ``dim`` equal
    splits of the waveform (real stdlib decode)."""
    x, _rate = decode_audio(payload)
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    segs = np.array_split(x.astype(np.float64) ** 2, dim)
    return np.asarray(
        [np.sqrt(s.mean()) if s.size else 0.0 for s in segs],
        dtype=np.float32)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector: bytes → sha256 → float grid.

    Stands in for a real decode+embed so the distributed plumbing
    (batching, schema, shuffles) is testable without media libs.
    """
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * (dim * 4 // len(h) + 1))[:dim * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          media_type: str = "image") -> DataFrame:
    """Derive typed metadata columns from payload headers (fake parse:
    size-derived dims, deterministic)."""
    size = F.length(payload_col)
    return (df
            .withColumn("media_type", F.lit(media_type))
            .withColumn("width", (F.pmod(F.xxhash64(payload_col), 1920)
                                  + 32).cast("int"))
            .withColumn("height", (F.pmod(F.xxhash64(payload_col, F.lit(1)),
                                          1080) + 32).cast("int"))
            .withColumn("size_bytes", size.cast("long")))


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id", dim: int = 16,
                     use_fake: "bool | None" = True,
                     media: str = "image") -> DataFrame:
    """payload binary → feature array<float> via Arrow-batched UDF.

    Batch shape: one pandas DataFrame per Arrow batch; payloads stay
    ``bytes`` (zero-copy from Arrow binary) and features are emitted as
    a list column — the exact pipeline a real embedder plugs into.

    ``use_fake``: ``True`` forces the deterministic sha256 fake
    (plumbing tests, and the historical default), ``False`` demands
    the real decoder (raises where unavailable), ``None`` auto-selects
    — real when the decoder for ``media`` exists (``"image"`` needs
    PIL; ``"audio"``'s stdlib WAV path always exists), fake otherwise.
    The selection is a driver-side constant, so both paths compile to
    the identical mapInPandas plan.
    """
    schema = f"{id_col} string, features array<float>"
    if use_fake is None:
        use_fake = not (HAS_PIL if media == "image"
                        else media == "audio")
    if not use_fake and media == "image" and not HAS_PIL:
        raise NotImplementedError(
            "real image features require PIL (not installed); pass "
            "use_fake=None to auto-degrade")
    real = _image_features if media == "image" else _audio_features

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embed = _fake_features if use_fake else real
        for pdf in batches:
            feats = [embed(p, dim) for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col].astype(str),
                                "features": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", every_ms: int = 1000,
                 use_fake: "bool | None" = True) -> DataFrame:
    """Video → sampled frames (one row per sampled frame).

    Fake sampler: frame count derived from payload size; the real
    implementation demuxes with PyAV/ffmpeg per batch — gated on
    ``HAS_AV`` (``use_fake=None`` auto-degrades to the fake when PyAV
    is absent, ``use_fake=False`` raises).
    """
    schema = f"{id_col} string, frame_idx int, frame binary"
    if use_fake is None:
        use_fake = not HAS_AV
    if not use_fake and not HAS_AV:
        raise NotImplementedError(
            "real frame sampling requires PyAV/ffmpeg (not "
            "installed); pass use_fake=None to auto-degrade")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:  # pragma: no cover - needs PyAV
                raise NotImplementedError(
                    "PyAV demux path not implemented in this build")
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                n_frames = max(1, len(p) // 256)
                for fidx in range(min(n_frames, 8)):
                    ids.append(str(i))
                    idxs.append(fidx)
                    frames.append(p[fidx * 32:(fidx + 1) * 32])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def resize_images(df: DataFrame, width: int = 64, height: int = 64,
                  payload_col: str = "payload", id_col: str = "doc_id",
                  use_fake: "bool | None" = None) -> DataFrame:
    """Image payloads → resized image payloads — the normalization
    step a vision-training pipeline runs before feature extraction.

    Real path (PIL): decode → RGB → ``resize((width, height))`` →
    re-encode PNG. Fake path (auto-selected where PIL is absent):
    digest-expanded bytes whose length follows the same
    target-size law as a raw RGB buffer, so batch shapes, Arrow
    transfer sizes, and downstream schema behave like the real path.
    Selection is a driver-side constant — both paths compile to the
    identical mapInPandas plan. Output: (id, payload, width, height);
    resized payloads re-enter the engine through the ``binary``
    column kind like any other media payload.
    """
    schema = f"{id_col} string, payload binary, width int, height int"
    if use_fake is None:
        use_fake = not HAS_PIL
    if not use_fake and not HAS_PIL:
        raise NotImplementedError(
            "real image resize requires PIL (not installed); pass "
            "use_fake=None to auto-degrade")

    n_fake = max(16, width * height * 3 // 64)

    def _fake_resize(p: bytes) -> bytes:
        d = hashlib.sha256(p).digest()
        return (d * (n_fake // len(d) + 1))[:n_fake]

    def _real_resize(p: bytes) -> bytes:  # pragma: no cover - needs PIL
        img = (_PILImage.open(io.BytesIO(p)).convert("RGB")
               .resize((width, height)))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        do = _fake_resize if use_fake else _real_resize
        for pdf in batches:
            yield pd.DataFrame({id_col: pdf[id_col].astype(str),
                                "payload": [do(p)
                                            for p in pdf[payload_col]],
                                "width": width, "height": height})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)
