"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode/feature-extraction run as Arrow-batched UDFs
over ``mapInPandas`` so payload bytes never become per-row Python
objects in the planning layer.

The actual media decode (PIL/ffmpeg/torchaudio) is NOT available in
this environment — those steps are stubbed behind
``NotImplementedError`` or a deterministic fake (env/flag selected),
but the Spark-side plumbing — schema, batch shapes, partitioning,
UDF signatures — is real and tested, so swapping in a real decoder is
a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "extract_features",
           "frame_sample", "decode_image"]

# canonical media column group: payload + typed metadata
MEDIA_SCHEMA = ("payload binary, media_type string, width int, height int, "
                "sample_rate int, duration_ms int")


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode (PIL.Image.open). Not available here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not installed in this "
        "environment; use fake_features for plumbing tests")


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
                     use_fake: bool = True) -> DataFrame:
    """payload binary → feature array<float> via Arrow-batched UDF.

    Batch shape: one pandas DataFrame per Arrow batch; payloads stay
    ``bytes`` (zero-copy from Arrow binary) and features are emitted as
    a list column — the exact pipeline a real embedder plugs into.
    """
    schema = f"{id_col} string, features array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError("real media decode unavailable")
            feats = [_fake_features(p, dim) for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col].astype(str),
                                "features": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, schema)


def frame_sample(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", every_ms: int = 1000,
                 use_fake: bool = True) -> DataFrame:
    """Video → sampled frames (one row per sampled frame).

    Fake sampler: frame count derived from payload size; real
    implementation would demux with ffmpeg per batch.
    """
    schema = f"{id_col} string, frame_idx int, frame binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake:
                raise NotImplementedError("real media decode unavailable")
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
