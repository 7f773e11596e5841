"""Float codecs: F_PLAIN, F_ZSTD, F_SHUFFLE_ZSTD.

Embedding columns (``array<float>``) and flat float measures get their
own small suite. Floats resist the integer tricks (delta/FOR/dict are
useless on IEEE bit patterns), so the useful transforms are entropy
coding and *byte shuffling* — the Blosc/"SHUFFLE" filter idea, also
HDF5's shuffle filter and Parquet's BYTE_STREAM_SPLIT encoding: lay
out byte plane 0 of every value, then plane 1, ... so the
slowly-varying exponent/sign bytes become long near-constant runs that
the entropy stage squeezes. All transforms are NumPy reshape/transpose
(C speed, no per-value Python), and everything is bit-exact — floats
round-trip to identical IEEE bits, never re-quantized.

The reference has no float path (it compresses raw byte streams,
``src/io/lib_bra_io_file_chunks.c:169``); this module exists because
the columnar re-expression promises typed columns, and the 100 TB
training-data shape carries embedding vectors next to token arrays.

Stream format: params = pack_frames([dtype_char, extra]) where
dtype_char is b"f4"/b"f8"; payload is codec-specific.
"""

from __future__ import annotations

import struct

import numpy as np

from .framing import pack_frames, unpack_frames
from .intcodecs import ZSTD_AVAILABLE, zstd_compress, zstd_decompress

__all__ = ["encode_float", "decode_float", "encode_float_auto",
           "FLOAT_CODECS"]

_U64 = struct.Struct("<Q")


def _dtype_tag(values: np.ndarray) -> bytes:
    if values.dtype == np.float32:
        return b"f4"
    if values.dtype == np.float64:
        return b"f8"
    raise ValueError(f"unsupported float dtype {values.dtype}")


def _from_tag(tag: bytes) -> np.dtype:
    return np.dtype({b"f4": np.float32, b"f8": np.float64}[tag])


# ------------------------------------------------------------ F_PLAIN

def _enc_plain(values: np.ndarray) -> tuple[bytes, bytes]:
    return pack_frames([_dtype_tag(values)]), values.tobytes()


def _dec_plain(params: bytes, payload: bytes) -> np.ndarray:
    (tag,) = unpack_frames(params, 1)
    return np.frombuffer(payload, dtype=_from_tag(tag))


# ------------------------------------------------------------ F_ZSTD

def _enc_zstd(values: np.ndarray) -> tuple[bytes, bytes]:
    raw = values.tobytes()
    return pack_frames([_dtype_tag(values), _U64.pack(len(raw))]), \
        zstd_compress(raw)


def _dec_zstd(params: bytes, payload: bytes) -> np.ndarray:
    tag, size_raw = unpack_frames(params, 2)
    raw = zstd_decompress(payload, _U64.unpack(size_raw)[0])
    return np.frombuffer(raw, dtype=_from_tag(tag))


# ----------------------------------------------------- F_SHUFFLE_ZSTD

def _shuffle(values: np.ndarray) -> bytes:
    """Byte-plane transpose: all byte-0s, then all byte-1s, ..."""
    return np.ascontiguousarray(
        values.view(np.uint8).reshape(-1, values.itemsize).T).tobytes()


def _unshuffle(raw: bytes, dtype: np.dtype) -> np.ndarray:
    planes = np.frombuffer(raw, np.uint8).reshape(dtype.itemsize, -1)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dtype)


def _enc_shuffle_zstd(values: np.ndarray) -> tuple[bytes, bytes]:
    raw = _shuffle(values)
    return pack_frames([_dtype_tag(values), _U64.pack(len(raw))]), \
        zstd_compress(raw)


def _dec_shuffle_zstd(params: bytes, payload: bytes) -> np.ndarray:
    tag, size_raw = unpack_frames(params, 2)
    dtype = _from_tag(tag)
    raw = zstd_decompress(payload, _U64.unpack(size_raw)[0])
    return _unshuffle(raw, dtype)


# ------------------------------------------------------------ registry

FLOAT_CODECS = {
    "f_plain": (_enc_plain, _dec_plain),
}
if ZSTD_AVAILABLE:
    FLOAT_CODECS["f_zstd"] = (_enc_zstd, _dec_zstd)
    FLOAT_CODECS["f_shuffle_zstd"] = (_enc_shuffle_zstd, _dec_shuffle_zstd)


def encode_float(codec: str, values: np.ndarray) -> tuple[bytes, bytes]:
    enc, _ = FLOAT_CODECS[codec]
    values = np.asarray(values)
    if values.dtype.kind != "f":
        values = values.astype(np.float64)
    return enc(np.ascontiguousarray(values))


def decode_float(codec: str, params: bytes, payload: bytes) -> np.ndarray:
    _, dec = FLOAT_CODECS[codec]
    return dec(params, payload)


def encode_float_auto(values: np.ndarray,
                      codecs: tuple[str, ...] | None = None
                      ) -> tuple[str, bytes, bytes]:
    """Trial-select on a bounded prefix sample, PLAIN fallback.

    Random embeddings barely compress (mantissa bytes are noise; the
    shuffle only wins on the exponent plane, ~10-15%), so the sample
    trial cheaply picks plain when entropy coding would waste CPU.
    """
    values = np.asarray(values)
    if values.dtype.kind != "f":
        values = values.astype(np.float64)
    values = np.ascontiguousarray(values)
    if codecs is not None:
        codecs = tuple(c for c in codecs if c in FLOAT_CODECS)
    if not codecs:
        # None, or a codec list naming only int/str codecs (the shared
        # encode_column `codecs` knob): use the float defaults
        codecs = tuple(c for c in ("f_shuffle_zstd", "f_zstd")
                       if c in FLOAT_CODECS)
    n = len(values)
    if n == 0:
        p, b = encode_float("f_plain", values)
        return "f_plain", p, b
    sample = values[:min(n, 16384)]
    plain_size = sample.nbytes
    sizes = {"f_plain": plain_size}
    for c in codecs:
        if c == "f_plain":
            continue
        p, b = encode_float(c, sample)
        sizes[c] = len(p) + len(b)
    best = min(sizes, key=sizes.get)  # type: ignore[arg-type]
    params, payload = encode_float(best, values)
    if best != "f_plain" and len(params) + len(payload) >= values.nbytes:
        params, payload = encode_float("f_plain", values)
        return "f_plain", params, payload
    return best, params, payload
