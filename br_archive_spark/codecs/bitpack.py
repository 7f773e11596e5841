"""Bit-packing kernels (NumPy-vectorized, no per-element Python).

The Spark-side analog of the reference's MSB-first Huffman bit packer
(``src/encoders/bra_huffman.c:405-428``): here codes are fixed-width, so
packing is a pure reshape problem and vectorizes exactly.

Format: values are packed MSB-first at a fixed ``width`` bits each,
concatenated, then padded with zero bits to a byte boundary — the same
padding contract the reference uses for its final Huffman byte
(``src/encoders/bra_huffman.c:420-427``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["bits_needed", "pack_uint", "unpack_uint"]


def bits_needed(max_value: int) -> int:
    """Number of bits to represent ``max_value`` (0 → 0 bits)."""
    if max_value < 0:
        raise ValueError("bits_needed expects a non-negative value")
    return int(max_value).bit_length()


def _word_bytes(width: int) -> int:
    if width <= 8:
        return 1
    if width <= 16:
        return 2
    if width <= 32:
        return 4
    return 8


def pack_uint(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width``-bit MSB-first codes.

    ``values`` must all be < 2**width. ``width == 0`` yields ``b""``
    (all values are zero by construction).
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    wb = _word_bytes(width)
    # Big-endian word view → per-value bit matrix → slice the low `width`
    # bits → packbits. All O(n) vectorized.
    words = np.ascontiguousarray(values.astype(f">u{wb}"))
    bits = np.unpackbits(words.view(np.uint8).reshape(n, wb), axis=1)
    sel = bits[:, wb * 8 - width:]
    return np.packbits(sel.reshape(-1)).tobytes()


def unpack_uint(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_uint`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    wb = _word_bytes(width)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    mat = np.zeros((n, wb * 8), dtype=np.uint8)
    mat[:, wb * 8 - width:] = bits.reshape(n, width)
    words = np.packbits(mat, axis=1).view(f">u{wb}").ravel()
    return words.astype(np.uint64)
