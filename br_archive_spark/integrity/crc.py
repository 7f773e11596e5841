"""Integrity checksums.

Two layers, mirroring the reference's scheme:

* :func:`crc32c` — CRC-32C (Castagnoli), reflected, init/final-xor
  0xFFFFFFFF wrapped so the public incremental init is 0 — the exact
  contract of ``bra_crc32c`` (``src/utils/lib_bra_crc32c.c:102-114``,
  table at ``:39-72``). Known-answer vectors from the reference tests:
  ``"123456789" → 0xE3069283`` (``test/test_bra_crc32c.cpp:17-19``).
  Table-driven pure Python — used for small metadata and parity tests.

* :func:`crc32c_combine` — GF(2) matrix combine of ``crc(A)`` and
  ``crc(B)`` into ``crc(A‖B)`` without re-reading A, the associative
  trick of ``bra_crc32c_combine`` (``src/utils/lib_bra_crc32c.c:181-231``)
  that lets per-chunk checksums fold into a table-level checksum as a
  distributed aggregation.

* :func:`chunk_checksum` — the HOT-PATH payload checksum. The reference
  dispatches to SSE4.2 hardware CRC at runtime
  (``src/utils/lib_bra_crc32c.c:233-239``); our equivalent of "use the
  hardware path when present" is zlib's C crc32, which is what guards
  multi-MiB chunk payloads without burning Python cycles. The manifest
  records which function produced the value via the algorithm tag.
"""

from __future__ import annotations

import zlib

__all__ = ["crc32c", "crc32c_combine", "chunk_checksum", "CHECKSUM_ALGO"]

_POLY_REFLECTED = 0x82F63B78  # CRC-32C (Castagnoli), reflected

CHECKSUM_ALGO = "crc32-zlib"


def _make_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (_POLY_REFLECTED if crc & 1 else 0)
        table.append(crc)
    return table


_TABLE = _make_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    """Incremental CRC-32C; ``crc`` is a previous public value (init 0)."""
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# --- GF(2) combine (same math as src/utils/lib_bra_crc32c.c:78-231) ---

def _gf2_matrix_times(mat: list[int], vec: int) -> int:
    s = 0
    i = 0
    while vec:
        if vec & 1:
            s ^= mat[i]
        vec >>= 1
        i += 1
    return s


def _gf2_matrix_square(square: list[int], mat: list[int]) -> None:
    for i in range(32):
        square[i] = _gf2_matrix_times(mat, mat[i])


def crc32c_combine(crc1: int, crc2: int, len2: int) -> int:
    """crc(A‖B) from crc(A)=crc1, crc(B)=crc2, len(B)=len2."""
    if len2 == 0:
        return crc1
    even = [0] * 32
    odd = [0] * 32
    odd[0] = _POLY_REFLECTED
    row = 1
    for i in range(1, 32):
        odd[i] = row
        row <<= 1
    _gf2_matrix_square(even, odd)
    _gf2_matrix_square(odd, even)
    while True:
        _gf2_matrix_square(even, odd)
        if len2 & 1:
            crc1 = _gf2_matrix_times(even, crc1)
        len2 >>= 1
        if len2 == 0:
            break
        _gf2_matrix_square(odd, even)
        if len2 & 1:
            crc1 = _gf2_matrix_times(odd, crc1)
        len2 >>= 1
        if len2 == 0:
            break
    return crc1 ^ crc2


def chunk_checksum(*parts: bytes) -> int:
    """Fast C-speed checksum over chunk payload byte streams."""
    c = 0
    for p in parts:
        c = zlib.crc32(p, c)
    return c & 0xFFFFFFFF
