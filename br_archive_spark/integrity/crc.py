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

* :func:`crc32c_fast` — the HOT-PATH implementation: the SAME CRC-32C
  contract at NumPy speed. The reference dispatches to SSE4.2 hardware
  CRC at runtime (``src/utils/lib_bra_crc32c.c:233-239``); with no C
  crc32c in this environment, we exploit CRC linearity instead of
  per-byte Python: reshape the buffer into R rows, run the table
  recurrence VECTORIZED ACROSS ROWS (one gather+xor+shift per byte
  COLUMN, not per byte), then tree-fold the R row CRCs with
  precomputed GF(2) zero-block shift operators (log2 R levels of 32
  masked XORs). Identical output to :func:`crc32c` on every input —
  property-tested — at a few hundred MB/s instead of ~1 MB/s.

* :func:`chunk_checksum` — multi-part incremental :func:`crc32c_fast`
  over chunk payload streams; the manifest records the algorithm tag
  (now genuinely ``crc32c``, the reference's invariant).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["crc32c", "crc32c_fast", "crc32c_combine", "chunk_checksum",
           "CHECKSUM_ALGO"]

_POLY_REFLECTED = 0x82F63B78  # CRC-32C (Castagnoli), reflected

CHECKSUM_ALGO = "crc32c"


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


# ------------------------- vectorized hot path -----------------------

_TABLE_NP = np.array(_TABLE, dtype=np.uint32)


def _make_slice_tables(k: int = 8) -> list[np.ndarray]:
    """Slice-by-N tables: T0 is the base byte table; T_{j+1}[i] =
    (T_j[i] >> 8) ^ T0[T_j[i] & 0xFF] — T_j advances a byte j
    positions earlier in the 8-byte word."""
    tabs = [list(_TABLE)]
    for _ in range(k - 1):
        prev = tabs[-1]
        tabs.append([(prev[i] >> 8) ^ _TABLE[prev[i] & 0xFF]
                     for i in range(256)])
    return [np.array(t, np.uint32) for t in tabs]


_T = _make_slice_tables(8)


_M8, _M16, _M24 = (np.uint32(8), np.uint32(16), np.uint32(24))
_MFF = np.uint32(0xFF)


def _mat_apply(mat: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Apply a GF(2) 32x32 operator (column-major uint32[32]) to a
    vector of uint32 values — 32 masked XOR passes."""
    out = np.zeros_like(v)
    for j in range(32):
        out ^= np.where((v >> np.uint32(j)) & np.uint32(1), mat[j],
                        np.uint32(0))
    return out


def _mat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """GF(2) matrix product a·b (columns of b are vectors)."""
    return _mat_apply(a, b)


@lru_cache(maxsize=64)
def _shift_pow2(k: int) -> np.ndarray:
    """Operator for appending 2^k zero BYTES (x^(8·2^k) mod P)."""
    if k == 0:
        # x^8: one zero byte — build from the x^1 seed by squaring
        op = [0] * 32
        op[0] = _POLY_REFLECTED
        row = 1
        for i in range(1, 32):
            op[i] = row
            row <<= 1
        m = np.array(op, np.uint32)
        for _ in range(3):
            m = _mat_mul(m, m)
        return m
    m = _shift_pow2(k - 1)
    return _mat_mul(m, m)


@lru_cache(maxsize=256)
def _shift_operator(nbytes: int) -> np.ndarray:
    """Operator for appending ``nbytes`` zero bytes: product of cached
    power-of-two operators over the set bits (~popcount NumPy
    matrix multiplies, ~50 µs each — arbitrary lengths stay cheap)."""
    if nbytes == 0:
        return np.array([1 << i for i in range(32)], np.uint32)
    result = None
    k = 0
    while nbytes:
        if nbytes & 1:
            p = _shift_pow2(k)
            result = p if result is None else _mat_mul(p, result)
        nbytes >>= 1
        k += 1
    return result


@lru_cache(maxsize=256)
def _shift_tables(nbytes: int) -> np.ndarray:
    """The shift operator as four 256-entry byte-group tables, so
    applying it to a vector costs 4 gathers + 3 XORs instead of 32
    masked passes (the same slice trick as the CRC tables themselves).
    Built once per distinct length, then cached."""
    mat = _shift_operator(nbytes)
    tabs = np.zeros((4, 256), np.uint32)
    for g in range(4):
        t = tabs[g]
        for j in range(8):
            t[1 << j:1 << (j + 1)] = t[:1 << j] ^ mat[8 * g + j]
    return tabs


def _apply_operator_vec(tabs: np.ndarray, v: np.ndarray) -> np.ndarray:
    return (np.take(tabs[0], v & _MFF)
            ^ np.take(tabs[1], (v >> _M8) & _MFF)
            ^ np.take(tabs[2], (v >> _M16) & _MFF)
            ^ np.take(tabs[3], v >> _M24))





def crc32c_fast(data, crc: int = 0) -> int:
    """CRC-32C, identical contract to :func:`crc32c`, NumPy-parallel.

    Row-parallel slice-by-8 (the zlib/kernel table scheme, applied
    across R rows at once: 8 table gathers per 8-byte COLUMN instead
    of per byte) + GF(2) tree fold of the row CRCs. Scalar loop only
    for sub-512-byte tails.
    """
    buf = np.frombuffer(data, np.uint8) \
        if not isinstance(data, np.ndarray) else data
    n = len(buf)
    state = np.uint32(crc ^ 0xFFFFFFFF)
    pos = 0
    while n - pos >= 512:
        remaining = n - pos
        # rows: power of 2 (clean tree fold); geometry swept — ~64-byte
        # columns maximize rows (vector width) per np call, the
        # binding constraint at small sizes
        r = 1 << min(17, max(6, (remaining // 64).bit_length() - 1))
        c8 = (remaining // r) >> 3
        if c8 == 0:
            break
        c = c8 * 8
        block = buf[pos:pos + r * c].reshape(r, c)
        # one contiguous u32 word view + one transpose copy; the column
        # loop then streams contiguous rows (strided per-column reads
        # are 3-5x slower)
        words = np.ascontiguousarray(block).view(np.uint32)
        wcols = np.ascontiguousarray(words.T)
        states = np.zeros(r, np.uint32)
        states[0] = state
        for j in range(c8):
            lo = states ^ wcols[2 * j]
            hi = wcols[2 * j + 1]
            states = (np.take(_T[7], lo & _MFF)
                      ^ np.take(_T[6], (lo >> _M8) & _MFF)
                      ^ np.take(_T[5], (lo >> _M16) & _MFF)
                      ^ np.take(_T[4], lo >> _M24)
                      ^ np.take(_T[3], hi & _MFF)
                      ^ np.take(_T[2], (hi >> _M8) & _MFF)
                      ^ np.take(_T[1], (hi >> _M16) & _MFF)
                      ^ np.take(_T[0], hi >> _M24))
        # tree fold: level k combines row pairs of length c·2^k
        length = c
        while len(states) > 1:
            tabs = _shift_tables(length)
            states = _apply_operator_vec(tabs, states[0::2]) ^ states[1::2]
            length *= 2
        state = states[0]
        pos += r * c
    # scalar tail (< 512 bytes)
    s = int(state)
    for b in buf[pos:]:
        s = _TABLE[(s ^ int(b)) & 0xFF] ^ (s >> 8)
    return (s ^ 0xFFFFFFFF) & 0xFFFFFFFF


def chunk_checksum(*parts: bytes) -> int:
    """Hot-path CRC-32C over chunk payload byte streams (incremental
    across parts) — the reference's checksum invariant
    (``src/utils/lib_bra_crc32c.c:102-114``), vectorized."""
    c = 0
    for p in parts:
        c = crc32c_fast(p, c)
    return c
