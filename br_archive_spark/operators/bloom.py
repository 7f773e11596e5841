"""Per-chunk Bloom filters on the zone-map key column.

The reference skips entries it can prove irrelevant from metadata alone
(``src/io/lib_bra_io_file_ctx.c:596-602``); the manifest's
``key_min``/``key_max`` zone map is that proof for RANGE predicates.
Bloom sidecars extend it to MEMBERSHIP: on a hash-layout table every
partition spans the full key range, so min/max bounds only prune
*within* a partition — a probe for an ABSENT key (the common case in
incremental ingest: "which of these new ids already exist?") still
decodes one chunk per partition. The bloom answers "definitely not in
this chunk" across partitions, independent of layout.

Representation: ``key_bloom: array<long>`` in the manifest (not
binary) so the PROBE is pure Catalyst — ``element_at(bloom, word) &
mask`` bit tests compiled into the manifest scan's filter, no Python
and no payload bytes touched. Sizing: 16 bits/key, power-of-two words,
k=4 probes → ~0.24% false-positive rate per chunk (a false positive
costs one wasted chunk decode — correctness never depends on the
bloom; absent/null blooms mean "may match", the manifest's standard
degrade rule).

Hashing must be identical in the vectorized builder (NumPy, encode
UDF) and the scalar prober (driver, plain Python) — both implement the
same fold-8-byte-words + splitmix mix over the first
``_MAX_KEY`` bytes (longer keys fold their length in; blooms need
dispersion, not cryptography).
"""

from __future__ import annotations

import numpy as np

__all__ = ["build_bloom", "build_int_bloom", "probe_positions",
           "probe_positions_int", "bloom_sizes", "hash_key",
           "hash_int"]

_MASK = (1 << 64) - 1
_C1 = 0x9E3779B97F4A7C15          # splitmix64 constants
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB
_MAX_KEY = 64                     # bytes of key hashed (tail folded as len)
_BITS_PER_KEY = 16
_K = 4
_MIN_BITS, _MAX_BITS = 1 << 10, 1 << 16


def _mix_int(h: int) -> int:
    h = (h ^ (h >> 30)) * _C2 & _MASK
    h = (h ^ (h >> 27)) * _C3 & _MASK
    return h ^ (h >> 31)


def _mix_np(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(_C2)
        h ^= h >> np.uint64(27)
        h *= np.uint64(_C3)
        h ^= h >> np.uint64(31)
    return h


def hash_key(key: str | bytes) -> int:
    """Scalar (driver-side) key hash; bit-identical to the vectorized
    builder's per-row hash."""
    b = key.encode() if isinstance(key, str) else bytes(key)
    n = len(b)
    b = b[:_MAX_KEY]
    nw = (len(b) + 7) // 8                      # words THIS key folds
    b = b.ljust(nw * 8, b"\x00")
    h = (n * _C1) & _MASK
    for i in range(nw):
        w = int.from_bytes(b[8 * i:8 * i + 8], "little")
        h = _mix_int(h ^ w)
    return h


def _hash_np(blob: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized per-row hash over an Arrow-style (blob, offsets)
    string column — same function as :func:`hash_key`, no per-row
    Python. O(rows × min(maxlen, 64)) via a padded 2D gather."""
    offsets = np.asarray(offsets, dtype=np.int64)
    if isinstance(blob, (bytes, bytearray, memoryview)):
        blob = np.frombuffer(blob, np.uint8)
    else:
        blob = np.asarray(blob, dtype=np.uint8)
    lens = np.diff(offsets)
    n = len(lens)
    if n == 0:
        return np.empty(0, np.uint64)
    eff = np.minimum(lens, _MAX_KEY)
    nw = (eff + 7) // 8                        # words per key
    width = int(nw.max()) * 8 or 8             # gather only what exists
    pos = np.arange(width, dtype=np.int64)
    idx = offsets[:-1, None] + pos[None, :]
    valid = pos[None, :] < eff[:, None]
    padded = np.zeros((n, width), np.uint8)
    if len(blob):
        np.copyto(padded, blob[np.minimum(idx, len(blob) - 1)],
                  where=valid)
    words = padded.view("<u8")                 # (n, width//8)
    h = (lens.astype(np.uint64) * np.uint64(_C1))
    with np.errstate(over="ignore"):
        for j in range(words.shape[1]):
            # only keys long enough fold word j (scalar parity)
            h = np.where(nw > j, _mix_np(h ^ words[:, j]), h)
    return h


def _geometry(n_keys: int) -> tuple[int, int]:
    """(m_bits, k) sized for the chunk: 16 bits/key, power-of-two m."""
    m = 1 << max(int(n_keys * _BITS_PER_KEY - 1).bit_length(), 0)
    m = min(max(m, _MIN_BITS), _MAX_BITS)
    return m, _K


def _bloom_from_hashes(h1: np.ndarray) -> list[int]:
    """Bloom words (int64 list, power-of-two length) from per-key
    64-bit hashes. k derived positions per key via double hashing."""
    if len(h1) == 0:
        return [0] * (_MIN_BITS // 64)
    m, k = _geometry(len(h1))
    h2 = _mix_np(h1 ^ np.uint64(_C1)) | np.uint64(1)
    mm = np.uint64(m - 1)
    pos = np.empty(k * len(h1), np.int64)
    for i in range(k):
        with np.errstate(over="ignore"):
            pos[i * len(h1):(i + 1) * len(h1)] = \
                ((h1 + np.uint64(i) * h2) & mm).astype(np.int64)
    # dense bit set via boolean fancy assignment (duplicate-safe, no
    # ufunc.at scatter), then LSB-first packbits — on little-endian,
    # byte-packed bits viewed as int64 place bit (pos & 63) of word
    # (pos >> 6) exactly where the probe's `1 << (pos & 63)` looks
    bits = np.zeros(m, bool)
    bits[pos] = True
    return np.packbits(bits, bitorder="little") \
        .view(np.int64).tolist()


def build_bloom(blob, offsets) -> list[int]:
    """Bloom for one chunk's string key column (Arrow-style blob +
    offsets)."""
    return _bloom_from_hashes(_hash_np(blob, offsets))


def hash_int(v: int) -> int:
    """Scalar hash of one int64 lane value — identical to
    :func:`hash_key` over the value's 8-byte little-endian encoding
    (n=8 length fold, one word mix), so the int lane needs no second
    hash function, just a fixed-width fast path."""
    return _mix_int(((8 * _C1) & _MASK) ^ (v & _MASK))


def build_int_bloom(vals: np.ndarray) -> list[int]:
    """Bloom words for one chunk's int64 lane values (r5 — VERDICT r4
    next-steps #6: membership pruning for point lookups on int
    columns, e.g. ``o_orderkey`` under hash layouts where zone maps
    span the full key range). Hash parity with :func:`hash_int`;
    geometry sized on the DISTINCT count (duplicates add no
    information)."""
    u = np.unique(np.asarray(vals, dtype=np.int64))
    if len(u) == 0:
        return [0] * (_MIN_BITS // 64)
    with np.errstate(over="ignore"):
        h1 = _mix_np(np.uint64((8 * _C1) & _MASK) ^ u.view(np.uint64))
    return _bloom_from_hashes(h1)


def _signed(v: int) -> int:
    v &= _MASK
    return v - (1 << 64) if v >= 1 << 63 else v


def bloom_sizes() -> list[int]:
    """All bloom geometries the builder can emit (m_bits,
    power-of-two). Probe plans enumerate these with a literal CASE —
    chunks size blooms individually, and ANSI mode forbids the
    wrap-around long arithmetic that would compute positions
    per-chunk, so the wrap math stays driver-side in Python."""
    out, m = [], _MIN_BITS
    while m <= _MAX_BITS:
        out.append(m)
        m <<= 1
    return out


def _positions_from_hash(h1: int, m_bits: int) -> list[tuple[int, int]]:
    h2 = _mix_int(h1 ^ _C1) | 1
    out = []
    for i in range(_K):
        pos = (h1 + i * h2) & _MASK & (m_bits - 1)
        out.append(((pos >> 6) + 1, _signed(1 << (pos & 63))))
    return out


def probe_positions(key: str, m_bits: int) -> list[tuple[int, int]]:
    """``(word_index_1based, signed_int64_mask)`` pairs a chunk's
    bloom of geometry ``m_bits`` must ALL contain for ``key`` to
    possibly be present — int literals for Spark's
    ``element_at(key_bloom, idx) & mask != 0``."""
    return _positions_from_hash(hash_key(key), m_bits)


def probe_positions_int(v: int, m_bits: int) -> list[tuple[int, int]]:
    """Int-lane twin of :func:`probe_positions` for the per-column
    ``column_stats.bloom`` sidecar."""
    return _positions_from_hash(hash_int(int(v)), m_bits)


# --------------------------------------------------- HLL NDV sketch
#
# HyperLogLog registers (Flajolet et al., AofA'07) over the SAME
# per-distinct-value 64-bit hashes the membership blooms consume —
# the sketch is mergeable by per-register max, so a manifest-only
# distinct-count estimate needs one partial-aggregatable pass over
# ``column_stats.hll``, never a payload decode. p=10 → 1024 registers,
# ~3.25% relative standard error; registers fit uint8 but ship as
# array<int> so the Spark-side merge (posexplode + max) stays pure
# Catalyst.

HLL_P = 10
HLL_M = 1 << HLL_P


def string_hashes(blob, offsets) -> np.ndarray:
    """Per-row 64-bit hashes of a string/binary (blob, offsets)
    column — the vectorized hash the bloom builder uses, exported so
    sketch builders can share one hashing pass."""
    return _hash_np(blob, offsets)


def int_hashes(vals: np.ndarray) -> np.ndarray:
    """Per-DISTINCT-value 64-bit hashes of an int64 lane — parity
    with :func:`hash_int`."""
    u = np.unique(np.asarray(vals, dtype=np.int64))
    if len(u) == 0:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        return _mix_np(np.uint64((8 * _C1) & _MASK) ^ u.view(np.uint64))


def bloom_from_hashes(h1: np.ndarray) -> list[int]:
    """Public alias of the hash→bloom-words step, for builders that
    feed the same hashes to bloom AND sketch lanes."""
    return _bloom_from_hashes(h1)


def hll_from_hashes(h1: np.ndarray) -> list[int]:
    """1024 HLL registers from per-value 64-bit hashes (duplicates
    are harmless — max is idempotent). Register index = top ``p``
    hash bits; rank = leading zeros of the remaining 54 bits + 1
    (0-rest → 55, the standard cap)."""
    regs = np.zeros(HLL_M, np.uint8)
    if len(h1):
        h = h1.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HLL_P)) & np.uint64(_MASK)
        # bit_length via shift cascade (float log2 loses precision at
        # high bits); leading zeros = 64 - bit_length
        bl = np.zeros(len(rest), np.uint64)
        v = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s))
            bl[big] += np.uint64(s)
            v[big] >>= np.uint64(s)
        bl += (v > 0)
        rank = np.minimum(np.uint64(64) - bl + np.uint64(1),
                          np.uint64(64 - HLL_P + 1)).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return regs.tolist()


def hll_merge(reg_lists) -> np.ndarray:
    """Per-register max over chunk register lists (associative,
    commutative, idempotent — the property that makes the manifest
    lane mergeable at any scale)."""
    out = np.zeros(HLL_M, np.int64)
    for regs in reg_lists:
        np.maximum(out, np.asarray(regs, dtype=np.int64), out=out)
    return out


def hll_estimate(regs) -> float:
    """Cardinality estimate from merged registers — raw harmonic-mean
    HLL with the small-range linear-counting correction; 64-bit
    hashes make the 32-bit large-range correction unnecessary."""
    import math

    r = np.asarray(regs, dtype=np.float64)
    m = len(r)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -r))
    zeros = int(np.count_nonzero(r == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return float(est)
