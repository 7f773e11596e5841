"""Codec unit tests — golden vectors + property round-trips.

Transposes the reference's per-encoder golden tests
(``test/test_bra_encoders.cpp``: RLE control bytes :23-114, BWT :134-150,
MTF :152-170, Huffman :262-365, and the stacked round-trips :172-402)
onto the new codec suite per FIXTURES.md F2.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from br_archive_spark.codecs import (INT_CODECS, STR_CODECS, bits_needed,
                                     decode_int, decode_str, encode_int,
                                     encode_int_auto, encode_str,
                                     encode_str_auto, pack_uint, unpack_uint)
from br_archive_spark.codecs.intcodecs import _runs


# ---------------------------------------------------------------- bitpack

@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63])
def test_bitpack_roundtrip_widths(width):
    rng = np.random.default_rng(42 + width)
    hi = (1 << width) if width else 1
    v = rng.integers(0, hi, 1000, dtype=np.uint64)
    assert np.array_equal(unpack_uint(pack_uint(v, width), width, 1000), v)


def test_bitpack_exact_bytes():
    # 4 values at 3 bits: 101 110 011 000 → 10111001 1000_0000
    v = np.array([0b101, 0b110, 0b011, 0b000], dtype=np.uint64)
    assert pack_uint(v, 3) == bytes([0b10111001, 0b10000000])


def test_bits_needed():
    assert [bits_needed(x) for x in (0, 1, 2, 255, 256, 2**31 - 1)] == \
        [0, 1, 2, 8, 9, 31]


# ---------------------------------------------------------------- RLE

def test_rle_runs_reference_vectors():
    # the reference's 'A'*10 golden (test_bra_encoders.cpp:35-37) as tokens
    vals, lens = _runs(np.full(10, ord("A"), dtype=np.int64))
    assert list(vals) == [ord("A")] and list(lens) == [10]
    # 'AAAAABBBCD' (test_bra_encoders.cpp:60-80)
    arr = np.array([5, 5, 5, 5, 5, 9, 9, 9, 1, 2], dtype=np.int64)
    vals, lens = _runs(arr)
    assert list(vals) == [5, 9, 1, 2]
    assert list(lens) == [5, 3, 1, 1]


def test_rle_worstcase_encode_even_if_bigger():
    # all-distinct input still encodes & round-trips
    # (reference contract test_bra_encoders.cpp:92-114)
    arr = np.arange(1, 9, dtype=np.int64)
    p, b = encode_int("rle", arr)
    assert np.array_equal(decode_int("rle", p, b), arr)
    # ...but the cost model must not pick RLE for it
    codec, p, b = encode_int_auto(arr)
    assert codec != "rle"


def test_rle_long_runs_no_cap():
    # runs longer than the reference's 128 cap (BRA_RLE_MAX_RUNS)
    arr = np.repeat([3, 4], [1000, 2000]).astype(np.int64)
    p, b = encode_int("rle", arr)
    assert np.array_equal(decode_int("rle", p, b), arr)
    assert len(p) + len(b) < 64


# ---------------------------------------------------------------- codecs

CASES = {
    "zipf": lambda rng: (rng.zipf(1.3, 20000) % 50000),
    "runs": lambda rng: np.repeat(rng.integers(0, 100, 200),
                                  rng.integers(1, 300, 200)),
    "lowcard_17": lambda rng: rng.integers(0, 17, 10000),
    "for_narrow": lambda rng: rng.integers(1_000_000, 1_000_256, 10000),
    "sorted": lambda rng: np.sort(rng.integers(0, 2**31 - 1, 10000)),
    "negatives": lambda rng: rng.integers(-(2**31), 2**31 - 1, 5000),
    "bitpack_edges": lambda rng: np.array(
        [0, 1, 127, 128, 255, 256, 511, 2**31 - 1, 0]),
    "empty": lambda rng: np.array([], dtype=np.int64),
    "single": lambda rng: np.array([7]),
    "all_same": lambda rng: np.full(5000, 42),
}


@pytest.mark.parametrize("case", list(CASES))
@pytest.mark.parametrize("codec", list(INT_CODECS))
def test_int_codec_roundtrip(case, codec):
    v = CASES[case](np.random.default_rng(42)).astype(np.int64)
    p, b = encode_int(codec, v)
    assert np.array_equal(decode_int(codec, p, b), v)


@pytest.mark.parametrize("case", list(CASES))
def test_int_auto_roundtrip_and_never_loses_to_plain(case):
    v = CASES[case](np.random.default_rng(42)).astype(np.int64)
    codec, p, b = encode_int_auto(v)
    assert np.array_equal(decode_int(codec, p, b), v)
    # cost-model invariant: chosen encoding never exceeds PLAIN
    # (reference src/io/lib_bra_io_file_chunks.c:268-297)
    pp, pb = encode_int("plain", v)
    assert len(p) + len(b) <= max(len(pp) + len(pb), 5)


def test_auto_selection_sensible():
    rng = np.random.default_rng(42)
    # run-heavy data: the winner must be at least as small as RLE (the
    # codec name is not pinned — zstd on run bytes can legitimately edge
    # out structural RLE by a few bytes)
    runs = np.repeat(rng.integers(0, 50, 100), 500).astype(np.int64)
    codec, p, b = encode_int_auto(runs)
    rp, rb = encode_int("rle", runs)
    assert len(p) + len(b) <= len(rp) + len(rb)
    # ...and with the entropy family excluded, run-heavy → rle exactly
    assert encode_int_auto(
        runs, codecs=("rle", "for", "dict", "delta"))[0] == "rle"
    # on sorted data the winner must be at least as small as DELTA
    sorted_ids = np.arange(0, 10_000_000, 997, dtype=np.int64)
    codec, p, b = encode_int_auto(sorted_ids)
    dp, db = encode_int("delta", sorted_ids)
    assert len(p) + len(b) <= len(dp) + len(db)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), max_size=300))
def test_int_auto_property(xs):
    v = np.array(xs, dtype=np.int64)
    codec, p, b = encode_int_auto(v)
    assert np.array_equal(decode_int(codec, p, b), v)


I64MIN, I64MAX = -(2 ** 63), 2 ** 63 - 1


@pytest.mark.parametrize("xs", [
    [I64MIN, I64MAX],          # full-span diff wraps to -1 in int64
    [I64MIN, 0, 0],            # r4 fuzz crash: |diff| = |INT64_MIN| < 0
    [I64MAX, I64MIN],          # descending full-span
    [I64MIN, I64MAX, I64MIN, 0, I64MAX],
    [I64MIN] * 7,              # runs of the extreme value
    [I64MIN + k for k in range(9)],   # sorted at the bottom edge
])
def test_int_auto_int64_extremes(xs):
    """Regression for the r4 INT64_MIN cost-model crash: np.diff of
    full-range int64 wraps and two's-complement np.abs(INT64_MIN) stays
    negative, so the old dmax/ddmax stats fed bits_needed a negative
    and encode crashed on legal input. Stats now live in the zigzag
    (uint64) domain (codecs/cost.py); selection must succeed and the
    chosen codec must round-trip exactly."""
    v = np.array(xs, dtype=np.int64)
    codec, p, b = encode_int_auto(v)
    assert np.array_equal(decode_int(codec, p, b).astype(np.int64), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(I64MIN, I64MAX), max_size=300))
def test_int_auto_property_full_range(xs):
    """Full int64 domain through auto-selection (the r4 property only
    exercised +/-2^31)."""
    v = np.array(xs, dtype=np.int64)
    codec, p, b = encode_int_auto(v)
    assert np.array_equal(decode_int(codec, p, b).astype(np.int64), v)


# ---------------------------------------------------------------- strings

def _str_buffers(strs):
    import pyarrow as pa

    from br_archive_spark.codecs import strings_from_arrow
    return strings_from_arrow(pa.array(strs, type=pa.string()))


STR_CASES = {
    "doc_ids": [f"doc-{i:012d}" for i in range(2000)],
    "lowcard": ["web", "books", "code", "wiki"] * 500,
    "text": ["the quick brown fox jumps over the lazy dog " * (i % 7 + 1)
             for i in range(200)],
    "empty_strings": ["", "a", "", "bb", ""],
    "unicode": ["héllo wörld ∑∫", "日本語テキスト", "emoji 🎉🎊"] * 50,
    "single": ["x"],
}


@pytest.mark.parametrize("case", list(STR_CASES))
@pytest.mark.parametrize("codec", list(STR_CODECS))
def test_str_codec_roundtrip(case, codec):
    blob, off = _str_buffers(STR_CASES[case])
    p, b = encode_str(codec, blob, off)
    blob2, off2 = decode_str(codec, p, b)
    assert blob2 == blob and np.array_equal(off2, off)


@pytest.mark.parametrize("case", list(STR_CASES))
def test_str_auto_roundtrip(case):
    blob, off = _str_buffers(STR_CASES[case])
    codec, p, b = encode_str_auto(blob, off)
    blob2, off2 = decode_str(codec, p, b)
    assert blob2 == blob and np.array_equal(off2, off)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=60))
def test_str_auto_property(strs):
    blob, off = _str_buffers(strs)
    codec, p, b = encode_str_auto(blob, off)
    blob2, off2 = decode_str(codec, p, b)
    assert blob2 == blob and np.array_equal(off2, off)


# ---------------------------------------------------------------- FSST

def test_fsst_compresses_prefix_heavy():
    from br_archive_spark.codecs import fsst_decode, fsst_encode, fsst_train

    data = b"http://example.com/page/" * 400
    symbols = fsst_train(data[:16384])
    enc = fsst_encode(data, symbols)
    assert fsst_decode(enc, symbols) == data
    assert len(enc) < len(data) / 2


def test_fsst_per_string_random_access():
    """FSST stores ENCODED offsets: selected rows decode without
    touching the rest of the chunk (the paper's random-access promise,
    VERDICT r1 missing #5)."""
    import numpy as np

    from br_archive_spark.codecs.strcodecs import (_dec_fsst, _enc_fsst,
                                                   fsst_rows_from_entry)

    strs = [f"doc-prefix-{i:06d}-suffix".encode() for i in range(5000)]
    strs[17] = b""
    strs[18] = b"\xff\xffescape-bytes\xff"
    blob = b"".join(strs)
    off = np.zeros(len(strs) + 1, np.int64)
    np.cumsum([len(s) for s in strs], out=off[1:])
    p, b = _enc_fsst(blob, off)
    d_blob, d_off = _dec_fsst(p, b)
    assert d_blob == blob and np.array_equal(d_off, off)
    rows = np.array([0, 17, 18, 4999, 2500])
    got = fsst_rows_from_entry(p, b, rows)
    assert got == [strs[r] for r in rows]


def test_fsst_entry_row_access_with_nulls():
    import numpy as np
    import pyarrow as pa

    from br_archive_spark.operators.chunk import (decode_column_rows,
                                                  encode_column)
    from br_archive_spark.operators.encode import _extract

    vals = [f"alpha-prefix-shared-{i:05d}" if i % 4 else None
            for i in range(400)]
    col = pa.array(vals, type=pa.string())
    tbl = pa.table({"s": col})
    data, validity = _extract(tbl, "s", "string")
    entry = encode_column("s", "string", data, str_codecs=("fsst",),
                          validity=validity)
    assert "fsst" in entry["codec"]
    got = decode_column_rows(entry, np.array([0, 1, 3, 399]))
    assert got == [None, b"alpha-prefix-shared-00001",
                   b"alpha-prefix-shared-00003",
                   b"alpha-prefix-shared-00399"]


def test_fsst_chunk_scale_throughput():
    """Guard against regressing to the r1 per-byte Python matcher.

    Load-insensitive: the vectorized encoder is timed against an
    inline reimplementation of the r1 scalar greedy loop ON THE SAME
    MACHINE STATE — host contention slows both proportionally, so the
    ratio is stable where an absolute MB/s floor would flake (this VM
    shares hardware; load >9 observed with zero local processes)."""
    import time

    import numpy as np

    from br_archive_spark.codecs.strcodecs import (fsst_decode_strings,
                                                   fsst_encode_strings,
                                                   fsst_train)

    # doc-id-shaped strings: short matches, many probe attempts — the
    # workload where the r1 scalar loop actually ran ~2 MB/s (on long-
    # match text the scalar loop is deceptively fast)
    rng = np.random.default_rng(5)
    docs = [f"doc-{s}-{i:08d}".encode()
            for i, s in zip(range(30000),
                            rng.choice(["web", "wiki", "code", "news"],
                                       30000))]
    blob = b"".join(docs)
    off = np.zeros(len(docs) + 1, np.int64)
    np.cumsum([len(s) for s in docs], out=off[1:])
    syms = fsst_train(blob[:65536])
    t0 = time.time()
    enc, eo = fsst_encode_strings(blob, off, syms)
    dt_vec = time.time() - t0
    assert len(enc) < len(blob) * 0.75
    d, do = fsst_decode_strings(enc, eo, syms)
    assert d == blob and np.array_equal(do, off)

    # the r1 per-byte matcher, verbatim shape, on a 32 KiB slice
    def scalar_encode(data: bytes) -> bytes:
        by_first: dict[int, list] = {}
        for code, sym in enumerate(syms):
            by_first.setdefault(sym[0], []).append((sym, code))
        for lst in by_first.values():
            lst.sort(key=lambda t: -len(t[0]))
        out = bytearray()
        i, n = 0, len(data)
        mv = memoryview(data)
        while i < n:
            for sym, code in by_first.get(data[i], ()):
                if mv[i:i + len(sym)] == sym:
                    out.append(code)
                    i += len(sym)
                    break
            else:
                out.append(255)
                out.append(data[i])
                i += 1
        return bytes(out)

    sl = blob[:32768]
    t0 = time.time()
    scalar_encode(sl)
    dt_scalar = time.time() - t0
    rate_vec = len(blob) / dt_vec
    rate_scalar = len(sl) / dt_scalar
    assert rate_vec > 1.5 * rate_scalar, (rate_vec, rate_scalar)


def test_fsst_ff_run_does_not_forge_sentinel_match():
    """Regression (r2 review): a window of 0xFF bytes must not match
    the sorted-key sentinel — that forged a length-8 'symbol' hit that
    skipped 8 input bytes while emitting one escape (silent data
    corruption on 0xFF-run payloads)."""
    from br_archive_spark.codecs.strcodecs import (fsst_decode_strings,
                                                   fsst_encode_strings)

    symbols = [b"abcdefgh"]
    blob = b"\xff" * 8 + b"tail"
    off = np.array([0, len(blob)], np.int64)
    enc, eo = fsst_encode_strings(blob, off, symbols)
    dec, _ = fsst_decode_strings(enc, eo, symbols)
    assert dec == blob
    for length in range(2, 9):
        syms = [bytes(range(97, 97 + length))]
        data = b"\xff" * 16 + bytes(syms[0]) * 3 + b"\xff" * 3
        off2 = np.array([0, len(data)], np.int64)
        e, eo2 = fsst_encode_strings(data, off2, syms)
        d, _ = fsst_decode_strings(e, eo2, syms)
        assert d == data, length


def test_fsst_slab_path_concatenates_exactly():
    """Chunks above the slab budget encode in bounded slabs cut on
    string boundaries; outputs must concatenate exactly (per-string
    independence) including empty strings and strings larger than a
    slab."""
    import br_archive_spark.codecs.strcodecs as S

    old = S._SLAB_BYTES
    S._SLAB_BYTES = 1000
    try:
        rng = np.random.default_rng(1)
        strs = [f"prefix-{i}-{'x' * int(rng.integers(0, 80))}".encode()
                for i in range(400)]
        strs[7] = b""
        strs[100] = b"\xff" * 20
        strs[200] = b"B" * 5000  # bigger than the slab budget
        blob = b"".join(strs)
        off = np.zeros(len(strs) + 1, np.int64)
        np.cumsum([len(s) for s in strs], out=off[1:])
        syms = S.fsst_train(blob[:4096])
        e, eo = S.fsst_encode_strings(blob, off, syms)
        d, do = S.fsst_decode_strings(e, eo, syms)
        assert d == blob and np.array_equal(do, off)
        rows = np.array([0, 7, 100, 200, 399])
        assert S.fsst_decode_rows(e, eo, syms, rows) == \
            [strs[r] for r in rows]
    finally:
        S._SLAB_BYTES = old


def test_dd_regular_stride_packs_to_header():
    """Delta-of-delta on a fixed-stride sequence: second differences
    are all zero, so the payload is empty — plain delta still pays
    bits(stride) per value."""
    v = np.arange(1_000_000, 1_000_000 + 50 * 20000, 50, dtype=np.int64)
    p, b = encode_int("dd", v)
    assert len(b) == 0 and len(p) <= 32
    assert np.array_equal(decode_int("dd", p, b), v)
    dp, db = encode_int("delta", v)
    assert len(p) + len(b) < (len(dp) + len(db)) / 100
    # the cost model prefers it on this shape
    codec, ap, ab = encode_int_auto(v)
    assert len(ap) + len(ab) <= len(p) + len(b)


def test_dd_jittered_timestamps_beats_delta():
    """Near-regular timestamps (stride 1000 ± 3): dd packs ~3 bits per
    value, delta ~10."""
    rng = np.random.default_rng(7)
    v = np.cumsum(rng.integers(997, 1004, 20000)).astype(np.int64)
    p, b = encode_int("dd", v)
    assert np.array_equal(decode_int("dd", p, b), v)
    dp, db = encode_int("delta", v)
    assert len(p) + len(b) < 0.6 * (len(dp) + len(db))


def test_dd_int64_wraparound_roundtrip():
    """Differences that wrap int64 still round-trip (two's-complement
    diff/cumsum are inverses)."""
    v = np.array([-(2**62), 2**62, -(2**62) + 5, 7, 2**63 - 1],
                 dtype=np.int64)
    p, b = encode_int("dd", v)
    assert np.array_equal(decode_int("dd", p, b), v)


def test_delta_dd_int64_extreme_span():
    """Full-span int64 arrays force zigzag widths up to 64 — the
    widest bitpack lane — and still round-trip exactly."""
    lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    for codec in ("dd", "delta"):
        for arr in ([lo, hi, -1, 0, 7], [hi, lo], [0, lo], [lo, 0, hi]):
            v = np.array(arr, dtype=np.int64)
            p, b = encode_int(codec, v)
            assert np.array_equal(decode_int(codec, p, b), v), \
                (codec, arr)
