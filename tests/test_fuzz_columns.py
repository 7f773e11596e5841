"""Property-based fuzz of the full column pipeline.

Hypothesis drives arbitrary columns of every kind — unicode strings,
opaque bytes (escape-byte runs included), extreme ints, adversarial
IEEE floats, nulls at row and element level, empty everything —
through ``_extract → encode_column → decode_column → _rebuild`` and
asserts Arrow-level equality with the input. This is the engine's
analog of the reference's stacked encoder round-trip tests
(``test/test_bra_encoders.cpp:172-402``), generalized from golden
vectors to generated cases.
"""

import numpy as np
import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from br_archive_spark.operators.chunk import decode_column, encode_column
from br_archive_spark.operators.decode import _rebuild
from br_archive_spark.operators.encode import _extract


def _roundtrip_equal(col: pa.Array, kind: str) -> None:
    tbl = pa.table({"c": col})
    data, validity = _extract(tbl, "c", kind)
    entry = encode_column("c", kind, data, validity=validity)
    dec, dv = decode_column(entry)
    out = _rebuild(kind, dec, tbl.num_rows, dv)
    lhs, rhs = out.to_pylist(), col.to_pylist()
    assert len(lhs) == len(rhs)
    for g, w in zip(lhs, rhs):
        if isinstance(w, float):
            assert (g == w) or (g != g and w != w)  # NaN-safe
        elif isinstance(w, list):
            assert g is not None and len(g) == len(w)
            for ge, we in zip(g, w):
                if isinstance(we, float):
                    assert (ge == we) or (ge != ge and we != we)
                else:
                    assert ge == we
        else:
            assert g == w


# deep-sweep knob: FUZZ_EXAMPLES=2000 python -m pytest tests/test_fuzz_*.py tests/test_extremes.py
import os as _os
_N = int(_os.environ.get("FUZZ_EXAMPLES", "0"))


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=40))
def test_fuzz_string_column(xs):
    _roundtrip_equal(pa.array(xs, type=pa.string()), "string")


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=30)),
                max_size=40))
def test_fuzz_binary_column(xs):
    _roundtrip_equal(pa.array(xs, type=pa.binary()), "binary")


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-(2 ** 63), 2 ** 63 - 1)),
                max_size=40))
@example(
    xs=[-9_223_372_036_854_775_808, None, None],
).via('discovered failure')
def test_fuzz_int_column(xs):
    _roundtrip_equal(pa.array(xs, type=pa.int64()), "int")


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.one_of(st.none(),
                                 st.integers(-(2 ** 31), 2 ** 31 - 1)),
                       max_size=20)),
    max_size=30))
def test_fuzz_int_list_column(xs):
    _roundtrip_equal(pa.array(xs, type=pa.list_(pa.int32())), "int_list")


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.one_of(
                  st.none(),
                  st.floats(width=32, allow_nan=True,
                            allow_infinity=True)), max_size=12)),
    max_size=25))
def test_fuzz_float_list_column(xs):
    _roundtrip_equal(pa.array(xs, type=pa.list_(pa.float32())),
                     "float_list")


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=True,
                                    allow_infinity=True)),
                max_size=40))
def test_fuzz_float_column(xs):
    _roundtrip_equal(pa.array(xs, type=pa.float64()), "float")


@settings(max_examples=max(60, _N), deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=40)),
                max_size=30))
def test_fuzz_binary_fsst_forced(xs):
    """Escape-byte-heavy binary through the forced-fsst path (the
    sentinel-forgery surface)."""
    col = pa.array(xs, type=pa.binary())
    tbl = pa.table({"c": col})
    data, validity = _extract(tbl, "c", "binary")
    entry = encode_column("c", "binary", data,
                          str_codecs=("fsst",), validity=validity)
    dec, dv = decode_column(entry)
    out = _rebuild("binary", dec, tbl.num_rows, dv)
    assert out.to_pylist() == col.to_pylist()


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=True, width=64)),
    max_size=40))
def test_fuzz_float_stats_lanes(xs):
    """Property: the recorded float zone map (fmin/fmax over non-null
    non-NaN values) and count lanes agree with the raw column for any
    adversarial IEEE mix — NaN/±Inf/-0.0/nulls/empty."""
    from br_archive_spark.operators.encode import _entry_stats

    col = pa.array(xs, type=pa.float64())
    tbl = pa.table({"c": col})
    data, validity = _extract(tbl, "c", "float")
    s = _entry_stats("float", data, validity)
    vals = [x for x in xs if x is not None]
    finite_or_inf = [x for x in vals if x == x]      # drop NaN only
    assert s["n_vals"] == len(vals)
    assert s["null_count"] == sum(1 for x in xs if x is None)
    assert s["vmin"] is None and s["vsum"] is None
    if finite_or_inf:
        assert s["fmin"] == min(finite_or_inf)
        assert s["fmax"] == max(finite_or_inf)
    else:
        assert s["fmin"] is None and s["fmax"] is None


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63),
                            max_value=2 ** 63 - 1), max_size=200))
@example([-(2 ** 63), -(2 ** 63), 2 ** 63 - 1, 0, 0, 0])
def test_fuzz_topk_int_matches_reference(xs):
    """_topk_int == the obvious Counter reference under (count desc,
    value asc) for arbitrary int64 multisets incl. the extremes —
    values serialize as decimal strings, counts stay exact."""
    from collections import Counter

    from br_archive_spark.operators.encode import _topk_int

    u, counts = np.unique(np.asarray(xs, dtype=np.int64),
                          return_counts=True)
    got = [(e["v"], e["c"]) for e in _topk_int(u, counts)]
    ref = sorted(Counter(int(x) for x in xs).items(),
                 key=lambda t: (-t[1], t[0]))[:16]
    assert got == [(str(v), c) for v, c in ref]


@settings(max_examples=max(150, _N), deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(codec="utf-8"), max_size=12), max_size=150))
@example(["", "", "a", "é", "é", "\U0010ffff"])
def test_fuzz_topk_str_matches_reference(xs):
    """String twin: Arrow's two-key sort must agree with Python's
    (count desc, value asc) — UTF-8 byte order equals codepoint
    order, so the tie-break is engine-portable."""
    from collections import Counter

    import pyarrow.compute as pc

    from br_archive_spark.operators.encode import _topk_str

    arr = pa.array(xs, type=pa.large_utf8())
    vc = pc.value_counts(arr)
    got = [(e["v"], e["c"]) for e in
           _topk_str(vc.field("values"),
                     vc.field("counts").to_numpy())]
    ref = sorted(Counter(xs).items(), key=lambda t: (-t[1], t[0]))[:16]
    assert got == ref


@settings(max_examples=max(100, _N), deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63),
                            max_value=2 ** 63 - 1), max_size=500))
@example([-(2 ** 63), 2 ** 63 - 1])
def test_fuzz_hll_small_range_accuracy(xs):
    """HLL over arbitrary int64 multisets (linear-counting regime at
    fuzz scale): the estimate never materially OVERestimates
    (<= n + max(1, 5%)), never drops below the register occupancy
    (each occupied register holds >= 1 distinct value; undershoot
    beyond that is exactly the register-collision loss, probability
    ~n^2/2m — the documented sketch error, not a defect), and
    duplicates never move it (idempotent max)."""
    from br_archive_spark.operators.bloom import (hll_estimate,
                                                  hll_from_hashes,
                                                  int_hashes)

    vals = np.asarray(xs, dtype=np.int64)
    regs = np.asarray(hll_from_hashes(int_hashes(vals)))
    occ = int(np.count_nonzero(regs))
    est = hll_estimate(regs)
    n = len(np.unique(vals))
    assert est <= n + max(1.0, 0.05 * n), (n, est)
    assert est >= occ - 1e-9, (occ, est)
    doubled = np.concatenate([vals, vals])
    est2 = hll_estimate(hll_from_hashes(int_hashes(doubled)))
    assert est2 == est


@settings(max_examples=max(200, _N), deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63),
                            max_value=2 ** 63 - 1),
                min_size=1, max_size=300),
       st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
       st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
@example([-(2 ** 63), 2 ** 63 - 1], -(2 ** 63), 2 ** 63 - 1)
@example([-(2 ** 63), 0, 0], -(2 ** 63), -(2 ** 63))
@example([2 ** 63 - 1] * 5, 0, 2 ** 63 - 1)
def test_fuzz_hist_int_bounds_bracket(xs, a, b):
    """The REAL consumer (_hist_bounds_int over a _hist_int chunk
    histogram) brackets the exact band count for arbitrary int64
    multisets and arbitrary bands — including ranges wider than
    int64 (the INT64_MIN lesson from cost.py). A full-domain band is
    exact; counts sum to len(xs)."""
    from br_archive_spark.operators.decode import _hist_bounds_int
    from br_archive_spark.operators.encode import _HIST_B, _hist_int

    lo, hi = min(a, b), max(a, b)
    hist = _hist_int(np.asarray(xs, dtype=np.int64))
    assert len(hist) == _HIST_B and sum(hist) == len(xs)
    vmin, vmax = min(xs), max(xs)
    cmin, cmax = _hist_bounds_int(hist, vmin, vmax, lo, hi)
    truth = sum(1 for x in xs if lo <= x <= hi)
    assert cmin <= truth <= cmax, (lo, hi, cmin, truth, cmax)
    full = _hist_bounds_int(hist, vmin, vmax,
                            -(2 ** 63), 2 ** 63 - 1)
    assert full == (len(xs), len(xs))


@settings(max_examples=max(200, _N), deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=64),
                min_size=1, max_size=300),
       st.floats(allow_nan=False, allow_infinity=False, width=64),
       st.floats(allow_nan=False, allow_infinity=False, width=64))
@example([0.0, -0.0, 5e-324, -5e-324], -5e-324, -0.0)
@example([-1.7976931348623157e308, 0.0, 1.7976931348623157e308],
         0.0, 1e300)
@example([0.0, 5e-324], 5e-324, 5e-324)
def test_fuzz_hist_float_bounds_bracket(xs, a, b):
    """Float twin through the real consumer (_hist_bounds_float):
    the monotone bucket-index bracket must contain the exact band
    count for arbitrary finite doubles and bands — subnormal ranges
    (where an epsilon analysis underflows) and [-DBL_MAX, DBL_MAX]
    chunks (where fmax-fmin overflows) included; -0.0 == 0.0 follows
    IEEE compare, matching the builder. Full-domain band is exact."""
    from br_archive_spark.operators.decode import _hist_bounds_float
    from br_archive_spark.operators.encode import (_HIST_B,
                                                   _hist_float)

    lo, hi = min(a, b), max(a, b)
    arr = np.asarray(xs, dtype=np.float64)
    hist = _hist_float(arr)
    assert hist is not None and len(hist) == _HIST_B
    assert sum(hist) == len(xs)
    fmin, fmax = float(arr.min()), float(arr.max())
    cmin, cmax = _hist_bounds_float(hist, fmin, fmax, lo, hi)
    truth = sum(1 for x in xs if lo <= x <= hi)
    assert cmin <= truth <= cmax, (lo, hi, cmin, truth, cmax)
    full = _hist_bounds_float(hist, fmin, fmax, fmin, fmax)
    assert full == (len(xs), len(xs))


@settings(max_examples=max(200, _N), deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63),
                            max_value=2 ** 63 - 1),
                min_size=1, max_size=300),
       st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
       st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
@example([-(2 ** 63), 2 ** 63 - 1], -(2 ** 63), 2 ** 63 - 1)
@example([5] * 100, 5, 5)
@example([0] * 99 + [2 ** 63 - 1], 1, 2 ** 63 - 1)
def test_fuzz_qcut_int_bounds_bracket(xs, a, b):
    """The equi-depth consumer (_qcut_bounds over _qcut_vals cuts)
    brackets the exact band count for arbitrary int64 multisets and
    bands — order statistics only, ties included, full-domain
    included. Also: the bracket width never exceeds ~2n/16 + 2 (the
    resolution guarantee equi-width histograms cannot make under
    skew)."""
    from br_archive_spark.operators.decode import _qcut_bounds
    from br_archive_spark.operators.encode import _qcut_vals

    lo, hi = min(a, b), max(a, b)
    cuts = _qcut_vals(np.asarray(xs, dtype=np.int64))
    n = len(xs)
    cmin, cmax = _qcut_bounds(cuts, n, lo, hi)
    truth = sum(1 for x in xs if lo <= x <= hi)
    assert cmin <= truth <= cmax, (lo, hi, cmin, truth, cmax)
    assert cmax - cmin <= 2 * (n // 16) + 2 + 2 * (n % 16 > 0), \
        (cmin, cmax, n)


@settings(max_examples=max(200, _N), deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=64),
                min_size=1, max_size=300),
       st.floats(allow_nan=False, allow_infinity=False, width=64),
       st.floats(allow_nan=False, allow_infinity=False, width=64))
@example([0.0, -0.0, 5e-324, -5e-324], -0.0, 0.0)
@example([-1.7976931348623157e308, 1.7976931348623157e308],
         0.0, 1e300)
def test_fuzz_qcut_float_bounds_bracket(xs, a, b):
    """Float twin: comparisons only, so subnormals, signed zeros, and
    full-double ranges are all exact by construction."""
    from br_archive_spark.operators.decode import _qcut_bounds
    from br_archive_spark.operators.encode import _qcut_vals

    lo, hi = min(a, b), max(a, b)
    cuts = _qcut_vals(np.asarray(xs, dtype=np.float64))
    cmin, cmax = _qcut_bounds(cuts, len(xs), lo, hi)
    truth = sum(1 for x in xs if lo <= x <= hi)
    assert cmin <= truth <= cmax, (lo, hi, cmin, truth, cmax)
