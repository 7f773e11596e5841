"""binary / float_list / double_list / float column kinds.

The reference compresses arbitrary byte streams
(``src/io/lib_bra_io_file_chunks.c:169-312``); the columnar engine
covers that data model with the ``binary`` kind, and adds bit-exact
IEEE float coverage (``codecs/floatcodecs.py``) for embedding columns.
"""

import numpy as np
import pyarrow as pa
import pytest

from br_archive_spark.codecs.floatcodecs import (FLOAT_CODECS,
                                                 decode_float,
                                                 encode_float,
                                                 encode_float_auto)
from br_archive_spark.operators.chunk import decode_column, encode_column
from br_archive_spark.operators.decode import _rebuild
from br_archive_spark.operators.encode import _extract


def _roundtrip(tbl, name, kind):
    data, validity = _extract(tbl, name, kind)
    entry = encode_column(name, kind, data, validity=validity)
    dec, dv = decode_column(entry)
    return entry, _rebuild(kind, dec, tbl.num_rows, dv)


# ------------------------------------------------------------ floats

@pytest.mark.parametrize("codec", sorted(FLOAT_CODECS))
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_float_codec_bit_exact(codec, dtype):
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(5000).astype(dtype)
    # adversarial IEEE bit patterns: NaN, +-Inf, -0.0, denormals
    vals[:6] = [np.nan, np.inf, -np.inf, -0.0, np.finfo(dtype).tiny / 2,
                np.finfo(dtype).max]
    params, payload = encode_float(codec, vals)
    out = decode_float(codec, params, payload)
    itype = np.uint32 if dtype == np.float32 else np.uint64
    assert np.array_equal(out.view(itype), vals.view(itype))


def test_float_auto_compresses_smooth_data():
    smooth = np.linspace(0, 1, 40000, dtype=np.float32)
    codec, p, b = encode_float_auto(smooth)
    assert len(p) + len(b) < smooth.nbytes / 2
    out = decode_float(codec, p, b)
    assert np.array_equal(out.view(np.uint32), smooth.view(np.uint32))


def test_float_auto_plain_fallback_never_loses():
    noise = np.random.default_rng(1).bytes(8 * 4096)
    vals = np.frombuffer(noise, np.uint64).astype(np.float64)
    vals = np.nan_to_num(vals)
    codec, p, b = encode_float_auto(vals)
    assert len(p) + len(b) <= vals.nbytes + 64


def test_float_auto_empty():
    codec, p, b = encode_float_auto(np.array([], dtype=np.float32))
    assert len(decode_float(codec, p, b)) == 0


# ----------------------------------------------------------- columns

def test_binary_roundtrip_with_nulls():
    col = pa.array([b"\x00\xff", None, b"", b"payload" * 100],
                   type=pa.binary())
    tbl = pa.table({"b": col})
    entry, out = _roundtrip(tbl, "b", "binary")
    assert entry["kind"] == "binary"
    assert out.to_pylist() == col.to_pylist()


def test_float_list_roundtrip_with_nulls():
    col = pa.array([[1.5, None, -0.0], None, [], [float("inf")]],
                   type=pa.list_(pa.float32()))
    tbl = pa.table({"e": col})
    _, out = _roundtrip(tbl, "e", "float_list")
    assert out.to_pylist() == col.to_pylist()


def test_double_list_keeps_float64_bits():
    vals = [[1.0 / 3.0, 2.0 / 3.0], [np.pi]]
    col = pa.array(vals, type=pa.list_(pa.float64()))
    tbl = pa.table({"e": col})
    _, out = _roundtrip(tbl, "e", "double_list")
    assert out.to_pylist() == col.to_pylist()  # exact, not approx


def test_flat_float_roundtrip():
    col = pa.array([1.5, None, float("nan"), -2.25], type=pa.float64())
    tbl = pa.table({"f": col})
    _, out = _roundtrip(tbl, "f", "float")
    got = out.to_pylist()
    want = col.to_pylist()
    for g, w in zip(got, want):
        assert (g is None and w is None) or g == w or (g != g and w != w)


# ------------------------------------------------------------- spark

def test_spark_embeddings_roundtrip(spark):
    from pyspark.sql import functions as F

    from br_archive_spark.operators import decode_table, encode_table

    df = spark.range(2000).select(
        F.concat(F.lit("v"), F.col("id")).alias("doc_id"),
        F.transform(F.sequence(F.lit(0), F.lit(15)),
                    lambda i: (F.sin(i + F.col("id")))
                    .cast("float")).alias("embedding"),
        F.encode(F.concat(F.lit("blob"), F.col("id")), "utf-8")
        .alias("payload"))
    specs = [("doc_id", "string"), ("embedding", "float_list"),
             ("payload", "binary")]
    enc = encode_table(df, specs=specs, num_parts=4,
                       target_values=8192)
    dec = decode_table(enc, specs=specs, with_n_tok=False)
    a = sorted(df.collect(), key=lambda r: r["doc_id"])
    b = sorted(dec.collect(), key=lambda r: r["doc_id"])
    assert a == b
