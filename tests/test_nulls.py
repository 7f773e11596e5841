"""Null-handling round trips through the codec engine.

The reference compresses raw byte streams and has no null concept
(``src/io/lib_bra_io_file_chunks.c:169`` treats every input as opaque
bytes); the columnar re-expression must carry Arrow validity through
encode → manifest → decode bit-identically. Covers the entry-level
``nv.`` wrapper (``operators/chunk.py``): row nulls in string / int /
int_list columns, element nulls inside lists, all-null and no-null
chunks, and determinism of encoded bytes regardless of the undefined
bytes Arrow leaves under null slots.
"""

import numpy as np
import pyarrow as pa
import pytest

from br_archive_spark.operators.chunk import decode_column, encode_column
from br_archive_spark.operators.decode import _rebuild
from br_archive_spark.operators.encode import _extract


def _roundtrip(tbl, name, kind):
    data, validity = _extract(tbl, name, kind)
    entry = encode_column(name, kind, data, validity=validity)
    dec, dv = decode_column(entry)
    n = tbl.num_rows
    return entry, _rebuild(kind, dec, n, dv)


def test_string_nulls_roundtrip():
    col = pa.array(["a", None, "", "dddd", None], type=pa.string())
    tbl = pa.table({"s": col})
    entry, out = _roundtrip(tbl, "s", "string")
    assert entry["codec"].startswith("nv.")
    assert out.to_pylist() == col.to_pylist()


def test_int_nulls_roundtrip():
    col = pa.array([5, None, -3, None, 2**40], type=pa.int64())
    tbl = pa.table({"x": col})
    entry, out = _roundtrip(tbl, "x", "int")
    assert entry["codec"].startswith("nv.")
    assert out.to_pylist() == col.to_pylist()


def test_int_list_row_and_element_nulls_roundtrip():
    col = pa.array([[1, 2, None], [4], None, [], [None, None]],
                   type=pa.list_(pa.int32()))
    tbl = pa.table({"t": col})
    entry, out = _roundtrip(tbl, "t", "int_list")
    assert entry["codec"].startswith("nv.")
    assert out.to_pylist() == col.to_pylist()


def test_all_null_column_roundtrip():
    col = pa.array([None, None, None], type=pa.string())
    tbl = pa.table({"s": col})
    _, out = _roundtrip(tbl, "s", "string")
    assert out.to_pylist() == [None, None, None]


def test_no_nulls_stays_unwrapped():
    tbl = pa.table({"s": pa.array(["a", "b"]),
                    "t": pa.array([[1], [2, 3]], type=pa.list_(pa.int32())),
                    "x": pa.array([1, 2], type=pa.int64())})
    for name, kind in [("s", "string"), ("t", "int_list"), ("x", "int")]:
        entry, out = _roundtrip(tbl, name, kind)
        assert not entry["codec"].startswith("nv.")
        assert out.to_pylist() == tbl.column(name).to_pylist()


def test_null_slot_bytes_do_not_leak_into_payload():
    # two arrays, logically equal, but with different undefined bytes
    # under the null slot: build one via concat (keeps the dropped
    # value region) and one directly
    base = pa.array([[9, 9, 9], [1, 2]], type=pa.list_(pa.int32()))
    masked = base.take(pa.array([0, 1]))
    import pyarrow.compute as pc
    masked = pc.if_else(pa.array([False, True]), base,
                        pa.scalar(None, pa.list_(pa.int32())))
    direct = pa.array([None, [1, 2]], type=pa.list_(pa.int32()))
    assert masked.to_pylist() == direct.to_pylist()
    e1 = encode_column("t", "int_list",
                       *_swap(_extract(pa.table({"t": masked}), "t",
                                       "int_list")))
    e2 = encode_column("t", "int_list",
                       *_swap(_extract(pa.table({"t": direct}), "t",
                                       "int_list")))
    assert e1["payload"] == e2["payload"]
    assert e1["params"] == e2["params"]


def _swap(dv):
    data, validity = dv
    return data, None, None, None, validity


def test_spark_roundtrip_with_nulls(spark):
    from pyspark.sql import functions as F

    from br_archive_spark.operators import decode_table, encode_table

    df = spark.range(3000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 11 == 0, None).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.col("id") % 17 + 1),
                lambda x: F.when(x % 13 == 0, None)
                .otherwise(x.cast("int")))).alias("tokens"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.lit("web")).alias("source"))
    enc = encode_table(df, num_parts=4, target_values=4096)
    dec = decode_table(enc, with_n_tok=False)
    a = sorted(df.collect(), key=lambda r: r["doc_id"])
    b = sorted(dec.collect(), key=lambda r: r["doc_id"])
    assert a == b


def test_checksum_covers_validity_bitmap():
    """A flipped mask bit must fail verification like a payload byte:
    the chunk checksum covers params (where bitmaps live), not just
    payloads."""
    from br_archive_spark.integrity.crc import chunk_checksum

    tbl = pa.table({"c": pa.array([None, "x", "y"], type=pa.string())})
    data, validity = _extract(tbl, "c", "string")
    entry = encode_column("c", "string", data, validity=validity)
    good = chunk_checksum(entry["params"], entry["payload"])
    flipped = bytearray(entry["params"])
    # flip a bit inside the row-validity bitmap (first frame after the
    # 4-byte frame-length prefix)
    flipped[4] ^= 0x01
    bad = chunk_checksum(bytes(flipped), entry["payload"])
    assert good != bad
