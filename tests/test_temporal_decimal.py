"""date / timestamp / decimal(p,s) column kinds (r3).

The reference compresses arbitrary byte streams
(``src/io/lib_bra_io_file_chunks.c:169-312``); the columnar engine maps
typed temporal/decimal columns losslessly onto the int codec suite:
date32 -> days, timestamp[us] -> epoch micros, decimal(p<=18,s) ->
unscaled int64. These tests pin bit-exactness (including nulls and
sign/extreme values) and the spec-inference surface.
"""

import datetime
from decimal import Decimal

import numpy as np
import pytest

from pyspark.sql import functions as F

from br_archive_spark.operators import (decode_table, encode_table,
                                        infer_specs)
from br_archive_spark.operators.chunk import (decode_column, encode_column,
                                              decimal_ps, int_like)


def test_int_like_predicate():
    assert int_like("int") and int_like("date") and int_like("timestamp")
    assert int_like("decimal(12,2)")
    assert not int_like("string") and not int_like("float")


def test_decimal_ps_parse():
    assert decimal_ps("decimal(12,2)") == (12, 2)
    assert decimal_ps("decimal(18,0)") == (18, 0)


@pytest.mark.parametrize("kind", ["date", "timestamp", "decimal(18,4)"])
def test_chunk_int_like_roundtrip(kind):
    # extremes: negative epochs / BC-ish days / max-magnitude unscaled
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(-10**12, 10**12, 500),
        np.array([0, -1, 1, 10**17, -(10**17)])]).astype(np.int64)
    entry = encode_column("c", kind, vals)
    assert entry["kind"] == kind
    out, validity = decode_column(entry)
    assert validity is None
    np.testing.assert_array_equal(np.asarray(out, np.int64), vals)


def test_spark_roundtrip_temporal_decimal_nulls(spark):
    rows = [
        (1, datetime.date(1992, 1, 2),
         datetime.datetime(1995, 6, 7, 12, 34, 56, 789000),
         Decimal("12345.67")),
        (2, None, None, None),
        (3, datetime.date(1970, 1, 1),
         datetime.datetime(1970, 1, 1, 0, 0, 0),
         Decimal("-0.01")),
        (4, datetime.date(2049, 12, 31),
         datetime.datetime(2049, 12, 31, 23, 59, 59, 999999),
         Decimal("9999999999.99")),
    ]
    df = spark.createDataFrame(
        rows, "id long, d date, ts timestamp, p decimal(12,2)")
    specs = infer_specs(df)
    assert specs == [("id", "int"), ("d", "date"),
                     ("ts", "timestamp"), ("p", "decimal(12,2)")]
    dec = decode_table(encode_table(df, specs=specs, num_parts=2),
                       specs=specs, with_n_tok=False)
    got = sorted(dec.collect(), key=lambda r: r.id)
    assert [tuple(r) for r in got] == rows


def test_spark_roundtrip_negative_decimal_scale0(spark):
    rows = [(i, Decimal(v)) for i, v in
            enumerate([0, -1, 999999999999999999, -999999999999999999])]
    df = spark.createDataFrame(rows, "id long, p decimal(18,0)")
    specs = infer_specs(df)
    dec = decode_table(encode_table(df, specs=specs, num_parts=1),
                       specs=specs, with_n_tok=False)
    assert sorted(map(tuple, dec.collect())) == sorted(rows)


def test_decimal_precision_over_18_raises(spark):
    df = spark.createDataFrame([(Decimal("1.0"),)], "p decimal(20,2)")
    with pytest.raises(Exception, match="18"):
        encode_table(df, specs=[("p", "decimal(20,2)")],
                     num_parts=1).collect()


def test_infer_specs_rejects_unknown(spark):
    df = spark.createDataFrame([([[1]],)], "m array<array<int>>")
    with pytest.raises(ValueError, match="no codec kind"):
        infer_specs(df)


def test_infer_specs_full_orders_roundtrip(spark):
    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderdate").cast("date").alias("d"))
    specs = infer_specs(orders)
    dec = decode_table(encode_table(orders, specs=specs, num_parts=4),
                       specs=specs, with_n_tok=False)
    a = orders.orderBy("o_orderkey").collect()
    b = dec.orderBy("o_orderkey").collect()
    assert a == b


def test_bool_kind_roundtrip_with_nulls(spark):
    """bool kind (r3): 0/1 int lane, RLE-friendly; nulls carried by the
    nv. wrapper; decoded Spark type is boolean."""
    src = spark.range(1500).select(
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") % 97 == 0, None)
        .otherwise(F.col("id") % 7 < 3).alias("flag"),
        (F.col("id") % 2 == 0).alias("even"))
    specs = infer_specs(src)
    assert ("flag", "bool") in specs and ("even", "bool") in specs
    enc = encode_table(src, specs=specs, num_parts=2,
                       target_values=256)
    dec = decode_table(enc, specs=specs, with_n_tok=False)
    assert dict(dec.dtypes)["flag"] == "boolean"
    exp = sorted(tuple(r) for r in src.collect())
    got = sorted(tuple(r) for r in dec.collect())
    assert got == exp
    # a constant-ish boolean column must compress far below 1 byte/val
    st = (enc.selectExpr("explode(column_stats) s")
          .where("s.name = 'even'")
          .selectExpr("sum(s.enc_bytes) eb", "sum(s.n_vals) n")
          .first())
    assert st["eb"] / st["n"] < 0.5
