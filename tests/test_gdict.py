"""Global-dictionary layer: LUT/searchsorted mapping, fallback
contract, Spark round-trip with a job-level shared dictionary.

The gdict amortizes per-chunk dictionary metadata the way the reference
amortizes per-chunk Huffman lengths — except across the whole table
(SURVEY §2.1 E7: canonical-lengths-as-metadata, ``src/lib_bra_types.h:51-56``).
Round-trip invariant per the reference's ``AreFilesContentEquals``
(``test/test_bra.cpp:22-53``).
"""

import numpy as np
import pytest

from br_archive_spark.codecs.gdict import GlobalDict
from br_archive_spark.operators.chunk import (_decode_int_maybe_gdict,
                                              _encode_int_maybe_gdict,
                                              decode_column, encode_column)


def _zipf_dict(values: np.ndarray) -> GlobalDict:
    uniq, cnt = np.unique(values, return_counts=True)
    return GlobalDict(uniq[np.lexsort((uniq, -cnt))])


def test_gdict_rank_mapping_frequency_order():
    gd = GlobalDict(np.array([7, 3, 99], dtype=np.int64))
    ranks = gd.encode_values(np.array([99, 7, 3, 7], dtype=np.int64))
    assert list(ranks) == [2, 0, 1, 0]
    assert list(gd.decode_values(ranks)) == [99, 7, 3, 7]


def test_gdict_unseen_value_returns_none():
    gd = GlobalDict(np.array([1, 2, 3], dtype=np.int64))
    assert gd.encode_values(np.array([1, 4], dtype=np.int64)) is None
    assert gd.encode_values(np.array([-5], dtype=np.int64)) is None


def test_gdict_sparse_ids_use_searchsorted():
    # span too wide for a dense LUT → searchsorted path
    toks = np.array([0, 10**12, 5, 10**9], dtype=np.int64)
    gd = GlobalDict(toks)
    assert gd._lut is None
    v = np.array([10**9, 0, 10**12, 5, 5], dtype=np.int64)
    ranks = gd.encode_values(v)
    assert np.array_equal(gd.decode_values(ranks), v)
    assert gd.encode_values(np.array([17], dtype=np.int64)) is None


def test_gdict_stream_roundtrip_and_fallback():
    rng = np.random.default_rng(42)
    v = (rng.zipf(1.3, 100_000) % 5000).astype(np.int32)
    gd = _zipf_dict(v)
    codec, p, b = _encode_int_maybe_gdict(v, None, gd)
    assert codec.startswith("gdict.")
    assert np.array_equal(_decode_int_maybe_gdict(codec, p, b, gd),
                          v.astype(np.int64))
    # values outside the dict → self-contained fallback, decodable
    # without any dict (the reference's STORED never-worse contract)
    v2 = np.append(v, np.int32(123456))
    codec2, p2, b2 = _encode_int_maybe_gdict(v2, None, gd)
    assert not codec2.startswith("gdict.")
    assert np.array_equal(_decode_int_maybe_gdict(codec2, p2, b2, None),
                          v2.astype(np.int64))


def test_gdict_decode_errors():
    v = np.arange(1000, dtype=np.int64) % 7
    gd = _zipf_dict(v)
    codec, p, b = _encode_int_maybe_gdict(v, None, gd)
    with pytest.raises(ValueError, match="pass global_dict"):
        _decode_int_maybe_gdict(codec, p, b, None)
    with pytest.raises(ValueError, match="mismatch"):
        _decode_int_maybe_gdict(codec, p, b,
                                GlobalDict(np.arange(5, dtype=np.int64)))


def test_gdict_removes_per_chunk_dict_overhead():
    """Chunks referencing a shared dict must be smaller than chunks
    carrying their own dictionary, on dictionary-friendly data."""
    rng = np.random.default_rng(7)
    v = (rng.zipf(1.2, 400_000) % 30000).astype(np.int32)
    lens = np.full(100, len(v) // 100, dtype=np.int64)
    gd = _zipf_dict(v)
    with_gd = encode_column("tokens", "int_list", (v, lens), None, None,
                            gdict=gd)
    without = encode_column("tokens", "int_list", (v, lens),
                            ("dict_zstd", "dict_z"), None)
    assert with_gd["enc_bytes"] < without["enc_bytes"]
    (dv, dl), _ = decode_column(with_gd, gdict=gd)
    assert np.array_equal(dv, v.astype(np.int64))
    assert np.array_equal(dl, lens)


def test_gdict_save_load_roundtrip(tmp_path):
    from br_archive_spark.codecs.gdict import (load_global_dict,
                                               save_global_dict)

    gd = GlobalDict(np.array([42, 7, 9], dtype=np.int64))
    path = str(tmp_path / "gdict.parquet")
    save_global_dict(gd, path)
    gd2 = load_global_dict(path)
    assert gd2.dict_id == gd.dict_id
    assert np.array_equal(gd2.tokens_by_rank, gd.tokens_by_rank)


def test_spark_roundtrip_with_global_dict(spark, tmp_path):
    from br_archive_spark.codecs.gdict import build_global_dict
    from br_archive_spark.datagen import token_table
    from br_archive_spark.operators import decode_table, encode_table
    from br_archive_spark.operators.verify import verify_roundtrip

    src_path = str(tmp_path / "src.parquet")
    token_table(spark, 2000).write.parquet(src_path)
    src = spark.read.parquet(src_path)

    gd = build_global_dict(src, "tokens")
    assert len(gd) > 0
    enc = encode_table(src, global_dict=gd)
    enc_path = str(tmp_path / "enc.parquet")
    enc.write.parquet(enc_path)
    man = spark.read.parquet(enc_path)

    # chunks actually used the shared dict
    codecs_used = [r["codec"] for r in man.selectExpr(
        "explode(column_stats) cs").selectExpr("cs.codec codec")
        .where("cs.name = 'tokens'").collect()]
    assert codecs_used and all(c.startswith("gdict.") for c in codecs_used)

    res = verify_roundtrip(src, man, global_dict=gd)
    assert res["ok"], res

    # decode without the dict must fail loudly
    with pytest.raises(Exception, match="global"):
        decode_table(man).select("doc_id").limit(1).collect()


def test_spark_gdict_smaller_than_per_chunk(spark, tmp_path):
    """At equal content, the shared dictionary strictly shrinks total
    encoded bytes vs forcing per-chunk dictionaries."""
    from br_archive_spark.codecs.gdict import build_global_dict
    from br_archive_spark.datagen import token_table
    from br_archive_spark.operators import encode_table
    from pyspark.sql import functions as F

    src_path = str(tmp_path / "src.parquet")
    token_table(spark, 2000).write.parquet(src_path)
    src = spark.read.parquet(src_path)
    gd = build_global_dict(src, "tokens")

    def total(df):
        return df.agg(F.sum("enc_bytes")).collect()[0][0]

    with_gd = total(encode_table(src, global_dict=gd))
    without = total(encode_table(src, codecs=("dict_zstd",)))
    assert with_gd < without
