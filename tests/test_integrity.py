"""CRC32C known-answer + combine tests.

Vectors from the reference's ``test/test_bra_crc32c.cpp``:
"123456789" → 0xE3069283 (:17-19), incremental chaining (:28-30),
combine correctness (:100-135).
"""

from br_archive_spark.integrity import chunk_checksum, crc32c, crc32c_combine


def test_known_answers():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"Hello World!") == 0xFE6CF1DC
    assert crc32c(b"") == 0


def test_incremental_chaining():
    a, b = b"Hello ", b"World!"
    assert crc32c(b, crc32c(a)) == crc32c(a + b)


def test_combine():
    a, b = b"123456789", b"Hello World!"
    assert crc32c_combine(crc32c(a), crc32c(b), len(b)) == crc32c(a + b)
    assert crc32c_combine(crc32c(a), crc32c(b""), 0) == crc32c(a)


def test_combine_associative():
    parts = [b"alpha", b"beta", b"gamma-gamma", b"d"]
    crc = crc32c(parts[0])
    for p in parts[1:]:
        crc = crc32c_combine(crc, crc32c(p), len(p))
    assert crc == crc32c(b"".join(parts))


def test_chunk_checksum_multi_part():
    assert chunk_checksum(b"ab", b"cd") == chunk_checksum(b"abcd")


def test_crc32c_fast_known_answer():
    from br_archive_spark.integrity.crc import crc32c_fast

    # reference vector: test/test_bra_crc32c.cpp:17-19
    assert crc32c_fast(b"123456789") == 0xE3069283


def test_crc32c_fast_matches_scalar_property():
    """The vectorized row-parallel implementation must equal the
    table-driven scalar on arbitrary sizes (block boundaries, tails,
    empty, sub-512 scalar path)."""
    import numpy as np

    from br_archive_spark.integrity.crc import crc32c, crc32c_fast

    rng = np.random.default_rng(3)
    for n in [0, 1, 7, 511, 512, 513, 4096, 4097, 65536, 70001]:
        d = rng.bytes(n)
        assert crc32c(d) == crc32c_fast(d), n
    for _ in range(50):
        n = int(rng.integers(0, 30000))
        d = rng.bytes(n)
        assert crc32c(d) == crc32c_fast(d), n


def test_crc32c_fast_incremental_and_combine():
    import numpy as np

    from br_archive_spark.integrity.crc import (chunk_checksum,
                                                crc32c_combine,
                                                crc32c_fast)

    rng = np.random.default_rng(4)
    a, b, c = rng.bytes(10000), rng.bytes(23456), rng.bytes(77)
    assert chunk_checksum(a, b, c) == crc32c_fast(a + b + c)
    assert crc32c_fast(b, crc32c_fast(a)) == crc32c_fast(a + b)
    assert crc32c_combine(crc32c_fast(a), crc32c_fast(b), len(b)) == \
        crc32c_fast(a + b)


def test_crc32c_fast_throughput_floor():
    """Guard against regressing to per-byte Python (~1 MB/s): 4 MB must
    checksum at >= 30 MB/s even on a loaded machine."""
    import time

    import numpy as np

    from br_archive_spark.integrity.crc import crc32c_fast

    data = np.random.default_rng(5).bytes(4 << 20)
    crc32c_fast(data)  # warm operator caches
    t0 = time.time()
    crc32c_fast(data)
    assert time.time() - t0 < (4 << 20) / (30e6)


def test_table_checksum_equals_concatenated_stream_crc(spark):
    """The GF(2)-combined table checksum must equal a straight CRC-32C
    over every chunk's params+payload concatenated in chunk_id order —
    and survive manifest compaction/reordering unchanged."""
    from pyspark.sql import functions as F

    from br_archive_spark.datagen import token_table
    from br_archive_spark.integrity.crc import crc32c
    from br_archive_spark.operators import encode_table, table_checksum

    enc = encode_table(token_table(spark, 800), num_parts=4).cache()
    got = table_checksum(enc)

    rows = (enc.selectExpr("chunk_id", "columns").orderBy("chunk_id")
            .collect())
    blob = b"".join(bytes(b)
                    for r in rows for e in r["columns"]
                    for b in (e["params"], e["payload"]))
    assert got == crc32c(blob)
    # order-insensitive input, deterministic output
    assert table_checksum(enc.orderBy(F.col("chunk_id").desc())) == got
