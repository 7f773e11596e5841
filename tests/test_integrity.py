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
