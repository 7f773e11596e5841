"""Resume/checkpoint tests — FIXTURES.md F4 item 4: interrupt after k of
n partitions, re-run, assert identical final table and no re-encoding of
completed partitions."""

import shutil

import pyspark.sql.functions as F
import pytest

from br_archive_spark.datagen import token_table
from br_archive_spark.operators import decode_table
from br_archive_spark.plans.lineage import (encode_with_checkpoint,
                                            lineage_report)


@pytest.fixture()
def dirs(tmp_path):
    src = str(tmp_path / "src.parquet")
    out = str(tmp_path / "enc.parquet")
    yield src, out
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_full_then_resume_noop(spark, dirs):
    src, out = dirs
    token_table(spark, 2000).write.parquet(src)
    s1 = encode_with_checkpoint(spark, src, out, snapshot_id="s1")
    assert s1["encoded_files"] == s1["total_files"] > 0
    # rerun: everything skipped, nothing re-encoded
    s2 = encode_with_checkpoint(spark, src, out, snapshot_id="s2")
    assert s2["encoded_files"] == 0
    assert s2["skipped_files"] == s1["total_files"]
    man = spark.read.parquet(out)
    assert man.where(F.col("snapshot_id") == "s2").count() == 0


def test_interrupted_run_resumes_to_identical_table(spark, dirs):
    src, out = dirs
    df = token_table(spark, 9000).cache()  # 3 input files
    df.write.parquet(src)

    # simulate an interrupted run: encode only half the input files
    all_files = sorted(spark.read.parquet(src).inputFiles())
    half = all_files[: len(all_files) // 2]
    from br_archive_spark.operators.encode import encode_table

    part = spark.read.parquet(*half)
    encode_table(part, snapshot_id="partial",
                 track_input_file=True).write.parquet(out)
    before = {r["chunk_id"]: r["checksum"] for r in
              spark.read.parquet(out)
              .select("chunk_id", "checksum").collect()}

    # resume: must encode only the missing files
    s = encode_with_checkpoint(spark, src, out, snapshot_id="resume")
    assert s["skipped_files"] == len(half)
    assert s["encoded_files"] == len(all_files) - len(half)

    # completed chunks were not re-encoded (same ids, same checksums)
    after = {r["chunk_id"]: r["checksum"] for r in
             spark.read.parquet(out)
             .select("chunk_id", "checksum").collect()}
    for cid, crc in before.items():
        assert after[cid] == crc
    # and the final decoded table equals the source exactly
    dec = decode_table(spark.read.parquet(out))
    diff = (dec.select("doc_id", "tokens")
            .exceptAll(df.select("doc_id", "tokens"))).count()
    missing = (df.select("doc_id", "tokens")
               .exceptAll(dec.select("doc_id", "tokens"))).count()
    assert diff == 0 and missing == 0
    assert dec.count() == 9000


def test_lineage_report(spark, dirs):
    src, out = dirs
    token_table(spark, 1000).write.parquet(src)
    encode_with_checkpoint(spark, src, out, snapshot_id="s1")
    rep = lineage_report(spark, out).collect()
    assert len(rep) >= 1
    assert all(r["chunks"] >= 1 and r["input_file"] for r in rep)


def test_hash_mode_rerun_refuses_instead_of_duplicating(spark, dirs):
    """mode='hash'/'range' shuffle rows across input files — per-file
    lineage does not exist, and r2's code silently re-encoded EVERYTHING
    on rerun, appending a full duplicate chunk set. Must refuse."""
    src, out = dirs
    token_table(spark, 1000).write.parquet(src)
    encode_with_checkpoint(spark, src, out, snapshot_id="s1",
                           mode="hash", num_parts=2)
    n1 = spark.read.parquet(out).count()
    with pytest.raises(ValueError, match="per-file resume"):
        encode_with_checkpoint(spark, src, out, snapshot_id="s2",
                               mode="hash", num_parts=2)
    assert spark.read.parquet(out).count() == n1  # nothing appended
