"""Streaming ingestion tests: shards land → stream-encode → decoded
output equals the batch source; restarts don't duplicate."""

import shutil

import pyspark.sql.functions as F
import pytest

from br_archive_spark.datagen import token_table
from br_archive_spark.operators import decode_table
from br_archive_spark.streaming import encode_stream


@pytest.fixture()
def dirs(tmp_path):
    yield (str(tmp_path / "landing"), str(tmp_path / "enc"),
           str(tmp_path / "ckpt"))
    shutil.rmtree(tmp_path, ignore_errors=True)


def _land(spark, landing: str, lo: int, hi: int):
    # always slice the SAME deterministic 3000-doc table: token_table's
    # per-block RNG means different n values draw different sequences
    full = token_table(spark, 3000)
    (full.where((F.col("doc_id") >= f"doc-{lo:012d}")
                & (F.col("doc_id") < f"doc-{hi:012d}"))
     .write.mode("append").parquet(landing))


def test_stream_encode_drain_and_resume(spark, dirs):
    landing, out, ckpt = dirs
    _land(spark, landing, 0, 2000)

    q = encode_stream(spark, landing, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n1 = first.agg(F.sum("n_rows")).collect()[0][0]
    assert n1 == 2000

    # more shards land; a new availableNow query drains only the delta
    _land(spark, landing, 2000, 3000)
    q2 = encode_stream(spark, landing, out, ckpt)
    q2.awaitTermination(120)
    man = spark.read.parquet(out)
    assert man.agg(F.sum("n_rows")).collect()[0][0] == 3000

    # decoded stream output == full batch source, row for row
    dec = decode_table(man).select("doc_id", "tokens")
    src = token_table(spark, 3000).select("doc_id", "tokens")
    assert dec.exceptAll(src).count() == 0
    assert src.exceptAll(dec).count() == 0

    # snapshot ids identify micro-batches (lineage)
    snaps = {r["snapshot_id"] for r in
             man.select("snapshot_id").distinct().collect()}
    assert all(s.startswith("batch-") for s in snaps)
    assert len(snaps) >= 2


def test_stream_dedup_first_occurrence_across_batches(spark, dirs):
    """applyInPandasWithState seen-set: duplicates are dropped WITHIN a
    micro-batch and ACROSS micro-batches (state survives the second
    availableNow query via the checkpoint)."""
    from br_archive_spark.streaming import dedup_stream

    landing, out, ckpt = dirs

    def rows(ids_and_tokens):
        return spark.createDataFrame(
            [(f"doc-{i:06d}", toks, len(toks), "web")
             for i, toks in ids_and_tokens],
            "doc_id string, tokens array<int>, n_tok int, source string")

    # batch 1: 3 distinct contents, one duplicated in-batch
    rows([(0, [1, 2, 3]), (1, [4, 5]), (2, [1, 2, 3]),
          (3, [9])]).write.mode("append").parquet(landing)
    q = dedup_stream(spark, landing, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    toks1 = sorted(tuple(r["tokens"]) for r in first.collect())
    assert toks1 == [(1, 2, 3), (4, 5), (9,)]

    # batch 2: one replay of batch-1 content + one new content
    rows([(10, [1, 2, 3]), (11, [7, 7, 7])]) \
        .write.mode("append").parquet(landing)
    q2 = dedup_stream(spark, landing, out, ckpt)
    q2.awaitTermination(120)
    final = spark.read.parquet(out)
    toks2 = sorted(tuple(r["tokens"]) for r in final.collect())
    assert toks2 == [(1, 2, 3), (4, 5), (7, 7, 7), (9,)]
    # the replayed content kept its FIRST writer
    kept = {tuple(r["tokens"]): r["doc_id"] for r in final.collect()}
    assert kept[(1, 2, 3)] in ("doc-000000", "doc-000002")


def test_stream_changes_follows_commit_log(spark, tmp_path):
    """Streaming CDC: commits land, the log stream emits each one's
    delta-proportional change feed exactly once, restart drains only
    the NEW commits."""
    from br_archive_spark.operators import (commit_snapshot,
                                            encode_table, load_snapshot,
                                            upsert_rows)
    from br_archive_spark.streaming import stream_changes

    SPECS = [("doc_id", "string"), ("text", "string")]
    d = str(tmp_path / "tbl")
    out = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    src = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("b-"), "id").alias("text"))
    enc = encode_table(src, specs=SPECS, mode="range", key="doc_id",
                       num_parts=2, target_values=64)
    commit_snapshot(enc, d, op="encode")
    man2 = upsert_rows(
        load_snapshot(spark, d),
        spark.createDataFrame([("7", "V2"), ("900", "new")],
                              "doc_id string, text string"),
        key="doc_id", specs=SPECS, num_parts=1)
    r2 = commit_snapshot(man2, d, op="upsert")

    # the log dir legitimately holds non-row files: _claim_seq markers
    # (real ones exist from the commits above) and write_parquet_atomic
    # tmp stagings from a crashed writer — the stream's pathGlobFilter
    # must ignore both or the parquet read kills the query (ADVICE r4)
    import os as _os
    with open(_os.path.join(d, "_log",
                            "00000009-aaaa.parquet.tmp-123"), "wb") as f:
        f.write(b"not parquet")
    assert _os.path.exists(_os.path.join(d, "_log", "00000001.claim"))

    q = stream_changes(spark, d, out, ckpt, specs=SPECS)
    q.awaitTermination(120)
    feed = spark.read.parquet(out)
    got = {(r["doc_id"], r["text"], r["op"], r["seq"])
           for r in feed.collect()}
    assert got == {("7", "b-7", "del", 2), ("7", "V2", "add", 2),
                   ("900", "new", "add", 2)}

    # a third commit lands; a RESTARTED stream emits only its delta
    man3 = upsert_rows(
        load_snapshot(spark, d),
        spark.createDataFrame([("8", "V3")],
                              "doc_id string, text string"),
        key="doc_id", specs=SPECS, num_parts=1)
    commit_snapshot(man3, d, op="upsert")
    q2 = stream_changes(spark, d, out, ckpt, specs=SPECS)
    q2.awaitTermination(120)
    feed2 = spark.read.parquet(out)
    assert feed2.count() == 5
    new = {(r["doc_id"], r["text"], r["op"])
           for r in feed2.where(F.col("seq") == 3).collect()}
    assert new == {("8", "b-8", "del"), ("8", "V3", "add")}


def test_stream_changes_legacy_unpartitioned_sink(spark, tmp_path):
    """Upgrade shim (ADVICE r4): a sink written by the old
    UNPARTITIONED release holds flat parquet files with no seq=
    directories. A restarted stream must read those files' seqs once
    and skip them — not re-emit every historical commit as duplicate
    rows next to the old ones."""
    from br_archive_spark.operators import (commit_snapshot,
                                            encode_table, load_snapshot,
                                            upsert_rows)
    from br_archive_spark.streaming import stream_changes

    SPECS = [("doc_id", "string"), ("text", "string")]
    d = str(tmp_path / "tbl")
    out = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    src = spark.range(100).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("b-"), "id").alias("text"))
    enc = encode_table(src, specs=SPECS, mode="range", key="doc_id",
                       num_parts=1, target_values=64)
    commit_snapshot(enc, d, op="encode")
    man2 = upsert_rows(
        load_snapshot(spark, d),
        spark.createDataFrame([("7", "V2")],
                              "doc_id string, text string"),
        key="doc_id", specs=SPECS, num_parts=1)
    commit_snapshot(man2, d, op="upsert")

    # fake the OLD release's output for seq 2: flat files, seq a
    # plain column, directly in output_dir
    legacy = spark.createDataFrame(
        [("7", "b-7", "del", 2, "x"), ("7", "V2", "add", 2, "x")],
        "doc_id string, text string, op string, seq long, "
        "snapshot_id string")
    legacy.coalesce(1).write.mode("overwrite").parquet(out)

    man3 = upsert_rows(
        load_snapshot(spark, d),
        spark.createDataFrame([("8", "V3")],
                              "doc_id string, text string"),
        key="doc_id", specs=SPECS, num_parts=1)
    commit_snapshot(man3, d, op="upsert")

    q = stream_changes(spark, d, out, ckpt, specs=SPECS)
    q.awaitTermination(120)
    import os as _os
    new_dirs = sorted(p for p in _os.listdir(out)
                      if p.startswith("seq="))
    assert new_dirs == ["seq=3"]            # seq 2 NOT re-emitted
    new = {(r["doc_id"], r["text"], r["op"]) for r in
           spark.read.parquet(f"{out}/seq=3").collect()}
    assert new == {("8", "b-8", "del"), ("8", "V3", "add")}
