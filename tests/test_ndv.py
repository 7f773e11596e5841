"""HLL distinct-count sketch lane (r5).

Per-chunk HyperLogLog registers (``column_stats.hll``, 1024 registers
over the bloom hash family — Flajolet et al., AofA'07) merge by
per-register max, so :func:`ndv_encoded` answers COUNT(DISTINCT col)
from the manifest alone. Rules under test: the estimate stays inside
the sketch's error envelope, the merge is exactly the whole-data
sketch (mergeability — the property that makes the lane valid at any
chunk count), nulls never count, and absent sketches refuse to
estimate rather than guess (the no-silent-miss rule)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from br_archive_spark.operators import encode_table, ndv_encoded
from br_archive_spark.operators.bloom import (HLL_M, hll_estimate,
                                              hll_from_hashes,
                                              hll_merge, int_hashes,
                                              string_hashes)


def test_hll_accuracy_bands():
    """Deterministic hash → deterministic estimate; every cardinality
    lands within 5% (small ranges exact via linear counting)."""
    for n in (0, 1, 7, 100, 1000, 15000, 200000):
        vals = np.arange(n, dtype=np.int64) * 7919 + 3
        est = hll_estimate(hll_from_hashes(int_hashes(vals)))
        if n <= 10:
            assert round(est) == n, (n, est)
        else:
            assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_whole():
    """Register-wise max over arbitrary splits == the whole-data
    sketch (associative + idempotent), including overlapping splits —
    the exact property the manifest merge relies on."""
    vals = np.arange(50000, dtype=np.int64)
    whole = np.asarray(hll_from_hashes(int_hashes(vals)))
    parts = [hll_from_hashes(int_hashes(vals[i::4])) for i in range(4)]
    assert (hll_merge(parts) == whole).all()
    overlapping = [hll_from_hashes(int_hashes(vals[:30000])),
                   hll_from_hashes(int_hashes(vals[20000:]))]
    assert (hll_merge(overlapping) == whole).all()


def test_hll_string_and_duplicate_hashes():
    """String lane hashes per row (duplicates included) — max makes
    duplicates harmless, so the estimate tracks DISTINCT strings."""
    strs = [f"doc-{i % 500}" for i in range(5000)]      # 500 distinct
    blob = b"".join(s.encode() for s in strs)
    offs = np.cumsum([0] + [len(s) for s in strs])
    est = hll_estimate(hll_from_hashes(
        string_hashes(np.frombuffer(blob, np.uint8), offs)))
    assert abs(est - 500) / 500 < 0.05, est


def test_ndv_encoded_matrix(spark):
    """Manifest-only NDV across lanes (int key-range, int low-card,
    string KEY column — which stores no column bloom but must still
    sketch — and a nullable int lane where nulls never count)."""
    df = spark.range(30000).select(
        F.col("id").alias("okey"),
        (F.col("id") % 211).alias("bucket"),
        F.concat(F.lit("seg"), F.col("id") % 13).alias("seg"),
        F.when(F.col("id") % 3 == 0, F.col("id") % 997).alias("sparse"))
    specs = [("okey", "int"), ("bucket", "int"), ("seg", "string"),
             ("sparse", "int")]
    enc = encode_table(df, specs=specs, mode="hash", key="seg",
                       num_parts=8, target_values=4000).cache()
    try:
        for col, exact in (("okey", 30000), ("bucket", 211),
                           ("seg", 13), ("sparse", 997)):
            est = ndv_encoded(enc, col)
            assert abs(est - exact) / exact < 0.05, (col, est, exact)
    finally:
        enc.unpersist()


def test_ndv_encoded_refuses_without_sketch(spark):
    """Float lanes carry no sketch; a stripped (pre-r5) stats schema
    and bloom=False encodes refuse with a clear error — an estimate
    that silently ignored chunks would be a wrong answer."""
    df = spark.range(2000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") / 7.0).alias("score"))
    specs = [("okey", "int"), ("doc_id", "string"),
             ("score", "float")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=2,
                       target_values=1000)
    with pytest.raises(ValueError, match="without a sketch"):
        ndv_encoded(enc, "score")
    stripped = enc.withColumn("column_stats", F.expr(
        "transform(column_stats, s -> struct(s.name, s.kind, s.codec,"
        " s.orig_bytes, s.enc_bytes, s.vmin, s.vmax, s.vsum, s.n_vals,"
        " s.null_count, s.fmin, s.fmax, s.smin, s.smax, s.bloom))"))
    with pytest.raises(ValueError, match="predates hll"):
        ndv_encoded(stripped, "okey")
    no_bloom = encode_table(df, specs=specs, mode="hash", num_parts=2,
                            target_values=1000, bloom=False)
    with pytest.raises(ValueError, match="without a sketch"):
        ndv_encoded(no_bloom, "okey")


def test_ndv_cli_agg_flag(spark, tmp_path, capsys):
    """`agg --ndv` adds the estimate next to the exact lanes."""
    import json
    from argparse import Namespace

    from br_archive_spark.cli import cmd_agg

    df = spark.range(5000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"))
    man_dir = str(tmp_path / "man")
    encode_table(df, specs=[("okey", "int"), ("doc_id", "string")],
                 mode="hash", num_parts=2,
                 target_values=2000).write.parquet(man_dir)
    args = Namespace(input=man_dir, column="okey", ndv=True,
                     master="local[2]", shuffle_partitions=4)
    assert cmd_agg(args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_values"] == 5000
    assert abs(out["ndv_est"] - 5000) / 5000 < 0.05, out


def test_hll_registers_survive_parquet(spark, tmp_path):
    """Sketches round-trip through the manifest's parquet form — the
    estimate from disk equals the in-memory one."""
    df = spark.range(12000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"))
    specs = [("okey", "int"), ("doc_id", "string")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=4,
                       target_values=3000)
    mem = ndv_encoded(enc, "okey")
    enc.write.parquet(str(tmp_path / "m"))
    disk = ndv_encoded(spark.read.parquet(str(tmp_path / "m")), "okey")
    assert mem == disk
    assert abs(mem - 12000) / 12000 < 0.05, mem


def test_hll_empty_and_allnull_chunks(spark):
    """All-null chunks contribute zero registers (exact: they hold no
    distinct values) — the estimate over a fully-null column is 0."""
    df = spark.range(1000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        F.lit(None).cast("long").alias("empty"))
    specs = [("okey", "int"), ("doc_id", "string"), ("empty", "int")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=2,
                       target_values=500)
    assert ndv_encoded(enc, "empty") == 0
    assert HLL_M == 1024


def test_verify_stats_audits_sketches(spark):
    """verify --stats cross-checks the sketch lane: a healthy
    manifest reports ndv ok per sketched column; zeroed-out registers
    (estimate 0 vs thousands exact) go red."""
    from br_archive_spark.operators.verify import verify_stats

    df = spark.range(8000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"))
    specs = [("okey", "int"), ("doc_id", "string")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=4,
                       target_values=2000)
    res = verify_stats(enc, specs=specs)
    assert res["ok"], res
    assert res["columns"]["okey"]["ndv"]["ok"]
    assert res["columns"]["doc_id"]["ndv"]["ok"]
    forged = enc.withColumn("column_stats", F.expr(
        "transform(column_stats, s -> CASE WHEN s.name = 'okey' THEN"
        " named_struct('name', s.name, 'kind', s.kind,"
        " 'codec', s.codec, 'orig_bytes', s.orig_bytes,"
        " 'enc_bytes', s.enc_bytes, 'vmin', s.vmin, 'vmax', s.vmax,"
        " 'vsum', s.vsum, 'n_vals', s.n_vals,"
        " 'null_count', s.null_count, 'fmin', s.fmin, 'fmax', s.fmax,"
        " 'smin', s.smin, 'smax', s.smax, 'bloom', s.bloom,"
        " 'hll', array_repeat(0, 1024), 'topk', s.topk,"
        " 'hist', s.hist, 'qcut', s.qcut, 'fqcut', s.fqcut)"
        " ELSE s END)"))
    res2 = verify_stats(forged, specs=specs)
    assert not res2["ok"]
    assert not res2["columns"]["okey"]["ndv"]["ok"]
    assert res2["columns"]["doc_id"]["ndv"]["ok"]


def test_mixed_schema_snapshot_upgrade(spark, tmp_path):
    """Upgrade path: a snapshot table whose seq=0 predates the hll
    lane (and seq=1 carries it) must still load, decode exactly, and
    scan — parquet fills the missing nested field with null and every
    consumer treats null as "no sketch"/"may match". ndv_encoded
    refuses (some chunks unsketched) rather than underestimating."""
    from br_archive_spark.operators import (commit_snapshot,
                                            decode_table,
                                            load_snapshot, scan_where)

    table = str(tmp_path / "tbl")
    df0 = spark.range(600).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"))
    specs = [("okey", "int"), ("doc_id", "string")]
    enc0 = encode_table(df0, specs=specs, mode="scan", key="doc_id",
                        target_values=200)
    legacy = enc0.withColumn("column_stats", F.expr(
        "transform(column_stats, s -> struct(s.name, s.kind, s.codec,"
        " s.orig_bytes, s.enc_bytes, s.vmin, s.vmax, s.vsum, s.n_vals,"
        " s.null_count, s.fmin, s.fmax, s.smin, s.smax, s.bloom))"))
    commit_snapshot(legacy, table, expected_head=None)
    df1 = spark.range(600, 900).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"))
    enc1 = encode_table(df1, specs=specs, mode="scan", key="doc_id",
                        target_values=200)
    head = load_snapshot(spark, table)
    commit_snapshot(head.unionByName(enc1, allowMissingColumns=True)
                    .drop("input_file"), table)
    man = load_snapshot(spark, table)
    dec = decode_table(man, specs=specs, with_n_tok=False)
    both = df0.unionByName(df1)
    assert dec.exceptAll(both).count() == 0
    assert both.exceptAll(dec).count() == 0
    got = scan_where(man, [("okey", 100, 700)], specs=specs,
                     with_n_tok=False)
    assert got.count() == 601
    with pytest.raises(ValueError, match="hll|sketch"):
        ndv_encoded(man, "okey")
