"""Truncated value-counts lane (r5) — ``column_stats.topk``.

Each chunk records its 16 most frequent lane values with EXACT counts
(count desc, value asc tie-break); :func:`topk_encoded` sums them per
value and reports a slack bound — 0 whenever no chunk fills all 16
slots, which makes the merged answer exactly ``GROUP BY col
ORDER BY count``. Rules under test: exactness in the categorical
case, honest slack in the truncated case, deterministic ordering,
nulls never counted, and absent summaries refuse rather than guess."""

import pyspark.sql.functions as F
import pytest

from br_archive_spark.operators import encode_table, topk_encoded


def _exact_top(df, col, k):
    rows = df.where(F.col(col).isNotNull()).groupBy(col).count() \
        .collect()
    return sorted(((str(r[col]), r["count"]) for r in rows),
                  key=lambda t: (-t[1], t[0]))[:k]


def test_topk_exact_categorical(spark):
    """<= 16 distinct per chunk → slack 0 and counts equal to the
    plain GROUP BY, including across a hash layout where every chunk
    sees every category."""
    df = spark.range(20000).select(
        F.col("id").alias("okey"),
        F.concat(F.lit("seg"), F.col("id") % 7).alias("seg"),
        (F.col("id") % 5).alias("code"))
    specs = [("okey", "int"), ("seg", "string"), ("code", "int")]
    enc = encode_table(df, specs=specs, mode="hash", key="seg",
                       num_parts=8, target_values=4000).cache()
    try:
        for col in ("seg", "code"):
            top, slack = topk_encoded(enc, col, k=4)
            assert slack == 0, (col, slack)
            assert top == _exact_top(df, col, 4), col
    finally:
        enc.unpersist()


def test_topk_truncated_reports_slack(spark):
    """A wide column (5000 distinct per chunk) fills all 16 slots:
    slack must be positive and every reported count must be a lower
    bound of the true count (truncation only ever drops
    occurrences)."""
    df = spark.range(20000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") * 31 % 5000).alias("wide"))
    specs = [("okey", "int"), ("doc_id", "string"), ("wide", "int")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=4,
                       target_values=5000)
    top, slack = topk_encoded(enc, "wide", k=5)
    assert slack > 0
    truth = dict(_exact_top(df, "wide", 10 ** 9))
    for v, c in top:
        assert c <= truth[str(v)], (v, c, truth[str(v)])


def test_topk_nulls_and_parquet_roundtrip(spark, tmp_path):
    """Null rows never count; the lane round-trips through the
    manifest's parquet form bit-identically."""
    df = spark.range(6000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") % 3 != 0,
               F.concat(F.lit("s"), F.col("id") % 4)).alias("cat"))
    specs = [("okey", "int"), ("doc_id", "string"), ("cat", "string")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=4,
                       target_values=2000)
    top, slack = topk_encoded(enc, "cat", k=4)
    assert slack == 0
    assert top == _exact_top(df, "cat", 4)
    enc.write.parquet(str(tmp_path / "m"))
    disk = topk_encoded(spark.read.parquet(str(tmp_path / "m")),
                        "cat", k=4)
    assert disk == (top, slack)


def test_topk_refuses_without_summary(spark):
    """Float/binary/int_list kinds carry no summary; unknown columns,
    bloom=False encodes, and pre-r5 (stripped) manifests all refuse
    with a nameable error."""
    df = spark.range(2000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        (F.col("id") / 7.0).alias("score"))
    specs = [("okey", "int"), ("doc_id", "string"),
             ("score", "float")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=2,
                       target_values=1000)
    with pytest.raises(ValueError, match="without a value-counts"):
        topk_encoded(enc, "score")
    with pytest.raises(ValueError, match="not in the manifest"):
        topk_encoded(enc, "ghost")
    stripped = enc.withColumn("column_stats", F.expr(
        "transform(column_stats, s -> struct(s.name, s.kind, s.codec,"
        " s.orig_bytes, s.enc_bytes, s.vmin, s.vmax, s.vsum, s.n_vals,"
        " s.null_count, s.fmin, s.fmax, s.smin, s.smax, s.bloom,"
        " s.hll))"))
    with pytest.raises(ValueError, match="predates topk"):
        topk_encoded(stripped, "okey")
    no_sketch = encode_table(df, specs=specs, mode="hash",
                             num_parts=2, target_values=1000,
                             bloom=False)
    with pytest.raises(ValueError, match="without a value-counts"):
        topk_encoded(no_sketch, "okey")


def test_topk_cli_agg_flag(spark, tmp_path, capsys):
    """`agg --topk N` adds the list + slack next to the exact lanes."""
    import json
    from argparse import Namespace

    from br_archive_spark.cli import cmd_agg

    df = spark.range(5000).select(
        F.col("id").alias("okey"),
        F.concat(F.lit("p"), F.col("id") % 3).alias("prio"))
    man_dir = str(tmp_path / "man")
    encode_table(df, specs=[("okey", "int"), ("prio", "string")],
                 mode="hash", key="prio", num_parts=2,
                 target_values=2000).write.parquet(man_dir)
    args = Namespace(input=man_dir, column="prio", ndv=False, topk=2,
                     master="local[2]", shuffle_partitions=4)
    assert cmd_agg(args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["topk_slack"] == 0
    assert out["topk"] == [{"v": "p0", "c": 1667},
                           {"v": "p1", "c": 1667}]


def test_stats_lanes_survive_evolve(spark):
    """drop_columns keeps the surviving columns' sketch lanes intact
    (same ndv/topk answers) and add_column builds lanes for the new
    column — the schema-evolution path must not silently shed the
    manifest-as-index."""
    from br_archive_spark.operators import (add_column, drop_columns,
                                            ndv_encoded)

    df = spark.range(6000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("s"), F.col("id") % 5).alias("cat"))
    specs = [("okey", "int"), ("doc_id", "string"),
             ("cat", "string")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=4,
                       target_values=2000)
    before = (topk_encoded(enc, "cat", k=5),
              ndv_encoded(enc, "okey"))
    vals = df.select(F.col("doc_id"),
                     (F.col("okey") % 9).alias("nine"))
    added = add_column(enc, vals, "nine", "int", key="doc_id")
    top, slack = topk_encoded(added, "nine", k=9)
    assert slack == 0
    assert top == _exact_top(df.select((F.col("okey") % 9)
                                       .alias("nine")), "nine", 9)
    dropped = drop_columns(added, ["cat"])
    assert ndv_encoded(dropped, "okey") == before[1]
    assert topk_encoded(dropped, "nine", k=9) == (top, slack)
    assert topk_encoded(enc, "cat", k=5) == before[0]


def test_verify_stats_audits_topk(spark):
    """verify --stats cross-checks the value-counts lane: slack-0
    columns must equal the decoded GROUP BY exactly; doubled counts
    go red."""
    from br_archive_spark.operators.verify import verify_stats

    df = spark.range(6000).select(
        F.col("id").alias("okey"),
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("s"), F.col("id") % 4).alias("cat"))
    specs = [("okey", "int"), ("doc_id", "string"),
             ("cat", "string")]
    enc = encode_table(df, specs=specs, mode="hash", num_parts=4,
                       target_values=2000)
    res = verify_stats(enc, specs=specs)
    assert res["ok"], res
    assert res["columns"]["cat"]["topk"]["ok"]
    assert res["columns"]["cat"]["topk"]["slack"] == 0
    forged = enc.withColumn("column_stats", F.expr(
        "transform(column_stats, s -> CASE WHEN s.name = 'cat' THEN"
        " named_struct('name', s.name, 'kind', s.kind,"
        " 'codec', s.codec, 'orig_bytes', s.orig_bytes,"
        " 'enc_bytes', s.enc_bytes, 'vmin', s.vmin, 'vmax', s.vmax,"
        " 'vsum', s.vsum, 'n_vals', s.n_vals,"
        " 'null_count', s.null_count, 'fmin', s.fmin, 'fmax', s.fmax,"
        " 'smin', s.smin, 'smax', s.smax, 'bloom', s.bloom,"
        " 'hll', s.hll, 'topk', transform(s.topk, e ->"
        " named_struct('v', e.v, 'c', e.c * CAST(2 AS BIGINT))),"
        " 'hist', s.hist, 'qcut', s.qcut, 'fqcut', s.fqcut)"
        " ELSE s END)"))
    res2 = verify_stats(forged, specs=specs)
    assert not res2["ok"]
    assert not res2["columns"]["cat"]["topk"]["ok"]
    assert res2["columns"]["okey"]["topk"]["ok"]
