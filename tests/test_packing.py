"""pack_sequences / train_val_split / token_histogram (r3)."""

import pyspark.sql.functions as F
import pytest

from br_archive_spark.functions.packing import (pack_sequences,
                                                token_histogram,
                                                train_val_split)


@pytest.fixture(scope="module")
def docs(spark):
    from br_archive_spark.datagen import token_table

    return token_table(spark, 400).cache()


def test_pack_exact_stream_cut(spark):
    """Packing == concatenate in id order, cut every L: verified
    against a driver-side reference on a small table."""
    rows = [("a", [1, 2, 3]), ("b", [4]), ("c", [5, 6, 7, 8, 9]),
            ("d", [10, 11])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {r["pack_id"]: r["tokens"] for r in
           pack_sequences(df, 4, num_parts=3).collect()}
    stream = [t for _, toks in rows for t in toks]
    expect = {i: stream[i * 4:(i + 1) * 4]
              for i in range((len(stream) + 3) // 4)}
    assert out == expect


def test_pack_invariants_on_zipf_table(spark, docs):
    L = 256
    packs = pack_sequences(docs, L, num_parts=8).cache()
    n_total = docs.agg(F.sum(F.size("tokens"))).collect()[0][0]
    got_total = packs.agg(F.sum("n_tok")).collect()[0][0]
    assert got_total == n_total
    sizes = sorted(r["n_tok"] for r in packs.collect())
    # every pack is exactly L except (at most) the one tail pack
    assert all(s == L for s in sizes[1:])
    assert 0 < sizes[0] <= L
    # content: token multiset is preserved
    a = docs.select(F.explode("tokens").alias("t")).groupBy("t").count()
    b = packs.select(F.explode("tokens").alias("t")).groupBy("t").count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_deterministic_across_partitioning(spark, docs):
    p1 = {r["pack_id"]: r["tokens"] for r in
          pack_sequences(docs, 128, num_parts=2).collect()}
    p2 = {r["pack_id"]: r["tokens"] for r in
          pack_sequences(docs.repartition(13), 128,
                         num_parts=7).collect()}
    assert p1 == p2


def test_pack_long_doc_straddles(spark):
    """A doc longer than max_len splits across consecutive packs."""
    df = spark.createDataFrame(
        [("a", list(range(10)))], "doc_id string, tokens array<int>")
    out = {r["pack_id"]: r["tokens"] for r in
           pack_sequences(df, 4).collect()}
    assert out == {0: [0, 1, 2, 3], 1: [4, 5, 6, 7], 2: [8, 9]}


def test_train_val_split_deterministic_and_balanced(spark, docs):
    tagged = docs.withColumn("split", train_val_split(docs))
    counts = {r["split"]: r["count"] for r in
              tagged.groupBy("split").count().collect()}
    frac = counts.get("val", 0) / sum(counts.values())
    assert 0.02 < frac < 0.25  # ~10.2% expected at cutoff "1a"
    # pure function of the id: re-tagging agrees row for row
    again = docs.withColumn("split", train_val_split(docs))
    assert tagged.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0


def test_token_histogram_counts(spark):
    df = spark.createDataFrame(
        [("a", [1, 1, 2]), ("b", [2, 3])],
        "doc_id string, tokens array<int>")
    got = {r["token"]: r["freq"]
           for r in token_histogram(df).collect()}
    assert got == {1: 2, 2: 2, 3: 1}
    top1 = token_histogram(df, top_k=1).collect()
    assert len(top1) == 1 and top1[0]["freq"] == 2


def test_stratified_sample_deterministic_and_exact(spark):
    from br_archive_spark.functions.packing import stratified_sample

    docs = spark.range(4000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string"))
        .alias("source"))
    fr = {"s0": 1.0, "s1": 0.5, "s2": 0.1, "s3": 0.0}
    out = stratified_sample(docs, fr, strata_col="source")
    rows = out.groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in rows}
    assert got.get("s0") == 1000          # f=1 keeps everything
    assert "s3" not in got                # f=0 drops everything
    assert 400 <= got["s1"] <= 600        # ~50% of 1000
    assert 50 <= got["s2"] <= 160         # ~10% of 1000
    # deterministic: re-running yields the identical id set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs, fr, strata_col="source").collect()}
    assert a == b
    # strata absent from the dict are dropped
    extra = docs.withColumn("source", F.lit("unknown"))
    assert stratified_sample(extra, fr, strata_col="source").count() == 0


def test_stratified_sample_near_one_fraction(spark):
    """Regression: fractions just below 1.0 must keep ~everything —
    round(f*65536)==65536 must clamp to the 'g' sentinel, never emit
    a 5-hex-char cutoff that lexicographically drops ~94%."""
    from br_archive_spark.functions.packing import stratified_sample

    docs = spark.range(1000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.lit("s").alias("source"))
    out = stratified_sample(docs, {"s": 0.999995},
                            strata_col="source")
    assert out.count() >= 999
