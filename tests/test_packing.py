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


def _brute_sample_by_tokens(rows, budgets):
    """Driver-side reference: per-stratum md5-order prefix under the
    cumulative-weight budget."""
    import hashlib

    keep = set()
    by_s = {}
    for doc_id, source, w in rows:
        by_s.setdefault(source, []).append(
            (hashlib.md5(doc_id.encode()).hexdigest(), doc_id, w))
    for s, docs in by_s.items():
        if budgets.get(s, 0) <= 0:
            continue
        acc = 0
        for _, doc_id, w in sorted(docs):
            acc += w
            if acc > budgets[s]:
                break
            keep.add(doc_id)
    return keep


def test_sample_by_tokens_matches_bruteforce(spark):
    from br_archive_spark.functions.packing import sample_by_tokens

    rows = [(str(i), f"s{i % 3}", (i * 37) % 400 + 1)
            for i in range(600)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int")
    budgets = {"s0": 9000, "s1": 2500, "s2": 70}
    got = {r["doc_id"] for r in
           sample_by_tokens(df, budgets, weight_col="n_tok").collect()}
    assert got == _brute_sample_by_tokens(rows, budgets)


def test_sample_by_tokens_budget_edges(spark):
    from br_archive_spark.functions.packing import sample_by_tokens

    rows = [(str(i), "s0" if i < 50 else "s1", 10) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int")
    # budget >= stratum total keeps the whole stratum
    out = sample_by_tokens(df, {"s0": 500}, weight_col="n_tok")
    assert out.where(F.col("source") == "s0").count() == 50
    # absent / zero-budget strata are dropped
    assert out.where(F.col("source") == "s1").count() == 0
    assert sample_by_tokens(df, {"s1": 0},
                            weight_col="n_tok").count() == 0
    # exact boundary: budget of 35 with weight-10 docs keeps exactly 3
    out3 = sample_by_tokens(df, {"s0": 35}, weight_col="n_tok")
    assert out3.count() == 3
    # original columns survive, helpers don't
    assert set(out3.columns) == {"doc_id", "source", "n_tok"}


def test_sample_by_tokens_bucket_invariant(spark):
    """Same survivors at any bucket count — the hex-prefix bucketing
    is an implementation detail, not a semantics knob."""
    from br_archive_spark.functions.packing import sample_by_tokens

    rows = [(f"d{i}", f"s{i % 2}", i % 90 + 1) for i in range(400)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int")
    budgets = {"s0": 4000, "s1": 1500}
    ref = {r["doc_id"] for r in
           sample_by_tokens(df, budgets, weight_col="n_tok",
                            num_buckets=1).collect()}
    for n in (2, 7, 32):
        got = {r["doc_id"] for r in
               sample_by_tokens(df.repartition(5), budgets,
                                weight_col="n_tok",
                                num_buckets=n).collect()}
        assert got == ref
    assert ref == _brute_sample_by_tokens(rows, budgets)


def test_sample_by_tokens_no_single_reducer(spark):
    """Plan shape: the window runs per (stratum, bucket) — no
    Exchange SinglePartition anywhere (the naive per-stratum running
    sum would put one reducer per stratum on the whole table)."""
    from br_archive_spark.functions.packing import sample_by_tokens

    df = spark.createDataFrame(
        [(str(i), "s0", 5) for i in range(50)],
        "doc_id string, source string, n_tok int")
    out = sample_by_tokens(df, {"s0": 100}, weight_col="n_tok")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


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


def test_cli_sample_budget_and_fraction(spark, tmp_path, capsys):
    """CLI `sample`: --budget keeps the md5-prefix under the token
    budget with an exact JSON report; --fraction takes the ratio path;
    --split tags train/val; mixing modes is rejected."""
    import json

    from br_archive_spark.cli import main

    rows = [(str(i), "s0" if i < 40 else "s1", 10) for i in range(80)]
    docs = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int")
    d = str(tmp_path)
    docs.write.parquet(f"{d}/docs")
    rc = main(["--master", "local[2]", "--shuffle-partitions", "4",
               "sample", f"{d}/docs", "-o", f"{d}/out",
               "--budget", "s0:200", "--budget", "s1:45",
               "--split", "split"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["per_stratum"] == {"s0": 20, "s1": 4}
    assert rep["tokens_per_stratum"] == {"s0": 200, "s1": 40}
    out = spark.read.parquet(f"{d}/out")
    assert set(out.columns) == {"doc_id", "source", "n_tok", "split"}
    assert {r["doc_id"] for r in out.collect()} == \
        _brute_sample_by_tokens(rows, {"s0": 200, "s1": 45})
    # ratio mode
    rc = main(["--master", "local[2]", "--shuffle-partitions", "4",
               "sample", f"{d}/docs", "-o", f"{d}/out2",
               "--fraction", "s0:1.0"])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["per_stratum"] == {"s0": 40}
    # exactly one mode required
    assert main(["sample", f"{d}/docs", "-o", f"{d}/out3"]) == 2
