"""Corpus-cleaning operators (functions/cleaning.py): boilerplate
removal and test-set decontamination — value edges plus the plan
properties that make them 100 TB-safe."""

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from br_archive_spark.functions.cleaning import (contaminated_ids,
                                                 remove_boilerplate)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_remove_boilerplate_edges(spark):
    docs = spark.createDataFrame([
        ("1", "HEADER\nunique one\nFOOTER", "a"),
        ("2", "HEADER\nunique two\nFOOTER", "a"),
        ("3", "HEADER\nFOOTER", "b"),          # all boilerplate
        ("4", "standalone document", "b"),     # untouched
        ("5", "", "b"),                        # empty in, empty out
    ], "doc_id string, text string, source string")
    out = {r["doc_id"]: (r["text"], r["source"])
           for r in remove_boilerplate(docs, max_repeats=1).collect()}
    assert out["1"] == ("unique one", "a")
    assert out["2"] == ("unique two", "a")
    assert out["3"] == ("", "b")
    assert out["4"] == ("standalone document", "b")
    # "" occurs twice (docs 3's split never yields it; doc 5's single
    # empty para repeats nowhere else) — doc 5 keeps its empty text
    assert out["5"][0] == ""
    # non-text columns pass through untouched
    assert all(v[1] in ("a", "b") for v in out.values())

    # HEADER/FOOTER occur 3x corpus-wide: max_repeats=3 tolerates them
    out2 = {r["doc_id"]: r["text"]
            for r in remove_boilerplate(docs, max_repeats=3).collect()}
    assert out2["1"] == "HEADER\nunique one\nFOOTER"


def test_contaminated_ids_exact_and_short_docs(spark):
    probes = spark.createDataFrame(
        [("p", "one two three four five six seven eight nine")],
        "doc_id string, text string")
    corpus = spark.createDataFrame([
        ("hit", "x y one two three four five six seven eight z"),
        ("near", "one two three four five six seven different"),  # 7-gram only
        ("short", "one two"),
        ("clean", "totally unrelated words in this document body here"),
    ], "doc_id string, text string")
    got = sorted(r["doc_id"] for r in
                 contaminated_ids(corpus, probes, n=8).collect())
    assert got == ["hit"]
    # short probe set (< n words) flags nothing
    tiny = probes.withColumn("text", F.lit("too short"))
    assert contaminated_ids(corpus, tiny, n=8).count() == 0


def test_contaminated_ids_plan_broadcasts_probes(spark):
    """Scale lock: the probe n-gram set must broadcast — the corpus
    n-gram stream is consumed by a BroadcastHashJoin (LeftSemi), never
    shuffled for a sort-merge join."""
    docs = spark.range(200).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"),
                 F.lit(" a b c d e f g h i j")).alias("text"))
    probes = docs.limit(3)
    plan = _plan(contaminated_ids(docs, probes, n=8))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_cli_tokenize_full_pipeline(spark, tmp_path, capsys):
    """CLI `tokenize`: strip boilerplate + decontaminate + tokenize
    in one command; contaminated docs dropped, banners stripped."""
    import json

    from br_archive_spark.cli import main

    docs = spark.createDataFrame([
        ("1", "HEADER\nalpha beta gamma\nFOOTER", "a"),
        ("2", "HEADER\ndelta epsilon zeta\nFOOTER", "a"),
        ("3", "HEADER\nleak one two three four five six seven eight"
              "\nFOOTER", "a"),
    ], "doc_id string, text string, source string")
    d = str(tmp_path)
    docs.write.parquet(f"{d}/docs")
    spark.createDataFrame(
        [("p", "one two three four five six seven eight")],
        "doc_id string, text string").write.parquet(f"{d}/probes")
    rc = main(["--master", "local[2]", "--shuffle-partitions", "4",
               "tokenize", f"{d}/docs", "-o", f"{d}/tok",
               "--vocab-size", "32", "--vocab-out", f"{d}/vocab",
               "--strip-boilerplate", "2",
               "--decontaminate", f"{d}/probes"])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st == {"docs": 2, "tokens": 6}
    tok = spark.read.parquet(f"{d}/tok")
    assert set(tok.columns) == {"doc_id", "tokens", "n_tok", "source"}
    assert sorted((r["doc_id"], r["n_tok"])
                  for r in tok.collect()) == [("1", 3), ("2", 3)]
    assert spark.read.parquet(f"{d}/vocab").count() == 6


def test_remove_boilerplate_regex_metachar_sep(spark):
    """Regression: sep is treated literally (split regex is \\Q-quoted)
    — '.' must split on dots, not on every character."""
    docs = spark.createDataFrame([
        ("1", "COMMON.unique one.COMMON", "a"),
        ("2", "COMMON.unique two.COMMON", "a"),
    ], "doc_id string, text string, source string")
    out = {r["doc_id"]: r["text"]
           for r in remove_boilerplate(docs, sep=".",
                                       max_repeats=4).collect()}
    assert out == {"1": "COMMON.unique one.COMMON",
                   "2": "COMMON.unique two.COMMON"}
    out1 = {r["doc_id"]: r["text"]
            for r in remove_boilerplate(docs, sep=".",
                                        max_repeats=1).collect()}
    assert out1 == {"1": "unique one", "2": "unique two"}


def test_cli_tokenize_without_source_column(spark, tmp_path, capsys):
    """Regression: input without a `source` column defaults it."""
    import json

    from br_archive_spark.cli import main

    spark.createDataFrame([("1", "alpha beta"), ("2", "gamma")],
                          "doc_id string, text string") \
        .write.parquet(str(tmp_path / "docs"))
    rc = main(["--master", "local[2]", "--shuffle-partitions", "4",
               "tokenize", str(tmp_path / "docs"),
               "-o", str(tmp_path / "tok")])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st == {"docs": 2, "tokens": 3}
    tok = spark.read.parquet(str(tmp_path / "tok"))
    assert {r["source"] for r in tok.collect()} == {"corpus"}
