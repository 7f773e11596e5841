"""repetition_stats / scrub_pii: Python-brute-force value oracles and
the map-only (zero-Exchange) plan lock."""

from collections import Counter

from br_archive_spark.functions.cleaning import repetition_stats, scrub_pii


def _brute_rep(text, frac=0.2):
    words = text.split(" ")
    c = Counter(words)
    top = max(c.values())
    return (len(words), len(c), top, top <= frac * len(words))


def test_repetition_stats_matches_bruteforce(spark):
    texts = [
        (0, "a b c a b a a"),
        (1, "x x x x"),
        (2, "one two three four five"),
        (3, "dup  dup"),          # double space -> empty word counted
        (4, "solo"),
        (5, "tail space "),       # trailing empty word
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_distinct"], r["top_count"],
                         r["keep"])
           for r in repetition_stats(df).collect()}
    assert got == {i: _brute_rep(t) for i, t in texts}


def test_repetition_stats_plan_is_map_only(spark):
    df = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    plan = (repetition_stats(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (0, "mail me at bob.smith+x@corp.example.org today"),
        (1, "two mails a@b.co c@d.io and a phone 555-0142"),
        (2, "edge 555-01423 is five digits, no match; 555-0142 is"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_emails"], r["n_phones"])
           for r in scrub_pii(df).collect()}
    assert got[0] == ("mail me at <EMAIL> today", 1, 0)
    assert got[1] == ("two mails <EMAIL> <EMAIL> and a phone <PHONE>",
                      2, 1)
    # \b guards: 555-01423 must NOT match (digit follows)
    assert got[2] == ("edge 555-01423 is five digits, no match; "
                      "<PHONE> is", 0, 1)
    assert got[3] == ("nothing sensitive here", 0, 0)


def test_scrub_pii_plan_is_map_only(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def _brute_token_contam(docs, probe_ids, n):
    def grams(toks):
        return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    pg = set()
    for did, toks in docs:
        if did in probe_ids:
            pg |= grams(toks)
    return sorted(did for did, toks in docs if grams(toks) & pg)


def test_token_contaminated_ids_matches_bruteforce(spark):
    from br_archive_spark.functions.cleaning import token_contaminated_ids
    docs = [
        ("p0", [1, 2, 3, 4, 5]),        # probe
        ("a", [9, 1, 2, 3, 8]),         # shares run 1,2,3 -> flagged
        ("b", [3, 2, 1]),               # reversed run -> clean
        ("c", [1, 2]),                  # shorter than n -> clean
        ("d", [11, 22, 33]),            # disjoint -> clean
        ("p1", [7, 7]),                 # probe shorter than n: no grams
        ("e", [7, 7, 7]),               # must NOT be flagged by p1
        ("f", [4, 5, 1, 2, 3]),         # shares 1,2,3 (and 3,4,5? no)
    ]
    probe_ids = {"p0", "p1"}
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    probes = df.where(df.doc_id.isin(*probe_ids))
    got = sorted(r["doc_id"] for r in
                 token_contaminated_ids(df, probes, n=3).collect())
    assert got == _brute_token_contam(docs, probe_ids, 3)
    assert "e" not in got and "b" not in got


def test_token_contaminated_ids_broadcasts_probes(spark):
    from br_archive_spark.functions.cleaning import token_contaminated_ids
    df = spark.createDataFrame([("a", [1, 2, 3])],
                               "doc_id string, tokens array<int>")
    plan = (token_contaminated_ids(df, df, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_cli_clean_pii_and_repetition(spark, tmp_path, capsys):
    """CLI `clean`: repetition filter drops the degenerate doc, PII
    scrub redacts and reports corpus-wide counts."""
    import json

    from br_archive_spark.cli import main

    docs = spark.createDataFrame([
        ("1", "alpha beta gamma write a@b.io now"),
        ("2", "spam spam spam spam spam ham"),
        ("3", "plain words only here"),
    ], "doc_id string, text string")
    d = str(tmp_path)
    docs.write.parquet(f"{d}/docs")
    rc = main(["--master", "local[2]", "--shuffle-partitions", "4",
               "clean", f"{d}/docs", "-o", f"{d}/out",
               "--scrub-pii", "--max-top-word-frac", "0.5"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep == {"dropped_repetitive": 1, "docs": 2,
                   "emails_redacted": 1, "phones_redacted": 0}
    out = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(f"{d}/out").collect()}
    assert out["1"] == "alpha beta gamma write <EMAIL> now"
    assert "2" not in out
