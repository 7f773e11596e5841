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
