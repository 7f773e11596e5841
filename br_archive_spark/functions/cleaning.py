"""Corpus-cleaning operators: boilerplate removal and test-set
decontamination — the two standard cleanup passes (CCNet/C4-style) that
sit between raw documents and the token table the codec engine encodes.

Like the rest of ``functions/``, everything is JVM-side codegen
(``split``/``transform``/``slice``/``array_join`` — no Python in the
hot path) and built from engine-portable primitives so the driver's
DuckDB oracle can reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["remove_boilerplate", "contaminated_ids", "repetition_stats",
           "scrub_pii", "token_contaminated_ids"]


def remove_boilerplate(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", sep: str = "\n",
                       max_repeats: int = 1) -> DataFrame:
    """Drop repeated paragraphs (boilerplate: headers, footers, nav
    chrome) from every document, preserving paragraph order.

    A paragraph is boilerplate when its TOTAL occurrence count across
    the corpus exceeds ``max_repeats`` (global count, not distinct
    docs — identical semantics in one SQL aggregate). Documents whose
    every paragraph is boilerplate survive with empty text.

    Scale shape (100 TB): one explode + map-side-combined count
    (shuffle bounded by DISTINCT paragraphs), one repartition join of
    paragraphs against their counts (both sides hash on the paragraph
    — AQE handles the head's skew), one per-doc re-collect keyed by
    the uniform ``id_col``. The hot loop is ``split``/``array_join``
    codegen; no per-row Python.
    """
    # F.split takes a REGEX; quote sep (\Q...\E) so it is treated
    # as the same literal array_join re-joins with — an unescaped
    # sep like "." would explode per character and reassemble garbage
    paras = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col),
                             "\\Q" + sep + "\\E"))
        .alias("_pos", "_para"))
    counts = paras.groupBy("_para").agg(
        F.count(F.lit(1)).alias("_cnt"))
    kept = (paras.join(counts, "_para")
            .where(F.col("_cnt") <= max_repeats)
            .groupBy("_id")
            .agg(F.sort_array(F.collect_list(F.struct("_pos", "_para")))
                 .alias("_s"))
            .select("_id",
                    F.array_join(F.transform("_s", lambda x: x["_para"]),
                                 sep).alias("_clean")))
    out_cols = [F.col(c) for c in docs.columns if c != text_col]
    return (docs.join(kept, docs[id_col] == kept["_id"], "left")
            .select(*out_cols,
                    F.coalesce("_clean", F.lit(""))
                    .alias(text_col)))


def contaminated_ids(docs: DataFrame, probes: DataFrame,
                     n: int = 8, text_col: str = "text",
                     id_col: str = "doc_id",
                     pattern: str = "[a-z0-9]+") -> DataFrame:
    """Test-set decontamination: ids of documents sharing ANY word
    ``n``-gram with the (small) probe set — the overlap check run
    before training so evaluation data never leaks into the corpus.

    Word extraction uses the same engine-portable regex as
    ``tokenize_corpus``; an ``n``-gram is ``n`` consecutive words
    joined by a single space. Documents (or probes) shorter than
    ``n`` words contribute no n-grams.

    Scale shape (100 TB): the probe n-gram set is built from the
    probe table (test sets are small by definition), deduplicated,
    and BROADCAST; the corpus is scanned ONCE, its n-grams generated
    inline (``transform`` over an index ``sequence`` + ``slice`` —
    pure codegen, no explode of the corpus until the n-gram stream,
    which the broadcast semi-join consumes without a shuffle), and
    the only shuffle is the final distinct over surviving ids.
    """
    def ngrams(df):
        words = F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(pattern), 0)
        # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
        # docs shorter than n words need the explicit empty array
        idx = F.when(
            F.size(words) >= n,
            F.sequence(F.lit(1), F.size(words) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.transform(
                idx, lambda i: F.array_join(F.slice(words, i, n), " ")))
            .alias("_ngram"))

    probe_grams = ngrams(probes).select("_ngram").distinct()
    return (ngrams(docs)
            .join(F.broadcast(probe_grams), "_ngram", "left_semi")
            .select(F.col("_id").alias(id_col))
            .distinct())


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_top_word_frac: float = 0.2) -> DataFrame:
    """Gopher-style within-document repetition signals: word count,
    distinct-word count, the count of the single most frequent word,
    and a ``keep`` verdict (``top_count <= max_top_word_frac *
    n_words``) — the "most common word dominates the page" filter
    from the Gopher/MassiveText cleaning rules.

    Words split on single spaces (consecutive separators yield empty
    words, identically in Spark and the DuckDB oracle). The top-word
    count is computed WITHOUT a shuffle: ``sort_array`` groups equal
    words adjacently, then one ``aggregate`` run-length scan takes
    the longest run — O(w log w) per document, all whole-stage
    codegen. The explode + groupBy(doc, word) alternative costs a
    corpus-wide shuffle keyed on (doc, word); this form is map-only.

    Scale shape (100 TB): embarrassingly parallel per document — no
    Exchange anywhere in the plan (tests/test_plans.py locks this).
    """
    words = F.split(F.col(text_col), " ")
    zero = F.lit(0).cast("long")
    run_acc = F.struct(F.lit("").alias("prev"), zero.alias("cur"),
                       zero.alias("best"))

    def step(acc, w):
        cur = (F.when(w == acc["prev"], acc["cur"] + F.lit(1))
               .otherwise(F.lit(1)).cast("long"))
        return F.struct(w.alias("prev"), cur.alias("cur"),
                        F.greatest(acc["best"], cur).alias("best"))

    top = F.aggregate(F.sort_array(words), run_acc, step,
                      lambda acc: acc["best"])
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        top.alias("top_count"),
    ).withColumn(
        "keep",
        F.col("top_count") <= F.lit(max_top_word_frac) * F.col("n_words"))


# engine-portable patterns: valid and equivalent in Java regex (Spark)
# and RE2 (DuckDB) — no backreferences, no lookaround
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\b[0-9]{3}-[0-9]{4}\b"


def scrub_pii(docs: DataFrame, text_col: str = "text",
              email_token: str = "<EMAIL>",
              phone_token: str = "<PHONE>") -> DataFrame:
    """Redact emails and phone-shaped numbers from ``text_col`` in
    place and append per-document match counts (``n_emails``,
    ``n_phones``) — the standard pre-training PII scrub pass.

    Match counts come from ``size(split(text, pattern)) - 1`` (the
    number of separators a regex split produces), which needs no
    count-specific builtin and is reproducible verbatim in the DuckDB
    oracle via ``regexp_split_to_array``. Emails are counted before
    phones so a phone-looking substring inside an email local part is
    attributed once.

    Scale shape (100 TB): pure ``regexp_replace`` codegen, map-only,
    zero shuffles; the scan's column pruning and pushdown are
    untouched because this is a projection.
    """
    text = F.col(text_col)
    n_emails = (F.size(F.split(text, PII_EMAIL_PATTERN)) - 1).cast("long")
    after_email = F.regexp_replace(text, PII_EMAIL_PATTERN, email_token)
    n_phones = (F.size(F.split(after_email, PII_PHONE_PATTERN)) - 1
                ).cast("long")
    cleaned = F.regexp_replace(after_email, PII_PHONE_PATTERN, phone_token)
    others = [F.col(c) for c in docs.columns if c != text_col]
    return docs.select(*others, cleaned.alias(text_col),
                       n_emails.alias("n_emails"),
                       n_phones.alias("n_phones"))


def token_contaminated_ids(tok: DataFrame, probes: DataFrame,
                           n: int = 13, id_col: str = "doc_id",
                           tokens_col: str = "tokens") -> DataFrame:
    """Token-level decontamination (the GPT-3/PaLM recipe): ids of
    documents in the TOKEN table sharing any ``n``-consecutive-token
    run with the probe set. Word-level ``contaminated_ids`` checks
    raw text before tokenization; this one runs on the north-star
    ``tokens: array<int>`` column, where training-data overlap checks
    actually happen (eval sets are compared post-tokenization so
    whitespace/casing differences can't hide a leak).

    An n-gram is serialized as the comma-joined token run — an exact,
    engine-portable key (the DuckDB oracle builds the same string via
    ``array_to_string(tokens[i:i+n-1], ',')``).

    Scale shape (100 TB): identical to ``contaminated_ids`` — probe
    n-grams deduplicated and BROADCAST, the corpus scanned ONCE with
    n-grams generated inline (``sequence`` + ``slice`` codegen, no
    corpus-side pre-explode materialization), one broadcast semi-join,
    one final distinct over surviving ids.
    """
    def grams(df: DataFrame) -> DataFrame:
        toks = F.col(tokens_col)
        # sequence(1, 0) is DESCENDING [1, 0], not empty — short docs
        # need the explicit empty array (same guard as the word form)
        idx = F.when(
            F.size(toks) >= n,
            F.sequence(F.lit(1), F.size(toks) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        run = lambda i: F.array_join(  # noqa: E731
            F.transform(F.slice(toks, i, n),
                        lambda t: t.cast("string")), ",")
        return df.select(F.col(id_col).alias("_id"),
                         F.explode(F.transform(idx, run)).alias("_ngram"))

    probe_grams = grams(probes).select("_ngram").distinct()
    return (grams(tok)
            .join(F.broadcast(probe_grams), "_ngram", "left_semi")
            .select(F.col("_id").alias(id_col))
            .distinct())
