"""Text-analysis operators for training-data pipelines.

All hot-path math is JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen, no Python) — these compose with the codec engine:
score → filter → encode is one Spark plan with a single shuffle at the
encode repartition.

Cross-engine determinism: every operator here is built from exact
integer/string primitives (``length``/``replace`` counting, ``split``)
so a DuckDB oracle can reproduce results bit-for-bit — the property the
driver's correctness gate needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["token_count", "occurrence_count", "punct_count",
           "quality_score", "lang_id", "fingerprint", "LANG_MARKERS",
           "tokenize_corpus", "perplexity_score"]


def token_count(text: Column | str) -> Column:
    """Whitespace token count (single-space separated corpora)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), " "))).cast("int")


def occurrence_count(text: Column | str, needle: str) -> Column:
    """Exact substring occurrence count via replace-length arithmetic —
    identical semantics in every SQL engine (no regex dialects)."""
    c = F.col(text) if isinstance(text, str) else text
    return ((F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
            / len(needle)).cast("int")


_PUNCT = [".", ",", "!", "?", ";", ":"]


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    total = F.lit(0)
    for p in _PUNCT:
        total = total + (F.length(c) - F.length(F.replace(c, F.lit(p),
                                                          F.lit(""))))
    return total.cast("int")


_STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def quality_score(text: Column | str) -> Column:
    """Integer-arithmetic quality heuristic in [0, 100]:
    rewards stopword presence and moderate length, penalizes
    punctuation excess. Deterministic across engines (all-int math)."""
    c = F.col(text) if isinstance(text, str) else text
    ntok = token_count(c)
    stop = F.lit(0)
    for w in _STOPWORDS:
        stop = stop + occurrence_count(F.concat(F.lit(" "), c, F.lit(" ")),
                                       f" {w} ")
    # integer percentages: FLOOR explicitly — CAST-to-int truncates in
    # Spark but rounds in DuckDB, so never cast an unfloored quotient
    stop_pct = F.floor(
        F.when(ntok > 0, (stop * 100) / ntok).otherwise(0)).cast("int")
    len_score = F.when(ntok.between(20, 2000), 40).when(
        ntok.between(5, 5000), 20).otherwise(0)
    punct_pen = F.when(punct_count(c) * 10 > F.length(c), 20).otherwise(0)
    raw = len_score + F.least(stop_pct * 2, F.lit(60)) - punct_pen
    return F.greatest(F.least(raw, F.lit(100)), F.lit(0)).cast("int")


LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "und", "nicht", "das"],
    "fr": ["le", "et", "les", "des"],
    "es": ["el", "y", "los", "las"],
    "en": ["the", "and", "of", "to"],
}


def lang_id(text: Column | str) -> Column:
    """Marker-word language heuristic (n-gram-style language ID).

    Counts marker-word hits per language on space-padded text and takes
    the argmax with a fixed tie order (de→fr→es→en), defaulting to
    'en'. Pure replace-count arithmetic so the identical rule runs as a
    SQL oracle.
    """
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    scores = {}
    for lang, words in LANG_MARKERS.items():
        s = F.lit(0)
        for w in words:
            s = s + occurrence_count(padded, f" {w} ")
        scores[lang] = s
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("es", "fr", "de"):  # later wins ties → de>fr>es>en priority
        cond = scores[lang] >= best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return F.when(scores["de"] + scores["fr"] + scores["es"]
                  + scores["en"] == 0, F.lit("unknown")).otherwise(best)


def fingerprint(text: Column | str, modulus: int = 1_000_000_007) -> Column:
    """Order-sensitive document fingerprint (rolling polynomial hash).

    ``hash = Σ (ascii(word_i) + len(word_i)) * 31^i  (mod M)`` over
    whitespace tokens, computed JVM-side with ``aggregate`` — a
    Rabin-Karp-style rolling fingerprint for near-dup prefiltering.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.trim(c), " ")
    return F.aggregate(
        words,
        F.struct(F.lit(0).cast("long").alias("h"),
                 F.lit(1).cast("long").alias("p")),
        lambda acc, w: F.struct(
            ((acc["h"] + (F.ascii(w) + F.length(w)) * acc["p"])
             % modulus).alias("h"),
            ((acc["p"] * 31) % modulus).alias("p")),
        lambda acc: acc["h"])


def tokenize_corpus(docs, text_col: str = "text",
                    id_col: str = "doc_id",
                    source_col: str | None = "source",
                    pattern: str = "[a-z0-9]+",
                    vocab_size: int = 1 << 16):
    """Raw documents → the north-star token-table shape
    ``(doc_id, tokens:array<int>, n_tok, source)`` plus the vocab.

    The upstream producer of everything the codec engine encodes: a
    frequency-ranked vocabulary (rank 1 = most frequent word — the
    skew the dictionary codecs exploit; ties broken by word so ids
    are deterministic), words outside the top ``vocab_size`` → OOV
    id 0. The default ``pattern`` is engine-portable regex (same
    semantics in Java regex and RE2/DuckDB), so the whole pipeline
    has an exact SQL oracle.

    Scale shape (100 TB): word extraction and counting are one
    map-side-combined aggregate (shuffle bounded by DISTINCT words);
    the rank assignment first caps to ``vocab_size`` via
    ``orderBy().limit()`` (a TakeOrdered at the driver — the same
    driver-capped contract as ``build_global_dict``) so the
    single-partition ranking window only ever sees ``vocab_size``
    rows; id mapping is a BROADCAST join against that capped vocab;
    the per-doc re-collect is the one content shuffle, keyed by
    ``id_col`` (uniform). No per-row Python anywhere.

    Returns ``(token_table, vocab)`` where vocab is
    ``(word, token_id, n_occurrences)``.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(source_col) if source_col else F.lit("corpus"))
        .alias("source"),
        F.regexp_extract_all(F.lower(F.col(text_col)),
                             F.lit(pattern), 0).alias("_words"))
    exploded = words.select(
        "doc_id", "source",
        F.posexplode_outer("_words").alias("pos", "word"))
    counts = (exploded.where(F.col("word").isNotNull())
              .groupBy("word")
              .agg(F.count(F.lit(1)).alias("n_occurrences")))
    capped = counts.orderBy(F.col("n_occurrences").desc(),
                            F.col("word")).limit(vocab_size)
    vocab = capped.withColumn(
        "token_id",
        F.row_number().over(
            Window.orderBy(F.col("n_occurrences").desc(),
                           F.col("word")))).select(
        "word", "token_id", "n_occurrences")
    mapped = (exploded
              .join(F.broadcast(vocab.select("word", "token_id")),
                    "word", "left")
              .groupBy("doc_id", "source")
              .agg(F.sort_array(F.collect_list(F.struct(
                  "pos", F.coalesce("token_id", F.lit(0))
                  .alias("tid")))).alias("_s")))
    token_table = mapped.select(
        "doc_id",
        F.transform(
            F.filter("_s", lambda x: x["pos"].isNotNull()),
            lambda x: x["tid"].cast("int")).alias("tokens"),
        "source").withColumn("n_tok", F.size("tokens")).select(
        "doc_id", "tokens", "n_tok", "source")
    return token_table, vocab


def perplexity_score(df, lm=None, tokens_col: str = "tokens",
                     id_col: str = "doc_id", alpha: float = 1.0):
    """Per-document unigram-LM cross-entropy over the ``tokens``
    column — the CCNet-style perplexity quality filter, run where real
    pipelines run it: post-tokenization, against a token-frequency
    language model.

    Score = ``-avg(log2 p(t))`` over the document's tokens with
    additive smoothing ``p(t) = (freq + alpha) / (total + alpha*V)``;
    reported in 1e-4-bit units (``xent_bp``, a long) so the value is
    hash-stable across engines (the basis-points trick the cosine
    queries use). ``lm`` is any ``(token, freq)`` DataFrame — an
    external model, or ``None`` to self-score against the corpus's own
    :func:`~br_archive_spark.functions.packing.token_histogram`.
    Tokens absent from an external ``lm`` take the smoothed floor
    ``alpha / denom`` (``alpha`` must be > 0 for that case).

    Scale shape (100 TB): the LM is vocab-bounded (map-side-combined
    histogram), so it BROADCASTS; scoring is one explode + broadcast
    join + one hash aggregate keyed by ``id_col`` — no sort, no
    per-row Python, and the corpus is scanned once. The two LM
    scalars (total count, vocab size) are one metadata-sized driver
    action. Unigram statistics are order-independent, which is what
    makes the exact SQL oracle one window-free query.
    """
    from .packing import token_histogram

    if lm is None:
        lm = token_histogram(df, tokens_col)
    elif alpha <= 0:
        # an external LM may miss corpus tokens; with alpha <= 0 the
        # floor is -inf and the ANSI cast to long would throw a cryptic
        # CAST_OVERFLOW deep inside the job — fail fast at call time
        raise ValueError(
            "perplexity_score: alpha must be > 0 with an external lm "
            "(unseen tokens would floor at -inf)")
    tot_v = lm.agg(F.sum("freq").cast("double").alias("t"),
                   F.count(F.lit(1)).cast("double").alias("v")) \
        .collect()[0]
    denom = tot_v["t"] + alpha * tot_v["v"]
    logp = lm.select(
        F.col("token").cast("long").alias("token"),
        F.log2((F.col("freq") + F.lit(float(alpha))) / F.lit(denom))
        .alias("_logp"))
    floor = F.lit(__import__("math").log2(alpha / denom)
                  if alpha > 0 else float("-inf"))
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col).alias("token")) \
        .withColumn("token", F.col("token").cast("long"))
    return (toks.join(F.broadcast(logp), "token", "left")
            .groupBy(id_col)
            .agg(F.round(F.avg(F.coalesce(F.col("_logp"), floor))
                         * -10000).cast("long").alias("xent_bp")))
