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

__all__ = ["remove_boilerplate", "contaminated_ids"]


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
