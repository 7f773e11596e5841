"""Streaming exact dedup — custom stateful operator.

A training-data ingest stream repeats content (re-crawls, mirrored
shards, replayed uploads); the batch ``functions.dedup.exact_dedup``
cannot help because each micro-batch sees only itself. This operator
keeps the seen-set as STREAMING STATE: rows group by a content hash
and ``applyInPandasWithState`` emits only the first occurrence of each
hash across the whole stream, with a per-hash duplicate counter in the
state store (checkpointed — restarts neither lose nor re-emit).

Scale shape: state is keyed by a 128-bit content hash (two independent
xxhash64 families — a bare 64-bit key would birthday-collide with ~50%
probability around 5B distinct documents, silently dropping a unique
doc), so the state store holds one tiny row per DISTINCT document —
not per event — and
the groupBy shuffles only (hash → row) pairs. This is the idiomatic
Spark replacement for a side "seen" database; the reference, strictly
batch (``src/prog/bra.cpp:337-358``), has no analog.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .encode_stream import TOKEN_STREAM_SCHEMA

__all__ = ["dedup_stream"]


def dedup_stream(spark: SparkSession, input_dir: str, output_dir: str,
                 checkpoint_dir: str,
                 key_cols: tuple[str, ...] = ("tokens",),
                 trigger_available_now: bool = True):
    """First-occurrence-only pass-through of the token stream.

    Returns the started StreamingQuery writing deduped rows (original
    schema) to ``output_dir``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (spark.readStream
              .schema(TOKEN_STREAM_SCHEMA)
              .parquet(input_dir))
    hashed = stream.withColumn(
        "_h1", F.xxhash64(*key_cols)).withColumn(
        "_h2", F.xxhash64(F.lit("bra-dedup-2"), *key_cols))
    out_cols = [f.split()[0] for f in TOKEN_STREAM_SCHEMA.split(", ")]

    def keep_first(key, pdfs, state):
        emitted_before = state.exists
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if not emitted_before and len(pdf):
                yield pdf.iloc[:1][out_cols]
                emitted_before = True
            count += len(pdf)
        state.update((count,))

    deduped = (hashed.groupBy("_h1", "_h2").applyInPandasWithState(
        keep_first, TOKEN_STREAM_SCHEMA, "n long", "append",
        GroupStateTimeout.NoTimeout))
    writer = (deduped.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
