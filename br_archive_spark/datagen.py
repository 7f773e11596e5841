"""Deterministic synthetic token-table generator.

Produces the mandated input shape (``BASELINE.json: input_hint``):
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` —
Zipf(1.3) token ids over a 50k vocab (the exact workload the reference
baseline was measured on, see BASELINE.md), lognormal skewed doc lengths
with a 1% heavy tail (10–50×), and a skewed source mix
(web/books/code/wiki = 0.70/0.15/0.10/0.05) — per FIXTURES.md F1.

Generation is distributed and deterministic: the driver only plans
``spark.range(n_docs)``; each task synthesizes its rows inside
``mapInArrow`` with an RNG seeded by ``(seed, doc_id)`` block — the same
table regardless of parallelism, so local[8] and local[32] bench runs
read identical input.

Zipf sampling uses inverse-CDF over the truncated vocab (vectorized
``searchsorted``) rather than ``numpy.random.zipf`` so the draw is
bounded and reproducible across block sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

__all__ = ["token_table", "zipf_cdf"]

SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_W = np.array([0.70, 0.15, 0.10, 0.05])


def zipf_cdf(alpha: float, vocab: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, vocab + 1, dtype=np.float64), alpha)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def _gen_fn(seed: int, vocab: int, alpha: float, mean_len: int):
    cdf = None  # built once per worker

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        nonlocal cdf
        if cdf is None:
            cdf = zipf_cdf(alpha, vocab)
        for batch in batches:
            ids = batch.column("id").to_numpy()
            n = len(ids)
            # one deterministic stream per row-block: seed on block start
            rng = np.random.default_rng((seed, int(ids[0])))
            # lengths: lognormal around mean_len, clipped, 1% heavy tail
            lens = rng.lognormal(mean=np.log(mean_len), sigma=0.6, size=n)
            heavy = rng.random(n) < 0.01
            lens = np.where(heavy, lens * rng.uniform(10, 50, n), lens)
            lens = np.clip(lens, 1, 8192 * 4).astype(np.int64)
            total = int(lens.sum())
            toks = np.searchsorted(cdf, rng.random(total)).astype(np.int32)
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            src = SOURCES[np.searchsorted(np.cumsum(SOURCE_W),
                                          rng.random(n))]
            doc_ids = np.char.add("doc-",
                                  np.char.zfill(ids.astype(str), 12))
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, type=pa.string()),
                 pa.ListArray.from_arrays(
                     pa.array(offsets, type=pa.int32()),
                     pa.array(toks, type=pa.int32())),
                 pa.array(lens.astype(np.int32), type=pa.int32()),
                 pa.array(src, type=pa.string())],
                names=["doc_id", "tokens", "n_tok", "source"])

    return fn


_GEN_BLOCK = 4096  # rows per generation partition; must stay below
# spark.sql.execution.arrow.maxRecordsPerBatch (8192) so each partition
# reaches the UDF as ONE Arrow batch → the per-block RNG seed
# (seed, first_id) is independent of executor count: local[8] and
# local[32] generate the identical table.


def token_table(spark: SparkSession, n_docs: int, *, seed: int = 42,
                vocab: int = 50_000, alpha: float = 1.3,
                mean_len: int = 512) -> DataFrame:
    """Deterministic distributed token table of ``n_docs`` rows."""
    nparts = max(1, -(-n_docs // _GEN_BLOCK))
    base = spark.range(0, n_docs, 1, nparts)
    fn = _gen_fn(seed, vocab, alpha, mean_len)
    return base.mapInArrow(
        fn, "doc_id string, tokens array<int>, n_tok int, source string")
