"""Global (table-level) dictionary — shared across all chunks.

Per-chunk dictionaries (``intcodecs._dict_codes``) re-store the token
vocabulary in every chunk: with a ~50k vocab and 1M-token chunks that is
~0.1 B/token of pure dictionary overhead, re-paid by every chunk of a
100 TB table. A *global* dictionary is built once per encode job by a
distributed frequency count, broadcast to executors (a vocab-sized
array, typically <1 MB), and chunks store only a reference to it.

This generalizes the reference's canonical-Huffman metadata scheme
(``src/lib_bra_types.h:51-56``: per-chunk code lengths) the way a
columnar store amortizes it: the code assignment (frequency-descending,
MTF's distribution-skewing role per ``src/encoders/bra_mtf.c:24``) moves
from per-chunk metadata to a job-level side table, exactly like a
Parquet/ORC shared dictionary page or an Iceberg reference file.

The gdict is a *transform layer*, not a terminal codec: token ids map to
dense frequency ranks through a broadcast LUT (O(n) gather for bounded
vocabularies, O(n log v) searchsorted otherwise), and the rank stream is
then encoded by the ordinary auto-selected codec ("gdict+<inner>").
Chunks whose values fall outside the dictionary (e.g. resumed encode
with a stale dict) fall back to the self-contained per-chunk path —
the same never-worse contract as the reference's STORED fallback
(``src/io/lib_bra_io_file_chunks.c:268-297``).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["GlobalDict", "build_global_dict", "save_global_dict",
           "load_global_dict"]

# dense-LUT cutoff: above this token-id span, use searchsorted instead
# of a (max_token+1)-sized gather table
_LUT_SPAN_MAX = 1 << 22


class GlobalDict:
    """Frequency-ranked token dictionary shared by all chunks of a job.

    ``tokens_by_rank[r]`` is the token id assigned code ``r`` (rank 0 =
    most frequent). The object is captured in the encode/decode UDF
    closure — Spark broadcasts it with the task, once per executor.
    """

    def __init__(self, tokens_by_rank: np.ndarray, dict_id: str = ""):
        self.tokens_by_rank = np.ascontiguousarray(
            tokens_by_rank, dtype=np.int64)
        if not dict_id:
            dict_id = hashlib.sha256(
                self.tokens_by_rank.tobytes()).hexdigest()[:16]
        self.dict_id = dict_id
        self._lut: np.ndarray | None = None
        self._sorted: np.ndarray | None = None
        self._sorted_rank: np.ndarray | None = None
        self._lo = 0
        n = len(self.tokens_by_rank)
        if n:
            self._lo = int(self.tokens_by_rank.min())
            span = int(self.tokens_by_rank.max()) - self._lo + 1
            if span <= max(_LUT_SPAN_MAX, 4 * n):
                # int32 ranks: dictionaries are vocab-sized, and the
                # encode path is memory-bandwidth-bound
                lut = np.full(span, -1, dtype=np.int32)
                lut[self.tokens_by_rank - self._lo] = \
                    np.arange(n, dtype=np.int32)
                self._lut = lut
            else:
                order = np.argsort(self.tokens_by_rank, kind="stable")
                self._sorted = self.tokens_by_rank[order]
                self._sorted_rank = order.astype(np.int32)

    def __len__(self) -> int:
        return len(self.tokens_by_rank)

    def encode_values(self, values: np.ndarray) -> np.ndarray | None:
        """Map token ids → ranks; None if any value is not in the dict
        (caller falls back to the self-contained per-chunk path)."""
        if len(values) == 0:
            return values.astype(np.int64)
        if self._lut is not None:
            idx = values.astype(np.int64, copy=False) - self._lo
            if int(idx.min()) < 0 or int(idx.max()) >= len(self._lut):
                return None
            ranks = self._lut[idx]
            if ranks.min() < 0:
                return None
            return ranks
        if self._sorted is None:
            return None
        pos = np.searchsorted(self._sorted, values)
        pos = np.minimum(pos, len(self._sorted) - 1)
        if not np.array_equal(self._sorted[pos],
                              values.astype(np.int64, copy=False)):
            return None
        return self._sorted_rank[pos]

    def decode_values(self, ranks: np.ndarray) -> np.ndarray:
        return self.tokens_by_rank[ranks]


def build_global_dict(df, column: str = "tokens",
                      max_vocab: int = 1 << 22) -> GlobalDict:
    """Distributed frequency count → frequency-ranked GlobalDict.

    One ``mapInArrow`` pass emits per-partition (token, count) partials
    (distinct tokens per partition, NOT one row per token — the shuffle
    carries ~vocab rows per partition, no matter how many tokens the
    partition holds), then a hash agg combines them. The driver
    receives at most ``max_vocab`` rows via TakeOrdered on
    (-count, token) — an open vocabulary (hashes, corrupt tokens)
    cannot bomb the driver; values outside the capped dict take the
    per-chunk self-contained fallback, the never-worse contract.
    Determinism: ranks are assigned by (-count, token), so the dict is
    a pure function of the table content.
    """
    import pyarrow as pa
    from pyspark.sql import functions as F

    out_schema = pa.schema([("token", pa.int64()), ("cnt", pa.int64())])

    def partial_counts(batches):
        toks_l: list[np.ndarray] = []
        cnts_l: list[np.ndarray] = []
        for batch in batches:
            col = batch.column(column)
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                values = col.flatten().to_numpy(zero_copy_only=False)
            else:
                values = col.to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(np.asarray(values), return_counts=True)
            toks_l.append(uniq.astype(np.int64, copy=False))
            cnts_l.append(counts.astype(np.int64, copy=False))
        if toks_l:
            # vectorized partial merge (no per-unique Python loop):
            # concatenate batch partials, re-unique, bincount-sum
            toks = np.concatenate(toks_l)
            cnts = np.concatenate(cnts_l)
            uniq, inv = np.unique(toks, return_inverse=True)
            tot = np.bincount(inv, weights=cnts,
                              minlength=len(uniq)).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq), pa.array(tot)], schema=out_schema)

    totals = (df.select(column)
              .mapInArrow(partial_counts, "token long, cnt long")
              .groupBy("token").agg(F.sum("cnt").alias("cnt"))
              .orderBy(F.col("cnt").desc(), F.col("token").asc())
              .limit(max_vocab)
              .collect())
    if not totals:
        return GlobalDict(np.zeros(0, dtype=np.int64))
    # rows arrive rank-ordered (TakeOrdered by -count, token)
    toks = np.array([r["token"] for r in totals], dtype=np.int64)
    return GlobalDict(toks)


def save_global_dict(gdict: GlobalDict, path: str) -> None:
    """Persist as a tiny (rank, token) parquet side table — the decode
    job's analog of the reference's in-archive Huffman lengths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "rank": np.arange(len(gdict), dtype=np.int64),
        "token": gdict.tokens_by_rank,
        "dict_id": np.full(len(gdict), gdict.dict_id, dtype=object),
    })
    pq.write_table(tbl, path)


def load_global_dict(path: str) -> GlobalDict:
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    order = np.argsort(tbl.column("rank").to_numpy(zero_copy_only=False))
    tokens = tbl.column("token").to_numpy(zero_copy_only=False)[order]
    dict_id = tbl.column("dict_id")[0].as_py() if tbl.num_rows else ""
    return GlobalDict(tokens, dict_id=dict_id)
