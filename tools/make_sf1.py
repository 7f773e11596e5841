"""Synthesize a deterministic sf1 dataset from the driver's sf0.1 tables.

VERDICT r4 next-steps #5 asks for a full-board validation at sf1 — a
10x scale-up over the bench's sf0.1 — but ``/root/testdata`` is
read-only and the driver ships no sf1 directory, so this script
derives one (default ``/tmp/sf1``), seeded and order-deterministic:

* ``region``/``nation``: fixed-size dimensions, copied verbatim.
* Fact/dim tables keyed by int64 surrogates (``customer`` ``supplier``
  ``part`` ``orders`` ``lineitem`` ``events``): ten copies with every
  key column (primary AND foreign) offset by ``copy * (max_key + 1)``,
  so join fan-out, per-key group sizes, and value distributions are
  EXACTLY those of sf0.1 — the per-query sf1/sf0.1 time ratio isolates
  plan scaling from data-shape drift.
* ``documents``: copy 0 verbatim; copies 1-9 get FRESH text sampled
  from the base corpus' word frequency and per-doc length
  distributions (copy-seeded numpy RNG). Plain 10x replication would
  make every document a 10-way near-duplicate and quadratically
  inflate the dedup pair miners — fresh text keeps cross-copy overlap
  at the corpus' natural level, which is what a real sf1 would show.
* ``embeddings``: copy 0 verbatim; copies 1-9 are per-label centroid
  (computed from sf0.1) + Gaussian noise matched to the base
  intra-label spread, L2-normalized float32 — cluster structure (and
  therefore IVF/LSH bucket shape) carries over.

Usage: ``python tools/make_sf1.py [OUT_DIR] [COPIES]``
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> int64 columns to offset per copy (pk + fks, one shared
# offset per underlying key domain so referential joins stay intact)
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
}

# key-domain cardinalities at sf0.1 (offset unit = max_key + 1)
DOMAIN_SIZE = {
    "custkey": 15_000, "suppkey": 1_000, "partkey": 20_000,
    "orderkey": 150_000, "eventid": 100_000, "userid": 1_500,
}


def _replicate_keyed(name: str, out_dir: str, copies: int) -> None:
    tbl = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(copies):
        t = tbl
        for col, domain in KEYED[name].items():
            if i:
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t.column(col),
                                 pa.scalar(i * DOMAIN_SIZE[domain],
                                           type=pa.int64()))
                t = t.set_column(idx, col, shifted)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts),
                   f"{out_dir}/{name}.parquet")


def _fresh_documents(out_dir: str, copies: int) -> None:
    base = pq.read_table(f"{SRC}/documents.parquet")
    texts = base["text"].to_pylist()
    words, counts = np.unique(
        np.array([w for s in texts for w in s.split()]),
        return_counts=True)
    freq = counts / counts.sum()
    lens = np.array([len(s.split()) for s in texts])
    langs = base["lang"].to_pylist()
    sources = base["source"].to_pylist()
    n = len(texts)
    parts = [base]
    for i in range(1, copies):
        rng = np.random.default_rng(1_000 + i)
        doc_lens = rng.permutation(lens)          # same length dist
        flat = rng.choice(words, size=int(doc_lens.sum()), p=freq)
        offs = np.concatenate([[0], np.cumsum(doc_lens)])
        new_texts = [" ".join(flat[offs[j]:offs[j + 1]])
                     for j in range(n)]
        perm = rng.permutation(n)
        parts.append(pa.table({
            "doc_id": pa.array(i * n + np.arange(n), type=pa.int64()),
            "text": pa.array(new_texts),
            "lang": pa.array([langs[j] for j in perm]),
            "source": pa.array([sources[j] for j in perm]),
            "n_chars": pa.array([len(s) for s in new_texts],
                                type=pa.int64()),
        }))
    pq.write_table(pa.concat_tables(parts),
                   f"{out_dir}/documents.parquet")


def _fresh_embeddings(out_dir: str, copies: int) -> None:
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(base["embedding"].to_pylist(), dtype=np.float32)
    labels = np.array(base["label"].to_pylist())
    n, dim = emb.shape
    cents, spread = {}, {}
    for lb in np.unique(labels):
        pts = emb[labels == lb]
        c = pts.mean(axis=0)
        cents[lb] = c
        spread[lb] = float(np.linalg.norm(pts - c, axis=1).mean())
    parts = [base]
    for i in range(1, copies):
        rng = np.random.default_rng(2_000 + i)
        lb = rng.choice(labels, size=n)           # same label mix
        vecs = np.stack([cents[x] for x in lb]).astype(np.float32)
        noise = rng.standard_normal((n, dim)).astype(np.float32)
        noise *= (np.array([spread[x] for x in lb], dtype=np.float32)
                  / np.maximum(np.linalg.norm(noise, axis=1), 1e-9)
                  )[:, None]
        vecs += noise
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        parts.append(pa.table({
            "vec_id": pa.array(i * n + np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(vecs),
                                  type=pa.list_(pa.float32())),
            "label": pa.array(lb.astype(np.int32), type=pa.int32()),
        }))
    pq.write_table(pa.concat_tables(parts),
                   f"{out_dir}/embeddings.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out_dir}/{name}.parquet")
    for name in KEYED:
        _replicate_keyed(name, out_dir, copies)
    _fresh_documents(out_dir, copies)
    _fresh_embeddings(out_dir, copies)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        md = pq.read_metadata(f"{out_dir}/{name}.parquet")
        print(f"{name}: {md.num_rows} rows")


if __name__ == "__main__":
    main()
