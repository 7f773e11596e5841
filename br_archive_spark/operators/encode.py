"""Distributed encode: DataFrame of rows → DataFrame of encoded chunks.

The Spark re-expression of the reference's sequential per-entry compress
loop (``src/prog/bra.cpp:337-358`` driving
``bra_io_file_chunks_compress_file``, ``src/io/lib_bra_io_file_chunks.c:169-312``).
The reference's per-256-KiB-chunk loop is embarrassingly parallel but runs
single-threaded with one global buffer set (``src/lib_bra.c:25-45``); here
each Spark task encodes its partition's chunks independently and the only
cross-task coordination — the reference's sequential append into one
archive file — disappears because every task writes its own output rows.

Scale design (100 TB / 1000 executors):

* **One shuffle, by design.** Rows are hash-partitioned once on
  ``xxhash64(key)`` into an explicit ``_part`` id; everything downstream
  (sort, chunking, encoding) is partition-local. The partition count is a
  parameter — at 10^12 sequences you set it so a partition's token payload
  (~rows × avg n_tok × 4 B) stays well under executor memory.
* **Skew.** Hash partitioning spreads hot ``source`` values; a partition
  holds thousands of docs so heavy-tailed doc lengths average out
  (size-targeted chunking inside the partition bounds any residual skew —
  a 50× doc just closes its chunk sooner). AQE handles the rest at join
  time elsewhere.
* **Determinism.** ``sortWithinPartitions(_part, key)`` makes chunk
  contents and boundaries a pure function of the input — reruns and
  resumed runs produce byte-identical chunks (the property the reference
  gets trivially from sequential scanning).
* **Zero per-row Python.** ``mapInArrow`` hands the UDF Arrow record
  batches; list/string columns are consumed as flat buffers
  (values+offsets), never materialized as Python objects.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..integrity.crc import CHECKSUM_ALGO, chunk_checksum
from ..codecs.strcodecs import strings_from_arrow
from .chunk import encode_column

__all__ = ["encode_table", "MANIFEST_SCHEMA", "MANIFEST_SPARK_SCHEMA",
           "TOKEN_SPECS"]

# column specs for the mandated input shape (BASELINE.json: input_hint)
TOKEN_SPECS: list[tuple[str, str]] = [
    ("doc_id", "string"),
    ("tokens", "int_list"),
    ("source", "string"),
]

_COLUMN_STRUCT = pa.struct([
    ("name", pa.string()),
    ("kind", pa.string()),
    ("codec", pa.string()),
    ("params", pa.binary()),
    ("payload", pa.binary()),
    ("orig_bytes", pa.int64()),
    ("enc_bytes", pa.int64()),
])

MANIFEST_SCHEMA = pa.schema([
    ("chunk_id", pa.string()),
    ("part_id", pa.int32()),
    ("chunk_idx", pa.int32()),
    ("snapshot_id", pa.string()),
    ("n_rows", pa.int64()),
    ("n_values", pa.int64()),
    ("orig_bytes", pa.int64()),
    ("enc_bytes", pa.int64()),
    ("checksum", pa.int64()),
    ("checksum_algo", pa.string()),
    ("columns", pa.list_(_COLUMN_STRUCT)),
])

MANIFEST_SPARK_SCHEMA = (
    "chunk_id string, part_id int, chunk_idx int, snapshot_id string, "
    "n_rows long, n_values long, orig_bytes long, enc_bytes long, "
    "checksum long, checksum_algo string, "
    "columns array<struct<name:string,kind:string,codec:string,"
    "params:binary,payload:binary,orig_bytes:long,enc_bytes:long>>"
)


def _extract(tbl: pa.Table, name: str, kind: str):
    col = tbl.column(name).combine_chunks()
    if kind == "string":
        return strings_from_arrow(col)
    if kind == "int_list":
        arr = col.cast(pa.large_list(pa.int64()))
        off = np.frombuffer(arr.buffers()[1], dtype=np.int64)
        offsets = off[arr.offset:arr.offset + len(arr) + 1]
        values = arr.values.to_numpy(zero_copy_only=False)
        values = values[offsets[0]:offsets[-1]]
        lengths = np.diff(offsets).astype(np.int64)
        return np.ascontiguousarray(values, dtype=np.int64), lengths
    if kind == "int":
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    raise ValueError(f"unknown kind {kind!r}")


def _n_values(tbl: pa.Table, specs: list[tuple[str, str]]) -> int:
    import pyarrow.compute as pc

    for name, kind in specs:
        if kind == "int_list":
            # list_value_length respects slice offsets (ListArray.values
            # would not — it exposes the full underlying buffer)
            lens = pc.list_value_length(tbl.column(name))
            return int(pc.sum(lens).as_py() or 0)
    return tbl.num_rows


def _make_encode_fn(specs: list[tuple[str, str]], target_values: int,
                    snapshot_id: str, codecs: tuple[str, ...] | None):

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: dict[int, list[pa.Table]] = {}
        pending_vals: dict[int, int] = {}
        chunk_counters: dict[int, int] = {}

        def flush(part: int) -> pa.RecordBatch:
            tbl = pa.concat_tables(pending.pop(part)).combine_chunks()
            pending_vals.pop(part)
            idx = chunk_counters.get(part, 0)
            chunk_counters[part] = idx + 1
            entries = [encode_column(name, kind, _extract(tbl, name, kind),
                                     codecs)
                       for name, kind in specs]
            checksum = chunk_checksum(*[e["payload"] for e in entries])
            row = {
                "chunk_id": f"{part:08d}:{idx:06d}",
                "part_id": part,
                "chunk_idx": idx,
                "snapshot_id": snapshot_id,
                "n_rows": tbl.num_rows,
                "n_values": _n_values(tbl, specs),
                "orig_bytes": sum(e["orig_bytes"] for e in entries),
                "enc_bytes": sum(e["enc_bytes"] for e in entries),
                "checksum": checksum,
                "checksum_algo": CHECKSUM_ALGO,
                "columns": entries,
            }
            return pa.RecordBatch.from_pylist([row], schema=MANIFEST_SCHEMA)

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            parts = batch.column("_part").to_numpy(zero_copy_only=False)
            # rows arrive sorted by (_part, key): part runs are contiguous
            bounds = np.concatenate(
                ([0], np.flatnonzero(np.diff(parts)) + 1, [len(parts)]))
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                part = int(parts[lo])
                piece = tbl.slice(lo, hi - lo).drop_columns(["_part"])
                pending.setdefault(part, []).append(piece)
                pending_vals[part] = pending_vals.get(part, 0) + \
                    _n_values(piece, specs)
                if pending_vals[part] >= target_values:
                    # size-targeted cut: emit what has accumulated
                    yield flush(part)
        for part in sorted(pending):
            yield flush(part)

    return encode_fn


def encode_table(df: DataFrame,
                 specs: list[tuple[str, str]] | None = None,
                 key: str = "doc_id",
                 num_parts: int | None = None,
                 target_values: int = 1 << 20,
                 snapshot_id: str = "",
                 codecs: tuple[str, ...] | None = None) -> DataFrame:
    """Encode ``df`` into a manifest DataFrame of compressed chunks.

    ``num_parts`` is the explicit partitioning knob: at 100 TB set it so
    each partition's flattened token payload fits executor memory
    (e.g. total_tokens × 4 B / num_parts ≈ 256 MB). Defaults to the
    session's shuffle parallelism.
    """
    specs = specs or TOKEN_SPECS
    spark = df.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = F.pmod(F.xxhash64(F.col(key)), F.lit(num_parts)).cast("int")
    prepared = (df
                .select(*[name for name, _ in specs], part.alias("_part"))
                .repartition(num_parts, "_part")
                .sortWithinPartitions("_part", key))
    fn = _make_encode_fn(specs, target_values, snapshot_id, codecs)
    return prepared.mapInArrow(fn, MANIFEST_SPARK_SCHEMA)
