"""Schema evolution on encoded manifests — without re-encoding.

Each chunk stores its columns as independently-coded entries, so a
column can be dropped by rewriting only manifest metadata plus the
chunk checksum (never touching the surviving payloads' bits), and
renamed without touching payloads at all. This is the lakehouse
DROP/RENAME COLUMN analog the reference cannot express (its archive
entries are whole files — ``src/io/lib_bra_io_file_meta_entries.c`` —
so removing a member means rewriting the archive); chunk-granular
entries make it an O(metadata) rewrite here.

Scale shape: ``drop_columns`` is one ``mapInArrow`` pass over the
manifest — embarrassingly parallel, no shuffle, output partitioning
identical to the input. ``rename_column`` is pure JVM expression work
(names live outside the checksum domain, which covers params+payload
bytes only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..integrity.crc import CHECKSUM_ALGO, chunk_checksum

__all__ = ["drop_columns", "rename_column"]


def drop_columns(encoded: DataFrame, cols: list[str]) -> DataFrame:
    """Remove ``cols`` from every chunk of an encoded manifest.

    Surviving entries keep their exact bytes (order preserved — the
    checksum recompute at decode walks entries in stored order); the
    chunk checksum is recomputed over the survivors so decode-time
    verification keeps working, and ``orig_bytes``/``enc_bytes``/
    ``column_stats`` shrink accordingly. If the zone-map key column is
    dropped, ``key_col/key_min/key_max`` are nulled — lookups then
    scan without pruning rather than pruning on a column that no
    longer exists (the silent-miss rule). Dropping every column, or a
    column absent from the manifest, raises.
    """
    drop = set(cols)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = batch.to_pylist()
            out = []
            for row in rows:
                have = {e["name"] for e in row["columns"]}
                missing = drop - have
                if missing:
                    raise ValueError(
                        f"drop_columns: {sorted(missing)} not present "
                        f"in chunk {row['chunk_id']}")
                keep = [e for e in row["columns"]
                        if e["name"] not in drop]
                if not keep:
                    raise ValueError(
                        "drop_columns: refusing to drop every column "
                        f"of chunk {row['chunk_id']}")
                row["columns"] = keep
                row["column_stats"] = [
                    s for s in (row.get("column_stats") or [])
                    if s["name"] not in drop]
                row["orig_bytes"] = sum(e["orig_bytes"] for e in keep)
                row["enc_bytes"] = sum(e["enc_bytes"] for e in keep)
                row["checksum"] = chunk_checksum(
                    *[b for e in keep
                      for b in (e["params"], e["payload"])])
                row["checksum_algo"] = CHECKSUM_ALGO
                if row.get("key_col") in drop:
                    row["key_col"] = None
                    row["key_min"] = None
                    row["key_max"] = None
                out.append(row)
            yield pa.RecordBatch.from_pylist(out, schema=batch.schema)

    # emit the INPUT's own schema: manifests may carry extra columns
    # (e.g. the `input_file` lineage column) that must survive a drop
    return encoded.mapInArrow(fn, encoded.schema)


def rename_column(encoded: DataFrame, old: str, new: str) -> DataFrame:
    """Rename a column in every chunk — metadata-only.

    Entry names live in ``columns``/``column_stats``/``key_col``, none
    of which the chunk checksum covers (it hashes params+payload
    bytes), so this is pure JVM ``transform`` work: no Python worker,
    no payload movement, no checksum change. Decode afterwards with
    the new name in the specs.
    """
    if old == new:
        return encoded

    def _ren(field):
        return F.when(field == F.lit(old), F.lit(new)).otherwise(field)

    col_fields = (encoded.schema["columns"]
                  .dataType.elementType.fieldNames())
    out = encoded.withColumn(
        "columns",
        F.transform("columns", lambda e: F.struct(
            _ren(e["name"]).alias("name"),
            *[e[f].alias(f) for f in col_fields if f != "name"])))
    if "column_stats" in encoded.columns:
        stats_fields = (encoded.schema["column_stats"]
                        .dataType.elementType.fieldNames())
        out = out.withColumn(
            "column_stats",
            F.transform("column_stats", lambda s: F.struct(
                _ren(s["name"]).alias("name"),
                *[s[f].alias(f) for f in stats_fields if f != "name"])))
    if "key_col" in encoded.columns:
        out = out.withColumn("key_col", _ren(F.col("key_col")))
    return out
