from .chunk import decode_column, encode_column
from .compact import compact_manifest
from .decode import (ChecksumError, agg_encoded, decode_files,
                     decode_table, lookup_docs, lookup_range,
                     lookup_values,
                     hist_encoded, lookup_rows, manifest_specs, ndv_encoded,
                     quantile_encoded, scan_estimate, scan_range,
                     scan_range_files, scan_where, scan_where_files,
                     topk_encoded)
from .encode import (MANIFEST_SPARK_SCHEMA, TOKEN_SPECS, encode_files,
                     encode_table, infer_specs)
from .evolve import (add_column, delete_rows, delete_where,
                     drop_columns, rename_column, upsert_rows)
from .snapshots import (CommitConflict, commit_snapshot,
                        expire_snapshots, incremental_manifest,
                        load_snapshot, recluster_snapshot, rollback,
                        snapshot_diff, snapshot_fsck, snapshots)
from .verify import (compression_report, table_checksum,
                     verify_roundtrip)

__all__ = [
    "encode_column", "decode_column",
    "encode_table", "encode_files", "decode_table", "decode_files",
    "infer_specs",
    "lookup_docs", "lookup_rows", "lookup_range", "lookup_values",
    "compact_manifest",
    "scan_range", "scan_range_files", "scan_where",
    "scan_where_files", "agg_encoded", "ndv_encoded", "topk_encoded",
    "hist_encoded", "scan_estimate", "quantile_encoded",
    "manifest_specs", "add_column", "drop_columns", "rename_column",
    "delete_where",
    "delete_rows", "upsert_rows",
    "commit_snapshot", "snapshots", "load_snapshot", "rollback",
    "expire_snapshots", "incremental_manifest", "snapshot_diff",
    "CommitConflict", "snapshot_fsck", "recluster_snapshot",
    "ChecksumError",
    "verify_roundtrip", "compression_report", "table_checksum",
    "MANIFEST_SPARK_SCHEMA", "TOKEN_SPECS",
]
