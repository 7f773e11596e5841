from .cdc_stream import stream_changes
from .dedup_stream import dedup_stream
from .encode_stream import encode_stream, stream_ingest_stats

__all__ = ["encode_stream", "stream_ingest_stats", "dedup_stream",
           "stream_changes"]
