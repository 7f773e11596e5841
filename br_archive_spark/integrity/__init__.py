from .crc import (chunk_checksum, crc32c, crc32c_combine)

__all__ = ["crc32c", "crc32c_combine", "chunk_checksum"]
