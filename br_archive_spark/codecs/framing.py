"""Length-prefixed byte framing for nested codec streams.

Plays the role of the reference's on-disk chunk header
(``bra_io_chunk_header_t``: 3-byte BWT index + ``bra_huffman_t`` metadata,
``src/lib_bra_types.h:51-68``) — a tiny self-describing container so a
codec's params/payload can nest other codecs' streams (RLE nests two
FOR streams, DICT nests a dictionary stream plus a code stream, ...).
"""

from __future__ import annotations

import struct

__all__ = ["pack_frames", "unpack_frames"]

_U32 = struct.Struct("<I")


def pack_frames(parts: list[bytes]) -> bytes:
    """Concatenate ``parts`` with little-endian u32 length prefixes."""
    out = bytearray()
    for p in parts:
        out += _U32.pack(len(p))
        out += p
    return bytes(out)


def unpack_frames(buf: bytes, count: int) -> list[bytes]:
    """Inverse of :func:`pack_frames`; reads exactly ``count`` frames."""
    parts: list[bytes] = []
    off = 0
    for _ in range(count):
        (ln,) = _U32.unpack_from(buf, off)
        off += 4
        parts.append(bytes(buf[off:off + ln]))
        off += ln
    if off != len(buf):
        raise ValueError(f"trailing bytes in frame buffer: {len(buf) - off}")
    return parts
