"""Chunk-level column encode/decode (pure NumPy — no Spark dependency).

A *chunk* is the engine's unit of compression, the analog of the
reference's fixed 256 KiB block (``BRA_MAX_CHUNK_SIZE``,
``src/lib_bra_defs.h:93``) — except sized in *tokens*, targeted rather
than fixed, and cut on row boundaries so each row decodes from exactly
one chunk.

Each encoded column is a self-describing entry::

    {name, kind, codec, params: bytes, payload: bytes,
     orig_bytes, enc_bytes}

with kinds:

* ``int_list``  — ``(values: int64[], lengths: int64[])`` (a flattened
  Arrow list column); values and lengths streams are auto-codec'd
  independently.
* ``int``       — a flat integer column.
* ``string``    — ``(blob: bytes, offsets: int64[])`` (Arrow string
  buffers).

The codec field records the chosen codec(s), like the reference's 2-bit
STORED/COMPRESSED attr (``src/lib_bra_defs.h:64-69``) generalized to a
codec name.
"""

from __future__ import annotations

import numpy as np

from ..codecs.cost import encode_int_auto, encode_str_auto
from ..codecs.framing import pack_frames, unpack_frames
from ..codecs.intcodecs import decode_int
from ..codecs.strcodecs import decode_str

__all__ = ["encode_column", "decode_column"]


def encode_column(name: str, kind: str, data,
                  codecs: tuple[str, ...] | None = None,
                  str_codecs: tuple[str, ...] | None = None) -> dict:
    if kind == "int_list":
        values, lengths = data
        vcodec, vp, vb = encode_int_auto(values, codecs)
        lcodec, lp, lb = encode_int_auto(lengths, codecs)
        params = pack_frames([vcodec.encode(), vp, lcodec.encode(), lp])
        payload = pack_frames([vb, lb])
        orig = 4 * len(values) + 4 * len(lengths)
    elif kind == "int":
        codec, p, b = encode_int_auto(data, codecs)
        params = pack_frames([codec.encode(), p])
        payload = b
        orig = 4 * len(data)
        vcodec = codec
        lcodec = ""
    elif kind == "string":
        blob, offsets = data
        codec, p, b = encode_str_auto(blob, offsets, str_codecs)
        params = pack_frames([codec.encode(), p])
        payload = b
        orig = len(blob) + 4 * (len(offsets) - 1)
        vcodec = codec
        lcodec = ""
    else:
        raise ValueError(f"unknown column kind {kind!r}")
    codec_tag = f"{vcodec}+{lcodec}" if kind == "int_list" else vcodec
    return {
        "name": name,
        "kind": kind,
        "codec": codec_tag,
        "params": params,
        "payload": payload,
        "orig_bytes": int(orig),
        "enc_bytes": len(params) + len(payload),
    }


def decode_column(entry: dict):
    kind = entry["kind"]
    params = entry["params"]
    payload = entry["payload"]
    if kind == "int_list":
        vc, vp, lc, lp = unpack_frames(params, 4)
        vb, lb = unpack_frames(payload, 2)
        values = decode_int(vc.decode(), vp, vb)
        lengths = decode_int(lc.decode(), lp, lb)
        return values, lengths
    if kind == "int":
        c, p = unpack_frames(params, 2)
        return decode_int(c.decode(), p, payload)
    if kind == "string":
        c, p = unpack_frames(params, 2)
        return decode_str(c.decode(), p, payload)
    raise ValueError(f"unknown column kind {kind!r}")
