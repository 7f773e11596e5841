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


def _encode_int_maybe_gdict(values, codecs, gdict):
    """Try the global-dictionary transform; fall back to self-contained.

    With a gdict, values map to frequency ranks through the broadcast
    LUT and only the *rank stream* is codec'd — the chunk stores a
    dictionary reference instead of the dictionary (codec tag
    ``gdict.<inner>``). Values outside the dict (stale dict on resume)
    take the ordinary per-chunk path — the never-worse contract of the
    reference's STORED fallback (``src/io/lib_bra_io_file_chunks.c:268-297``).
    """
    if gdict is not None:
        ranks = gdict.encode_values(np.asarray(values))
        if ranks is not None:
            inner, p, b = encode_int_auto(ranks, codecs)
            return f"gdict.{inner}", \
                pack_frames([gdict.dict_id.encode(), p]), b
    return encode_int_auto(values, codecs)


def _decode_int_maybe_gdict(codec: str, params: bytes, payload: bytes,
                            gdict):
    if codec.startswith("gdict."):
        did_raw, p = unpack_frames(params, 2)
        did = did_raw.decode()
        if gdict is None:
            raise ValueError(
                f"chunk was encoded with global dictionary {did}; "
                "pass global_dict= to decode")
        if gdict.dict_id != did:
            raise ValueError(
                f"global dictionary mismatch: chunk needs {did}, "
                f"got {gdict.dict_id}")
        return gdict.decode_values(decode_int(codec[6:], p, payload))
    return decode_int(codec, params, payload)


def encode_column(name: str, kind: str, data,
                  codecs: tuple[str, ...] | None = None,
                  str_codecs: tuple[str, ...] | None = None,
                  gdict=None) -> dict:
    if kind == "int_list":
        values, lengths = data
        vcodec, vp, vb = _encode_int_maybe_gdict(values, codecs, gdict)
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


def decode_column(entry: dict, gdict=None):
    kind = entry["kind"]
    params = entry["params"]
    payload = entry["payload"]
    if kind == "int_list":
        vc, vp, lc, lp = unpack_frames(params, 4)
        vb, lb = unpack_frames(payload, 2)
        values = _decode_int_maybe_gdict(vc.decode(), vp, vb, gdict)
        lengths = decode_int(lc.decode(), lp, lb)
        return values, lengths
    if kind == "int":
        c, p = unpack_frames(params, 2)
        return decode_int(c.decode(), p, payload)
    if kind == "string":
        c, p = unpack_frames(params, 2)
        return decode_str(c.decode(), p, payload)
    raise ValueError(f"unknown column kind {kind!r}")
