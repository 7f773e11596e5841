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
* ``binary``    — same layout as ``string`` but opaque bytes (the
  reference's actual data model — raw byte streams,
  ``src/io/lib_bra_io_file_chunks.c:169``): multimodal payloads,
  serialized blobs.
* ``float_list`` / ``double_list`` — ``(values: float[], lengths)``
  (embedding vectors); values go through the float suite
  (byte-shuffle + zstd), bit-exact.
* ``float``     — a flat float64 column.
* ``bool``      — a flat boolean column, mapped to a 0/1 int stream
  (RLE/bit-pack are natural fits).
* ``date`` / ``timestamp`` / ``decimal(p,s)`` — temporal and decimal
  columns, mapped losslessly to integer streams (date32 days,
  timestamp[us] epoch micros, decimal unscaled value with p <= 18) and
  run through the int codec suite — delta/FOR are natural fits for
  sorted-ish temporal data. The reference compresses arbitrary bytes
  (``src/io/lib_bra_io_file_chunks.c:169-312``); these kinds close the
  gap for the typed columns every real table carries (VERDICT r2
  "missing" #2).

The codec field records the chosen codec(s), like the reference's 2-bit
STORED/COMPRESSED attr (``src/lib_bra_defs.h:64-69``) generalized to a
codec name.

Null handling: columns with nulls are wrapped at the entry level — the
codec tag gains an ``nv.`` prefix and ``params`` grows two LSB-ordered
validity bitmaps (row-level, and element-level for ``int_list``
children), 1 bit per slot via ``np.packbits``. The inner codecs never
see nulls (null slots are normalized to zero/empty before encoding, so
chunk bytes stay deterministic for content addressing); decode
re-applies the masks as Arrow validity buffers. The reference, which
compresses raw byte streams, has no null concept — this is a new
obligation of the columnar re-expression.
"""

from __future__ import annotations

import numpy as np

from ..codecs.cost import encode_int_auto, encode_str_auto
from ..codecs.floatcodecs import decode_float, encode_float_auto
from ..codecs.framing import pack_frames, unpack_frames
from ..codecs.intcodecs import decode_int
from ..codecs.strcodecs import decode_str

__all__ = ["encode_column", "decode_column", "decode_column_rows",
           "int_like", "decimal_ps"]


def int_like(kind: str) -> bool:
    """Kinds whose chunk representation is a flat int64 stream."""
    return kind in ("int", "date", "timestamp", "bool") \
        or kind.startswith("decimal")


def decimal_ps(kind: str) -> tuple[int, int]:
    """``"decimal(p,s)"`` -> (precision, scale); p <= 18 enforced at
    extract time (the unscaled value must fit an int64 lane)."""
    inner = kind[kind.index("(") + 1:kind.rindex(")")]
    p, s = inner.split(",")
    return int(p), int(s)


def _pack_mask(valid) -> bytes:
    """bool validity array -> Arrow-compatible LSB-first bitmap bytes."""
    if valid is None:
        return b""
    return np.packbits(np.asarray(valid, dtype=bool),
                       bitorder="little").tobytes()


def _unpack_mask(raw: bytes, n: int):
    if not raw:
        return None
    return np.unpackbits(np.frombuffer(raw, np.uint8), count=n,
                         bitorder="little").astype(bool)


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
                  gdict=None, validity=None) -> dict:
    """Encode one column chunk; ``validity`` is None (no nulls) or a
    ``(row_valid, elem_valid)`` pair of bool arrays / None."""
    if kind == "int_list":
        values, lengths = data
        vcodec, vp, vb = _encode_int_maybe_gdict(values, codecs, gdict)
        lcodec, lp, lb = encode_int_auto(lengths, codecs)
        params = pack_frames([vcodec.encode(), vp, lcodec.encode(), lp])
        payload = pack_frames([vb, lb])
        orig = 4 * len(values) + 4 * len(lengths)
    elif int_like(kind):
        codec, p, b = encode_int_auto(data, codecs)
        params = pack_frames([codec.encode(), p])
        payload = b
        orig = {"int": 4, "date": 4, "timestamp": 8,
                "bool": 1}.get(kind, 16) * len(data)
        vcodec = codec
        lcodec = ""
    elif kind in ("string", "binary"):
        blob, offsets = data
        codec, p, b = encode_str_auto(blob, offsets, str_codecs)
        params = pack_frames([codec.encode(), p])
        payload = b
        orig = len(blob) + 4 * (len(offsets) - 1)
        vcodec = codec
        lcodec = ""
    elif kind in ("float_list", "double_list"):
        values, lengths = data
        vcodec, vp, vb = encode_float_auto(values, codecs)
        lcodec, lp, lb = encode_int_auto(lengths, None)
        params = pack_frames([vcodec.encode(), vp, lcodec.encode(), lp])
        payload = pack_frames([vb, lb])
        orig = values.nbytes + 4 * len(lengths)
    elif kind == "float":
        codec, p, b = encode_float_auto(data, codecs)
        params = pack_frames([codec.encode(), p])
        payload = b
        orig = np.asarray(data).nbytes
        vcodec = codec
        lcodec = ""
    else:
        raise ValueError(f"unknown column kind {kind!r}")
    codec_tag = f"{vcodec}+{lcodec}" \
        if kind in ("int_list", "float_list", "double_list") else vcodec
    if validity is not None and any(v is not None for v in validity):
        row_valid, elem_valid = validity
        codec_tag = f"nv.{codec_tag}"
        params = pack_frames([_pack_mask(row_valid),
                              _pack_mask(elem_valid), params])
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
    """Decode one column entry -> ``(data, validity)`` where validity
    is None or ``(row_valid, elem_valid)`` (each a bool array or None)."""
    kind = entry["kind"]
    params = entry["params"]
    payload = entry["payload"]
    row_raw = elem_raw = b""
    if entry["codec"].startswith("nv."):
        row_raw, elem_raw, params = unpack_frames(params, 3)
    if kind == "int_list":
        vc, vp, lc, lp = unpack_frames(params, 4)
        vb, lb = unpack_frames(payload, 2)
        values = _decode_int_maybe_gdict(vc.decode(), vp, vb, gdict)
        lengths = decode_int(lc.decode(), lp, lb)
        validity = _wrap_validity(row_raw, len(lengths),
                                  elem_raw, len(values))
        return (values, lengths), validity
    if int_like(kind):
        c, p = unpack_frames(params, 2)
        values = decode_int(c.decode(), p, payload)
        return values, _wrap_validity(row_raw, len(values), b"", 0)
    if kind in ("string", "binary"):
        c, p = unpack_frames(params, 2)
        blob, offsets = decode_str(c.decode(), p, payload)
        return (blob, offsets), \
            _wrap_validity(row_raw, len(offsets) - 1, b"", 0)
    if kind in ("float_list", "double_list"):
        vc, vp, lc, lp = unpack_frames(params, 4)
        vb, lb = unpack_frames(payload, 2)
        values = decode_float(vc.decode(), vp, vb)
        lengths = decode_int(lc.decode(), lp, lb)
        validity = _wrap_validity(row_raw, len(lengths),
                                  elem_raw, len(values))
        return (values, lengths), validity
    if kind == "float":
        c, p = unpack_frames(params, 2)
        values = decode_float(c.decode(), p, payload)
        return values, _wrap_validity(row_raw, len(values), b"", 0)
    raise ValueError(f"unknown column kind {kind!r}")


def decode_column_rows(entry: dict, rows, gdict=None) -> list:
    """Random-access decode of selected ``rows`` from a string/binary
    entry.

    For ``fsst`` entries this is TRUE random access — only the selected
    strings' encoded segments are parsed
    (``codecs.strcodecs.fsst_rows_from_entry``), the chunk's other
    strings are never decoded; the cluster-scale analog of the
    reference's skip-without-decode (``src/io/lib_bra_io_file_ctx.c:596-602``)
    taken down to row granularity, per the FSST paper's promise. Other
    codecs decode the chunk and slice.

    Returns a list of ``bytes | None`` (None for null rows; decoded
    UTF-8 is not re-decoded to str — callers own the text semantics).
    """
    from ..codecs.strcodecs import fsst_rows_from_entry

    kind = entry["kind"]
    if kind not in ("string", "binary"):
        raise ValueError(f"row access is for string/binary, got {kind!r}")
    rows = np.asarray(rows, np.int64)
    params = entry["params"]
    codec = entry["codec"]
    row_valid = None
    if codec.startswith("nv."):
        row_raw, _elem_raw, params = unpack_frames(params, 3)
        if row_raw:
            # need only the selected rows' validity; unpack to the max
            # selected index
            hi = int(rows.max()) + 1 if len(rows) else 0
            row_valid = _unpack_mask(row_raw, hi)
    c_raw, inner = unpack_frames(params, 2)
    if c_raw.decode() == "fsst":
        vals = fsst_rows_from_entry(inner, entry["payload"], rows)
    else:
        blob, offsets = decode_str(c_raw.decode(), inner,
                                   entry["payload"])
        mv = memoryview(blob)
        vals = [bytes(mv[offsets[r]:offsets[r + 1]]) for r in rows]
    if row_valid is not None:
        vals = [v if row_valid[r] else None
                for v, r in zip(vals, rows)]
    return vals


def _wrap_validity(row_raw: bytes, n_rows: int,
                   elem_raw: bytes, n_elems: int):
    if not row_raw and not elem_raw:
        return None
    return (_unpack_mask(row_raw, n_rows), _unpack_mask(elem_raw, n_elems))
