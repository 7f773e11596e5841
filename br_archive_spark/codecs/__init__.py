"""Codec suite: lightweight columnar codecs + sampled cost model."""

from .bitpack import bits_needed, pack_uint, unpack_uint
from .cost import (choose_int_codec, encode_int_auto, encode_str_auto,
                   int_chunk_stats)
from .gdict import (GlobalDict, build_global_dict, load_global_dict,
                    save_global_dict)
from .intcodecs import INT_CODECS, ZSTD_AVAILABLE, decode_int, encode_int
from .strcodecs import (STR_CODECS, decode_str, encode_str,
                        fsst_decode, fsst_decode_rows, fsst_decode_strings,
                        fsst_encode, fsst_encode_strings,
                        fsst_rows_from_entry, fsst_train,
                        strings_from_arrow)

__all__ = [
    "bits_needed", "pack_uint", "unpack_uint",
    "encode_int", "decode_int", "INT_CODECS",
    "encode_str", "decode_str", "STR_CODECS",
    "fsst_train", "fsst_encode", "fsst_decode",
    "fsst_encode_strings", "fsst_decode_strings", "fsst_decode_rows",
    "fsst_rows_from_entry", "strings_from_arrow",
    "choose_int_codec", "encode_int_auto", "encode_str_auto",
    "int_chunk_stats", "ZSTD_AVAILABLE",
    "GlobalDict", "build_global_dict", "save_global_dict",
    "load_global_dict",
]
