"""br_archive_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of the reference archiver
(Raffaello/br-archive, C: BWT→MTF→RLE→Huffman over 256 KiB chunks,
``src/io/lib_bra_io_file_chunks.c:215-245``) as an idiomatic Spark DataFrame
job over tables of pre-tokenized training sequences
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``.

The codec suite is columnar and lightweight — dictionary, run-length,
frame-of-reference + bit-packing, delta, and FSST-style string compression —
selected per column chunk by a sampled cost model inside vectorized
Arrow UDFs (``mapInArrow``), mirroring the reference's stored-vs-compressed
decision (``src/io/lib_bra_io_file_chunks.c:268-297``) as a
cost-before-commit rule instead of an encode-then-redo loop.

Nothing in this package is a translation of the reference's C code; the
reference defines WHAT is computed (round-trip-exact chunked compression
with integrity checksums and a per-chunk codec decision), this package
decides HOW using Spark's execution model.
"""

__version__ = "0.1.0"
