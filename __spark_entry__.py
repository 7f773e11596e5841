"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine (br_archive_spark) through the driver's harness:
``entry(spark)`` smoke-runs the flagship encode→report pipeline;
``queries()`` maps every implemented operator from SURVEY.md §2 (plus
the training-pipeline operator suite) to a (spark, sf_dir) callable;
``oracle_sql()`` provides DuckDB-equivalent SQL for each
SQL-expressible query.

Cross-engine determinism rules used throughout:
* money/measures → exact integer cents (``CAST(ROUND(x*100) AS BIGINT)``),
  never float aggregates;
* timestamps → formatted strings;
* every computed column aliased identically in Spark and SQL.
Round-trip queries prove the codec engine: Spark side encodes with the
full codec suite and decodes back; the oracle is the identity SELECT —
any encode/decode defect breaks the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _cents(col):
    return F.round(col * 100).cast("long")


# --------------------------------------------------------------------
# engine round-trips (codec suite correctness against identity oracles)
# --------------------------------------------------------------------

def _lineitem_token_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize lineitem: one doc per order, tokens = l_partkey sequence
    ordered by l_linenumber — an int32 token corpus with a clean SQL
    definition."""
    li = _read(spark, sf_dir, "lineitem")
    return (li.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_list(
                F.struct("l_linenumber", "l_partkey"))).alias("s"))
            .select(F.col("l_orderkey").cast("string").alias("doc_id"),
                    F.transform("s", lambda x: x["l_partkey"]
                                .cast("int")).alias("tokens"))
            .withColumn("n_tok", F.size("tokens"))
            .withColumn("source", F.lit("lineitem")))


def q_roundtrip_lineitem_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from br_archive_spark.operators import decode_table, encode_table

    tok = _lineitem_token_table(spark, sf_dir)
    enc = encode_table(tok, num_parts=8, target_values=1 << 18)
    dec = decode_table(enc)
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token")))


def q_roundtrip_documents_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from br_archive_spark.operators import decode_table, encode_table

    docs = (_read(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    "text", "lang", "source"))
    specs = [("doc_id", "string"), ("text", "string"),
             ("lang", "string"), ("source", "string")]
    enc = encode_table(docs, specs=specs, num_parts=4)
    return decode_table(enc, specs=specs, with_n_tok=False)


def q_roundtrip_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-carrying round trip: row nulls in a string column, row AND
    element nulls in the token list column. Exercises the entry-level
    ``nv.`` validity wrapper (operators/chunk.py) end-to-end; the
    reference has no null concept (raw byte streams), so this is an
    obligation unique to the columnar re-expression."""
    from br_archive_spark.operators import decode_table, encode_table

    docs = _read(spark, sf_dir, "documents")
    src = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(F.col("doc_id") % 11 == 0, None).otherwise(
            F.transform(
                F.sequence(F.lit(1),
                           (F.col("n_chars") % 13 + 1).cast("int")),
                lambda x: F.when(x % 5 == 0, None)
                .otherwise((x + F.col("doc_id") % 97).cast("int")))
        ).alias("tokens"),
        F.when(F.col("n_chars") % 7 == 0, None)
        .otherwise(F.col("lang")).alias("lang"),
        F.when(F.col("n_chars") % 3 == 0, None)
        .otherwise(F.col("source")).alias("source"))
    specs = [("doc_id", "string"), ("tokens", "int_list"),
             ("lang", "string"), ("source", "string")]
    enc = encode_table(src, specs=specs, num_parts=4)
    dec = decode_table(enc, specs=specs, with_n_tok=False)
    # normalize nulls to sentinels AFTER decode (a null dropped or
    # moved by the engine changes this output), then posexplode to
    # scalar (doc_id, pos, token) rows — list-typed output columns are
    # not canonicalizable by the driver's pandas sort (r2 lesson).
    norm = dec.select(
        "doc_id",
        F.when(F.col("tokens").isNull(),
               F.array(F.lit(-999).cast("int")))
        .otherwise(F.transform(
            "tokens", lambda x: F.coalesce(x, F.lit(-1).cast("int"))))
        .alias("tokens"),
        F.coalesce(F.col("lang"), F.lit("<null>")).alias("lang"),
        F.coalesce(F.col("source"), F.lit("<null>")).alias("source"))
    return (norm.select("doc_id",
                        F.posexplode("tokens").alias("pos", "token"),
                        "lang", "source")
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("int").alias("token"),
                    "lang", "source"))


def q_roundtrip_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """float_list round trip over the embeddings table — bit-exact IEEE
    floats through the float codec suite (byte-shuffle/zstd trial with
    plain fallback; codecs/floatcodecs.py). The reference has no typed
    float path; this covers the embedding columns a training-data
    pipeline stores next to tokens."""
    from br_archive_spark.operators import decode_table, encode_table

    emb = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("doc_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("long").alias("label"))
    specs = [("doc_id", "string"), ("embedding", "float_list"),
             ("label", "int")]
    enc = encode_table(emb, specs=specs, num_parts=4)
    dec = decode_table(enc, specs=specs, with_n_tok=False)
    # posexplode to scalar rows; float32 -> double is an EXACT IEEE
    # widening in both engines, so the value hash compares raw bits
    return (dec.select("doc_id", "label",
                       F.posexplode("embedding").alias("pos", "val"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("val").cast("double").alias("val"),
                    F.col("label").cast("long").alias("label")))


def q_roundtrip_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary-kind round trip: opaque byte payloads (the reference's
    actual data model — raw byte streams,
    src/io/lib_bra_io_file_chunks.c:169) through the same entry format.
    This is the path multimodal payload columns take."""
    from br_archive_spark.operators import decode_table, encode_table

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
        "source")
    specs = [("doc_id", "string"), ("payload", "binary"),
             ("source", "string")]
    enc = encode_table(docs, specs=specs, num_parts=4)
    dec = decode_table(enc, specs=specs, with_n_tok=False)
    # md5 the round-tripped bytes: any flipped payload byte breaks the
    # hash, and the output is a scalar hex string the driver can sort
    return dec.select("doc_id", F.md5("payload").alias("payload_md5"),
                      "source")


def q_roundtrip_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table round trip of raw TPC-H orders through auto-inferred
    specs — exercises the temporal (date32 days / timestamp[us] micros)
    and decimal (unscaled-int64) kinds added in r3, plus the bool kind (0/1 int lane) (VERDICT r2
    "missing" #2; the reference compresses arbitrary bytes,
    src/io/lib_bra_io_file_chunks.c:169-312). Output formats temporal/
    decimal values to engine-portable scalars; the round-trip itself is
    typed and bit-exact (pytest: test_temporal_decimal.py)."""
    from br_archive_spark.operators import (decode_table, encode_table,
                                            infer_specs)

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_price"),
        F.col("o_orderdate").alias("o_ts"),
        F.col("o_orderdate").cast("date").alias("o_date"),
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").alias("is_fulfilled"))
    specs = infer_specs(orders)
    enc = encode_table(orders, specs=specs, num_parts=4)
    dec = decode_table(enc, specs=specs, with_n_tok=False)
    return dec.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        (F.col("o_price") * 100).cast("long").alias("price_cents"),
        F.date_format("o_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.date_format(F.col("o_date").cast("timestamp"),
                      "yyyy-MM-dd").alias("date_str"),
        "o_orderpriority", "is_fulfilled")


def q_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest listing (the reference's `unbra -l`,
    src/io/lib_bra_io_file_ctx.c:701-804) — per-column codec totals.
    Values depend on the engine's codec choices → rows-only check."""
    from br_archive_spark.operators import compression_report, encode_table

    tok = _lineitem_token_table(spark, sf_dir)
    enc = encode_table(tok, num_parts=8, target_values=1 << 18)
    return compression_report(enc)


def q_roundtrip_hash_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same round-trip through the mode='hash' (content-addressed
    shuffle) encode path."""
    from br_archive_spark.operators import decode_table, encode_table

    tok = _lineitem_token_table(spark, sf_dir)
    enc = encode_table(tok, mode="hash", num_parts=8,
                       target_values=1 << 18)
    dec = decode_table(enc)
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token")))


def q_roundtrip_fsst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip with the FSST codec forced on string columns
    (prefix-heavy doc ids are FSST's home turf)."""
    from br_archive_spark.operators import decode_table, encode_table

    docs = (_read(spark, sf_dir, "documents")
            .select(F.concat(F.lit("document-id-"),
                             F.col("doc_id").cast("string"))
                    .alias("doc_id"), "text"))
    specs = [("doc_id", "string"), ("text", "string")]
    enc = encode_table(docs, specs=specs, str_codecs=("fsst",))
    return decode_table(enc, specs=specs, with_n_tok=False)


def q_roundtrip_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the full bulk path: `encode_files` reads
    (file, row-group) units in-process and writes manifest shards
    in-process (payload bytes cross zero process boundaries), then
    `decode_files` reads the shards back the same way. The 100 TB
    path end-to-end."""
    import tempfile

    from br_archive_spark.operators import decode_files, encode_files

    tok = _lineitem_token_table(spark, sf_dir)
    # encode_files reads parquet files: materialize the token table once
    tmp = tempfile.mkdtemp(prefix="bra_direct_")
    path = f"{tmp}/tok.parquet"
    tok.write.mode("overwrite").parquet(path)
    encode_files(spark, path, target_values=1 << 18,
                 output_dir=f"{tmp}/man").collect()
    dec = decode_files(spark, f"{tmp}/man")
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token")))


def q_roundtrip_global_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the job-level shared dictionary: one
    distributed frequency count builds a frequency-ranked GlobalDict,
    chunks store only a dict reference (codec ``gdict.*``), decode maps
    ranks back through the broadcast LUT. Amortizes per-chunk dictionary
    metadata across the whole table (SURVEY §2.1 E7's
    canonical-lengths-as-metadata, table-scaled)."""
    from br_archive_spark.codecs.gdict import build_global_dict
    from br_archive_spark.operators import decode_table, encode_table

    tok = _lineitem_token_table(spark, sf_dir)
    gd = build_global_dict(tok, "tokens")
    enc = encode_table(tok, num_parts=8, target_values=1 << 18,
                       global_dict=gd)
    dec = decode_table(enc, global_dict=gd)
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token")))


def q_random_access_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookups against the encoded table: zone-map chunk pruning +
    decode of surviving chunks only (the reference's skip-without-decode
    at cluster scale)."""
    from br_archive_spark.operators import encode_table, lookup_docs

    tok = _lineitem_token_table(spark, sf_dir)
    enc = encode_table(tok, mode="hash", num_parts=8,
                       target_values=1 << 16)
    wanted = [str(k) for k in (1, 7, 32, 33, 1000, 4711)]
    out = lookup_docs(enc, wanted)
    return (out.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token")))


def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership pruning via the per-chunk key bloom
    (operators/bloom.py, r3): on a HASH layout every partition spans
    the full key range, so the min/max zone map keeps every chunk —
    the bloom's Catalyst bit tests (literal element_at/mask probes on
    the manifest scan, no payload bytes) prune to the chunks that can
    actually hold the keys, and the absent probes (ids that exist in
    no document) return zero rows without decoding the table. A bloom
    false positive costs one wasted chunk decode, never a wrong row —
    the oracle checks exact results for the present keys and absence
    for the rest."""
    from br_archive_spark.operators import encode_table, lookup_docs

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    enc = encode_table(docs, specs=[("doc_id", "string"),
                                    ("text", "string")],
                       mode="hash", num_parts=8, target_values=1 << 13)
    wanted = ["3", "77", "210", "499",          # present at sf>=0.01
              "3x-absent", "77-absent"]         # inside the lex range
    out = lookup_docs(enc, wanted,
                      specs=[("doc_id", "string"), ("text", "string")],
                      with_n_tok=False)
    return out.select("doc_id", F.md5("text").alias("text_md5"))


def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan over the encoded table: zone-map pruning keeps the
    decode to chunks overlapping [lo, hi] (the range form of the
    reference's skip-without-decode, src/io/lib_bra_io_file_ctx.c:596)."""
    from br_archive_spark.operators import encode_table, lookup_range

    tok = _lineitem_token_table(spark, sf_dir)
    enc = encode_table(tok, mode="range", num_parts=8,
                       target_values=1 << 16)
    out = lookup_range(enc, "20", "2100")
    return (out.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token")))


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROP + RENAME + ADD COLUMN on an encoded manifest without
    re-encoding surviving entries (operators/evolve.py, r3): encode
    (doc_id, tokens, source); drop `source` (metadata + checksum
    rewrite only — payload bytes untouched); rename `tokens`→`toks`
    (pure metadata); ADD `dmod` keyed by doc_id (key-entry decode +
    key join + fresh entry splice, chunk checksum recomputed); decode
    WITH checksum verification under the evolved schema. The oracle is
    the equivalent SELECT: any corruption introduced by any of the
    three ops breaks the value hash. The reference cannot express
    this — removing an archive member means rewriting the archive
    (lib_bra_io_file_meta_entries.c); chunk-granular entries make
    drop/rename O(metadata) and add O(one new column)."""
    from br_archive_spark.operators import (add_column, decode_table,
                                            drop_columns, encode_table,
                                            rename_column)

    tok = _lineitem_token_table(spark, sf_dir).withColumn(
        "source", F.lit("lineitem"))
    specs = [("doc_id", "string"), ("tokens", "int_list"),
             ("source", "string")]
    enc = encode_table(tok, specs=specs, num_parts=8,
                       target_values=1 << 18)
    evolved = rename_column(drop_columns(enc, ["source"]),
                            "tokens", "toks")
    vals = tok.select("doc_id").distinct().withColumn(
        "dmod", F.col("doc_id").cast("long") % 7)
    evolved = add_column(evolved, vals, "dmod", "int", key="doc_id")
    dec = decode_table(evolved, specs=[("doc_id", "string"),
                                       ("toks", "int_list"),
                                       ("dmod", "int")],
                       verify_checksums=True)
    return (dec.select("doc_id", "dmod", F.posexplode("toks")
                       .alias("pos", "token"))
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("long").alias("token"),
                    F.col("dmod").cast("long").alias("dmod")))


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert on an encoded manifest (operators/evolve.py::
    upsert_rows, r3): every 10th document is replaced with an updated
    body and two brand-new documents are inserted — a chunk-granular
    copy-on-write delete (zone-map-pruned) plus fresh chunks for the
    batch. Decode runs WITH checksum verification; the oracle computes
    the same merge in SQL, so a corrupted rewrite, a lost row, or a
    chunk-id collision all break the value hash."""
    from br_archive_spark.operators import (decode_table, encode_table,
                                            upsert_rows)

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    specs = [("doc_id", "string"), ("text", "string")]
    enc = encode_table(docs, specs=specs, mode="range", key="doc_id",
                       num_parts=4, target_values=1 << 13)
    updates = (docs.where(F.col("doc_id").cast("long") % 10 == 0)
               .select("doc_id",
                       F.concat(F.lit("UPDATED:"), "doc_id")
                       .alias("text")))
    inserts = spark.createDataFrame(
        [("new-a", "inserted document a"),
         ("new-b", "inserted document b")], "doc_id string, text string")
    out = upsert_rows(enc, updates.unionByName(inserts), key="doc_id",
                      specs=specs, num_parts=2)
    return decode_table(out, specs=specs, with_n_tok=False,
                        verify_checksums=True)


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot log + time travel (operators/snapshots.py): commit v1,
    MERGE-commit v2 (chunk-granular COW upsert — only rewritten chunks
    land in v2's append-only seq directory), then read BOTH snapshots
    back — v1 must still decode to the pre-merge table byte-for-byte
    (checksum-verified) while the head shows the merge. The oracle
    reproduces both versions in SQL, so a commit that leaks v2 chunks
    into v1 (or loses v1 chunks) breaks the value hash."""
    import tempfile

    from br_archive_spark.operators import (commit_snapshot, decode_table,
                                            encode_table, load_snapshot,
                                            upsert_rows)

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    specs = [("doc_id", "string"), ("text", "string")]
    tbl = tempfile.mkdtemp(prefix="bra_snap_")
    enc = encode_table(docs, specs=specs, mode="range", key="doc_id",
                       num_parts=4, target_values=1 << 13)
    r1 = commit_snapshot(enc, tbl, op="encode")
    updates = (docs.where(F.col("doc_id").cast("long") % 10 == 0)
               .select("doc_id",
                       F.concat(F.lit("UPDATED:"), "doc_id")
                       .alias("text")))
    inserts = spark.createDataFrame(
        [("new-a", "inserted document a"),
         ("new-b", "inserted document b")], "doc_id string, text string")
    man2 = upsert_rows(load_snapshot(spark, tbl),
                       updates.unionByName(inserts), key="doc_id",
                       specs=specs, num_parts=2)
    commit_snapshot(man2, tbl, op="upsert")
    v1 = decode_table(load_snapshot(spark, tbl, r1["snapshot_id"]),
                      specs=specs, with_n_tok=False,
                      verify_checksums=True)
    v2 = decode_table(load_snapshot(spark, tbl), specs=specs,
                      with_n_tok=False, verify_checksums=True)
    return (v1.withColumn("version", F.lit(1).cast("int"))
            .unionByName(v2.withColumn("version", F.lit(2).cast("int"))))


def q_tokenize_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full upstream pipeline: raw documents → frequency-ranked
    tokenization (functions/text.py::tokenize_corpus — engine-portable
    regex, rank 1 = most frequent word, OOV→0, vocab driver-capped
    like build_global_dict) → encode → decode → exact token equality.
    One plan end to end: the word count is one map-side-combined
    aggregate, id mapping a broadcast join, the per-doc re-collect the
    single content shuffle; then the token arrays ride the normal
    codec suite."""
    from br_archive_spark.functions.text import tokenize_corpus
    from br_archive_spark.operators import decode_table, encode_table

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source")
    tok, _vocab = tokenize_corpus(docs, vocab_size=512)
    enc = encode_table(tok, num_parts=4, target_values=1 << 15)
    dec = decode_table(enc)
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"), "source")
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("int").alias("token"), "source"))


def q_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC between snapshots (operators/snapshots.py::
    snapshot_diff): commit v1, MERGE-commit v2, then read the change
    feed v1→v2 from the index symmetric difference — only the chunks
    present in exactly one snapshot decode, so the cost is
    delta-proportional (a 0.1%-of-chunks MERGE diffs 0.2% of the
    table, never two full scans). Carried-over COW rows decode on
    both sides and cancel in the full-row anti-joins; the oracle is
    the exact expected add/del row set."""
    import tempfile

    from br_archive_spark.operators import (commit_snapshot, encode_table,
                                            load_snapshot, snapshot_diff,
                                            upsert_rows)

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    specs = [("doc_id", "string"), ("text", "string")]
    tbl = tempfile.mkdtemp(prefix="bra_cdc_")
    enc = encode_table(docs, specs=specs, mode="range", key="doc_id",
                       num_parts=4, target_values=1 << 13)
    r1 = commit_snapshot(enc, tbl, op="encode")
    updates = (docs.where(F.col("doc_id").cast("long") % 10 == 0)
               .select("doc_id",
                       F.concat(F.lit("UPDATED:"), "doc_id")
                       .alias("text")))
    inserts = spark.createDataFrame(
        [("new-a", "inserted document a"),
         ("new-b", "inserted document b")], "doc_id string, text string")
    man2 = upsert_rows(load_snapshot(spark, tbl),
                       updates.unionByName(inserts), key="doc_id",
                       specs=specs, num_parts=2)
    r2 = commit_snapshot(man2, tbl, op="upsert")
    return snapshot_diff(spark, tbl, r1["snapshot_id"],
                         r2["snapshot_id"], specs=specs)


def q_numeric_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric zone-map scan (r3): every int-backed column records
    per-chunk vmin/vmax in the payload-free ``column_stats``;
    ``scan_range`` prunes non-overlapping chunks BEFORE any payload
    decode — the value-range generalization of the reference's
    skip-without-decode (src/io/lib_bra_io_file_ctx.c:596-602), and
    the engine-side analog of parquet row-group statistics. The table
    is range-clustered on the probed decimal column so chunk bounds
    are near-disjoint and a narrow band decodes O(band) chunks."""
    from br_archive_spark.operators import (encode_table, infer_specs,
                                            scan_range)

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_price"),
        F.col("o_orderdate").cast("date").alias("o_date"))
    clustered = (orders.repartitionByRange(8, "o_price")
                 .sortWithinPartitions("o_price"))
    specs = infer_specs(clustered)
    enc = encode_table(clustered, specs=specs, mode="scan",
                       target_values=1 << 12)
    out = scan_range(enc, "o_price", 50_000_00, 80_000_00,
                     specs=specs, with_n_tok=False)
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        (F.col("o_price") * 100).cast("long").alias("price_cents"),
        F.date_format(F.col("o_date").cast("timestamp"),
                      "yyyy-MM-dd").alias("date_str"))


def q_float_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float zone maps (r4): double columns record typed per-chunk
    fmin/fmax bounds in ``column_stats`` (NaN excluded, null bounds
    never prune) and ``scan_range`` skips non-overlapping chunks
    before any payload decode — parquet row-group float statistics
    re-expressed at the codec-chunk level. Output in integer cents so
    the cross-engine value hash is float-format-proof; the FILTER
    itself runs on raw doubles through the float stats lane."""
    from br_archive_spark.operators import (encode_table, infer_specs,
                                            scan_range)

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").alias("o_price"))
    clustered = (orders.repartitionByRange(8, "o_price")
                 .sortWithinPartitions("o_price"))
    specs = infer_specs(clustered)
    enc = encode_table(clustered, specs=specs, mode="scan",
                       target_values=1 << 12)
    out = scan_range(enc, "o_price", 50_000.0, 80_000.0,
                     specs=specs, with_n_tok=False)
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.round(F.col("o_price") * 100).cast("long")
        .alias("price_cents"))


def q_string_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String zone maps (r5): string columns record per-chunk
    truncate(16) smin/smax bounds in ``column_stats`` (Iceberg's
    truncated lower/upper-bound trick) and ``scan_range`` prunes
    chunks whose bounds prove the band empty before any payload
    decode — the reference's skip-without-decode
    (src/io/lib_bra_io_file_ctx.c:596-602) extended from the single
    key column to EVERY string column. c_name is 18 chars, longer
    than the 16-char truncation, so this exercises the loose-bound
    edge: smax is the bumped prefix and the residual filter owns
    exactness."""
    from br_archive_spark.operators import (encode_table, infer_specs,
                                            scan_range)

    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    clustered = (cust.repartitionByRange(8, "c_name")
                 .sortWithinPartitions("c_name"))
    specs = infer_specs(clustered)
    enc = encode_table(clustered, specs=specs, mode="scan",
                       target_values=1 << 10)
    out = scan_range(enc, "c_name",
                     "Customer#000000100", "Customer#000000499",
                     specs=specs, with_n_tok=False)
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name", "c_mktsegment")


def q_bloom_int_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int-column bloom point lookup (r5): per-chunk membership blooms
    over the distinct values of every scalar int column
    (``column_stats.bloom``, operators/bloom.py) answer "definitely
    not in this chunk" on a HASH layout — where every partition spans
    the full o_orderkey range and min/max zone maps cannot prune.
    ``lookup_values`` bit-tests the bloom words in pure Catalyst, then
    decodes only surviving chunks. Probe keys are the 4 smallest + 4
    largest orderkeys (driver-side metadata collect) plus two absent
    sentinels (0, -5) the bloom must reject without any decode —
    membership pruning as the reference's skip-without-decode
    (src/io/lib_bra_io_file_ctx.c:596-602) for point probes."""
    from br_archive_spark.operators import (encode_table, infer_specs,
                                            lookup_values)

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus")
    lo = [r[0] for r in orders.select("o_orderkey")
          .orderBy("o_orderkey").limit(4).collect()]
    hi = [r[0] for r in orders.select("o_orderkey")
          .orderBy(F.desc("o_orderkey")).limit(4).collect()]
    specs = infer_specs(orders)
    enc = encode_table(orders, specs=specs, mode="hash", num_parts=8,
                       key="o_orderkey", target_values=1 << 11)
    out = lookup_values(enc, "o_orderkey",
                        lo + hi + [0, -5],
                        specs=specs, with_n_tok=False)
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus")


def q_bloom_string_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-column bloom point lookup (r5): per-chunk membership
    blooms over the distinct values of every string column — the
    string twin of ``bloom_int_lookup``, same hash family as the key
    bloom. Customer encodes HASH-layout on c_custkey, so every chunk's
    truncate(16) smin/smax spans ~the whole c_name domain and the zone
    map cannot prune; the bloom answers "definitely not here" per
    chunk for a NON-key string column. Probes: 3 smallest + 3 largest
    names (metadata collect) plus two absent sentinels the blooms must
    reject without any decode."""
    from br_archive_spark.operators import (encode_table, infer_specs,
                                            lookup_values)

    cust = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    lo = [r[0] for r in cust.select("c_name")
          .orderBy("c_name").limit(3).collect()]
    hi = [r[0] for r in cust.select("c_name")
          .orderBy(F.desc("c_name")).limit(3).collect()]
    specs = infer_specs(cust)
    enc = encode_table(cust, specs=specs, mode="hash", num_parts=8,
                       key="c_custkey", target_values=1 << 11)
    out = lookup_values(enc, "c_name",
                        lo + hi + ["Customer#ABSENT", ""],
                        specs=specs, with_n_tok=False)
    return out.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name", "c_mktsegment")


def q_bloom_binary_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column bloom point lookup (r5): content-digest probes —
    the binary lane of the membership matrix. Documents carry an
    md5-of-text digest column (raw bytes); a HASH layout leaves no
    zone map to prune by (binary has none at all), so the per-chunk
    bloom over distinct byte values answers "digest definitely not in
    this chunk". Probes: three known docs' digests + an absent
    16-zero-byte sentinel the blooms must reject without any decode.
    Output re-hexes the digest so the cross-engine value hash compares
    strings, not raw blobs."""
    from br_archive_spark.operators import encode_table, lookup_values

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.to_binary(F.md5("text"), F.lit("hex")).alias("digest"),
        F.col("n_chars").cast("long").alias("n_chars"))
    probes = [r[0] for r in docs.where(
        F.col("doc_id").isin("7", "42", "99"))
        .select("digest").collect()]
    specs = [("doc_id", "string"), ("digest", "binary"),
             ("n_chars", "int")]
    enc = encode_table(docs, specs=specs, mode="hash", num_parts=8,
                       key="doc_id", target_values=1 << 10)
    out = lookup_values(enc, "digest", probes + [b"\x00" * 16],
                        specs=specs, with_n_tok=False)
    return out.select(
        "doc_id", F.lower(F.hex("digest")).alias("digest_hex"),
        F.col("n_chars").cast("long").alias("n_chars"))


def q_null_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-predicate scan (r5): the per-chunk ``null_count`` stats
    lane (recorded since r3 for aggregate pushdown) now also prunes
    ``IS NULL`` / ``IS NOT NULL`` scans — parquet/Iceberg's
    null_count row-group pruning, and the reference's
    skip-without-decode (src/io/lib_bra_io_file_ctx.c:596-602) for
    completeness audits. A derived note column is NULL exactly for
    low custkeys; range-clustering on custkey makes whole chunks
    fully-null or fully-populated, so the IS NOT NULL scan skips the
    all-null chunks from the manifest alone and the residual keeps
    the result exact."""
    from br_archive_spark.operators import encode_table, scan_where

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.when(F.col("o_custkey") >= 700, F.col("o_orderstatus"))
        .alias("status_note"))
    clustered = (orders.repartitionByRange(8, "ckey")
                 .sortWithinPartitions("ckey"))
    specs = [("okey", "int"), ("ckey", "int"),
             ("status_note", "string")]
    enc = encode_table(clustered, specs=specs, mode="scan", key="okey",
                       target_values=1 << 11)
    out = scan_where(enc, [], specs=specs, with_n_tok=False,
                     not_null_cols=["status_note"])
    return out.select(
        F.col("okey").cast("long").alias("okey"),
        F.col("ckey").cast("long").alias("ckey"), "status_note")


def q_in_list_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list scan (r5): ``scan_where isin=`` ANDs a multi-value
    equality band — the ``WHERE seg IN (...) AND key BETWEEN ...``
    shape every partitioned warehouse query has. Customers are
    range-clustered on c_mktsegment, so chunks are segment runs: the
    truncate(16) smin/smax envelope prunes segments outside
    [AUTOMOBILE, FURNITURE] and the membership blooms prune BUILDING
    inside the envelope; the ckey band then prunes within segment.
    Exact residual; equals the plain conjunctive filter."""
    from br_archive_spark.operators import encode_table, scan_where

    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("ckey"),
        "c_name", "c_mktsegment")
    clustered = (cust.repartitionByRange(8, "c_mktsegment")
                 .sortWithinPartitions("c_mktsegment", "ckey"))
    specs = [("ckey", "int"), ("c_name", "string"),
             ("c_mktsegment", "string")]
    enc = encode_table(clustered, specs=specs, mode="scan",
                       key="c_mktsegment", target_values=1 << 10)
    out = scan_where(enc, [("ckey", 100, 1200)], specs=specs,
                     with_n_tok=False,
                     isin={"c_mktsegment": ["AUTOMOBILE", "FURNITURE"]})
    return out.select(
        F.col("ckey").cast("long").alias("ckey"),
        "c_name", "c_mktsegment")


def q_ndv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-count sketches (r5): every sketchable column
    carries 1024 HyperLogLog registers in ``column_stats.hll``
    (operators/bloom.py — same distinct-value hashes as the
    membership blooms), merged by a partial-aggregatable per-register
    max, so ``ndv_encoded`` answers COUNT(DISTINCT col) from the
    manifest alone. The oracle is EXACT, so the query emits the exact
    NDV (decoded + countDistinct) only for columns whose manifest
    estimate lands within 10% of it (measured errors here: <=4.5%) —
    if the sketch ever drifts, rows vanish and the driver comparison
    goes red. Sketch accuracy is itself driver-checked."""
    from br_archive_spark.operators import (decode_table, encode_table,
                                            ndv_encoded)

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"))
    specs = [("okey", "int"), ("ckey", "int"),
             ("status", "string"), ("prio", "string")]
    enc = encode_table(orders, specs=specs, mode="hash", key="status",
                       num_parts=8, target_values=1 << 11).cache()
    cols = [n for n, _ in specs]
    exact = decode_table(enc, specs=specs, with_n_tok=False).agg(
        *[F.countDistinct(c).alias(c) for c in cols]).first()
    rows = []
    for name in cols:
        est = ndv_encoded(enc, name)
        if abs(est - exact[name]) <= 0.10 * exact[name]:
            rows.append((name, int(exact[name])))
    enc.unpersist()
    return spark.createDataFrame(rows, "column_name string, ndv long")


def q_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-counts lane (r5): each chunk stores its 16 most frequent
    lane values with EXACT counts (``column_stats.topk``);
    ``topk_encoded`` sums them per value — one explode + map-side
    combined hash agg, shuffle bounded by partitions x 16 — and
    reports a slack bound that is 0 whenever no chunk filled all 16
    slots. For categorical columns (status: 3 distinct, priority: 5)
    that makes the merged answer EXACTLY ``GROUP BY col``, straight
    from the manifest, no payload read. The query emits each column's
    distribution only when slack == 0, so a lane defect (truncation
    where none should exist, lost counts) drops rows and fails the
    exact oracle comparison."""
    from br_archive_spark.operators import encode_table, topk_encoded

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("prio"))
    specs = [("okey", "int"), ("status", "string"),
             ("prio", "string")]
    enc = encode_table(orders, specs=specs, mode="hash", key="status",
                       num_parts=8, target_values=1 << 11).cache()
    rows = []
    for col in ("status", "prio"):
        top, slack = topk_encoded(enc, col, k=8)
        if slack == 0:
            rows += [(col, v, int(c)) for v, c in top]
    enc.unpersist()
    return spark.createDataFrame(
        rows, "column_name string, v string, c long")


def q_hist_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity-histogram lane (r5): each chunk stores a 16-bucket
    equi-width histogram with EXACT counts (``column_stats.hist``),
    so ``hist_encoded`` answers ``COUNT(lo <= col <= hi)`` with
    RIGOROUS [min,max] bounds from the manifest alone — the
    selectivity probe that decides full-scan vs pruned-scan vs index
    at 100 TB without reading a payload byte. The oracle is exact, so
    the query emits each band's exact count (decoded) only when the
    manifest bracket contains it — and the full-domain band only when
    the bracket is EXACT (cmin == cmax == non-null count, every
    bucket fully contained). A lane defect drops rows and fails the
    driver comparison. Completes the manifest-as-index quartet:
    membership (bloom), cardinality (hll), distribution (topk),
    selectivity (hist)."""
    from br_archive_spark.operators import (decode_table, encode_table,
                                            hist_encoded)

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_totalprice").cast("double").alias("total"),
        F.col("o_orderpriority").alias("prio"))
    specs = [("okey", "int"), ("total", "float"), ("prio", "string")]
    enc = encode_table(orders, specs=specs, mode="hash", key="prio",
                       num_parts=8, target_values=1 << 11).cache()
    dec = decode_table(enc, specs=specs, with_n_tok=False).cache()
    rows = []
    for label, col, lo, hi in [
            ("okey_band", "okey", 100, 5000),
            ("total_band", "total", 50000.0, 150000.0)]:
        cmin, cmax = hist_encoded(enc, col, lo, hi)
        exact = dec.where((F.col(col) >= lo)
                          & (F.col(col) <= hi)).count()
        if cmin <= exact <= cmax:
            rows.append((label, int(exact)))
    cmin, cmax = hist_encoded(enc, "okey", -(1 << 63), (1 << 63) - 1)
    n = dec.count()
    if cmin == cmax == n:
        rows.append(("okey_full", int(n)))
    enc.unpersist()
    dec.unpersist()
    return spark.createDataFrame(rows, "band string, cnt long")


def q_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-only quantile bounds (r5): ``quantile_encoded``
    brackets the k-th smallest lane value (k = ceil(q*n)) by
    bisecting the CDF bounds the hist+qcut lanes give — a rigorous
    value bracket with no sort and no payload read, the
    layout/cut-point probe at 100 TB. The oracle is exact
    (ROW_NUMBER rank), so each (column, q) emits its exact k-th
    smallest only when the manifest bracket contains it — a defect
    in the CDF bracket or the bisection drops rows and fails the
    driver comparison."""
    from br_archive_spark.operators import (decode_table, encode_table,
                                            quantile_encoded)

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_orderpriority").alias("prio"))
    specs = [("okey", "int"), ("ckey", "int"), ("prio", "string")]
    enc = encode_table(orders, specs=specs, mode="hash", key="prio",
                       num_parts=8, target_values=1 << 11).cache()
    dec = decode_table(enc, specs=specs, with_n_tok=False).cache()
    n = dec.count()
    rows = []
    for col, q in [("okey", 0.5), ("okey", 0.9), ("ckey", 0.25),
                   ("ckey", 0.75)]:
        import math

        vlo, vhi = quantile_encoded(enc, col, q)
        k = min(n, max(1, int(math.ceil(q * n))))
        exact = dec.select(col).orderBy(col).limit(k) \
            .orderBy(F.col(col).desc()).first()[0]
        if vlo <= exact <= vhi:
            rows.append((f"{col}_p{int(q * 100)}", int(exact)))
    enc.unpersist()
    dec.unpersist()
    return spark.createDataFrame(rows, "probe string, v long")


def q_scan_estimate_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner probe (r5): ``scan_estimate`` answers "what would this
    conjunctive scan cost and how many rows can it return" from the
    manifest alone — chunk keep-counts from the shared `_scan_drop`
    proof engine plus a result-count bracket that Fréchet-combines
    per-column histogram brackets (upper: min over columns; lower:
    Σcmin − (k−1)·n per chunk; pruned chunks contribute (0, 0)). The
    oracle is exact, so each predicate set emits its exact decoded
    count only when the manifest bracket contains it AND the kept
    chunk set is a subset of the total — a defect in the Fréchet
    combination or the prune drops rows and fails the comparison."""
    from br_archive_spark.operators import (decode_table, encode_table,
                                            scan_estimate)

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_totalprice").cast("double").alias("total"),
        F.col("o_orderpriority").alias("prio"))
    specs = [("okey", "int"), ("ckey", "int"), ("total", "float"),
             ("prio", "string")]
    enc = encode_table(orders.repartitionByRange(8, "okey")
                       .sortWithinPartitions("okey"),
                       specs=specs, mode="scan", key="prio",
                       target_values=1 << 11).cache()
    dec = decode_table(enc, specs=specs, with_n_tok=False).cache()
    cases = [
        ("okey_only", [("okey", 2000, 9000)]),
        ("okey_and_total",
         [("okey", 2000, 12000), ("total", 80000.0, 250000.0)]),
        ("okey_ckey_total",
         [("okey", 1000, 13000), ("ckey", 100, 1000),
          ("total", 50000.0, 300000.0)]),
    ]
    rows = []
    for label, bands in cases:
        est = scan_estimate(enc, bands, specs=specs)
        cond = None
        for c, lo, hi in bands:
            term = (F.col(c) >= lo) & (F.col(c) <= hi)
            cond = term if cond is None else (cond & term)
        exact = dec.where(cond).count()
        lo_b, hi_b = est["rows_bracket"]
        if (lo_b <= exact <= hi_b
                and est["chunks_kept"] <= est["chunks_total"]
                and exact <= est["rows_kept_max"]):
            rows.append((label, int(exact)))
    enc.unpersist()
    dec.unpersist()
    return spark.createDataFrame(rows, "probe string, cnt long")


def q_files_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase file-skipping scan (r5): ``scan_where_files`` runs
    the shared prune disjunction (`_scan_drop`) as a metadata pass
    over ONLY ``column_stats`` + file names, then re-runs the full
    chunk-level scan over surviving shard files — at 100 TB the
    payload bytes of non-matching shards are never read at all, which
    chunk-level pruning alone cannot promise. Range-clustered orders,
    one shard per bucket; conjunctive band + priority IN-list; exact
    vs the plain filter."""
    import tempfile

    from br_archive_spark.operators import (encode_table,
                                            scan_where_files)

    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_orderpriority").alias("prio"))
    specs = [("okey", "int"), ("ckey", "int"), ("prio", "string")]
    man_dir = tempfile.mkdtemp(prefix="bra_fscan_") + "/man"
    encode_table(orders.repartitionByRange(8, "okey")
                 .sortWithinPartitions("okey"),
                 specs=specs, mode="scan", key="prio",
                 target_values=1 << 11).write.parquet(man_dir)
    out = scan_where_files(
        spark, man_dir, [("okey", 2000, 9000)], specs=specs,
        with_n_tok=False, isin={"prio": ["1-URGENT", "3-MEDIUM"]})
    return out.select(
        F.col("okey").cast("long").alias("okey"),
        F.col("ckey").cast("long").alias("ckey"), "prio")


def q_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering + two-band scan (r4): Morton-interleaved
    layout (operators/zorder.py — pure codegen bit arithmetic, one
    repartitionByRange like any reclustering) gives tight chunk zone
    maps on BOTH probed columns, so the conjunctive ``scan_where``
    prunes on an int lane AND a float lane at once — the lakehouse
    OPTIMIZE ZORDER BY analog over codec chunks."""
    from br_archive_spark.operators import (encode_table, infer_specs,
                                            scan_where)
    from br_archive_spark.operators.zorder import zorder_cluster

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_totalprice").alias("o_price"))
    zed = zorder_cluster(orders, ["o_custkey", "o_price"], 8)
    specs = infer_specs(zed)
    enc = encode_table(zed, specs=specs, mode="scan",
                       target_values=1 << 12)
    out = scan_where(enc, [("o_custkey", 100, 500),
                           ("o_price", 50_000.0, 150_000.0)],
                     specs=specs, with_n_tok=False)
    return out.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.round(F.col("o_price") * 100).cast("long")
        .alias("price_cents"))


def q_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE driven by the zone maps (r4): ``delete_where``
    inverts ``scan_range``'s pruning into a mutation — chunks whose
    float bounds prove no overlap pass through byte-identical with no
    decode, fully-covered chunks vanish, boundary chunks rewrite
    copy-on-write through the codec path. Decoded survivor set is the
    exact complement of the band (checksum-verified)."""
    from br_archive_spark.operators import (decode_table, delete_where,
                                            encode_table, infer_specs)

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").alias("o_price"))
    clustered = (orders.repartitionByRange(8, "o_price")
                 .sortWithinPartitions("o_price"))
    specs = infer_specs(clustered)
    enc = encode_table(clustered, specs=specs, mode="scan",
                       target_values=1 << 12)
    out = delete_where(enc, "o_price", 50_000.0, 80_000.0, specs=specs)
    dec = decode_table(out, specs=specs, with_n_tok=False,
                       verify_checksums=True)
    return dec.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.round(F.col("o_price") * 100).cast("long")
        .alias("price_cents"))


def q_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-only aggregates (r3): COUNT/SUM/MIN/MAX answered
    entirely from per-chunk ``column_stats`` (vmin/vmax/vsum/n_vals/
    null_count) — zero payload bytes read, zero chunks decoded; the
    cluster analog of the reference answering `unbra -l` from entry
    headers alone (src/io/lib_bra_io_file_ctx.c:701-804). Values are
    in codec-lane units (unscaled cents for the decimal column)."""
    from br_archive_spark.operators import (agg_encoded, encode_table,
                                            infer_specs)

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_price"))
    specs = infer_specs(orders)
    enc = encode_table(orders, specs=specs, num_parts=4,
                       target_values=1 << 13).cache()
    parts = []
    for col in ("o_custkey", "o_price"):
        parts.append(agg_encoded(enc, col).select(
            F.lit(col).alias("col"), "n_values", "n_nulls",
            "vmin", "vmax",
            F.col("vsum").cast("double").alias("vsum")))
    return parts[0].unionAll(parts[1])


def q_fsst_row_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level random access: zone-map chunk pruning, key-column
    decode to locate rows, then PER-ROW decode of the fsst-coded text
    column (operators.decode.lookup_rows / codecs fsst_decode_rows) —
    only the requested strings' encoded segments are parsed."""
    from br_archive_spark.operators import encode_table, lookup_rows

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    specs = [("doc_id", "string"), ("text", "string")]
    enc = encode_table(docs, specs=specs, mode="hash", num_parts=8,
                       target_values=1 << 14,
                       str_codecs=("fsst", "str_dict"))
    wanted = [str(k) for k in (3, 17, 101, 250, 444)]
    return lookup_rows(enc, wanted, value_col="text")


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag window —
    the batch formulation of the streaming session-window operator."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (ev.withColumn("prev_ts", F.lag("ts").over(w))
            .withColumn("new_sess",
                        F.when(F.col("prev_ts").isNull(), 1)
                        .when(F.col("ts") - F.col("prev_ts")
                              > F.expr("INTERVAL 1800 SECONDS"), 1)
                        .otherwise(0)))
    sess = gaps.withColumn(
        "sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "sess_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(_cents(F.col("value"))).alias("value_cents"))
            .groupBy("n_events")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("value_cents").alias("total_cents"))
            .orderBy("n_events"))


# --------------------------------------------------------------------
# relational coverage (scan/filter/agg/join/window/sort — SURVEY §2.5)
# --------------------------------------------------------------------


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping over (status, priority) — grouping-sets surface."""
    orders = _read(spark, sf_dir, "orders")
    return (orders
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(_cents(F.col("o_totalprice")))
                 .alias("total_cents"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL"))
                    .alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL"))
                    .alias("priority"),
                    "n_orders", "total_cents"))


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers that never ordered, per market segment."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return (cust.join(orders, cust["c_custkey"] == orders["o_custkey"],
                      "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("c_mktsegment"))


def q_heavy_parts_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: parts shipped in heavy quantity (>45) that were
    NEVER discounted above 5% (EXCEPT)."""
    li = _read(spark, sf_dir, "lineitem")
    heavy = li.where(F.col("l_quantity") > 45).select("l_partkey")
    discounted = li.where(F.col("l_discount") > 0.05).select("l_partkey")
    # subtract == SQL EXCEPT (set semantics)
    return (heavy.subtract(discounted)
            .select(F.col("l_partkey").alias("partkey")))


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: orders above the global average price
    (average as exact integer-cents floor)."""
    orders = _read(spark, sf_dir, "orders").withColumn(
        "cents", _cents(F.col("o_totalprice")))
    avg_cents = orders.agg(
        F.floor(F.sum("cents") / F.count(F.lit(1))).alias("avg_cents"))
    return (orders.crossJoin(F.broadcast(avg_cents))
            .where(F.col("cents") > F.col("avg_cents"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_above"))
            .orderBy("o_orderpriority"))


def q_quality_filter_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline composition: quality-score → filter → group (the
    score→filter→encode shape of a curation pass)."""
    from br_archive_spark.functions.text import quality_score

    docs = _read(spark, sf_dir, "documents")
    return (docs.withColumn("q", quality_score("text"))
            .where(F.col("q") >= 40)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("q").alias("quality_sum"))
            .orderBy("lang"))

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    cutoff = "1998-09-02"
    return (li.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(_cents(F.col("l_extendedprice")))
                 .alias("sum_base_price_cents"),
                 F.sum(_cents(F.col("l_extendedprice"))
                       * (100 - _cents(F.col("l_discount"))))
                 .alias("sum_disc_price_e4"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join pipeline: customer ⋈ orders ⋈ lineitem, revenue per order.
    customer is broadcast (small dim) — the 100 TB-safe plan."""
    cust = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    rev = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
           .groupBy("l_orderkey")
           .agg(F.sum(_cents(F.col("l_extendedprice"))
                      * (100 - _cents(F.col("l_discount"))))
                .alias("revenue_e4"))
           .where(F.col("revenue_e4") > 0))
    return (rev.orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey"))
            .limit(10)
            .select("l_orderkey", "revenue_e4"))


def q_order_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (orders
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("o_custkey", "o_orderkey",
                    _cents(F.col("o_totalprice")).alias("totalprice_cents"),
                    F.col("rnk").cast("int").alias("rnk")))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return (ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"),
                      "yyyy-MM-dd HH:00:00").alias("hour"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy("hour", "event_type"))


def q_part_supplier_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join + grouped agg over dims (nation ⋈ supplier ⋈
    lineitem ⋈ part), broadcast dims."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    return (li
            .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
            .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
            .join(F.broadcast(nation),
                  supp["s_nationkey"] == nation["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
                 F.count_distinct("p_partkey").alias("distinct_parts"))
            .orderBy("nation"))


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below 20% of their part's
    average quantity. The per-part aggregate and the fact table share
    the join key, so the aggregate's shuffle partitioning is reused for
    the join (one exchange of the fact table total). Integer algebra:
    qty < 0.2*avg ⟺ 5*qty*cnt < sum_qty — no float thresholds."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"),
        _cents(F.col("l_extendedprice")).alias("price_cents"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt"))
    return (li.join(per_part, "l_partkey")
            .where(F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty"))
            .agg(F.count(F.lit(1)).alias("n_small"),
                 F.sum("price_cents").alias("revenue_cents")))


def q_heavy_suppliers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: suppliers that shipped any near-max-quantity item,
    counted per nation. left_semi keeps the build side narrow (no
    duplicate-row blow-up, no columns from the probe side shuffled)."""
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    heavy = (_read(spark, sf_dir, "lineitem")
             .where(F.col("l_quantity") >= 48).select("l_suppkey"))
    return (supp.join(heavy, supp["s_suppkey"] == heavy["l_suppkey"],
                      "left_semi")
            .join(F.broadcast(nation),
                  supp["s_nationkey"] == nation["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_suppliers"))
            .orderBy("nation"))


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per user-bucket value totals by event type. Pivot values
    are listed explicitly — an unlisted pivot needs an extra distinct
    pass over the data at scale."""
    ev = _read(spark, sf_dir, "events")
    return (ev.groupBy((F.col("user_id") % 10).alias("bucket"))
            .pivot("event_type",
                   ["click", "error", "purchase", "signup", "view"])
            .agg(F.sum(_cents(F.col("value"))))
            .orderBy("bucket"))


def q_events_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame window: 3-event moving value sum per user (ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW), deterministic order by
    (ts, event_id)."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, Window.currentRow))
    return ev.select(
        "event_id", "user_id",
        F.sum(_cents(F.col("value"))).over(w).alias("moving_cents"))


def q_order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (p50/p90) of order price per priority, over
    integer cents. Reported in deci-cents: linear interpolation between
    integer cents lands on exact tenths, so ROUND(q*10) is stable
    across engines (Spark percentile ≡ DuckDB quantile_cont)."""
    orders = _read(spark, sf_dir, "orders").withColumn(
        "cents", _cents(F.col("o_totalprice")))
    return (orders.groupBy("o_orderpriority")
            .agg(F.round(F.percentile("cents", 0.5) * 10)
                 .cast("long").alias("p50_e1"),
                 F.round(F.percentile("cents", 0.9) * 10)
                 .cast("long").alias("p90_e1"))
            .orderBy("o_orderpriority"))


# --------------------------------------------------------------------
# training-pipeline operators (documents / embeddings)
# --------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from br_archive_spark.functions.dedup import exact_dedup

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    return (exact_dedup(docs, "text", "doc_id")
            .select("content_hash", "keep_id", "dup_count"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from br_archive_spark.functions.text import (punct_count, quality_score,
                                                 token_count)

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count("text").alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
        punct_count("text").alias("n_punct"),
        quality_score("text").alias("quality"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from br_archive_spark.functions.text import lang_id

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        lang_id("text").alias("lang_pred"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint (Rabin-Karp style) — JVM-side
    aggregate. Exact integer arithmetic, so a DuckDB ``list_reduce``
    left-fold reproduces it bit-for-bit (full value oracle)."""
    from br_archive_spark.functions.text import fingerprint

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        fingerprint("text").alias("fp"))


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates — hash-seeded signatures are
    engine-specific → rows-only check."""
    from br_archive_spark.functions.dedup import minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    return minhash_lsh_pairs(docs, jaccard_threshold=0.35)


def q_minhash_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the engine-portable md5 hash family — the
    VALUE-CHECKED form of the MinHash pipeline (the fast xxhash64 form
    above is rows-only by nature). Signatures, band keys, the candidate
    pair set, and the signature-agreement count are bit-reproducible in
    DuckDB, so the whole shingle→minhash→band→bucket-join→verify
    pipeline gets an exact oracle. Agreement is returned as the integer
    ``match16`` (matches out of 16) rather than the double estimate."""
    from br_archive_spark.functions.dedup import minhash_lsh_pairs_md5

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    pairs = minhash_lsh_pairs_md5(docs, jaccard_threshold=0.5)
    return pairs.select(
        F.col("id").alias("doc_a"), F.col("id2").alias("doc_b"),
        F.round(F.col("est_jaccard") * 16).cast("long").alias("match16"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs — rows-only (xxhash64 is Spark-specific).

    ``max_hamming=6`` equals the block-pair scheme's recall GUARANTEE
    bound (``blocks-2`` with 8 blocks — functions/dedup.py); r2's 12
    was legal but approximate above 6 (VERDICT r2 "what's wrong" #5).
    """
    from br_archive_spark.functions.dedup import simhash_pairs

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    return simhash_pairs(docs, max_hamming=6)


def q_simhash_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with the engine-portable md5 family — the VALUE-CHECKED
    form of the SimHash pipeline: 32-bit set-semantics signature,
    block-pair buckets, exact ``bit_count(xor)`` hamming, all integer
    arithmetic reproducible in DuckDB.

    ``max_bucket=256`` (r5): the 32-bit twin's block-pair keys are only
    8 bits wide, so past ~10^4 docs the hottest key degenerates into a
    no-signal blob (a bucket holding >6% of ALL docs) and the bucket
    self-join goes quadratic — the sf1 board measured 895 s / 74x for
    the uncapped form, with 96% of candidate pairs inside >256-doc
    buckets. The cap is mirrored in the oracle (HAVING count <= 256),
    never binds at the driver's sf0.01 (max bucket there: 55), and the
    cap-BINDING path is value-checked cross-engine by
    ``tests/test_functions.py::test_simhash_md5_bucket_cap_oracle``."""
    from br_archive_spark.functions.dedup import simhash_pairs_md5

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    pairs = simhash_pairs_md5(docs, max_hamming=6, max_bucket=256)
    return pairs.select(F.col("id").alias("doc_a"),
                        F.col("id2").alias("doc_b"),
                        F.col("hamming").cast("long").alias("hamming"))


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard over a small id range; integer
    intersection/union sizes are engine-portable → full oracle."""
    from br_archive_spark.functions.dedup import jaccard_pairs

    docs = (_read(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 60)
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    out = jaccard_pairs(docs, threshold=0.0)
    return out.select("id", "id2", "inter", "uni")


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at ≥0.2, similarity in basis
    points (int) for cross-engine hashing.

    Input bounded to ``vec_id < 2000`` (mirrored in the oracle SQL):
    this is the documented brute-force VERIFICATION oracle for the LSH
    scale path, and an unbounded cross join grows quadratically with
    sf (VERDICT r3 "what's wrong" #4) — the bound keeps the board
    runnable at any sf, like ``q_jaccard_pairs``'s ``doc_id < 60``."""
    from br_archive_spark.functions.dedup import embedding_neardup_pairs

    emb = (_read(spark, sf_dir, "embeddings")
           .where(F.col("vec_id") < 2000)
           .withColumn("embedding",
                       F.transform("embedding",
                                   lambda x: x.cast("double"))))
    pairs = embedding_neardup_pairs(emb, threshold=0.2)
    return pairs.select(
        "id", "id2",
        F.round(F.col("cosine") * 10000).cast("long").alias("cos_bp"))


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs — the 100 TB scale path
    (candidates from a (table, bucket) equality self-join, never a
    cross join). Rows-only: the hyperplane family is xxhash64-derived
    (engine-specific); recall >=0.9 vs the exact oracle is asserted in
    tests/test_functions.py::test_embedding_lsh_recall_vs_exact."""
    from br_archive_spark.functions.dedup import embedding_neardup_lsh

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform("embedding", lambda x: x.cast("double")))
    pairs = embedding_neardup_lsh(emb, threshold=0.2, planes=6, tables=4)
    return pairs.select(
        "id", "id2",
        F.round(F.col("cosine") * 10000).cast("long").alias("cos_bp"))


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first 20 vec_ids as queries."""
    from br_archive_spark.functions.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform("embedding", lambda x: x.cast("double")))
    queries = emb.where(F.col("vec_id") < 20)
    out = cosine_topk(emb, queries, k=5)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN variant — bucket hashes are Spark-specific →
    rows-only check."""
    from br_archive_spark.functions.similarity import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    out = lsh_topk(emb, queries, k=5, planes=8)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_knn_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN with a DRIVER-SIDE literal hyperplane family
    (hashlib md5 → ±1 matrix) — the VALUE-CHECKED form of knn_lsh.
    The sketch projection is a left fold over (emb[d] · ±1) literals,
    bit-reproducible in DuckDB, so buckets — and hence the candidate
    set and ranks — match exactly."""
    from br_archive_spark.functions.similarity import (hyperplane_family,
                                                       lsh_topk)

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform("embedding", lambda x: x.cast("double")))
    queries = emb.where(F.col("vec_id") < 20)
    out = lsh_topk(emb, queries, k=5,
                   family=hyperplane_family(8, 64, salt=0))
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_embedding_neardup_lsh_md5(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH near-dup pairs with driver-side
    literal families — the VALUE-CHECKED form of
    embedding_neardup_lsh (same plan shape: bucket equality self-join,
    never a cross join)."""
    from br_archive_spark.functions.dedup import embedding_neardup_lsh
    from br_archive_spark.functions.similarity import hyperplane_family

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform("embedding", lambda x: x.cast("double")))
    pairs = embedding_neardup_lsh(
        emb, threshold=0.2, planes=6, tables=4, max_bucket=0,
        families=[hyperplane_family(6, 64, salt=t) for t in range(4)])
    return pairs.select(
        "id", "id2",
        F.round(F.col("cosine") * 10000).cast("long").alias("cos_bp"))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length sequence packing (concatenate token stream in
    doc_id order, cut every 512): the op between a deduped token table
    and a training dataloader. Deterministic rule → exact oracle (the
    same cut expressed as a ROW_NUMBER window over the token stream)."""
    from br_archive_spark.functions.packing import pack_sequences

    tok = _lineitem_token_table(spark, sf_dir)
    packs = pack_sequences(tok, 512)
    return packs.select(
        F.col("pack_id").cast("long").alias("pack_id"),
        F.col("n_tok").cast("long").alias("n_tok"),
        F.aggregate("tokens", F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("token_sum"),
        F.array_min("tokens").cast("long").alias("token_min"),
        F.array_max("tokens").cast("long").alias("token_max"))


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-cutoff train/val assignment — pure function of
    the id (no RNG), identical in any engine → exact oracle."""
    from br_archive_spark.functions.packing import train_val_split

    docs = _read(spark, sf_dir, "documents")
    return (docs.withColumn("split", train_val_split(docs, "doc_id"))
            .groupBy("split", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("split", "source"))


def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (functions/packing.py::
    stratified_sample) — the domain-mixing step: keep 100% of src0,
    50% of src1, 10% of src2, drop everything else, via an
    md5-cutoff that is a pure function of the id (no RNG, no
    shuffle; the filter folds into the scan). Exact oracle: the same
    hex comparison in DuckDB."""
    from br_archive_spark.functions.packing import stratified_sample

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source")
    out = stratified_sample(
        docs, {"src0": 1.0, "src1": 0.5, "src2": 0.1})
    return out.select("doc_id", "source")


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style boilerplate strip (functions/cleaning.py::
    remove_boilerplate): a synthetic per-source banner + a global
    footer are welded onto every document, then dropped again because
    their corpus-wide paragraph counts exceed max_repeats — one
    explode + one count shuffle (bounded by distinct paragraphs) +
    one per-doc re-collect; pure codegen string ops. The oracle runs
    the identical paragraph-count rule in SQL."""
    from br_archive_spark.functions.cleaning import remove_boilerplate

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("BANNER-"), F.col("source"), F.lit("\n"),
                 F.col("text"), F.lit("\nCOPYRIGHT FOOTER"))
        .alias("text"))
    return remove_boilerplate(docs, max_repeats=1) \
        .select("doc_id", "text")


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination (functions/cleaning.py::
    contaminated_ids): every 37th document plays the held-out eval
    set; any corpus document sharing an 8-word-gram with it is
    flagged. Probe n-grams broadcast; the corpus scans ONCE with
    n-grams generated inline (sequence+slice codegen); the only
    shuffle is the final distinct."""
    from br_archive_spark.functions.cleaning import contaminated_ids

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text")
    probes = docs.where(F.col("doc_id").cast("long") % 37 == 0)
    return contaminated_ids(docs, probes, n=8).orderBy("doc_id")


def q_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE composed Spark plan:
    raw documents → boilerplate strip (corpus paragraph counts) →
    test-set decontamination (8-gram overlap vs the every-37th-doc
    probe set, broadcast semi-join) → frequency-ranked tokenization
    (vocab 256, OOV→0) → columnar encode → decode → exact token
    equality. Each stage is individually value-checked by its own
    driver query; this one checks their COMPOSITION — the oracle is
    the same four stages chained as CTEs in DuckDB."""
    from br_archive_spark.functions.cleaning import (contaminated_ids,
                                                     remove_boilerplate)
    from br_archive_spark.functions.text import tokenize_corpus
    from br_archive_spark.operators import decode_table, encode_table

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text",
        "source")
    clean = remove_boilerplate(docs, max_repeats=2)
    probes = clean.where(F.col("doc_id").cast("long") % 37 == 0)
    bad = contaminated_ids(clean, probes, n=8)
    kept = clean.join(bad, "doc_id", "left_anti")
    tok, _vocab = tokenize_corpus(kept, vocab_size=256)
    enc = encode_table(tok, num_parts=4, target_values=1 << 15)
    dec = decode_table(enc)
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"), "source")
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("int").alias("token"),
                    "source"))


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token frequencies over the tokenized corpus (map-side
    partial aggregation bounds the shuffle to the vocab)."""
    from br_archive_spark.functions.packing import token_histogram

    tok = _lineitem_token_table(spark, sf_dir)
    out = token_histogram(tok, top_k=50)
    return out.select(F.col("token").cast("long").alias("token"),
                      F.col("freq").cast("long").alias("freq"))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text → opaque binary payload → Arrow-batched
    feature extraction (deterministic fake embedder: sha256 → uint32
    grid, functions/multimodal.py::_fake_features) → per-position
    feature values in exact integer millis. Value-checked (r3): the
    fake embedder is reproduced in the DuckDB oracle via sha256() +
    hex arithmetic, so the whole mapInPandas plumbing — batching,
    Arrow binary transfer, list-column emit, explode — is hash-compared
    position by position, not just row-counted."""
    from br_archive_spark.functions.multimodal import extract_features

    docs = (_read(spark, sf_dir, "documents")
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    F.encode("text", "utf-8").alias("payload")))
    feats = extract_features(docs, dim=16)
    return (feats.select(
        "doc_id", F.posexplode("features").alias("pos", "f"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"),
                F.round(F.col("f").cast("double") * 1000)
                .cast("int").alias("mill")))


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (functions/temporal.py::asof_join): every
    purchase event gains the user's most recent view at-or-before it
    (classic last-touch attribution), ties on ts resolved to the
    greatest event_id. Union+window form: ONE Exchange on user_id, no
    join node (plan-locked). Oracle: DuckDB inequality join + QUALIFY
    row_number argmax — the O(n·m) form this operator avoids."""
    from br_archive_spark.functions.temporal import asof_join

    ev = _read(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, on=["user_id"],
                    left_time="ts", right_time="ts",
                    payload={"view_event_id": "event_id",
                             "view_value": "value"},
                    tiebreak="event_id")
    return out.select("purchase_id", "user_id", "view_event_id",
                      "view_value")


def q_value_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon range pair-join (functions/temporal.py::
    range_pair_join): all event pairs whose values differ by <= 0.05,
    via eps-width bucketing + 3-bucket probe expansion — an equi-join
    on the bucket id, structurally never a CartesianProduct
    (plan-locked). Input bounded to event_id < 2000 so the driver
    query (and its quadratic DuckDB oracle) stays O(small) at any sf,
    like q_jaccard_pairs."""
    from br_archive_spark.functions.temporal import range_pair_join

    ev = (_read(spark, sf_dir, "events")
          .where(F.col("event_id") < 2000)
          .select("event_id", "value"))
    return range_pair_join(ev, "event_id", "value", eps=0.05)


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition stats (functions/cleaning.py::
    repetition_stats): per-document word count, distinct words, most
    frequent word count, and the keep verdict (top word <= 20% of
    words). Shuffle-free: sort_array + one aggregate run-length scan
    per row, plan-locked map-only."""
    from br_archive_spark.functions.cleaning import repetition_stats

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_stats(docs)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/cleaning.py::scrub_pii): emails and
    phone-shaped numbers replaced with typed tokens plus per-doc
    match counts. The synthetic corpus carries no PII, so the fixture
    plants one email and one phone per bounded doc DETERMINISTICALLY
    (doc_id-derived, identical concat in the oracle) — the scrub
    itself is pure regexp_replace codegen, map-only (plan-locked)."""
    from br_archive_spark.functions.cleaning import scrub_pii

    docs = (_read(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 200)
            .select("doc_id",
                    F.concat(F.col("text"), F.lit(" reach user"),
                             F.col("doc_id").cast("string"),
                             F.lit("@mail-test.example.com or 555-"),
                             F.lpad((F.col("doc_id") % 10000)
                                    .cast("string"), 4, "0"))
                    .alias("text")))
    return scrub_pii(docs)


def q_token_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level decontamination (functions/cleaning.py::
    token_contaminated_ids, the GPT-3/PaLM recipe): docs in the token
    table sharing any 3-consecutive-token run with the every-41st-doc
    probe set (n=3 because these docs average ~4 tokens; production
    default is 13). Probe n-grams broadcast, corpus scanned once with
    inline sequence+slice n-grams, one semi-join + distinct."""
    from br_archive_spark.functions.cleaning import token_contaminated_ids

    tok = _lineitem_token_table(spark, sf_dir)
    probes = tok.where(F.col("doc_id").cast("long") % 41 == 0)
    return token_contaminated_ids(tok, probes, n=3).orderBy("doc_id")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → cluster assignments (functions/graph.py::
    connected_components, alternating large-star/small-star — the
    O(log n)-round shuffle CC): events within 0.05 of each other in
    value (the bounded range_pair_join) collapse into components
    labeled by their minimum event_id. Oracle: DuckDB recursive-CTE
    reachability + min label — the O(diameter) form this avoids."""
    from br_archive_spark.functions.graph import connected_components
    from br_archive_spark.functions.temporal import range_pair_join

    ev = (_read(spark, sf_dir, "events")
          .where(F.col("event_id") < 2000)
          .select("event_id", "value"))
    pairs = range_pair_join(ev, "event_id", "value", eps=0.05)
    return connected_components(pairs, "id_a", "id_b")


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-to-budget mixture sampling (functions/packing.py::
    sample_by_tokens): per stratum, keep the md5-ordered prefix of
    documents whose cumulative n_chars stays within the stratum's
    budget — the token-budget form of domain mixing (stratified_sample
    hits a ratio; training mixtures are specified in tokens). Bucketed
    by an order-preserving md5 hex-prefix range so no stratum ever
    owns a single reducer. Oracle: the same running-sum-under-budget
    rule as one SQL window."""
    from br_archive_spark.functions.packing import sample_by_tokens

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source", "n_chars")
    out = sample_by_tokens(
        docs, {"src0": 4000, "src1": 2500, "src2": 1000},
        weight_col="n_chars")
    return out.select("doc_id", "source", "n_chars")


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM perplexity scoring (functions/text.py::
    perplexity_score) over the lineitem token corpus, self-scored
    against its own histogram: LM is vocab-bounded so it broadcasts;
    one explode + broadcast join + hash agg; result in 1e-4-bit units
    (the basis-points trick) for cross-engine hashing. Returns the
    worst (highest cross-entropy) 500 documents — the filter's kill
    list. Oracle: the identical smoothed-log2 window-free SQL."""
    from br_archive_spark.functions.text import perplexity_score

    tok = _lineitem_token_table(spark, sf_dir)
    scored = perplexity_score(tok)
    return (scored.orderBy(F.col("xent_bp").desc(), "doc_id")
            .limit(500))


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (functions/similarity.py::ivf_topk) — the cell-probing
    scale path beside LSH: deterministic md5-sampled coarse centroids
    (engine-portable, no RNG/k-means), inline argmax cell assignment
    in the corpus scan projection, candidates via an equi-join on the
    cell id (probe side broadcast), exact cosine only inside probed
    cells. Every fold is operand-order-identical to the DuckDB oracle,
    so centroid choice, cell assignment, probe sets, and final ranks
    all reproduce exactly — no _md5 twin needed."""
    from br_archive_spark.functions.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings").withColumn(
        "embedding",
        F.transform("embedding", lambda x: x.cast("double")))
    queries = emb.where(F.col("vec_id") < 20)
    out = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=2)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("int").alias("rank"))


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 curation operators composed as ONE Spark plan:
    token-budget mixture sampling (md5-prefix under per-source char
    budgets) → frequency-ranked tokenization (vocab 512) → unigram-LM
    perplexity scoring (self-scored, broadcast LM) → keep docs below
    49000 e-4 bits → columnar encode → decode → exact token equality.
    Each stage has its own value-checked driver query
    (token_budget_sample, tokenize_encode, perplexity_filter,
    roundtrip_*); this checks their COMPOSITION, oracle = the same
    stages chained as CTEs."""
    from br_archive_spark.functions.packing import sample_by_tokens
    from br_archive_spark.functions.text import (perplexity_score,
                                                 tokenize_corpus)
    from br_archive_spark.operators import decode_table, encode_table

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text",
        "source", "n_chars")
    sampled = sample_by_tokens(
        docs, {"src0": 4000, "src1": 2500, "src2": 1000,
               "src3": 3000, "src4": 3000, "src5": 2000},
        weight_col="n_chars")
    tok, _vocab = tokenize_corpus(sampled, vocab_size=512)
    scored = perplexity_score(tok)
    kept = (tok.join(scored, "doc_id")
            .where(F.col("xent_bp") < 49000)
            .select("doc_id", "tokens", "n_tok", "source"))
    enc = encode_table(kept, num_parts=2, target_values=1 << 15)
    dec = decode_table(enc)
    return (dec.select("doc_id", F.posexplode("tokens")
                       .alias("pos", "token"), "source")
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.col("token").cast("int").alias("token"),
                    "source"))


# --------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize lineitem at sf0.001, encode with the full
    codec suite, return the per-column compression report."""
    return q_compression_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Two-round rotation policy (VERDICT r4 next-steps #3): the
    driver's ~50-query window covers entries with the LEAST recent
    driver evidence first, keeping the invariant "every registry
    entry has a green row within the last 2 rounds". Order: new-in-r5
    queries, then the 24 entries rotated OUT of the r4 window (green
    r1-r3 but unchecked against the r4/r5 HEAD), then the 50
    r4-checked entries (all exact-green in CORRECTNESS_r04)."""
    return {
        # --- new in r5 ---
        "string_range_scan": q_string_range_scan,
        "bloom_int_lookup": q_bloom_int_lookup,
        "bloom_string_lookup": q_bloom_string_lookup,
        "bloom_binary_lookup": q_bloom_binary_lookup,
        "null_scan": q_null_scan,
        "in_list_scan": q_in_list_scan,
        "ndv_sketch": q_ndv_sketch,
        "files_scan": q_files_scan,
        "value_counts": q_value_counts,
        "hist_selectivity": q_hist_selectivity,
        "scan_estimate_probe": q_scan_estimate_probe,
        "quantile_bounds": q_quantile_bounds,
        # --- rotated out of the r4 window (green r1-r3) ---
        "compression_stats": q_compression_stats,
        "quality_filter_by_lang": q_quality_filter_by_lang,
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "order_rank_window": q_order_rank_window,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "minhash_pairs": q_minhash_pairs,
        "minhash_pairs_md5": q_minhash_pairs_md5,
        "simhash_pairs": q_simhash_pairs,
        "simhash_pairs_md5": q_simhash_pairs_md5,
        "orders_rollup": q_orders_rollup,
        "customers_without_orders": q_customers_without_orders,
        "heavy_parts_set_ops": q_heavy_parts_set_ops,
        "above_avg_orders": q_above_avg_orders,
        "events_hourly": q_events_hourly,
        "part_supplier_agg": q_part_supplier_agg,
        "small_qty_revenue": q_small_qty_revenue,
        "heavy_suppliers_semi": q_heavy_suppliers_semi,
        "events_pivot": q_events_pivot,
        "events_moving_sum": q_events_moving_sum,
        "order_price_percentiles": q_order_price_percentiles,
        # --- r4-window entries (all exact-green in r4) ---
        "knn_lsh_md5": q_knn_lsh_md5,
        "embedding_neardup_lsh_md5": q_embedding_neardup_lsh_md5,
        "pack_sequences": q_pack_sequences,
        "train_val_split": q_train_val_split,
        "token_histogram": q_token_histogram,
        "jaccard_pairs": q_jaccard_pairs,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "knn_cosine": q_knn_cosine,
        "knn_lsh": q_knn_lsh,
        "multimodal_features": q_multimodal_features,
        # --- core round-trips (the north-rule invariant) ---
        "roundtrip_lineitem_tokens": q_roundtrip_lineitem_tokens,
        "roundtrip_documents_text": q_roundtrip_documents_text,
        "roundtrip_nulls": q_roundtrip_nulls,
        "roundtrip_embeddings": q_roundtrip_embeddings,
        "roundtrip_binary": q_roundtrip_binary,
        "roundtrip_orders_table": q_roundtrip_orders_table,
        "roundtrip_hash_mode": q_roundtrip_hash_mode,
        "roundtrip_fsst": q_roundtrip_fsst,
        "roundtrip_direct": q_roundtrip_direct,
        "roundtrip_global_dict": q_roundtrip_global_dict,
        "random_access_lookup": q_random_access_lookup,
        "bloom_point_lookup": q_bloom_point_lookup,
        "range_scan": q_range_scan,
        "numeric_range_scan": q_numeric_range_scan,
        "float_range_scan": q_float_range_scan,
        "zorder_scan": q_zorder_scan,
        "delete_where_band": q_delete_where,
        "agg_pushdown": q_agg_pushdown,
        "schema_evolution": q_schema_evolution,
        "merge_upsert": q_merge_upsert,
        "time_travel": q_time_travel,
        "snapshot_changes": q_snapshot_changes,
        "tokenize_encode": q_tokenize_encode,
        "domain_mix_sample": q_domain_mix_sample,
        "boilerplate_removal": q_boilerplate_removal,
        "decontaminate": q_decontaminate,
        "pipeline_end_to_end": q_pipeline_end_to_end,
        # --- new in r4 ---
        "asof_attribution": q_asof_attribution,
        "value_band_pairs": q_value_band_pairs,
        "repetition_filter": q_repetition_filter,
        "pii_scrub": q_pii_scrub,
        "token_decontaminate": q_token_decontaminate,
        "dedup_clusters": q_dedup_clusters,
        "token_budget_sample": q_token_budget_sample,
        "perplexity_filter": q_perplexity_filter,
        "knn_ivf": q_knn_ivf,
        "curation_pipeline": q_curation_pipeline,
        "fsst_row_lookup": q_fsst_row_lookup,
        "events_sessions": q_events_sessions,
    }


def _minhash_md5_oracle(num_hashes: int = 16, bands: int = 4,
                        shingle_k: int = 5) -> str:
    """DuckDB SQL reproducing ``minhash_lsh_pairs_md5`` bit-for-bit:
    the 60-bit md5-prefix hash family is computed as
    ``('0x'||substr(md5(j||':'||s),1,15))::bigint`` — the same integer
    Spark's ``conv(substr(md5(..),1,15),16,10)`` yields. Band keys are
    the raw value concat (no engine-local hash), so the candidate pair
    set matches exactly. The shingle floor ``greatest(.., 1)`` mirrors
    the Spark side's guard (Spark's sequence(1,0) steps backward)."""
    k = num_hashes
    rpb = k // bands
    mins = ",\n                       ".join(
        f"min(('0x'||substr(md5('{j}:'||s),1,15))::bigint) AS h{j}"
        for j in range(k))
    band_sel = "\n                UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS bk FROM mh".format(
            b=b, key="||','||".join(
                f"h{j}::varchar" for j in range(b * rpb, (b + 1) * rpb)))
        for b in range(bands))
    agree = " + ".join(
        f"CASE WHEN x.h{j} = y.h{j} THEN 1 ELSE 0 END" for j in range(k))
    return f"""
            WITH sh AS (
                SELECT doc_id,
                       unnest(list_distinct([substr(text, i, {shingle_k})
                           for i in generate_series(
                               1, greatest(length(text) - {shingle_k - 1},
                                           1))])) AS s
                FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
                      FROM documents)
            ),
            mh AS (
                SELECT doc_id,
                       {mins}
                FROM sh GROUP BY doc_id
            ),
            bands AS (
                {band_sel}
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bk = b.bk
                 AND a.doc_id < b.doc_id
            )
            SELECT c.doc_a, c.doc_b,
                   CAST({agree} AS BIGINT) AS match16
            FROM cand c
            JOIN mh x ON x.doc_id = c.doc_a
            JOIN mh y ON y.doc_id = c.doc_b
            WHERE {agree} >= {k // 2}
        """


def _lsh_bucket_sql(fam: list[list[float]]) -> str:
    """DuckDB expression for the literal-hyperplane sign sketch of
    ``emb``: per plane, a ``list_reduce`` left fold over
    emb[d] · (±1) — the same operand order as the Spark side's
    ``aggregate`` fold, hence bit-identical doubles and sign bits."""
    def proj(w):
        lits = "[" + ",".join(str(int(x)) for x in w) + "]"
        return ("list_reduce(list_transform(list_zip(emb, " + lits
                + "), z -> z[1] * z[2]), (a,b) -> a + b)")
    return "(" + " + ".join(
        f"CASE WHEN {proj(w)} > 0 THEN {1 << p} ELSE 0 END"
        for p, w in enumerate(fam)) + ")"


def _knn_lsh_md5_oracle() -> str:
    from br_archive_spark.functions.similarity import hyperplane_family

    bucket = _lsh_bucket_sql(hyperplane_family(8, 64, salt=0))
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        s AS (SELECT vec_id, emb, {bucket} AS bucket FROM e),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(q.emb, c.emb) AS cosine
            FROM s q JOIN s c ON q.bucket = c.bucket
            WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank
        FROM (SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS rnk
              FROM scored)
        WHERE rnk <= 5
    """


def _emb_lsh_md5_oracle() -> str:
    from br_archive_spark.functions.similarity import hyperplane_family

    buckets = [_lsh_bucket_sql(hyperplane_family(6, 64, salt=t))
               for t in range(4)]
    sel = ", ".join(f"{b} AS b{t}" for t, b in enumerate(buckets))
    union = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tab, b{t} AS bucket FROM s"
        for t in range(4))
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings),
        s AS (SELECT vec_id, emb, {sel} FROM e),
        buck AS ({union}),
        cand AS (
            SELECT DISTINCT a.vec_id AS id, b.vec_id AS id2
            FROM buck a JOIN buck b
              ON a.tab = b.tab AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
        )
        SELECT c.id, c.id2,
               CAST(ROUND(list_cosine_similarity(x.emb, y.emb) * 10000)
                    AS BIGINT) AS cos_bp
        FROM cand c
        JOIN e x ON x.vec_id = c.id
        JOIN e y ON y.vec_id = c.id2
        WHERE list_cosine_similarity(x.emb, y.emb) >= 0.2
    """


def oracle_sql() -> dict[str, str]:
    return {
        # identity oracles: the Spark side encodes+decodes; SQL reads raw
        "roundtrip_lineitem_tokens": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token
            FROM lineitem
        """,
        "roundtrip_nulls": """
            WITH base AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       CASE WHEN doc_id % 11 = 0
                            THEN [CAST(-999 AS INT)] ELSE
                           list_transform(
                               range(1, CAST(n_chars % 13 + 2 AS INT)),
                               x -> CASE WHEN x % 5 = 0
                                    THEN CAST(-1 AS INT)
                                    ELSE CAST(x + doc_id % 97 AS INT)
                                    END)
                       END AS tokens,
                       CASE WHEN n_chars % 7 = 0 THEN '<null>'
                            ELSE lang END AS lang,
                       CASE WHEN n_chars % 3 = 0 THEN '<null>'
                            ELSE source END AS source
                FROM documents
            )
            SELECT doc_id,
                   CAST(generate_subscripts(tokens, 1) - 1 AS INT) AS pos,
                   CAST(unnest(tokens) AS INT) AS token,
                   lang, source
            FROM base
        """,
        "fsst_row_lookup": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text
            FROM documents
            WHERE doc_id IN (3, 17, 101, 250, 444)
        """,
        "roundtrip_embeddings": """
            SELECT CAST(vec_id AS VARCHAR) AS doc_id,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT)
                       AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val,
                   CAST(label AS BIGINT) AS label
            FROM embeddings
        """,
        "roundtrip_binary": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   md5(text) AS payload_md5, source
            FROM documents
        """,
        "roundtrip_documents_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, lang, source
            FROM documents
        """,
        "roundtrip_orders_table": """
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS price_cents,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                       AS date_str,
                   o_orderpriority,
                   o_orderstatus = 'F' AS is_fulfilled
            FROM orders
        """,
        "roundtrip_hash_mode": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token
            FROM lineitem
        """,
        "roundtrip_fsst": """
            SELECT 'document-id-' || CAST(doc_id AS VARCHAR) AS doc_id,
                   text
            FROM documents
        """,
        "roundtrip_direct": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token
            FROM lineitem
        """,
        "roundtrip_global_dict": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token
            FROM lineitem
        """,
        "random_access_lookup": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token
            FROM lineitem
            WHERE CAST(l_orderkey AS VARCHAR)
                  IN ('1','7','32','33','1000','4711')
        """,
        "bloom_point_lookup": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   md5(text) AS text_md5
            FROM documents
            WHERE CAST(doc_id AS VARCHAR) IN ('3', '77', '210', '499')
        """,
        "range_scan": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token
            FROM lineitem
            WHERE CAST(l_orderkey AS VARCHAR) >= '20'
              AND CAST(l_orderkey AS VARCHAR) <= '2100'
        """,
        "schema_evolution": """
            SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_linenumber,
                                                    l_partkey) - 1
                        AS INT) AS pos,
                   CAST(l_partkey AS BIGINT) AS token,
                   CAST(l_orderkey % 7 AS BIGINT) AS dmod
            FROM lineitem
        """,
        "merge_upsert": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE WHEN doc_id % 10 = 0
                        THEN 'UPDATED:' || CAST(doc_id AS VARCHAR)
                        ELSE text END AS text
            FROM documents
            UNION ALL
            SELECT 'new-a', 'inserted document a'
            UNION ALL
            SELECT 'new-b', 'inserted document b'
        """,
        "time_travel": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
                   CAST(1 AS INT) AS version
            FROM documents
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE WHEN doc_id % 10 = 0
                        THEN 'UPDATED:' || CAST(doc_id AS VARCHAR)
                        ELSE text END AS text,
                   CAST(2 AS INT) AS version
            FROM documents
            UNION ALL
            SELECT 'new-a', 'inserted document a', CAST(2 AS INT)
            UNION ALL
            SELECT 'new-b', 'inserted document b', CAST(2 AS INT)
        """,
        "tokenize_encode": """
            WITH w AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9]+')) AS word,
                     generate_subscripts(
                         regexp_extract_all(lower(text), '[a-z0-9]+'),
                         1) - 1 AS pos
              FROM documents
            ), v AS (
              SELECT word,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word)
                         AS token_id
              FROM w GROUP BY word
              ORDER BY COUNT(*) DESC, word LIMIT 512
            )
            SELECT w.doc_id, CAST(w.pos AS INT) AS pos,
                   CAST(COALESCE(v.token_id, 0) AS INT) AS token,
                   w.source
            FROM w LEFT JOIN v USING (word)
        """,
        "snapshot_changes": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'UPDATED:' || CAST(doc_id AS VARCHAR) AS text,
                   'add' AS op
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
                   'del' AS op
            FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT 'new-a', 'inserted document a', 'add'
            UNION ALL
            SELECT 'new-b', 'inserted document b', 'add'
        """,
        "numeric_range_scan": """
            SELECT o_orderkey, o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS price_cents,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                       AS date_str
            FROM orders
            WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                       AS BIGINT) BETWEEN 5000000 AND 8000000
        """,
        "float_range_scan": """
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       AS price_cents
            FROM orders
            WHERE o_totalprice BETWEEN 50000.0 AND 80000.0
        """,
        "string_range_scan": """
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                   c_name, c_mktsegment
            FROM customer
            WHERE c_name BETWEEN 'Customer#000000100'
                             AND 'Customer#000000499'
        """,
        "bloom_int_lookup": """
            WITH probe AS (
                (SELECT o_orderkey FROM orders
                 ORDER BY o_orderkey LIMIT 4)
                UNION ALL
                (SELECT o_orderkey FROM orders
                 ORDER BY o_orderkey DESC LIMIT 4)
            )
            SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                   CAST(o_custkey AS BIGINT) AS o_custkey,
                   o_orderstatus
            FROM orders
            WHERE o_orderkey IN (SELECT o_orderkey FROM probe)
        """,
        # bloom_binary_lookup: binary-lane membership pruning; the
        # oracle is the same digest IN-list (md5 hex both engines;
        # absent zero-digest sentinel matches nothing on either side)
        "bloom_binary_lookup": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   md5(text) AS digest_hex,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents
            WHERE CAST(doc_id AS VARCHAR) IN ('7', '42', '99')
        """,
        # null_scan: IS NOT NULL pruned via the null_count stats lane;
        # values must equal the plain CASE-derived filter (the same
        # expression both engines, so null placement is identical)
        "null_scan": """
            SELECT CAST(o_orderkey AS BIGINT) AS okey,
                   CAST(o_custkey AS BIGINT) AS ckey,
                   CASE WHEN o_custkey >= 700 THEN o_orderstatus END
                       AS status_note
            FROM orders
            WHERE (CASE WHEN o_custkey >= 700 THEN o_orderstatus END)
                  IS NOT NULL
        """,
        # ndv_sketch: rows survive only when the manifest HLL estimate
        # is within 10% of exact, and carry the EXACT count — a
        # drifting sketch drops rows and fails the comparison
        "ndv_sketch": """
            SELECT * FROM (
                SELECT 'okey' AS column_name,
                       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
                           AS ndv FROM orders
                UNION ALL
                SELECT 'ckey',
                       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                    FROM orders
                UNION ALL
                SELECT 'status',
                       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
                    FROM orders
                UNION ALL
                SELECT 'prio',
                       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
                    FROM orders
            )
        """,
        # value_counts: manifest-only categorical distributions from
        # the per-chunk topk lane; rows survive only when the slack
        # bound is 0, so the result must equal the plain GROUP BYs
        "value_counts": """
            SELECT 'status' AS column_name, o_orderstatus AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY o_orderstatus
            UNION ALL
            SELECT 'prio', o_orderpriority,
                   CAST(COUNT(*) AS BIGINT)
            FROM orders GROUP BY o_orderpriority
        """,
        # hist_selectivity: manifest-only COUNT-between brackets from
        # the per-chunk selectivity histograms; rows survive only
        # when the bracket contains the exact count (and, for the
        # full-domain band, only when it IS the exact count), so a
        # lane defect drops rows and fails the exact comparison
        "hist_selectivity": """
            SELECT 'okey_band' AS band, CAST(COUNT(*) AS BIGINT)
                       AS cnt
            FROM orders
            WHERE CAST(o_orderkey AS BIGINT) BETWEEN 100 AND 5000
            UNION ALL
            SELECT 'total_band', CAST(COUNT(*) AS BIGINT)
            FROM orders
            WHERE CAST(o_totalprice AS DOUBLE)
                  BETWEEN 50000.0 AND 150000.0
            UNION ALL
            SELECT 'okey_full', CAST(COUNT(*) AS BIGINT) FROM orders
        """,
        # quantile_bounds: manifest-only quantile brackets; each
        # (column, q) emits its exact k-th smallest (ROW_NUMBER rank,
        # k = ceil(q*n) in DOUBLE arithmetic on both sides — a
        # DECIMAL literal would ceil differently) only when the
        # bracket contains it
        "quantile_bounds": """
            WITH ok AS (
                SELECT CAST(o_orderkey AS BIGINT) AS v,
                       ROW_NUMBER() OVER (ORDER BY
                           CAST(o_orderkey AS BIGINT)) AS rn,
                       COUNT(*) OVER () AS n
                FROM orders),
            ck AS (
                SELECT CAST(o_custkey AS BIGINT) AS v,
                       ROW_NUMBER() OVER (ORDER BY
                           CAST(o_custkey AS BIGINT)) AS rn,
                       COUNT(*) OVER () AS n
                FROM orders)
            SELECT 'okey_p50' AS probe, v FROM ok
            WHERE rn = GREATEST(1, CAST(CEIL(
                CAST(0.5 AS DOUBLE) * n) AS BIGINT))
            UNION ALL
            SELECT 'okey_p90', v FROM ok
            WHERE rn = GREATEST(1, CAST(CEIL(
                CAST(0.9 AS DOUBLE) * n) AS BIGINT))
            UNION ALL
            SELECT 'ckey_p25', v FROM ck
            WHERE rn = GREATEST(1, CAST(CEIL(
                CAST(0.25 AS DOUBLE) * n) AS BIGINT))
            UNION ALL
            SELECT 'ckey_p75', v FROM ck
            WHERE rn = GREATEST(1, CAST(CEIL(
                CAST(0.75 AS DOUBLE) * n) AS BIGINT))
        """,
        # scan_estimate_probe: manifest-only planner probe; each case
        # emits its exact conjunctive count only when the Fréchet
        # bracket contains it, so the probe's rigor is oracle-checked
        "scan_estimate_probe": """
            SELECT 'okey_only' AS probe, CAST(COUNT(*) AS BIGINT)
                       AS cnt
            FROM orders
            WHERE CAST(o_orderkey AS BIGINT) BETWEEN 2000 AND 9000
            UNION ALL
            SELECT 'okey_and_total', CAST(COUNT(*) AS BIGINT)
            FROM orders
            WHERE CAST(o_orderkey AS BIGINT) BETWEEN 2000 AND 12000
              AND CAST(o_totalprice AS DOUBLE)
                  BETWEEN 80000.0 AND 250000.0
            UNION ALL
            SELECT 'okey_ckey_total', CAST(COUNT(*) AS BIGINT)
            FROM orders
            WHERE CAST(o_orderkey AS BIGINT) BETWEEN 1000 AND 13000
              AND CAST(o_custkey AS BIGINT) BETWEEN 100 AND 1000
              AND CAST(o_totalprice AS DOUBLE)
                  BETWEEN 50000.0 AND 300000.0
        """,
        # files_scan: two-phase file-skipping scan_where_files; equals
        # the plain conjunctive filter
        "files_scan": """
            SELECT CAST(o_orderkey AS BIGINT) AS okey,
                   CAST(o_custkey AS BIGINT) AS ckey,
                   o_orderpriority AS prio
            FROM orders
            WHERE CAST(o_orderkey AS BIGINT) BETWEEN 2000 AND 9000
              AND o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        """,
        # in_list_scan: IN-list band + range band, pruned via string
        # envelope + membership blooms; equals the plain conjunction
        "in_list_scan": """
            SELECT CAST(c_custkey AS BIGINT) AS ckey,
                   c_name, c_mktsegment
            FROM customer
            WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')
              AND CAST(c_custkey AS BIGINT) BETWEEN 100 AND 1200
        """,
        # bloom_string_lookup: the engine prunes via per-chunk string
        # blooms then decodes survivors; values must equal the plain
        # IN-list (absent sentinels match nothing on either side)
        "bloom_string_lookup": """
            WITH probe AS (
                (SELECT c_name FROM customer ORDER BY c_name LIMIT 3)
                UNION ALL
                (SELECT c_name FROM customer
                 ORDER BY c_name DESC LIMIT 3)
            )
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
                   c_name, c_mktsegment
            FROM customer
            WHERE c_name IN (SELECT c_name FROM probe)
        """,
        "zorder_scan": """
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       AS price_cents
            FROM orders
            WHERE o_custkey BETWEEN 100 AND 500
              AND o_totalprice BETWEEN 50000.0 AND 150000.0
        """,
        "delete_where_band": """
            SELECT o_orderkey, o_custkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       AS price_cents
            FROM orders
            WHERE o_totalprice IS NULL
               OR NOT (o_totalprice BETWEEN 50000.0 AND 80000.0)
        """,
        "agg_pushdown": """
            SELECT 'o_custkey' AS col,
                   COUNT(o_custkey) AS n_values,
                   COUNT(*) - COUNT(o_custkey) AS n_nulls,
                   MIN(o_custkey) AS vmin,
                   MAX(o_custkey) AS vmax,
                   CAST(SUM(o_custkey) AS DOUBLE) AS vsum
            FROM orders
            UNION ALL
            SELECT 'o_price' AS col,
                   COUNT(o_totalprice) AS n_values,
                   COUNT(*) - COUNT(o_totalprice) AS n_nulls,
                   MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS vmin,
                   MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS vmax,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                 * 100 AS BIGINT)) AS DOUBLE) AS vsum
            FROM orders
        """,
        "events_sessions": """
            WITH gaps AS (
                SELECT user_id, value, ts, event_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) IS NULL THEN 1
                            WHEN epoch(ts) - epoch(lag(ts) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id)) > 1800 THEN 1
                            ELSE 0 END AS new_sess
                FROM events
            ), sess AS (
                SELECT user_id, value,
                       SUM(new_sess) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM gaps
            ), per_sess AS (
                SELECT user_id, sess_id, COUNT(*) AS n_events,
                       SUM(CAST(ROUND(value*100) AS BIGINT)) AS value_cents
                FROM sess GROUP BY user_id, sess_id
            )
            SELECT CAST(n_events AS BIGINT) AS n_events,
                   COUNT(*) AS n_sessions,
                   CAST(SUM(value_cents) AS BIGINT) AS total_cents
            FROM per_sess GROUP BY n_events ORDER BY n_events
        """,
        "orders_rollup": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                   COALESCE(o_orderpriority, 'ALL') AS priority,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "customers_without_orders": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "heavy_parts_set_ops": """
            SELECT l_partkey AS partkey FROM lineitem
            WHERE l_quantity > 45
            EXCEPT
            SELECT l_partkey AS partkey FROM lineitem
            WHERE l_discount > 0.05
        """,
        "above_avg_orders": """
            WITH o AS (SELECT o_orderpriority,
                              CAST(ROUND(o_totalprice*100) AS BIGINT)
                                  AS cents
                       FROM orders),
            a AS (SELECT CAST(FLOOR(SUM(cents) * 1.0 / COUNT(*))
                              AS BIGINT) AS avg_cents FROM o)
            SELECT o_orderpriority, COUNT(*) AS n_above
            FROM o, a
            WHERE cents > avg_cents
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "quality_filter_by_lang": """
            WITH scored AS (
                SELECT lang,
                       CAST(GREATEST(LEAST(
                           (CASE WHEN n_tokens_ BETWEEN 20 AND 2000 THEN 40
                                 WHEN n_tokens_ BETWEEN 5 AND 5000 THEN 20
                                 ELSE 0 END)
                           + LEAST(CAST(FLOOR((stop_ * 100) / n_tokens_)
                                        AS INT) * 2, 60)
                           - (CASE WHEN punct_ * 10 > length(text) THEN 20
                                   ELSE 0 END), 100), 0) AS INT) AS q
                FROM (
                    SELECT lang, text,
                           CASE WHEN length(trim(text)) = 0 THEN 0
                                ELSE length(trim(text))
                                     - length(replace(trim(text), ' ', ''))
                                     + 1
                           END AS n_tokens_,
                           (length(' '||text||' ')
                             - length(replace(' '||text||' ', ' the ', '')))/5
                         + (length(' '||text||' ')
                             - length(replace(' '||text||' ', ' a ', '')))/3
                         + (length(' '||text||' ')
                             - length(replace(' '||text||' ', ' and ', '')))/5
                         + (length(' '||text||' ')
                             - length(replace(' '||text||' ', ' of ', '')))/4
                         + (length(' '||text||' ')
                             - length(replace(' '||text||' ', ' to ', '')))/4
                         + (length(' '||text||' ')
                             - length(replace(' '||text||' ', ' in ', '')))/4
                             AS stop_,
                           (length(text) - length(replace(text, '.', '')))
                         + (length(text) - length(replace(text, ',', '')))
                         + (length(text) - length(replace(text, '!', '')))
                         + (length(text) - length(replace(text, '?', '')))
                         + (length(text) - length(replace(text, ';', '')))
                         + (length(text) - length(replace(text, ':', '')))
                             AS punct_
                    FROM documents
                )
            )
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(q) AS BIGINT) AS quality_sum
            FROM scored WHERE q >= 40
            GROUP BY lang ORDER BY lang
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                       AS BIGINT) AS sum_base_price_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                       AS BIGINT) AS sum_disc_price_e4,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                       AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            HAVING revenue_e4 > 0
            ORDER BY revenue_e4 DESC, l_orderkey
            LIMIT 10
        """,
        "order_rank_window": """
            SELECT o_custkey, o_orderkey,
                   CAST(ROUND(o_totalprice*100) AS BIGINT)
                       AS totalprice_cents,
                   CAST(rnk AS INT) AS rnk
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                FROM orders
            ) WHERE rnk <= 3
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:00:00') AS hour,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "part_supplier_agg": """
            SELECT n_name AS nation,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty,
                   COUNT(DISTINCT p_partkey) AS distinct_parts
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY n_name
        """,
        "small_qty_revenue": """
            WITH li AS (
                SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                       CAST(ROUND(l_extendedprice*100) AS BIGINT)
                           AS price_cents
                FROM lineitem),
            pp AS (SELECT l_partkey, SUM(qty) AS sum_qty,
                          COUNT(*) AS cnt
                   FROM li GROUP BY l_partkey)
            SELECT COUNT(*) AS n_small,
                   CAST(SUM(price_cents) AS BIGINT) AS revenue_cents
            FROM li JOIN pp USING (l_partkey)
            WHERE qty * 5 * cnt < sum_qty
        """,
        "heavy_suppliers_semi": """
            SELECT n_name AS nation, COUNT(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_suppkey = s_suppkey
                            AND l_quantity >= 48)
            GROUP BY n_name
            ORDER BY n_name
        """,
        "events_pivot": """
            SELECT user_id % 10 AS bucket,
                   CAST(SUM(CASE WHEN event_type='click' THEN cents END) AS BIGINT)
                       AS click,
                   CAST(SUM(CASE WHEN event_type='error' THEN cents END) AS BIGINT)
                       AS error,
                   CAST(SUM(CASE WHEN event_type='purchase' THEN cents END) AS BIGINT)
                       AS purchase,
                   CAST(SUM(CASE WHEN event_type='signup' THEN cents END) AS BIGINT)
                       AS signup,
                   CAST(SUM(CASE WHEN event_type='view' THEN cents END) AS BIGINT)
                       AS view
            FROM (SELECT user_id, event_type,
                         CAST(ROUND(value*100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY 1 ORDER BY 1
        """,
        "events_moving_sum": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS moving_cents
            FROM events
        """,
        "order_price_percentiles": """
            SELECT o_orderpriority,
                   CAST(ROUND(quantile_cont(cents, 0.5) * 10) AS BIGINT)
                       AS p50_e1,
                   CAST(ROUND(quantile_cont(cents, 0.9) * 10) AS BIGINT)
                       AS p90_e1
            FROM (SELECT o_orderpriority,
                         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
                  FROM orders)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash,
                   MIN(doc_id) AS keep_id,
                   COUNT(*) AS dup_count
            FROM documents
            GROUP BY md5(text)
        """,
        "text_stats": """
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE length(trim(text))
                             - length(replace(trim(text), ' ', '')) + 1
                        END AS INT) AS n_tokens,
                   CAST(length(text) AS INT) AS n_chars_actual,
                   CAST((length(text) - length(replace(text, '.', '')))
                      + (length(text) - length(replace(text, ',', '')))
                      + (length(text) - length(replace(text, '!', '')))
                      + (length(text) - length(replace(text, '?', '')))
                      + (length(text) - length(replace(text, ';', '')))
                      + (length(text) - length(replace(text, ':', '')))
                        AS INT) AS n_punct,
                   CAST(GREATEST(LEAST(
                       (CASE WHEN n_tokens_ BETWEEN 20 AND 2000 THEN 40
                             WHEN n_tokens_ BETWEEN 5 AND 5000 THEN 20
                             ELSE 0 END)
                       + LEAST(CAST(FLOOR((stop_ * 100) / n_tokens_)
                                    AS INT) * 2, 60)
                       - (CASE WHEN punct_ * 10 > length(text) THEN 20
                               ELSE 0 END), 100), 0) AS INT) AS quality
            FROM (
                SELECT doc_id, text,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE length(trim(text))
                                 - length(replace(trim(text), ' ', '')) + 1
                       END AS n_tokens_,
                       (length(' '||text||' ')
                         - length(replace(' '||text||' ', ' the ', '')))/5
                     + (length(' '||text||' ')
                         - length(replace(' '||text||' ', ' a ', '')))/3
                     + (length(' '||text||' ')
                         - length(replace(' '||text||' ', ' and ', '')))/5
                     + (length(' '||text||' ')
                         - length(replace(' '||text||' ', ' of ', '')))/4
                     + (length(' '||text||' ')
                         - length(replace(' '||text||' ', ' to ', '')))/4
                     + (length(' '||text||' ')
                         - length(replace(' '||text||' ', ' in ', '')))/4
                         AS stop_,
                       (length(text) - length(replace(text, '.', '')))
                     + (length(text) - length(replace(text, ',', '')))
                     + (length(text) - length(replace(text, '!', '')))
                     + (length(text) - length(replace(text, '?', '')))
                     + (length(text) - length(replace(text, ';', '')))
                     + (length(text) - length(replace(text, ':', '')))
                         AS punct_
                FROM documents
            )
        """,
        "lang_id": """
            WITH scores AS (
                SELECT doc_id,
                    (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' der ', '')))/5
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' und ', '')))/5
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' nicht ', '')))/7
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' das ', '')))/5
                      AS s_de,
                    (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' le ', '')))/4
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' et ', '')))/4
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' les ', '')))/5
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' des ', '')))/5
                      AS s_fr,
                    (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' el ', '')))/4
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' y ', '')))/3
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' los ', '')))/5
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' las ', '')))/5
                      AS s_es,
                    (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' the ', '')))/5
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' and ', '')))/5
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' of ', '')))/4
                  + (length(' '||text||' ')
                      - length(replace(' '||text||' ', ' to ', '')))/4
                      AS s_en
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN s_de + s_fr + s_es + s_en = 0 THEN 'unknown'
                        WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_en
                             THEN 'de'
                        WHEN s_fr >= s_es AND s_fr >= s_en THEN 'fr'
                        WHEN s_es >= s_en THEN 'es'
                        ELSE 'en' END AS lang_pred
            FROM scores
        """,
        "fingerprint": """
            SELECT doc_id,
                   COALESCE(list_reduce(
                       list_transform(string_split(trim(text), ' '),
                           w -> {'h': CAST(ascii(w) + length(w)
                                           AS BIGINT),
                                 'p': CAST(31 AS BIGINT)}),
                       (a, b) -> {'h': (a.h + b.h * a.p) % 1000000007,
                                  'p': (a.p * b.p) % 1000000007}
                   ).h, 0) AS fp
            FROM documents
        """,
        "minhash_pairs_md5": _minhash_md5_oracle(),
        # simhash_pairs_md5: 32-bit set-semantics simhash, same md5
        # low-32 hash family as Spark; block-pair buckets (8 nibble
        # blocks), exact bit_count(xor) hamming — all integer-exact
        "simhash_pairs_md5": """
            WITH sh AS (
                SELECT doc_id,
                       unnest(list_distinct([substr(text, i, 5)
                           for i in generate_series(
                               1, greatest(length(text) - 4, 1))])) AS s
                FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
                      FROM documents)
            ),
            hh AS (
                SELECT doc_id,
                       ('0x'||substr(md5('s:'||s),1,15))::BIGINT
                           & 4294967295 AS h
                FROM sh
            ),
            bits AS (
                SELECT doc_id, bb.b AS b,
                       sum(CASE WHEN (h >> bb.b) & 1 = 1
                                THEN 1 ELSE -1 END) AS c
                FROM hh, (SELECT unnest(generate_series(0, 31)) AS b) bb
                GROUP BY doc_id, bb.b
            ),
            sig AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN c > 0
                                THEN (CAST(1 AS BIGINT) << b)
                                ELSE 0 END) AS BIGINT) AS sig
                FROM bits GROUP BY doc_id
            ),
            pidx AS (
                SELECT ii.i AS i, jj.j AS j
                FROM (SELECT unnest(generate_series(0, 7)) AS i) ii,
                     (SELECT unnest(generate_series(0, 7)) AS j) jj
                WHERE ii.i < jj.j
            ),
            keys0 AS (
                SELECT s.doc_id, p.i * 8 + p.j AS t,
                       ((s.sig >> (p.i * 4)) & 15)
                           | (((s.sig >> (p.j * 4)) & 15) << 4) AS bk
                FROM sig s, pidx p
            ),
            -- bucket cap (r5): mirrors Spark's max_bucket=256 —
            -- oversized no-signal buckets never join
            sized AS (
                SELECT t, bk FROM keys0
                GROUP BY t, bk HAVING count(*) <= 256
            ),
            keys AS (
                SELECT k.* FROM keys0 k
                JOIN sized z ON k.t = z.t AND k.bk = z.bk
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM keys a JOIN keys b
                  ON a.t = b.t AND a.bk = b.bk AND a.doc_id < b.doc_id
            )
            SELECT c.doc_a, c.doc_b,
                   CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS hamming
            FROM cand c
            JOIN sig x ON x.doc_id = c.doc_a
            JOIN sig y ON y.doc_id = c.doc_b
            WHERE bit_count(xor(x.sig, y.sig)) <= 6
        """,
        "jaccard_pairs": """
            WITH sets AS (
                SELECT doc_id AS id,
                       list_distinct([
                           array_to_string(words[i:i+2], ' ')
                           for i in range(1, len(words) - 1)
                       ]) AS sh
                FROM (SELECT doc_id,
                             string_split(trim(text), ' ') AS words
                      FROM documents WHERE doc_id < 60)
            )
            SELECT a.id AS id, b.id AS id2,
                   CAST(len(list_intersect(a.sh, b.sh)) AS INT) AS inter,
                   CAST(len(list_distinct(list_concat(a.sh, b.sh)))
                        AS INT) AS uni
            FROM sets a, sets b
            WHERE a.id < b.id
              AND len(list_intersect(a.sh, b.sh)) >= 0
        """,
        "embedding_neardup": """
            WITH e AS (SELECT vec_id,
                              CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings
                       WHERE vec_id < 2000)
            SELECT a.vec_id AS id, b.vec_id AS id2,
                   CAST(ROUND(list_cosine_similarity(a.emb, b.emb) * 10000)
                        AS BIGINT) AS cos_bp
            FROM e a, e b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.emb, b.emb) >= 0.2
        """,
        "pack_sequences": """
            WITH stream AS (
                SELECT l_partkey,
                       ROW_NUMBER() OVER (
                           ORDER BY CAST(l_orderkey AS VARCHAR),
                                    l_linenumber, l_partkey) - 1 AS gpos
                FROM lineitem
            )
            SELECT CAST(gpos // 512 AS BIGINT) AS pack_id,
                   COUNT(*) AS n_tok,
                   CAST(SUM(l_partkey) AS BIGINT) AS token_sum,
                   CAST(MIN(l_partkey) AS BIGINT) AS token_min,
                   CAST(MAX(l_partkey) AS BIGINT) AS token_max
            FROM stream GROUP BY 1
        """,
        "train_val_split": """
            SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '1a'
                        THEN 'val' ELSE 'train' END AS split,
                   source, COUNT(*) AS n_docs
            FROM documents
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "domain_mix_sample": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, source
            FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) <
                  CASE source WHEN 'src0' THEN 'g'
                              WHEN 'src1' THEN '8000'
                              WHEN 'src2' THEN '199a'
                              ELSE '' END
        """,
        "boilerplate_removal": """
            WITH d AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     'BANNER-' || source || chr(10) || text ||
                     chr(10) || 'COPYRIGHT FOOTER' AS t
              FROM documents
            ), p AS (
              SELECT doc_id,
                     unnest(string_split(t, chr(10))) AS para,
                     generate_subscripts(string_split(t, chr(10)), 1)
                         AS pos
              FROM d
            ), c AS (
              SELECT para, COUNT(*) AS cnt FROM p GROUP BY para
            ), k AS (
              SELECT doc_id,
                     string_agg(para, chr(10) ORDER BY pos) AS clean
              FROM p JOIN c USING (para)
              WHERE cnt <= 1
              GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(k.clean, '') AS text
            FROM d LEFT JOIN k USING (doc_id)
        """,
        "decontaminate": """
            WITH w AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ), wi AS (
              SELECT doc_id, ws,
                     unnest(range(1, greatest(len(ws) - 6, 1))) AS i
              FROM w
            ), pg AS (
              SELECT DISTINCT array_to_string(ws[i:i+7], ' ') AS g
              FROM wi WHERE CAST(doc_id AS BIGINT) % 37 = 0
            ), dg AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ')
                         AS g
              FROM wi
            )
            SELECT DISTINCT doc_id
            FROM dg JOIN pg USING (g)
            ORDER BY doc_id
        """,
        "pipeline_end_to_end": """
            WITH d AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source
              FROM documents
            ), p AS (
              SELECT doc_id, source,
                     unnest(string_split(text, chr(10))) AS para,
                     generate_subscripts(string_split(text, chr(10)),
                                         1) AS pos
              FROM d
            ), c AS (
              SELECT para, COUNT(*) AS cnt FROM p GROUP BY para
            ), k AS (
              SELECT doc_id,
                     string_agg(para, chr(10) ORDER BY pos) AS clean
              FROM p JOIN c USING (para) WHERE cnt <= 2
              GROUP BY doc_id
            ), cleaned AS (
              SELECT d.doc_id, COALESCE(k.clean, '') AS text, d.source
              FROM d LEFT JOIN k USING (doc_id)
            ), w0 AS (
              SELECT doc_id, source,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM cleaned
            ), wi AS (
              SELECT doc_id, ws,
                     unnest(range(1, greatest(len(ws) - 6, 1))) AS i
              FROM w0
            ), pg AS (
              SELECT DISTINCT array_to_string(ws[i:i+7], ' ') AS g
              FROM wi WHERE CAST(doc_id AS BIGINT) % 37 = 0
            ), bad AS (
              SELECT DISTINCT doc_id FROM wi JOIN pg
                ON array_to_string(ws[i:i+7], ' ') = pg.g
            ), kept AS (
              SELECT * FROM w0
              WHERE doc_id NOT IN (SELECT doc_id FROM bad)
            ), words AS (
              SELECT doc_id, source, unnest(ws) AS word,
                     generate_subscripts(ws, 1) - 1 AS pos
              FROM kept
            ), v AS (
              SELECT word,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word)
                         AS tid
              FROM words GROUP BY word
              ORDER BY COUNT(*) DESC, word LIMIT 256
            )
            SELECT words.doc_id, CAST(words.pos AS INT) AS pos,
                   CAST(COALESCE(v.tid, 0) AS INT) AS token,
                   words.source
            FROM words LEFT JOIN v USING (word)
        """,
        # the O(n*m)-per-key inequality-join + argmax form the
        # union+window asof_join avoids; ties broken identically
        # (greatest ts, then greatest event_id)
        "asof_attribution": """
            WITH p AS (
              SELECT event_id AS purchase_id, user_id, ts
              FROM events WHERE event_type = 'purchase'
            ), v AS (
              SELECT event_id, user_id, ts, value
              FROM events WHERE event_type = 'view'
            )
            SELECT purchase_id, p.user_id AS user_id,
                   v.event_id AS view_event_id, v.value AS view_value
            FROM p LEFT JOIN v
              ON p.user_id = v.user_id AND v.ts <= p.ts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY purchase_id
                ORDER BY v.ts DESC NULLS LAST,
                         v.event_id DESC NULLS LAST) = 1
        """,
        # the quadratic theta-join the bucketed range_pair_join avoids
        "value_band_pairs": """
            WITH e AS (
              SELECT event_id, value FROM events WHERE event_id < 2000
            )
            SELECT a.event_id AS id_a, b.event_id AS id_b,
                   a.value AS value_a, b.value AS value_b
            FROM e a JOIN e b
              ON a.event_id < b.event_id
             AND abs(a.value - b.value) <= 0.05
        """,
        # the shuffle-heavy unnest + GROUP BY (doc, word) form the
        # sort_array run-length scan replaces
        "repetition_filter": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents
            ), c AS (
              SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2
            )
            SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(MAX(cnt) AS BIGINT) AS top_count,
                   MAX(cnt) <= 0.2 * SUM(cnt) AS keep
            FROM c GROUP BY doc_id
        """,
        # identical deterministic PII fixture (doc_id-derived email +
        # phone), then the same RE2/Java-portable patterns via
        # regexp_replace(..., 'g'); match counts via split-length - 1
        "pii_scrub": """
            WITH d AS (
              SELECT doc_id,
                     text || ' reach user' || CAST(doc_id AS VARCHAR)
                          || '@mail-test.example.com or 555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                  4, '0') AS text
              FROM documents WHERE doc_id < 200
            ), s AS (
              SELECT doc_id,
                     CAST(len(regexp_split_to_array(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
                       )) - 1 AS BIGINT) AS n_emails,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM d
            )
            SELECT doc_id,
                   regexp_replace(t1, '\\b[0-9]{3}-[0-9]{4}\\b',
                                  '<PHONE>', 'g') AS text,
                   n_emails,
                   CAST(len(regexp_split_to_array(t1,
                     '\\b[0-9]{3}-[0-9]{4}\\b')) - 1 AS BIGINT)
                       AS n_phones
            FROM s
        """,
        # same token table as roundtrip_lineitem_tokens; n-grams as
        # comma-joined runs via 1-based inclusive list slicing
        "token_decontaminate": """
            WITH tok AS (
              SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                     list(l_partkey
                          ORDER BY l_linenumber, l_partkey) AS tokens
              FROM lineitem GROUP BY l_orderkey
            ), g AS (
              SELECT doc_id,
                     array_to_string(tokens[i:i+2], ',') AS ngram
              FROM (SELECT doc_id, tokens,
                           unnest(range(1, len(tokens) - 1)) AS i
                    FROM tok WHERE len(tokens) >= 3)
            ), pg AS (
              SELECT DISTINCT ngram FROM g
              WHERE CAST(doc_id AS BIGINT) % 41 = 0
            )
            SELECT DISTINCT doc_id
            FROM g JOIN pg USING (ngram)
            ORDER BY doc_id
        """,
        # recursive-CTE reachability + min label: the O(diameter)
        # label propagation the alternating-star operator avoids
        "dedup_clusters": """
            WITH RECURSIVE
            ev AS (
              SELECT event_id, value FROM events WHERE event_id < 2000
            ),
            e AS (
              SELECT a.event_id AS u, b.event_id AS v
              FROM ev a JOIN ev b
                ON a.event_id <> b.event_id
               AND abs(a.value - b.value) <= 0.05
            ),
            reach(node, r) AS (
              SELECT DISTINCT u, u FROM e
              UNION
              SELECT reach.node, e.v FROM reach JOIN e
                ON e.u = reach.r
            )
            SELECT node, MIN(r) AS component
            FROM reach GROUP BY node
        """,
        "curation_pipeline": """
            WITH d AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, source,
                     n_chars
              FROM documents
            ),
            samp AS (
              SELECT doc_id, text, source FROM (
                SELECT doc_id, text, source,
                       SUM(n_chars) OVER (PARTITION BY source
                         ORDER BY md5(doc_id), doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
                FROM d
                WHERE source IN ('src0','src1','src2',
                                 'src3','src4','src5')
              ) WHERE cum <= CASE source
                               WHEN 'src0' THEN 4000
                               WHEN 'src1' THEN 2500
                               WHEN 'src2' THEN 1000
                               WHEN 'src3' THEN 3000
                               WHEN 'src4' THEN 3000
                               ELSE 2000 END
            ),
            w AS (
              SELECT doc_id, source,
                     unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9]+')) AS word,
                     generate_subscripts(
                         regexp_extract_all(lower(text), '[a-z0-9]+'),
                         1) - 1 AS pos
              FROM samp
            ),
            v AS (
              SELECT word,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word)
                         AS token_id
              FROM w GROUP BY word
              ORDER BY COUNT(*) DESC, word LIMIT 512
            ),
            t AS (
              SELECT w.doc_id, w.pos,
                     CAST(COALESCE(v.token_id, 0) AS BIGINT) AS token,
                     w.source
              FROM w LEFT JOIN v USING (word)
            ),
            lm AS (SELECT token, COUNT(*) AS freq FROM t
                   GROUP BY token),
            tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS tt,
                           CAST(COUNT(*) AS DOUBLE) AS vv FROM lm),
            x AS (
              SELECT doc_id,
                     CAST(ROUND(-10000 * AVG(
                       log2((freq + 1.0) / (tt + vv)))) AS BIGINT)
                       AS xent_bp
              FROM t JOIN lm USING (token) CROSS JOIN tot
              GROUP BY doc_id
            )
            SELECT t.doc_id, CAST(t.pos AS INT) AS pos,
                   CAST(t.token AS INT) AS token, t.source
            FROM t JOIN x USING (doc_id)
            WHERE x.xent_bp < 49000
        """,
        # IVF ANN: the same left-fold arithmetic as the Spark side —
        # centroid choice (md5 order), cell argmax (first-max index),
        # probe ranks, and neighbor ranks are all bit-reproducible
        "knn_ivf": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings
            ),
            cents AS (
              SELECT ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                     - 1 AS cidx,
                     emb AS cemb
              FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
              LIMIT 8
            ),
            cn AS (
              SELECT cidx, cemb,
                     sqrt(list_reduce(list_transform(cemb, x -> x * x),
                          (a, b) -> a + b)) AS cnorm
              FROM cents
            ),
            sims AS (
              SELECT e.vec_id, c.cidx,
                     list_reduce(list_transform(
                         list_zip(e.emb, c.cemb), z -> z[1] * z[2]),
                         (a, b) -> a + b) / c.cnorm AS sim
              FROM e CROSS JOIN cn c
            ),
            ranked AS (
              SELECT vec_id, cidx,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                         ORDER BY sim DESC, cidx) AS rn
              FROM sims
            ),
            cell AS (SELECT vec_id, cidx AS cell FROM ranked
                     WHERE rn = 1),
            probes AS (SELECT vec_id AS query_id, cidx AS cell
                       FROM ranked WHERE rn <= 2 AND vec_id < 20),
            en AS (
              SELECT vec_id, emb,
                     sqrt(list_reduce(list_transform(emb, x -> x * x),
                          (a, b) -> a + b)) AS nrm
              FROM e
            ),
            scored AS (
              SELECT p.query_id, a.vec_id AS neighbor_id,
                     list_reduce(list_transform(
                         list_zip(q.emb, c.emb), z -> z[1] * z[2]),
                         (a, b) -> a + b) / (q.nrm * c.nrm) AS cosine
              FROM probes p
              JOIN cell a ON a.cell = p.cell
              JOIN en c ON c.vec_id = a.vec_id
              JOIN en q ON q.vec_id = p.query_id
              WHERE a.vec_id != p.query_id
            )
            SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank
            FROM (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, neighbor_id) AS rnk
                  FROM scored)
            WHERE rnk <= 5
        """,
        "perplexity_filter": """
            WITH toks AS (
              SELECT CAST(l_orderkey AS VARCHAR) AS doc_id,
                     CAST(l_partkey AS BIGINT) AS token
              FROM lineitem
            ),
            lm AS (
              SELECT token, COUNT(*) AS freq FROM toks GROUP BY token
            ),
            tot AS (
              SELECT CAST(SUM(freq) AS DOUBLE) AS t,
                     CAST(COUNT(*) AS DOUBLE) AS v
              FROM lm
            )
            SELECT doc_id,
                   CAST(ROUND(-10000 * AVG(
                     log2((freq + 1.0) / (t + v)))) AS BIGINT)
                     AS xent_bp
            FROM toks JOIN lm USING (token) CROSS JOIN tot
            GROUP BY doc_id
            ORDER BY xent_bp DESC, doc_id
            LIMIT 500
        """,
        "token_budget_sample": """
            SELECT doc_id, source, n_chars
            FROM (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
                     n_chars,
                     SUM(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
              FROM documents
              WHERE source IN ('src0', 'src1', 'src2')
            ) t
            WHERE cum <= CASE source WHEN 'src0' THEN 4000
                                     WHEN 'src1' THEN 2500
                                     ELSE 1000 END
        """,
        "token_histogram": """
            SELECT CAST(l_partkey AS BIGINT) AS token,
                   COUNT(*) AS freq
            FROM lineitem
            GROUP BY 1
            ORDER BY freq DESC, token
            LIMIT 50
        """,
        # the deterministic fake embedder (sha256 digest repeated to
        # 64 bytes, read as 16 little-endian uint32s, mod 1000)
        # reproduced in SQL: hex-pair arithmetic over sha256(text).
        # sha256(VARCHAR) hashes the UTF-8 bytes — identical input to
        # the Spark side's encode(text,'utf-8') payload.
        "multimodal_features": """
            WITH hx AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       repeat(sha256(text), 2) AS hh
                FROM documents
            )
            SELECT doc_id, CAST(g.i AS INT) AS pos,
                   CAST((
                     (strpos('0123456789abcdef',
                             substr(hh, 8*g.i+1, 1))-1)*16
                   + (strpos('0123456789abcdef',
                             substr(hh, 8*g.i+2, 1))-1)
                   + ((strpos('0123456789abcdef',
                              substr(hh, 8*g.i+3, 1))-1)*16
                    + (strpos('0123456789abcdef',
                              substr(hh, 8*g.i+4, 1))-1)) * 256
                   + ((strpos('0123456789abcdef',
                              substr(hh, 8*g.i+5, 1))-1)*16
                    + (strpos('0123456789abcdef',
                              substr(hh, 8*g.i+6, 1))-1)) * 65536
                   + ((strpos('0123456789abcdef',
                              substr(hh, 8*g.i+7, 1))-1)*16
                    + (strpos('0123456789abcdef',
                              substr(hh, 8*g.i+8, 1))-1))
                     * CAST(16777216 AS BIGINT)
                   ) % 1000 AS INT) AS mill
            FROM hx, generate_series(0, 15) AS g(i)
        """,
        "knn_lsh_md5": _knn_lsh_md5_oracle(),
        "embedding_neardup_lsh_md5": _emb_lsh_md5_oracle(),
        "knn_cosine": """
            WITH e AS (SELECT vec_id,
                              CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       list_cosine_similarity(q.emb, c.emb) AS cosine
                FROM e q, e c
                WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
            )
            SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank
            FROM (SELECT query_id, neighbor_id,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, neighbor_id) AS rnk
                  FROM scored)
            WHERE rnk <= 5
        """,
    }
