"""Z-order (Morton) clustering for multi-column zone-map pruning.

Single-key range clustering (``mode="range"``, ``recluster_snapshot``)
gives tight chunk bounds on ONE column; a band predicate on any other
column keeps every chunk. Interleaving the bits of two or three
normalized column ranks puts rows that are close in EVERY dimension
into the same chunks, so ``scan_where`` multi-band queries prune on
all probed columns at once — the lakehouse ``OPTIMIZE ZORDER BY``
analog (Delta/Iceberg publish the same trick), built from pure JVM
expressions:

* per column, a 2-scalar min/max aggregate normalizes values to a
  21/31-bit integer rank (doubles as the intermediate — exact enough
  for layout, and the zone maps + residual filter own correctness);
* the classic shift-and-mask bit-spread
  (``x = (x | x << 16) & 0x0000FFFF0000FFFF`` …) runs as codegen'd
  long arithmetic — no UDF, no shuffle beyond the single
  ``repartitionByRange`` every clustering needs anyway.

NULLs rank 0 (they cluster together at the low corner and the
zone-map silent-miss rules keep them correct); NaN floats rank top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_cluster"]

_SPREAD2 = [  # interleave masks for 2 columns (31 bits each)
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
_SPREAD3 = [  # canonical interleave masks for 3 columns (21 bits each)
    (32, 0x001F00000000FFFF),
    (16, 0x001F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread(c: Column, table) -> Column:
    for shift, mask in table:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(
            F.lit(mask))
    return c


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Morton-code Column over 2 or 3 numeric/date/timestamp columns
    of ``df`` (bounds come from one tiny min/max aggregate)."""
    if not 2 <= len(cols) <= 3:
        raise ValueError("zorder_key: 2 or 3 columns")
    bits = 31 if len(cols) == 2 else 21
    table = _SPREAD2 if len(cols) == 2 else _SPREAD3
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        # bounds over FINITE values only: a NaN max (Spark ranks NaN
        # above everything) or an Inf bound would poison the span and
        # collapse every row's rank
        fin = F.when(~F.isnan(d) & (F.abs(d) != F.lit(float("inf"))), d)
        aggs += [F.min(fin).alias(f"_lo_{c}"),
                 F.max(fin).alias(f"_hi_{c}")]
    b = df.agg(*aggs).first()
    parts = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        lo, hi = b[f"_lo_{c}"], b[f"_hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            rank = F.lit(0).cast("long")
        else:
            d = F.col(c).cast("double")
            scaled = ((d - F.lit(float(lo))) / F.lit(float(hi - lo))
                      * F.lit(float(top)))
            # clamp in the DOUBLE domain, THEN cast: under ANSI mode
            # (this repo's default) casting NaN/Inf to long throws
            # CAST_OVERFLOW, so the clamp must precede the cast. NaN
            # ranks top explicitly; +/-Inf saturate via the clamp
            # (bounds above are finite, so scaled is +/-Inf there).
            rank = F.when(F.isnan(d), F.lit(top).cast("long")).otherwise(
                F.least(F.lit(float(top)),
                        F.greatest(F.lit(0.0), scaled)).cast("long"))
        # NULL -> 0 (low corner); NaN -> top
        rank = F.coalesce(rank, F.lit(0).cast("long"))
        parts.append(F.shiftleft(_spread(rank, table), i))
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return z


def zorder_cluster(df: DataFrame, cols: list[str],
                   num_parts: int) -> DataFrame:
    """Range-partition + locally sort ``df`` by its Morton code —
    feed straight into ``encode_table(mode="scan")`` for chunks whose
    zone maps are tight on EVERY ``cols`` member. One shuffle (plus a
    one-time seeded sample), the same cost as any reclustering.

    Determinism: Spark's own ``repartitionByRange`` re-samples its
    bounds with a seed tied to session history (the RDD id), so the
    identical call can yield a different layout — and different
    pruning quality — run to run. Like ``pack_sequences``, the cut
    points here come from a seed-42 sample collected ONCE and embedded
    as literals, making the layout a pure function of the input. Rows
    are then placed EXACTLY one bucket per partition: bucket i ships
    under a relabeled key l_i chosen (by one metadata-sized probe job)
    so that ``pmod(murmur3(l_i), num_parts) == i`` — Spark's own
    HashPartitioning then acts as the identity on buckets, with none
    of the bucket-merging collisions a raw ``repartition(n, pid)``
    hash would produce (a merged pair of non-adjacent z-ranges widens
    every straddling chunk's bounds)."""
    z = zorder_key(df, cols).alias("_z")
    base = df.select("*", z)
    if num_parts <= 1:
        return (base.repartition(1).sortWithinPartitions("_z")
                .drop("_z"))
    n = base.count()
    frac = min(1.0, (num_parts * 200) / max(n, 1))
    sample = sorted(r["_z"] for r in
                    base.select("_z")
                    .sample(False, frac, seed=42).collect())
    cuts = sorted({sample[len(sample) * i // num_parts]
                   for i in range(1, num_parts)}) \
        if len(sample) > num_parts else []
    if cuts:
        carr = F.array(*[F.lit(int(c)).cast("long") for c in cuts])
        pid = F.aggregate(
            carr, F.lit(0),
            lambda acc, c: acc + F.when(F.col("_z") >= c, 1)
            .otherwise(0))
    else:
        pid = F.lit(0)
    spark = df.sparkSession
    k = len(cuts) + 1
    lab_rows = (spark.range(num_parts * 64)
                .select(F.col("id").cast("int").alias("l"))
                .withColumn("m", F.pmod(F.hash(F.col("l")),
                                        F.lit(num_parts)))
                .groupBy("m").agg(F.min("l").alias("l")).collect())
    label_of = {int(r["m"]): int(r["l"]) for r in lab_rows}
    if len(label_of) < min(k, num_parts):  # pragma: no cover
        # P(miss) ~ num_parts * e^-64 — fall back to raw pid hashing
        labels = list(range(k))
    else:
        labels = [label_of[i % num_parts] for i in range(k)]
    labels_arr = F.array(*[F.lit(x) for x in labels])
    return (base.withColumn("_pl", F.get(labels_arr, pid))
            .repartition(num_parts, "_pl")
            .sortWithinPartitions("_z")
            .drop("_z", "_pl"))
