"""Temporal join operators Spark's DataFrame API lacks as built-ins:
backward as-of join (latest right row at-or-before each left row) and
epsilon range pair-join (all pairs within a value tolerance) — both
expressed as compositions of existing operators so Catalyst keeps the
whole plan JVM-side, with NO cross join and NO per-row Python.

Reference parity: br-archive is an archiver and has no join surface;
these cover SURVEY §2's "beyond the reference: training-data pipeline
operators" axis (event attribution, near-value matching) the way
kdb/Pandas ``merge_asof`` and DuckDB ``ASOF JOIN`` do for their
engines.

Scale notes (100 TB):

* ``asof_join`` is the union+window form: tag both inputs, union, one
  hash shuffle on the join key, one sort per partition, one running
  ``last(ignorenulls)`` window — O(n log n) per key, ONE Exchange in
  the whole plan, no join node at all.  The naive form (inequality
  join + argmax) is O(left × right) per key and is what the DuckDB
  oracle uses to verify us.
* ``range_pair_join`` buckets values at the tolerance width; each row
  probes its own and both adjacent buckets, so every qualifying pair
  meets in EXACTLY one (probe, build) direction and no ``distinct``
  pass is needed.  The join is an equi-join on the bucket id —
  SortMergeJoin/AQE territory, never a CartesianProduct.  Work is
  proportional to sum of bucket-pair products (data density), not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_pair_join"]


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_time: str, right_time: str,
              payload: dict[str, str],
              tiebreak: str | None = None,
              tolerance: Column | None = None) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``payload``
    columns of the LATEST ``right`` row sharing its ``on`` key with
    ``right_time <= left_time`` (inclusive); unmatched left rows keep
    NULL payloads (left-outer semantics).

    ``payload`` maps output column name -> right column name.  Ties on
    ``right_time`` resolve deterministically to the greatest
    ``tiebreak`` value (required for oracle-exact results when right
    times can repeat).  ``tolerance`` (a duration/numeric Column, e.g.
    ``F.expr("INTERVAL 1 HOUR")``) nulls the payload when the matched
    row is older than ``left_time - tolerance``.

    Plan shape: union → ONE Exchange on ``on`` → sort → running
    ``last`` window → filter.  No join operator; payload columns ride
    in a single struct so a right row whose payload VALUE is null
    cannot be skipped over in favour of an older row.
    """
    if not payload:
        raise ValueError("asof_join: payload must name >=1 right column")
    bad = [c for c in payload if c in left.columns]
    if bad:
        raise ValueError(f"asof_join: payload names collide with left "
                         f"columns: {bad}")

    # struct carrying the matched right row atomically: its time (for
    # tolerance), the tiebreak, and every payload column
    tb_col = F.col(tiebreak) if tiebreak is not None else F.lit(0)
    pstruct = F.struct(
        F.col(right_time).alias("_mt"), tb_col.alias("_tb"),
        *[F.col(src).alias(out) for out, src in payload.items()])
    ptype = right.select(pstruct.alias("_p")).schema[0].dataType

    lcols = left.columns
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    lhs = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(ptype).alias("_p"))
    rhs = right.select(
        *[F.col(k) for k in on],
        *[F.lit(None).cast(ltypes[c]).alias(c)
          for c in lcols if c not in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        pstruct.alias("_p"))

    # right rows sort BEFORE the left row at equal time (inclusive
    # <=); among equal-time right rows the greatest tiebreak sorts
    # last, so the running last() picks it
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_t").asc(), F.col("_side").asc(),
                  F.col("_p._tb").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (lhs.unionByName(rhs)
               .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
               .where(F.col("_side") == 1))
    if tolerance is not None:
        matched = matched.withColumn(
            "_m", F.when(F.col("_m._mt") >= F.col("_t") - tolerance,
                         F.col("_m")))
    return matched.select(
        *[F.col(c) for c in lcols],
        *[F.col("_m")[out].alias(out) for out in payload])


def range_pair_join(df: DataFrame, id_col: str, value_col: str,
                    eps: float) -> DataFrame:
    """All unordered pairs of rows whose ``value_col`` differ by at
    most ``eps``, as ``(id_a, id_b, value_a, value_b)`` with
    ``id_a < id_b`` — each qualifying pair exactly once.

    Bucket width = ``eps`` guarantees a qualifying pair sits in the
    same or adjacent buckets; the probe side expands each row to
    ``{b-1, b, b+1}`` so every pair meets in both directions, and the
    ``id_a < id_b`` filter keeps exactly one of the two — no
    ``distinct`` shuffle.  The symmetric 3-bucket expansion also
    absorbs the 1-ulp float edge where ``floor(v / eps)`` lands a
    boundary value one bucket off.

    Plan shape: equi-join on the bucket id (SortMergeJoin; AQE may
    pick shuffled-hash) — structurally NOT a CartesianProduct, which
    is what the naive ``|a.v - b.v| <= eps`` theta-join degenerates to
    (tests/test_plans.py locks this).  Skewed value clumps fatten one
    bucket; AQE skew-join splits it at runtime.
    """
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(value_col).alias("_v"),
                     F.floor(F.col(value_col) / F.lit(eps)).alias("_b"))
    probe = (base.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("value_a"),
        F.explode(F.array(F.col("_b") - 1, F.col("_b"),
                          F.col("_b") + 1)).alias("_pb")))
    build = base.select(F.col("_id").alias("id_b"),
                        F.col("_v").alias("value_b"),
                        F.col("_b").alias("_pb"))
    return (probe.join(build, "_pb")
            .where((F.abs(F.col("value_a") - F.col("value_b"))
                    <= F.lit(eps))
                   & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b", "value_a", "value_b"))
