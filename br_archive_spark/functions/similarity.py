"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k, all JVM-side
  (``zip_with``/``aggregate`` dot products + window rank). The
  correctness baseline; O(n·m) — fine for a broadcast-able query set,
  which is the common "find neighbors for these 1k probes in 10^9 docs"
  shape: broadcast the probes, scan the corpus once.
* :func:`lsh_topk` — random-hyperplane LSH bucketed variant: sign
  sketch → bucket equality join → exact cosine only within buckets.
  The 100 TB path: candidate generation is a shuffle join on the
  sketch, never a cross join.

Hyperplanes are derived deterministically from ``xxhash64(dim, plane)``
so results are reproducible with no driver-side randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_norm", "cosine_topk", "lsh_topk", "hyperplane_family",
           "ivf_centroids", "ivf_topk"]


def hyperplane_family(planes: int, dim: int,
                      salt: int = 0) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix derived DRIVER-SIDE from
    ``hashlib.md5`` — engine-neutral, so an external SQL engine given
    the same literal matrix reproduces the sketch bit-for-bit (the
    value-checkable alternative to the in-plan ``xxhash64`` weights of
    :func:`_sketch`). The matrix is tiny (planes × dim) and ships in
    the plan as literals — broadcast-free and identical on every
    executor."""
    import hashlib

    return [[1.0 if hashlib.md5(f"{salt}:{p}:{d}".encode()).digest()[0]
             & 1 else -1.0
             for d in range(dim)]
            for p in range(planes)]


def _sketch_lit(vec_col: str, fam: list[list[float]]):
    """Sign sketch against a LITERAL weight matrix (see
    :func:`hyperplane_family`). The projection is the same
    left-to-right ``aggregate`` fold as :func:`_dot`, so another
    engine folding the identical literals in order gets bit-identical
    doubles — and therefore identical sign bits."""
    acc = F.lit(0).cast("long")
    for b, w in enumerate(fam):
        wl = F.array(*[F.lit(x) for x in w])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), wl, lambda v, m: v * m),
            F.lit(0.0), lambda a, x: a + x)
        acc = acc.bitwiseOR(
            F.when(proj > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return acc


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn(
        "_norm", F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                                    lambda a, x: a + x * x)))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                broadcast_queries: bool = True) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cosine). Self-matches
    excluded. Ties broken by neighbor id for determinism.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"))
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (c.crossJoin(q)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


def _sketch(vec_col: str, planes: int, salt: int | None = None):
    """Sign sketch: bit b = sign(Σ_d v[d] · w(d, b)) with deterministic
    pseudo-random ±1 weights derived from xxhash64(d, b). ``salt``
    yields an independent hyperplane family per LSH table."""
    def weight(d, b: int):
        label = str(b) if salt is None else f"{salt}:{b}"
        return F.when(
            F.xxhash64(d.cast("string"), F.lit(label))
            .bitwiseAND(F.lit(1).cast("long")) == 1,
            F.lit(1.0)).otherwise(F.lit(-1.0))

    def proj_for(b: int):
        # closure (not default arg): Spark introspects lambda arity
        return F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.sequence(F.lit(0), F.size(vec_col) - 1),
                       lambda v, d: v * weight(d, b)),
            F.lit(0.0), lambda a, x: a + x)

    acc = F.lit(0).cast("long")
    for b in range(planes):
        acc = acc.bitwiseOR(
            F.when(proj_for(b) > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return acc


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             planes: int = 12, dim: int = 64,
             family: list[list[float]] | None = None,
             multiprobe: int = 0) -> DataFrame:
    """Approximate top-k: exact cosine restricted to same-LSH-bucket
    candidates. Recall < 1 by construction; compare with
    :func:`cosine_topk` to measure.

    ``family``: optional literal hyperplane matrix (from
    :func:`hyperplane_family`) replacing the in-plan xxhash64 weights —
    use when the sketch must be reproducible outside Spark.

    ``multiprobe``: also probe the buckets at Hamming distance 1 from
    the query's sketch in the first ``multiprobe`` planes (the
    multi-probe LSH idea, Lv et al. VLDB'07, with the probe sequence
    simplified to single-bit flips). A near neighbor that disagrees on
    exactly one plane — the dominant miss mode at high ``planes`` — is
    recovered without adding tables. Cost scales on the QUERY side
    only: ``1 + multiprobe`` probe rows per query feed the same
    equi-join; the corpus is still sketched and scanned once, and the
    probe values are distinct so no candidate pair duplicates."""
    sk = (_sketch_lit(vec_col, family) if family is not None
          else _sketch(vec_col, planes))
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        sk.alias("_bucket"))
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        sk.alias("_qbucket"))
    if multiprobe:
        flips = [F.col("_qbucket")] + [
            F.col("_qbucket").bitwiseXOR(F.lit(1 << b).cast("long"))
            for b in range(min(multiprobe, planes))]
        q = (q.withColumn("_probes", F.array(*flips))
             .withColumn("_qbucket", F.explode("_probes"))
             .drop("_probes"))
    scored = (c.join(q, F.col("_bucket") == F.col("_qbucket"))
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine",
                          _dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))


# IVF coarse-quantizer size guard: centroid vectors ship as plan
# literals (n_centroids × dim doubles) — the same plan-blowup guard
# rationale as the Bloom probe cap
_IVF_MAX_CENTROIDS = 256


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic IVF "training": the ``n_centroids`` corpus
    vectors with the smallest ``md5(id)`` — a uniform, engine-portable
    sample (no RNG, no k-means iterations). Quantizer quality affects
    recall, never correctness, and a deterministic sample keeps the
    whole index value-checkable in an external engine. Driver-capped
    like ``build_global_dict`` (a TakeOrdered of n_centroids rows)."""
    rows = (corpus
            .select(F.col(id_col).alias("_id"),
                    F.col(vec_col).alias("_v"))
            .orderBy(F.md5(F.col("_id").cast("string")), "_id")
            .limit(n_centroids).collect())
    return [[float(x) for x in r["_v"]] for r in rows]


def _centroid_sims(vec_col, centroids: list[list[float]]):
    """Array of cosine similarities against the literal centroid list,
    one left-fold dot per centroid divided by the driver-computed
    centroid norm — operand order identical to a DuckDB
    ``list_reduce`` fold, so the doubles (and every argmax/rank
    derived from them) reproduce bit-for-bit outside Spark."""
    import math

    sims = []
    for c in centroids:
        n = 0.0
        for x in c:
            n += x * x
        norm = math.sqrt(n) or 1.0
        cl = F.array(*[F.lit(x) for x in c])
        sims.append(_dot(F.col(vec_col), cl) / F.lit(norm))
    return F.array(*sims)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[list[float]] | None = None,
             n_centroids: int = 16, nprobe: int = 2) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the cell-probing scale
    path alongside :func:`lsh_topk`: assign every corpus vector to its
    nearest coarse centroid (ONE inline codegen projection, no row
    blowup), search each query only in its ``nprobe`` nearest cells.

    Scale shape (100 TB): the corpus is scanned once; cell assignment
    is an argmax fold over ``n_centroids`` literal vectors inside the
    scan projection; candidate generation is an EQUI-join on the cell
    id (probe side broadcast — nprobe rows per query), never a cross
    join; exact cosine runs only on the ~nprobe/n_centroids fraction
    of the corpus that shares probed cells. Recall < 1 by
    construction; measure against :func:`cosine_topk`.

    Every step is deterministic and fold-order-stable, so the whole
    index — centroid choice, cell assignment, probe set, final ranks —
    has an exact SQL oracle (unlike the xxhash64 LSH sketch, which
    needs its md5-literal twin for value checks).
    """
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    if len(centroids) > _IVF_MAX_CENTROIDS:
        raise ValueError(
            f"ivf_topk: {len(centroids)} centroids exceed the "
            f"plan-literal cap {_IVF_MAX_CENTROIDS}; shard the index "
            "or use lsh_topk for finer partitioning")
    sims = _centroid_sims(vec_col, centroids)
    # first-max index == ROW_NUMBER(sim DESC, idx ASC) == 1 in SQL
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"), F.col("_norm").alias("_cn"),
        cell.alias("_cell"))
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"), F.col("_norm").alias("_qn"),
        F.posexplode(sims).alias("_pcell", "_psim"))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_psim").desc(), F.col("_pcell").asc())
    probes = (q.withColumn("_prank", F.row_number().over(wp))
              .where(F.col("_prank") <= nprobe)
              .drop("_psim", "_prank"))

    scored = (c.join(F.broadcast(probes),
                     F.col("_cell") == F.col("_pcell"))
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", _dot("_qv", "_cv")
                          / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cosine"))
