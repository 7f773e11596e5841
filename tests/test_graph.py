"""connected_components: union-find brute-force model checks
(chains, stars, cycles, randomized graphs) and the O(1)-lineage /
no-edge-collect design invariants."""

import random


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    from br_archive_spark.functions.graph import connected_components
    df = spark.createDataFrame(edges, "a long, b long")
    out = connected_components(df, "a", "b")
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_chain_star_cycle_and_dups(spark):
    edges = (
        [(i, i + 1) for i in range(10, 20)]       # chain (diameter 10)
        + [(100, x) for x in (101, 102, 103)]     # star
        + [(200, 201), (201, 202), (202, 200)]    # cycle
        + [(300, 301), (301, 300), (300, 300)]    # dup + self-loop
        + [(400, 401)]                            # pair
    )
    got = _run(spark, edges)
    want = _uf_components([(a, b) for a, b in edges if a != b])
    assert got == want
    assert got[19] == 10 and got[103] == 100 and got[202] == 200


def test_cc_randomized_against_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    assert got == _uf_components(edges)


def test_cc_every_node_labeled_once(spark):
    edges = [(1, 2), (2, 3), (7, 8)]
    from br_archive_spark.functions.graph import connected_components
    df = spark.createDataFrame(edges, "a long, b long")
    out = connected_components(df, "a", "b").collect()
    assert len(out) == len({r["node"] for r in out}) == 5


def test_cc_digest_convergence_check(spark):
    """The r5 convergence check: an order-independent set digest
    (count + bit_xor(xxhash64)) — NOT a per-round double exceptAll.
    The digest must be row-order invariant, partitioning invariant,
    and discriminate differing sets; the whole check is one aggregate
    job (≤2 with AQE shuffle materialization), where each old
    exceptAll anti-join cost a full shuffle of the edge set."""
    from br_archive_spark.functions.graph import _edge_digest

    a = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 9)], "u long, v long")
    b = spark.createDataFrame(                 # same set, other order
        [(5, 9), (1, 2), (2, 3)], "u long, v long").repartition(7)
    c = spark.createDataFrame(                 # differs in one edge
        [(1, 2), (2, 3), (5, 8)], "u long, v long")
    da, db, dc = _edge_digest(a), _edge_digest(b), _edge_digest(c)
    assert da == db
    assert da != dc
    assert da[0] == 3
    # empty set digests cleanly (count 0) and differs from non-empty
    empty = _edge_digest(a.where("u > 100"))
    assert empty[0] == 0 and empty != da

    sc = spark.sparkContext
    sc.setJobGroup("cc-digest", "one aggregate per check")
    _edge_digest(a)
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("cc-digest")
    assert 1 <= len(jobs) <= 2, jobs
