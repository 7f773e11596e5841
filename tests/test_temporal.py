"""asof_join / range_pair_join: brute-force value oracles (including
adversarial ties, boundary values, and null payloads) plus plan-shape
locks (single Exchange / no CartesianProduct)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from br_archive_spark.functions.temporal import asof_join, range_pair_join


def _brute_asof(lefts, rights, tol=None):
    """lefts: (key, t, lid); rights: (key, t, tb, val) -> lid -> match."""
    out = {}
    for k, t, lid in lefts:
        cand = [r for r in rights if r[0] == k and r[1] <= t]
        if tol is not None:
            cand = [r for r in cand if r[1] >= t - tol]
        if cand:
            best = max(cand, key=lambda r: (r[1], r[2]))
            out[lid] = (best[2], best[3])
        else:
            out[lid] = (None, None)
    return out


def test_asof_matches_bruteforce_with_ties_and_null_payload(spark):
    lefts = [(1, 10, "a"), (1, 5, "b"), (1, 4, "c"), (2, 7, "d"),
             (3, 1, "e"), (1, 6, "f"), (2, 100, "g")]
    # key 1 has two right rows at t=5 (tie -> greatest tiebreak wins)
    # and the winning row at t=6 carries a NULL payload VALUE, which
    # must be returned as the match, not skipped for an older row
    rights = [(1, 5, 100, 50.0), (1, 5, 200, 60.0), (1, 6, 300, None),
              (2, 7, 400, 70.0), (4, 1, 500, 80.0)]
    ldf = spark.createDataFrame(lefts, "k long, t long, lid string")
    rdf = spark.createDataFrame(rights, "k long, t long, rid long, v double")
    got = {r["lid"]: (r["rid"], r["v"])
           for r in asof_join(ldf, rdf, on=["k"], left_time="t",
                              right_time="t",
                              payload={"rid": "rid", "v": "v"},
                              tiebreak="rid").collect()}
    assert got == _brute_asof(lefts, rights)
    # t=5 tie resolved to rid=200; t>=6 rows see rid=300 with NULL v
    assert got["b"] == (200, 60.0)
    assert got["a"] == (300, None)


def test_asof_tolerance_nulls_stale_matches(spark):
    ldf = spark.createDataFrame([(1, 100, "x"), (1, 12, "y")],
                                "k long, t long, lid string")
    rdf = spark.createDataFrame([(1, 10, 1, 5.0)],
                                "k long, t long, rid long, v double")
    got = {r["lid"]: r["rid"]
           for r in asof_join(ldf, rdf, on=["k"], left_time="t",
                              right_time="t", payload={"rid": "rid"},
                              tiebreak="rid",
                              tolerance=F.lit(3)).collect()}
    assert got == {"x": None, "y": 1}


def test_asof_payload_collision_raises(spark):
    df = spark.createDataFrame([(1, 1)], "k long, t long")
    with pytest.raises(ValueError):
        asof_join(df, df, on=["k"], left_time="t", right_time="t",
                  payload={"t": "t"})


def test_asof_plan_single_exchange_no_join(spark):
    ldf = spark.createDataFrame([(1, 1, "a")], "k long, t long, lid string")
    rdf = spark.createDataFrame([(1, 1, 1, 1.0)],
                                "k long, t long, rid long, v double")
    plan = (asof_join(ldf, rdf, on=["k"], left_time="t", right_time="t",
                      payload={"rid": "rid"}, tiebreak="rid")
            ._jdf.queryExecution().executedPlan().toString())
    names = [ln.strip("+- *(0123456789) ").split()[0]
             for ln in plan.splitlines() if ln.strip()]
    assert names.count("Exchange") == 1, plan
    assert not any("Join" in n or "CartesianProduct" in n
                   for n in names), plan


def _brute_pairs(rows, eps):
    out = set()
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            if abs(va - vb) <= eps:
                a, b = sorted([(ia, va), (ib, vb)])
                out.add((a[0], b[0], a[1], b[1]))
    return out


def test_range_pairs_match_bruteforce_boundaries(spark):
    eps = 0.1
    # exact bucket boundaries, exact-eps gaps, negatives, a clump
    vals = [0.0, 0.1, 0.2, 0.3, -0.1, -0.05, 0.05, 1.0, 1.0999,
            0.3000000000000001, 2.5, 2.6, 2.70001]
    rows = list(enumerate(vals))
    df = spark.createDataFrame(rows, "id long, v double")
    got = {(r["id_a"], r["id_b"], r["value_a"], r["value_b"])
           for r in range_pair_join(df, "id", "v", eps).collect()}
    assert got == _brute_pairs(rows, eps)


def test_range_pairs_randomized_against_bruteforce(spark):
    import random
    rng = random.Random(42)
    rows = [(i, round(rng.uniform(0, 3), 3)) for i in range(120)]
    # salt in exact multiples of eps to stress the floor() edge
    rows += [(200 + i, i * 0.25) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {(r["id_a"], r["id_b"]) for r in
           range_pair_join(df, "id", "v", 0.25).collect()}
    want = {(a, b) for a, b, _, _ in _brute_pairs(rows, 0.25)}
    assert got == want


def test_range_pairs_no_cartesian(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    plan = (range_pair_join(df, "id", "v", 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_hypothesis_fuzz(spark):
    """Randomized model check: asof_join == per-row argmax brute force
    over adversarial small-domain keys/times (dense tie collisions)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    lefts_s = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 6)),
                       min_size=1, max_size=12)
    rights_s = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 6),
                                  st.floats(allow_nan=False,
                                            allow_infinity=False,
                                            width=32)),
                        min_size=0, max_size=12)

    @settings(max_examples=12, deadline=None)
    @given(lefts=lefts_s, rights=rights_s)
    def check(lefts, rights):
        lrows = [(k, t, i) for i, (k, t) in enumerate(lefts)]
        rrows = [(k, t, i, v) for i, (k, t, v) in enumerate(rights)]
        ldf = spark.createDataFrame(lrows, "k long, t long, lid long")
        rdf = spark.createDataFrame(
            rrows, "k long, t long, rid long, v double") if rrows \
            else spark.createDataFrame(
                [], "k long, t long, rid long, v double")
        got = {r["lid"]: (r["rid"], r["v"])
               for r in asof_join(ldf, rdf, on=["k"], left_time="t",
                                  right_time="t",
                                  payload={"rid": "rid", "v": "v"},
                                  tiebreak="rid").collect()}
        want = _brute_asof([(k, t, i) for k, t, i in lrows],
                           [(k, t, i, v) for k, t, i, v in rrows])
        assert got == want

    check()
