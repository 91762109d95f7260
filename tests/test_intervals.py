"""Bucketized interval join vs a quadratic python reference."""

import random

from pyspark.sql import functions as F

from linkgraph.operators.intervals import interval_join


def _ref(L, R):
    out = {}
    for k, ls, le, lid in L:
        for k2, rs, re, rid in R:
            if k == k2 and ls <= re and rs <= le:
                out[(lid, rid)] = min(le, re) - max(ls, rs)
    return out


def _dfs(spark, L, R):
    l = spark.createDataFrame(L, "k long, s0 long, s1 long, lid long")
    r = spark.createDataFrame(R, "k long, e0 long, e1 long, rid long")
    return l, r


def _run(spark, L, R, bucket_s):
    l, r = _dfs(spark, L, R)
    rows = interval_join(
        l, r, on=["k"], lstart="s0", lend="s1", rstart="e0", rend="e1",
        bucket_s=bucket_s,
    ).collect()
    got = {}
    for row in rows:
        key = (row["lid"], row["rid"])
        assert key not in got, f"pair {key} emitted twice"
        got[key] = row["overlap_s"]
    return got


def test_interval_join_matches_quadratic_reference(spark):
    rng = random.Random(7)
    L, R = [], []
    for i in range(300):
        k = rng.randrange(5)
        s = rng.randrange(0, 100_000)
        L.append((k, s, s + rng.randrange(0, 20_000), i))
    for j in range(300):
        k = rng.randrange(5)
        s = rng.randrange(0, 100_000)
        R.append((k, s, s + rng.randrange(0, 5_000), j))
    for bucket_s in (1_000, 7_777, 50_000):
        assert _run(spark, L, R, bucket_s) == _ref(L, R)


def test_interval_join_edge_cases(spark):
    # touching (overlap 0) included; disjoint excluded; long interval
    # spanning many buckets still emitted exactly once; key mismatch excluded
    L = [(1, 100, 200, 0), (1, 0, 1_000_000, 1), (2, 100, 200, 2)]
    R = [(1, 200, 300, 10), (1, 201, 300, 11), (1, 500_000, 500_001, 12)]
    got = _run(spark, L, R, bucket_s=100)
    assert got == {(0, 10): 0, (1, 10): 100, (1, 11): 99, (1, 12): 1}


def test_interval_join_no_nested_loop_in_plan(spark):
    L = [(1, 0, 10, 0)]
    R = [(1, 5, 15, 1)]
    l, r = _dfs(spark, L, R)
    plan = interval_join(
        l, r, on=["k"], lstart="s0", lend="s1", rstart="e0", rend="e1",
        bucket_s=10,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
