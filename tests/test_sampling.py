"""Deterministic hash sampling: reproducibility, weight accuracy, stratum
independence."""

import hashlib

import pytest

from linkgraph.operators.sampling import BUCKETS, hash_split, stratified_sample


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % BUCKETS


def test_hash_split_matches_reference_and_weights(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    got = {
        r["id"]: r["split"]
        for r in hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    exp = {}
    for i in range(2000):
        b = _bucket(f"{i}#split")
        exp[i] = "train" if b < 8000 else ("val" if b < 9000 else "test")
    assert got == exp
    counts = {s: sum(1 for v in got.values() if v == s) for s in ("train", "val", "test")}
    assert abs(counts["train"] / 2000 - 0.8) < 0.03
    assert abs(counts["val"] / 2000 - 0.1) < 0.03

    # re-run identical (reproducibility is the whole point)
    again = {
        r["id"]: r["split"]
        for r in hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert again == got

    with pytest.raises(ValueError):
        hash_split(df, "id", {"a": 0.9, "b": 0.2})


def test_stratified_sample_per_stratum(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample(df, "s", 0.25, "id")
    got = {(r["id"], r["s"]) for r in out.collect()}
    exp = {
        (i, s) for i, s in rows if _bucket(f"{i}#strata#{s}") < 2500
    }
    assert got == exp
    # each stratum individually near 25%
    for s in ("a", "b"):
        n = sum(1 for _, t in got if t == s)
        assert abs(n / 2000 - 0.25) < 0.04

    with pytest.raises(ValueError):
        stratified_sample(df, "s", 0.0, "id")


def test_class_balance_exact_counts_and_determinism(spark):
    from linkgraph.operators.sampling import class_balance_sample

    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = class_balance_sample(df, "lang", "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts == {"big": 7, "small": 7}
    # retry-stable: the same 14 ids every run
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in class_balance_sample(df, "lang", "doc_id").collect())
    assert ids1 == ids2
    # the small class is kept in full
    assert set(range(100, 107)) <= set(ids1)


def test_l_diversity_flags_single_valued_class(spark):
    from linkgraph.textops.pii import l_diversity

    rows = [
        ("a", "d1", 1), ("a", "d1", 1), ("a", "d1", 1),   # 1 distinct user
        ("b", "d1", 1), ("b", "d1", 2), ("b", "d1", 3),   # 3 distinct users
    ]
    df = spark.createDataFrame(rows, "event_type string, day string, user_id long")
    got = {(r.event_type, r.day): r for r in
           l_diversity(df, ["event_type", "day"], "user_id", l=2).collect()}
    assert got[("a", "d1")].at_risk == 1 and got[("a", "d1")].n_sensitive == 1
    assert got[("b", "d1")].at_risk == 0 and got[("b", "d1")].n_sensitive == 3


def test_ipf_weights_rakes_to_uniform_marginals(spark):
    import pytest as _pt

    from linkgraph.operators.sampling import ipf_weights

    # skewed 2x2 table: (A,x)=30 (A,y)=10 (B,x)=10 (B,y)=10; uniform
    # targets are 30 per row and per column (N=60, 2 levels each)
    rows = (
        [("A", "x")] * 30 + [("A", "y")] * 10
        + [("B", "x")] * 10 + [("B", "y")] * 10
    )
    lab = spark.createDataFrame(rows, "i string, j string")
    got = {(r.i, r.j): r for r in ipf_weights(lab, rounds=8).collect()}
    assert got[("A", "x")].n == 30
    # fitted masses: row sums and column sums within 1e-3 of 30
    for lvl in ("A", "B"):
        s = sum(v.m_fit for k, v in got.items() if k[0] == lvl)
        assert s == _pt.approx(30.0, abs=1e-3)
    for lvl in ("x", "y"):
        s = sum(v.m_fit for k, v in got.items() if k[1] == lvl)
        assert s == _pt.approx(30.0, abs=1e-3)
    # total mass preserved; over-represented cell down-weighted
    assert sum(v.m_fit for v in got.values()) == _pt.approx(60.0, abs=1e-3)
    assert got[("A", "x")].w < 1.0 < got[("B", "y")].w
