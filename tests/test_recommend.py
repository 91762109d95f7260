"""Item-item CF: hand-checked cosine scores, owned-item exclusion,
basket-cap pruning."""

import math

import pytest

from linkgraph.operators.recommend import item_item_cosine, recommend_topk


@pytest.fixture(scope="module")
def baskets(spark):
    # baskets: {1,2}, {1,2}, {1,3}, {2,3}
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (13, 2), (13, 3)]
    return spark.createDataFrame(rows, "k long, p long")


def test_cosine_hand_checked(baskets):
    got = {(r["i"], r["j"]): r["sim"] for r in item_item_cosine(baskets).collect()}
    # n1=3, n2=3, n3=2; n12=2, n13=1, n23=1
    assert math.isclose(got[(1, 2)], 2 / math.sqrt(9))
    assert math.isclose(got[(1, 3)], 1 / math.sqrt(6))
    assert got[(1, 2)] == got[(2, 1)]  # symmetric emit


def test_recommend_excludes_owned_and_ranks(spark, baskets):
    sim = item_item_cosine(baskets)
    ub = spark.createDataFrame([(7, 1)], "u long, p long")  # user owns item 1
    recs = recommend_topk(ub, sim, k=5).collect()
    assert all(r["rec"] != 1 for r in recs)
    by_rank = sorted(recs, key=lambda r: r["rk"])
    # score(2) = sim(1,2) > score(3) = sim(1,3)
    assert [r["rec"] for r in by_rank] == [2, 3]


def test_basket_cap_prunes_pairs(spark):
    rows = [(1, i) for i in range(10)] + [(2, 100), (2, 101)]
    b = spark.createDataFrame(rows, "k long, p long")
    sims = item_item_cosine(b, basket_cap=5).collect()
    # the 10-item basket is dropped from pair generation entirely
    assert {(r["i"], r["j"]) for r in sims} == {(100, 101), (101, 100)}
