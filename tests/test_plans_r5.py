"""Physical-plan guards for the round-5 session's operators: the perf
properties the docstrings promise must be visible in the plan."""

import pytest

from linkgraph.operators.recommend import item_item_cosine, recommend_topk


@pytest.fixture(scope="module")
def baskets(spark):
    rows = [(k, p) for k in range(30) for p in (k % 7, (k + 1) % 7, (k + 3) % 7)]
    return spark.createDataFrame(rows, "k long, p long")


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_recommend_topk_uses_window_group_limit(spark, baskets):
    sim = item_item_cosine(baskets)
    ub = baskets.select(baskets["k"].alias("u"), "p")
    plan = _plan(recommend_topk(ub, sim, k=3))
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the full sort


def test_heavy_hitter_verify_is_broadcast(spark):
    from pyspark.sql import functions as F

    from linkgraph.textops.sketches import token_heavy_hitters

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(token_heavy_hitters(docs, 5))
    assert "BroadcastHashJoin" in plan  # candidate set broadcast to the scan


def test_prefix_join_no_cartesian(spark):
    from linkgraph.textops.dedup import prefix_filter_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared common") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(prefix_filter_jaccard_pairs(docs, 7, 10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
