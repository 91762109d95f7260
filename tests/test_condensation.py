"""SCC condensation layering: quotient DAG depths (longest path, not
shortest), fixpoint == fixed-round at convergence, budget warning."""

import warnings

import pytest

from linkgraph.algos.scc import condensation_layers


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_condensation_layers_chain_of_sccs(spark):
    # A = {1,2,3} (3-cycle) -> B = {4} -> C = {5,6} (2-cycle)
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5)],
    )
    got = {r.comp: r.depth for r in condensation_layers(e, rounds=4).collect()}
    assert got == {1: 0, 4: 1, 5: 2}


def test_condensation_depth_is_longest_path(spark):
    # diamond with a long arm: 10->11->12 and 10->12: depth(12) must be 2
    e = _edges(spark, [(10, 11), (11, 12), (10, 12)])
    got = {r.comp: r.depth for r in condensation_layers(e, rounds=4).collect()}
    assert got == {10: 0, 11: 1, 12: 2}


def test_condensation_fixpoint_equals_fixed_rounds(spark):
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 5), (1, 5)],
    )
    fixed = {r.comp: r.depth for r in condensation_layers(e, rounds=8).collect()}
    fp = {r.comp: r.depth for r in condensation_layers(e, rounds=None).collect()}
    assert fixed == fp


def test_condensation_budget_warns(spark):
    # a 5-long chain cannot converge within max_rounds=2
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        condensation_layers(e, rounds=None, max_rounds=2).collect()
    assert any("max_rounds" in str(x.message) for x in w)
