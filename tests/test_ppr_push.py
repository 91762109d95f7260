"""Forward-push PPR invariants: mass conservation, eps-fixpoint residual
bound, agreement with power-iteration PPR within the ACL error bound."""

import warnings

import pytest

from linkgraph.algos.pagerank import pagerank, ppr_forward_push
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

ALPHA = 0.15


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(
        edges_df(spark, er_edges(120, 0.05)), num_partitions=8
    )


def test_push_conserves_mass(er):
    st = ppr_forward_push(er, [0, 1], alpha=ALPHA, eps=1e-3, rounds=5).collect()
    total = sum(r["p"] + r["r"] for r in st)
    assert abs(total - 1.0) < 1e-9


def test_push_fixpoint_residuals_below_threshold(er):
    eps = 1e-3
    deg = {r["vid"]: r["deg"] for r in er.degrees().collect()}
    st = ppr_forward_push(er, [0], alpha=ALPHA, eps=eps, rounds=None).collect()
    assert all(r["r"] <= eps * deg[r["vid"]] + 1e-15 for r in st)


def test_push_matches_power_iteration_within_bound(er):
    eps = 1e-5
    deg = {r["vid"]: r["deg"] for r in er.degrees().collect()}
    push = {
        r["vid"]: r["p"]
        for r in ppr_forward_push(
            er, [0], alpha=ALPHA, eps=eps, rounds=None, max_rounds=200
        ).collect()
    }
    # power iteration with matching damping: pagerank damping = 1-alpha
    exact = {
        r["vid"]: r["pr"]
        for r in pagerank(
            er, damping=1.0 - ALPHA, tol=1e-12, max_iter=300, sources=[0]
        ).collect()
    }
    for v, p in push.items():
        assert abs(exact[v] - p) <= eps * deg[v] + 1e-9, (v, p, exact[v])


def test_push_budget_warns_and_empty_seeds_raise(er):
    with pytest.raises(ValueError):
        ppr_forward_push(er, [])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ppr_forward_push(er, [0], eps=1e-9, rounds=None, max_rounds=1).collect()
    assert any("max_rounds" in str(x.message) for x in w)
