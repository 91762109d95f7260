"""Katz centrality vs an exact numpy power iteration."""

import collections

import numpy as np
import pytest

from linkgraph.algos.katz import katz
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

PAIRS = er_edges(120, 0.04, seed=7)


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=8)


def _adj():
    adj = collections.defaultdict(set)
    for a, b in PAIRS:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _numpy_katz(alpha=None, beta=1.0, iters=500, tol=1e-13):
    adj = _adj()
    vids = sorted(adj)
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for v, ns in adj.items():
        for u in ns:
            A[idx[v], idx[u]] = 1.0  # row v receives from u (symmetric anyway)
    if alpha is None:
        alpha = 1.0 / (max(len(ns) for ns in adj.values()) + 1)
    x = np.full(n, beta)
    for _ in range(iters):
        x2 = beta + alpha * (A @ x)
        if np.abs(x2 - x).max() < tol:
            break
        x = x2
    return vids, x2


def test_katz_vs_numpy_converged(er):
    vids, want = _numpy_katz()
    got = {r["vid"]: r["katz"] for r in katz(er, tol=1e-10, max_iter=400).collect()}
    arr = np.array([got[v] for v in vids])
    assert np.allclose(arr, want, atol=1e-7)


def test_katz_fixed_budget_matches_unrolled(er):
    # tol=0 runs exactly max_iter rounds — the oracle-contract mode
    vids, _ = _numpy_katz()
    adj = _adj()
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for v, ns in adj.items():
        for u in ns:
            A[idx[v], idx[u]] = 1.0
    alpha = 1.0 / (max(len(ns) for ns in adj.values()) + 1)
    x = np.full(n, 1.0)
    for _ in range(8):
        x = 1.0 + alpha * (A @ x)
    got = {r["vid"]: r["katz"] for r in katz(er, tol=0, max_iter=8).collect()}
    arr = np.array([got[v] for v in vids])
    assert np.allclose(arr, x, atol=1e-9)


def test_katz_monotone_in_degree_for_star(spark):
    # hub of a star must out-rank every leaf
    g = LinkGraph.from_undirected(
        edges_df(spark, [(0, i) for i in range(1, 9)]), num_partitions=2
    )
    got = {r["vid"]: r["katz"] for r in katz(g, tol=1e-12, max_iter=200).collect()}
    assert got[0] > max(got[i] for i in range(1, 9))
