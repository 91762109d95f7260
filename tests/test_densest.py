"""Densest-subgraph peel curve vs an exact pure-python oracle."""

import collections

import pytest

from linkgraph.algos.densest import densest_subgraph_curve
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

PAIRS = er_edges(130, 0.05, seed=9)


def _python_curve(pairs, max_rounds=64):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    curve = []
    for r in range(1, max_rounds + 1):
        n = len(adj)
        if n == 0:
            break
        e_dir = sum(len(v) for v in adj.values())
        keep = {v for v, ns in adj.items() if 2 * len(ns) * n > 3 * e_dir}
        nxt = collections.defaultdict(set)
        for v in keep:
            ns = adj[v] & keep
            if ns:
                nxt[v] = ns
        curve.append((r, n, e_dir, e_dir / (2.0 * n), n - len(nxt)))
        adj = nxt
        if not nxt:
            break
    return curve


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=8)


def test_curve_matches_python_oracle(er):
    got = sorted(
        (r["round"], r["n_vertices"], r["e_directed"], r["density"], r["peeled"])
        for r in densest_subgraph_curve(er, rounds=None, max_rounds=64).collect()
    )
    assert got == _python_curve(PAIRS)


def test_planted_clique_is_densest_round(spark):
    # sparse ring + a 12-clique: the peel must strip the ring first, so
    # some round's density approaches the clique's (12-1)/2 = 5.5
    pairs = [(i, (i + 1) % 60) for i in range(60)]
    pairs += [(100 + a, 100 + b) for a in range(12) for b in range(a + 1, 12)]
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=4)
    curve = densest_subgraph_curve(g, rounds=None, max_rounds=64).collect()
    best = max(r["density"] for r in curve)
    assert best >= 0.5 * 5.5  # 2(1+eps)-approximation bound with eps=1/2
    # the densest round's subgraph must be exactly the clique
    dense_rounds = [r for r in curve if r["density"] == best]
    assert dense_rounds[0]["n_vertices"] == 12
    assert dense_rounds[0]["e_directed"] == 12 * 11


def test_fixed_rounds_is_curve_prefix(er):
    full = sorted(
        map(tuple, densest_subgraph_curve(er, rounds=None, max_rounds=64).collect())
    )
    pre = sorted(map(tuple, densest_subgraph_curve(er, rounds=2).collect()))
    assert pre == [row for row in full if row[0] <= 2]


def test_requires_symmetric(spark):
    df = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        densest_subgraph_curve(LinkGraph(df, symmetric=False))
