"""1-WL refinement: exact python-oracle equality, plus the structural
guarantees WL is FOR (regular graphs stay monochrome; distinguishable
neighborhoods split; isomorphic graphs get identical color histograms)."""

import collections
import hashlib

import pytest

from linkgraph.algos.wl import wl_class_sizes, wl_refine
from linkgraph.fixtures import edges_df, er_edges, grid_edges, two_cliques_edges
from linkgraph.graph import LinkGraph


P = (1 << 61) - 1


def _h(color):
    return int(hashlib.md5(color.encode()).hexdigest()[:15], 16)


def _py_wl(pairs, rounds):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color = {v: str(len(ns)) for v, ns in adj.items()}
    for _ in range(rounds):
        color = {
            v: hashlib.md5(
                (
                    color[v]
                    + "|"
                    + str(sum(_h(color[u]) for u in adj[v]) % P)
                ).encode()
            ).hexdigest()
            for v in adj
        }
    return color


PAIRS = er_edges(100, 0.05, seed=9)


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=4)


def test_wl_vs_python_oracle(er):
    got = {r.vid: r.color for r in wl_refine(er, rounds=3).collect()}
    assert got == _py_wl(PAIRS, 3)


def test_wl_regular_graph_monochrome(spark):
    # a cycle is 2-regular: every round keeps all vertices one color
    n = 12
    cyc = [(i, (i + 1) % n) for i in range(n)]
    g = LinkGraph.from_undirected(edges_df(spark, cyc), num_partitions=2)
    sizes = wl_class_sizes(g, rounds=3).collect()
    assert len(sizes) == 1 and sizes[0].n_vertices == n


def test_wl_isomorphic_copies_same_histogram(spark):
    # two disjoint isomorphic cliques-with-bridge halves: histogram even
    pairs = two_cliques_edges(6)
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=2)
    hist = {r.color: r.n_vertices for r in wl_class_sizes(g, rounds=3).collect()}
    assert all(n % 2 == 0 for n in hist.values())  # mirror symmetry
    # grid corners/edges/interior separate by round 2
    gg = LinkGraph.from_undirected(edges_df(spark, grid_edges(4, 4)), num_partitions=2)
    h2 = {r.color: r.n_vertices for r in wl_class_sizes(gg, rounds=2).collect()}
    assert len(h2) >= 3


def test_diameter_double_sweep_path_graph(spark):
    from linkgraph.algos.anf import diameter_double_sweep
    from linkgraph.fixtures import edges_df
    from linkgraph.graph import LinkGraph

    # path 0-1-...-9: true diameter 9; double sweep from ANY start finds it
    path = [(i, i + 1) for i in range(9)]
    g = LinkGraph.from_undirected(edges_df(spark, path), num_partitions=2)
    row = diameter_double_sweep(g, max_levels=16).collect()[0]
    assert row.start_vid == 0
    assert row.diameter_lb == 9 and row.far_vid == 9

    # star: diameter 2, double sweep certifies it from the hub start
    star = [(0, i) for i in range(1, 8)]
    gs = LinkGraph.from_undirected(edges_df(spark, star), num_partitions=2)
    row = diameter_double_sweep(gs, max_levels=8).collect()[0]
    assert row.diameter_lb == 2
