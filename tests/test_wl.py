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


def test_wl_anonymity_path_graph_curve(spark):
    import pytest as _pt

    from linkgraph.algos.wl import wl_anonymity
    from linkgraph.graph import LinkGraph

    # path 1-2-3-4-5: degree partition {ends}{middle} at round 0; WL
    # separates by distance-to-end until the center is unique
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    g = LinkGraph.from_undirected(
        spark.createDataFrame(pairs, "src long, dst long"), num_partitions=2
    )
    got = {r.round: r for r in wl_anonymity(g, rounds=2).collect()}
    # round 0: colors by degree -> classes {1,5}, {2,3,4}
    assert got[0].n_classes == 2 and got[0].n_unique == 0
    assert got[0].max_class == 3
    # round 1: {1,5} (deg1 next to deg2), {2,4} (deg2 seeing deg1+deg2),
    # {3} (deg2 seeing two deg2) -> one unique vertex
    assert got[1].n_classes == 3 and got[1].n_unique == 1
    assert got[1].frac_unique == _pt.approx(0.2, abs=1e-6)
    # round 2 refines no further on this graph (stable partition)
    assert got[2].n_classes == 3 and got[2].n_unique == 1
