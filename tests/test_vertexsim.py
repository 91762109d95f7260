"""vertex_similarity vs an exact pure-Python oracle (round-5 widening)."""

import collections
import math

import pytest

from linkgraph.algos.linkpred import vertex_similarity
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

PAIRS = er_edges(120, 0.05, seed=7)


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


def test_vertex_similarity_vs_bruteforce(er):
    adj = _adj()
    deg = {v: len(ns) for v, ns in adj.items()}
    cap = max(deg.values())  # uncapped: cn is the true intersection size
    want = {}
    vs = sorted(adj)
    for i, u in enumerate(vs):
        for v in vs[i + 1 :]:
            cn = len(adj[u] & adj[v])
            if cn >= 2:
                want[(u, v)] = (
                    cn,
                    round(cn / math.sqrt(deg[u] * deg[v]), 6),
                    round(cn / (deg[u] + deg[v] - cn), 6),
                )
    got = {
        (r.u, r.v): (r.cn, r.cosine, r.jaccard)
        for r in vertex_similarity(er, hub_cap=cap).collect()
    }
    assert got == want


def test_vertex_similarity_hub_cap_shrinks_cn(er):
    adj = _adj()
    deg = {v: len(ns) for v, ns in adj.items()}
    small_cap = sorted(deg.values())[len(deg) // 2]  # median degree
    want = {}
    vs = sorted(adj)
    for i, u in enumerate(vs):
        for v in vs[i + 1 :]:
            cn = sum(1 for z in adj[u] & adj[v] if 2 <= deg[z] <= small_cap)
            if cn >= 2:
                want[(u, v)] = cn
    got = {
        (r.u, r.v): r.cn
        for r in vertex_similarity(er, hub_cap=small_cap).collect()
    }
    assert got == want


def test_vertex_similarity_topk_order(er):
    rows = vertex_similarity(er, hub_cap=200, topk=15).collect()
    assert len(rows) == 15
    keys = [(-r.cosine, -r.cn, r.u, r.v) for r in rows]
    assert keys == sorted(keys)
