"""Boruvka MSF vs an exact pure-Python Kruskal oracle: with the strict
(w, u, v) edge order all pseudo-weights are distinct, so the forest is
unique and ANY correct MST algorithm must return the same edge set."""

import random

import pytest
from pyspark.sql import functions as F

from linkgraph.algos.mst import minimum_spanning_forest
from linkgraph.fixtures import er_edges


def _weighted(pairs, seed=13):
    rnd = random.Random(seed)
    return {(min(a, b), max(a, b)): rnd.randint(1, 9) for a, b in pairs if a != b}


def _kruskal(wedges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (u, v), w in sorted(wedges.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v, w))
    return forest


def _df(spark, wedges):
    rows = []
    for (u, v), w in wedges.items():
        rows.append((u, v, w))
        rows.append((v, u, w))
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_mst_equals_kruskal_er(spark):
    wedges = _weighted(er_edges(150, 0.04, seed=5))
    got = {
        (r.u, r.v, r.w)
        for r in minimum_spanning_forest(_df(spark, wedges)).collect()
    }
    assert got == _kruskal(wedges)


def test_mst_forest_property_disconnected(spark):
    # two islands + an isolated pair: |forest| = |V| - #components
    pairs = er_edges(60, 0.08, seed=11) + [
        (a + 1000, b + 1000) for a, b in er_edges(40, 0.1, seed=12)
    ] + [(5000, 5001)]
    wedges = _weighted(pairs)
    want = _kruskal(wedges)
    got = {
        (r.u, r.v, r.w)
        for r in minimum_spanning_forest(_df(spark, wedges)).collect()
    }
    assert got == want


def test_mst_fixed_rounds_prefix(spark):
    # rounds=1: every component proposes its min edge; the round-1 forest
    # is exactly the set of per-vertex min edges (deduped)
    wedges = _weighted(er_edges(80, 0.06, seed=21))
    adj = {}
    for (u, v), w in wedges.items():
        adj.setdefault(u, []).append((w, u, v))
        adj.setdefault(v, []).append((w, u, v))
    want = {min(cands) for cands in adj.values()}
    got = {
        (r.w, r.u, r.v)
        for r in minimum_spanning_forest(_df(spark, wedges), rounds=1).collect()
    }
    assert got == want


def test_sparsify_preserves_connectivity(spark):
    import collections

    from linkgraph.algos.mst import sparsify

    wedges = _weighted(er_edges(120, 0.05, seed=31))
    kept = [
        (r.u, r.v)
        for r in sparsify(_df(spark, wedges), keep_pct=5).collect()
    ]

    def comps(pairs, verts):
        adj = collections.defaultdict(set)
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        seen, n = set(), 0
        for v in verts:
            if v not in seen:
                n += 1
                stack = [v]
                while stack:
                    x = stack.pop()
                    if x in seen:
                        continue
                    seen.add(x)
                    stack.extend(adj[x])
        return n

    verts = {v for p in wedges for v in p}
    n_full = comps(list(wedges), verts)
    n_kept = comps(kept, verts)
    assert n_kept == n_full  # every component survives
    assert len(kept) < len(wedges)  # and the graph actually thinned
    # forest edges are a subset of kept
    forest = {
        (r.u, r.v)
        for r in __import__("linkgraph.algos.mst", fromlist=["m"]).minimum_spanning_forest(
            _df(spark, wedges)
        ).collect()
    }
    assert forest <= set(kept)
