"""Maximal matching vs an exact pure-python local-min oracle."""

import collections
import hashlib

import pytest

from linkgraph.algos.matching import maximal_matching
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

PAIRS = er_edges(140, 0.05, seed=3)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _canon(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


def _python_matching(pairs, rounds=64):
    alive = {(u, v): _h60(f"me:{u}:{v}") for u, v in _canon(pairs)}
    matched = {}
    for r in range(1, rounds + 1):
        if not alive:
            break
        mn = {}
        for (u, v), p in alive.items():
            k = (p, u, v)
            for x in (u, v):
                if x not in mn or k < mn[x]:
                    mn[x] = k
        won = [
            (u, v)
            for (u, v), p in alive.items()
            if mn[u] == (p, u, v) and mn[v] == (p, u, v)
        ]
        gone = set()
        for u, v in won:
            matched[(u, v)] = r
            gone.add(u)
            gone.add(v)
        alive = {
            e: p for e, p in alive.items() if e[0] not in gone and e[1] not in gone
        }
    return matched, alive


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=8)


def test_matching_matches_python_oracle(er):
    got = {
        (r["u"], r["v"]): r["matched_round"]
        for r in maximal_matching(er, rounds=4).collect()
    }
    want, _ = _python_matching(PAIRS, rounds=4)
    assert got == want


def test_matching_is_vertex_disjoint_and_maximal(er):
    rows = maximal_matching(er, rounds=None, max_rounds=64).collect()
    used = collections.Counter()
    for r in rows:
        used[r["u"]] += 1
        used[r["v"]] += 1
    assert used and max(used.values()) == 1  # a matching
    # maximal: no surviving edge has both endpoints unmatched
    for u, v in _canon(PAIRS):
        assert u in used or v in used


def test_matching_fixed_rounds_is_prefix(er):
    got2 = {
        (r["u"], r["v"]): r["matched_round"]
        for r in maximal_matching(er, rounds=2).collect()
    }
    full = {
        (r["u"], r["v"]): r["matched_round"]
        for r in maximal_matching(er, rounds=None, max_rounds=64).collect()
    }
    assert got2 == {e: rd for e, rd in full.items() if rd <= 2}


def test_matching_requires_symmetric(spark):
    df = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        maximal_matching(LinkGraph(df, symmetric=False))


# --- coarsening (algos/coarsen.py) ------------------------------------


def _python_coarsen(pairs, rounds=4):
    """Contract the python-oracle matching: sup(x) = min(u,v) for a
    matched pair, x otherwise; coarse edge weight = # fine directed
    edges between distinct supervertices."""
    matched, _ = _python_matching(pairs, rounds=rounds)
    sup = {}
    for u, v in matched:
        sup[u] = u
        sup[v] = u
    w = collections.Counter()
    for a, b in _canon(pairs):
        for s, d in ((a, b), (b, a)):
            ss, sd = sup.get(s, s), sup.get(d, d)
            if ss != sd:
                w[(ss, sd)] += 1
    return dict(w)


def test_coarsen_matches_python_oracle(er):
    from linkgraph.algos.coarsen import coarsen_graph

    se, mp = coarsen_graph(er, rounds=4)
    got = {(r["src"], r["dst"]): r["weight"] for r in se.collect()}
    assert got == _python_coarsen(PAIRS, rounds=4)
    # mapping covers every vertex exactly once and is idempotent
    rows = mp.collect()
    vids = [r["vid"] for r in rows]
    assert len(vids) == len(set(vids))
    sup = {r["vid"]: r["sup"] for r in rows}
    assert all(sup[s] == s for s in set(sup.values()))


def test_coarsen_shrinks_and_feeds_back(er):
    from linkgraph.algos.coarsen import coarsen_graph

    se, mp = coarsen_graph(er, rounds=None, max_rounds=64)
    n_fine = mp.count()
    n_coarse = mp.select("sup").distinct().count()
    assert n_coarse < n_fine  # a maximal matching on a connected-ish ER graph contracts
    # coarse graph is symmetric with equal weights both ways -> valid LinkGraph input
    g2 = LinkGraph(se.select("src", "dst"), symmetric=True)
    assert g2.edges.count() == se.count()
    fwd = {(r["src"], r["dst"]): r["weight"] for r in se.collect()}
    assert all(fwd[(d, s)] == w for (s, d), w in fwd.items())
