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
