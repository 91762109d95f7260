"""Louvain local moves vs an exact pure-Python oracle (same integer gain,
same md5-parity schedule), planted-community recovery, multilevel
coarsening, determinism."""

import collections
import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from linkgraph.algos.gstats import community_modularity
from linkgraph.algos.louvain import louvain_local_move, multilevel_louvain
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

PAIRS = er_edges(150, 0.04, seed=11)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _adj(pairs):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _python_louvain(pairs, rounds):
    """Exact replica of louvain_local_move's semantics: integer gain
    score(b) - base, argmax tie -> smallest community, md5-parity moves."""
    adj = _adj(pairs)
    deg = {v: len(adj[v]) for v in adj}
    M = sum(deg.values())
    label = {v: v for v in adj}
    for r in range(1, rounds + 1):
        kv = {
            v: collections.Counter(label[u] for u in adj[v]) for v in adj
        }
        dc = collections.Counter()
        for v in adj:
            dc[label[v]] += deg[v]
        new = {}
        for v in adj:
            a = label[v]
            base = M * kv[v].get(a, 0) - deg[v] * (dc[a] - deg[v])
            best = None
            for c, k in kv[v].items():
                if c == a:
                    continue
                key = (-(M * k - deg[v] * dc[c]), c)
                if best is None or key < best:
                    best = key
            move = (
                best is not None
                and -best[0] > base
                and _h60(f"mv{r}:{v}") % 2 == 0
            )
            new[v] = best[1] if move else a
        label = new
    return label


def _python_modularity(pairs, label):
    adj = _adj(pairs)
    deg = {v: len(adj[v]) for v in adj}
    M = sum(deg.values())
    internal = collections.Counter()
    dc = collections.Counter()
    for v in adj:
        dc[label[v]] += deg[v]
        for u in adj[v]:
            if label[u] == label[v]:
                internal[label[v]] += 1  # directed count
    return sum(
        internal[c] / M - (dc[c] / M) ** 2 for c in dc
    )


def _clique_ring_pairs(n_cliques=4, size=8):
    pairs = []
    for c in range(n_cliques):
        mem = range(c * size, c * size + size)
        pairs += list(itertools.combinations(mem, 2))
        pairs.append((c * size, ((c + 1) % n_cliques) * size + 1))
    return pairs


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=8)


def test_louvain_matches_python_oracle(er):
    got = {r["vid"]: r["label"] for r in louvain_local_move(er, rounds=4).collect()}
    want = _python_louvain(PAIRS, rounds=4)
    assert got == want


def test_louvain_recovers_planted_cliques(spark):
    pairs = _clique_ring_pairs()
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=4)
    lab = louvain_local_move(g, rounds=8)
    comm = collections.defaultdict(set)
    for r in lab.collect():
        comm[r["label"]].add(r["vid"])
    assert sorted(len(m) for m in comm.values()) == [8, 8, 8, 8]
    # every community is exactly one clique
    for members in comm.values():
        assert len({v // 8 for v in members}) == 1
    q = (
        community_modularity(g, lab).agg(F.sum("q_contrib")).first()[0]
    )
    # q_contrib is rounded to 6 decimals per community (oracle stability),
    # so the 4-community sum can deviate up to ~2e-6 from the exact value.
    assert q == pytest.approx(
        _python_modularity(pairs, _python_louvain(pairs, 8)), abs=1e-5
    )
    assert q > 0.6


def test_louvain_deterministic(er):
    a = sorted(map(tuple, louvain_local_move(er, rounds=3).collect()))
    b = sorted(map(tuple, louvain_local_move(er, rounds=3).collect()))
    assert a == b


def test_louvain_fixpoint_modularity_not_below_fixed_budget(spark):
    pairs = _clique_ring_pairs()
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=4)
    lab_fp = louvain_local_move(g, rounds=None, max_rounds=32)
    q_fp = community_modularity(g, lab_fp).agg(F.sum("q_contrib")).first()[0]
    lab_2 = louvain_local_move(g, rounds=2)
    q_2 = community_modularity(g, lab_2).agg(F.sum("q_contrib")).first()[0]
    assert q_fp >= q_2 - 1e-9


def test_multilevel_louvain_improves_or_matches_level_one(er):
    lab1 = louvain_local_move(er, rounds=None, max_rounds=32)
    q1 = community_modularity(er, lab1).agg(F.sum("q_contrib")).first()[0]
    labm = multilevel_louvain(er, levels=3)
    qm = community_modularity(er, labm).agg(F.sum("q_contrib")).first()[0]
    # coarsened moves only apply when they raise Q — never a regression
    assert qm >= q1 - 1e-9
    # mapping still covers the original vertex set exactly
    n = er.num_vertices()
    assert labm.count() == n
    assert labm.select("vid").distinct().count() == n


def test_louvain_requires_symmetric(spark):
    df = edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        louvain_local_move(LinkGraph(df, symmetric=False))
