"""partition_conductance vs an exact pure-Python oracle: two cliques
joined by one bridge — the clique-respecting partition has tiny cut, the
hash partition a large one."""

import collections

import pytest
from pyspark.sql import functions as F

from linkgraph.algos.gstats import partition_conductance
from linkgraph.fixtures import edges_df, two_cliques_edges
from linkgraph.graph import LinkGraph

PAIRS = two_cliques_edges(8)  # cliques {0..7} and {8..15} + bridge (0,8)


@pytest.fixture(scope="module")
def g(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=4)


def _oracle(label_of):
    adj = collections.defaultdict(set)
    for a, b in PAIRS:
        adj[a].add(b)
        adj[b].add(a)
    m2 = sum(len(v) for v in adj.values())
    out = {}
    for c in set(label_of.values()):
        members = [v for v in adj if label_of[v] == c]
        vol = sum(len(adj[v]) for v in members)
        cut = sum(1 for v in members for w in adj[v] if label_of[w] != c)
        den = min(vol, m2 - vol)
        phi = round(cut / den, 6) if den > 0 else None
        out[c] = (len(members), vol, cut, phi)
    return out


def _got(g, labels_df):
    return {
        r.label: (r.n_vertices, r.vol, r.cut, r.conductance)
        for r in partition_conductance(g, labels_df).collect()
    }


def test_conductance_clique_partition(g, spark):
    # label = clique membership: cut is only the bridge edge
    label_of = {v: (0 if v < 8 else 1) for p in PAIRS for v in p}
    labels = spark.createDataFrame(
        sorted(label_of.items()), "vid long, label long"
    )
    got = _got(g, labels)
    assert got == _oracle(label_of)
    assert got[0][2] == 1 and got[1][2] == 1  # one directed cross edge each


def test_conductance_hash_partition_worse(g, spark):
    label_of = {v: v % 2 for p in PAIRS for v in p}
    labels = spark.createDataFrame(
        sorted(label_of.items()), "vid long, label long"
    )
    got = _got(g, labels)
    assert got == _oracle(label_of)
    clique_phi = 1 / min(
        _oracle({v: (0 if v < 8 else 1) for p in PAIRS for v in p})[0][1], 1 << 60
    )
    assert min(p for *_, p in got.values()) > clique_phi


def test_conductance_degenerate_single_class(g, spark):
    label_of = {v: 0 for p in PAIRS for v in p}
    labels = spark.createDataFrame(
        sorted(label_of.items()), "vid long, label long"
    )
    got = _got(g, labels)
    assert got[0][3] is None  # whole-graph class: no defined score


def test_label_assortativity_exact(g, spark):
    import collections

    from linkgraph.algos.gstats import label_assortativity

    # clique-respecting labels: near-perfect assortativity
    label_of = {v: (0 if v < 8 else 1) for p in PAIRS for v in p}
    labels = spark.createDataFrame(
        sorted(label_of.items()), "vid long, label long"
    )
    adj = collections.defaultdict(set)
    for a, b in PAIRS:
        adj[a].add(b)
        adj[b].add(a)
    mix = collections.Counter()
    for v, ns in adj.items():
        for u in ns:
            mix[(label_of[v], label_of[u])] += 1
    m = sum(mix.values())
    same = sum(c for (i, j), c in mix.items() if i == j)
    rsum = collections.Counter()
    csum = collections.Counter()
    for (i, j), c in mix.items():
        rsum[i] += c
        csum[j] += c
    rs = sum(rsum[i] * csum[i] for i in rsum)
    want_r = round((m * same - rs) / (m * m - rs), 6)
    row = label_assortativity(g, labels).collect()[0]
    assert (row.n_edges, row.n_same, row.r) == (m, same, want_r)
    assert row.r > 0.9  # two cliques + one bridge: strongly assortative

    # random-ish hash labels: near zero
    labels2 = spark.createDataFrame(
        sorted((v, v % 2) for v in label_of), "vid long, label long"
    )
    r2 = label_assortativity(g, labels2).collect()[0].r
    assert abs(r2) < 0.3


def test_community_conductance_composition(spark):
    """Louvain labels on two cliques: each community's cut is exactly the
    single bridge edge and conductance is tiny."""
    from linkgraph.algos.gstats import partition_conductance
    from linkgraph.algos.louvain import louvain_local_move
    from linkgraph.fixtures import edges_df, two_cliques_edges
    from linkgraph.graph import LinkGraph

    g = LinkGraph.from_undirected(
        edges_df(spark, two_cliques_edges(8)), num_partitions=4
    )
    labels = louvain_local_move(g, rounds=8)
    out = {
        r.label: (r.n_vertices, r.cut, r.conductance)
        for r in partition_conductance(g, labels).collect()
    }
    # louvain recovers the two cliques (possibly exactly 2 communities)
    assert len(out) == 2
    for n_vertices, cut, phi in out.values():
        assert n_vertices == 8 and cut == 1
        assert phi is not None and phi < 0.02
