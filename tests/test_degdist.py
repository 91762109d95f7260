"""degree_histogram / powerlaw_alpha vs exact pure-Python oracles,
including power-of-two bucket knife edges."""

import collections
import math

import pytest

from linkgraph.algos.gstats import degree_histogram, powerlaw_alpha
from linkgraph.fixtures import edges_df
from linkgraph.graph import LinkGraph


def _star_forest():
    """Disjoint stars with hub degrees 1..9, 16, 32, 64 (exact power-of-2
    degrees sit ON the log2 bucket boundary)."""
    pairs, nxt = [], 10_000
    for hub, d in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 16, 32, 64]):
        for _ in range(d):
            pairs.append((hub, nxt))
            nxt += 1
    return pairs


PAIRS = _star_forest()


@pytest.fixture(scope="module")
def stars(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=4)


def _degrees():
    deg = collections.Counter()
    for a, b in PAIRS:
        deg[a] += 1
        deg[b] += 1
    return deg


def test_degree_histogram_exact(stars):
    deg = _degrees()
    want = {}
    for d in deg.values():
        b = int(math.floor(math.log2(d)))
        lo, hi, n = want.get(b, (d, d, 0))
        want[b] = (min(lo, d), max(hi, d), n + 1)
    got = {
        r.bucket: (r.min_deg, r.max_deg, r.n_vertices)
        for r in degree_histogram(stars).collect()
    }
    assert got == want
    assert 6 in got and got[6] == (64, 64, 1)  # 64 lands in bucket 6, not 5


def test_powerlaw_alpha_exact(stars):
    deg = _degrees()
    dmin = 4
    tail = [d for d in deg.values() if d >= dmin]
    alpha = 1.0 + len(tail) / sum(math.log(d / (dmin - 0.5)) for d in tail)
    row = powerlaw_alpha(stars, dmin=dmin).collect()[0]
    assert row.dmin == dmin and row.n_tail == len(tail)
    assert abs(row.alpha - round(alpha, 6)) <= 1e-6


def test_reciprocity_exact(spark):
    from linkgraph.algos.gstats import reciprocity

    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (5, 5), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = reciprocity(df).collect()[0]
    # distinct non-loop edges: (1,2),(2,1),(2,3),(3,4),(4,3) -> 5
    # reciprocal: (1,2),(2,1),(3,4),(4,3) -> 4
    assert (row.n_edges, row.n_reciprocal, row.r) == (5, 4, 0.8)


def test_rich_club_exact(spark):
    import collections

    from linkgraph.algos.gstats import rich_club
    from linkgraph.fixtures import edges_df, er_edges
    from linkgraph.graph import LinkGraph

    pairs = er_edges(60, 0.08, seed=17)
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=4)
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    ks = [0, 2, 4, 6, 100]
    got = {
        r.k: (r.n_nodes, r.n_edges, r.phi)
        for r in rich_club(g, ks=ks).collect()
    }
    for k in ks:
        nodes = [v for v in deg if deg[v] > k]
        ne = sum(1 for v in nodes for u in adj[v] if deg[u] > k)
        if len(nodes) >= 2:
            phi = round(ne / (len(nodes) * (len(nodes) - 1)), 6)
        else:
            phi = None
        assert got[k] == (len(nodes), ne, phi), k
    assert got[0][2] is not None and got[100] == (0, 0, None)


def test_graph_diff_exact(spark):
    from linkgraph.algos.gstats import graph_diff

    old = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "src long, dst long"
    )
    new = spark.createDataFrame(
        [(1, 2), (1, 9), (2, 3), (6, 7), (6, 8)], "src long, dst long"
    )
    got = {
        r.vid: (r.n_added, r.n_removed, r.net)
        for r in graph_diff(old, new).collect()
    }
    # vid 1: +{(1,9)} -{(1,3)}; vid 4: -{(4,5)}; vid 6: +2; vid 2 unchanged
    assert got == {1: (1, 1, 0), 4: (0, 1, -1), 6: (2, 0, 2)}
    top = graph_diff(old, new, topk=1).collect()
    assert [(r.vid, r.n_added + r.n_removed) for r in top] in ([(1, 2)], [(6, 2)])
    # deterministic tie-break: churn 2 ties between vid 1 and 6 -> vid 1
    assert top[0].vid == 1


def test_knn_curve_exact(spark):
    import collections

    from linkgraph.algos.gstats import knn_curve
    from linkgraph.fixtures import edges_df
    from linkgraph.graph import LinkGraph

    # star: hub deg 6 with mean_nn 1; leaves deg 1 with mean_nn 6
    star = [(0, i) for i in range(1, 7)]
    g = LinkGraph.from_undirected(edges_df(spark, star), num_partitions=2)
    got = {
        r.deg: (r.n_vertices, r.mean_nn_deg) for r in knn_curve(g).collect()
    }
    assert got == {6: (1, 1.0), 1: (6, 6.0)}


def test_edge_audit_exact(spark):
    from linkgraph.algos.gstats import edge_audit

    rows = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5), (6, 7), (7, 6)]
    df = spark.createDataFrame(rows, "src long, dst long")
    r = edge_audit(df).collect()[0]
    # 7 rows, 6 distinct (dup (1,2)), 1 self-loop, asym: (4,5) only
    assert (r.n_rows, r.n_distinct, r.n_dup_rows, r.n_self_loops, r.n_asym) == (
        7, 6, 1, 1, 1,
    )


def test_degree_gini_exact(spark):
    from linkgraph.algos.gstats import degree_gini
    from linkgraph.fixtures import edges_df
    from linkgraph.graph import LinkGraph

    # regular graph (cycle): gini == 0 exactly
    n = 10
    cyc = [(i, (i + 1) % n) for i in range(n)]
    g = LinkGraph.from_undirected(edges_df(spark, cyc), num_partitions=2)
    row = degree_gini(g).collect()[0]
    assert (row.n_vertices, row.total_deg, row.gini) == (n, 2 * n, 0.0)

    # star: python oracle via the textbook sorted-rank formula
    star = [(0, i) for i in range(1, 9)]
    gs = LinkGraph.from_undirected(edges_df(spark, star), num_partitions=2)
    degs = sorted([1] * 8 + [8])
    nn, sx = len(degs), sum(degs)
    six = sum((i + 1) * x for i, x in enumerate(degs))
    want = round((2 * six - (nn + 1) * sx) / (nn * sx), 6)
    row = degree_gini(gs).collect()[0]
    assert row.gini == want and row.gini > 0.3


def test_correlation_matrix_exact(spark):
    import numpy as np

    from linkgraph.algos.gstats import correlation_matrix

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, 200)
    y = 2 * x + rng.normal(0, 0.1, 200)   # strongly correlated
    z = rng.normal(0, 1, 200)             # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    for (a, b), v in got.items():
        arr = {"x": x, "y": y, "z": z}
        want = float(np.corrcoef(arr[a], arr[b])[0, 1])
        assert abs(v - round(want, 6)) <= 2e-6, (a, b)
    assert got[("x", "y")] > 0.99 and abs(got[("x", "z")]) < 0.2


def test_dup_cluster_histogram_exact(spark):
    from linkgraph.textops.dedup import dup_cluster_histogram

    texts = ["a"] * 3 + ["b"] * 2 + ["c", "d"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.cluster_size: r.n_clusters
        for r in dup_cluster_histogram(docs).collect()
    }
    assert got == {3: 1, 2: 1, 1: 2}
