"""edge_percolation / embedding_top_pc vs hand oracles."""

import numpy as np
import pytest

from linkgraph.graph import LinkGraph


def _g(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return LinkGraph(spark.createDataFrame(sym, "src long, dst long"))


def test_edge_percolation_endpoints(spark):
    """p=1 reproduces the full component structure; p=0 keeps nothing."""
    from linkgraph.algos.components import edge_percolation

    g = _g(spark, [(1, 2), (2, 3), (10, 11)])  # two components, 3 edges
    rows = {r.p_keep: r for r in edge_percolation(g, [0.0, 1.0]).collect()}
    full = rows[1.0]
    assert (full.n_edges, full.n_components, full.giant_size) == (3, 2, 3)
    assert full.n_vertices == 5
    empty = rows[0.0]
    assert (empty.n_edges, empty.n_vertices, empty.n_components) == (0, 0, 0)
    g.unpersist()


def test_edge_percolation_monotone_and_deterministic(spark):
    """Surviving edge count is monotone in p and re-runs bit-identically
    (the md5 coin is a pure projection, no sampling state)."""
    from linkgraph.algos.components import edge_percolation

    pairs = [(i, i + 1) for i in range(40)] + [(i, i + 7) for i in range(30)]
    g = _g(spark, pairs)
    ps = [0.2, 0.5, 0.8]
    a = sorted(map(tuple, edge_percolation(g, ps).collect()))
    b = sorted(map(tuple, edge_percolation(g, ps).collect()))
    assert a == b
    counts = [r[1] for r in a]  # n_edges ordered by ascending p
    assert counts == sorted(counts)
    assert 0 < counts[0] <= counts[-1] < len(pairs)
    g.unpersist()


def test_edge_percolation_rejects_bad_p(spark):
    from linkgraph.algos.components import edge_percolation

    g = _g(spark, [(1, 2)])
    with pytest.raises(ValueError):
        edge_percolation(g, [1.5])
    g.unpersist()


def test_embedding_top_pc_recovers_planted_axis(spark):
    """Corpus with variance concentrated on one axis: the top PC aligns
    with that axis and evr matches numpy's exact eigendecomposition."""
    from linkgraph.textops.simsearch import embedding_top_pc

    rng = np.random.default_rng(7)
    d, n = 8, 300
    X = rng.normal(0.0, 0.05, size=(n, d))
    X[:, 3] += rng.normal(0.0, 2.0, size=n)  # dominant direction = e3
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    out = {r.dim_i: r for r in embedding_top_pc(df, iters=24).collect()}
    assert len(out) == d
    v = np.array([out[i].loading for i in range(d)])
    assert abs(abs(v[3]) - 1.0) < 0.01 and np.abs(np.delete(v, 3)).max() < 0.1
    C = np.cov(X.T, bias=True)
    w = np.linalg.eigvalsh(C)
    assert abs(out[0].evr - w[-1] / w.sum()) < 1e-3
    assert abs(float(np.sqrt(v @ v)) - 1.0) < 1e-4


def test_embedding_top_pc_empty_corpus(spark):
    from linkgraph.textops.simsearch import embedding_top_pc

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_top_pc(df).count() == 0
