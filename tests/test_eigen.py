"""eigenvector_centrality vs a numpy power-iteration oracle, plus
structural sanity on a star (hub dominates)."""

import numpy as np
import pytest

from linkgraph.algos.eigen import eigenvector_centrality
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph

PAIRS = er_edges(80, 0.06, seed=3)


@pytest.fixture(scope="module")
def er(spark):
    return LinkGraph.from_undirected(edges_df(spark, PAIRS), num_partitions=4)


def test_eigenvector_vs_numpy(er):
    vs = sorted({v for p in PAIRS for v in p if p[0] != p[1]})
    idx = {v: i for i, v in enumerate(vs)}
    A = np.zeros((len(vs), len(vs)))
    for a, b in PAIRS:
        if a != b:
            A[idx[a], idx[b]] = 1.0
            A[idx[b], idx[a]] = 1.0
    x = np.ones(len(vs))
    for _ in range(8):
        x = A @ x
    x = x / x.max()
    got = {r.vid: r.ec for r in eigenvector_centrality(er, rounds=8).collect()}
    assert set(got) == set(vs)
    for v in vs:
        assert abs(got[v] - round(float(x[idx[v]]), 6)) <= 2e-6, v


def test_eigenvector_star_hub_dominates(spark):
    pairs = [(0, i) for i in range(1, 21)]
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=2)
    # ODD rounds: a star is bipartite, so even-round iterates equalize
    # hub and leaves (mass oscillates); odd rounds leave it on the hub
    got = {r.vid: r.ec for r in eigenvector_centrality(g, rounds=5).collect()}
    assert got[0] == 1.0
    assert all(got[i] < 1.0 for i in range(1, 21))
    leaf_vals = {got[i] for i in range(1, 21)}
    assert len(leaf_vals) == 1  # symmetry: all leaves equal


def test_embedding_label_stats_exact(spark):
    import numpy as np

    from linkgraph.textops.simsearch import embedding_label_stats

    rng = np.random.default_rng(7)
    rows, want = [], {}
    vecs_by_label = {}
    vid = 0
    for label, center in [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]:
        vs = []
        for _ in range(5):
            v = np.array(center) + rng.normal(0, 0.05, 3)
            rows.append((vid, [float(x) for x in v], label))
            vs.append(v)
            vid += 1
        vecs_by_label[label] = np.array(vs)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.label: (r.n_vecs, r.centroid_norm, r.mean_cos)
        for r in embedding_label_stats(df).collect()
    }
    for label, vs in vecs_by_label.items():
        # float32 storage: recompute the oracle from the float32 values
        vs32 = vs.astype(np.float32).astype(np.float64)
        c = vs32.mean(axis=0)
        cn = float(np.linalg.norm(c))
        cos = [
            float(v @ c / (np.linalg.norm(v) * cn)) for v in vs32
        ]
        assert got[label][0] == 5
        assert abs(got[label][1] - round(cn, 6)) <= 2e-6
        assert abs(got[label][2] - round(sum(cos) / 5, 6)) <= 2e-6
    # tight clusters around orthogonal centers: high cohesion
    assert got[0][2] > 0.99 and got[1][2] > 0.99


def test_centroid_distances_exact(spark):
    import numpy as np

    from linkgraph.textops.simsearch import centroid_distances

    rng = np.random.default_rng(11)
    rows = []
    centers = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.7, 0.7, 0.0]}
    vecs = {}
    vid = 0
    for lab, c in centers.items():
        vs = []
        for _ in range(4):
            v = np.array(c) + rng.normal(0, 0.02, 3)
            rows.append((vid, [float(x) for x in v], lab))
            vs.append(v)
            vid += 1
        vecs[lab] = np.array(vs).astype(np.float32).astype(np.float64)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        (r.label_a, r.label_b): r.cos for r in centroid_distances(df).collect()
    }
    cents = {l: v.mean(axis=0) for l, v in vecs.items()}
    for (a, b), cos in got.items():
        ca, cb = cents[a], cents[b]
        want = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        assert abs(cos - round(want, 6)) <= 2e-6
    # label 2 (diagonal direction) is closer to both 0 and 1 than 0 is to 1
    assert got[(0, 2)] > got[(0, 1)] and got[(1, 2)] > got[(0, 1)]
