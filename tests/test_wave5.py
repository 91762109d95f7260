"""edge_percolation / embedding_top_pc vs hand oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

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


DOCS5 = [
    (0, "alpha beta gamma delta", "en", "s0", 22),
    (1, "alpha beta gamma delta", "en", "s1", 22),  # dup of 0 (cross-parity)
    (2, "epsilon zeta", "en", "s0", 12),
    (3, "epsilon zeta eta theta", "en", "s1", 22),
    (4, "iota kappa lambda", "en", "s0", 17),
    (5, "iota kappa lambda", "en", "s1", 17),  # dup of 4 (cross-parity)
    (6, "unique six words here only once ok", "en", "s0", 34),
    (7, "totally fresh probe text", "en", "s1", 24),
]


@pytest.fixture(scope="module")
def docs5(spark):
    return spark.createDataFrame(
        DOCS5, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_countmin_never_underestimates(docs5):
    from linkgraph.textops.sketches import count_min_tokens

    rows = count_min_tokens(docs5, width=8, depth=2, k=50).collect()
    assert rows and all(r.cm_est >= r.exact_n for r in rows)


def test_countmin_exact_when_wide(docs5):
    """A sketch wider than the vocabulary with enough depth is exact on
    this fixture (min over rows kills residual collisions)."""
    from linkgraph.textops.sketches import count_min_tokens

    rows = count_min_tokens(docs5, width=4096, depth=4, k=50).collect()
    assert rows and all(r.cm_est == r.exact_n for r in rows)
    got = {r.token: r.exact_n for r in rows}
    assert got["alpha"] == 2 and got["epsilon"] == 2 and got["once"] == 1


def test_bloom_no_false_negatives(docs5):
    """Every true cross-parity duplicate is a Bloom hit, for any m/k."""
    from linkgraph.textops.sketches import bloom_dedup_audit

    for m in (16, 64, 4096):
        r = bloom_dedup_audit(docs5, m_bits=m, k_hashes=3).collect()[0]
        assert r.n_build == 4 and r.n_probe == 4
        assert r.true_dups == 2  # docs 1 and 5 duplicate build-side texts
        assert r.bloom_hits >= r.true_dups and r.false_pos >= 0
    # a huge filter has no false positives on 4 build docs
    r = bloom_dedup_audit(docs5, m_bits=2**16, k_hashes=3).collect()[0]
    assert (r.bloom_hits, r.false_pos, r.fp_rate) == (2, 0, 0.0)


def test_salsa_star_is_stationary(spark):
    """Directed star 0->{1,2,3,4}: hub mass stays on 0, authority mass
    splits equally — the SALSA walk is stationary from round 1."""
    from linkgraph.algos.salsa import salsa

    e = spark.createDataFrame([(0, i) for i in range(1, 5)], "src long, dst long")
    out = {r.vid: r for r in salsa(LinkGraph(e, materialize=False), rounds=3).collect()}
    assert out[0].hub == pytest.approx(1.0) and out[0].auth == 0.0
    for i in range(1, 5):
        assert out[i].auth == pytest.approx(0.25) and out[i].hub == 0.0


def test_salsa_conserves_mass_and_differs_from_hits(spark):
    """On a dense-vs-sparse hub graph, total hub/auth mass is exactly 1
    per side and the dense hub does NOT capture the score the way HITS
    lets it (degree normalization splits its mass)."""
    from linkgraph.algos.salsa import salsa

    # hub 0 points at 6 targets, hub 10 points at 1 of them
    pairs = [(0, i) for i in range(1, 7)] + [(10, 1)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    rows = salsa(LinkGraph(e, materialize=False), rounds=12, round_to=None).collect()
    hub_mass = sum(r.hub for r in rows)
    auth_mass = sum(r.auth for r in rows)
    assert hub_mass == pytest.approx(1.0, abs=1e-9)
    assert auth_mass == pytest.approx(1.0, abs=1e-9)
    by = {r.vid: r for r in rows}
    # vertex 1 has indegree 2, others 1: its stationary authority is 2/7
    # (the walk mixes geometrically; 12 rounds lands within 1e-3)
    assert by[1].auth == pytest.approx(2 / 7, abs=1e-3)
    assert by[1].auth == max(r.auth for r in rows)


def test_hll_distinct_small_range_and_bound(spark):
    """Tiny groups hit the linear-counting branch (near-exact); a
    1000-key group lands within the [FFGM07] error envelope for m=64."""
    from linkgraph.textops.sketches import hll_distinct

    rows = [("small", f"u{i}") for i in range(5)]
    rows += [("big", f"v{i}") for i in range(1000)]
    # duplicates must not move the estimate: registers are MAX-merged
    rows += [("big", "v0")] * 50
    df = spark.createDataFrame(rows, "grp string, k string")
    out = {r.grp: r for r in hll_distinct(df, "k", "grp").collect()}
    assert out["small"].exact_n == 5
    assert abs(out["small"].hll_est - 5) <= 1  # linear counting regime
    assert out["big"].exact_n == 1000
    # m=64 -> relative std error 1.04/8 = 13%; 3 sigma envelope
    assert abs(out["big"].hll_est - 1000) / 1000 < 0.4


def test_hll_distinct_deterministic(spark):
    from linkgraph.textops.sketches import hll_distinct

    df = spark.createDataFrame(
        [("g", f"u{i}") for i in range(137)], "grp string, k string"
    )
    a = hll_distinct(df, "k", "grp").collect()[0]
    b = hll_distinct(df, "k", "grp").collect()[0]
    assert a.hll_est == b.hll_est


def test_mutual_top1_planted_pair(spark):
    """Chain a->b, b->c, c->b inside one block: only (b, c) is mutual;
    a second block contributes its own obvious pair."""
    from linkgraph.textops.simsearch import mutual_top1

    rows = [
        (0, [1.0, 0.0, 0.0], 1),        # a: closest to b
        (1, [0.9, 0.4, 0.0], 1),        # b: closest to c
        (2, [0.88, 0.45, 0.0], 1),      # c: closest to b  -> mutual (1,2)
        (10, [0.0, 1.0, 0.0], 2),
        (11, [0.0, 0.99, 0.1], 2),      # mutual (10, 11) in block 2
        (12, [0.5, 0.5, 0.7], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {(r.id_a, r.id_b) for r in mutual_top1(df).collect()}
    assert (1, 2) in got and (0, 1) not in got
    assert (10, 11) in got and all(a < b for a, b in got)


def test_hitting_time_path_and_unreachable(spark):
    """Line 0-1-2 with seed 0: fixpoint is h(1)=3, h(2)=4; a component
    that cannot reach the seed saturates at exactly T."""
    from linkgraph.algos.hitting import hitting_time

    pairs = [(0, 1), (1, 2), (10, 11)]
    sym = pairs + [(b, a) for a, b in pairs]
    g = LinkGraph(spark.createDataFrame(sym, "src long, dst long"))
    T = 16
    out = {r.vid: r.hit for r in hitting_time(g, [0], rounds=T).collect()}
    assert out[0] == 0.0
    assert out[1] == pytest.approx(3.0, abs=0.05)
    assert out[2] == pytest.approx(4.0, abs=0.07)
    assert out[10] == float(T) and out[11] == float(T)
    g.unpersist()


def test_hitting_time_monotone_in_horizon(spark):
    """h_T is nondecreasing in T (truncation only ever cuts cost)."""
    from linkgraph.algos.hitting import hitting_time

    pairs = [(0, 1), (1, 2), (2, 3)]
    sym = pairs + [(b, a) for a, b in pairs]
    g = LinkGraph(spark.createDataFrame(sym, "src long, dst long"))
    h4 = {r.vid: r.hit for r in hitting_time(g, [0], rounds=4).collect()}
    h8 = {r.vid: r.hit for r in hitting_time(g, [0], rounds=8).collect()}
    assert all(h8[v] >= h4[v] for v in h4)
    g.unpersist()


def test_kmv_jaccard_identical_and_disjoint(spark):
    """Identical sets estimate J=1 exactly; disjoint sets estimate 0;
    a half-overlap lands near 0.5 once k covers the whole union."""
    from linkgraph.textops.sketches import kmv_jaccard_pairs

    rows = [("a", f"u{i}") for i in range(40)]
    rows += [("b", f"u{i}") for i in range(40)]          # b == a
    rows += [("c", f"w{i}") for i in range(40)]          # c disjoint
    rows += [("d", f"u{i}") for i in range(20)] + [
        ("d", f"x{i}") for i in range(20)
    ]  # |d ∩ a| = 20, |d ∪ a| = 60
    df = spark.createDataFrame(rows, "s string, k string")
    out = {(r.set_a, r.set_b): r for r in kmv_jaccard_pairs(df, "s", "k", k=64).collect()}
    assert out[("a", "b")].exact_j == 1.0 and out[("a", "b")].kmv_j == 1.0
    assert out[("a", "c")].exact_j == 0.0 and out[("a", "c")].kmv_j == 0.0
    # k=64 >= |union|=60: the sketch IS the set, estimate is exact
    assert out[("a", "d")].exact_j == pytest.approx(20 / 60, abs=1e-6)
    assert out[("a", "d")].kmv_j == pytest.approx(20 / 60, abs=1e-6)


def test_kmv_jaccard_sketched_regime(spark):
    """k much smaller than the sets: the estimate stays within a loose
    envelope of the true Jaccard (std err ~ 1/sqrt(k))."""
    from linkgraph.textops.sketches import kmv_jaccard_pairs

    rows = [("p", f"u{i}") for i in range(500)]
    rows += [("q", f"u{i}") for i in range(250, 750)]  # J = 250/750 = 1/3
    df = spark.createDataFrame(rows, "s string, k string")
    r = kmv_jaccard_pairs(df, "s", "k", k=64).collect()[0]
    assert r.exact_j == pytest.approx(1 / 3, abs=1e-6)
    assert abs(r.kmv_j - 1 / 3) < 0.2


def test_cm_join_size_overestimates_and_converges(spark):
    """CM inner product never underestimates the true join size, and a
    wide-enough sketch is exact (no bucket collisions)."""
    from linkgraph.textops.sketches import cm_join_size

    left = spark.createDataFrame(
        [(i % 7,) for i in range(100)], "k long"
    )
    right = spark.createDataFrame(
        [(i % 11,) for i in range(80)], "k long"
    )
    exact = (
        left.join(right.withColumnRenamed("k", "k2"), F.col("k") == F.col("k2"))
        .count()
    )
    narrow = cm_join_size(left, right, "k", "k", width=4, depth=2).collect()[0]
    assert narrow.exact_n == exact and narrow.cm_est >= exact
    wide = cm_join_size(left, right, "k", "k", width=1 << 14, depth=4).collect()[0]
    assert wide.cm_est == exact and wide.rel_err == 0.0
