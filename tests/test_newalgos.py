"""Link prediction / graph stats / HITS / weighted SSSP / random walks
vs exact pure-Python oracles (round-4 analytics widening)."""

import collections
import heapq
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.algos.gstats import graph_stats
from linkgraph.algos.hits import hits
from linkgraph.algos.linkpred import link_prediction
from linkgraph.algos.sssp import sssp
from linkgraph.fixtures import edges_df, er_edges
from linkgraph.graph import LinkGraph
from linkgraph.operators.walks import random_walks

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


def test_link_prediction_vs_bruteforce(er):
    adj = _adj()
    deg = {v: len(ns) for v, ns in adj.items()}
    cap = max(deg.values())  # uncapped reference
    exp = {}
    for z, ns in adj.items():
        if not (2 <= deg[z] <= cap):
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                if v in adj[u]:
                    continue
                cn, aa = exp.get((u, v), (0, 0.0))
                exp[(u, v)] = (cn + 1, aa + 1.0 / math.log(deg[z]))
    got = {
        (r["u"], r["v"]): (r["cn"], r["aa"])
        for r in link_prediction(er, hub_cap=cap).collect()
    }
    assert set(got) == set(exp)
    for k, (cn, aa) in exp.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - round(aa, 6)) < 1e-9

    # hub cap actually restricts the wedge centers
    small_cap = sorted(deg.values())[len(deg) // 2]
    capped = {
        (r["u"], r["v"]): r["cn"]
        for r in link_prediction(er, hub_cap=small_cap).collect()
    }
    exp_capped = collections.Counter()
    for z, ns in adj.items():
        if not (2 <= deg[z] <= small_cap):
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1 :]:
                if v not in adj[u]:
                    exp_capped[(u, v)] += 1
    assert capped == dict(exp_capped)
    assert len(capped) < len(got)


def test_link_prediction_topk_order(er):
    adj = _adj()
    cap = max(len(ns) for ns in adj.values())
    rows = link_prediction(er, hub_cap=cap, topk=15).collect()
    assert len(rows) == 15
    keys = [(-r["aa"], -r["cn"], r["u"], r["v"]) for r in rows]
    assert keys == sorted(keys)


def test_graph_stats_vs_numpy(er):
    adj = _adj()
    deg = {v: len(ns) for v, ns in adj.items()}
    dx, dy = [], []
    for v, ns in adj.items():
        for u in ns:
            dx.append(deg[v])
            dy.append(deg[u])
    r = np.corrcoef(np.array(dx, dtype=float), np.array(dy, dtype=float))[0, 1]
    row = graph_stats(er).collect()[0]
    assert row["n_vertices"] == len(adj)
    assert row["n_edges"] == len(dx)
    assert abs(row["avg_deg"] - round(len(dx) / len(adj), 6)) < 1e-9
    assert row["max_deg"] == max(deg.values())
    assert abs(row["assortativity"] - r) < 1e-5


def test_hits_vs_numpy(spark):
    # oriented (src < dst) directed graph from the ER pair set
    # (edges_df symmetrizes, so build the directed frame directly)
    pairs = sorted({(min(a, b), max(a, b)) for a, b in PAIRS if a != b})
    g = LinkGraph(
        spark.createDataFrame(pairs, "src long, dst long"), num_partitions=8
    )
    vids = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1.0
    h = np.full(n, 1.0 / math.sqrt(n))
    for _ in range(8):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in hits(g, rounds=8, round_to=None).collect()}
    gh = np.array([got[v][0] for v in vids])
    ga = np.array([got[v][1] for v in vids])
    assert np.allclose(gh, h, atol=1e-9)
    assert np.allclose(ga, a, atol=1e-9)
    g.unpersist()


def _weighted_pairs():
    # deterministic symmetric integer weights on the ER pair set
    return {
        (min(a, b), max(a, b)): 1 + (min(a, b) * 7 + max(a, b) * 13) % 9
        for a, b in PAIRS
        if a != b
    }


@pytest.fixture(scope="module")
def erw(spark):
    wp = _weighted_pairs()
    rows = [(a, b, w) for (a, b), w in wp.items()] + [
        (b, a, w) for (a, b), w in wp.items()
    ]
    df = spark.createDataFrame(rows, "src long, dst long, w long")
    return LinkGraph(df, num_partitions=8, symmetric=True)


def test_sssp_vs_dijkstra(erw):
    wp = _weighted_pairs()
    adj = collections.defaultdict(list)
    for (a, b), w in wp.items():
        adj[a].append((b, w))
        adj[b].append((a, w))
    sources = sorted(adj)[:3]
    dist = {s: 0 for s in sources}
    pq = [(0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, 1 << 60):
            continue
        for u, w in adj[v]:
            nd = d + w
            if nd < dist.get(u, 1 << 60):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    got = {r["vid"]: r["dist"] for r in sssp(erw, sources).collect()}
    assert got == dist


def test_sssp_fixed_rounds_identity_after_convergence(erw):
    sources = sorted({v for p in _weighted_pairs() for v in p})[:3]
    fix = sssp(erw, sources)
    fr = sssp(erw, sources, rounds=40)  # well past convergence
    assert fix.subtract(fr).count() == 0 and fr.subtract(fix).count() == 0


def test_sssp_validations(erw, er):
    with pytest.raises(ValueError):
        sssp(erw, [])
    with pytest.raises(ValueError):
        sssp(er, [1])  # no weight column


def test_random_walks_deterministic_and_edge_valid(er):
    seeds = sorted(_adj())[:4]
    out = random_walks(er, seeds, walk_len=5, walks_per_seed=2, seed=3)
    rows = out.collect()
    # symmetric graph: no sinks, every walk runs the full length
    assert len(rows) == len(seeds) * 2 * 6
    adj = _adj()
    pos = {(r["seed"], r["walk"], r["step"]): r["vid"] for r in rows}
    for (s, w, t), v in pos.items():
        if t == 0:
            assert v == s
        else:
            assert v in adj[pos[(s, w, t - 1)]]
    # pure function of inputs: a second run is identical
    again = {
        (r["seed"], r["walk"], r["step"]): r["vid"]
        for r in random_walks(er, seeds, walk_len=5, walks_per_seed=2, seed=3).collect()
    }
    assert again == pos
    # different seed changes at least one step
    other = {
        (r["seed"], r["walk"], r["step"]): r["vid"]
        for r in random_walks(er, seeds, walk_len=5, walks_per_seed=2, seed=4).collect()
    }
    assert other != pos


def test_clustering_coefficients_vs_bruteforce(er):
    from linkgraph.algos.triangles import clustering_coefficients, transitivity

    adj = _adj()
    tri = collections.Counter()
    n_tri = 0
    for v, ns in adj.items():
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for w in ns_sorted[i + 1 :]:
                if w in adj[u]:
                    tri[v] += 1
                    n_tri += 1  # counts each triangle once per corner
    got = {r["vid"]: r for r in clustering_coefficients(er).collect()}
    assert set(got) == set(adj)
    for v, ns in adj.items():
        d = len(ns)
        assert got[v]["deg"] == d
        assert got[v]["tri"] == tri[v]
        exp_lcc = 2.0 * tri[v] / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(got[v]["lcc"] - exp_lcc) < 1e-12
    wedges = sum(len(ns) * (len(ns) - 1) / 2 for ns in adj.values())
    assert abs(transitivity(er) - n_tri / wedges) < 1e-12


def test_pagerank_weighted_vs_numpy(erw):
    from linkgraph.algos.pagerank import pagerank

    wp = _weighted_pairs()
    vids = sorted({v for p in wp for v in p})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    W = np.zeros((n, n))
    for (a, b), w in wp.items():
        W[idx[a], idx[b]] = w
        W[idx[b], idx[a]] = w
    P = W / W.sum(axis=1, keepdims=True)  # row-stochastic: w/strength
    pr = np.full(n, 1.0 / n)
    for _ in range(10):
        pr = (1 - 0.85) / n + 0.85 * (P.T @ pr)
    got = {
        r["vid"]: r["pr"]
        for r in pagerank(erw, tol=0, max_iter=10, weight_col="w").collect()
    }
    assert np.allclose(np.array([got[v] for v in vids]), pr, atol=1e-12)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_k_truss_vs_bruteforce(er):
    from linkgraph.algos.ktruss import k_truss

    edges = {(min(a, b), max(a, b)) for a, b in PAIRS if a != b}

    def peel(k):
        es = set(edges)
        while True:
            adj = collections.defaultdict(set)
            for a, b in es:
                adj[a].add(b)
                adj[b].add(a)
            sup = {(a, b): len(adj[a] & adj[b]) for a, b in es}
            nxt = {e for e in es if sup[e] >= k - 2}
            if nxt == es:
                return {e: sup[e] for e in es}
            es = nxt

    for k in (3, 4):
        exp = peel(k)
        got = {
            (r["src"], r["dst"]): r["support"] for r in k_truss(er, k).collect()
        }
        assert got == exp, f"k={k}"

    # fixed-round mode: past convergence, identical to fixpoint
    fix = {(r["src"], r["dst"]): r["support"] for r in k_truss(er, 3).collect()}
    fr = {
        (r["src"], r["dst"]): r["support"]
        for r in k_truss(er, 3, rounds=30).collect()
    }
    assert fix == fr

    with pytest.raises(ValueError):
        k_truss(er, 1)


def test_tfidf_topk_vs_bruteforce(spark):
    import re

    from linkgraph.textops.textstats import tfidf_topk

    docs = [
        (1, "the cat sat on the mat the cat"),
        (2, "dogs and cats and dogs"),
        (3, "a mat for the dog"),
        (4, "cat cat cat dog dog mat"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = len(docs)
    tf = collections.Counter()
    dfreq = collections.Counter()
    for did, text in docs:
        toks = re.findall("[a-z0-9]+", text.lower())
        for t in set(toks):
            dfreq[t] += 1
        for t in toks:
            tf[(did, t)] += 1
    scored = collections.defaultdict(list)
    for (did, t), c in tf.items():
        scored[did].append((round(c * math.log(n / dfreq[t]), 6), t, c))
    exp = set()
    for did, rows in scored.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        for s, t, c in rows[:3]:
            exp.add((did, t, c, s))
    got = {
        (r["doc_id"], r["term"], r["tf"], r["score"])
        for r in tfidf_topk(df, k=3).collect()
    }
    assert got == exp


def test_random_walks_stop_at_sink(spark):
    # directed path 1 -> 2 -> 3: walks of length 5 stop at the sink
    g = LinkGraph(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long"),
        num_partitions=2,
    )
    rows = random_walks(g, [1], walk_len=5).collect()
    got = sorted((r["step"], r["vid"]) for r in rows)
    assert got == [(0, 1), (1, 2), (2, 3)]
    g.unpersist()


def _kosaraju(n, e):
    fwd, bwd = collections.defaultdict(list), collections.defaultdict(list)
    for a, b in e:
        fwd[a].append(b)
        bwd[b].append(a)
    seen, order = set(), []
    for s in range(n):
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            adv = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    adv = True
                    break
            if not adv:
                order.append(v)
                stack.pop()
    comp = {}
    for s in reversed(order):
        if s in comp:
            continue
        members, stack = [], [s]
        comp[s] = s
        while stack:
            v = stack.pop()
            members.append(v)
            for w in bwd[v]:
                if w not in comp:
                    comp[w] = s
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return comp


def test_scc_vs_kosaraju(spark):
    import numpy as np

    from linkgraph.algos.scc import strongly_connected_components

    rng = np.random.default_rng(11)
    n = 80
    edges = set()
    for _ in range(260):
        a, b = int(rng.integers(n)), int(rng.integers(n))
        if a != b:
            edges.add((a, b))
    # planted structures: a decreasing chain (the 1-round coloring case)
    # and two explicit cycles
    edges |= {(79, 78), (78, 77), (77, 76)}
    edges |= {(70, 71), (71, 72), (72, 70), (5, 6), (6, 5)}
    e = sorted(edges)

    exp = _kosaraju(n, e)
    df = spark.createDataFrame(e, "src long, dst long")
    got = {
        r["vid"]: r["comp"]
        for r in strongly_connected_components(df).collect()
    }
    # SCC operates on vertices that appear in edges only
    verts = {a for a, _ in e} | {b for _, b in e}
    assert got == {v: exp[v] for v in verts}


# ----------------------------------------------------------- full-graph ANF
def _fm_sketches_oracle(adj, k, max_h):
    """Pure-python all-pairs ball-sketch oracle: md5 lane hashes, FM limbs
    OR'd over the exact BFS ball — independent of the engine's per-level
    propagation, so it checks the init/propagation/estimator pipeline at
    the BIT level, not just the curve shape."""
    import hashlib

    def limb(v, j):
        h = int(hashlib.md5(f"{v}#anf#{j}".encode()).hexdigest()[:15], 16)
        if h == 0:
            return 1 << 59
        return 1 << ((h & -h).bit_length() - 1)

    balls = {}
    for s in adj:
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_h:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        balls[s] = dist

    curve = []
    for h in range(max_h + 1):
        hist = collections.Counter()
        for s, dist in balls.items():
            S = 0
            for j in range(k):
                m = 0
                for v, d in dist.items():
                    if d <= h:
                        m |= limb(v, j)
                # lowest zero bit position
                r = 0
                while (m >> r) & 1:
                    r += 1
                S += r
            hist[S] += 1
        tot = sum(c * math.pow(2.0, s / k) for s, c in sorted(hist.items()))
        curve.append((h, round(tot / 0.77351, 3)))
    return curve


def test_anf_full_bit_exact_vs_ball_oracle(er):
    from linkgraph.algos.anf import anf_full

    got = sorted((r["h"], r["nf"]) for r in anf_full(er, k=8, max_h=6).collect())
    exp = _fm_sketches_oracle(_adj(), k=8, max_h=6)
    assert got == exp


def test_anf_full_error_bound_and_flat_tail(er):
    """k=64 lanes: the estimate tracks the exact neighborhood function
    within the FM error band (~0.78/sqrt(64) ≈ 10%; allow 3 sigma), and
    the curve is emitted flat to max_h after convergence."""
    from linkgraph.algos.anf import anf_full, effective_diameter_from_curve

    adj = _adj()
    exact = []
    for h in range(11):
        cnt = 0
        for s in adj:
            dist = {s: 0}
            q = collections.deque([s])
            while q:
                v = q.popleft()
                if dist[v] >= h:
                    continue
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        q.append(w)
            cnt += len(dist)
        exact.append(cnt)
    got = {r["h"]: r["nf"] for r in anf_full(er, k=64, max_h=10).collect()}
    assert sorted(got) == list(range(11))
    for h in range(1, 11):
        rel = abs(got[h] - exact[h]) / exact[h]
        assert rel < 0.30, f"h={h} est={got[h]} exact={exact[h]} rel={rel:.3f}"
    # convergence: exact curve is flat well before h=10 on this fixture,
    # and the emitted tail must be flat too
    assert exact[9] == exact[10]
    assert got[9] == got[10]
    ed = effective_diameter_from_curve(sorted(got.items()))
    assert 1.0 <= ed <= 6.0


def test_hyperball_harmonic_bit_exact_vs_ball_oracle(er):
    """Per-vertex HyperBall hc vs an exact BFS-ball sketch oracle: the
    sketches come from exact balls (independent of the engine's per-level
    propagation) and the float projection is recomputed in Python with the
    SAME exact shift-decomposition — so this checks init, propagation,
    per-vertex S accounting, and the cross-engine float path at the bit
    level."""
    import hashlib

    from linkgraph.algos.anf import hyperball_harmonic

    k, max_h = 8, 6
    adj = _adj()

    def limb(v, j):
        h = int(hashlib.md5(f"{v}#anf#{j}".encode()).hexdigest()[:15], 16)
        if h == 0:
            return 1 << 59
        return 1 << ((h & -h).bit_length() - 1)

    consts = [2.0 ** (i / k) for i in range(k)]

    def pow2(s):
        return consts[s % k] * float(1 << (s // k))

    exp = {}
    for src in adj:
        dist = {src: 0}
        q = collections.deque([src])
        while q:
            v = q.popleft()
            if dist[v] >= max_h:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        ss = []
        for h in range(max_h + 1):
            S = 0
            for j in range(k):
                m = 0
                for v, d in dist.items():
                    if d <= h:
                        m |= limb(v, j)
                r = 0
                while (m >> r) & 1:
                    r += 1
                S += r
            ss.append(S)
        hc = 0.0
        for h in range(1, max_h + 1):
            hc = hc + (pow2(ss[h]) - pow2(ss[h - 1])) / h
        exp[src] = hc / 0.77351

    got = {
        r["vid"]: r["hc"]
        for r in hyperball_harmonic(er, k=k, max_h=max_h).collect()
    }
    assert set(got) == set(exp)
    for v, hc in exp.items():
        assert abs(got[v] - round(hc, 6)) < 1e-9, (v, got[v], hc)
        assert got[v] >= 0.0


def test_hyperball_tracks_exact_harmonic_rank(er):
    """k=64 lanes: HyperBall estimates correlate with the exact per-vertex
    harmonic centrality (Spearman > 0.8 on the ER fixture) — the
    estimator-quality claim, separate from the bit-level plumbing test."""
    from linkgraph.algos.anf import hyperball_harmonic

    adj = _adj()
    exact = {}
    for src in adj:
        dist = {src: 0}
        q = collections.deque([src])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        exact[src] = sum(1.0 / d for v, d in dist.items() if d > 0)

    got = {
        r["vid"]: r["hc"]
        for r in hyperball_harmonic(er, k=64, max_h=10).collect()
    }

    def ranks(d):
        order = sorted(d, key=d.__getitem__)
        return {v: i for i, v in enumerate(order)}
    ra, rb = ranks(exact), ranks(got)
    n = len(ra)
    num = sum((ra[v] - rb[v]) ** 2 for v in ra)
    rho = 1 - 6 * num / (n * (n * n - 1))
    assert rho > 0.8, rho


# ----------------------------------------------------------- node2vec walks
def _n2v_python_oracle(adj, seeds, walk_len, p, q, walks_per_seed, seed):
    """Pure-python mirror of the integer-copy hash-argmin step rule."""
    import hashlib

    from linkgraph.operators.walks import _biased_weights

    w_ret, w_tri, w_out = _biased_weights(p, q)

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = set()
    for s in sorted(set(seeds)):
        for w in range(walks_per_seed):
            prev, cur = None, s
            rows.add((s, w, 0, s))
            for step in range(1, walk_len + 1):
                nbrs = sorted(adj.get(cur, ()))
                if not nbrs:
                    break
                best = None
                for x in nbrs:
                    if step == 1:
                        copies = 1
                    elif x == prev:
                        copies = w_ret
                    elif x in adj.get(prev, ()):
                        copies = w_tri
                    else:
                        copies = w_out
                    k = min(
                        h60(f"{cur}:{x}:{w}:{seed}:{step}:{c}")
                        for c in range(copies)
                    )
                    if best is None or (k, x) < best:
                        best = (k, x)
                prev, cur = cur, best[1]
                rows.add((s, w, step, cur))
    return rows


def test_node2vec_walks_bit_exact_vs_python(er):
    from linkgraph.operators.walks import node2vec_walks

    adj = _adj()
    seeds = sorted(adj)[:6]
    got = {
        (r["seed"], r["walk"], r["step"], r["vid"])
        for r in node2vec_walks(
            er, seeds, walk_len=5, p=0.25, q=4.0, walks_per_seed=2, seed=11
        ).collect()
    }
    exp = _n2v_python_oracle(adj, seeds, 5, 0.25, 4.0, 2, 11)
    assert got == exp


def test_node2vec_bias_distribution(spark):
    """Star graph, leaves only connect through the center: at step 2 the
    only return candidate is the originating leaf, every other leaf is an
    'out' candidate (no triangles).  P(return) = w_ret/(w_ret+(n-1)·w_out);
    a return-biased walk (p=0.25, q=4 → weights 16:4:1) must return far
    more often than the uniform walk, and both must sit inside 4σ binomial
    bands around their exact probabilities."""
    from linkgraph.operators.walks import node2vec_walks

    n_leaves = 40
    pairs = [(0, i) for i in range(1, n_leaves + 1)]
    g = LinkGraph.from_undirected(edges_df(spark, pairs), num_partitions=4)
    seeds = list(range(1, n_leaves + 1))
    wps = 10
    n_trials = n_leaves * wps

    def return_rate(p, q, seed):
        rows = node2vec_walks(
            g, seeds, walk_len=2, p=p, q=q, walks_per_seed=wps, seed=seed
        ).collect()
        byw = {}
        for r in rows:
            byw.setdefault((r["seed"], r["walk"]), {})[r["step"]] = r["vid"]
        assert len(byw) == n_trials
        ret = sum(1 for k, w in byw.items() if w[2] == k[0])
        return ret

    # biased: weights (16, 4, 1) → P(ret) = 16/(16+39) ≈ 0.2909
    ret_b = return_rate(0.25, 4.0, 5)
    p_b = 16 / (16 + (n_leaves - 1))
    sd_b = math.sqrt(n_trials * p_b * (1 - p_b))
    assert abs(ret_b - n_trials * p_b) < 4 * sd_b, ret_b
    # uniform: P(ret) = 1/40
    ret_u = return_rate(1.0, 1.0, 5)
    p_u = 1 / n_leaves
    sd_u = math.sqrt(n_trials * p_u * (1 - p_u))
    assert abs(ret_u - n_trials * p_u) < 4 * sd_u, ret_u
    assert ret_b > 3 * ret_u


def test_shortest_path_tree_valid(spark):
    """Every parent edge must be a tight relaxation (dist[p] + w ==
    dist[v]) and following parents must reach a source."""
    import random

    from linkgraph.algos.sssp import shortest_path_tree
    from linkgraph.fixtures import edges_df, er_edges
    from linkgraph.graph import LinkGraph
    from pyspark.sql import functions as F

    rnd = random.Random(3)
    pairs = er_edges(80, 0.06, seed=23)
    wedges = {}
    for a, b in pairs:
        if a != b:
            u, v = min(a, b), max(a, b)
            wedges[(u, v)] = rnd.randint(1, 9)
    rows = []
    for (u, v), w in wedges.items():
        rows.append((u, v, w))
        rows.append((v, u, w))
    g = LinkGraph(
        spark.createDataFrame(rows, "src long, dst long, w long"), symmetric=True
    )
    sources = [0, 1]
    out = {
        r.vid: (r.dist, r.parent)
        for r in shortest_path_tree(g, sources).collect()
    }
    wmap = {}
    for (u, v), w in wedges.items():
        wmap[(u, v)] = wmap[(v, u)] = w
    for v, (dist, parent) in out.items():
        if v in sources:
            assert dist == 0 and parent is None
            continue
        assert parent is not None and parent in out
        pd, _ = out[parent]
        assert pd + wmap[(parent, v)] == dist, v
    # chains terminate at a source (no cycles)
    for v in out:
        seen, cur = set(), v
        while out[cur][1] is not None:
            assert cur not in seen
            seen.add(cur)
            cur = out[cur][1]
        assert cur in sources
