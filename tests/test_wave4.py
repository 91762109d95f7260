"""mixture_weights / dedup_token_stats / weighted_sample /
landmark_distance_bounds / pagerank warm start vs exact hand oracles."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "alpha beta gamma", "en", "s1", 16),
    (2, "alpha beta gamma", "en", "s2", 16),  # exact dup of 1, other source
    (3, "uno dos", "es", "s1", 7),
    (4, "uno dos tres cuatro", "es", "s2", 19),
    (5, "ein zwei drei", "de", "s1", 13),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_mixture_weights_exact(docs):
    from linkgraph.textops.textstats import mixture_weights

    got = {r.lang: r for r in mixture_weights(docs, alpha=0.5).collect()}
    toks = {"en": 6, "es": 6, "de": 3}  # whitespace words are all [a-z]+ runs
    tt = sum(toks.values())
    z = sum((n / tt) ** 0.5 for n in toks.values())
    for lang, n in toks.items():
        r = got[lang]
        assert r.n_tokens == n
        assert r.raw_share == round(n / tt, 6)
        assert r.sample_share == round((n / tt) ** 0.5 / z, 6)
        assert r.upsample == round((n / tt) ** 0.5 / z / (n / tt), 6)
    # temperature flattens: the rare language is upsampled, the head is not
    assert got["de"].upsample > 1.0 > got["en"].upsample


def test_dedup_token_stats_attribution(docs):
    from linkgraph.textops.dedup import dedup_token_stats

    got = {r.source: r for r in dedup_token_stats(docs).collect()}
    # doc 2 (s2) is the duplicate copy — doc 1 (s1) survives as min doc_id,
    # so the dropped 3 tokens are attributed to s2
    assert (got["s1"].n_docs, got["s1"].n_docs_kept) == (3, 3)
    assert got["s1"].n_tokens == got["s1"].n_tokens_kept == 3 + 2 + 3
    assert (got["s2"].n_docs, got["s2"].n_docs_kept) == (2, 1)
    assert (got["s2"].n_tokens, got["s2"].n_tokens_kept) == (7, 4)
    assert got["s2"].dup_token_frac == round(1 - 4 / 7, 6)


def _ws_key(doc_id: int, w: float) -> float:
    h = int(hashlib.md5(f"{doc_id}#ws".encode()).hexdigest()[:15], 16)
    u = (float(h) + 1.0) / float(1 << 60)
    return -math.log(u) / w


def test_weighted_sample_matches_hand_draw(docs):
    from linkgraph.operators.sampling import weighted_sample

    got = weighted_sample(docs, "doc_id", "n_chars", 3).collect()
    want = sorted(
        ((did, float(nc)) for did, _, _, _, nc in DOCS),
        key=lambda p: (_ws_key(p[0], p[1]), p[0]),
    )[:3]
    assert [(r.doc_id, r.weight) for r in got] == want
    for r in got:
        assert r.ws_key == pytest.approx(_ws_key(r.doc_id, r.weight), rel=1e-12)


def test_weighted_sample_zero_weight_excluded(spark):
    from linkgraph.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, w long")
    got = weighted_sample(df, "doc_id", "w", 2).collect()
    assert [r.doc_id for r in got] == [2]


PATH6 = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]


def _sym(edges):
    return [(a, b) for a, b in edges] + [(b, a) for a, b in edges]


def test_landmark_bounds_path_graph(spark):
    from linkgraph.algos.landmarks import landmark_distance_bounds

    g = LinkGraph(
        spark.createDataFrame(_sym(PATH6), "src long, dst long"),
        materialize=False,
    )
    # top-2 degree landmarks = vids 2, 3 (deg-2 tie broken by vid)
    got = {
        (r.u, r.v): (r.d_lb, r.d_ub)
        for r in landmark_distance_bounds(g, 2, [1, 6], max_levels=8).collect()
    }
    # d(2,1)=1 d(2,6)=4 d(3,1)=2 d(3,6)=3 -> lb max(3,1)=3, ub min(5,5)=5
    assert got == {(1, 6): (3, 5)}


def test_landmark_bounds_exact_when_landmark_on_path(spark):
    from linkgraph.algos.landmarks import landmark_distance_bounds

    # star: center 1 has max degree, is ON every leaf-leaf shortest path
    star = [(1, k) for k in range(2, 7)]
    g = LinkGraph(
        spark.createDataFrame(_sym(star), "src long, dst long"),
        materialize=False,
    )
    got = {
        (r.u, r.v): (r.d_lb, r.d_ub)
        for r in landmark_distance_bounds(g, 1, [2, 3], max_levels=8).collect()
    }
    assert got == {(2, 3): (0, 2)}  # ub exact (2), lb degenerate (|1-1|)


def test_pagerank_warm_start_composes(spark):
    from linkgraph.algos.pagerank import pagerank

    g = LinkGraph(
        spark.createDataFrame(_sym(PATH6 + [(2, 5)]), "src long, dst long"),
        materialize=False,
    )
    full = {r.vid: r.pr for r in pagerank(g, tol=0, max_iter=8).collect()}
    half = pagerank(g, tol=0, max_iter=5)
    resumed = {
        r.vid: r.pr
        for r in pagerank(g, tol=0, max_iter=3, init=half).collect()
    }
    assert set(full) == set(resumed)
    for vid, pr in full.items():
        assert resumed[vid] == pytest.approx(pr, rel=1e-12)


def test_pagerank_init_rejected_with_sources(spark):
    from linkgraph.algos.pagerank import pagerank

    g = LinkGraph(
        spark.createDataFrame(_sym(PATH6), "src long, dst long"),
        materialize=False,
    )
    dummy = g.degrees().select("vid", F.lit(0.1).alias("pr"))
    with pytest.raises(ValueError, match="init"):
        pagerank(g, sources=[1], init=dummy)
