"""TextRank / stop-list / readability / profile / neighborhood-MinHash
vs hand oracles."""

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cooccurrence_edges_hand_oracle(spark):
    """'a b a' → pairs (a,b)x2; adjacent duplicates ('c c') are dropped."""
    from linkgraph.textops.keywords import cooccurrence_edges

    docs = _docs(spark, ["a b a", "c c b"])
    out = {(r.a, r.b): r.w for r in cooccurrence_edges(docs).collect()}
    assert out == {("a", "b"): 2, ("b", "c"): 1}


def test_textrank_uniform_cycle_scores_equal_one(spark):
    """On a regular graph (triangle, unit weights) the TextRank fixpoint
    is exactly 1.0 for every vertex — each vertex redistributes its
    whole score: s = 0.15 + 0.85*s → s = 1."""
    from linkgraph.textops.keywords import textrank_keywords

    docs = _docs(spark, ["a b", "b c", "c a"])
    out = textrank_keywords(docs, k=10, iters=8).collect()
    assert sorted(r.word for r in out) == ["a", "b", "c"]
    for r in out:
        assert r.score == pytest.approx(1.0, abs=1e-9)


def test_textrank_hub_outranks_leaves(spark):
    """Star center co-occurs with every leaf → strictly higher score."""
    from linkgraph.textops.keywords import textrank_keywords

    docs = _docs(spark, ["hub x1", "hub x2", "hub x3", "hub x4"])
    rows = {r.word: r.score for r in textrank_keywords(docs, k=10).collect()}
    assert rows["hub"] > max(v for w, v in rows.items() if w != "hub")


def test_stopword_candidates_hand_oracle(spark):
    """'the' in 3/3 docs (ratio 1.0, cf 4); 'cat' in 1/3 (filtered)."""
    from linkgraph.textops.keywords import stopword_candidates

    docs = _docs(spark, ["the cat the", "the dog", "a the"])
    out = stopword_candidates(docs, min_df_ratio=0.5, k=10).collect()
    assert [(r.word, r.df, r.cf, r.df_ratio) for r in out] == [("the", 3, 4, 1.0)]


def test_readability_hand_oracle(spark):
    """'Spark is fast.' → 3 words, 1 sentence, 3 vowel groups (a/i/a):
    flesch = 206.835 - 1.015*3 - 84.6*1; empty text → NULL flesch."""
    from linkgraph.textops.textstats import readability

    docs = _docs(spark, ["Spark is fast.", ""])
    out = {r.doc_id: r for r in readability(docs).collect()}
    r0 = out[0]
    assert (r0.n_words, r0.n_sentences, r0.n_syllables) == (3, 1, 3)
    assert r0.flesch == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1.0, abs=1e-6)
    r1 = out[1]
    assert (r1.n_words, r1.n_sentences) == (0, 1)
    assert r1.flesch is None


def test_data_profile_hand_oracle(spark):
    from linkgraph.operators.profile import data_profile

    df = spark.createDataFrame(
        [(1.0, None), (2.0, 5.0), (2.0, 7.0)], "x double, y double"
    )
    out = {r.col_name: r for r in data_profile(df, ["x", "y"]).collect()}
    x = out["x"]
    assert (x.n_rows, x.n_nulls, x.n_distinct) == (3, 0, 2)
    assert (x.min_v, x.max_v) == (1.0, 2.0)
    assert x.mean_v == pytest.approx(5.0 / 3, abs=1e-6)
    y = out["y"]
    assert (y.n_rows, y.n_nulls, y.n_distinct) == (3, 1, 2)
    assert y.mean_v == pytest.approx(6.0, abs=1e-9)


def test_data_profile_rejects_empty_cols(spark):
    from linkgraph.operators.profile import data_profile

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        data_profile(df, [])


def _sym(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(sym)), "src long, dst long")


def test_nbr_minhash_identical_neighborhoods_jac_one(spark):
    """1 and 2 share the exact neighborhood {3,4,5} → identical
    signatures, candidate in every band, exact jac 1.0.  Under the
    symmetric closure, 3/4/5 likewise all share {1,2}."""
    from linkgraph.algos.nbrsketch import neighborhood_minhash_pairs

    pairs = [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 5)]
    out = neighborhood_minhash_pairs(
        _sym(spark, pairs), num_hashes=8, bands=4, threshold=0.9
    ).collect()
    assert [(r.a, r.b, r.jac) for r in out] == [
        (1, 2, 1.0),
        (3, 4, 1.0),
        (3, 5, 1.0),
        (4, 5, 1.0),
    ]


def test_nbr_minhash_exact_jaccard_on_candidates(spark):
    """Verify stage computes the EXACT neighborhood Jaccard: 1 and 2
    share 2 of 3 neighbors each → jac = 2/(3+3-2) = 0.5."""
    from linkgraph.algos.nbrsketch import neighborhood_minhash_pairs

    pairs = [(1, 3), (1, 4), (1, 5), (2, 3), (2, 4), (2, 6)]
    out = neighborhood_minhash_pairs(
        _sym(spark, pairs), num_hashes=8, bands=8, threshold=0.0
    ).collect()
    got = {(r.a, r.b): r.jac for r in out}
    # threshold 0 + 8 single-row bands: the (1,2) pair is near-certain
    # to band-collide (P = 1-(1-j)^8 with j=0.5); assert the exact value
    assert got[(1, 2)] == pytest.approx(0.5, abs=1e-9)


def test_nbr_minhash_validates_band_divisibility(spark):
    from linkgraph.algos.nbrsketch import neighborhood_minhash_pairs

    df = _sym(spark, [(1, 2)])
    with pytest.raises(ValueError):
        neighborhood_minhash_pairs(df, num_hashes=8, bands=3)
