"""Round-5 wave 7: bipartiteness check, BM25, hashing vectorizer."""

import math

import pytest
from pyspark.sql import functions as F


def _graph(spark, pairs):
    from linkgraph.graph import LinkGraph

    sym = pairs + [(b, a) for a, b in pairs]
    return LinkGraph(spark.createDataFrame(sym, "src long, dst long"))


def test_bipartite_even_cycle_passes_odd_fails(spark):
    from linkgraph.algos.bipartite import bipartite_check

    # comp of 1..4: 4-cycle (bipartite); comp of 10..12: triangle (odd)
    g = _graph(
        spark, [(1, 2), (2, 3), (3, 4), (4, 1), (10, 11), (11, 12), (12, 10)]
    )
    out = {r["comp"]: r for r in bipartite_check(g).collect()}
    assert out[1]["is_bipartite"] and out[1]["n_odd_edges"] == 0
    assert out[1]["n_vertices"] == 4
    assert not out[10]["is_bipartite"]
    assert out[10]["n_odd_edges"] >= 1
    assert out[10]["n_vertices"] == 3


def test_bipartite_path_component(spark):
    from linkgraph.algos.bipartite import bipartite_check

    g = _graph(spark, [(5, 6), (6, 7)])
    r = bipartite_check(g).collect()
    assert len(r) == 1 and r[0]["is_bipartite"] and r[0]["n_vertices"] == 3


def test_bm25_prefers_matching_docs_and_idf_downweights(spark):
    from linkgraph.textops.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rare common common filler filler"),
            (2, "common filler filler filler filler"),
            (3, "common filler filler filler filler"),
            (4, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["rare", "common"], k=4).collect()
    assert rows[0]["doc_id"] == 1  # only doc with the rare term wins
    assert rows[0]["n_hit_terms"] == 2
    ids = [r["doc_id"] for r in rows]
    assert 4 not in ids  # no query term, no score row
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_scores_sorted_deterministic(spark, sf0001):
    from linkgraph.entry_queries import q_bm25_topk

    rows = q_bm25_topk(spark, sf0001).collect()
    assert rows
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_hashing_vectorizer_l2_and_nnz(spark):
    from linkgraph.textops.retrieval import hashing_vectorizer_stats

    # one term repeated 3x: exactly one nonzero dim of |v|=3
    docs = spark.createDataFrame([(1, "abc abc abc")], "doc_id long, text string")
    r = hashing_vectorizer_stats(docs, dims=16).collect()[0]
    assert r["nnz"] == 1
    assert r["l2"] == pytest.approx(3.0)
    assert 0 <= r["top_dim"] < 16
    with pytest.raises(ValueError):
        hashing_vectorizer_stats(docs, dims=0)


def test_hashing_vectorizer_sign_cancellation_drops_dim(spark):
    from linkgraph.textops.dedup import portable_hash60
    from linkgraph.textops.retrieval import hashing_vectorizer_stats

    # find two single-char terms hashing to the SAME dim with OPPOSITE
    # signs under dims=2, then verify they cancel
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cands = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    pair = None
    for a in cands:
        for b in cands:
            if a == b:
                continue
            if (
                h60(a + "#hvdim") % 2 == h60(b + "#hvdim") % 2
                and h60(a + "#hvsign") % 2 != h60(b + "#hvsign") % 2
            ):
                pair = (a, b)
                break
        if pair:
            break
    assert pair, "no cancelling pair among single letters"
    docs = spark.createDataFrame(
        [(1, f"{pair[0]} {pair[1]}")], "doc_id long, text string"
    )
    out = hashing_vectorizer_stats(docs, dims=2).collect()
    # the shared dim cancels to 0 and is dropped; doc may vanish entirely
    for r in out:
        assert r["nnz"] <= 1
