"""tfidf_cosine_pairs vs an exact pure-Python TF-IDF cosine oracle."""

import collections
import math
import re

import pytest

from linkgraph.textops.textstats import tfidf_cosine_pairs

TEXTS = [
    "spark shuffle join agg scan spark spark",
    "spark shuffle join agg scan filter",       # near-dup of 0
    "quantum entanglement photon qubit qubit",
    "photon qubit laser optics",
    "spark photon hybrid pipeline scan",
    "the the the the the",                      # single ubiquitous-ish term
    "shuffle scan spark join agg",              # near-dup of 0/1
    "laser optics quantum photon entanglement",
]


def _oracle(max_df_pct=100, min_shared=1):
    toks = [re.findall("[a-z0-9]+", t.lower()) for t in TEXTS]
    tf = [collections.Counter(t) for t in toks]
    n = len(TEXTS)
    df = collections.Counter()
    for c in tf:
        for term in c:
            df[term] += 1
    cap = n * max_df_pct // 100
    vocab = {t for t, d in df.items() if 2 <= d <= cap}
    vecs = [
        {t: c[t] * math.log(n / df[t]) for t in c if t in vocab} for c in tf
    ]
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            shared = set(vecs[a]) & set(vecs[b])
            if len(shared) < min_shared or not vecs[a] or not vecs[b]:
                continue
            dot = sum(vecs[a][t] * vecs[b][t] for t in shared)
            na = math.sqrt(sum(w * w for w in vecs[a].values()))
            nb = math.sqrt(sum(w * w for w in vecs[b].values()))
            want[(a, b)] = (len(shared), round(dot / (na * nb), 6))
    return want


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_tfidf_cosine_pairs_vs_bruteforce(docs):
    got = {
        (r.a, r.b): (r.shared, r.sim)
        for r in tfidf_cosine_pairs(docs, max_df_pct=100).collect()
    }
    want = _oracle(max_df_pct=100)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-6, (k, got[k], want[k])


def test_tfidf_cosine_pairs_max_df_cuts_vocab(docs):
    # cap at 50%: terms in >4 of 8 docs drop out of vectors AND norms
    got = {
        (r.a, r.b): (r.shared, r.sim)
        for r in tfidf_cosine_pairs(docs, max_df_pct=50).collect()
    }
    want = _oracle(max_df_pct=50)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-6


def test_tfidf_cosine_pairs_topk_order(docs):
    rows = tfidf_cosine_pairs(docs, max_df_pct=100, topk=5).collect()
    assert len(rows) == 5
    keys = [(-r.sim, -r.shared, r.a, r.b) for r in rows]
    assert keys == sorted(keys)
    # the engineered near-dup pair ranks top
    top = rows[0]
    assert (top.a, top.b) in {(0, 1), (0, 6), (1, 6), (2, 7), (3, 7)}
