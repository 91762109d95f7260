"""unigram_logprob vs an exact pure-python corpus-LM oracle."""

import collections
import math
import re

import pytest

from linkgraph.textops.textstats import TOKEN_RE, unigram_logprob

ROWS = [
    (0, "the cat sat on the mat and the dog sat too"),
    (1, "the the the the"),                     # all common tokens -> high
    (2, "zyx qwv bnm zyx"),                     # rare tokens -> low
    (3, ""),                                    # zero tokens -> absent
    (4, "cat dog mat and on too"),
]


def _python_scores(rows):
    toks = {d: re.findall(TOKEN_RE, t.lower()) for d, t in rows}
    cnt = collections.Counter(w for ts in toks.values() for w in ts)
    total = sum(cnt.values())
    out = {}
    for d, ts in toks.items():
        if not ts:
            continue
        s = sum(math.log(cnt[w]) for w in ts)
        out[d] = (len(ts), round(s / len(ts) - math.log(total), 6))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_matches_python_oracle(docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["lm_logprob"])
        for r in unigram_logprob(docs).collect()
    }
    assert got == _python_scores(ROWS)


def test_common_beats_rare_and_empty_absent(docs):
    got = {r["doc_id"]: r["lm_logprob"] for r in unigram_logprob(docs).collect()}
    assert got[1] > got[0] > got[2]  # common > mixed > rare
    assert 3 not in got


def test_bigram_logprob_exact(spark):
    import collections
    import math
    import re

    from linkgraph.textops.textstats import bigram_logprob

    texts = [
        "the cat sat on the mat",
        "the cat sat on the cat",
        "zz qq",
        "single",                      # 1 token: absent from output
        "the cat the cat the cat",     # repetitive, common bigrams
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    tok = [re.findall("[a-z0-9]+", t.lower()) for t in texts]
    cuv = collections.Counter()
    for ts in tok:
        for a, b in zip(ts, ts[1:]):
            cuv[(a, b)] += 1
    cu = collections.Counter()
    for (a, _), c in cuv.items():
        cu[a] += c
    vocab = len({w for ts in tok for w in ts})
    want = {}
    for i, ts in enumerate(tok):
        if len(ts) < 2:
            continue
        lp = [
            math.log((cuv[(a, b)] + 1) / (cu[a] + vocab))
            for a, b in zip(ts, ts[1:])
        ]
        want[i] = (len(lp), round(sum(lp) / len(lp), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.lm2_logprob)
        for r in bigram_logprob(docs).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= 1e-6
    # word-order sensitivity: repetitive common-bigram doc outscores the
    # rare-bigram doc
    assert got[4][1] > got[2][1]


def test_source_quality_rollup_exact(spark):
    from linkgraph.textops.textstats import source_quality_rollup

    rows = [
        (0, "alpha beta gamma", "mirror", None),
        (1, "alpha beta gamma", "mirror", None),   # exact dup of 0
        (2, "delta epsilon", "clean", None),
        (3, "alpha beta gamma", "clean", None),    # dup partner lives in mirror
        (4, "zeta", "clean", None),
    ]
    docs = spark.createDataFrame(
        [(i, t, s) for i, t, s, _ in rows], "doc_id long, text string, source string"
    )
    got = {
        r.source: (r.n_docs, r.n_dup_docs, r.dup_rate)
        for r in source_quality_rollup(docs).collect()
    }
    # mirror: both docs are dup members; clean: doc 3 is a dup member
    # because its digest partner exists in mirror (cross-source dup)
    assert got["mirror"] == (2, 2, 1.0)
    assert got["clean"] == (3, 1, round(1 / 3, 6))


def test_zipf_fit_exact(spark):
    import math
    import re
    from collections import Counter

    from linkgraph.textops.textstats import zipf_fit

    texts = [
        "the the the the cat cat sat mat",
        "the cat runs fast today",
        "the dog sat on the mat yesterday evening",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cnt = Counter(w for t in texts for w in re.findall("[a-z0-9]+", t.lower()))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    slope = (n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        n * sum(x * x for x in xs) - sum(xs) ** 2
    )
    row = zipf_fit(docs).collect()[0]
    assert row.vocab == len(cnt)
    assert row.total_tokens == sum(cnt.values())
    assert abs(row.zipf_slope - round(slope, 6)) <= 1e-6
    assert row.zipf_slope < 0  # frequency falls with rank
