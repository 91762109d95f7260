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
