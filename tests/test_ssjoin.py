"""Prefix-filter set-similarity join: output equals brute force while the
candidate set is provably smaller than shares-any-token."""

import itertools
import re

import pytest

from linkgraph.textops.dedup import prefix_filter_jaccard_pairs


def _brute(texts, t_num, t_den):
    sets = {i: set(re.findall("[a-z0-9]+", t.lower())) for i, t in enumerate(texts)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a]) + len(sets[b]) - i
        if u and i * t_den >= t_num * u:
            out[(a, b)] = round(i / u, 6)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    # every doc shares the stop-word 'the' (naive blocking pairs ALL docs);
    # only 0/1 and 2/3 are true near-dups at 0.7
    texts = [
        "the alpha beta gamma delta epsilon",
        "the alpha beta gamma delta zeta",
        "the red green blue cyan magenta",
        "the red green blue cyan yellow",
    ] + [f"the unique{i} only{i} words{i} here{i} now{i}" for i in range(20)]
    return texts, spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_prefix_join_equals_brute_force(docs):
    texts, df = docs
    got = {
        (r["a"], r["b"]): r["jac"]
        for r in prefix_filter_jaccard_pairs(df, 7, 10).collect()
    }
    assert got == _brute(texts, 7, 10)
    assert (0, 1) in got and (2, 3) in got


def test_threshold_is_integer_exact_boundary(spark):
    # |A|=|B|=5, i=4 → union=6, jac=2/3: ≥ 2/3 exactly at t=2/3
    a = "p q r s t"
    b = "p q r s u"
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    assert prefix_filter_jaccard_pairs(df, 2, 3).count() == 1  # 4*3 >= 2*6
    assert prefix_filter_jaccard_pairs(df, 7, 10).count() == 0  # 4*10 < 7*6
