"""quality_filter: first-failing-rule reasons, agreement with the
component operators, zero-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from linkgraph.textops.textstats import (
    quality_filter,
    repetition_stats,
    text_stats,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then walks "
    "slowly back home through quiet fields while evening settles"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, GOOD),                                   # ok
        (1, "one two"),                              # too_few_tokens
        (2, "a b c d e f g h i j k l m n o p"),      # bad_avg_token_len (1.0)
        (3, "words!!! with??? heavy... punct,,, " * 4),  # high_punct
        (4, "repeat line\n" * 20),                   # gopher_repetition (dup lines)
        (5, ""),                                     # too_few_tokens (0)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_reasons_first_failing_rule(docs):
    got = {r["doc_id"]: (r["keep"], r["reason"]) for r in quality_filter(docs).collect()}
    assert got[0] == (True, "ok")
    assert got[1] == (False, "too_few_tokens")
    assert got[2] == (False, "bad_avg_token_len")
    assert got[3] == (False, "high_punct")
    assert got[4] == (False, "gopher_repetition")
    assert got[5] == (False, "too_few_tokens")


def test_agrees_with_component_operators(docs):
    """A doc passes iff its text_stats quality is maximal AND the Gopher
    flag is clear — the composite must never disagree with its parts."""
    keep = {r["doc_id"]: r["keep"] for r in quality_filter(docs).collect()}
    q = {r["doc_id"]: r["quality"] for r in text_stats(docs).collect()}
    fl = {r["doc_id"]: r["flagged"] for r in repetition_stats(docs).collect()}
    for d, k in keep.items():
        assert k == (q[d] == 1.0 and not fl[d])


def test_quality_filter_zero_shuffle(spark):
    docs = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    plan = quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
