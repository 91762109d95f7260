"""Misra-Gries two-pass heavy hitters: exactness vs brute force, the
candidate-superset guarantee, and the zero-qualifier case."""

import collections

import pytest

from linkgraph.textops.sketches import (
    misra_gries_partition_summaries,
    token_heavy_hitters,
)


def _docs(spark, texts, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


def _brute(texts, k):
    import re

    cnt = collections.Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower())
    )
    n = sum(cnt.values())
    return {w: c for w, c in cnt.items() if c * k > n}


def test_heavy_hitters_exact_on_skewed_stream(spark):
    # 'the' dominates; mid-frequency words straddle the n/k boundary
    texts = (
        ["the the the quick brown fox"] * 30
        + ["jumps over the lazy dog"] * 20
        + [f"rare{i} filler words here" for i in range(40)]
    )
    k = 8
    got = {
        r["token"]: r["cnt"]
        for r in token_heavy_hitters(_docs(spark, texts), k).collect()
    }
    assert got == _brute(texts, k)


def test_heavy_hitters_empty_when_flat(spark):
    texts = [f"unique{i} token{i}" for i in range(50)]
    assert token_heavy_hitters(_docs(spark, texts), 10).count() == 0


def test_mg_summaries_superset_and_sentinel_total(spark):
    texts = ["alpha beta alpha"] * 25 + [f"x{i} y{i}" for i in range(30)]
    k = 5
    tok_rows = sum(len(t.split()) for t in texts)
    df = _docs(spark, texts)
    from pyspark.sql import functions as F

    tok = df.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("item")
    )
    summ = misra_gries_partition_summaries(tok, k).collect()
    total = sum(r["cnt"] for r in summ if r["item"] is None)
    assert total == tok_rows
    cand = {r["item"] for r in summ if r["item"] is not None}
    for hh in _brute(texts, k):
        assert hh in cand  # pigeonhole guarantee: every true HH survives
