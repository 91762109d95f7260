"""Corpus-level n-gram statistics: heavy hitters and PMI collocations.

Two corpus-wide aggregates a training-data pipeline runs constantly —
"what are the most frequent n-grams" (boilerplate/template detection,
stop-list construction) and "which word pairs co-occur far above
chance" (PMI collocations: tokenizer-merge candidates, NER seed lists,
domain-phrase discovery [Church & Hanks, CL 1990]).

Scale shape (both operators):
* n-grams leave each document via one `explode` of a projection-built
  array — a flatMap, no shuffle; the `text` column itself never moves;
* counting is ONE hash aggregate on the n-gram (partial map-side
  combine collapses each partition's duplicates before the shuffle, so
  the shuffle carries ≤ distinct-grams-per-partition rows, not token
  occurrences);
* the unigram table a PMI join needs is vocabulary-sized — broadcast;
  corpus totals ride along as a broadcast 1-row aggregate, never a
  driver round-trip;
* the final global top-k is orderBy+limit = TakeOrdered: O(k) heap per
  partition + O(k·P) driver merge, never a full sort.

PMI uses natural log rounded to 6 — the same engine-portability
contract the TF-IDF query established (`textstats.py:105-117`): exact
integer counts divided as IEEE doubles, one `ln`, round(…, 6); ordering
is fully keyed (score desc, then the gram) so the top-k frontier is
deterministic in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.dedup import normalized_tokens


def _grams(n: int, text_col: str):
    toks = normalized_tokens(text_col)
    if n == 1:
        return toks
    n_tok = F.size(toks)
    return F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_topk(
    docs: DataFrame, n: int = 3, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k most frequent word n-grams corpus-wide: (gram, cnt),
    ordered by (cnt desc, gram asc) — exact counts, deterministic
    boundary."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    return (
        docs.select(F.explode(_grams(n, text_col)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


def pmi_collocations(
    docs: DataFrame, k: int = 50, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information: (w1, w2, n_pair, pmi) with

        pmi = ln( (n_pair / B) / ((n_w1 / T) · (n_w2 / T)) )

    over corpus totals B (bigram occurrences) and T (token
    occurrences); bigrams below min_count are dropped (PMI's
    low-frequency pathology).  pmi rounded to 6; ordered by
    (pmi desc, w1, w2)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    toks = docs.select(F.explode(_grams(1, text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("nw"))
    tot_t = toks.groupBy().agg(F.count("*").cast("double").alias("T"))

    bi = docs.select(F.explode(_grams(2, text_col)).alias("g"))
    bic = (
        bi.groupBy("g")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
            "n_pair",
        )
    )
    tot_b = bi.groupBy().agg(F.count("*").cast("double").alias("B"))

    u1 = uni.select(F.col("w").alias("w1"), F.col("nw").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("nw").alias("n_w2"))
    return (
        bic.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("B"))
                    / ((F.col("n_w1") / F.col("T")) * (F.col("n_w2") / F.col("T")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )
