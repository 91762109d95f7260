"""TextRank keyword extraction and corpus stop-list discovery.

Two vocabulary-graph operators a training-data / search pipeline runs
over a corpus:

* `textrank_keywords` — TextRank [Mihalcea & Tarau, EMNLP 2004]: rank
  words by running a damped weighted PageRank over the word
  co-occurrence graph (adjacent-token pairs, window 2), then take the
  global top-k.  This is the classic unsupervised keyword extractor and
  doubles as an engine-synthesis exercise: the same frontier-expand +
  weighted-contribution-sum iteration the link-graph PageRank kernel
  uses, applied to a corpus-derived graph.
* `stopword_candidates` — stop-list discovery: words whose document
  frequency ratio exceeds a threshold, ranked by (df ratio, corpus
  frequency).  Feeds the stop-lists the quality filters and TF-IDF
  paths consume.

Scale shape (the reason this survives 100 TB of text):
* the co-occurrence graph is VOCABULARY-sized, not corpus-sized: the
  corpus leaves each document via one `explode` of a projection-built
  bigram array (a flatMap — `text` itself never shuffles) and
  collapses immediately in ONE hash aggregate with map-side combine,
  so the shuffle carries <= distinct-pairs-per-partition rows;
* the rank iteration then runs entirely on the vocab graph (|V| =
  distinct words, |E| = distinct adjacent pairs — millions, not
  billions): each step is one equi-join + one hash aggregate on data
  orders of magnitude smaller than the corpus;
* every vertex of the symmetrized co-occurrence graph has in- and
  out-edges, so there is no dangling-mass correction to distribute —
  the per-step contribution sum is total;
* stop-list discovery is one corpus scan: explode -> (word, doc_id)
  count -> per-word rollup (df = rows, cf = sum), joined against a
  broadcast 1-row corpus total — no driver round-trip.

Determinism / oracle-portability contract (matches the PMI / TF-IDF
precedent in this package): exact integer counts divided as IEEE
doubles, damping constants written as the same expression (`1.0 - d`)
in both engines, scores rounded AND ordered by the rounded value with
a full lexical tie-break, so the top-k frontier is identical in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.collocations import _grams


def cooccurrence_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical undirected adjacent-pair counts: (a, b, w) with a < b.

    One explode + one hash aggregate; tokens are `[a-z0-9]+` so the
    single-space bigram join key splits back losslessly.
    """
    g = docs.select(F.explode(_grams(2, text_col)).alias("g"))
    s = F.split(F.col("g"), " ")
    p = g.select(s.getItem(0).alias("x"), s.getItem(1).alias("y")).where(
        F.col("x") != F.col("y")
    )
    return (
        p.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def textrank_keywords(
    docs: DataFrame,
    k: int = 30,
    damping: float = 0.85,
    iters: int = 10,
    round_to: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Top-k TextRank keywords: (word, score), score desc / word asc.

    score_{t+1}(v) = (1-d) + d * sum_{u~v} w_uv/wdeg_u * score_t(u)
    over the symmetrized co-occurrence graph, fixed `iters` steps from
    the all-ones start (the paper's formulation, not the 1/n PageRank
    normalization — scores are O(1) per vertex).
    """
    und = cooccurrence_edges(docs, text_col)
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    # out-fraction table is loop-invariant: build once, persist across steps
    emit = (
        edges.join(wdeg, "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("wdeg")).alias("frac"),
        )
        .persist()
    )
    score = wdeg.select(F.col("src").alias("word"), F.lit(1.0).alias("score"))
    base = F.lit(1.0 - damping)
    for _ in range(iters):
        score = (
            emit.join(score, emit["src"] == score["word"])
            .groupBy(F.col("dst").alias("word"))
            .agg(
                (base + F.lit(damping) * F.sum(F.col("frac") * F.col("score"))).alias(
                    "score"
                )
            )
        )
    # materialize the converged scores (vocab-sized) so the loop-invariant
    # out-fraction cache can be released before returning (the cache-release
    # hygiene the MinHash candidate path established)
    final = score.localCheckpoint(eager=True)
    emit.unpersist()
    return (
        final.select("word", F.round("score", round_to).alias("score"))
        .orderBy(F.desc("score"), F.asc("word"))
        .limit(k)
    )


def stopword_candidates(
    docs: DataFrame,
    min_df_ratio: float = 0.3,
    k: int = 40,
    round_to: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Stop-list candidates: (word, df, cf, df_ratio) for words present
    in >= min_df_ratio of documents, ordered (df_ratio desc, cf desc,
    word asc), top-k.  df = documents containing the word, cf = corpus
    occurrences — both from ONE corpus scan via a (word, doc) pre-count.
    """
    from linkgraph.textops.dedup import normalized_tokens

    wd = (
        docs.select("doc_id", F.explode(normalized_tokens(text_col)).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_word = wd.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"), F.sum("c").alias("cf")
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    ratio = F.col("df").cast("double") / F.col("n_docs")
    return (
        per_word.crossJoin(F.broadcast(total))
        .where(ratio >= F.lit(min_df_ratio))
        .select(
            F.col("w").alias("word"),
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            F.round(ratio, round_to).alias("df_ratio"),
        )
        .orderBy(F.desc("df_ratio"), F.desc("cf"), F.asc("word"))
        .limit(k)
    )
