"""Retrieval-side text featurization: BM25 scoring and the hashing
vectorizer.

Both stay corpus-linear and engine-portable:

* `bm25_topk` is Okapi BM25 (Lucene's +1 idf form, so idf > 0 always)
  for a FIXED query-term list — the scorer a search service runs per
  query.  The corpus pays one tokenize scan; document length and term
  df/idf tables are vocabulary/constant-sized broadcasts; only the
  (doc, query-term) hits table is corpus-shaped.
* `hashing_vectorizer_stats` is the feature-hashing trick
  [Weinberger et al., ICML'09]: v[h(term) mod d] += sign(term), the
  standard alternative to a vocabulary dictionary when the vocabulary
  itself is too large to broadcast.  Dim and sign hashes reuse the
  repo's portable md5 family, so the embedding — and therefore the
  stats — are bit-identical in any engine.  Output is the per-doc
  summary (nnz, l2, argmax dim) rather than the raw vector, keeping
  the driver artifact bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.textops.dedup import normalized_tokens, portable_hash60


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 15,
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_hit_terms, score): top-k docs by Okapi BM25 for the
    fixed query `terms`, idf = ln(1 + (N - df + 0.5)/(df + 0.5)) with
    N / avgdl over token-bearing docs; ties break on doc_id asc."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(
        "doc_id", F.explode(normalized_tokens("text")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        toks.where(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            1.0
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
            F.round(F.sum("s"), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def hashing_vectorizer_stats(
    docs: DataFrame, dims: int = 64, round_to: int = 6
) -> DataFrame:
    """(doc_id, nnz, l2, top_dim): per-doc summary of the signed
    d-dimensional hashed term-frequency vector; top_dim is the argmax
    of |v| with ties to the smallest dim."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1: {dims}")
    toks = docs.select(
        "doc_id", F.explode(normalized_tokens("text")).alias("term")
    )
    dim = F.pmod(portable_hash60(F.concat(F.col("term"), F.lit("#hvdim"))), F.lit(dims))
    sign = F.when(
        F.pmod(portable_hash60(F.concat(F.col("term"), F.lit("#hvsign"))), F.lit(2))
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    vec = (
        toks.select("doc_id", dim.alias("dim"), sign.alias("sgn"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("sgn").alias("v"))
        .where(F.col("v") != 0)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.abs(F.col("v")).desc(), F.col("dim").asc()
    )
    ranked = vec.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nnz"),
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), round_to).alias("l2"),
        F.max(F.when(F.col("rn") == 1, F.col("dim"))).cast("long").alias("top_dim"),
    )


def kwic_concordance(
    docs: DataFrame, term: str, window: int = 3, text_col: str = "text"
) -> DataFrame:
    """Keyword-in-context concordance: (doc_id, pos, context) — one row
    per occurrence of `term`, pos the 1-based token index, context the
    ±window-token span joined by spaces.  One tokenize scan + a
    positional explode; `text` itself never shuffles (the context spans
    are built from the already-exploded token array in place)."""
    if not term:
        raise ValueError("term must be non-empty")
    toks = docs.select("doc_id", normalized_tokens(text_col).alias("ts"))
    hits = toks.select(
        "doc_id", "ts", F.posexplode("ts").alias("p0", "tok")
    ).where(F.col("tok") == term)
    start = F.greatest(F.lit(1), F.col("p0") + 1 - window)
    end = F.least(F.size("ts"), F.col("p0") + 1 + window)
    return hits.select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        F.concat_ws(
            " ", F.slice("ts", start, end - start + 1)
        ).alias("context"),
    )


def query_density_topk(
    docs: DataFrame, terms: list[str], k: int = 15, round_to: int = 6
) -> DataFrame:
    """(doc_id, score): top-k docs by query-term DENSITY Σtf/dl — no
    idf, no saturation; deliberately different biases from BM25 so the
    two make a meaningful fusion pair.  Ties break on doc_id asc."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(
        "doc_id", F.explode(normalized_tokens("text")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    hit = (
        toks.where(F.col("term").isin(list(terms)))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    sc = hit.join(dl, "doc_id").select(
        "doc_id",
        F.round(F.col("h") / F.col("dl").cast("double"), round_to).alias("score"),
    )
    return sc.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    kconst: int = 60,
    k: int = 15,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion [Cormack-Clarke, SIGIR'09]: fuse two
    bounded top-k lists (doc_id, score) by rrf = Σ 1/(K + rank), the
    no-training rank combiner that reliably beats either input list.
    A doc absent from one list contributes nothing for it (standard
    practice).  Ranks come from no-partition row_number windows over
    the ≤k-row input lists — bounded by construction, never corpus
    scale; ranks are integers, so the rrf doubles are identical on
    both engines.  Returns top-k (doc_id, r_a, r_b, rrf); ties break
    on doc_id.
    """
    wa = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    ra = ranked_a.select("doc_id", "score").withColumn(
        "r_a", F.row_number().over(wa)
    ).select("doc_id", "r_a")
    rb = ranked_b.select("doc_id", "score").withColumn(
        "r_b", F.row_number().over(wa)
    ).select("doc_id", "r_b")
    kc = float(kconst)
    fused = ra.join(rb, "doc_id", "full_outer").select(
        "doc_id",
        "r_a",
        "r_b",
        F.round(
            F.coalesce(1.0 / (F.lit(kc) + F.col("r_a")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(kc) + F.col("r_b")), F.lit(0.0)),
            round_to,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(k)
