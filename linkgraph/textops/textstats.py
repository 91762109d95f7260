"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting.  All pure JVM column expressions except
the rolling-hash fingerprint (Arrow numpy kernel) — UDF-free hot paths.

Tokenization is the shared deterministic TOKEN_RE so the DuckDB oracles
compute bit-identical values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.textops.dedup import TOKEN_RE

# tiny deterministic stopword list shared with the oracle SQL
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    quality) — quality is a deterministic [0,1] score from length/punct/
    stopword signals (a FineWeb-style heuristic filter)."""
    t = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), 0)
    n_tok = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    sw = F.filter(toks, lambda x: x.isin(STOPWORDS))
    stop_ratio = F.when(n_tok > 0, F.size(sw) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(F.length(t) > 0, n_punct / F.length(t)).otherwise(F.lit(0.0))
    avg_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    # quality: in-range token count, sane avg token length, low punct noise
    quality = (
        F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_len >= 3.0) & (avg_len <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic: (doc_id, lang_pred, en_ratio).

    Real n-gram models plug into the same shape; the heuristic form keeps
    the operator SQL-expressible for the oracle.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n_tok = F.size(toks)
    en = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    ratio = F.when(n_tok > 0, en / n_tok).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def token_count_total(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token accounting: (n_docs, total_tokens, total_chars)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    return docs.select(
        F.size(toks).alias("nt"), F.length(F.col(text_col)).alias("nc")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.sum("nc").cast("long").alias("total_chars"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling polynomial hash over
    `window`-byte windows (doc_id, fp).  Arrow numpy kernel — vectorized
    per batch, no per-row Python."""
    B = np.uint64(1000003)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def kernel(batches):
        np.seterr(over="ignore")  # uint64 wraparound is the hash semantics
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            texts = batch.column(1).to_pylist()
            fps = np.zeros(len(texts), dtype=np.uint64)
            for i, s in enumerate(texts):  # per-doc; inner loop vectorized
                b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                if b.size == 0:
                    continue
                if b.size < window:
                    h = np.uint64(0)
                    for x in b:
                        h = (h * B + x) & MASK
                    fps[i] = h
                    continue
                # rolling hash via cumulative powers (vectorized)
                n = b.size
                pw = np.ones(n, dtype=np.uint64)
                for j in range(1, n):
                    pw[j] = (pw[j - 1] * B) & MASK
                pref = np.zeros(n + 1, dtype=np.uint64)
                for j in range(n):
                    pref[j + 1] = (pref[j] * B + b[j]) & MASK
                starts = np.arange(0, n - window + 1)
                hs = (pref[starts + window] - pref[starts] * pw[window]) & MASK
                fps[i] = hs.min()
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "fp": pa.array(fps.view(np.int64), pa.int64()),
                }
            )

    return docs.select(F.col("doc_id").cast("long"), F.col(text_col)).mapInArrow(
        kernel, "doc_id long, fp long"
    )
