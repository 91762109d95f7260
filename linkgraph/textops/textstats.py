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


def _stats_exprs(t):
    """Raw (unrounded) per-document signal expressions shared by
    text_stats and quality_filter — one source of truth for the rules."""
    toks = F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), 0)
    n_tok = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    sw = F.filter(toks, lambda x: x.isin(STOPWORDS))
    stop_ratio = F.when(n_tok > 0, F.size(sw) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(F.length(t) > 0, n_punct / F.length(t)).otherwise(F.lit(0.0))
    avg_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    return n_tok, avg_len, punct_ratio, stop_ratio


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    quality) — quality is a deterministic [0,1] score from length/punct/
    stopword signals (a FineWeb-style heuristic filter)."""
    t = F.col(text_col)
    n_tok, avg_len, punct_ratio, stop_ratio = _stats_exprs(t)
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


# BPE-ish pre-tokenization classes (GPT-2-style letter/digit/punct runs,
# minus the space-joining rule).  The three classes are disjoint and have
# no optional prefixes, so leftmost matching is unambiguous — Java regex
# (Spark) and RE2 (DuckDB) count identically by construction.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def token_count_total(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level token accounting under three tokenizers:
    (n_docs, total_tokens [word regex], total_ws_tokens [whitespace],
    total_bpe_tokens [BPE-ish letter/digit/punct runs], total_chars).
    The LLM-budgeting trio: word counts for quality stats, whitespace for
    legacy parity, BPE-ish for model-token cost estimates."""
    t = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), 0)
    ws = F.when(
        F.length(F.trim(t)) > 0, F.size(F.split(F.trim(t), r"\s+"))
    ).otherwise(F.lit(0))
    bpe = F.size(F.regexp_extract_all(F.lower(t), F.lit(BPE_RE), 0))
    return docs.select(
        F.size(toks).alias("nt"),
        ws.alias("nw"),
        bpe.alias("nb"),
        F.length(t).alias("nc"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.sum("nw").cast("long").alias("total_ws_tokens"),
        F.sum("nb").cast("long").alias("total_bpe_tokens"),
        F.sum("nc").cast("long").alias("total_chars"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, score) with
    score = tf · ln(N/df), rounded to 6 before ranking.

    Plan shape at corpus scale:

    * the token explode carries only (doc_id, term) — the text column is
      pruned before the shuffle;
    * tf is a partial+final count on (doc_id, term) — map-side combine
      collapses each partition's repeats before the exchange;
    * df aggregates the tf table (already one row per (doc, term)), so the
      document-frequency table is |vocabulary| rows — a broadcastable dim
      for the score join on any natural-language corpus;
    * ranking ties are broken on the ROUNDED score then term — exact
      mathematical ties (e.g. 2·ln(25) = ln(625)) may differ by 1 ulp
      across engines, but agree after round-6, so the top-k frontier is
      engine-portable;
    * the per-document top-k filter compiles to WindowGroupLimit: each
      partition forwards at most k rows per doc_id to the final rank.

    N (corpus size) is a bounded scalar driver action.
    """
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "score"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("doc_id").cast("long").alias("doc_id"), "term", "tf", "score")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style corpus-LM quality score: per document the mean token
    log-probability under the corpus's own unigram MLE,

        lm_logprob(d) = (1/|d|) * sum_t ln(cnt(t)/T)
                      = (sum_t tf_d(t)*ln(cnt(t))) / |d|  -  ln(T)

    (t ranges over d's distinct terms, cnt = corpus term count, T =
    corpus token total).  Documents made of rare/garbled tokens score
    far more negative than documents of common well-formed words — the
    classic perplexity-bucket filter, with the corpus itself as the LM
    so no external model ships.  Returns (doc_id, n_tokens, lm_logprob
    rounded 6); zero-token documents are absent (no distribution to
    score them under).

    Scale shape: the explode carries only (doc_id, term) — text is
    pruned before any shuffle; tf is a partial+final count; the unigram
    table aggregates tf (|vocabulary| rows — the broadcastable dim of
    tfidf_topk); the score is ONE aggregate per doc over the tf join;
    T is a bounded scalar driver action."""
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    uni = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = int(uni.agg(F.sum("cnt")).first()[0] or 0)
    if total == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_tokens long, lm_logprob double"
        )
    return (
        tf.join(uni, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.log(F.col("cnt"))).alias("s"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_tokens",
            F.round(
                F.col("s") / F.col("n_tokens") - F.log(F.lit(float(total))), 6
            ).alias("lm_logprob"),
        )
    )


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling polynomial hash over
    `window`-byte windows (doc_id, fp).

    Arrow numpy kernel, fully vectorized ACROSS the batch: the utf-8 bytes
    of every document in the Arrow batch are processed as one flat buffer
    (zero-copy from the StringArray data buffer).  The rolling hash
    h(a) = Σ b[k]·B^(a+w-1-k) over window [a, a+w) is computed globally via
    the modular-inverse prefix form

        P[j] = Σ_{k<j} b[k]·B^(-k)   (mod 2^64, B odd ⇒ invertible)
        h(a) = (P[a+w] - P[a]) · B^(a+w-1)

    so there are no per-byte or per-document Python loops; per-document
    minima come from one np.minimum.reduceat over the valid window starts.
    Values are bit-identical to the textbook per-document rolling hash.
    """
    B_INT = 1000003
    B = np.uint64(B_INT)
    INV_B = np.uint64(pow(B_INT, -1, 1 << 64))

    def kernel(batches):
        np.seterr(over="ignore")  # uint64 wraparound is the hash semantics
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            col = batch.column(1)
            if col.null_count:
                col = col.fill_null("")
            col = col.cast(pa.large_string())
            # zero-copy views of the Arrow offsets + utf-8 data buffers
            offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
                col.offset : col.offset + len(col) + 1
            ]
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8).astype(np.uint64)
            fps = np.zeros(len(col), dtype=np.uint64)
            ntot = data.size
            if ntot:
                # global powers B^k and B^-k (cumprod wraps mod 2^64)
                pw = np.empty(ntot, dtype=np.uint64)
                ipw = np.empty(ntot, dtype=np.uint64)
                pw[0] = 1
                ipw[0] = 1
                if ntot > 1:
                    np.cumprod(np.full(ntot - 1, B, dtype=np.uint64), out=pw[1:])
                    np.cumprod(np.full(ntot - 1, INV_B, dtype=np.uint64), out=ipw[1:])
                pref = np.zeros(ntot + 1, dtype=np.uint64)
                np.cumsum(data * ipw, out=pref[1:])

                starts_off = offsets[:-1]
                ends_off = offsets[1:]
                lens = ends_off - starts_off
                # effective window per doc: min(window, len) — short docs
                # hash their full byte string (same textbook formula)
                w_eff = np.minimum(lens, window)
                nonempty = lens > 0
                n_win = np.where(nonempty, lens - w_eff + 1, 0)
                # all valid global window-start positions, grouped by doc:
                # repeat each doc's start offset, add 0..n_win-1
                doc_idx = np.repeat(np.arange(len(col)), n_win)
                local = np.arange(n_win.sum(), dtype=np.int64) - np.repeat(
                    np.cumsum(n_win) - n_win, n_win
                )
                a = starts_off[doc_idx] + local
                e = a + w_eff[doc_idx]
                h = (pref[e] - pref[a]) * pw[e - 1]
                if h.size:
                    bounds = np.cumsum(n_win) - n_win
                    mins = np.minimum.reduceat(h, bounds[nonempty])
                    fps[nonempty] = mins
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "fp": pa.array(fps.view(np.int64), pa.int64()),
                }
            )

    return docs.select(F.col("doc_id").cast("long"), F.col(text_col)).mapInArrow(
        kernel, "doc_id long, fp long"
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition / format quality signals:
    (doc_id, n_lines, dup_line_ratio, top_bigram_ratio, bullet_line_ratio,
    ellipsis_line_ratio, flagged).

    * dup_line_ratio — fraction of non-blank lines that are repeats of
      another line in the same document (1 - distinct/total).
    * top_bigram_ratio — fraction of word-bigram occurrences taken by the
      single most frequent bigram.  Computed as a fold over the SORTED
      bigram array (longest equal run == max multiplicity), so the whole
      operator is a pure projection: zero shuffle, zero explode — each
      document is scored where it already sits, which is the only shape
      that holds at corpus scale.
    * bullet/ellipsis line ratios — the Rae et al. (Gopher, 2021) format
      heuristics for list-like / truncated scrape artifacts.
    * flagged — the published Gopher thresholds (dup lines > 0.30,
      top bigram > 0.18, bullets > 0.90, ellipsis > 0.30).

    All ratios are exact integer-count divisions rounded to 4, so the
    DuckDB oracle reproduces them bit-for-bit.
    """
    t = F.col(text_col)
    n_lines, dup_r, top_r, bul_r, ell_r = _repetition_exprs(t)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_lines.cast("long").alias("n_lines"),
        dup_r.alias("dup_line_ratio"),
        top_r.alias("top_bigram_ratio"),
        bul_r.alias("bullet_line_ratio"),
        ell_r.alias("ellipsis_line_ratio"),
        (
            (dup_r > 0.30) | (top_r > 0.18) | (bul_r > 0.90) | (ell_r > 0.30)
        ).alias("flagged"),
    )


def _repetition_exprs(t):
    """Rounded-4 Gopher repetition/format ratios shared by
    repetition_stats and quality_filter."""
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    dup_ratio = F.when(n_lines > 0, (n_lines - n_dist) / n_lines).otherwise(F.lit(0.0))
    bullets = F.size(F.filter(lines, lambda x: x.rlike("^[-*•]")))
    ellipsis = F.size(F.filter(lines, lambda x: x.rlike("(\\.\\.\\.|…)$")))
    bullet_ratio = F.when(n_lines > 0, bullets / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, ellipsis / n_lines).otherwise(F.lit(0.0))

    toks = F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), 0)
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.sort_array(
            F.transform(
                F.sequence(F.lit(1), n_tok - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # longest equal run in the sorted array = multiplicity of the mode
    run = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_big = F.size(bigrams)
    top_big = F.when(n_big > 0, run / n_big).otherwise(F.lit(0.0))

    dup_r = F.round(dup_ratio, 4)
    top_r = F.round(top_big, 4)
    bul_r = F.round(bullet_ratio, 4)
    ell_r = F.round(ellipsis_ratio, 4)
    return n_lines, dup_r, top_r, bul_r, ell_r


def quality_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite C4/Gopher-style keep/reject decision per document:
    (doc_id, keep, reason) with reason = the FIRST failing rule in a
    fixed audit order (deterministic, so rejection accounting is stable
    across engines and reruns):

        too_few_tokens | too_many_tokens | bad_avg_token_len |
        high_punct | gopher_repetition | ok

    Thresholds are the same ones text_stats' quality score and
    repetition_stats' flagged bit already use — this operator is the
    pipeline composition of both rule sets into one decision column.

    Scale shape: ONE zero-shuffle projection (both signal families are
    pure expressions over the text column; the document is scored where
    it already sits — no join of two stat tables, no second corpus
    scan)."""
    t = F.col(text_col)
    n_tok, avg_len, punct_ratio, _ = _stats_exprs(t)
    _, dup_r, top_r, bul_r, ell_r = _repetition_exprs(t)
    rep_flag = (dup_r > 0.30) | (top_r > 0.18) | (bul_r > 0.90) | (ell_r > 0.30)
    reason = (
        F.when(n_tok < 5, F.lit("too_few_tokens"))
        .when(n_tok > 100000, F.lit("too_many_tokens"))
        .when((avg_len < 3.0) | (avg_len > 12.0), F.lit("bad_avg_token_len"))
        .when(punct_ratio > 0.2, F.lit("high_punct"))
        .when(rep_flag, F.lit("gopher_repetition"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    max_df_pct: int = 78,
    min_shared: int = 1,
    topk: int | None = None,
    round_to: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Sparse all-pairs document similarity: (a, b, shared, sim) with
    a < b, sim = cosine of the docs' TF-IDF vectors over the df-capped
    vocabulary.  The SPARSE complement of the dense-embedding ANN paths
    in simsearch.py — semantic near-dup candidates without any embedding
    model in the loop.

    Scale posture — the inverted-index (DISCO/all-pairs-similarity)
    shape, never a doc×doc cross join:

    * vocabulary cap: terms appearing in MORE than max_df_pct% of docs
      are dropped (sklearn's max_df contract).  Per-term join fanout is
      df², so the cap bounds the candidate blow-up exactly where it
      explodes — stop-word-ish terms that carry ~0 TF-IDF weight anyway.
      The cap threshold is computed with INTEGER arithmetic
      (n_docs·pct // 100) so both engines cut the same vocabulary;
      df >= 2 additionally drops hapax terms that cannot produce a pair
      but would ride the weight join;
    * both the dot product AND the norms range over the same capped
      vocabulary, so sim is a true cosine of the capped vectors
      (self-consistent; norms over the full vocab would deflate scores
      by mass that can never match);
    * the dot product is one partial+final SUM on the term join — the
      only quadratic-bounded stage, and the df cap is its contract;
    * determinism: sim rounds to `round_to` before ranking; the top-k
      order breaks ties on (shared, a, b), so cross-engine float
      summation order cannot flip ranks.

    N (corpus size) is a bounded scalar driver action.
    """
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    df_cap = n_docs * max_df_pct // 100
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= df_cap))
    )
    w = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).alias("dot"),
            F.count(F.lit(1)).alias("shared"),
        )
        .where(F.col("shared") >= min_shared)
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("nrm").alias("nb"))
    out = (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").cast("long").alias("a"),
            F.col("db").cast("long").alias("b"),
            F.col("shared").cast("long").alias("shared"),
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), round_to).alias("sim"),
        )
    )
    if topk is not None:
        out = out.orderBy(
            F.col("sim").desc(),
            F.col("shared").desc(),
            F.col("a").asc(),
            F.col("b").asc(),
        ).limit(topk)
    return out


def bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-bigram LM quality score with add-one smoothing: per
    document the mean conditional token log-probability

        lm2_logprob(d) = (1/(|d|−1)) · Σ_i ln P(w_i | w_{i−1}),
        P(v|u) = (c(u,v) + 1) / (c(u,·) + V)

    (c = corpus bigram counts, c(u,·) = u's total as a bigram left, V =
    unigram vocabulary size — Laplace smoothing so unseen continuations
    score finitely).  The word-order-aware step up from
    `unigram_logprob`: shuffled or templated text keeps its unigram
    score but collapses here — the second CCNet-style filter signal.
    Returns (doc_id, n_bigrams, lm2_logprob rounded 6); documents with
    fewer than 2 tokens are absent (no transition to score).

    Scale shape: bigrams come from slice+arrays_zip over the token
    array (codegen, text pruned before the explode shuffles (doc_id,
    u, v) rows); corpus counts aggregate the per-doc tf table; the
    left-marginal table is ≤|vocabulary| rows (broadcastable dim); V is
    a bounded scalar driver action; ONE aggregate per doc.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n = F.size(toks)
    bg = docs.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 2,
                F.arrays_zip(
                    F.slice(toks, 1, n - 1).alias("u"),
                    F.slice(toks, 2, n - 1).alias("v"),
                ),
            ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
        ).alias("p"),
    ).select("doc_id", F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    tf2 = bg.groupBy("doc_id", "u", "v").agg(F.count(F.lit(1)).alias("tf"))
    cuv = tf2.groupBy("u", "v").agg(F.sum("tf").alias("cuv"))
    cu = cuv.groupBy("u").agg(F.sum("cuv").alias("cu"))
    vocab = int(
        docs.select(F.explode(toks).alias("t")).agg(F.countDistinct("t")).first()[0]
        or 0
    )
    return (
        tf2.join(cuv, ["u", "v"])
        .join(cu, "u")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(
                F.col("tf")
                * F.log(
                    (F.col("cuv") + F.lit(1.0)) / (F.col("cu") + F.lit(float(vocab)))
                )
            ).alias("s"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_bigrams",
            F.round(F.col("s") / F.col("n_bigrams"), 6).alias("lm2_logprob"),
        )
    )


def source_quality_rollup(docs: DataFrame, round_to: int = 6) -> DataFrame:
    """Per-source corpus triage: (source, n_docs, n_dup_docs, dup_rate,
    mean_tokens, mean_lm) — the "which crawl/ingest sources are
    garbage?" report a training-data pipeline runs before weighting or
    dropping sources: exact-duplicate membership rate (docs whose
    content digest appears more than once ANYWHERE in the corpus — a
    mirror-heavy source scores high even when its dup partners live
    elsewhere) and the mean corpus-LM quality score.

    Composition of the exact-dedup digest layer and `unigram_logprob`;
    the digest count and the LM table are both ≤|corpus|-row sides
    joined back on doc_id/digest, then ONE rollup per source.  mean_lm
    averages the ROUNDED per-doc scores the lm_quality query itself
    exposes, so the rollup is engine-portable for the usual reason
    (identical inputs, one division, round).  Zero-token docs hold NULL
    lm and drop out of the mean (AVG skips NULLs in any engine).
    """
    d = docs.select(
        "doc_id", "source", F.sha2(F.col("text"), 256).alias("digest")
    )
    digc = d.groupBy("digest").agg(F.count(F.lit(1)).alias("nd"))
    lm = unigram_logprob(docs).select("doc_id", "n_tokens", "lm_logprob")
    per_doc = (
        d.join(digc, "digest")
        .join(lm, "doc_id", "left")
        .select(
            "source",
            (F.col("nd") > 1).cast("int").alias("is_dup"),
            "n_tokens",
            "lm_logprob",
        )
    )
    n = F.count(F.lit(1))
    return per_doc.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        F.round(F.sum("is_dup") / n.cast("double"), round_to).alias("dup_rate"),
        F.round(F.avg("n_tokens"), round_to).alias("mean_tokens"),
        F.round(F.avg("lm_logprob"), round_to).alias("mean_lm"),
    )


def zipf_fit(docs: DataFrame, text_col: str = "text", round_to: int = 6) -> DataFrame:
    """Corpus rank-frequency power-law fit: one row (vocab, total_tokens,
    zipf_slope) with zipf_slope the least-squares slope of ln(cnt) on
    ln(rank) — Zipf's law predicts ≈ −1 on natural language; a corpus
    drifting far off (template spam, token salad, truncated crawls) is
    the cheapest corpus-level health signal there is.

    rank = row_number over (cnt DESC, term ASC) on the VOCABULARY table —
    a |vocab|-row dim (the tfidf df table), so the single-partition rank
    window is bounded by the vocabulary, never the corpus; the closed-
    form slope is exact sums + ONE division + round.  The (cnt, term)
    order makes ranks — and therefore the fit — engine-portable.
    """
    tokens = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term")
    )
    uni = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = uni.select(
        "cnt",
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            round_to,
        ).alias("zipf_slope"),
    )


def ngram_novelty(
    docs: DataFrame, k: int = 3, round_to: int = 6, text_col: str = "text"
) -> DataFrame:
    """Per-document n-gram novelty: (doc_id, n_grams, n_novel, novelty)
    where n_grams counts the doc's DISTINCT k-token spans and n_novel
    those appearing in NO other document (corpus df = 1) — the inverse
    of the shared-span dedup signal: novelty ≈ 0 flags boilerplate /
    template bodies even when no single partner crosses a near-dup
    threshold, novelty ≈ 1 certifies original text.  The span-level
    complement of `source_quality_rollup`'s whole-doc digest rate.

    Same vectorized span enumeration + per-doc DISTINCT as
    `shared_ngram_spans` (codegen, text pruned pre-shuffle); the df
    table aggregates the postings once; one count-sum per doc; ratio is
    ONE division + round.  Docs shorter than k tokens are absent.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    n_spans = F.size(toks) - F.lit(k - 1)
    grams = (
        docs.select(
            "doc_id",
            F.explode(
                F.when(
                    n_spans >= 1,
                    F.transform(
                        F.sequence(F.lit(1), n_spans),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .distinct()
    )
    dfq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(dfq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel") / F.col("n_grams").cast("double"), round_to
            ).alias("novelty"),
        )
    )


def char_entropy(docs: DataFrame, text_col: str = "text", round_to: int = 6) -> DataFrame:
    """Per-document character-level Shannon entropy (nats):
    (doc_id, n_chars, entropy) with the algebraic form

        H = ln(n) − (Σ_c cnt_c · ln cnt_c) / n

    over the doc's own character histogram — the classic garbled-text /
    base64-blob / key-dump detector (natural language sits ~2.9–3.3
    nats; random base64 ≫; "aaaa…" → 0), complementing the word-level
    stats (a base64 blob is ONE long "word" and sails through token
    ratios).

    The explode ships (doc_id, char) narrow rows; counts map-side
    combine; ONE aggregate per doc; the LN sum is absorbed by one
    division + round (the transition-entropy argument).  Empty documents
    are absent.
    """
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).where(F.col("ch") != "")
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return cnt.groupBy("doc_id").agg(
        n.cast("long").alias("n_chars"),
        F.round(
            F.log(n.cast("double")) - F.sum(F.col("c") * F.log("c")) / n,
            round_to,
        ).alias("entropy"),
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_chars", "entropy"
    )


def ctfidf_topk(
    docs: DataFrame, group_col: str = "source", k: int = 5, text_col: str = "text"
) -> DataFrame:
    """Class-based TF-IDF (BERTopic's c-TF-IDF, public formulation): the
    top-k characteristic terms PER GROUP, scoring each term by its
    in-group frequency against its cross-group spread,

        score(t, g) = tf_g(t) · ln(G / gf(t))

    (tf_g = term count inside group g, gf = number of groups containing
    t, G = group count) — "what does each source/cluster talk about?",
    the labeling step after any clustering.

    Same shape as tfidf_topk with groups in place of documents: the
    explode ships (group, term) narrow rows, the group-frequency table
    is a ≤|vocab|-row broadcastable dim, ranking ties break on the
    ROUNDED score then term (WindowGroupLimit per group).  G is a
    bounded scalar.
    """
    tokens = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    gf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("gf"))
    n_groups = docs.select(group_col).distinct().count()
    scored = tf.join(gf, "term").select(
        "grp",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.round(
            F.col("tf") * F.log(F.lit(float(n_groups)) / F.col("gf")), 6
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(F.col("grp").alias(group_col), "term", "tf", "score")
    )


def corpus_composition(docs: DataFrame, round_to: int = 6) -> DataFrame:
    """Corpus composition report: per (lang, source) cell the document
    count, token mass, and share of the corpus — the first table a
    training-data curator reads before setting mixture weights.
    One scan, one aggregate; shares are single divisions of exact
    integers (round-6).
    """
    toks = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0))
    per = docs.select("lang", "source", toks.alias("nt"))
    total = per.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("nt").alias("tt")
    )
    return (
        per.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.col("nd").cast("double"), round_to).alias(
                "doc_share"
            ),
            F.round(F.col("n_tokens") / F.col("tt").cast("double"), round_to).alias(
                "token_share"
            ),
        )
    )


def fertility_by_lang(docs: DataFrame, round_to: int = 6) -> DataFrame:
    """Tokenizer-budget report per language: (lang, n_docs, n_words,
    n_bpe_tokens, fertility, chars_per_token) where fertility =
    BPE-ish tokens per whitespace word and chars_per_token = chars per
    BPE-ish token — the two numbers that decide how much of a model's
    context window (and training budget) each language actually costs.
    High-fertility languages are systematically under-served at a fixed
    token budget; this is the table that quantifies it before setting
    mixture weights (the companion to `corpus_composition`).

    ONE scan + one ≤|langs|-row aggregate; counts are exact integers
    under the shared BPE_RE / whitespace conventions of
    `token_count_total`, ratios are single divisions + round.
    """
    t = F.col("text")
    ws = F.when(
        F.length(F.trim(t)) > 0, F.size(F.split(F.trim(t), r"\s+"))
    ).otherwise(F.lit(0))
    bpe = F.size(F.regexp_extract_all(F.lower(t), F.lit(BPE_RE), 0))
    per = docs.select(
        "lang", ws.alias("nw"), bpe.alias("nb"), F.length(t).alias("nc")
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("nb").cast("long").alias("n_bpe_tokens"),
        F.round(F.sum("nb") / F.sum("nw").cast("double"), round_to).alias(
            "fertility"
        ),
        F.round(F.sum("nc") / F.sum("nb").cast("double"), round_to).alias(
            "chars_per_token"
        ),
    )


def mixture_weights(
    docs: DataFrame, alpha: float = 0.5, round_to: int = 6
) -> DataFrame:
    """Temperature-scaled training-mixture weights per language
    (the mT5/XLM-R sampling rule): the sampling probability is
    p_l ∝ share_l^alpha, i.e. raw token shares flattened toward uniform
    by the temperature alpha in [0, 1] (alpha=1 keeps natural shares,
    alpha=0 is uniform-over-languages).  Emits, per language, the raw
    token share, the smoothed sampling share, and the upsample factor
    smoothed/raw — the epochs multiplier each language's data receives
    at a fixed token budget.

    One corpus scan -> ≤|langs|-row aggregate -> a broadcastable
    two-level normalization: POW is IEEE-identical across engines for
    the oracle, and everything after the scan is driver-trivial.
    """
    toks = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0))
    per = docs.select("lang", toks.alias("nt")).groupBy("lang").agg(
        F.sum("nt").cast("double").alias("nt")
    )
    tot = per.agg(F.sum("nt").alias("tt"))
    shares = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("nt").cast("long").alias("n_tokens"),
        (F.col("nt") / F.col("tt")).alias("raw"),
        F.pow(F.col("nt") / F.col("tt"), F.lit(float(alpha))).alias("pw"),
    )
    z = shares.agg(F.sum("pw").alias("z"))
    return shares.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_tokens",
        F.round("raw", round_to).alias("raw_share"),
        F.round(F.col("pw") / F.col("z"), round_to).alias("sample_share"),
        F.round(F.col("pw") / F.col("z") / F.col("raw"), round_to).alias(
            "upsample"
        ),
    )


def dsir_logratio(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance-resampling weight per document [Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS 2023]: the per-token mean log-likelihood RATIO between a
    target-domain unigram LM and the raw-corpus unigram LM,

        dsir_logratio(d) = (1/|d|) * sum_t tf_d(t) * [ln p_tgt(t) - ln p_raw(t)]

    with add-1 smoothing over the raw corpus vocabulary for both models
    (so target-unseen tokens are defined).  Sampling documents with
    probability proportional to exp(weight) tilts a raw crawl toward the
    target domain — the standard pretraining data-selection signal.  The
    target here is a column predicate (e.g. lang='en'); at scale it
    would be a curated seed corpus registered as another table, same
    plan.

    Plan: ONE token scan feeds both models (the target count is a
    conditional sum inside the same |vocab|-row aggregate — no second
    pass), the smoothing totals are three bounded scalars, and the score
    is one aggregate per doc over the tf ⋈ vocab join (vocab is the
    broadcastable dim, as in tfidf/lm_quality).  Constants factor out of
    the per-token mean:  score = Σ tf·(ln(c_tgt+1) − ln(c_raw+1))/|d|
    + ln(T_raw+V) − ln(T_tgt+V).  ln/round-6 portability per the
    PMI/TF-IDF convention; zero-token documents are absent.
    """
    tokens = docs.select(
        "doc_id",
        F.when(F.col(target_col) == target_value, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_tgt"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    uni = tokens.groupBy("term").agg(
        F.count(F.lit(1)).alias("c_raw"), F.sum("is_tgt").alias("c_tgt")
    )
    t_raw, t_tgt, v = uni.agg(
        F.sum("c_raw"), F.sum("c_tgt"), F.count(F.lit(1))
    ).first()
    if not v:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_tokens long, dsir_logratio double"
        )
    const = float(np.log(float(t_raw) + v) - np.log(float(t_tgt) + v))
    return (
        tf.join(uni, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("tf")
                * (F.log(F.col("c_tgt") + 1) - F.log(F.col("c_raw") + 1))
            ).alias("s"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "n_tokens",
            F.round(
                F.col("s") / F.col("n_tokens") + F.lit(const), round_to
            ).alias("dsir_logratio"),
        )
    )


def readability(
    docs: DataFrame, round_to: int = 6, text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document: (doc_id, n_words, n_sentences,
    n_syllables, flesch).

    flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
    [Flesch 1948; Kincaid et al. 1975] with the standard deterministic
    proxies a corpus-scale pipeline uses: words = `[a-z0-9]+` tokens
    (the package tokenizer), sentences = runs of terminal punctuation
    `[.!?]+` clamped to >= 1, syllables = vowel-group runs `[aeiouy]+`
    in the lowercased text (token boundaries break groups, so this is
    the per-word vowel-group sum without a per-word explode).

    Readability buckets are a routine quality-filter signal (e.g.
    filtering degenerate boilerplate that scores far outside human
    prose ranges).  Scale shape: three regexp counters in one
    projection — single corpus scan, no shuffle, no UDF.  Documents
    with zero words get NULL flesch (nothing to score) rather than a
    sentinel.
    """
    t = F.col(text_col)
    words = F.size(F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), 0))
    sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)), F.lit(1)
    )
    syll = F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), 0))
    flesch = F.when(
        words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents)
        - F.lit(84.6) * (syll.cast("double") / words),
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syll.cast("long").alias("n_syllables"),
        F.round(flesch, round_to).alias("flesch"),
    )


def heaps_fit(docs: DataFrame, text_col: str = "text", round_to: int = 6) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: one row (n_docs, total_tokens,
    vocab, heaps_beta) with heaps_beta the least-squares slope of
    ln V(t) on ln t over per-document checkpoints — V(t) the number of
    DISTINCT words seen in the first t tokens of the corpus read in
    doc_id order.  Natural text sits near β ≈ 0.5; template spam or a
    truncated vocabulary pushes it far off — the companion health check
    to `zipf_fit` (rank-frequency vs growth views of the same law).

    Scale shape — the corpus-order prefix is NEVER materialized:
      1. per-doc token counts (one scan, map-side combine);
      2. first-occurrence doc per word = min(doc_id) per term — the
         vocabulary table again;
      3. both collapse to PER-DOC checkpoint rows (cumulative tokens,
         cumulative new vocab) via running sums over the DOC table,
         computed with packing.py's two-phase prefix sum (range
         repartition + per-partition cumsum + broadcast offsets) — no
         single-partition window anywhere, even over 10^9 docs;
      4. closed-form OLS on (ln t, ln V): exact integer sums until the
         final division + round.
    Docs whose running vocab is still 0 (possible only while every
    prefix doc is empty) are excluded from the fit by the ln guard.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    )
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    first_doc = toks.groupBy("term").agg(F.min("doc_id").alias("doc_id"))
    new_vocab = first_doc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nv"))
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    base = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(new_vocab, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("nt", F.lit(0)).alias("nt"),
            F.coalesce("nv", F.lit(0)).alias("nv"),
        )
    )
    # running sums WITHOUT a global single-partition window (|docs| rows
    # through one task at 10^9 docs): packing.py's two-phase prefix sum —
    # range-repartition on doc_id, per-partition cumulative window, then
    # per-partition totals (≤P rows, collected) broadcast back as offsets.
    spark = docs.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        base.repartitionByRange(p, F.col("doc_id").asc())
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = {
        r["pid"]: (r["t"], r["v"])
        for r in parts.groupBy("pid")
        .agg(F.sum("nt").alias("t"), F.sum("nv").alias("v"))
        .collect()
    }
    offsets, at, av = {}, 0, 0
    for pid in sorted(totals):
        offsets[pid] = (at, av)
        at += totals[pid][0]
        av += totals[pid][1]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(t), int(v)) for k, (t, v) in offsets.items()],
            "pid int, offt long, offv long",
        )
    )
    w = Window.partitionBy("pid").orderBy(F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    chk = (
        parts.join(off_df, "pid")
        .select(
            (F.sum("nt").over(w) + F.col("offt")).alias("ct"),
            (F.sum("nv").over(w) + F.col("offv")).alias("cv"),
        )
        .where((F.col("ct") > 0) & (F.col("cv") > 0))
    )
    pts = chk.select(
        "ct",
        "cv",
        F.log(F.col("ct").cast("double")).alias("x"),
        F.log(F.col("cv").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("ct").cast("long").alias("total_tokens"),
        F.max("cv").cast("long").alias("vocab"),
        F.round(
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            round_to,
        ).alias("heaps_beta"),
    )


def source_vocab_overlap(
    docs: DataFrame, text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: (src_a, src_b,
    vocab_a, vocab_b, n_common, jac) for src_a < src_b — the corpus-
    comparison view of duplication (do two crawls speak the same
    vocabulary?), complementing the doc-level containment/near-dup ops.

    One tokenize scan collapses to the (source, term) DISTINCT table;
    the pairwise intersection is a term-keyed equi-join — the source
    count is a handful, so pair rows stay tiny while the join itself
    remains corpus-linear."""
    sv = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("term"),
    ).distinct()
    sz = sv.groupBy("source").agg(F.count(F.lit(1)).alias("vocab"))
    a, b = sv.alias("a"), sv.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sza = sz.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    szb = sz.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sza), "src_a")
        .join(F.broadcast(szb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")).cast(
                    "double"
                ),
                round_to,
            ).alias("jac"),
        )
    )


def eb_smoothed_long_doc_rates(
    docs: DataFrame, prior_strength: float = 20.0, round_to: int = 6
) -> DataFrame:
    """Empirical-Bayes smoothed per-source long-document rates: the
    fraction of a source's docs longer than the GLOBAL median length,
    shrunk toward the corpus-wide rate with `prior_strength` pseudo-
    observations — smoothed = (x + τ·g) / (n + τ).  This is the
    small-sample-safe ranking a pipeline needs before up/down-weighting
    sources: a 3-doc source with 3 long docs must NOT outrank a
    10,000-doc source at 95% (raw rates say it does; the shrunk rate
    says otherwise).  Fixed-τ pseudo-count prior keeps the estimator
    deterministic and oracle-expressible (method-of-moments α,β adds a
    variance estimate but no ranking power at this granularity).

    Returns (source, n_docs, n_long, raw_rate, smoothed_rate).  Plan:
    one exact global median (swap approx_percentile at 100 TB, same
    shape), one broadcast scalar, one source rollup — a single shuffle.
    Strictly-greater comparison against the median on the integer
    n_chars column is engine-exact."""
    med = docs.agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    flagged = docs.crossJoin(F.broadcast(med)).select(
        "source", (F.col("n_chars") > F.col("med")).cast("long").alias("is_long")
    )
    per_src = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_long").cast("long").alias("n_long"),
    )
    glob = per_src.agg(
        (F.sum("n_long") / F.sum("n_docs")).alias("g")
    )
    tau = F.lit(float(prior_strength))
    return per_src.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        "n_long",
        F.round(F.col("n_long") / F.col("n_docs"), round_to).alias("raw_rate"),
        F.round(
            (F.col("n_long") + tau * F.col("g")) / (F.col("n_docs") + tau),
            round_to,
        ).alias("smoothed_rate"),
    )


def source_kl_divergence(docs: DataFrame, round_to: int = 6) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution:
    D(P_s ‖ Q) = Σ_w P_s(w)·ln(P_s(w)/Q(w)) over the corpus vocabulary,
    with add-1 smoothing on the source side (P_s(w) = (n_sw + 1) /
    (N_s + V)) so absent words contribute finitely — the information-
    theoretic "how far does this source's language drift from the
    corpus?" readout that vocabulary Jaccard (source_vocab_overlap)
    cannot give (overlap ignores frequency shape).

    Returns (source, n_tokens, vocab_hits, kl).  Plan: ONE corpus scan
    → (source, word) counts; corpus totals by rollup; the dense
    source×vocab scaffold (|S|·V rows, |S| is a handful) carries the
    absent-word terms via a left join.  Sums of per-word doubles differ
    in association order between engines → kl rounded to 1e-6."""
    tok = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
        ).alias("w"),
    )
    sw = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_sw")
    )
    corpus = sw.groupBy("w").agg(F.sum("n_sw").cast("long").alias("n_w"))
    totals = sw.groupBy("source").agg(F.sum("n_sw").cast("long").alias("n_s"))
    consts = corpus.agg(
        F.sum("n_w").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    dense = (
        totals.crossJoin(corpus)
        .join(sw, ["source", "w"], "left")
        .withColumn("n_sw", F.coalesce(F.col("n_sw"), F.lit(0)))
        .crossJoin(F.broadcast(consts))
    )
    p = (F.col("n_sw") + 1) / (F.col("n_s") + F.col("v")).cast("double")
    q = F.col("n_w") / F.col("n_total").cast("double")
    per_word = dense.select(
        "source",
        "n_s",
        (F.col("n_sw") > 0).cast("long").alias("hit"),
        (p * F.log(p / q)).alias("term"),
    )
    return per_word.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.sum("hit").cast("long").alias("vocab_hits"),
        F.round(F.sum("term"), round_to).alias("kl"),
    )


def ks_drift(
    docs: DataFrame, round_to: int = 6, crit_c: float = 1.358
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test, each source vs the
    pooled REST of the corpus, over the doc-length distribution — the
    continuous-distribution sibling of chi_square (categorical) and
    psi_drift (binned): D_s = max_l |F_s(l) − F_rest(l)| with the
    α=0.05 critical value c·√(N/(n_s·(N−n_s))), c = 1.358.

    One-vs-rest needs NO second scan: F_rest = (cum_all − cum_s) /
    (N − n_s), so the pooled CDF lane is derived algebraically from the
    same scaffold.  Plan: one (source, length) rollup, a zero-filled
    |S|·|L| scaffold (L = DISTINCT length values — bounded by the value
    domain, not corpus size), per-source cumulative windows
    (partitioned — never a global sort), cum_all as a partition-by-l
    window sum of the per-source cums, and a per-source argmax on the
    ROUNDED gap with smallest-l tiebreak (the cusum lesson).  All CDFs
    are ratios of exact integer cums, so both engines compare identical
    doubles.  Returns (source, n_s, ks, at_len, crit, drifted).
    """
    from pyspark.sql import Window

    per = docs.groupBy("source", F.col("n_chars").alias("l")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ls = per.select("l").distinct()
    srcs = per.groupBy("source").agg(F.sum("n").cast("long").alias("n_s"))
    filled = (
        srcs.crossJoin(ls)
        .join(per, ["source", "l"], "left")
        .select(
            "source", "l", "n_s", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    cum = filled.withColumn(
        "cs",
        F.sum("n").over(Window.partitionBy("source").orderBy("l")).cast("long"),
    ).withColumn("call", F.sum("cs").over(Window.partitionBy("l")).cast("long"))
    tot = srcs.agg(F.sum("n_s").cast("long").alias("nn"))
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "source",
        "l",
        "n_s",
        "nn",
        F.round(
            F.abs(
                F.col("cs") / F.col("n_s")
                - (F.col("call") - F.col("cs"))
                / (F.col("nn") - F.col("n_s")).cast("double")
            ),
            round_to,
        ).alias("gap"),
    )
    pick = Window.partitionBy("source").orderBy(
        F.col("gap").desc(), F.col("l").asc()
    )
    crit = F.round(
        F.lit(float(crit_c))
        * F.sqrt(
            F.col("nn")
            / (F.col("n_s") * (F.col("nn") - F.col("n_s"))).cast("double")
        ),
        round_to,
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "source",
            "n_s",
            F.col("gap").alias("ks"),
            F.col("l").alias("at_len"),
            crit.alias("crit"),
            (F.col("gap") > crit).cast("int").alias("drifted"),
        )
    )
