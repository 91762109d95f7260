"""Distributed BPE merge-rule training statistics [Sennrich et al.,
ACL'16 §3].

`bpe_merge_table` computes the first `num_merges` byte-pair-encoding
merge rules over the corpus — the statistic a tokenizer trainer needs —
returning one row per learned rule: (merge_rank, pair, merged, cnt).

Scale shape (the reason this is corpus-feasible at 100 TB):
* ONE corpus-scale pass: the word-frequency rollup (tokens lowered,
  `[a-z0-9]+`, the repo-wide convention).  Everything after runs on the
  DISTINCT-WORD table — vocabulary-sized (~10^6-10^7 rows no matter the
  corpus size), the same compression every production BPE trainer uses.
* Each merge iteration is one vocab-table aggregate (adjacent-pair
  counts weighted by word freq) + a 1-row argmax collect (bounded
  driver action) + a vectorized string rewrite.  No per-row Python.

Merge-application semantics: symbols travel as a space-joined string
and a chosen pair (a, b) is applied with `replace(' '||seq||' ',
' a b ', ' ab ')` — left-to-right NON-OVERLAPPING, which both Spark and
DuckDB implement identically (verified: ' a b a b a b ' → ' ab a b ab '
on both).  This deviates from reference BPE only for ≥3 back-to-back
repeats of the pair inside one word (the middle occurrence survives one
extra round) — documented, deterministic, and engine-identical, which
is what the oracle contract needs.  Ties on pair count break to the
lexicographically smallest pair, so rule selection is total-ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over the (seq, freq) vocab table."""
    ts = F.split(F.col("seq"), " ")
    pairs = F.when(F.size(ts) < 2, F.array().cast("array<string>")).otherwise(
        F.expr(
            "transform(sequence(1, size(split(seq, ' ')) - 1), "
            "i -> concat(element_at(split(seq, ' '), i), ' ', "
            "element_at(split(seq, ' '), i + 1)))"
        )
    )
    return (
        state.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _apply_merge(state: DataFrame, pair: str, merged: str) -> DataFrame:
    return state.select(
        F.trim(
            F.expr(f"replace(concat(' ', seq, ' '), ' {pair} ', ' {merged} ')")
        ).alias("seq"),
        "freq",
    )


def bpe_merge_table(
    docs: DataFrame, num_merges: int = 4, text_col: str = "text"
) -> DataFrame:
    """Learn the first `num_merges` BPE merge rules; returns
    (merge_rank, pair, merged, cnt) with cnt the pair's weighted count
    at the time it was chosen."""
    spark = docs.sparkSession
    words = _word_freqs(docs, text_col)
    # one space between every character: 'the' -> 't h e'
    state = words.select(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")).alias("seq"),
        "freq",
    )
    state = state.persist()
    rules: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, num_merges + 1):
            top = (
                _pair_counts(state)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pair"], top[0]["cnt"]
            merged = pair.replace(" ", "")
            rules.append((rank, pair, merged, cnt))
            nxt = _apply_merge(state, pair, merged).persist()
            nxt.count()  # materialize before dropping the parent cache
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return spark.createDataFrame(
        rules, "merge_rank long, pair string, merged string, cnt long"
    )


def bpe_oracle_sql(num_merges: int = 4) -> str:
    """DuckDB mirror of bpe_merge_table: the same iteration unrolled as
    a CTE chain (one pair-count + argmax + replace per merge)."""
    pairs_of = (
        "list_transform(range(1, len(str_split({s}, ' '))), "
        "i -> str_split({s}, ' ')[i] || ' ' || str_split({s}, ' ')[i + 1])"
    )
    ctes = [
        "w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word "
        "FROM documents) GROUP BY word)",
        "s0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, "
        "freq FROM w)",
    ]
    selects = []
    for r in range(1, num_merges + 1):
        prev, cur = f"s{r - 1}", f"s{r}"
        ctes.append(
            f"p{r} AS (SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM "
            f"(SELECT unnest({pairs_of.format(s='seq')}) AS p, freq FROM {prev}) "
            "GROUP BY p)"
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT pair, replace(pair, ' ', '') AS merged, "
            f"cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1)"
        )
        ctes.append(
            f"{cur} AS (SELECT trim(replace(' ' || seq || ' ', "
            f"' ' || (SELECT pair FROM b{r}) || ' ', "
            f"' ' || (SELECT merged FROM b{r}) || ' ')) AS seq, freq FROM {prev})"
        )
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS merge_rank, pair, merged, cnt FROM b{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_fertility_curve(
    docs: DataFrame, num_merges: int = 4, text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Compression curve of the first `num_merges` BPE merges: one row
    per step 0..k with (step, vocab_symbols, total_symbols,
    symbols_per_word) — step 0 is the raw character segmentation.  THE
    tokenizer-budget question ("how many merges buy how much
    compression / what vocab size do they cost?") answered from the
    same vocab-table iteration as bpe_merge_table; each step adds two
    tiny aggregates (distinct-symbol count, freq-weighted length) over
    the distinct-word table."""
    spark = docs.sparkSession
    words = _word_freqs(docs, text_col)
    state = words.select(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")).alias("seq"),
        "freq",
    ).persist()

    def _stats(s: DataFrame) -> tuple[int, int, int]:
        vocab = (
            s.select(F.explode(F.split("seq", " ")).alias("sym"))
            .agg(F.countDistinct("sym").cast("long").alias("v"))
            .collect()[0]["v"]
        )
        r = s.agg(
            F.sum(F.size(F.split("seq", " ")) * F.col("freq")).cast("long").alias("t"),
            F.sum("freq").cast("long").alias("w"),
        ).collect()[0]
        return int(vocab or 0), int(r["t"] or 0), int(r["w"] or 0)

    rows: list[tuple[int, int, int, float]] = []
    try:
        vocab, tot, nw = _stats(state)
        rows.append((0, vocab, tot, round(tot / nw, round_to) if nw else 0.0))
        for step in range(1, num_merges + 1):
            top = (
                _pair_counts(state)
                .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair = top[0]["pair"]
            nxt = _apply_merge(state, pair, pair.replace(" ", "")).persist()
            nxt.count()
            state.unpersist()
            state = nxt
            vocab, tot, nw = _stats(state)
            rows.append((step, vocab, tot, round(tot / nw, round_to) if nw else 0.0))
    finally:
        state.unpersist()
    return spark.createDataFrame(
        rows,
        "step long, vocab_symbols long, total_symbols long, symbols_per_word double",
    )


def bpe_fertility_oracle_sql(num_merges: int = 4) -> str:
    """DuckDB mirror of bpe_fertility_curve (extends the merge-chain
    CTEs with a per-step stats aggregate)."""
    pairs_of = (
        "list_transform(range(1, len(str_split({s}, ' '))), "
        "i -> str_split({s}, ' ')[i] || ' ' || str_split({s}, ' ')[i + 1])"
    )
    stats_of = (
        "SELECT CAST({step} AS BIGINT) AS step, "
        "CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_symbols, "
        "CAST(SUM(freq_per_sym) AS BIGINT) AS total_symbols, "
        "ROUND(SUM(freq_per_sym) / (SELECT CAST(SUM(freq) AS DOUBLE) FROM {src}), 6) "
        "AS symbols_per_word FROM (SELECT unnest(str_split(seq, ' ')) AS sym, "
        "freq AS freq_per_sym FROM {src})"
    )
    ctes = [
        "w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word "
        "FROM documents) GROUP BY word)",
        "s0 AS MATERIALIZED (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) "
        "AS seq, freq FROM w)",
    ]
    selects = [stats_of.format(step=0, src="s0")]
    for r in range(1, num_merges + 1):
        prev, cur = f"s{r - 1}", f"s{r}"
        ctes.append(
            f"p{r} AS (SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM "
            f"(SELECT unnest({pairs_of.format(s='seq')}) AS p, freq FROM {prev}) "
            "GROUP BY p)"
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT pair, replace(pair, ' ', '') AS merged "
            f"FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1)"
        )
        ctes.append(
            f"{cur} AS MATERIALIZED (SELECT trim(replace(' ' || seq || ' ', "
            f"' ' || (SELECT pair FROM b{r}) || ' ', "
            f"' ' || (SELECT merged FROM b{r}) || ' ')) AS seq, freq FROM {prev})"
        )
        selects.append(stats_of.format(step=r, src=cur))
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
