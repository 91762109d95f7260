"""Training-sequence packing — concat-and-chop document placement.

LLM pre-training consumes fixed-length token sequences; the standard
high-throughput packing (GPT-2/3 style) concatenates all documents in a
deterministic order and chops the stream every ``seq_len`` tokens.  This
operator computes each document's placement in that virtual stream:

    (doc_id, n_tokens, tok_start, seq_start, seq_end, n_seqs)

where tok_start is the document's global token offset, seq_start/seq_end
the first/last training sequence it lands in (a document may span
several), and n_seqs the span width.  Downstream sequence assembly then
groups by sequence id — `seq_start == seq_end` rows need no splitting.

Token counts use the BPE-ish run tokenizer (textstats.BPE_RE — the
model-token cost estimator of the accounting trio), so the same regex
drives budgeting and packing.  Zero-token documents are dropped: they
occupy no stream positions and would have an empty sequence span.

Scale shape — a global prefix sum WITHOUT a global single-partition
window (the naive ``Window.orderBy(doc_id)`` plan collapses the whole
corpus onto one task; at 10^9 docs that is the job):
  1. token counts are a zero-shuffle projection (text never moves);
  2. ``repartitionByRange`` on doc_id (the only global step is the range
     sampler) + per-partition cumulative window;
  3. per-partition token totals — ≤P rows — collect to the driver, the
     running offsets broadcast back as a P-row join.
This is graph.py::_dense_ids' two-phase ranking with SUM in place of
COUNT; placement is deterministic regardless of partition boundaries
because range k < range k+1 for every row and doc_id is a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel
from pyspark.sql.window import Window

from linkgraph.textops.textstats import BPE_RE


def sequence_pack(
    docs: DataFrame,
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Place each document in the concat-and-chop token stream.

    Returns (doc_id, n_tokens, tok_start, seq_start, seq_end, n_seqs),
    one row per non-empty document, ordered semantics by doc_id."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = docs.sparkSession
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
        ).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)

    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = (
        tok.repartitionByRange(p, F.col("doc_id").asc())
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = {
        r["pid"]: r["t"]
        for r in parts.groupBy("pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()], "pid int, off long"
        )
    )
    w = Window.partitionBy("pid").orderBy(F.col("doc_id").asc())
    start = (
        F.sum("n_tokens").over(w) - F.col("n_tokens") + F.col("off")
    ).alias("tok_start")
    out = (
        parts.join(off_df, "pid")
        .select("doc_id", "n_tokens", start)
        .select(
            "doc_id",
            "n_tokens",
            "tok_start",
            # integer DIV, not float division + cast: a 100 TB corpus is
            # ~1e14 tokens, inside double's 2^53 but with zero margin
            F.expr(f"tok_start DIV {int(seq_len)}").alias("seq_start"),
            F.expr(f"(tok_start + n_tokens - 1) DIV {int(seq_len)}").alias("seq_end"),
        )
        .withColumn("n_seqs", F.col("seq_end") - F.col("seq_start") + F.lit(1))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()  # materialize off the cached parts, then release them
    parts.unpersist()
    return out


def chunk_plan(
    docs: DataFrame,
    window: int = 128,
    stride: int = 96,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sliding-window chunk table for retrieval/embedding
    pipelines: (doc_id, chunk_id, tok_start, tok_end) with chunks of
    ``window`` tokens every ``stride`` tokens (overlap = window − stride)
    and a final short chunk covering the tail — the RAG-prep complement
    of `sequence_pack` (that op chops a GLOBAL stream for pre-training;
    this one windows WITHIN each document so retrieval units never cross
    document boundaries).

    n_chunks(d) = 1 + ceil(max(n_tokens − window, 0) / stride), computed
    with INTEGER arithmetic ((x + stride − 1) DIV stride) so the plan is
    exact in any engine.  Pure projection + explode of a generated
    sequence — zero shuffle, zero state; the BPE-ish tokenizer is shared
    with sequence_pack so chunk budgets and packing budgets agree.
    Zero-token documents are dropped.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride > window would skip tokens between chunks")
    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    n_chunks = F.lit(1) + F.expr(f"CAST((greatest(n_tokens - {window}, 0) + {stride} - 1) DIV {stride} AS BIGINT)")
    return (
        tok.select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * F.lit(stride)).cast("long").alias("tok_start"),
            F.least(
                F.col("chunk_id") * F.lit(stride) + F.lit(window), F.col("n_tokens")
            )
            .cast("long")
            .alias("tok_end"),
        )
    )
