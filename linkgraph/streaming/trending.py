"""Streaming trending detection — sliding-window event counts + top-k.

The workload: "what is trending right now" over a continuous event
stream — per (sliding window, event_type) counts maintained by
Structured Streaming's native windowed aggregation (state bounded by
watermark eviction), with top-k ranking read off the closed-window sink.

Everything here is the built-in windowed-agg operator — no custom
state kernel needed (contrast sessions.py, where gap semantics force
applyInPandasWithState).  Append output mode emits a window exactly
once, when the watermark passes its end: the sink is therefore an
immutable, exactly-once ledger of closed windows — the honest shape for
a downstream trending dashboard at any scale (no in-place updates, no
read-modify-write on the serving store).

Sliding windows multiply state by window/slide overlapping panes; the
state per pane is one count per live (pane, key) — bytes, not events —
and panes older than the watermark are evicted by the engine.

Incremental ≡ batch: the SAME F.window expression over the static
union of all drops produces the identical (window, key, n) rows for
every window the watermark closed — tested across forced microbatch
boundaries in tests/test_streaming_trending.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source of event parquet drops (ingest.py's
    convention: maxFilesPerTrigger forces real cross-batch boundaries)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def sliding_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, window_end, event_type, n) per sliding pane.

    Works identically on a stream (watermarked, append-closed panes) and
    on a static DataFrame (the batch mirror used by the equality test) —
    one shared plan definition, so incremental and batch can never drift."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def trending_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k event types per closed window from the sink ledger —
    a rank-limit window (WindowGroupLimit pushes the per-group heap
    below the shuffle), fully keyed ordering (n desc, event_type asc)
    so the frontier is deterministic."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start", "window_end", "event_type", "n", "rank")
    )


def run_trending_ingest(
    spark: SparkSession,
    src_path: str,
    sink_path: str,
    checkpoint: str,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
):
    """Drain the source with availableNow into an append-mode parquet
    ledger of closed windows; returns after the query terminates."""
    stream = read_event_stream(spark, src_path, max_files_per_trigger)
    counts = sliding_event_counts(stream, window, slide, watermark)
    q = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
