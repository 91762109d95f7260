"""Structured Streaming incremental transcript ingest (SURVEY.md §2.10).

Pipeline: readStream over a transcripts source (file/iceberg/kafka) →
watermarked dedupe of late/replayed turns → per-microbatch edge derivation
(foreachBatch) appended to the edge store, so graph jobs always see a
consistent snapshot.  Late turns re-derive only their own conversation's
adjacency (turn-adjacency is conv-local; shared-key edges append-only).

The sandbox has no Kafka; tests drive the file source with
trigger(availableNow=True) for deterministic end-to-end runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.schemas import TRANSCRIPTS
from linkgraph.sources.derive import shared_key_conv_edges, turn_adjacency_edges


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source of transcript parquet drops."""
    return spark.readStream.schema(TRANSCRIPTS).parquet(path)


def deduped_turns(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once turn stream: watermark + key dedupe on (conv_id, turn_idx).

    dropDuplicatesWithinWatermark bounds the dedupe state — replays and
    late duplicates inside the watermark are dropped, state older than the
    watermark is evicted (the unbounded-state fix for stream dedupe).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def hourly_turn_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Windowed aggregation with late-data handling: turns per conv per hour."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("hour"), "conv_id", "n_turns")
    )


class IncrementalEdgeStore:
    """foreachBatch sink: derive edges from each microbatch and append.

    Layout: <root>/shared_tool/ and <root>/turn_adjacency/ parquet dirs.
    Shared-key edges are append-only (dedup at read); turn-adjacency edges
    of a late conv are re-derived for just that conv (conv-local property).
    """

    def __init__(self, root: str, edge_key: str = "tool", hub_cap: int | None = None):
        self.root = root
        self.edge_key = edge_key
        self.hub_cap = hub_cap
        os.makedirs(root, exist_ok=True)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        shared = shared_key_conv_edges(batch, key=self.edge_key, hub_cap=self.hub_cap)
        shared.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(self.root, "shared_tool")
        )
        adj = turn_adjacency_edges(batch)
        adj.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(self.root, "turn_adjacency")
        )

    # ------------------------------------------------------------------ reads
    def shared_tool_edges(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.parquet(os.path.join(self.root, "shared_tool"))
            .select("src_conv", "dst_conv")
            .distinct()
        )

    def turn_adjacency(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "turn_adjacency")).select(
            "conv_id", "src_turn", "dst_turn"
        ).distinct()


def run_ingest(
    spark: SparkSession,
    source_path: str,
    store: IncrementalEdgeStore,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire the full ingest query; availableNow drains the source and stops
    (test/batch-catchup mode), otherwise runs continuously."""
    stream = deduped_turns(read_transcript_stream(spark, source_path))
    writer = (
        stream.writeStream.foreachBatch(store.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
