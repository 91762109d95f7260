"""Structured Streaming incremental transcript ingest (SURVEY.md §2.10).

Pipeline: readStream over a transcripts source (file/iceberg/kafka) →
watermarked dedupe of late/replayed turns → per-microbatch derivation
against the ACCUMULATED store (foreachBatch): shared-key edges join each
batch's keys with the cumulative conv—key index (cross-batch pairs are
emitted when the second conversation arrives), and turn adjacency is
re-derived conv-locally from the cumulative turn store for every conv the
batch touches (late turns supersede the conv's earlier rows by batch_id).
After each batch commits, the incremental edge set equals the batch
derivation over all data seen so far (tested).

The sandbox has no Kafka; tests drive the file source with
trigger(availableNow=True) for deterministic end-to-end runs.
"""

from __future__ import annotations

import posixpath

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.schemas import TRANSCRIPTS
from linkgraph.sources.derive import shared_key_conv_edges, turn_adjacency_edges


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source of transcript parquet drops.

    max_files_per_trigger bounds each microbatch (availableNow still drains
    the whole source, in several batches) — used by tests to force real
    cross-batch boundaries."""
    reader = spark.readStream.schema(TRANSCRIPTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


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
    """foreachBatch sink maintaining a CUMULATIVE edge store across batches.

    Layout under <root>/:
        conv_keys/       accumulated distinct (conv_id, k) index
        turns/           accumulated (conv_id, turn_idx, ts) — text pruned
        shared_tool/     derived conv—conv edges (append; dedup at read)
        turn_adjacency/  derived adjacency per conv (append; latest
                         batch_id per conv wins at read — merge-on-read)

    Cross-batch correctness (the two failure modes of naive per-batch
    derivation):
    * a conversation sharing a tool with one from an EARLIER batch: each
      batch's keys are joined against the accumulated conv_keys index, so
      the pair is emitted when the second conversation arrives;
    * a conversation whose turns SPAN batches (late turns): adjacency for
      every conv touched by the batch is re-derived from the accumulated
      turn store and supersedes (by batch_id) the conv's earlier rows.

    hub_cap applies against the ACCUMULATED per-key conv count: once a key
    exceeds the cap, no further edges are derived through it (edges
    derived while it was below the cap are retained — merge-on-read
    semantics, same rationale as the batch derivation's documented cap).
    """

    def __init__(self, root: str, edge_key: str = "tool", hub_cap: int | None = None):
        self.root = root
        self.edge_key = edge_key
        self.hub_cap = hub_cap
        self._fs = None  # Hadoop FS handle, resolved lazily from a session

    def _ensure_fs(self, spark: SparkSession):
        """All store I/O goes through the Hadoop FileSystem API resolved
        from the root's scheme (same layer as checkpoint._HadoopFS) —
        file://, hdfs:// and s3a:// roots all behave; a driver-local
        os.makedirs would be a wrong/no-op on an object store."""
        if self._fs is None:
            from linkgraph.checkpoint import _HadoopFS

            self._fs = _HadoopFS(spark, self.root)
            self._fs.mkdirs(self.root)
        return self._fs

    def _read_optional(self, spark: SparkSession, name: str) -> DataFrame | None:
        path = posixpath.join(self.root, name)
        if not self._ensure_fs(spark).exists(path):
            return None  # first batch: store not yet created
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            # restart resilience: the directory exists but holds no readable
            # parquet footers (a job killed mid-first-append leaves only
            # _temporary/) — treat as empty and let the batch re-derive
            return None

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        batch = batch.persist()

        # ---- shared-key edges: batch keys × accumulated key index
        bk = (
            batch.where(F.col(self.edge_key).isNotNull())
            .select("conv_id", F.col(self.edge_key).alias("k"))
            .distinct()
            .persist()
        )
        old_idx = self._read_optional(spark, "conv_keys")
        union_keys = bk if old_idx is None else bk.unionByName(old_idx).distinct()
        if self.hub_cap is not None:
            ok_keys = (
                union_keys.groupBy("k")
                .agg(F.count("*").alias("n"))
                .where(F.col("n") <= self.hub_cap)
                .select("k")
            )
            bk_c = bk.join(ok_keys, "k", "left_semi")
            union_c = union_keys.join(ok_keys, "k", "left_semi")
        else:
            bk_c, union_c = bk, union_keys
        pairs = (
            bk_c.alias("a")
            .join(union_c.alias("b"), "k")
            .where(F.col("a.conv_id") != F.col("b.conv_id"))
            .select(
                F.least(F.col("a.conv_id"), F.col("b.conv_id")).alias("src_conv"),
                F.greatest(F.col("a.conv_id"), F.col("b.conv_id")).alias("dst_conv"),
            )
            .distinct()
        )
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            posixpath.join(self.root, "shared_tool")
        )
        bk.write.mode("append").parquet(posixpath.join(self.root, "conv_keys"))

        # ---- turn store + conv-local adjacency re-derivation
        turns_min = batch.select("conv_id", "turn_idx", "ts").distinct()
        turns_min.write.mode("append").parquet(posixpath.join(self.root, "turns"))
        convs = batch.select("conv_id").distinct()
        all_turns = (
            spark.read.parquet(posixpath.join(self.root, "turns"))
            .join(convs, "conv_id", "left_semi")
            .dropDuplicates(["conv_id", "turn_idx"])
        )
        adj = turn_adjacency_edges(all_turns)
        adj.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            posixpath.join(self.root, "turn_adjacency")
        )
        bk.unpersist()
        batch.unpersist()

    # ------------------------------------------------------------------ reads
    def shared_tool_edges(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.parquet(posixpath.join(self.root, "shared_tool"))
            .select("src_conv", "dst_conv")
            .distinct()
        )

    def turn_adjacency(self, spark: SparkSession) -> DataFrame:
        """Latest derivation per conv wins (merge-on-read over batch_id)."""
        from pyspark.sql import Window

        df = spark.read.parquet(posixpath.join(self.root, "turn_adjacency"))
        w = Window.partitionBy("conv_id")
        return (
            df.withColumn("mx", F.max("batch_id").over(w))
            .where(F.col("batch_id") == F.col("mx"))
            .select("conv_id", "src_turn", "dst_turn")
            .distinct()
        )


def run_ingest(
    spark: SparkSession,
    source_path: str,
    store: IncrementalEdgeStore,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Wire the full ingest query; availableNow drains the source and stops
    (test/batch-catchup mode), otherwise runs continuously."""
    stream = deduped_turns(
        read_transcript_stream(spark, source_path, max_files_per_trigger)
    )
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
