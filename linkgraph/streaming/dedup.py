"""Streaming deduplication over a documents stream (doc_id, text, ts) —
the continuous-ingest counterpart of `textops.dedup` (SURVEY.md §2.10).

Two layers, mirroring a training-data pipeline's batch dedup stack:

* EXACT duplicates: `dropDuplicatesWithinWatermark` on the content digest
  (sha2-256 of the text) — Spark's bounded-state streaming dedupe.  State
  holds one digest per DISTINCT document inside the watermark horizon and
  is evicted past it, so replays and late exact copies are dropped without
  unbounded growth (the naive dropDuplicates would keep every digest
  forever).

* NEAR duplicates: `IncrementalDedupStore`, a foreachBatch sink that keeps
  the ACCUMULATED MinHash band-bucket index on storage and joins each
  microbatch's bucket keys against it — a pair is emitted exactly when its
  SECOND member arrives, so after any prefix of batches the emitted pair
  set equals the batch `minhash_near_duplicates` over all documents seen
  so far (tested across forced batch boundaries, including a cross-batch
  duplicate: tests/test_streaming_dedup.py).

Scale posture: per batch the work is |batch|·bands bucket rows joined
against the index — never a self-join of the full corpus; the index grows
one row per (new doc, band) and lives on storage, not in executor state.
Verification joins candidate pairs back to the accumulated doc store —
O(|candidates|·avg_tokens), the same verify shape as the batch path.
The sandbox has no Kafka; tests drive the file source with
trigger(availableNow=True) and maxFilesPerTrigger=1 for deterministic
multi-batch runs.
"""

from __future__ import annotations

import posixpath

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.textops.dedup import jaccard_for_pairs, minhash_band_buckets

DOCS_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def deduped_documents(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact-dup-free document stream: first arrival per content digest
    wins; later identical texts within the watermark are dropped, digest
    state older than the watermark is evicted (bounded state)."""
    return (
        stream.withColumn("digest", F.sha2(F.col("text"), 256))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
        .drop("digest")
    )


class IncrementalDedupStore:
    """foreachBatch sink maintaining cumulative near-dup state.

    Layout under <root>/:
        buckets/   accumulated (doc_id, band, bucket) MinHash band index
        docs/      accumulated (doc_id, text) — verify-side corpus
        pairs/     verified (a, b, jac) near-dup pairs (append)

    Candidates require one side in the CURRENT batch (the join's left
    side), so a pair is emitted once — when its second member arrives —
    and never re-derived; least/greatest + distinct collapses the two
    orientations when both members land in one batch.
    """

    def __init__(
        self,
        root: str,
        threshold: float = 0.5,
        num_hashes: int = 64,
        bands: int = 16,
        hash_family: str = "xxhash64",
    ):
        self.root = root
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.hash_family = hash_family
        self._fs = None

    def _ensure_fs(self, spark: SparkSession):
        if self._fs is None:
            from linkgraph.checkpoint import _HadoopFS

            self._fs = _HadoopFS(spark, self.root)
            self._fs.mkdirs(self.root)
        return self._fs

    def _read_optional(self, spark: SparkSession, name: str) -> DataFrame | None:
        path = posixpath.join(self.root, name)
        if not self._ensure_fs(spark).exists(path):
            return None
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            # a job killed mid-first-append leaves only _temporary/ — treat
            # as empty and let the batch re-derive (same backstop as
            # IncrementalEdgeStore._read_optional)
            return None

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        docs_b = batch.select("doc_id", "text").persist()

        bb = minhash_band_buckets(
            docs_b, self.num_hashes, self.bands, hash_family=self.hash_family
        ).persist()
        old_idx = self._read_optional(spark, "buckets")
        idx = bb if old_idx is None else bb.unionByName(old_idx)

        cand = (
            bb.select("band", "bucket", F.col("doc_id").alias("x"))
            .join(idx.select("band", "bucket", F.col("doc_id").alias("y")), ["band", "bucket"])
            .where(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("a"),
                F.greatest("x", "y").alias("b"),
            )
            .distinct()
        )
        old_docs = self._read_optional(spark, "docs")
        docs_all = docs_b if old_docs is None else docs_b.unionByName(old_docs)
        verified = jaccard_for_pairs(docs_all, cand).where(
            F.col("jac") >= self.threshold
        )
        verified.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            posixpath.join(self.root, "pairs")
        )
        bb.write.mode("append").parquet(posixpath.join(self.root, "buckets"))
        docs_b.write.mode("append").parquet(posixpath.join(self.root, "docs"))
        bb.unpersist()
        docs_b.unpersist()

    # ------------------------------------------------------------------ reads
    def near_dup_pairs(self, spark: SparkSession) -> DataFrame:
        """All verified (a, b, jac) pairs over every document ingested so
        far — equals batch minhash_near_duplicates over the same corpus."""
        p = self._read_optional(spark, "pairs")
        if p is None:
            return spark.createDataFrame([], "a long, b long, jac double")
        return p.select("a", "b", "jac").distinct()

    def documents(self, spark: SparkSession) -> DataFrame:
        d = self._read_optional(spark, "docs")
        if d is None:
            return spark.createDataFrame([], "doc_id long, text string")
        return d


def run_dedup_ingest(
    spark: SparkSession,
    source_path: str,
    store: IncrementalDedupStore,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Exact-dedup the stream, then maintain the incremental near-dup store
    per microbatch; availableNow drains the source and stops."""
    stream = deduped_documents(
        read_document_stream(spark, source_path, max_files_per_trigger), watermark
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
