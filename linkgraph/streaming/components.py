"""Streaming incremental connected components over an edge stream —
the graph-side continuous-ingest operator of SURVEY.md §2.10 (the
streaming family so far covered events/text; this covers the link graph
itself: conv–conv edges keep arriving while component ids must stay
queryable).

Semantics: after ANY prefix of microbatches, `labels()` equals batch
`connected_components` (comp = min vid reachable) over the union of all
edges ingested so far — tested across forced batch boundaries including
a batch whose edges MERGE two previously separate components
(tests/test_streaming_cc.py).

Per microbatch the work is the classic incremental-CC contraction, never
a recompute over the accumulated edge set:

1. endpoints of the batch edges are mapped to their CURRENT component
   ids (one join against the label store);
2. pointer-doubling CC runs on the CONTRACTED graph — one vertex per
   touched component, |batch| edges — so the iterative part costs
   O(|batch| · log |batch|) regardless of how many edges ever arrived;
3. the resulting old_comp → new_comp mapping (≤ 2·|batch| rows,
   broadcastable) rewrites the label store with one join.

The label store is one (vid, comp) parquet directory — |V seen| rows.
Rewriting it per batch is the honest small-scale shape; at 100 TB the
store is hash-partitioned on comp and only partitions holding a remapped
comp id are rewritten (partition-pruned by the broadcast mapping), the
same FS-routed layout as `graph.py`'s edge store.  No executor state:
everything lives on storage, so the query survives restarts with its
checkpoint like every sink in this package.

The sandbox has no Kafka; tests drive the file source with
trigger(availableNow=True) + maxFilesPerTrigger=1, as the other
streaming tests do.
"""

from __future__ import annotations

import posixpath

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, ts timestamp"


def read_edge_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EDGE_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


class IncrementalComponentStore:
    """foreachBatch sink maintaining (vid, comp) under <root>/labels."""

    def __init__(self, root: str):
        self.root = root
        self._fs = None

    def _ensure_fs(self, spark: SparkSession):
        if self._fs is None:
            from linkgraph.checkpoint import _HadoopFS

            self._fs = _HadoopFS(spark, self.root)
            self._fs.mkdirs(self.root)
        return self._fs

    def _labels_dir(self, generation: int) -> str:
        return posixpath.join(self.root, f"labels_g{generation:06d}")

    def _current_generation(self, spark: SparkSession) -> int | None:
        fs = self._ensure_fs(spark)
        gens = [
            int(name.rsplit("_g", 1)[1])
            for name, _, is_dir in fs.list(self.root)
            if is_dir and name.startswith("labels_g")
        ]
        return max(gens) if gens else None

    def _read_labels(self, spark: SparkSession) -> DataFrame | None:
        gen = self._current_generation(spark)
        if gen is None:
            return None
        try:
            return spark.read.parquet(self._labels_dir(gen))
        except AnalysisException:
            return None  # killed mid-first-write: only _temporary/ exists

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # symmetric closure of the batch edges, self-loops dropped
        e = batch.select("src", "dst").where(F.col("src") != F.col("dst"))
        e = (
            e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
            .persist()
        )
        labels = self._read_labels(spark)
        verts = e.select(F.col("src").alias("vid")).distinct()
        if labels is None:
            cur = verts.select("vid", F.col("vid").alias("comp"))
            known = None
        else:
            known = labels
            cur = verts.join(labels, "vid", "left").select(
                "vid", F.coalesce(F.col("comp"), F.col("vid")).alias("comp")
            )
        # contract: batch edges between CURRENT component ids
        cs = cur.select(F.col("vid").alias("src"), F.col("comp").alias("csrc"))
        cd = cur.select(F.col("vid").alias("dst"), F.col("comp").alias("cdst"))
        ce = (
            e.join(cs, "src")
            .join(cd, "dst")
            .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        from linkgraph.algos.components import connected_components
        from linkgraph.graph import LinkGraph

        if ce.isEmpty():
            mapping = None  # batch only adds vertices / intra-component edges
        else:
            cg = LinkGraph(
                ce.unionByName(
                    ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                ).distinct()
            )
            # CC over the contracted graph: one vertex per touched comp
            mapping = connected_components(cg).select(
                F.col("vid").alias("comp"), F.col("comp").alias("new_comp")
            )

        def remap(df: DataFrame) -> DataFrame:
            if mapping is None:
                return df
            return df.join(mapping, "comp", "left").select(
                "vid", F.coalesce(F.col("new_comp"), F.col("comp")).alias("comp")
            )

        new_rows = remap(
            cur if known is None
            else cur.join(known.select("vid"), "vid", "left_anti")
        )
        out = new_rows if known is None else remap(known).unionByName(new_rows)

        gen = self._current_generation(spark)
        nxt = 0 if gen is None else gen + 1
        out.write.mode("overwrite").parquet(self._labels_dir(nxt))
        if gen is not None:
            self._ensure_fs(spark).delete(self._labels_dir(gen))
        e.unpersist()

    def labels(self, spark: SparkSession) -> DataFrame:
        """(vid, comp) over every vertex seen so far — equals batch
        connected_components over all ingested edges."""
        lab = self._read_labels(spark)
        if lab is None:
            return spark.createDataFrame([], "vid long, comp long")
        return lab.select(
            F.col("vid").cast("long"), F.col("comp").cast("long")
        )


def run_cc_ingest(
    spark: SparkSession,
    source_path: str,
    store: IncrementalComponentStore,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain the incremental component store per microbatch;
    availableNow drains the source and stops."""
    stream = read_edge_stream(spark, source_path, max_files_per_trigger)
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
