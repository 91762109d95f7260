"""LinkGraph — the distributed edge-table graph (the engine's CSR analog).

The reference holds a CSR in shared memory; our analog (SURVEY.md §1.2/§4.3)
is a symmetric, deduped, self-loop-free edge DataFrame hash-partitioned on
`src` and persisted.  Every iterative kernel joins the (small) frontier
against this table, so only the frontier side shuffles per iteration —
the Spark equivalent of "CSR resident in memory".
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class LinkGraph:
    def __init__(self, edges: DataFrame, num_partitions: int | None = None, persist: bool = True):
        """edges: directed (src:long, dst:long); use from_undirected for
        symmetric closure.  Partitioned by src so frontier-expand joins are
        co-located (SURVEY.md J1).

        Materialization = parquet round-trip + persist, for two measured
        reasons: (1) derivation plans can embed LocalRelations / deep
        self-join trees, and every downstream action re-canonicalizes the
        full logical plan even on a cache hit — O(seconds) of driver time
        per iteration; the round-trip truncates the plan to a parquet scan.
        (2) localCheckpoint (the obvious alternative) yields `Scan
        ExistingRDD`, which deserializes row objects OUTSIDE whole-stage
        codegen — measured 4-8x slower per scan than the columnar cache and
        anti-scaling with cores.  On a cluster the same role is played by
        writing the edge table to Iceberg/parquet storage once and reading
        it back (bucketed by src), which is exactly what this emulates.
        """
        spark = edges.sparkSession
        p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        shaped = edges.repartition(p, "src").sortWithinPartitions("src", "dst")
        self._store = None
        if persist:
            # round-trip only when the input is a real derivation; a bare
            # file scan already has a tiny canonical plan
            try:
                plan = edges._jdf.queryExecution().analyzed().toString()
            except Exception:
                plan = "Join"  # be conservative: round-trip
            complex_plan = any(
                k in plan for k in ("Join", "Aggregate", "Window", "LocalRelation", "Union")
            )
            if complex_plan:
                import tempfile
                import uuid

                self._store = os.path.join(
                    tempfile.gettempdir(), f"linkgraph_edges_{uuid.uuid4().hex}"
                )
                shaped.write.parquet(self._store)
                # NO .persist(): measured on a 102M-edge table, vectorized
                # parquet scans (OS page cache) run within ~20% of the
                # in-memory columnar cache, while cache population costs
                # minutes — it never amortizes for iterative jobs.
                self.edges = spark.read.parquet(self._store)
            else:
                # already a bare file scan (e.g. a pre-shaped edge table
                # written by an earlier LinkGraph) — use it as-is
                self.edges = edges
        else:
            self.edges = shaped
        self._degrees = None
        self._num_vertices = None
        self._num_edges = None

    # ------------------------------------------------------------ constructors
    @classmethod
    def from_undirected(cls, pairs: DataFrame, **kw) -> "LinkGraph":
        """pairs (src,dst) in any orientation -> symmetric, deduped, no loops."""
        sym = pairs.select("src", "dst").union(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return cls(sym.where(F.col("src") != F.col("dst")).distinct(), **kw)

    @classmethod
    def from_string_vertices(cls, pairs: DataFrame, src_col: str, dst_col: str, **kw):
        """Dictionary-relabel string vertex ids to dense 0..n-1 (SURVEY S2).

        Degree-descending order (O1): hubs get small vids, improving batch
        bit-sharing and co-location.  Returns (graph, vertices-dict DF).
        """
        # pairs is typically an expensive derivation (self-join distinct);
        # it is consumed 3x below (degree count, two relabel joins) — persist.
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        occ = pairs.select(F.col(src_col).alias("name")).union(
            pairs.select(F.col(dst_col).alias("name"))
        )
        deg = occ.groupBy("name").agg(F.count("*").alias("deg"))
        w = Window.orderBy(F.col("deg").desc(), F.col("name").asc())
        vertices = deg.select(
            "name", (F.row_number().over(w) - 1).cast("long").alias("vid")
        )
        v = F.broadcast(vertices) if vertices.isStreaming is False else vertices
        relabeled = (
            pairs.join(v.withColumnRenamed("name", src_col).withColumnRenamed("vid", "src"), src_col)
            .join(v.withColumnRenamed("name", dst_col).withColumnRenamed("vid", "dst"), dst_col)
            .select("src", "dst")
        )
        g = cls.from_undirected(relabeled, **kw)
        g.edges.count()  # materialize before releasing the pairs cache
        pairs.unpersist()
        return g, vertices.select("vid", "name")

    # ---------------------------------------------------------------- accessors
    @property
    def spark(self):
        return self.edges.sparkSession

    def vertices(self) -> DataFrame:
        return self.edges.select(F.col("src").alias("vid")).distinct()

    def degrees(self) -> DataFrame:
        """Out-degree per vertex (== degree for symmetric graphs); cached —
        reused by direction switching, source batching, GTEPS accounting."""
        if self._degrees is None:
            self._degrees = (
                self.edges.groupBy("src")
                .agg(F.count("*").alias("deg"))
                .withColumnRenamed("src", "vid")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
        return self._degrees

    def num_vertices(self) -> int:
        if self._num_vertices is None:
            self._num_vertices = self.degrees().count()
        return self._num_vertices

    def num_edges(self) -> int:
        """Directed edge count (2x undirected)."""
        if self._num_edges is None:
            self._num_edges = self.edges.count()
        return self._num_edges

    def top_degree_vids(self, k: int) -> list[int]:
        rows = (
            self.degrees()
            .orderBy(F.col("deg").desc(), F.col("vid").asc())
            .limit(k)
            .collect()
        )
        return [r["vid"] for r in rows]

    def unpersist(self):
        try:
            self.edges.unpersist()
        except Exception:
            pass
        if self._degrees is not None:
            self._degrees.unpersist()
        if self._store and os.path.isdir(self._store):
            shutil.rmtree(self._store, ignore_errors=True)
