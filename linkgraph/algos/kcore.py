"""k-core decomposition by iterative peel (SURVEY.md K6 family).

The k-core is the maximal induced subgraph where every vertex has degree
≥ k.  Peel round = one degree aggregate over the surviving edge set plus
two semi-joins restricting edges to surviving endpoints — all relational,
co-partitioned on src under `iteration_plan` (AQE off, shuffled-hash),
lineage cut per round via lazy localCheckpoint materialized by the
survivor-count action (the PR/CC/LPA one-job-per-iteration shape).

Scale posture: the surviving edge set only shrinks, so per-round cost is
monotonically decreasing; the degree aggregate is a partial+final count
on the existing src partitioning (no extra exchange for the src-side
semi-join); the dst-side semi-join shuffles the (narrow) survivor list,
never the text/payload columns.

Two modes, mirroring the fixed-budget pattern the PR/LPA oracles use:
  rounds=None — peel to fixpoint (survivor count stable);
  rounds=R    — exactly R peel rounds, SQL-mirrorable round for round
                (once the peel converges, further rounds are identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from linkgraph.graph import LinkGraph, iteration_plan


def k_core(graph: LinkGraph, k: int, rounds: int | None = None) -> DataFrame:
    """Returns (vid, core_deg): vertices of the k-core (or of the R-round
    peel when `rounds` is given) with their degree inside the surviving
    induced subgraph.

    Degrees are out-degrees over the graph's edge table; on symmetric
    (undirected-closure) graphs that is the standard undirected k-core.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    spark = graph.spark
    edges = graph.edges.select("src", "dst")

    with iteration_plan(spark):
        cur = edges
        prev_n: int | None = None
        r = 0
        prev_keep = None
        while True:
            keep = (
                cur.groupBy("src")
                .agg(F.count(F.lit(1)).alias("core_deg"))
                .where(F.col("core_deg") >= k)
                .select(F.col("src").alias("vid"), "core_deg")
                .localCheckpoint(eager=False)
            )
            n = keep.count()  # the action that materializes the round
            r += 1
            done = (rounds is None and n == prev_n) or (
                rounds is not None and r >= rounds
            )
            if prev_keep is not None:
                try:
                    prev_keep.unpersist()
                except Exception:
                    pass
            prev_keep = keep
            if done or n == 0:
                break
            prev_n = n
            cur = (
                cur.join(keep.select("vid"), cur.src == F.col("vid"), "left_semi")
                .join(keep.select("vid"), cur.dst == F.col("vid"), "left_semi")
            )

        if n == 0:
            return spark.createDataFrame([], "vid long, core_deg long")
        # final degrees within the induced subgraph of the survivors.
        # keep is already materialized (localCheckpoint + count) — no extra
        # persist, so nothing leaks past the call (round-3 advice pattern).
        survivors = keep.select("vid")
        out = (
            edges.join(survivors, edges.src == survivors.vid, "left_semi")
            .join(survivors, edges.dst == survivors.vid, "left_semi")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("core_deg"))
            .select(F.col("src").cast("long").alias("vid"),
                    F.col("core_deg").cast("long").alias("core_deg"))
        )
        return out
