"""PageRank — pure-relational power iteration (SURVEY.md A4/K6).

Each iteration: contribs = ranks ⋈ edges (co-partitioned on src; only the
rank side shuffles) → sum by dst → damping + dangling-mass redistribution.
Convergence: max |Δrank| < tol (BASELINE tol 1e-6).  Lineage cut every
iteration via localCheckpoint; durable snapshots via CheckpointManager.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.graph import LinkGraph


def pagerank(
    graph: LinkGraph,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_mgr=None,
    snapshot_every: int = 10,
    resume: bool = False,
    verbose: bool = False,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """Returns (vid, pr).  Ranks sum to 1 (dangling mass redistributed).

    assume_no_dangling skips the per-iteration dangling-mass action — safe
    on symmetric edge tables (every vertex has out-edges by construction).
    tol <= 0 runs exactly max_iter iterations and skips the per-iteration
    delta action (fixed-budget benchmark mode)."""
    spark = graph.spark
    vertices = graph.vertices().persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    deg = graph.degrees()  # out-degree; cached

    it0 = 0
    ranks = None
    if resume and checkpoint_mgr is not None:
        snap = checkpoint_mgr.latest()
        if snap is not None:
            ranks = checkpoint_mgr.read_state(snap)
            it0 = int(snap["metrics"]["iteration"])

    if ranks is None:
        ranks = vertices.select("vid", F.lit(1.0 / n).alias("pr"))
    ranks = ranks.localCheckpoint(eager=True)

    for it in range(it0, max_iter):
        # dangling vertices have no out-edges: in a symmetric graph none,
        # but handle generally (one tiny agg over the anti-join).
        with_deg = ranks.join(deg, "vid", "left")
        if assume_no_dangling:
            dangling = 0.0
        else:
            dangling = (
                with_deg.where(F.col("deg").isNull()).agg(F.sum("pr").alias("m")).first()["m"]
                or 0.0
            )
        # rank side is |V| rows — broadcast it explicitly: its plan is a
        # checkpointed RDD with unknown stats, and without the hint Spark
        # falls back to SMJ, re-sorting the whole edge table every iteration
        # (measured 10x per-iteration cost).  At billions of vertices use
        # co-partitioned SHJ instead (edges are pre-partitioned by src).
        rank_msgs = with_deg.where(F.col("deg").isNotNull()).select(
            F.col("vid").alias("src"), (F.col("pr") / F.col("deg")).alias("w")
        )
        if n <= 100_000_000:
            rank_msgs = F.broadcast(rank_msgs)
        contribs = (
            graph.edges.join(rank_msgs, "src").groupBy("dst").agg(F.sum("w").alias("acc"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            vertices.join(F.broadcast(contribs), vertices["vid"] == contribs["dst"], "left")
            .select(
                F.col("vid"),
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
        delta = None
        if tol > 0:
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "vid")
                .agg(F.max(F.abs(F.col("n.pr") - F.col("o.pr"))).alias("d"))
                .first()["d"]
            )
        ranks = new_ranks
        if verbose:
            print(f"[pagerank] iter {it}: delta={delta}", flush=True)
        if checkpoint_mgr is not None and (it + 1) % snapshot_every == 0:
            ranks = checkpoint_mgr.write_state(
                ranks, it + 1,
                {"iteration": it + 1, "delta": float(delta) if delta is not None else -1.0},
            ).localCheckpoint(eager=True)
        if delta is not None and delta < tol:
            break
    vertices.unpersist()
    return ranks
