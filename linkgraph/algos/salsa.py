"""SALSA hubs & authorities (Lempel & Moran, WWW9 2000) — the
degree-normalized cousin of HITS: scores are the stationary masses of
alternating random walks on the directed graph, so a vertex pointing at
1000 targets spreads 1/1000 of its mass to each instead of replicating
it (HITS's tyranny-of-the-dense failure mode).

Fixed-budget power iteration, mirrorable by an unrolled SQL oracle:

    auth(v) = Σ_{u→v} hub(u)  / outdeg(u)
    hub(u)  = Σ_{u→v} auth(v) / indeg(v)

Both half-step matrices are row-stochastic, so total mass is conserved
EXACTLY each round — no normalization aggregate is needed (unlike HITS's
per-half-step L2 norm), which makes every round one expand job per
direction and nothing else.  hub starts uniform over the hub side
(outdeg > 0); authorities outside any walk (indeg = 0) and hubs outside
any walk (outdeg = 0) report 0.

Plan shape: the forward half-step flows hub/outdeg through the
src-partitioned edge table via LinkGraph.expand; the backward half-step
uses a transpose LinkGraph built once (the CSR/CSC pairing hits.py
documents).  Degree divisions ride the score table as a projection —
degree tables are joined once up front, never per round.  Runs under
iteration_plan (AQE off, shuffled-hash) like every iterative kernel
here.  Rounded to `round_to` for cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, iteration_plan


def salsa(
    graph: LinkGraph,
    rounds: int = 8,
    round_to: int | None = 6,
    transpose: LinkGraph | None = None,
) -> DataFrame:
    """Returns (vid, hub, auth) over all vertices of the directed graph."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = graph.spark
    own_transpose = transpose is None
    gt = transpose or LinkGraph(
        graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        materialize=False,
    )
    e = graph.edges
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    verts = (
        graph.vertices()
        .select("vid")
        .join(outdeg.withColumnRenamed("src", "vid"), "vid", "left")
        .join(indeg.withColumnRenamed("dst", "vid"), "vid", "left")
        .select("vid", F.coalesce("od", F.lit(0)).alias("od"),
                F.coalesce("idg", F.lit(0)).alias("idg"))
        .localCheckpoint(eager=True)
    )
    n_hub = verts.where(F.col("od") > 0).count()
    if n_hub == 0:
        return spark.createDataFrame([], "vid long, hub double, auth double")

    # hub mass 1/n_hub on every vertex with an out-edge
    h = verts.select(
        "vid",
        F.when(F.col("od") > 0, F.lit(1.0 / n_hub)).otherwise(F.lit(0.0)).alias("x"),
    )

    def flow(g: LinkGraph, scores: DataFrame, deg_col: str, est: int) -> DataFrame:
        """Flow scores/deg along g's edges, sum per destination; keep
        explicit zero rows so the off-walk side stays reportable."""
        msgs = (
            scores.join(verts.select("vid", deg_col), "vid")
            .where(F.col(deg_col) > 0)
            .select(
                F.col("vid").alias("src"),
                (F.col("x") / F.col(deg_col)).alias("x"),
            )
        )
        raw = g.expand(msgs, est_rows=est).groupBy("dst").agg(F.sum("x").alias("acc"))
        return (
            verts.alias("v")
            .join(raw.alias("r"), F.col("v.vid") == F.col("r.dst"), "left")
            .select(
                F.col("v.vid").alias("vid"),
                F.coalesce(F.col("r.acc"), F.lit(0.0)).alias("x"),
            )
            .localCheckpoint(eager=True)
        )

    n = verts.count()
    retained: list[DataFrame] = []
    with iteration_plan(spark):
        a = None
        for _ in range(rounds):
            a = flow(graph, h, "od", n)   # auth: forward, /outdeg
            h = flow(gt, a, "idg", n)     # hub: transpose, /indeg
            for old in retained:
                try:
                    old.unpersist()
                except Exception:
                    pass
            retained = [a, h]

    hub_col, auth_col = F.col("h.x"), F.col("a.x")
    if round_to is not None:
        hub_col = F.round(hub_col, round_to) + F.lit(0.0)
        auth_col = F.round(auth_col, round_to) + F.lit(0.0)
    out = (
        h.alias("h")
        .join(a.alias("a"), F.col("h.vid") == F.col("a.vid"))
        .select(F.col("h.vid").alias("vid"), hub_col.alias("hub"), auth_col.alias("auth"))
        .localCheckpoint(eager=True)
    )
    if own_transpose:
        gt.unpersist()
    return out
