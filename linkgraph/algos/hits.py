"""HITS hubs & authorities (Kleinberg 1999) — fixed-budget power iteration.

Directed-graph kernel: per round, authority(v) = Σ_{u→v} hub(u) then
hub(u) = Σ_{u→v} auth(v), each L2-normalized over ALL vertices.  Runs a
fixed round budget so the computation is mirrorable step-for-step by an
unrolled SQL oracle (the PR/LPA fixed-budget pattern); scores converge to
the principal singular vectors of the adjacency matrix.

Plan shape (the PR one-job-per-step discipline):

* the authority half-step flows hub mass FORWARD through the graph's
  src-partitioned edge table via LinkGraph.expand (byte-gated broadcast /
  salted / plain shuffle);
* the hub half-step needs the TRANSPOSE expansion.  Rather than joining
  the edge table on dst (which would re-shuffle all |E| rows every
  round), the constructor builds a transpose LinkGraph once — the CSC to
  the forward table's CSR, the same pairing every matrix engine keeps for
  A·x vs Aᵀ·x — and both half-steps become co-partitioned expands;
* each half-step is ONE Spark job: expand + aggregate + lazy
  localCheckpoint, materialized by the Σx² norm aggregate whose scalar
  then rides into the next half-step as a literal (the normalization
  division never needs its own pass).  Vertices receiving no mass stay
  absent from the loop state (zero rows change neither the norm nor the
  next expansion); the vertex set is attached once at the end;
* runs under iteration_plan (AQE off, shuffled-hash) like every other
  iterative kernel here.

Determinism: float summation order differs across engines, so outputs
are rounded (`round_to`) for oracle comparison; raw doubles agree to
~1e-12 at the tested scales.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, iteration_plan


def hits(
    graph: LinkGraph,
    rounds: int = 8,
    round_to: int | None = 6,
    transpose: LinkGraph | None = None,
) -> DataFrame:
    """Returns (vid, hub, auth) over all vertices of the directed graph.

    transpose: pass a pre-built reverse-edge LinkGraph to reuse across
    calls; built (and released) internally otherwise.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = graph.spark
    own_transpose = transpose is None
    gt = transpose or LinkGraph(
        graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        materialize=False,
    )
    verts = graph.vertices().select("vid").localCheckpoint(eager=True)
    n = verts.count()

    # hub starts uniform at 1/sqrt(n) (unit L2 norm) — any positive start
    # converges; unit-norm keeps intermediate magnitudes O(1).
    h = verts.select("vid", F.lit(1.0 / math.sqrt(n)).alias("x"))

    def half_step(g: LinkGraph, scores: DataFrame) -> DataFrame:
        """One normalized half-step: flow `scores` along g's edges, sum
        per destination.  Vertices receiving no mass are simply ABSENT
        from the result — a zero score contributes nothing to the next
        expansion nor to the L2 norm, so carrying explicit zero rows
        through the loop (the old per-half-step |V|-row verts left-join)
        was pure overhead; the full vertex set is re-attached once at the
        end."""
        msgs = scores.select(F.col("vid").alias("src"), "x")
        raw = (
            g.expand(msgs, est_rows=n)
            .groupBy("dst")
            .agg(F.sum("x").alias("x"))
            .withColumnRenamed("dst", "vid")
            .localCheckpoint(eager=False)
        )
        norm = math.sqrt(raw.agg(F.sum(F.col("x") * F.col("x")).alias("s")).first()["s"])
        return raw.select("vid", (F.col("x") / F.lit(norm)).alias("x")), raw

    retained: list[DataFrame] = []
    with iteration_plan(spark):
        a = None
        for _ in range(rounds):
            a, keep_a = half_step(graph, h)      # auth(v) = Σ hub over in-edges
            h, keep_h = half_step(gt, a)         # hub(u)  = Σ auth over out-edges
            for old in retained:
                try:
                    old.unpersist()
                except Exception:
                    pass
            retained = [keep_a, keep_h]

    hub_col = F.coalesce(F.col("h.x"), F.lit(0.0))
    auth_col = F.coalesce(F.col("a.x"), F.lit(0.0))
    if round_to is not None:
        hub_col = F.round(hub_col, round_to)
        auth_col = F.round(auth_col, round_to)
    out = (
        verts.alias("v")
        .join(h.alias("h"), F.col("v.vid") == F.col("h.vid"), "left")
        .join(a.alias("a"), F.col("v.vid") == F.col("a.vid"), "left")
        .select(F.col("v.vid").alias("vid"), hub_col.alias("hub"), auth_col.alias("auth"))
    )
    if own_transpose:
        # materialize before releasing the transpose cache the plan reads
        out = out.localCheckpoint(eager=True)
        gt.unpersist()
    return out
