"""Connected components — min-label propagation to fixpoint (SURVEY.md A5).

comp(v) initialized to vid; each round v takes min(comp(v), min over
neighbors comp(u)), followed by a pointer-doubling shortcut
comp(v) <- min(comp(v), comp(comp(v))) (path compression, the same
contraction idea as large-star/small-star).  Shortcutting cuts rounds from
O(diameter) to O(log diameter) — the property that matters at 10^12-turn
scale where turn-adjacency chains have diameter in the tens of thousands.
Exact at convergence (changed-count == 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def connected_components(
    graph: LinkGraph,
    max_iter: int = 200,
    checkpoint_mgr=None,
    snapshot_every: int = 10,
    resume: bool = False,
    verbose: bool = False,
    shortcut: bool = True,
) -> DataFrame:
    """Returns (vid, comp) with comp = min vid reachable. Exact."""
    it0 = 0
    comp = None
    if resume and checkpoint_mgr is not None:
        snap = checkpoint_mgr.latest()
        if snap is not None:
            comp = checkpoint_mgr.read_state(snap)
            it0 = int(snap["metrics"]["iteration"])
    if comp is None:
        comp = graph.vertices().select("vid", F.col("vid").alias("comp"))
    comp = comp.localCheckpoint(eager=True)

    for it in range(it0, max_iter):
        # candidate labels from neighbors (edges partitioned by src: only the
        # small label table shuffles), then min with own label
        # label side is |V| rows with unknown stats after checkpointing —
        # broadcast explicitly (see pagerank.py for the SMJ fallback trap)
        nbr_min = (
            graph.edges.join(
                F.broadcast(
                    comp.select(F.col("vid").alias("src"), F.col("comp").alias("c"))
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("c").alias("nc"))
        )
        new_comp = comp.join(F.broadcast(nbr_min), comp["vid"] == nbr_min["dst"], "left").select(
            F.col("vid"),
            F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias("comp"),
        )
        if shortcut:
            # pointer doubling: comp(v) <- min(comp(v), comp(comp(v))).
            # comp values are vids, so the label table doubles as the
            # parent mapping; one extra equi-join per round buys O(log d)
            # total rounds instead of O(d).
            mapping = new_comp.select(
                F.col("vid").alias("comp"), F.col("comp").alias("cc")
            )
            new_comp = new_comp.join(mapping, "comp", "left").select(
                F.col("vid"),
                F.least(F.col("comp"), F.coalesce(F.col("cc"), F.col("comp"))).alias("comp"),
            )
        new_comp = new_comp.localCheckpoint(eager=True)
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "vid")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        comp = new_comp
        if verbose:
            print(f"[cc] iter {it}: changed={changed}", flush=True)
        if checkpoint_mgr is not None and (it + 1) % snapshot_every == 0:
            comp = checkpoint_mgr.write_state(
                comp, it + 1, {"iteration": it + 1, "changed": int(changed)}
            ).localCheckpoint(eager=True)
        if changed == 0:
            break
    return comp
