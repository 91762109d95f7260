"""Label propagation (community detection) — synchronous, deterministic
(SURVEY.md A6): each round a vertex adopts the most frequent neighbor label,
ties broken by smallest label.  Fixed iteration budget + convergence check
(exact at convergence); deterministic by construction, so two runs agree
bit-for-bit (tested).

Scale shape: labels flow through LinkGraph.expand (byte-gated broadcast /
salted or plain shuffle join); previous labels are carried in the state so
the changed-count is a column aggregate, not a join.  One heavy Spark job
per round (expand + vote count + one-aggregate argmax + update); the argmax
is min(struct(-n, l)) — a partial+final hash agg, no per-round window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def label_propagation(
    graph: LinkGraph,
    max_iter: int = 10,
    checkpoint_mgr=None,
    snapshot_every: int = 5,
    resume: bool = False,
    verbose: bool = False,
) -> DataFrame:
    """Returns (vid, label).

    checkpoint_mgr/snapshot_every/resume mirror connected_components: every
    `snapshot_every` rounds the (vid, label) state is snapshotted with
    lineage + metrics, and resume=True continues from the latest committed
    snapshot — the north_rule's "resumable from checkpoint" applies to all
    iterative kernels, and LPA is deterministic, so a resumed run equals an
    uninterrupted one bit-for-bit (tested)."""
    n = graph.num_vertices()
    it0 = 0
    labels = None
    if resume and checkpoint_mgr is not None:
        snap = checkpoint_mgr.latest()
        if snap is not None:
            labels = checkpoint_mgr.read_state(snap)
            it0 = int(snap["metrics"]["iteration"])
    if labels is None:
        labels = graph.vertices().select("vid", F.col("vid").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    changed = None
    prev = None
    from linkgraph.graph import iteration_plan

    with iteration_plan(graph.spark):
        for it in range(it0, max_iter):
            msgs = labels.select(F.col("vid").alias("src"), F.col("label").alias("l"))
            votes = graph.expand(msgs, est_rows=n).groupBy("dst", "l").agg(
                F.count("*").alias("n")
            )
            # argmax(n, tie -> min l) as ONE hash aggregate: min over
            # struct(-n, l) orders by count desc then label asc.  The
            # groupBy+row_number window form costs an extra exchange + sort
            # on dst per round; this is a partial+final agg on the same key.
            winner = votes.groupBy("dst").agg(
                F.min(F.struct((-F.col("n")).alias("nn"), F.col("l"))).alias("m")
            ).select(F.col("dst"), F.col("m.l").alias("new_label"))
            new_labels = (
                labels.alias("st")
                .join(winner.alias("wn"), F.col("st.vid") == F.col("wn.dst"), "left")
                .select(
                    F.col("st.vid").alias("vid"),
                    F.coalesce(F.col("wn.new_label"), F.col("st.label")).alias("label"),
                    F.col("st.label").alias("pl"),
                )
                # lazy: materialized by the changed-count aggregate — one
                # fused job per round (AQE-off loop; see pagerank.py)
                .localCheckpoint(eager=False)
            )
            changed = int(
                new_labels.agg(
                    F.sum(F.when(F.col("label") != F.col("pl"), 1).otherwise(0)).alias("n")
                ).first()["n"]
                or 0
            )
            if prev is not None:
                try:
                    prev.unpersist()
                except Exception:
                    pass
            prev, labels = labels, new_labels
            if verbose:
                print(f"[lpa] iter {it}: changed={changed}", flush=True)
            if checkpoint_mgr is not None and (it + 1) % snapshot_every == 0:
                labels = checkpoint_mgr.write_state(
                    labels.select("vid", "label"), it + 1,
                    {"iteration": it + 1, "changed": int(changed)},
                ).localCheckpoint(eager=True)
            if changed == 0:
                break
    if changed and verbose:
        # a fixed iteration budget is normal operation for LPA — note it
        # rather than warn (CC, whose docstring promises exactness, warns)
        print(
            f"[lpa] iteration budget exhausted with {changed} labels still "
            f"changing (budget snapshot returned)",
            flush=True,
        )
    return labels.select("vid", "label")
