"""Label propagation (community detection) — synchronous, deterministic
(SURVEY.md A6): each round a vertex adopts the most frequent neighbor label,
ties broken by smallest label.  Fixed iteration budget + convergence check
(exact at convergence); deterministic by construction, so two runs agree
bit-for-bit (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def label_propagation(
    graph: LinkGraph,
    max_iter: int = 10,
    verbose: bool = False,
) -> DataFrame:
    """Returns (vid, label)."""
    labels = graph.vertices().select("vid", F.col("vid").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iter):
        votes = (
            graph.edges.join(
                F.broadcast(
                    labels.select(F.col("vid").alias("src"), F.col("label").alias("l"))
                ),
                "src",
            )
            .groupBy("dst", "l")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("l").asc())
        winner = (
            votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select(F.col("dst"), F.col("l").alias("new_label"))
        )
        new_labels = (
            labels.join(winner, labels["vid"] == winner["dst"], "left")
            .select(
                F.col("vid"),
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vid")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if verbose:
            print(f"[lpa] iter {it}: changed={changed}", flush=True)
        if changed == 0:
            break
    return labels
