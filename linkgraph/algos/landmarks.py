"""Landmark (sketch-based) shortest-path distance estimation.

The classic serving pattern for "how far apart are these two vertices?"
on a graph too big for per-query BFS (Potamias et al., CIKM'09): run ONE
offline multi-source BFS from L well-chosen landmarks (top-degree covers
best per the paper's experiments), store the L-dimensional distance
sketch per vertex, and answer any pair query with the triangle
inequality —

    max_l |d(l,u) - d(l,v)|  <=  d(u,v)  <=  min_l d(l,u) + d(l,v)

Spark shape: the offline phase IS the existing MS-BFS batch kernel
(bit-parallel lanes, one frontier shuffle per level), so L landmarks
cost one batch regardless of L <= 512.  The online phase filters the
(landmark, vid, dist) table to the query vertices BEFORE the self-join —
L x |query vertices| rows, broadcastable — so the per-query cost never
touches the full sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def landmark_distance_bounds(
    graph: LinkGraph,
    n_landmarks: int,
    pair_vids: list[int],
    max_levels: int,
) -> DataFrame:
    """Distance bounds for every unordered pair of `pair_vids` via
    `n_landmarks` top-degree landmarks (ties by vid: deterministic).

    Returns (u, v, d_lb, d_ub) for pairs with at least one landmark that
    reaches both endpoints within `max_levels`; pairs no landmark covers
    are absent (unknown, not infinite).  On a connected component both
    bounds are exact integers; d_lb = d_ub pins the true distance.
    """
    from linkgraph.algos.msbfs import msbfs

    landmarks = [
        r["vid"]
        for r in graph.degrees()
        .orderBy(F.col("deg").desc(), F.col("vid").asc())
        .limit(n_landmarks)
        .collect()
    ]
    res = msbfs(graph, landmarks, emit_distances=True, max_levels=max_levels)
    ids = [int(v) for v in pair_vids]
    # filter FIRST: L x |pair set| rows survive, the sketch never self-joins
    d = res.distances_df.where(F.col("vid").isin(ids)).select(
        F.col("src").alias("l"),
        F.col("vid").cast("long").alias("u"),
        F.col("dist").cast("int").alias("du"),
    )
    pairs = d.join(
        d.select(
            F.col("l"), F.col("u").alias("v"), F.col("du").alias("dv")
        ),
        "l",
    ).where(F.col("u") < F.col("v"))
    return pairs.groupBy("u", "v").agg(
        F.max(F.abs(F.col("du") - F.col("dv"))).cast("int").alias("d_lb"),
        F.min(F.col("du") + F.col("dv")).cast("int").alias("d_ub"),
    )
