"""Bipartiteness / odd-cycle detection per connected component.

A component is bipartite iff a BFS 2-coloring from any root yields no
edge whose endpoints share a color — equivalently, no odd cycle.  The
distributed form:

  1. components (existing min-label kernel) pick a deterministic root
     per component (min vid);
  2. ONE multi-root BFS runs all components simultaneously — roots are
     in disjoint components, so their frontiers never interfere and a
     single (vid, dist) table serves every component at once (one
     frontier-expand join per level, the msbfs/sssp loop shape, with
     the measured frontier count threaded into expand(est_rows=…));
  3. parity = dist % 2; a conflict is a symmetric edge (src < dst side)
     with equal endpoint parity — one join against the parity table,
     counted per component.

Driver actions are one bounded scalar per level (the same budget shape
as sssp.py's frontier_rows).  At 100 TB the per-level cost is the same
frontier-expand join every BFS here pays; no new shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algos.components import connected_components
from linkgraph.graph import LinkGraph, iteration_plan


def bipartite_check(graph: LinkGraph, max_levels: int = 64) -> DataFrame:
    """(comp, n_vertices, n_odd_edges, is_bipartite) per component —
    n_odd_edges counts conflict edges (src < dst orientation) whose BFS
    parities from the component's min-vid root coincide."""
    comps = connected_components(graph).localCheckpoint(eager=True)
    roots = comps.groupBy("comp").agg(F.min("vid").alias("vid"))
    visited = roots.select("vid", F.lit(0).alias("dist")).localCheckpoint(eager=True)
    frontier = visited
    with iteration_plan(graph.spark):
        for level in range(1, max_levels + 1):
            n_f = frontier.count()
            if n_f == 0:
                break
            msgs = frontier.select(F.col("vid").alias("src"))
            nxt = (
                graph.expand(msgs, est_rows=n_f)
                .select(F.col("dst").alias("vid"))
                .distinct()
                .join(visited, "vid", "left_anti")
                .withColumn("dist", F.lit(level))
                .localCheckpoint(eager=True)
            )
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    par = visited.select("vid", (F.col("dist") % 2).alias("par"))
    e = graph.edges.select("src", "dst").where(F.col("src") < F.col("dst"))
    odd = (
        e.join(
            par.select(F.col("vid").alias("src"), F.col("par").alias("ps")), "src"
        )
        .join(par.select(F.col("vid").alias("dst"), F.col("par").alias("pd")), "dst")
        .where(F.col("ps") == F.col("pd"))
        .join(comps.select(F.col("vid").alias("src"), "comp"), "src")
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_odd"))
    )
    cstats = comps.groupBy("comp").agg(F.count(F.lit(1)).alias("n_vertices"))
    return cstats.join(odd, "comp", "left").select(
        F.col("comp").cast("long").alias("comp"),
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.coalesce("n_odd", F.lit(0)).cast("long").alias("n_odd_edges"),
        (F.coalesce("n_odd", F.lit(0)) == 0).alias("is_bipartite"),
    )
