"""Graph coarsening by matching contraction — the multilevel primitive
(METIS-style heavy-edge coarsening, Karypis & Kumar '98; here with the
deterministic Israeli–Itai local-min matching already in algos/matching).

One coarsening level = contract every matched pair (u, v) into the
supervertex u (= min of the pair, since the matching emits u < v) and
re-aggregate parallel edges into integer weights.  Iterating levels
halves |V| roughly per level — the standard preconditioner for
partitioning, layout, and multilevel community detection.

Plan shape: the matching is the existing oracle-checked kernel; the
contraction is two vid-keyed equi-joins of the edge table against the
|V|-row mapping (src side, then dst side) plus one (src, dst) groupBy —
three shuffles total per level at any scale, all on uniformly-hashed
vertex keys (the mapping inherits the graph's own key distribution; hub
supervertices are exactly the hubs the salted-join machinery already
watches).  Nothing is collected; the mapping stays distributed.

Exactness: the matching is deterministic (fixed md5 edge priorities) and
the contraction is pure integer join/count arithmetic, so the coarse
graph hash-checks against a DuckDB mirror."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.algos.matching import maximal_matching


def coarsen_mapping(graph, rounds: int | None = None, max_rounds: int = 64) -> DataFrame:
    """(vid, sup) — each vertex's supervertex after one matching level.
    Matched pair (u, v) maps both ends to u; unmatched vertices map to
    themselves.  A vertex is in at most one matched edge (matching
    property), so the two left joins each hit <= 1 row."""
    m = maximal_matching(graph, rounds=rounds, max_rounds=max_rounds).select("u", "v")
    verts = graph.degrees().select("vid")
    as_u = m.select(F.col("u").alias("vid"), F.col("u").alias("su"))
    as_v = m.select(F.col("v").alias("vid"), F.col("u").alias("sv"))
    return (
        verts.join(as_u, "vid", "left")
        .join(as_v, "vid", "left")
        .select(
            "vid",
            F.coalesce(F.col("su"), F.col("sv"), F.col("vid")).alias("sup"),
        )
    )


def coarsen_graph(
    graph, rounds: int | None = None, max_rounds: int = 64
) -> tuple[DataFrame, DataFrame]:
    """Returns (super_edges, mapping): super_edges = (src, dst, weight)
    with weight = number of fine edges contracted into the coarse edge
    (self-loops from intra-pair edges dropped), mapping = (vid, sup).

    The input's directed-both-ways convention is preserved: the coarse
    graph carries both directions with equal weights, so it feeds
    straight back into LinkGraph for the next level."""
    mp = coarsen_mapping(graph, rounds=rounds, max_rounds=max_rounds)
    src_map = mp.select(F.col("vid").alias("src"), F.col("sup").alias("ssrc"))
    dst_map = mp.select(F.col("vid").alias("dst"), F.col("sup").alias("sdst"))
    se = (
        graph.edges.join(src_map, "src")
        .join(dst_map, "dst")
        .where(F.col("ssrc") != F.col("sdst"))
        .groupBy(F.col("ssrc").alias("src"), F.col("sdst").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    return se, mp
