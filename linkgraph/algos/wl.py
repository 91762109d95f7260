"""Weisfeiler–Lehman color refinement — the 1-WL vertex fingerprint.

Iteratively recolor every vertex with a hash of (own color, SORTED
multiset of neighbor colors); after k rounds two vertices share a color
iff 1-WL cannot distinguish their k-hop neighborhoods.  The classic
graph-isomorphism test and THE feature map of WL graph kernels /
GNN-expressiveness analysis [Weisfeiler & Lehman 1968; Shervashidze
et al., JMLR 2011] — per-vertex structural fingerprints for dedup of
graph neighborhoods, stratified sampling by structure, and GNN
sanity checks (what 1-WL cannot separate, a message-passing GNN cannot
either).

Relational form, one round = the ANP shape with an ORDER-CANONICAL
aggregate:

    msgs   = expand(color)                   # co-partitioned edge join
    multiset(v) = concat_ws(',', array_sort(collect_list(color)))
    color'(v)   = md5(color(v) || '|' || multiset(v))

* collect_list is partition-order-nondeterministic, so the canonical
  array_sort BEFORE hashing is what makes the refinement deterministic
  and engine-portable (DuckDB mirrors with string_agg(... ORDER BY) —
  both sorts are plain byte order on ascii hex strings);
* the multiset string is O(deg) bytes; at web scale cap the round count
  (k=2..3 is the standard kernel depth) — colors converge to the stable
  partition in ≤ diameter rounds anyway;
* md5 keeps colors 32 bytes regardless of degree, and is the one hash
  both engines share bit-for-bit (the portable family used by MinHash's
  oracle mode).

Initial color = degree (as a string), the standard 1-WL seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, iteration_plan


def wl_refine(graph: LinkGraph, rounds: int = 3) -> DataFrame:
    """Returns (vid, color) after `rounds` of 1-WL refinement; color is
    a 32-hex md5 string (round 0 colors = degree strings)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    spark = graph.spark
    n = graph.num_vertices()
    color = (
        graph.degrees()
        .select("vid", F.col("deg").cast("string").alias("color"))
        .localCheckpoint(eager=True)
    )
    prev = None
    with iteration_plan(spark):
        for _ in range(rounds):
            msgs = color.select(F.col("vid").alias("src"), F.col("color").alias("c"))
            agg = (
                graph.expand(msgs, est_rows=n)
                .groupBy("dst")
                .agg(
                    F.concat_ws(",", F.array_sort(F.collect_list("c"))).alias("ms")
                )
            )
            new = (
                color.alias("st")
                .join(agg.alias("nb"), F.col("st.vid") == F.col("nb.dst"), "left")
                .select(
                    F.col("st.vid").alias("vid"),
                    F.md5(
                        F.concat_ws(
                            "|", F.col("st.color"), F.coalesce(F.col("nb.ms"), F.lit(""))
                        )
                    ).alias("color"),
                )
                .localCheckpoint(eager=False)
            )
            new.count()
            if prev is not None:
                try:
                    prev.unpersist()
                except Exception:
                    pass
            prev, color = color, new
    return color.select(F.col("vid").cast("long").alias("vid"), "color")


def wl_class_sizes(graph: LinkGraph, rounds: int = 3) -> DataFrame:
    """(color, n_vertices) histogram of the round-k WL partition — the
    compact fingerprint two graphs can be compared by."""
    return (
        wl_refine(graph, rounds)
        .groupBy("color")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    )
