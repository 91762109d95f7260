"""Deterministic random-walk corpus (DeepWalk/node2vec-style, p=q=1).

Generates fixed-length uniform random walks from a seed set — the other
standard GNN-training-data sampler next to k-hop fanout sampling.  Every
step choice is the argmin of the engine-portable md5 hash
`portable_hash60(src:dst:walk:seed:step)` over the current vertex's
out-edges, so the corpus is a PURE FUNCTION of (graph, seeds, walks,
length, seed): identical across runs, partitionings and engines, which
lets the driver hash-check the sampled walks themselves against a SQL
mirror (a seeded rand() walk never could be).

Scale shape per step:

* the walk frontier is |seeds|·walks rows — byte-gated broadcast through
  LinkGraph.expand, the edge table never moves;
* the neighbor choice is a partial+final MIN aggregate over
  struct(hash, dst) per walk — map-side combine reduces each walk's
  candidate set to one row per partition before the shuffle, so a walk
  sitting on a 10^6-degree hub ships P rows, not 10^6 (the same ANP
  shape as every other kernel here; a row_number window would ship the
  full candidate set instead);
* step count is a fixed budget — the driver loop issues one job chain
  with lazily-truncated lineage, no per-step action.

Walks stop early at sink vertices (no out-edges); on symmetric closures
every step succeeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.textops.dedup import portable_hash60


def random_walks(
    graph: LinkGraph,
    seeds: list[int],
    walk_len: int,
    walks_per_seed: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Returns (seed, walk, step, vid): step 0 is the seed vertex, steps
    1..walk_len follow hash-argmin uniform neighbor choices.  Rows for a
    walk end early if it reaches a sink."""
    if not seeds:
        raise ValueError("random_walks needs a non-empty seed list")
    if walk_len < 1 or walks_per_seed < 1:
        raise ValueError("walk_len and walks_per_seed must be >= 1")
    spark = graph.spark
    n_walks = len(seeds) * walks_per_seed
    cur = spark.createDataFrame(
        [(int(s), int(w), int(s)) for s in sorted(set(seeds)) for w in range(walks_per_seed)],
        "seed long, walk long, vid long",
    )
    frames = [cur.select("seed", "walk", F.lit(0).alias("step"), "vid")]
    for step in range(1, walk_len + 1):
        msgs = cur.select(F.col("vid").alias("src"), "seed", "walk")
        h = portable_hash60(
            F.concat_ws(
                ":", F.col("src"), F.col("dst"), F.col("walk"), F.lit(f"{seed}:{step}")
            )
        )
        cur = (
            graph.expand(msgs, est_rows=n_walks)
            .groupBy("seed", "walk")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst").alias("d"))).alias("m"))
            .select("seed", "walk", F.col("m.d").alias("vid"))
            .localCheckpoint(eager=False)
        )
        frames.append(cur.select("seed", "walk", F.lit(step).alias("step"), "vid"))
    out = frames[0]
    for fr in frames[1:]:
        out = out.union(fr)
    return out.select(
        F.col("seed").cast("long").alias("seed"),
        F.col("walk").cast("long").alias("walk"),
        F.col("step").cast("int").alias("step"),
        F.col("vid").cast("long").alias("vid"),
    )
