"""K3 mid-range bitmap side-channel evidence (VERDICT r3 item 2).

Fixture: the dense small-diameter graph from bottomup_bench.py, but with
spark.sql.autoBroadcastJoinThreshold forced down to 64KB so NEITHER the
open nor the closed destination set clears the row-broadcast gate — the
mid-range regime where round 3 fell back to a post-expand message
anti-join (per-level shuffle of the ~|V|-row closed set).  The bitmap
side-channel packs the closed set into a |V|-bit broadcast (1 bit vs ~24
bytes per row) and drops closed-dst messages map-side before the dst
shuffle.

Two fixtures, each run with three variants interleaved in one JVM after a
warmup (variant start order rotates per run so a co-tenant burst cannot
systematically tax one variant):

* dense  — the bottomup_bench ER graph (diameter ~4): the gate engages on
  ONE level, so any per-level delta is diluted 5x.  Kept for continuity.
* ladder — B blocks of K vertices, each vertex wired to DEG2 xxhash64
  destinations in the next block (diameter = B).  The deep-graph analog of
  the 10^12-turn turn-adjacency chains the gate targets: from mid-depth
  on, every level has a mid-range closed set (too big to row-broadcast)
  and HALF of all messages point one block back at fully-closed vertices —
  the bitmap's exact prey, level after level.

Variants:

* top_down  — bottom_up=False (push-only baseline)
* msg_anti  — gate on, bitmap disabled (round-3 fallback)
* bitmap    — gate on, bitmap enabled (round-4 side-channel)

Also asserts the intended strategy actually engaged (res.strategies).

Usage: python BENCH/bitmap_bench.py [runs] [dense|ladder|both]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V = 300_000
DEG = 64

LADDER_B = 24  # blocks (graph diameter)
LADDER_K = 2_000  # vertices per block
LADDER_DEG = 64  # forward fan-out per vertex


def dense_graph(spark):
    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph

    base = spark.range(V).select(F.col("id").alias("src"))
    e = (
        base.select(
            "src", F.explode(F.sequence(F.lit(0), F.lit(DEG - 1))).alias("j")
        )
        .select(
            "src",
            F.pmod(F.xxhash64(F.col("src"), F.col("j")), F.lit(V)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return LinkGraph.from_undirected(e, materialize=True)


def ladder_graph(spark):
    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph

    n = LADDER_B * LADDER_K
    base = spark.range(n).select(F.col("id").alias("src"))
    blk = F.floor(F.col("src") / LADDER_K)
    e = (
        base.where(blk < LADDER_B - 1)
        .select(
            "src",
            blk.alias("b"),
            F.explode(F.sequence(F.lit(0), F.lit(LADDER_DEG - 1))).alias("j"),
        )
        .select(
            "src",
            (
                (F.col("b") + 1) * LADDER_K
                + F.pmod(F.xxhash64(F.col("src"), F.col("j")), F.lit(LADDER_K))
            ).alias("dst"),
        )
    )
    return LinkGraph.from_undirected(e, materialize=True)


def bench_graph(spark, g, srcs, runs):
    import itertools

    from linkgraph.algos.msbfs import msbfs

    # warmup: JIT the 8-limb codegen + Python worker pool (untimed)
    msbfs(g, srcs, max_levels=1)

    variants = {
        "top_down": dict(bottom_up=False),
        "msg_anti": dict(bottom_up=True, bottom_up_bitmap=False),
        "bitmap": dict(bottom_up=True, bottom_up_bitmap=True),
    }
    expect = {"msg_anti": "msg_anti", "bitmap": "bitmap"}
    names = list(variants)
    times = {k: [] for k in variants}
    strategies = {}
    for r in range(runs):
        order = names[r % len(names):] + names[: r % len(names)]  # rotate
        for name in order:
            t0 = time.time()
            res = msbfs(g, srcs, **variants[name])
            times[name].append(round(time.time() - t0, 2))
            strategies[name] = res.strategies
            if name in expect:
                assert expect[name] in res.strategies, (name, res.strategies)
    med = {k: statistics.median(v) for k, v in times.items()}
    n_engaged = sum(1 for s in strategies.get("bitmap", []) if s == "bitmap")
    return {
        "V": g.num_vertices(),
        "E_directed": g.num_edges(),
        "nsrc": len(srcs),
        "levels": len(strategies.get("bitmap", [])),
        "bitmap_levels_engaged": n_engaged,
        "strategies": strategies,
        "median_sec": med,
        "all_sec": times,
        "bitmap_vs_msg_anti": round(med["msg_anti"] / med["bitmap"], 3),
        "bitmap_vs_top_down": round(med["top_down"] / med["bitmap"], 3),
    }


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    which = sys.argv[2] if len(sys.argv) > 2 else "both"

    from linkgraph.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="bitmap-bench",
    )
    # force the mid-range: no row-set broadcasts anywhere in the K3 gate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64k")

    out = {"runs": runs, "autoBroadcastJoinThreshold": "64k", "fixtures": {}}
    fixtures = {"dense": dense_graph, "ladder": ladder_graph}
    if which != "both":
        fixtures = {which: fixtures[which]}
    for name, builder in fixtures.items():
        g = builder(spark)
        srcs = (
            g.top_degree_vids(512)
            if name == "dense"
            else list(range(512))  # ladder: sources in block 0
        )
        out["fixtures"][name] = bench_graph(spark, g, srcs, runs)
        g.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
