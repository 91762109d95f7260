"""Kernel-vs-relational OR-aggregate A/B (VERDICT r3 stretch item 8).

The MS-BFS ANP aggregation has two cross-variant-tested modes:
  relational — groupBy(dst).agg(bit_or x8)   (partial+final hash agg, codegen)
  kernel     — applyInPandas numpy bitwise_or.reduceat per dst bucket

Hypothesis to test: on memory-bound dense levels the numpy kernel might
beat the 8-limb codegen path.  Two graph shapes, interleaved medians in
one JVM after warmup:

* dense  — the bottomup_bench ER-style graph (V=300k, deg 64): big frontier,
  aggregation-dominated levels.
* zipf   — hub-heavy derivation-shaped graph (xxhash64 Zipf-ish degrees):
  skewed dst key distribution, the kernel's per-bucket sort regime.

Decision rule (recorded in BENCH/BASELINE.md): auto-switch only if kernel
wins >= 1.3x on either shape; otherwise keep relational as the only
default and close the item with the measured table.

Usage: python BENCH/kernel_ab.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V = 150_000
DEG = 64
MAX_LEVELS = 3  # bound the A/B: identical level budget for both modes


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from pyspark.sql import functions as F

    from linkgraph.algos.msbfs import msbfs
    from linkgraph.graph import LinkGraph
    from linkgraph.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="kernel-ab",
    )

    def dense_graph():
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

    def zipf_graph():
        # Zipf-ish out-degrees: deg(i) ~ DEG_MAX / rank^0.7, dsts xxhash64-random
        base = spark.range(V).select(F.col("id").alias("src"))
        deg = F.greatest(
            F.lit(2),
            (F.lit(2000) / F.pow(F.col("src") + 1, F.lit(0.7))).cast("int"),
        )
        e = (
            base.select("src", F.explode(F.sequence(F.lit(0), deg - 1)).alias("j"))
            .select(
                "src",
                F.pmod(F.xxhash64(F.col("src"), F.col("j"), F.lit(7)), F.lit(V)).alias(
                    "dst"
                ),
            )
            .where(F.col("src") != F.col("dst"))
        )
        return LinkGraph.from_undirected(e, materialize=True)

    out = {"runs": runs, "shapes": {}}
    for shape, builder in (("dense", dense_graph), ("zipf", zipf_graph)):
        g = builder()
        srcs = g.top_degree_vids(512)
        msbfs(g, srcs, max_levels=1)  # warmup (JIT + worker pool)
        times = {"relational": [], "kernel": []}
        levels = {}
        for r in range(runs):
            for mode in times:
                t0 = time.time()
                res = msbfs(g, srcs, mode=mode, bottom_up=False, max_levels=MAX_LEVELS)
                times[mode].append(round(time.time() - t0, 2))
                print(f"[ab] {shape} {mode} run{r}: {times[mode][-1]}s", file=sys.stderr, flush=True)
                levels[mode] = res.levels
        med = {k: statistics.median(v) for k, v in times.items()}
        out["shapes"][shape] = {
            "V": g.num_vertices(),
            "E_directed": g.num_edges(),
            "levels": levels,
            "median_sec": med,
            "all_sec": times,
            "kernel_speedup": round(med["relational"] / med["kernel"], 3),
        }
        g.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
