"""K3 mid-range bitmap side-channel evidence (VERDICT r3 item 2).

Fixture: the dense small-diameter graph from bottomup_bench.py, but with
spark.sql.autoBroadcastJoinThreshold forced down to 64KB so NEITHER the
open nor the closed destination set clears the row-broadcast gate — the
mid-range regime where round 3 fell back to a post-expand message
anti-join (per-level shuffle of the ~|V|-row closed set).  The bitmap
side-channel packs the closed set into a |V|-bit broadcast (1 bit vs ~24
bytes per row) and drops closed-dst messages map-side before the dst
shuffle.

Variants over identical input, interleaved in one JVM after a warmup:

* top_down  — bottom_up=False (push-only baseline)
* msg_anti  — gate on, bitmap disabled (round-3 fallback)
* bitmap    — gate on, bitmap enabled (round-4 side-channel)

Also asserts the intended strategy actually engaged (res.strategies).

Usage: python BENCH/bitmap_bench.py [runs]
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


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from linkgraph.algos.msbfs import msbfs
    from linkgraph.graph import LinkGraph
    from linkgraph.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="bitmap-bench",
    )
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
    g = LinkGraph.from_undirected(e, materialize=True)
    E = g.num_edges()
    srcs = g.top_degree_vids(512)

    # warmup: JIT the 8-limb codegen + Python worker pool (untimed)
    msbfs(g, srcs, max_levels=1)

    # force the mid-range: no row-set broadcasts anywhere in the K3 gate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64k")

    variants = {
        "top_down": dict(bottom_up=False),
        "msg_anti": dict(bottom_up=True, bottom_up_bitmap=False),
        "bitmap": dict(bottom_up=True, bottom_up_bitmap=True),
    }
    expect = {"msg_anti": "msg_anti", "bitmap": "bitmap"}
    times = {k: [] for k in variants}
    strategies = {}
    for r in range(runs):
        for name, kw in variants.items():
            t0 = time.time()
            res = msbfs(g, srcs, **kw)
            times[name].append(round(time.time() - t0, 2))
            strategies[name] = res.strategies
            if name in expect:
                assert expect[name] in res.strategies, (name, res.strategies)
    med = {k: statistics.median(v) for k, v in times.items()}
    out = {
        "V": V,
        "E_directed": E,
        "deg": DEG,
        "nsrc": len(srcs),
        "runs": runs,
        "autoBroadcastJoinThreshold": "64k",
        "strategies": strategies,
        "median_sec": med,
        "all_sec": times,
        "bitmap_vs_msg_anti": round(med["msg_anti"] / med["bitmap"], 3),
        "bitmap_vs_top_down": round(med["top_down"] / med["bitmap"], 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
