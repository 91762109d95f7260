"""Distributed builder for the large scaling-bench graph.

The zipf_100000 graph (102M directed edges) is derived through the full
transcript pipeline, but at that size a 10-iteration kernel run is mostly
per-iteration fixed cost (driver planning + job scheduling ~0.5-2s/iter),
which caps measurable scaling efficiency long before the hardware does.
This builder synthesizes a 4-6x larger graph with the same SHAPE as the
shared-tool derivation output — Zipf-ish degree law with extreme hubs,
dense vids 0..V-1, symmetric closure, no self loops — generated entirely
distributedly (spark.range + xxhash64, deterministic, no driver-side data)
so it builds in minutes instead of the hours the quadratic derivation
self-join would need at this scale.

out-degree law (pre-closure): deg(k) = clip(C/(k+1)^0.7, ., cap); C is
solved so sum(deg) ~= e_target.  dst = xxhash64(src, i) mod V.

Usage: python BENCH/make_graph_synth.py [V] [e_target] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    e_target = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000_000
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "BENCH", "data", f"synth_{V}")
    )
    cap = min(300_000, V - 1)
    alpha = 0.7

    from pyspark.sql import functions as F

    from linkgraph.session import get_spark

    # solve C so sum over k of clip(C/(k+1)^alpha, 1, cap) == e_target
    ranks = np.arange(1, V + 1, dtype=np.float64)
    w = ranks**-alpha
    lo, hi = 1.0, 1e12
    for _ in range(80):
        C = (lo + hi) / 2
        tot = np.clip(C * w, 1, cap).sum()
        lo, hi = (C, hi) if tot < e_target else (lo, C)
    C = (lo + hi) / 2

    spark = get_spark(master="local[32]", app_name="make-synth-graph")
    t0 = time.time()
    deg_expr = F.least(
        F.lit(cap),
        F.greatest(F.lit(1), (F.lit(C) * F.pow(F.col("src") + 1, -alpha)).cast("long")),
    )
    base = (
        spark.range(V)
        .select(F.col("id").alias("src"))
        .repartition(256)  # hub rows explode into up to `cap` edges each
        .withColumn("deg", deg_expr)
        .select("src", F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("i"))
        .select(
            "src",
            F.pmod(F.xxhash64("src", "i"), F.lit(V)).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    sym = base.union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    shaped = sym.repartition(64, "src").sortWithinPartitions("src", "dst")
    shaped.write.mode("overwrite").parquet(os.path.join(out, "edges"))

    edges = spark.read.parquet(os.path.join(out, "edges"))
    E = edges.count()
    meta = {
        "V": V,
        "E_directed": E,
        "e_target_preclosure": e_target,
        "alpha": alpha,
        "cap": cap,
        "C": round(C, 1),
        "generator": "make_graph_synth.py (deterministic xxhash64)",
        "build_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))
    spark.stop()


if __name__ == "__main__":
    main()
