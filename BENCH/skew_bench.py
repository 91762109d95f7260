"""Salted-join skew evidence (SURVEY.md J2; VERDICT r1 item 3).

Measures the frontier-expand join + aggregate (the PageRank/MS-BFS
iteration shape) on the Zipf hub graph with broadcast DISABLED — the
regime a 10^9-vertex frontier is in, where the message table can never
broadcast and the shuffle join's reducer owning a hub vertex becomes the
straggler.  Three physical strategies over identical input:

* plain          — shuffle join, AQE skew-join OFF (the naive plan)
* plain+aqeskew  — shuffle join, AQE skew-join ON (runtime backstop)
* salted         — SaltedEdges pre-salting (hash(dst)%S buckets per hub,
                   frontier rows replicated into S) + AQE skew-join OFF

Variants are interleaved (p, a, s, p, a, s, ...) in ONE JVM after a
warmup pass, medians reported — same noise protocol as scaling.py.

Usage: python BENCH/skew_bench.py [runs] [graph_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    graph_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH", "data", "zipf_100000")
    )

    from pyspark.sql import functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.skew import SaltedEdges
    from linkgraph.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="skew-bench",
    )
    # broadcast off: at 10^9 vertices the frontier can never broadcast —
    # this is the regime the salted path exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    edges = spark.read.parquet(os.path.join(graph_dir, "edges"))
    g = LinkGraph(edges, symmetric=True)
    deg = g.degrees()
    top = deg.orderBy(F.col("deg").desc()).limit(1).collect()[0]
    p9999 = deg.approxQuantile("deg", [0.9999], 0.001)[0]
    salted = SaltedEdges(g, hub_threshold=max(int(p9999), 1), s=8)
    n_hubs = salted.hubs.count()
    # materialize both cached edge tables before timing
    g.edges.count()
    salted.edges.count()

    msgs = deg.select(F.col("vid").alias("src"), (1.0 / F.col("deg")).alias("w"))
    msgs = msgs.localCheckpoint(eager=True)

    def run_plain(skew_on: bool) -> float:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        t0 = time.time()
        g.edges.join(msgs, "src").groupBy("dst").agg(F.sum("w")).count()
        return time.time() - t0

    def run_salted() -> float:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t0 = time.time()
        salted.join_frontier(msgs).groupBy("dst").agg(F.sum("w")).count()
        return time.time() - t0

    variants = {
        "plain": lambda: run_plain(False),
        "plain+aqeskew": lambda: run_plain(True),
        "salted": run_salted,
    }
    for fn in variants.values():  # warmup (JIT, shuffle dirs)
        fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(runs):
        for name, fn in variants.items():
            dt = fn()
            times[name].append(dt)
            print(f"run {i} {name}: {dt:.2f}s", flush=True)

    med = {k: round(statistics.median(v), 2) for k, v in times.items()}
    out = {
        "graph": graph_dir,
        "V": g.num_vertices(),
        "E_directed": g.num_edges(),
        "top_degree": int(top["deg"]),
        "hub_threshold_p9999": int(p9999),
        "n_hubs": n_hubs,
        "runs": runs,
        "median_sec": med,
        "salted_speedup_vs_plain": round(med["plain"] / med["salted"], 2),
        "salted_speedup_vs_aqeskew": round(med["plain+aqeskew"] / med["salted"], 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
