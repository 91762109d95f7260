"""Salted-join skew evidence (SURVEY.md J2; VERDICT r1 item 3).

Measures the frontier-expand join + aggregate (the PageRank/MS-BFS
iteration shape) with broadcast DISABLED — the regime a 10^9-vertex
frontier is in, where the message table can never broadcast and the
reducer owning a hub vertex becomes the straggler.

The derivation-built bench graphs are deliberately hub-CAPPED (that is
the derivation's own skew defense), so they carry no join skew — measured
on zipf_100000, salting is pure overhead (plain 0.87s vs salted 4.99s,
n_hubs=0).  The operator exists for the graphs that ARRIVE skewed, so
this bench synthesizes one deterministically: `n_hubs` vertices own
`hub_deg` out-edges each while the tail has `tail_deg`, giving one
reducer several hub edge lists under plain hash partitioning.

Three physical strategies over identical input:

* plain          — shuffle join, AQE skew-join OFF (the naive plan)
* plain+aqeskew  — shuffle join, AQE skew-join ON (runtime backstop)
* salted         — SaltedEdges pre-salting (hash(dst)%S buckets per hub,
                   frontier rows replicated into S) + AQE skew-join OFF

Variants are interleaved in ONE JVM after a warmup pass, medians
reported — same noise protocol as scaling.py.

Usage: python BENCH/skew_bench.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Fixture knobs (env-overridable): the operative ratio is HUB_DEG vs the
# per-reducer share |E|/P — a hub below ~1 share adds no straggler (measured:
# salted is ~2x SLOWER there, replication cost with nothing to fix), while a
# hub of several shares IS the straggler and salting wins.  Run both regimes
# to locate the crossover that the auto-salt factor gate encodes.
V = int(os.environ.get("SKEW_V", 2_000_000))
N_HUBS = int(os.environ.get("SKEW_N_HUBS", 8))
HUB_DEG = int(os.environ.get("SKEW_HUB_DEG", 1_500_000))
TAIL_DEG = int(os.environ.get("SKEW_TAIL_DEG", 40))


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

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
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    deg_expr = F.when(F.col("src") < N_HUBS, F.lit(HUB_DEG)).otherwise(F.lit(TAIL_DEG))
    edges = (
        spark.range(V)
        .select(F.col("id").alias("src"))
        .repartition(128)
        .withColumn("deg", deg_expr)
        .select("src", F.explode(F.sequence(F.lit(0), F.col("deg") - 1)).alias("i"))
        .select("src", F.pmod(F.xxhash64("src", "i"), F.lit(V)).cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    # directed graph, hub skew preserved (no symmetric closure — closure
    # would hand every hub a reverse-edge list too and dilute the point)
    g = LinkGraph(edges, materialize=True)
    E = g.num_edges()
    salted = SaltedEdges(g, hub_threshold=10 * TAIL_DEG, s=8)
    n_hubs = salted.hubs.count()
    salted.edges.count()  # materialize the salted cache before timing

    msgs = (
        g.degrees()
        .select(F.col("vid").alias("src"), (1.0 / F.col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )

    def run_plain(skew_on: bool) -> float:
        spark.conf.set("spark.sql.adaptive.enabled", str(skew_on).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        t0 = time.time()
        g.edges.join(msgs, "src").groupBy("dst").agg(F.sum("w")).count()
        return time.time() - t0

    def run_salted() -> float:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
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
        "V": V,
        "E_directed": E,
        "n_hubs": n_hubs,
        "hub_deg": HUB_DEG,
        "tail_deg": TAIL_DEG,
        "salt_buckets": 8,
        "runs": runs,
        "median_sec": med,
        "salted_speedup_vs_plain": round(med["plain"] / med["salted"], 2),
        "salted_speedup_vs_aqeskew": round(med["plain+aqeskew"] / med["salted"], 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
