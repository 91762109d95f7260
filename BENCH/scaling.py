"""Scaling-efficiency evidence (BASELINE.md protocol): run the same bench
job at local[8] (N) and local[32] (4N) on identical input and identical
confs, ≥3 runs each, report median throughput at both plus efficiency

    eff = (throughput_32 / throughput_8) / 4        (target ≥ 0.8)

Each run is a fresh subprocess (fresh JVM) so parallelism levels don't
share executor state.  Results are appended to BENCH/BASELINE.md.

Usage: python BENCH/scaling.py [runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    results: dict[int, list[dict]] = {8: [], 32: []}
    for i in range(runs):
        for cpus in (8, 32):
            t0 = time.time()
            r = run_once(cpus, sf_dir)
            print(
                f"run {i} local[{cpus}]: suite={r['value']}s gteps={r['gteps']} "
                f"({time.time() - t0:.0f}s total)",
                flush=True,
            )
            results[cpus].append(r)

    def med(cpus, key_fn):
        return statistics.median(key_fn(r) for r in results[cpus])

    # throughput metrics: MS-BFS bit-edge traversals/sec on both graphs,
    # PageRank edge·iterations/sec, whole-suite items/sec (1/value)
    rows = []

    def add(metric, thr_fn, unit):
        t8, t32 = med(8, thr_fn), med(32, thr_fn)
        eff = (t32 / t8) / 4 if t8 else float("nan")
        rows.append((metric, t8, t32, eff, unit))

    add(
        "MS-BFS 512-lane copurchase",
        lambda r: r["extras"]["msbfs_copurchase"]["bit_edge_traversals"]
        / r["queries"]["msbfs512_closeness_copurchase"],
        "bit-edge traversals/s",
    )
    add(
        "MS-BFS 512-lane zipf-hub",
        lambda r: r["extras"]["msbfs_zipf"]["bit_edge_traversals"]
        / r["queries"]["msbfs512_zipf"],
        "bit-edge traversals/s",
    )
    add(
        "PageRank 10 iter copurchase",
        lambda r: 10 * r["extras"]["copurchase"]["E_directed"]
        / r["queries"]["pagerank10_copurchase"],
        "edge-iters/s",
    )
    add("whole suite", lambda r: 1.0 / r["value"], "suites/s")

    lines = [
        "",
        f"## Scaling run — {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        f"Input: `{sf_dir}`; {runs} runs per level; medians; identical confs "
        "(AQE on, shuffle.partitions=32); fresh JVM per run.",
        "",
        "| metric | local[8] (N) | local[32] (4N) | efficiency | unit |",
        "| --- | --- | --- | --- | --- |",
    ]
    for m, t8, t32, eff, unit in rows:
        flag = "" if eff >= 0.8 else " ⚠️"
        lines.append(f"| {m} | {t8:,.0f} | {t32:,.0f} | **{eff:.3f}**{flag} | {unit} |")
    lines.append("")
    lines.append(
        f"Raw medians: suite wall local[8]={med(8, lambda r: r['value']):.1f}s, "
        f"local[32]={med(32, lambda r: r['value']):.1f}s."
    )
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
