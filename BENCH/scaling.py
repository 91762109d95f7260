"""Scaling-efficiency evidence (BASELINE.md protocol): run scaling_job.py at
local[8] (N) and local[32] (4N) on the identical pre-built graph, ≥3 runs
each in fresh JVMs, report median throughput at both plus

    eff = (throughput_32 / throughput_8) / 4        (target ≥ 0.8)

appended to BENCH/BASELINE.md.

Usage: python BENCH/scaling.py [runs] [graph_dir]
       (build the graph first: python BENCH/make_graph.py)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, graph_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_GRAPH=graph_dir,
        # identical heap at both levels; local-mode driver heap backs all tasks
        LINKGRAPH_DRIVER_MEM=os.environ.get("LINKGRAPH_DRIVER_MEM", "48g"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "scaling_job.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    graph_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH", "data", "zipf_100000")
    )

    results: dict[int, list[dict]] = {8: [], 32: []}
    for i in range(runs):
        for cpus in (8, 32):
            t0 = time.time()
            r = run_once(cpus, graph_dir)
            print(
                f"run {i} local[{cpus}]: msbfs={r['msbfs_sec']}s "
                f"teps={r['msbfs_teps']:,.0f} pr10={r['pagerank10_sec']}s "
                f"({time.time() - t0:.0f}s total)",
                flush=True,
            )
            results[cpus].append(r)

    def med(cpus, key):
        return statistics.median(r[key] for r in results[cpus])

    rows = []
    for metric, key, unit in [
        ("MS-BFS 512-lane batch", "msbfs_teps", "bit-edge traversals/s"),
        ("PageRank 10 iterations", "pagerank_edge_iters_per_sec", "edge-iters/s"),
    ]:
        t8, t32 = med(8, key), med(32, key)
        rows.append((metric, t8, t32, (t32 / t8) / 4, unit))

    meta = {}
    mp = os.path.join(graph_dir, "meta.json")
    if os.path.exists(mp):
        meta = json.load(open(mp))

    lines = [
        "",
        f"## Scaling run — {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        f"Input: `{graph_dir}` (V={meta.get('V', '?'):,}, directed E="
        f"{meta.get('E_directed', '?'):,}, Zipf hub-tool graph, seed 42); "
        f"{runs} runs per level, medians, fresh JVM per run, identical confs "
        "(AQE on, shuffle.partitions=32).",
        "",
        "| metric | local[8] (N) | local[32] (4N) | efficiency (thr_4N/thr_N)/4 | unit |",
        "| --- | --- | --- | --- | --- |",
    ]
    for m, t8, t32, eff, unit in rows:
        flag = "" if eff >= 0.8 else " ⚠️"
        lines.append(f"| {m} | {t8:,.0f} | {t32:,.0f} | **{eff:.3f}**{flag} | {unit} |")
    lines += [
        "",
        f"Raw medians: msbfs local[8]={med(8, 'msbfs_sec')}s "
        f"local[32]={med(32, 'msbfs_sec')}s; pagerank10 local[8]="
        f"{med(8, 'pagerank10_sec')}s local[32]={med(32, 'pagerank10_sec')}s.",
    ]
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
