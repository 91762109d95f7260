"""Scaling-efficiency evidence (BASELINE.md protocol).

The north_rule criterion is ≥0.8 throughput scaling efficiency from N to
4N *executors*.  No real cluster exists in the sandbox, so the same job
runs at two parallelism levels (driver instruction).  Two N→4N pairs are
reported:

* local[2] → local[8]  — PRIMARY.  Both levels are far below the box's
  memory-bandwidth saturation point, so adding cores approximates adding
  executor machines (every active core keeps its share of bandwidth).
  BENCH/probe_ceiling.py shows even pure-Python CPU work scales ~0.96
  here.
* local[8] → local[32] — reported for transparency.  At 32 threads one
  box saturates shared memory bandwidth; the ceiling probe shows pure CPU
  work itself caps at ~0.75 and bandwidth-bound scans far lower, so this
  pair understates what 4× the *hardware* would do.

Runs are interleaved across levels (2, 8, 32, 2, 8, 32, ...) so ambient
co-tenant drift on the shared host averages into every level equally;
medians are taken per level.

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
LEVELS = (2, 8, 32)
PAIRS = [(2, 8, "PRIMARY (linear regime)"), (8, 32, "saturated regime")]


def run_once(cpus: int, graph_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_GRAPH=graph_dir,
        # identical heap at every level; local-mode driver heap backs all
        # tasks.  Right-sized, not maximal: first-touch faults on this
        # VM class run at kernel-bound ~100-200MB/s/thread, so every
        # pre-touched GB is paid at JVM start — 12g covers the cached edge
        # table + shuffle comfortably and keeps startup sane.
        LINKGRAPH_DRIVER_MEM=os.environ.get("LINKGRAPH_DRIVER_MEM", "12g"),
        # ContextCleaner ON: measured A/B (msbfs then pagerank10, same JVM)
        # pr10 = 267.6s with the cleaner off vs 24.1s with it on — retained
        # blocks/broadcasts from the first kernel throttle every later job.
        LINKGRAPH_REF_TRACKING="true",
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
        # synth_400000 (V=4e5, E=589M directed): big enough that a kernel
        # iteration's compute dominates the per-iteration driver floor —
        # on the 102M-edge graph the floor caps efficiency at any core
        # count (see BASELINE.md round-2 diagnosis)
        else os.path.join(REPO, "BENCH", "data", "synth_400000")
    )

    ceiling = json.loads(
        subprocess.run(
            [sys.executable, os.path.join(REPO, "BENCH", "probe_ceiling.py")],
            capture_output=True,
            text=True,
            timeout=1200,
        ).stdout.strip()
    )
    print(f"ceiling: {json.dumps(ceiling['eff'])}", flush=True)

    results: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for i in range(runs):
        for cpus in LEVELS:  # interleaved: ambient drift hits every level
            t0 = time.time()
            r = run_once(cpus, graph_dir)
            print(
                f"run {i} local[{cpus}]: msbfs={r['msbfs_sec']}s "
                f"teps={r['msbfs_teps']:,.0f} pr={r['pagerank_sec']}s "
                f"({time.time() - t0:.0f}s total)",
                flush=True,
            )
            results[cpus].append(r)

    def med(cpus, key):
        return statistics.median(r[key] for r in results[cpus])

    meta = {}
    mp = os.path.join(graph_dir, "meta.json")
    if os.path.exists(mp):
        meta = json.load(open(mp))

    lines = [
        "",
        f"## Scaling run — {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "",
        f"Input: `{graph_dir}` (V={meta.get('V', '?'):,}, directed E="
        f"{meta.get('E_directed', '?'):,}, "
        f"{meta.get('generator', 'Zipf hub-tool graph, seed 42')}); "
        f"{runs} runs per level, interleaved across levels, medians, fresh "
        "JVM per run, identical confs at every level.",
        "",
        "Hardware ceiling on this box (BENCH/probe_ceiling.py — "
        "multiprocessing, no Spark): pure-CPU efficiency "
        f"2→8 = {ceiling['eff']['purecpu_2to8']}, "
        f"8→32 = {ceiling['eff']['purecpu_8to32']}; memory-stream "
        f"2→8 = {ceiling['eff']['memstream_2to8']}, "
        f"8→32 = {ceiling['eff']['memstream_8to32']}.  A single box does "
        "not add memory bandwidth with threads the way a cluster adds it "
        "with executors, so the 2→8 pair is the faithful N→4N analog.",
        "",
    ]
    metrics = [
        ("MS-BFS 512-lane batch", "msbfs_teps", "bit-edge traversals/s"),
        ("PageRank fixed-budget power iteration", "pagerank_edge_iters_per_sec", "edge-iters/s"),
    ]
    for lo, hi, label in PAIRS:
        lines += [
            f"### local[{lo}] → local[{hi}] (N → 4N) — {label}",
            "",
            f"| metric | local[{lo}] (N) | local[{hi}] (4N) | efficiency "
            "(thr_4N/thr_N)/4 | unit |",
            "| --- | --- | --- | --- | --- |",
        ]
        for m, key, unit in metrics:
            t_lo, t_hi = med(lo, key), med(hi, key)
            eff = (t_hi / t_lo) / 4
            flag = " ✅" if eff >= 0.8 else " ⚠️"
            lines.append(
                f"| {m} | {t_lo:,.0f} | {t_hi:,.0f} | **{eff:.3f}**{flag} | {unit} |"
            )
        lines.append("")
    lines.append(
        "Raw medians (sec): "
        + "; ".join(
            f"local[{c}] msbfs={med(c, 'msbfs_sec')} pr={med(c, 'pagerank_sec')}"
            for c in LEVELS
        )
        + "."
    )
    report = "\n".join(lines)
    print(report)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
