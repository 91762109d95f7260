"""Hardware scaling-ceiling probes for the single-box N→4N evidence runs.

A real cluster's N→4N step multiplies every resource (cores, memory
bandwidth, disk, NICs) by 4.  A single 32-core box does NOT: memory
bandwidth and the shared LLC are constant, so beyond ~8 active cores even
embarrassingly parallel work stops scaling.  These probes measure that
ceiling so kernel efficiencies can be read against what the hardware
permits at each parallelism pair:

* purecpu:  pure-Python integer loop via multiprocessing — no memory
  traffic, no JVM; the absolute upper bound for CPU scaling.
* memstream: numpy array sums — the memory-bandwidth ceiling.

Prints one JSON line: {"purecpu": {"2": s, "8": s, "32": s}, ...,
"eff": {"purecpu_2to8": e, "purecpu_8to32": e, ...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def _stream(n: int) -> float:
    import numpy as np

    a = np.ones(n, dtype=np.int64)
    s = 0
    for _ in range(20):
        s += int(a.sum())
    return s


def run_pool(fn, procs: int, tasks: int, arg) -> float:
    with mp.Pool(procs) as p:
        t0 = time.time()
        p.map(fn, [arg] * tasks)
        return time.time() - t0


def main():
    levels = (2, 8, 32)
    out = {"purecpu": {}, "memstream": {}}
    for procs in levels:
        # 32 equal tasks -> perfect load balance at every level
        out["purecpu"][str(procs)] = round(run_pool(_burn, procs, 32, 6_000_000), 2)
    for procs in levels:
        out["memstream"][str(procs)] = round(
            run_pool(_stream, procs, 32, 20_000_000), 2
        )
    eff = {}
    for name in ("purecpu", "memstream"):
        d = out[name]
        eff[f"{name}_2to8"] = round(d["2"] / d["8"] / 4, 3)
        eff[f"{name}_8to32"] = round(d["8"] / d["32"] / 4, 3)
    out["eff"] = eff
    print(json.dumps(out))


if __name__ == "__main__":
    main()
