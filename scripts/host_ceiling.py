#!/usr/bin/env python
"""Host parallel-scaling ceiling probe (context for BENCH.md's
scaling-efficiency numbers).

The sandbox evidences the north rule's N -> 4N *executor* scaling as
N -> 4N *threads in one VM* — but threads share one memory controller,
which real executors do not. This probe measures the VM's own 2 -> 8
process-scaling ceiling for the two extremes any data pipeline mixes:

* ``cpu``  — cache-resident arithmetic (2 MB working set, many passes):
  scales with cores until the cores themselves run out.
* ``mem``  — DRAM-streaming traffic (400 MB per call): scales with
  MEMORY BANDWIDTH, which on this VM saturates at ~2 cores' worth.

An index build is a mix of both (tokenise/hash/codec = cpu; shuffle,
Arrow crossings, cache writes = mem), so its measured thread-scaling
efficiency is bounded between the two probe numbers — and the probe
tells you how much of the gap to the >=0.8 target is the VM's memory
wall rather than the plan. On a real cluster each executor brings its
own memory controller, so the ``mem`` ceiling does not apply across
executors; the cross-executor cost is the shuffle fabric instead
(which the engine minimises: postings are compressed BEFORE the
phase-2 shuffle, operators/build.py).

Prints one JSON line per probe. Usage: python scripts/host_ceiling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

N_ITEMS = 32
CORE_PAIRS = (2, 8)


def cpu_work(_i: int) -> float:
    a = np.random.default_rng(0).standard_normal(256 * 1024)  # ~2 MB
    s = 0.0
    for _ in range(1600):
        s += float((a * 1.000001).sum())
    return s


def mem_work(_i: int) -> float:
    a = np.zeros(25_000_000)  # 200 MB
    s = 0.0
    for _ in range(24):  # ~400 MB DRAM traffic per pass (read + write)
        b = a + 1.0
        s += float(b[0])
    return s


def main() -> None:
    for name, fn in (("cpu_bound", cpu_work), ("dram_stream", mem_work)):
        walls: dict[int, float] = {}
        for workers in CORE_PAIRS:
            best = float("inf")
            for _ in range(2):
                with mp.Pool(workers) as p:
                    t0 = time.monotonic()
                    p.map(fn, range(N_ITEMS))
                    best = min(best, time.monotonic() - t0)
            walls[workers] = best
        lo, hi = CORE_PAIRS
        eff = (walls[lo] / walls[hi]) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": f"host_ceiling_{name}_{lo}_to_{hi}_procs",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    f"wall_{lo}": round(walls[lo], 2),
                    f"wall_{hi}": round(walls[hi], 2),
                }
            )
        )


if __name__ == "__main__":
    main()
