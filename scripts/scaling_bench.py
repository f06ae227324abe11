#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json:2,14 — ">=0.8 throughput
scaling efficiency between N and 4N executors").

No real cluster exists in this sandbox, so the evidence is the same
index-build job at two parallelism levels on the SAME input, in two
modes:

* ``thread`` — ``local[N]`` vs ``local[4N]``: N vs 4N task threads in
  one JVM (the round-1..3 harness).
* ``proc``  — ``local-cluster[N,1,mem]`` vs ``local-cluster[4N,1,mem]``:
  N vs 4N single-core EXECUTOR PROCESSES, each its own JVM + Python
  workers, shuffling through real serialization — the closest this
  sandbox gets to "N and 4N executors" (BASELINE.json:14). This
  answers the round-3 verdict's gap: the thread-based A/B could not
  show whether the plan survives crossing process boundaries.

Input: sf0.1 documents deterministically replicated R times (doc_id
shifted per replica — no external data). Each run is a fresh
driver subprocess so configs share nothing; each config runs
``trials`` times and the BEST wall is kept (the host is shared —
external load of ~9 cores was observed — and min-wall is the standard
de-noising estimator).

N defaults to 2 (4N=8) so both configs fit the free cores of the
shared 32-core host; set N=8 for the 8->32 variant on an idle host.

Appends raw results to BENCH_scaling.jsonl and prints one JSON summary
line per pair.

Usage: python scripts/scaling_bench.py [R] [N1,N2,...] [trials] [mode]
       (defaults R=32, N=2,8, trials=2, mode=thread; mode ∈
        thread|proc|both)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)

_RUN_ONE = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from oculus_crawl_spark.session import get_spark
from oculus_crawl_spark.operators.build import build_index

cores, rep, mode = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def tree_cpu_sec() -> float:
    # utime+stime+cutime+cstime (reaped children) of this process and
    # every live descendant (the JVM and its pyspark worker daemons) —
    # total CPU burned by the run so far. If CPU-per-doc stays flat
    # across core counts, the code adds no parallel overhead and any
    # sub-linear WALL scaling is a host resource ceiling, not the plan.
    clk = os.sysconf("SC_CLK_TCK")
    kids = {{}}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{{pid}}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            kids.setdefault(int(parts[1]), []).append(  # ppid -> pids
                (int(pid), sum(int(parts[i]) for i in (11, 12, 13, 14)))
            )
        except (OSError, IndexError, ValueError):
            continue
    total, stack = 0, [os.getpid()]
    seen = set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        for child, ticks in kids.get(p, []):
            total += ticks
            stack.append(child)
    try:
        with open(f"/proc/{{os.getpid()}}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        total += sum(int(parts[i]) for i in (11, 12, 13, 14))
    except (OSError, IndexError, ValueError):
        pass
    return total / clk
if mode == "proc":
    # N single-core executor PROCESSES: separate JVMs, separate Python
    # workers, shuffle crosses process boundaries through the real
    # serialization path. ActiveProcessorCount pins each executor JVM
    # to its 1 core (same rationale as the driver pin in session.py).
    spark = get_spark(
        app_name=f"ocs_scaling_proc_{{cores}}",
        master=f"local-cluster[{{cores}},1,6144]",
        shuffle_partitions=max(8, 2 * cores),
        extra_conf={{
            "spark.executor.memory": "5g",
            "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=1",
        }},
    )
else:
    spark = get_spark(
        app_name=f"ocs_scaling_{{cores}}",
        master=f"local[{{cores}}]",
        shuffle_partitions=max(8, 2 * cores),  # scales with the "cluster", as deployed
    )
# Corpus replication must itself be parallel: the 5000-row source parquet
# is ONE partition, and a crossJoin fans out from the LEFT side's
# partitions — replicating before repartitioning made one task produce
# the whole corpus (a data-proportional serial stage that poisoned the
# round-2 first scaling run). Spread the source first, broadcast the
# replica index, and the fanout runs on every core.
docs = (
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    .select("doc_id", "text")
    .repartition(max(cores * 4, 16))
)
reps = spark.range(rep).select(F.col("id").alias("rep"))
corpus = docs.crossJoin(F.broadcast(reps)).select(
    (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
)
n_docs = corpus.count()  # warm-up + materialize the input definition
# JIT/codegen warm-up (same as bench.py): a 300-doc mini-build compiles
# every path first, so the timed build measures the PIPELINE. In proc
# mode this matters per EXECUTOR — 4N fresh JVMs pay 4x the compile
# wall of N, which at short walls biases the ratio down for reasons
# that amortize to zero at the 10^12-doc design point.
warm_root = tempfile.mkdtemp(prefix=f"ocs_scale_warm_{{cores}}_")
build_index(
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    .select("doc_id", "text")
    .filter(F.col("doc_id") < 300),
    warm_root,
)
shutil.rmtree(warm_root, ignore_errors=True)
root = tempfile.mkdtemp(prefix=f"ocs_scale_{{cores}}_")
try:
    cpu0 = tree_cpu_sec()
    t0 = time.monotonic()
    result = build_index(corpus, root)
    wall = time.monotonic() - t0
    cpu = tree_cpu_sec() - cpu0
    print(json.dumps({{"cores": cores, "mode": mode, "n_docs": n_docs,
                       "wall_sec": round(wall, 2),
                       "docs_per_sec": round(n_docs / wall, 1),
                       "cpu_sec": round(cpu, 1),
                       "cpu_sec_per_kdoc": round(1000 * cpu / n_docs, 3)}}))
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
"""


def run_one(cores: int, rep: int, mode: str) -> dict:
    env = dict(os.environ)
    # Executor Python workers (separate processes in proc mode) must be
    # able to import the engine package.
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            _RUN_ONE.format(repo=_REPO),
            str(cores),
            str(rep),
            mode,
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=_REPO,
        env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ns = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [2, 8]
    )
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    modes = sys.argv[4] if len(sys.argv) > 4 else "thread"
    if modes not in ("thread", "proc", "both"):
        # A typo'd mode would silently run the thread branch but label
        # the BENCH_scaling.jsonl rows with the bogus string.
        sys.exit(f"mode must be thread|proc|both, got {modes!r}")
    modes = ["thread", "proc"] if modes == "both" else [modes]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores_needed = sorted({c for n in ns for c in (n, 4 * n)})
    pairs = []
    for mode in modes:
        best: dict[int, dict] = {}
        for _ in range(trials):
            for cores in cores_needed:
                r = run_one(cores, rep, mode)
                if cores not in best or r["wall_sec"] < best[cores]["wall_sec"]:
                    best[cores] = r
        label = "executors" if mode == "proc" else "cores"
        for n in ns:
            lo, hi = best[n], best[4 * n]
            eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
            pairs.append((mode, n, lo, hi, eff))
            print(
                json.dumps(
                    {
                        "metric": (
                            f"index_build_scaling_efficiency_{n}_to_{4 * n}"
                            f"_{label}_{mode}"
                        ),
                        "value": round(eff, 3),
                        "unit": "efficiency",
                        "target": 0.8,
                        "mode": mode,
                        "input": f"{sf_dir}/documents.parquet x{rep}",
                        "n_docs": lo["n_docs"],
                        "trials": trials,
                        f"n{n}": lo,
                        f"n{4 * n}": hi,
                    }
                )
            )

    # BENCH.md is hand-maintained (scaling + ceiling + attribution +
    # latency evidence in one narrative); this harness appends its raw
    # result lines to BENCH_scaling.jsonl instead of overwriting it.
    with open(os.path.join(_REPO, "BENCH_scaling.jsonl"), "a") as f:
        for mode, n, lo, hi, eff in pairs:
            f.write(
                json.dumps(
                    {"pair": f"{n}->{4 * n}", "mode": mode,
                     "eff": round(eff, 3), "lo": lo, "hi": hi, "rep": rep}
                ) + "\n"
            )


if __name__ == "__main__":
    main()
