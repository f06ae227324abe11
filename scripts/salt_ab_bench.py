#!/usr/bin/env python
"""A/B cost of the metrics-driven salt count (SURVEY §7.4, build.py
``derive_n_salts``) at sandbox scale.

Arms, identical corpus (sf0.1 documents replicated R times, the
scaling_bench input definition):

* ``derived`` — production path: S from ``derive_n_salts`` (at x256 /
  1.28M docs with range_bits=20 this derives S=64 — the worst-case
  stop-word bound, since no prior index exists to tighten it).
* ``pin8``    — ``derive_n_salts`` monkeypatched to the sandbox floor
  (cfg.n_salts=8), i.e. round-4 behavior.

What this measures: derived S=64 splits each (term, range) posting
group 8x finer than the floor, which bounds every phase-1 run buffer
at ~SALT_TARGET_RUN_POSTINGS postings (the at-scale memory-safety
contract) at the price of more, smaller kernel groups. At the sandbox's
tiny per-core share that group-count overhead is measurable; at the
10^12-doc design point it is the difference between bounded and
unbounded run buffers. This script prices the sandbox cost honestly.

Each run is a fresh driver subprocess at local[cores] (default 8),
JIT-warmed like bench.py/scaling_bench.py; best-of-``trials`` per arm.

Usage: python scripts/salt_ab_bench.py [R] [cores] [trials]
       (defaults R=256, cores=8, trials=2)
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
import oculus_crawl_spark.operators.build as B

cores, rep, arm = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

if arm == "pin8":
    B.derive_n_salts = lambda n_docs, cfg, spark=None, prior_index=None: (
        cfg.n_salts
    )

spark = get_spark(
    app_name=f"ocs_salt_ab_{{arm}}",
    master=f"local[{{cores}}]",
    shuffle_partitions=max(8, 2 * cores),
)
docs = (
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    .select("doc_id", "text")
    .repartition(max(cores * 4, 16))
)
reps = spark.range(rep).select(F.col("id").alias("rep"))
corpus = docs.crossJoin(F.broadcast(reps)).select(
    (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
)
n_docs = corpus.count()
from oculus_crawl_spark.config import IndexConfig
s_used = (
    IndexConfig().n_salts
    if arm == "pin8"
    else B.derive_n_salts(n_docs, IndexConfig())
)
warm_root = tempfile.mkdtemp(prefix=f"ocs_salt_warm_{{arm}}_")
B.build_index(
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    .select("doc_id", "text")
    .filter(F.col("doc_id") < 300),
    warm_root,
)
shutil.rmtree(warm_root, ignore_errors=True)
root = tempfile.mkdtemp(prefix=f"ocs_salt_{{arm}}_")
try:
    t0 = time.monotonic()
    B.build_index(corpus, root)
    wall = time.monotonic() - t0
    print(json.dumps({{"arm": arm, "cores": cores, "n_salts": s_used,
                       "n_docs": n_docs, "wall_sec": round(wall, 2),
                       "docs_per_sec": round(n_docs / wall, 1)}}))
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
"""


def run_one(cores: int, rep: int, arm: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _RUN_ONE.format(repo=_REPO),
         str(cores), str(rep), arm],
        capture_output=True, text=True, cwd=_REPO, env=env,
    )
    if out.returncode != 0:
        # Surface the child's Spark stderr — a bare CalledProcessError
        # hides the only diagnostic there is.
        sys.stderr.write(out.stderr)
        raise subprocess.CalledProcessError(
            out.returncode, out.args, out.stdout, out.stderr
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    best: dict[str, dict] = {}
    # Interleave arms so host drift hits both equally.
    for t in range(trials):
        for arm in ("derived", "pin8"):
            r = run_one(cores, rep, arm)
            r["trial"] = t
            print(json.dumps(r), flush=True)
            if arm not in best or r["wall_sec"] < best[arm]["wall_sec"]:
                best[arm] = r
    d, p = best["derived"], best["pin8"]
    print(json.dumps({
        "metric": "salt_derived_vs_pin8_cost",
        "derived": d, "pin8": p,
        "wall_ratio": round(d["wall_sec"] / p["wall_sec"], 3),
    }))


if __name__ == "__main__":
    main()
