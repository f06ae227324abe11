#!/usr/bin/env python
"""A/B harness for the MinHash exact-verify join (BENCH.md ledger).

Builds a duplication-HEAVY corpus (every sf0.01 document cloned
REPLICAS times -> each doc sits in REPLICAS-1 identical candidate
pairs, the regime where the verify join's shuffle dominates), then
times minhash_near_dup_pairs end to end and reports the per-pair
payload of the verify join under both designs:

  text_bytes_per_pair  — what the pre-round-5 design shipped
                         (a_text + b_text per candidate row)
  hash_bytes_per_pair  — what the current design ships
                         (8 B x distinct shingles per side)

Run once per code version (e.g. HEAD vs HEAD~1 via a git worktree) for
the wall-clock A/B; the payload columns are data-derived and identical
either way. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

REPLICAS = int(os.environ.get("MINHASH_BENCH_REPLICAS", "8"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from oculus_crawl_spark.operators import dedup
    from oculus_crawl_spark.operators.fulltext_queries import ensure_conf

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_conf(spark)
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    rep = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(rep)
        .select((F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"), "text")
        .persist()
    )
    docs.count()

    t0 = time.monotonic()
    pairs = dedup.minhash_near_dup_pairs(docs)
    n_pairs = pairs.count()
    wall = time.monotonic() - t0

    # Payload accounting (data-derived, independent of which code
    # version runs): per-pair bytes the verify join would shuffle.
    cand = dedup.minhash_candidate_pairs(docs)
    hb = (
        F.octet_length(dedup.shingle_set_udf("text"))
        if hasattr(dedup, "shingle_set_udf")  # absent pre-round-5 (A/B runs)
        else F.lit(0)
    )
    hsets = docs.select(
        "doc_id",
        F.octet_length("text").alias("tb"),
        hb.alias("hb"),
    )
    acc = (
        cand.join(
            hsets.select(F.col("doc_id").alias("a_id"),
                         F.col("tb").alias("a_tb"), F.col("hb").alias("a_hb")),
            "a_id",
        )
        .join(
            hsets.select(F.col("doc_id").alias("b_id"),
                         F.col("tb").alias("b_tb"), F.col("hb").alias("b_hb")),
            "b_id",
        )
        .agg(
            F.count("*").alias("n_cand"),
            F.avg(F.col("a_tb") + F.col("b_tb")).alias("text_bpp"),
            F.avg(F.col("a_hb") + F.col("b_hb")).alias("hash_bpp"),
        )
        .collect()[0]
    )
    print(json.dumps({
        "metric": "minhash_verify_fanout",
        "replicas": REPLICAS,
        "n_docs": n_base * REPLICAS,
        "n_candidate_pairs": int(acc["n_cand"]),
        "n_verified_pairs": n_pairs,
        "wall_sec": round(wall, 3),
        "text_bytes_per_pair": round(float(acc["text_bpp"]), 1),
        "hash_bytes_per_pair": round(float(acc["hash_bpp"]), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
