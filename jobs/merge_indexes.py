#!/usr/bin/env python
"""spark-submit entry: checkpoint-resumable merge of index epochs.

  spark-submit --py-files oculus_crawl_spark.zip jobs/merge_indexes.py \
      --inputs /warehouse/idx_e0,/warehouse/idx_e1 --out /warehouse/idx_gen2

Safe to re-run after a crash: term buckets whose manifest rows exist in
the output's lineage_metrics are skipped (E14 contract).
"""

from __future__ import annotations

import argparse
import os
import json
import sys

# Allow plain `python jobs/<job>.py` runs: put the repo root on the
# path when the package is not already importable (spark-submit
# --py-files provides it on a cluster).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", required=True, help="comma-separated index roots")
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from oculus_crawl_spark.operators.merge import merge_indexes
    from oculus_crawl_spark.session import get_spark

    spark = get_spark(app_name="ocs_merge")
    res = merge_indexes(
        spark,
        args.inputs.split(","),
        args.out,
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "n_docs": res.n_docs,
                "epoch": res.epoch,
                "buckets_merged": res.buckets_merged,
                "buckets_skipped": res.buckets_skipped,
                "wall_sec": round(res.wall_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
