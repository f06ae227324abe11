#!/usr/bin/env python
"""spark-submit entry: BM25 top-k queries against a built index.

  spark-submit --py-files oculus_crawl_spark.zip jobs/search.py \
      --index-root /warehouse/index --k 10 "hello world" "spark bm25"
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow plain `python jobs/<job>.py` runs: put the repo root on the
# path when the package is not already importable (spark-submit
# --py-files provides it on a cluster).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from oculus_crawl_spark.operators.query import SearchSession
    from oculus_crawl_spark.session import get_spark

    spark = get_spark(app_name="ocs_search")
    sess = SearchSession(spark, args.index_root)
    for row in sess.search(args.queries, k=args.k).collect():
        print(
            f"q{row['query_id']}\t#{row['rank']}\tdoc={row['doc_id']}\t"
            f"score={row['score']:.6f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
