#!/usr/bin/env python
"""spark-submit entry: build one index epoch.

  spark-submit --py-files oculus_crawl_spark.zip jobs/build_index.py \
      --pages /warehouse/pages --index-root /warehouse/index \
      --epoch 3 --langs en,de

On a cluster, master/executors come from spark-submit; add
  --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>
plus the catalog confs to write Iceberg instead of raw parquet
(sources/tables.py shim switches automatically).

``--pages`` expects the Common-Crawl-style schema (url, warc_ts,
html, lang) per BASELINE.json input_hint; ``--documents`` expects an
already-extracted (doc_id, text) table.
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
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages table path (url, warc_ts, html, lang)")
    src.add_argument("--documents", help="documents table path (doc_id, text)")
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--langs", help="comma-separated lang allowlist")
    ap.add_argument(
        "--prior-docmap",
        help="path to an earlier generation's docmap table: re-crawled "
        "urls keep their doc_id, new urls get dense ids past its max "
        "(incremental crawl -> re-crawl -> merge flow)",
    )
    ap.add_argument(
        "--prior-index",
        help="(--documents path only) an earlier generation's index "
        "root: its committed segment metadata tightens the derived "
        "salt count to the hottest observed per-(term, range) group. "
        "The --pages path derives this from --prior-docmap "
        "automatically.",
    )
    args = ap.parse_args()
    if args.pages and args.prior_index:
        # argparse would accept the combination and the pages branch
        # would silently drop the hint (worst-case salt count with no
        # warning) — refuse instead of surprising the operator.
        ap.error(
            "--prior-index applies to --documents builds only; the "
            "--pages path derives the salt hint from --prior-docmap's "
            "index automatically"
        )
    if args.documents and args.prior_docmap:
        # Symmetric surprise: a documents table carries its own doc_id
        # column, so a docmap has nothing to map — silently ignoring it
        # would let an operator believe id continuity was applied.
        ap.error(
            "--prior-docmap applies to --pages builds only; a "
            "--documents table already carries doc_id"
        )
    if args.documents and args.langs:
        # Same silent-surprise class: the (doc_id, text) schema has no
        # lang column, so the allowlist cannot be applied — an operator
        # would get an every-language index while believing it was
        # filtered.
        ap.error(
            "--langs applies to --pages builds only; a --documents "
            "table has no lang column (filter it before handing it in)"
        )

    from oculus_crawl_spark.operators.build import (
        build_index,
        build_index_from_pages,
    )
    from oculus_crawl_spark.session import get_spark

    spark = get_spark(app_name="ocs_build_index")
    if args.pages:
        pages = spark.read.parquet(args.pages)
        result = build_index_from_pages(
            pages,
            args.index_root,
            epoch=args.epoch,
            langs=args.langs.split(",") if args.langs else None,
            prior_docmap=args.prior_docmap,
        )
    else:
        docs = spark.read.parquet(args.documents).select("doc_id", "text")
        result = build_index(
            docs, args.index_root, epoch=args.epoch,
            prior_index=args.prior_index,
        )
    print(
        json.dumps(
            {
                "n_docs": result.n_docs,
                "avgdl": round(result.avgdl, 4),
                "wall_sec": round(result.wall_sec, 2),
                "docs_per_sec": round(result.docs_per_sec, 1),
                "index_root": args.index_root,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
