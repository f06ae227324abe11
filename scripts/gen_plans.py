#!/usr/bin/env python
"""Regenerate PLANS.md: capture the physical plans of the scale-critical
paths against a freshly built sf0.001 index. The same plan properties
are enforced in CI by tests/test_plans.py."""

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def plan(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue().strip()


def main():
    from oculus_crawl_spark.operators.build import (
        build_index_from_documents,
        term_frequencies,
        tokenize_corpus,
    )
    from oculus_crawl_spark.operators.query import SearchSession
    from oculus_crawl_spark.session import get_spark

    spark = get_spark(master="local[8]")
    root = tempfile.mkdtemp()
    build_index_from_documents(spark, "/root/testdata/sf0.001", root)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sections = []
    sections.append((
        "Scan: filter pushdown + column pruning (E2a/E2b)",
        "The `lang` predicate reaches the parquet reader (PushedFilters) and "
        "ReadSchema carries only the two projected columns — `text` is never read.",
        plan(docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")),
    ))
    sections.append((
        "Build: tokenize -> explode -> tf aggregation (E3/E4/E5)",
        "The tokenizer is whole-stage-codegen'd (no Python); partial_count "
        "before the exchange is the map-side combine; one shuffle on "
        "(doc_id, dl, term).",
        plan(term_frequencies(tokenize_corpus(docs.select("doc_id", "text")))),
    ))
    spark.catalog.clearCache()
    seg = spark.read.parquet(f"{root}/segments").filter(
        F.col("term_bucket").isin([1, 5])
    )
    sections.append((
        "Query: partition-pruned segments scan (Q3)",
        "`term_bucket IN (...)` lands in PartitionFilters — only the buckets "
        "holding query terms are listed and read; at 10^12 docs this is the "
        "difference between touching a handful of files and the whole index.",
        plan(seg),
    ))
    sess = SearchSession(spark, root, cache_segments=False)
    sections.append((
        "Query, shuffle tier: broadcast join + per-range WAND + distributed merge (Q2/Q4/Q6)",
        "The general form for uncached sessions / huge vocabularies: query "
        "terms broadcast (never SMJ); FlatMapGroupsInPandas is the "
        "Arrow-batched block-max WAND kernel per (query, doc-range); the "
        "window merge only sees <= ranges*queries*k rows.",
        plan(sess.search(["dup scan"], k=10, gather="spark", path="shuffle")),
    ))
    fast = SearchSession(spark, root)
    sections.append((
        "Query, FAST serving tier: single narrow stage over the range-partitioned cache (Q2'/Q4/Q6)",
        "Default for resident sessions: segments persist pre-partitioned by "
        "range_bucket at session open (the Exchange inside InMemoryRelation "
        "is that one-time load shuffle); the per-term (query_id, idf) plan "
        "rides in the MapInPandas closure, so the query itself is "
        "cached-scan -> Filter(term IN ...) -> MapInPandas with NO join and "
        "NO per-query exchange. The window merge below is gather='spark'; "
        "the default coordinator gather (ranges*queries*k below threshold) "
        "has no post-kernel exchange at all. sf0.1 p95: 1.89s -> 1.20s.",
        plan(fast.search(["dup scan"], k=10, gather="spark", path="fast")),
    ))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("# PLANS — captured physical plans for the scale-critical paths\n\n")
        f.write("Generated against a real index at sf0.001 (`python scripts/gen_plans.py`).\n")
        f.write("The same properties are ENFORCED in CI by tests/test_plans.py.\n")
        for title, note, body in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{body}\n```\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
