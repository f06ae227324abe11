"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: build the full inverted index over the
                 sf0.001 documents corpus (salted two-phase assembly,
                 PFor-compressed blocks) and run the frozen reference
                 query set through block-max WAND; returns the results
                 DataFrame (query_id, rank, doc_id, score).
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — matching DuckDB SQL; omitted only for ops that are not
                 SQL-expressible (driver records a rows-only check).
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oculus_crawl_spark.operators import (
    dedup,
    fulltext_queries,
    multimodal,
    pipeline,
    relational,
    similarity,
    textquality,
)
from oculus_crawl_spark.operators.query import search

# Registry order is load-bearing: the driver grades (at most) the FIRST
# 50 entries, so every oracle-checked entry must precede the rows-only
# ones. Module order puts the small op families ahead of the 25-entry
# rel_* block, and queries() DERIVES the deferred tail from "has no
# oracle SQL" (a hardcoded name list silently rotted once —
# ann_cosine_topk_ivf sat mid-registry, and one more oracle-checked
# entry would have pushed rel_sessionize out of the window while a
# rows-only entry kept an in-window slot). Rows-only entries keep
# their relative order, so the in-window composition is stable.
_OP_MODULES = (multimodal, similarity, dedup, textquality, pipeline, relational)

_HERE = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from oculus_crawl_spark.operators.build import build_index_from_documents

    fulltext_queries.ensure_conf(spark)
    sf_dir = "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="ocs_entry_")
    build_index_from_documents(spark, sf_dir, root)
    with open(os.path.join(_HERE, "tests", "queries.json")) as f:
        qset = json.load(f)
    return search(spark, root, qset["queries"], k=qset["k"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    rows_only: list[str] = []
    out.update(fulltext_queries.queries())  # all oracle-checked
    for mod in _OP_MODULES:
        for name, (fn, sql) in mod.QUERIES.items():
            out[name] = _with_conf(fn)
            if sql is None:
                rows_only.append(name)
    for name in rows_only:  # rows-only entries go last (grading window)
        out[name] = out.pop(name)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(fulltext_queries.oracle_sql())
    for mod in _OP_MODULES:
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out


def _with_conf(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        fulltext_queries.ensure_conf(spark)
        return fn(spark, sf_dir)

    return wrapped
