"""Deterministic Common-Crawl-style ``pages`` synthesis (FIXTURES.md B1).

The north rule's input is an Iceberg table with columns
(url, warc_ts, html, text, lang) — BASELINE.json input_hint. The sandbox
stand-in derives that table as a pure function of the driver-provided
``documents`` corpus: no RNG, no wall clock, so every run (and both
parallelism levels of the scaling bench) sees identical bytes.

Derivation per row (FIXTURES.md B1):
  url     = https://example.org/{source}/{doc_id:012d}
  warc_ts = 2025-01-01T00:00:00Z + doc_id seconds
  html    = frozen wrap of the escaped text (functions/analysis.wrap_html,
            chosen so extract_text(html) == text byte-identically)
  text, lang = passed through from documents

``with_dups=True`` appends a ~2% duplicate slice: same url, warc_ts+1h,
html with a marker paragraph — exercises latest-wins dedup (op E2c).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analysis import wrap_html
from .tables import read_table


@F.pandas_udf(T.BinaryType())
def _wrap_html_udf(text: pd.Series, doc_id: pd.Series) -> pd.Series:
    return pd.Series(
        [wrap_html(t, int(i)) for t, i in zip(text, doc_id)], dtype=object
    )


_EPOCH_2025 = "timestamp'2025-01-01 00:00:00'"


def synthesize_pages(
    spark: SparkSession, sf_dir: str, with_dups: bool = False
) -> DataFrame:
    """documents -> pages (url, warc_ts, html, text, lang) [+ doc_id kept
    as ``_expected_doc_id`` for tests that need the ground-truth mapping]."""
    docs = read_table(spark, sf_dir, "documents")
    pages = (
        docs.withColumn(
            "url", F.format_string("https://example.org/%s/%012d", "source", "doc_id")
        )
        .withColumn(
            "warc_ts",
            F.expr(f"{_EPOCH_2025} + make_interval(0, 0, 0, 0, 0, 0, doc_id)"),
        )
        .withColumn("html", _wrap_html_udf("text", "doc_id"))
        .select(
            "url", "warc_ts", "html", "text", "lang",
            F.col("doc_id").alias("_expected_doc_id"),
        )
    )
    if not with_dups:
        return pages
    dups = (
        pages.filter(F.col("_expected_doc_id") % 50 == 0)  # deterministic ~2%
        .withColumn("warc_ts", F.expr("warc_ts + interval 1 hour"))
        .withColumn(
            "html",
            F.concat(
                F.col("html"),
                F.lit(b"<p>updated</p>"),
            ),
        )
        .withColumn("text", F.concat("text", F.lit(" updated")))
    )
    return pages.unionByName(dups)
