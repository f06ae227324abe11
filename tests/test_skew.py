"""Hot-term skew (SURVEY §5.6): a term occurring in EVERY document must
be split across all S salts in phase 1 — no single task ever holds the
full posting list — and the final index must still score it exactly."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from oculus_crawl_spark.config import DEFAULT
from oculus_crawl_spark.operators.build import (
    _RUNS_SCHEMA,
    _encode_runs_partition,
    build_index,
    term_dimension,
    term_frequencies,
    tokenize_corpus,
)
from oculus_crawl_spark.operators.query import SearchSession

from .conftest import SF0001


def _hot_corpus(spark):
    """Every doc gets the token 'everywhere' appended => df = n_docs."""
    return (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .select("doc_id", F.concat(F.col("text"), F.lit(" everywhere")).alias("text"))
    )


def test_hot_term_split_across_all_salts(spark):
    corpus = _hot_corpus(spark)
    praw = term_frequencies(tokenize_corpus(corpus))
    tdim = term_dimension(praw)
    hot_id = tdim.filter(F.col("term") == "everywhere").collect()[0]["term_id"]
    postings = praw.join(tdim.select("term", "term_id"), "term").select(
        "term_id", "doc_id", "tf", "dl"
    )
    cfg = DEFAULT
    salted = postings.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.n_salts)).cast("int")
    ).withColumn("range_bucket", F.shiftright("doc_id", cfg.range_bits).cast("long"))
    runs = (
        salted.repartition("term_id", "range_bucket", "salt")
        .sortWithinPartitions("term_id", "range_bucket", "salt", "doc_id")
        .mapInPandas(_encode_runs_partition, _RUNS_SCHEMA)
        .filter(F.col("term_id") == hot_id)
        .collect()
    )
    n_docs = corpus.count()
    salts = {r["salt"] for r in runs}
    sizes = np.array([r["n_docs"] for r in runs])
    assert salts == set(range(cfg.n_salts))  # split across ALL salts
    assert sizes.sum() == n_docs  # nothing lost
    # No run holds more than 2/S of the hot term's postings (SURVEY §5.6).
    assert sizes.max() <= max(1, 2 * n_docs // cfg.n_salts)


def test_hot_term_scores_exact_after_salted_build(spark):
    root = tempfile.mkdtemp(prefix="ocs_skew_")
    try:
        corpus = _hot_corpus(spark)
        res = build_index(corpus, root)
        sess = SearchSession(spark, root)
        # df == n_docs => idf = ln(1 + 0.5/ (n+0.5)) — tiny but nonzero;
        # every doc matches.
        hits = sess.search(["everywhere"], k=res.n_docs).collect()
        assert len(hits) == res.n_docs
        # dictionary df must be exactly n_docs
        df = {
            r["term"]: r["df"]
            for r in spark.read.parquet(f"{root}/dictionary").collect()
        }["everywhere"]
        assert df == res.n_docs
    finally:
        shutil.rmtree(root, ignore_errors=True)
