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


def test_derive_n_salts_scales_with_hot_group(spark):
    """SURVEY §7.4's metrics-driven S: the floor holds at sandbox scale,
    the worst-case range occupancy derives the at-scale default 64, and
    prior-generation metrics (E6 max df + E8 stats) tighten the bound."""
    from oculus_crawl_spark.config import IndexConfig
    from oculus_crawl_spark.operators.build import (
        SALT_TARGET_RUN_POSTINGS,
        derive_n_salts,
    )

    cfg = DEFAULT
    # Sandbox corpora never derive above the configured floor.
    assert derive_n_salts(5_000, cfg) == cfg.n_salts
    # First epoch at web scale: a full 2^20-doc range -> 64 salts.
    assert derive_n_salts(10**12, cfg) == 64
    assert (1 << cfg.range_bits) // SALT_TARGET_RUN_POSTINGS == 64
    # S tracks the hot-group bound monotonically until the range caps it.
    assert derive_n_salts(SALT_TARGET_RUN_POSTINGS * 8 + 1, cfg) == 9
    # Floor and cap.
    assert derive_n_salts(10**12, IndexConfig(n_salts=128)) == 128
    assert derive_n_salts(10**12, IndexConfig(range_bits=40)) == 1024

    # Prior-generation metrics tighten the worst case: write a synthetic
    # prior index whose hottest term touched 1/64th of its (single)
    # range; 2x drift headroom => S = ceil(2 * max_df / target).
    root = tempfile.mkdtemp(prefix="ocs_salts_")
    try:
        from oculus_crawl_spark import schemas

        spark.createDataFrame(
            [(2_000_000, 100.0, 0, "1", cfg.n_term_buckets, cfg.range_bits)],
            schema=schemas.CORPUS_STATS,
        ).write.mode("overwrite").parquet(f"{root}/corpus_stats")
        max_df = SALT_TARGET_RUN_POSTINGS  # hottest observed term
        spark.createDataFrame(
            [("the", max_df * 1, max_df * 3, 1, 0)],
            "term string, df long, cf long, n_blocks int, term_bucket int",
        ).write.mode("overwrite").parquet(f"{root}/dictionary")
        prior_ranges = (2_000_000 >> cfg.range_bits) + 1  # = 2
        expect = -(-2 * (-(-max_df // prior_ranges)) // SALT_TARGET_RUN_POSTINGS)
        got = derive_n_salts(10**12, cfg, spark, root)
        assert got == max(cfg.n_salts, expect) == cfg.n_salts
        # A genuinely hot prior term (full range) still derives 64 —
        # the 2x drift headroom is capped by the physical range bound.
        spark.createDataFrame(
            [("the", (1 << cfg.range_bits) * prior_ranges, 0, 1, 0)],
            "term string, df long, cf long, n_blocks int, term_bucket int",
        ).write.mode("overwrite").parquet(f"{root}/dictionary")
        assert derive_n_salts(10**12, cfg, spark, root) == 64
        # Half-range-hot prior: headroom doubles the observed bound.
        spark.createDataFrame(
            [("the", (1 << cfg.range_bits) * prior_ranges // 4, 0, 1, 0)],
            "term string, df long, cf long, n_blocks int, term_bucket int",
        ).write.mode("overwrite").parquet(f"{root}/dictionary")
        assert derive_n_salts(10**12, cfg, spark, root) == 32
        # Unreadable prior -> worst-case bound, not a crash.
        assert derive_n_salts(10**12, cfg, spark, f"{root}/nope") == 64
    finally:
        shutil.rmtree(root, ignore_errors=True)
