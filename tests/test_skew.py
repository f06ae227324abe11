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
    the hottest per-(term, range_bucket) group observed in a prior
    generation's segment metadata tightens the bound."""
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

    # Prior-generation metrics tighten the worst case. The hint is the
    # hottest per-(term, range_bucket) GROUP in the committed segment
    # metadata — not dictionary df / range count, which is a mean and
    # hides range-concentrated hot terms.
    root = tempfile.mkdtemp(prefix="ocs_salts_")
    try:
        from oculus_crawl_spark import schemas
        from oculus_crawl_spark.config import IndexConfig

        def write_prior(spec, range_bits=cfg.range_bits):
            """spec: [(term, range_bucket, [n_docs per block, ...])]."""
            spark.createDataFrame(
                [(2_000_000, 100.0, 0, "1", cfg.n_term_buckets, range_bits)],
                schema=schemas.CORPUS_STATS,
            ).write.mode("overwrite").parquet(f"{root}/corpus_stats")
            rows = [
                (term, 0, rb, i, 0, 0, nd, 0, 0.0, b"", b"", b"", 0)
                for term, rb, blocks in spec
                for i, nd in enumerate(blocks)
            ]
            spark.createDataFrame(
                rows, schema=schemas.SEGMENTS
            ).write.mode("overwrite").parquet(f"{root}/segments")

        T = SALT_TARGET_RUN_POSTINGS
        # Hottest observed group = one target run (split across two
        # blocks — the per-group SUM must see both): 2x headroom ->
        # need 2, floored at cfg.
        write_prior([("the", 0, [T // 2, T // 2]), ("a", 1, [10])])
        assert derive_n_salts(10**12, cfg, spark, root) == cfg.n_salts
        # Range-CONCENTRATED hot term: 16T postings all in range 0 (a
        # mean over the 2 ranges would see 8T and derive 16); the max
        # group drives S = ceil(2 * 16T / T) = 32.
        write_prior([("der", 0, [T * 16]), ("der", 1, [1])])
        assert derive_n_salts(10**12, cfg, spark, root) == 32
        # A genuinely full prior range still derives 64 — the 2x drift
        # headroom is capped by the physical range bound.
        write_prior([("the", 0, [1 << cfg.range_bits])])
        assert derive_n_salts(10**12, cfg, spark, root) == 64
        # Coarser NEW geometry (range_bits + 2): each new range holds up
        # to 4 prior ranges, so the observation rescales x4 before the
        # headroom: 2 * (4 * 2T) / T = 16.
        write_prior([("the", 0, [T * 2])])
        wide = IndexConfig(range_bits=cfg.range_bits + 2)
        assert derive_n_salts(10**12, wide, spark, root) == 16
        # Unreadable prior -> worst-case bound, not a crash.
        assert derive_n_salts(10**12, cfg, spark, f"{root}/nope") == 64
        # Readable-but-ROW-LESS stats (a crashed prior finalize commits
        # parquet files without rows) -> worst case, not IndexError.
        spark.createDataFrame(
            [], schema=schemas.CORPUS_STATS
        ).write.mode("overwrite").parquet(f"{root}/corpus_stats")
        assert derive_n_salts(10**12, cfg, spark, root) == 64
        # Pre-geometry prior (no n_term_buckets/range_bits): the hint is
        # unusable but an incremental BUILD must not hard-fail on it.
        spark.createDataFrame(
            [(2_000_000, 100.0, 0, "1")],
            "n_docs long, avgdl double, epoch long, analysis_version string",
        ).write.mode("overwrite").parquet(f"{root}/corpus_stats")
        assert derive_n_salts(10**12, cfg, spark, root) == 64
        # MANGLED prior (garbage bytes where a segments part-file should
        # be — a killed writer / partial copy): still the worst case,
        # never a crashed build, whatever exception class the read
        # surfaces (AnalysisException at inference or Py4JJavaError at
        # collect, depending on which file is damaged).
        import os

        write_prior([("the", 0, [T])])
        part = next(
            f
            for f in os.listdir(f"{root}/segments")
            if f.endswith(".parquet")
        )
        with open(f"{root}/segments/{part}", "wb") as fh:
            fh.write(b"this is not a parquet file")
        assert derive_n_salts(10**12, cfg, spark, root) == 64
    finally:
        shutil.rmtree(root, ignore_errors=True)
