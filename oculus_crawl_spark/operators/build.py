"""Index build — ops E1..E13 of SURVEY.md §2.B.

Pipeline (SURVEY §3.1):

  pages scan -> filter -> latest-per-url dedup -> Arrow text extraction
    -> tokenize -> (term, docID, tf, dl) triples   [ONE materialized pass]
    -> [dictionary stats | SALTED TWO-PHASE posting assembly -> blocks]
    -> partitioned segment/dictionary/stats writes -> lineage metrics

Scale design notes (the parts that must survive 1000 executors / 100 TB):

* The tf-triple aggregation (E5) is a reducing groupBy — Spark's partial
  (map-side) aggregation shrinks it before the shuffle, so it scales.
  ``postings`` is the single persist() point: doclen, corpus stats and
  the segment build all derive from it, so the 100 TB corpus is scanned
  (and the Arrow extract/tokenize UDFs run) exactly once.
* Posting-list assembly is a COLLECTING aggregation — partial agg gives
  zero reduction and AQE skew handling covers joins only, so a stop word
  occurring in every doc would land on one reducer. Hence the mandated
  two-phase salted assembly (BASELINE.json:6): phase 1 groups on
  (term, range_bucket, salt) and emits an already-compressed sorted run,
  so no task ever materializes a full hot-term posting list and the
  phase-2 shuffle moves ~1-2 bytes/posting; phase 2 merges <= S runs per
  (term, range_bucket) into 128-doc PFor blocks.
* Blocks never cross a doc range_bucket boundary, which is what lets the
  query path fan out per (query, range) with per-partition exactness
  (document-partitioned search — operators/query.py).
* segments is written partitioned by term_bucket => query-time partition
  pruning touches only buckets containing query terms (op Q3).
* dictionary/doclen/lineage are derived FROM the committed segments /
  postings tables, so stats can never drift from the written index.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..config import DEFAULT, IndexConfig
from ..functions import bm25
from ..functions.analysis import extract_text_udf, tokenize_udf
from ..functions.codec import (
    decode_doc_ids,
    encode_doc_gaps,
    pfor_decode,
    pfor_encode,
)
from ..sources.tables import read_engine_table, write_table


@dataclass(frozen=True)
class IndexPaths:
    root: str

    @property
    def segments(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def doclen(self) -> str:
        return os.path.join(self.root, "doclen")

    @property
    def corpus_stats(self) -> str:
        return os.path.join(self.root, "corpus_stats")

    @property
    def docmap(self) -> str:
        return os.path.join(self.root, "docmap")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage_metrics")


# --- term bucketing (shared by build + dictionary + query pruning) -----------


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Deterministic term bucket, identical on driver and executors.

    Python's builtin hash() is salted per process => unusable. FNV-1a over
    UTF-8 is stable, cheap, and dependency-free."""
    h = 0xCBF29CE484222325
    for byte in term.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return int(h % n_buckets)


# --- E2: filter + dedup, E1: extraction, docID assignment --------------------


def prepare_pages(
    pages: DataFrame,
    langs: Iterable[str] | None = None,
    cfg: IndexConfig = DEFAULT,
) -> DataFrame:
    """pages(url, warc_ts, html, [lang]) -> (url, warc_ts, text, lang).

    E2b filter (pushed to the scan by Catalyst — native columns only),
    E2c latest-per-url dedup (pinned tie-break: warc_ts DESC, then the
    longer html so reruns are deterministic even on ts ties), then E1
    byte-identical Arrow text extraction. ``html`` is dropped immediately
    after extraction so column pruning keeps it out of every shuffle."""
    df = pages.filter(F.col("url").isNotNull() & F.col("html").isNotNull())
    if langs is not None:
        df = df.filter(F.col("lang").isin(list(langs)))
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.length("html").desc()
    )
    df = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return df.select(
        "url",
        "warc_ts",
        extract_text_udf("html").alias("text"),
        "lang",
    )


def assign_doc_ids(prepared: DataFrame, n_partitions: int = 32) -> DataFrame:
    """Dense deterministic 64-bit docIDs (SURVEY §7.4).

    hash64(url) collides at 10^12 docs (~27k birthday collisions), so IDs
    are dense: range-partition by url, count per partition, exclusive-scan
    the (tiny, one row per partition) counts on the driver, then add the
    partition offset to a within-partition running count. No global sort;
    one extra narrow pass. Deterministic for a fixed url set and
    n_partitions (Spark's range sampler is deterministically seeded);
    changing n_partitions renumbers — pin it per index generation."""
    parted = prepared.repartitionByRange(n_partitions, "url").sortWithinPartitions(
        "url"
    )
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    counts = {
        r["_pid"]: r["n"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def _number(batches):
        seen = 0
        for pdf in batches:
            base = offsets[int(pdf["_pid"].iloc[0])] + seen
            seen += len(pdf)
            pdf = pdf.assign(doc_id=np.arange(base, base + len(pdf), dtype=np.int64))
            yield pdf.drop(columns=["_pid"])

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in prepared.schema.fields
    )
    return with_pid.mapInPandas(_number, schema=out_schema + ", doc_id long")


# --- E3/E4/E5: tokenize, doc length, tf triples ------------------------------


def tokenize_corpus(corpus: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> (doc_id, tokens, dl)."""
    return corpus.select(
        "doc_id",
        tokenize_udf("text").alias("tokens"),
    ).withColumn("dl", F.size("tokens").cast("int"))


def term_frequencies(tokenized: DataFrame) -> DataFrame:
    """E5: explode tokens -> (term, doc_id, tf, dl).

    groupBy(doc_id, dl, term).count() is a reducing agg: Spark's partial
    aggregation collapses repeats map-side before the shuffle (dl is
    functionally dependent on doc_id, so adding it to the key is free)."""
    return (
        tokenized.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )


# --- E7: salted two-phase posting assembly -> compressed blocks --------------

_RUNS_SCHEMA = (
    "term string, range_bucket long, salt int, n_docs int, first_doc long, "
    "doc_bytes binary, tf_bytes binary, dl_bytes binary"
)


def _make_run(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase 1: one (term, range_bucket, salt) group -> one compressed,
    docID-sorted run. Runs are compressed BEFORE the phase-2 shuffle."""
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    docs = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["dl"].to_numpy()[order].astype(np.uint64)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "range_bucket": [pdf["range_bucket"].iloc[0]],
            "salt": [np.int32(pdf["salt"].iloc[0])],
            "n_docs": [np.int32(len(docs))],
            "first_doc": [np.int64(docs[0])],
            "doc_bytes": [encode_doc_gaps(docs)],
            "tf_bytes": [pfor_encode(tfs)],
            "dl_bytes": [pfor_encode(dls)],
        }
    )


def _merge_runs_factory(avgdl: float, epoch: int, cfg: IndexConfig):
    """Phase 2: merge <= S compressed runs of one (term, range_bucket) into
    final fixed-size blocks with per-block max-score statistics (E7c/d/e)."""
    bs = cfg.block_size
    n_buckets = cfg.n_term_buckets

    def merge_runs(pdf: pd.DataFrame) -> pd.DataFrame:
        docs_parts, tf_parts, dl_parts = [], [], []
        for row in pdf.itertuples(index=False):  # <= S rows (runs), not postings
            docs_parts.append(decode_doc_ids(row.first_doc, row.doc_bytes, row.n_docs))
            tf_parts.append(pfor_decode(row.tf_bytes))
            dl_parts.append(pfor_decode(row.dl_bytes))
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        order = np.argsort(docs, kind="stable")  # docs unique across salts
        docs, tfs, dls = docs[order], tfs[order], dls[order]

        term = pdf["term"].iloc[0]
        rb = int(pdf["range_bucket"].iloc[0])
        tb = _term_bucket_py(term, n_buckets)
        tf_norms = bm25.tf_norm(tfs, dls, avgdl)

        rows = []
        for bid, start in enumerate(range(0, len(docs), bs)):
            d = docs[start : start + bs]
            t = tfs[start : start + bs]
            rows.append(
                {
                    "term": term,
                    "term_bucket": tb,
                    "range_bucket": rb,
                    "block_id": bid,
                    "first_doc": np.int64(d[0]),
                    "last_doc": np.int64(d[-1]),
                    "n_docs": np.int32(len(d)),
                    "sum_tf": np.int64(t.sum()),
                    "block_max_tf_norm": np.float32(tf_norms[start : start + bs].max()),
                    "doc_bytes": encode_doc_gaps(d),
                    "tf_bytes": pfor_encode(t),
                    "dl_bytes": pfor_encode(dls[start : start + bs]),
                    "epoch": np.int64(epoch),
                }
            )
        return pd.DataFrame(rows)

    return merge_runs


def build_segments(
    postings: DataFrame, avgdl: float, epoch: int, cfg: IndexConfig = DEFAULT
) -> DataFrame:
    """(term, doc_id, tf, dl) -> compressed segments DataFrame (lazy)."""
    salted = postings.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(cfg.n_salts)).cast("int")
    ).withColumn("range_bucket", F.shiftright("doc_id", cfg.range_bits).cast("long"))
    runs = salted.groupBy("term", "range_bucket", "salt").applyInPandas(
        _make_run, _RUNS_SCHEMA
    )
    return runs.groupBy("term", "range_bucket").applyInPandas(
        _merge_runs_factory(avgdl, epoch, cfg), schemas.SEGMENTS
    )


# --- the full build ----------------------------------------------------------


@dataclass
class BuildResult:
    paths: IndexPaths
    n_docs: int
    avgdl: float
    wall_sec: float
    docs_per_sec: float


def build_index(
    corpus: DataFrame,
    index_root: str,
    epoch: int = 0,
    cfg: IndexConfig = DEFAULT,
) -> BuildResult:
    """Build a full index epoch from a corpus DataFrame (doc_id, text).

    Writes segments/dictionary/doclen/corpus_stats (+ lineage metrics)
    under ``index_root`` via the Iceberg-or-Parquet shim."""
    spark = corpus.sparkSession
    paths = IndexPaths(index_root)
    t0 = time.monotonic()

    # ONE pass over the corpus: extract/tokenize UDFs run once, the
    # reduced (term, doc, tf, dl) triples are the materialization point.
    postings = term_frequencies(tokenize_corpus(corpus)).persist()

    # E4/E8: doc lengths + corpus stats (dl rides on the postings rows).
    doclen = postings.groupBy("doc_id").agg(F.max("dl").cast("int").alias("dl"))
    stats_row = doclen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"])

    # E7: salted two-phase assembly -> compressed blocks, written
    # partitioned by term_bucket (query-time partition pruning, Q3).
    segments = build_segments(postings, avgdl, epoch, cfg)
    write_table(segments, paths.segments, partition_by=["term_bucket"])

    # E6/E10: dictionary + stats tables, derived from the COMMITTED
    # segments so they can never drift from the written index. df is
    # exact (approx_count_distinct would break rank-stability).
    seg = read_engine_table(spark, paths.segments)
    dictionary = (
        seg.groupBy("term", "term_bucket")
        .agg(
            F.sum("n_docs").cast("long").alias("df"),
            F.sum("sum_tf").cast("long").alias("cf"),
            F.count("*").cast("int").alias("n_blocks"),
        )
        .select("term", "df", "cf", "n_blocks", "term_bucket")
    )
    write_table(dictionary, paths.dictionary)
    write_table(doclen, paths.doclen)
    stats_df = spark.createDataFrame(
        [(n_docs, avgdl, epoch, cfg.analysis_version)],
        schema=schemas.CORPUS_STATS,
    )
    write_table(stats_df, paths.corpus_stats)
    postings.unpersist()

    wall = time.monotonic() - t0

    # E13: per-partition lineage/metrics from the committed segments
    # (input_rows = postings per bucket, bytes_out = blob bytes) + the
    # driver-measured wall clock for the whole build stage.
    lineage = (
        seg.groupBy("term_bucket")
        .agg(
            F.sum("n_docs").cast("long").alias("input_rows"),
            F.count("*").cast("long").alias("output_rows"),
            F.sum(
                F.length("doc_bytes") + F.length("tf_bytes") + F.length("dl_bytes")
            )
            .cast("long")
            .alias("bytes_out"),
        )
        .select(
            F.lit(epoch).cast("long").alias("epoch"),
            F.lit("build").alias("stage"),
            F.col("term_bucket").cast("int").alias("partition_id"),
            "input_rows",
            "output_rows",
            "bytes_out",
            F.lit(int(wall * 1000)).cast("long").alias("wall_ms"),
            F.lit("done").alias("status"),
        )
    )
    write_table(lineage, paths.lineage, mode="append")

    return BuildResult(
        paths=paths,
        n_docs=n_docs,
        avgdl=avgdl,
        wall_sec=wall,
        docs_per_sec=n_docs / wall if wall > 0 else float("inf"),
    )


def build_index_from_documents(
    spark: SparkSession, sf_dir: str, index_root: str, cfg: IndexConfig = DEFAULT
) -> BuildResult:
    """Convenience: build from the driver testdata ``documents`` table
    (native dense doc_ids — the oracle compares on these directly)."""
    from ..sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return build_index(docs, index_root, cfg=cfg)


def build_index_from_pages(
    pages: DataFrame,
    index_root: str,
    epoch: int = 0,
    langs: Iterable[str] | None = None,
    cfg: IndexConfig = DEFAULT,
) -> BuildResult:
    """Full north-rule path: pages(url, warc_ts, html, lang) -> index.

    filter -> dedup -> byte-identical extraction -> dense docIDs (docmap
    persisted for doc_id <-> url resolution) -> shared build."""
    corpus = assign_doc_ids(prepare_pages(pages, langs=langs, cfg=cfg))
    paths = IndexPaths(index_root)
    write_table(
        corpus.select("doc_id", "url", "warc_ts"),
        paths.docmap,
    )
    return build_index(corpus.select("doc_id", "text"), index_root, epoch, cfg)
