"""Driver-facing fulltext queries — each entry pairs a Spark callable
with (where SQL-expressible) a DuckDB oracle over the same parquet
views (__spark_entry__ contract).

The indexed entries run the REAL pipeline (salted build -> compressed
segments -> block-max WAND) — not a shortcut — with the built index
cached per (process, sf_dir) so the driver's per-query calls don't
rebuild. Scores are rounded to 6 dp on BOTH sides and used as the sort
key so ln()-last-ulp differences between NumPy and DuckDB cannot flip
the driver's order-insensitive value-hash."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bm25
from ..functions.analysis import TOKENIZE_ORACLE_REGEX, tokenize
from .build import build_index_from_documents
from .query import search, search_bruteforce

_INDEX_CACHE: dict[str, str] = {}


def ensure_conf(spark: SparkSession) -> None:
    """Runtime-settable session confs the engine relies on — applied
    defensively because the driver owns the SparkSession."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Runtime-settable; the driver-owned session defaults to 200 which
    # wastes task overhead at sandbox scale (AQE coalesces, but the
    # pre-AQE plan still plans 200 map tasks).
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # Per-batch pandas-construction overhead dominates Arrow crossings
    # at the 10k default (see session.py).
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "200000")


def get_index(spark: SparkSession, sf_dir: str) -> str:
    ensure_conf(spark)
    root = _INDEX_CACHE.get(sf_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="ocs_index_")
        build_index_from_documents(spark, sf_dir, root)
        _INDEX_CACHE[sf_dir] = root
    return root


_MERGED_CACHE: dict[str, str] = {}


def get_merged_index(spark: SparkSession, sf_dir: str) -> str:
    """Two disjoint half-corpus epochs merged by the E14 resumable merge
    — searching it must be rank-identical to the full-corpus oracle."""
    ensure_conf(spark)
    root = _MERGED_CACHE.get(sf_dir)
    if root is None:
        from .build import build_index
        from .merge import merge_indexes

        tmp = tempfile.mkdtemp(prefix="ocs_merged_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        build_index(docs.filter(F.col("doc_id") % 2 == 0), f"{tmp}/ep0", epoch=0)
        build_index(docs.filter(F.col("doc_id") % 2 == 1), f"{tmp}/ep1", epoch=1)
        merge_indexes(spark, [f"{tmp}/ep0", f"{tmp}/ep1"], f"{tmp}/merged")
        root = f"{tmp}/merged"
        _MERGED_CACHE[sf_dir] = root
    return root


def _merged(query: str, k: int = 10):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        root = get_merged_index(spark, sf_dir)
        return _rerank_rounded(search(spark, root, [query], k=k))

    return fn


_DP = 8  # rounding precision for cross-engine score comparison


def _rerank_rounded(out: DataFrame) -> DataFrame:
    """Recompute rank from the ROUNDED score (tie-break doc_id ASC) so
    both engines rank on byte-identical keys."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        out.select("doc_id", F.round("score", _DP).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "score")
    )


def _indexed(query: str, k: int = 10):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        root = get_index(spark, sf_dir)
        return _rerank_rounded(search(spark, root, [query], k=k))

    return fn


def _bruteforce(query: str, k: int = 10):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_conf(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return _rerank_rounded(search_bruteforce(spark, docs, [query], k=k))

    return fn


def _oracle(query: str, k: int = 10) -> str:
    terms = sorted(set(tokenize(query)))
    inner = bm25.bm25_oracle_sql(terms, k=k, round_dp=_DP)
    return (
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank, "
        f"doc_id, score FROM ({inner}) t"
    )


def _term_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: exact per-term document frequency + collection frequency,
    read from the engine's dictionary table (derived from the committed
    compressed segments — so this also verifies the codec round-trips
    through the real index)."""
    root = get_index(spark, sf_dir)
    return (
        spark.read.parquet(f"{root}/dictionary")
        .select("term", "df", "cf")
        .orderBy("term")
    )


_TERM_DICT_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term)
-- CAST: DuckDB sum(BIGINT) is HUGEINT; the engine's cf column is BIGINT.
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf GROUP BY term ORDER BY term
"""


def _doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: per-document token counts from the engine's doclen table."""
    root = get_index(spark, sf_dir)
    return spark.read.parquet(f"{root}/doclen").select("doc_id", "dl")


_DOCLEN_SQL = f"""
SELECT doc_id, count(*) AS dl
FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}')) AS term
      FROM documents) t
GROUP BY doc_id
"""


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = get_index(spark, sf_dir)
    return spark.read.parquet(f"{root}/corpus_stats").select(
        "n_docs", F.round("avgdl", 6).alias("avgdl")
    )


_CORPUS_STATS_SQL = f"""
SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl
FROM (SELECT doc_id, count(*) AS dl
      FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}')) AS term
            FROM documents) t
      GROUP BY doc_id) d
"""


def queries() -> dict:
    return {
        "bm25_topk_rare": _indexed("dup"),
        "bm25_topk_hot": _indexed("the"),
        "bm25_topk_two_terms": _indexed("dup scan"),
        "bm25_topk_three_terms": _indexed("dup column spark"),
        "bm25_topk_all_hot": _indexed("scan column window"),
        "bm25_bruteforce_dataframe": _bruteforce("spark customer"),
        "bm25_topk_merged_epochs": _merged("dup scan column"),
        "fulltext_term_dictionary": _term_dictionary,
        "fulltext_doc_lengths": _doc_lengths,
        "fulltext_corpus_stats": _corpus_stats,
    }


def oracle_sql() -> dict:
    return {
        "bm25_topk_rare": _oracle("dup"),
        "bm25_topk_hot": _oracle("the"),
        "bm25_topk_two_terms": _oracle("dup scan"),
        "bm25_topk_three_terms": _oracle("dup column spark"),
        "bm25_topk_all_hot": _oracle("scan column window"),
        "bm25_bruteforce_dataframe": _oracle("spark customer"),
        "bm25_topk_merged_epochs": _oracle("dup scan column"),
        "fulltext_term_dictionary": _TERM_DICT_SQL,
        "fulltext_doc_lengths": _DOCLEN_SQL,
        "fulltext_corpus_stats": _CORPUS_STATS_SQL,
    }
