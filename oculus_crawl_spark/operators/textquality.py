"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring, token
statistics, and content fingerprinting over the ``documents`` table.
Everything here is pure JVM-side DataFrame expressions (whole-stage
codegen, zero Python) with exact DuckDB SQL mirrors — these run inside
the 100 TB ingest scan, so they must not leave codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import TOKENIZE_ORACLE_REGEX
from ..sources.tables import read_table

# Tiny embedded stopword lists for the language-ID heuristic (top
# function words; enough to separate languages on natural text).
EN_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"]
FR_STOP = ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"]
ES_STOP = ["el", "la", "los", "y", "es", "un", "una", "en", "que", "por"]

_LANGS = [("en", EN_STOP), ("de", DE_STOP), ("fr", FR_STOP), ("es", ES_STOP)]


def _toks(col):
    t = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(t, lambda x: x != F.lit(""))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics: counts, uniqueness, mean token length.

    Ratio denominators are ``greatest(n, 1)``: a zero-token document
    (empty text, punctuation-only crawl junk) must yield defined 0.0
    ratios, not a DIVIDE_BY_ZERO crash under Spark 4's default ANSI
    mode (nor a NULL on the DuckDB side — the oracles coalesce the same
    way, pinned by the zero-token edge-case test)."""
    toks = _toks(F.col("text"))
    n = F.size(toks)
    ng = F.greatest(n, F.lit(1))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(F.size(F.array_distinct(toks)) / ng, 6).alias("uniq_ratio"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
            )
            / ng,
            6,
        ).alias("mean_token_len"),
        F.length("text").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + lexical diversity
    + stopword presence — the standard cheap pre-filter before expensive
    dedup/model scoring in a webtext pipeline."""
    toks = _toks(F.col("text"))
    n = F.size(toks)
    ng = F.greatest(n, F.lit(1))  # zero-token docs: defined 0.0, no ANSI crash
    uniq = F.size(F.array_distinct(toks)) / ng
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(EN_STOP)))
    stop_ratio = stop_hits / ng
    len_ok = (n >= 20) & (n <= 1000)
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(uniq, F.lit(0.5)) * 0.6
        + F.least(stop_ratio * 10, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(uniq, 6).alias("uniq_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language ID: argmax over per-language function-word
    hit ratios; 'unk' when no language clears the floor. Deterministic
    tie-break: first language in _LANGS order (en, de, fr, es)."""
    toks = _toks(F.col("text"))
    n = F.greatest(F.size(toks), F.lit(1))
    ratios = {
        lang: F.size(F.filter(toks, lambda x: x.isin(words))) / n
        for lang, words in _LANGS
    }
    best = F.greatest(*[F.lit(0.0)] + list(ratios.values()))
    pred = F.lit("unk")
    # Build argmax right-to-left so earlier languages win exact ties.
    for lang, _ in reversed(_LANGS):
        pred = F.when((ratios[lang] >= 0.02) & (ratios[lang] == best), lang).otherwise(
            pred
        )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        F.round(best, 6).alias("best_ratio"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of normalized text + a 64-bit prefix
    fingerprint parsed from it (cheap join key for dedup tiers)."""
    fp = F.md5(F.lower(F.col("text")))
    return docs.select(
        "doc_id",
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp64"),
        F.length("text").alias("n_chars"),
    )


# --- driver-contract entries (Spark fn, DuckDB oracle) -----------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")


def q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir)).orderBy("doc_id")


SQL_TOKEN_STATS = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}') AS toks,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique,
       round(len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 6) AS uniq_ratio,
       round(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0 / greatest(len(toks), 1), 6) AS mean_token_len,
       n_chars
FROM t ORDER BY doc_id
"""


def q_quality(spark, sf_dir):
    return quality_scores(_docs(spark, sf_dir)).orderBy("doc_id")


_EN_LIST = ", ".join(f"'{w}'" for w in EN_STOP)
SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS uniq,
         len(list_filter(toks, x -> x IN ({_EN_LIST}))) * 1.0 / greatest(len(toks), 1) AS stop_ratio
  FROM t
)
SELECT doc_id, n_tokens,
       round(uniq, 6) AS uniq_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END
             + least(uniq, 0.5) * 0.6
             + least(stop_ratio * 10, 1.0) * 0.2, 6) AS quality
FROM m ORDER BY doc_id
"""


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir)).orderBy("doc_id")


def _sql_ratio(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, x -> x IN ({lst}))) * 1.0 / greatest(len(toks), 1)"


SQL_LANG_ID = f"""
WITH t AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}') AS toks
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         {_sql_ratio(EN_STOP)} AS r_en,
         {_sql_ratio(DE_STOP)} AS r_de,
         {_sql_ratio(FR_STOP)} AS r_fr,
         {_sql_ratio(ES_STOP)} AS r_es
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN r_en >= 0.02 AND r_en >= greatest(r_en, r_de, r_fr, r_es) THEN 'en'
            WHEN r_de >= 0.02 AND r_de >= greatest(r_en, r_de, r_fr, r_es) THEN 'de'
            WHEN r_fr >= 0.02 AND r_fr >= greatest(r_en, r_de, r_fr, r_es) THEN 'fr'
            WHEN r_es >= 0.02 AND r_es >= greatest(r_en, r_de, r_fr, r_es) THEN 'es'
            ELSE 'unk' END AS pred_lang,
       round(greatest(0.0, r_en, r_de, r_fr, r_es), 6) AS best_ratio
FROM r ORDER BY doc_id
"""


def q_fingerprints(spark, sf_dir):
    return fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")


SQL_FINGERPRINTS = """
SELECT doc_id,
       md5(lower(text)) AS fp_md5,
       ('0x' || substr(md5(lower(text)), 1, 15))::BIGINT AS fp64,
       length(text) AS n_chars
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "text_token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "text_quality_scores": (q_quality, SQL_QUALITY),
    "text_lang_id": (q_lang_id, SQL_LANG_ID),
    "text_fingerprints": (q_fingerprints, SQL_FINGERPRINTS),
}
