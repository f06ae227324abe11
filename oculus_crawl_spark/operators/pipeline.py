"""End-to-end training-corpus preparation: the composition every
webtext pipeline runs before training — language filter, quality
threshold, exact dedup — fused into ONE corpus pass.

Composition strategy (the 100 TB story): the per-document signals
(lang-id ratios, quality score, content fingerprint) are all computed
in a SINGLE projection over the scan — pure whole-stage codegen, zero
Python, zero joins between "stages" (joining the outputs of the three
operators would re-shuffle the corpus twice for no reason). The
filters run BEFORE the dedup shuffle, so Catalyst pushes them into the
scan projection and only surviving rows pay the one shuffle the
pipeline needs: the reducing groupBy on the 16-byte md5 fingerprint
(partial aggregation collapses same-partition copies map-side).
Duplicate groups are collapsed to their canonical (min doc_id) copy;
quality/pred_lang are identical within a group by construction (both
are functions of lower(text), which md5 groups exactly), so min() over
the group is deterministic and exact.

The building-block semantics are shared with (and pinned by) the
single-operator entries: quality/lang-id expressions from
operators/textquality.py, md5-canonical dedup from operators/dedup.py
(exact_dedup_groups). This module only fuses them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_table
from .textquality import EN_STOP, _LANGS, _toks


def clean_corpus(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
) -> DataFrame:
    """(doc_id, pred_lang, quality, n_copies) for every document that
    survives language filter + quality threshold + exact dedup; doc_id
    is the canonical (min) id of its content group, n_copies the number
    of surviving copies collapsed into it."""
    toks = _toks(F.col("text"))
    n = F.size(toks)
    # greatest(n, 1) everywhere a ratio divides by the token count: a
    # zero-token doc must score a defined 0.0, not crash ANSI division
    # (same contract as the single-operator entries in textquality.py).
    ng = F.greatest(n, F.lit(1))
    uniq = F.size(F.array_distinct(toks)) / ng
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(EN_STOP))) / ng
    quality = (
        F.when((n >= 20) & (n <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(uniq, F.lit(0.5)) * 0.6
        + F.least(stop_ratio * 10, F.lit(1.0)) * 0.2
    )
    ratios = {
        lang: F.size(F.filter(toks, lambda x: x.isin(words))) / ng
        for lang, words in _LANGS
    }
    best = F.greatest(*[F.lit(0.0)] + list(ratios.values()))
    pred = F.lit("unk")
    for lang, _ in reversed(_LANGS):
        pred = F.when((ratios[lang] >= 0.02) & (ratios[lang] == best), lang).otherwise(
            pred
        )

    scored = docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.round(quality, 6).alias("quality"),
        F.md5(F.lower(F.col("text"))).alias("fp"),
    )
    kept = scored.filter(
        F.col("pred_lang").isin(list(keep_langs))
        & (F.col("quality") >= F.lit(min_quality))
    )
    return (
        kept.groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("pred_lang").alias("pred_lang"),
            F.min("quality").alias("quality"),
            F.count("*").alias("n_copies"),
        )
        .select("doc_id", "pred_lang", "quality", "n_copies")
    )


# --- driver-contract entry ---------------------------------------------------


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a shifted copy of the corpus (so the dedup stage has
    real duplicates to collapse, mirroring dedup_exact_fingerprint):
    every surviving group must have n_copies=2 with the canonical id in
    the original range."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    return clean_corpus(docs.unionByName(copies)).orderBy("doc_id")


def _sql_ratio(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, x -> x IN ({lst}))) * 1.0 / greatest(len(toks), 1)"


def _sql() -> str:
    from ..functions.analysis import TOKENIZE_ORACLE_REGEX
    from .textquality import DE_STOP, ES_STOP, FR_STOP

    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
),
t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKENIZE_ORACLE_REGEX}') AS toks,
         md5(lower(text)) AS fp
  FROM base
),
m AS (
  SELECT doc_id, fp, len(toks) AS n_tokens,
         len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1) AS uniq,
         {_sql_ratio(EN_STOP)} AS r_en,
         {_sql_ratio(DE_STOP)} AS r_de,
         {_sql_ratio(FR_STOP)} AS r_fr,
         {_sql_ratio(ES_STOP)} AS r_es
  FROM t
),
s AS (
  SELECT doc_id, fp,
         CASE WHEN r_en >= 0.02 AND r_en >= greatest(r_en, r_de, r_fr, r_es) THEN 'en'
              WHEN r_de >= 0.02 AND r_de >= greatest(r_en, r_de, r_fr, r_es) THEN 'de'
              WHEN r_fr >= 0.02 AND r_fr >= greatest(r_en, r_de, r_fr, r_es) THEN 'fr'
              WHEN r_es >= 0.02 AND r_es >= greatest(r_en, r_de, r_fr, r_es) THEN 'es'
              ELSE 'unk' END AS pred_lang,
         round(CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END
               + least(uniq, 0.5) * 0.6
               + least(r_en * 10, 1.0) * 0.2, 6) AS quality
  FROM m
)
SELECT min(doc_id) AS doc_id, min(pred_lang) AS pred_lang,
       min(quality) AS quality, count(*) AS n_copies
FROM s
WHERE pred_lang = 'en' AND quality >= 0.5
GROUP BY fp ORDER BY doc_id
"""


QUERIES = {
    "pipeline_clean_corpus": (q_clean_corpus, _sql()),
}
