"""Query path — ops Q1..Q7 of SURVEY.md §2.B.

  Q1 tokenize query (shared frozen analyzer)
  Q2 dictionary lookup -> (term, df, idf, term_bucket)      [tiny, driver]
  Q3 partition pruning: segments scan touches ONLY the term_buckets of
     query terms (literal IN-list => parquet/Iceberg partition pruning)
     + broadcast join against the query-terms DataFrame
  Q4 block-max WAND: per (query_id, range_bucket) group, an exact top-k
     with per-block max-score skipping over lazily-decompressed posting
     blocks, vectorized in NumPy inside applyInPandas
  Q5 Okapi BM25 k1=1.2 b=0.75 (functions/bm25 — one frozen formula)
  Q6 global top-k merge of the per-range top-k rows (tiny)
  Q7 rank assignment, pinned tie-break (score DESC, doc_id ASC)

Scale story: the index is document-range partitioned (blocks never cross
a range_bucket), so Q4 runs one independent exact WAND per (query,
range) — 10^12 docs = ~1M ranges fanned out across executors, each
seeing only its range's blocks. Per-range top-k lists (<= k rows each)
are then globally merged — a classic document-partitioned search tier
expressed as two DataFrame ops.

Exactness of the skipping (BMW soundness argument): for every block b of
term t, UB(b) = idf_t*block_max(b) + sum over other query terms t' of
the max idf_t'*block_max over t' blocks OVERLAPPING b's [first,last]
doc range. Any doc d in b appears, for each of its matching terms, in a
block overlapping b's range (it contains d), so score(d) <= UB(b).
Blocks with UB(b) < theta (theta = current k-th best score) can be
skipped wholesale; candidate docs from surviving blocks are scored
EXACTLY by probing all terms' blocks that contain them (decompressed on
demand). Property-tested BMW == exhaustive in tests/.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT, IndexConfig
from ..functions import bm25
from ..functions.analysis import tokenize
from ..functions.codec import decode_doc_ids, pfor_decode
from .build import IndexPaths, _term_bucket_py


# --- sparse-table range-max (vectorized overlap bounds) ----------------------


def _sparse_table(values: np.ndarray) -> list[np.ndarray]:
    """st[j][i] = max(values[i : i + 2**j]); O(n log n), fully vectorized."""
    st = [values]
    j = 1
    while (1 << j) <= len(values):
        prev = st[-1]
        half = 1 << (j - 1)
        st.append(np.maximum(prev[: len(prev) - half], prev[half:]))
        j += 1
    return st


def _range_max(st: list[np.ndarray], lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized max(values[lo:hi]) per query window; 0.0 where lo >= hi."""
    out = np.zeros(len(lo), dtype=np.float64)
    length = hi - lo
    nonempty = length > 0
    if not nonempty.any():
        return out
    j = np.zeros(len(lo), dtype=np.int64)
    j[nonempty] = np.int64(np.floor(np.log2(length[nonempty])))
    for jj in np.unique(j[nonempty]):
        sel = nonempty & (j == jj)
        span = 1 << int(jj)
        tbl = st[int(jj)]
        out[sel] = np.maximum(tbl[lo[sel]], tbl[hi[sel] - span])
    return out


# --- the per-(query, range) exact BMW kernel ---------------------------------


class _TermBlocks:
    """All candidate blocks of one term within the group, sorted by
    first_doc (disjoint doc ranges within a term). Decompresses blocks
    lazily and caches them."""

    __slots__ = ("idf", "first", "last", "bmax", "rows", "_cache", "decoded_blocks")

    def __init__(self, idf: float, pdf: pd.DataFrame):
        order = np.argsort(pdf["first_doc"].to_numpy(), kind="stable")
        self.idf = idf
        self.first = pdf["first_doc"].to_numpy()[order]
        self.last = pdf["last_doc"].to_numpy()[order]
        self.bmax = idf * pdf["block_max_tf_norm"].to_numpy()[order].astype(np.float64)
        self.rows = pdf.iloc[order]
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self.decoded_blocks = 0

    def decode(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        hit = self._cache.get(i)
        if hit is None:
            r = self.rows.iloc[i]
            # int64 throughout the kernel: mixing uint64 with int64 in
            # searchsorted silently upcasts to float64 (lossy past 2^53).
            docs = decode_doc_ids(
                int(r["first_doc"]), r["doc_bytes"], int(r["n_docs"])
            ).astype(np.int64)
            hit = (docs, pfor_decode(r["tf_bytes"]), pfor_decode(r["dl_bytes"]))
            self._cache[i] = hit
            self.decoded_blocks += 1
        return hit

    def score_docs(self, cand: np.ndarray, avgdl: float) -> np.ndarray:
        """Exact idf*tf_norm contribution of this term for each candidate
        doc (0 where the doc has no posting). Decompresses only blocks
        that can contain a candidate."""
        out = np.zeros(len(cand), dtype=np.float64)
        bidx = np.searchsorted(self.first, cand, side="right") - 1
        valid = (bidx >= 0) & (cand <= self.last[np.maximum(bidx, 0)])
        if not valid.any():
            return out
        for i in np.unique(bidx[valid]):
            docs, tfs, dls = self.decode(int(i))
            in_block = valid & (bidx == i)
            pos = np.searchsorted(docs, cand[in_block])
            pos = np.minimum(pos, len(docs) - 1)
            hit = docs[pos] == cand[in_block]
            if hit.any():
                tgt = np.flatnonzero(in_block)[hit]
                p = pos[hit]
                out[tgt] = self.idf * bm25.tf_norm(tfs[p], dls[p], avgdl)
        return out


def _bmw_topk(
    terms: list[_TermBlocks], k: int, avgdl: float
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k (docs, scores) for one (query, range) group."""

    def exact_scores(cand: np.ndarray) -> np.ndarray:
        s = np.zeros(len(cand), dtype=np.float64)
        for t in terms:
            s += t.score_docs(cand, avgdl)
        return s

    # Seed theta: exactly score the docs of each term's single best block.
    seed_parts = [t.decode(int(np.argmax(t.bmax)))[0] for t in terms if len(t.first)]
    if not seed_parts:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    seed = np.unique(np.concatenate(seed_parts))
    seed_scores = exact_scores(seed)
    if len(seed) > k:
        theta = -np.partition(-seed_scores, k - 1)[k - 1]
    else:
        theta = -np.inf

    # Per-block upper bounds: own bmax + overlap-window max of other terms.
    surviving: list[np.ndarray] = []
    sts = [
        _sparse_table(t.bmax) if len(t.bmax) else None for t in terms
    ]
    for ti, t in enumerate(terms):
        if not len(t.first):
            continue
        ub = t.bmax.copy()
        for tj, o in enumerate(terms):
            if tj == ti or not len(o.first):
                continue
            lo = np.searchsorted(o.last, t.first, side="left")
            hi = np.searchsorted(o.first, t.last, side="right")
            ub += _range_max(sts[tj], lo, hi)
        keep = ub >= theta - 1e-9  # strict-prune only; float-safe slack
        for i in np.flatnonzero(keep):
            surviving.append(t.decode(int(i))[0])

    cand = np.unique(np.concatenate([seed] + surviving)) if surviving else seed
    scores = exact_scores(cand)
    if len(cand) > k:
        part = np.argpartition(-scores, k - 1)[:k]
        # pinned tie-break: score DESC, doc_id ASC — but argpartition's
        # boundary may split ties arbitrarily, so re-select on the full
        # set when the k-th score ties outside the partition.
        kth = scores[part].min()
        tied = scores >= kth - 0.0
        idx = np.flatnonzero(tied)
        order = np.lexsort((cand[idx], -scores[idx]))
        sel = idx[order][:k]
    else:
        order = np.lexsort((cand, -scores))
        sel = order
    return cand[sel], scores[sel]


# --- the Spark surface --------------------------------------------------------


def _wand_factory(k: int, avgdl: float):
    def wand(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        terms = [
            _TermBlocks(float(g["idf"].iloc[0]), g)
            for _, g in pdf.groupby("term", sort=True)
        ]
        docs, scores = _bmw_topk(terms, k, avgdl)
        total = int(len(pdf))
        decoded = int(sum(t.decoded_blocks for t in terms))
        return pd.DataFrame(
            {
                "query_id": np.full(len(docs), qid, dtype=np.int32),
                "doc_id": docs.astype(np.int64),
                "score": scores,
                "blocks_total": np.full(len(docs), total, dtype=np.int64),
                "blocks_decoded": np.full(len(docs), decoded, dtype=np.int64),
            }
        )

    return wand


_WAND_SCHEMA = (
    "query_id int, doc_id long, score double, "
    "blocks_total long, blocks_decoded long"
)


class SearchSession:
    """A resident query tier over one built index.

    Loads ``corpus_stats`` once and — when the vocabulary is small enough
    to be driver-resident (the common case for a serving tier; bounded by
    ``max_resident_terms``) — the dictionary once, so each query batch
    issues exactly ONE Spark job: pruned segments scan -> broadcast join
    -> per-range WAND -> global top-k. For huge vocabularies the lookup
    falls back to a per-batch broadcast semi-join against the dictionary
    table (predicate-pruned parquet scan)."""

    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        cfg: IndexConfig = DEFAULT,
        max_resident_terms: int = 2_000_000,
        cache_segments: bool = True,
    ):
        self.spark = spark
        self.cfg = cfg
        self.paths = IndexPaths(index_root)
        stats = spark.read.parquet(self.paths.corpus_stats).collect()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self._dictionary = spark.read.parquet(self.paths.dictionary)
        self._segments = spark.read.parquet(self.paths.segments)
        if cache_segments:
            # A serving tier keeps its (compressed, small) segments hot;
            # repeated queries then skip the parquet scan entirely.
            # Partition pruning still applies — the filter lands on the
            # InMemoryTableScan. Disable for one-shot batch querying.
            self._segments = self._segments.persist()
        self._resident: dict[str, tuple[int, int]] | None = None
        if self._dictionary.count() <= max_resident_terms:
            self._resident = {
                r["term"]: (int(r["df"]), int(r["term_bucket"]))
                for r in self._dictionary.select(
                    "term", "df", "term_bucket"
                ).collect()
            }

    def _lookup(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        if self._resident is not None:
            return {t: self._resident[t] for t in terms if t in self._resident}
        terms_df = self.spark.createDataFrame([(t,) for t in terms], "term string")
        rows = (
            self._dictionary.join(F.broadcast(terms_df), "term", "inner")
            .select("term", "df", "term_bucket")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["term_bucket"])) for r in rows}

    def search(
        self,
        queries: list[str] | list[list[str]],
        k: int = 10,
        with_metrics: bool = False,
        gather: str = "driver",
    ) -> DataFrame:
        """gather='driver' (default): per-range top-k lists (<= ranges*k
        tiny rows) are collected and merged at the coordinator — the
        standard scatter-gather search-tier shape; one Spark job, no
        post-scan shuffle. gather='spark': the merge stays distributed
        (window + filter) — use when ranges*queries*k is itself big.
        Both produce identical rows (pinned tie-break)."""
        spark = self.spark

        # Q1: tokenize queries with the SAME frozen analyzer as the corpus.
        qterms: list[tuple[int, str]] = []
        for qid, q in enumerate(queries):
            toks = (
                tokenize(q)
                if isinstance(q, str)
                else [t for s in q for t in tokenize(s)]
            )
            qterms.extend((qid, t) for t in sorted(set(toks)))

        empty = spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
        if not qterms:
            return empty

        # Q2: dictionary lookup (resident map or pruned semi-join).
        info = self._lookup(sorted({t for _, t in qterms}))
        if not info:
            return empty
        buckets = sorted({tb for _, tb in info.values()})

        # idf per (query, term), computed once driver-side (tiny).
        qrows = [
            (qid, t, float(bm25.idf(self.n_docs, np.array([info[t][0]]))[0]))
            for qid, t in qterms
            if t in info
        ]
        qdf = spark.createDataFrame(qrows, "query_id int, term string, idf double")

        # Q3: partition-pruned scan (term_bucket IN literal list) +
        # broadcast join — never a shuffle of the segments side.
        segments = self._segments.filter(F.col("term_bucket").isin(buckets))
        cand = segments.join(F.broadcast(qdf), "term", "inner")

        # Q4/Q5: one exact BMW per (query, range) — the document-
        # partitioned fan-out; each group sees only its range's blocks.
        per_range = cand.groupBy("query_id", "range_bucket").applyInPandas(
            _wand_factory(k, self.avgdl), _WAND_SCHEMA
        )

        # Q6/Q7: global merge of per-range top-k (<= ranges*k tiny rows).
        out_cols = ["query_id", "rank", "doc_id", "score"]
        if with_metrics:
            out_cols += ["blocks_total", "blocks_decoded"]
        if gather == "driver":
            rows = per_range.collect()
            per_q: dict[int, list] = {}
            for r in rows:
                per_q.setdefault(r["query_id"], []).append(r)
            out = []
            for qid in sorted(per_q):
                ranked = sorted(per_q[qid], key=lambda r: (-r["score"], r["doc_id"]))
                for rank, r in enumerate(ranked[:k], start=1):
                    rec = [qid, rank, r["doc_id"], float(r["score"])]
                    if with_metrics:
                        rec += [r["blocks_total"], r["blocks_decoded"]]
                    out.append(tuple(rec))
            schema = "query_id int, rank int, doc_id long, score double"
            if with_metrics:
                schema += ", blocks_total long, blocks_decoded long"
            return spark.createDataFrame(out, schema)
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        return (
            per_range.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*out_cols)
        )


_SESSION_CACHE: dict[str, SearchSession] = {}


def search(
    spark: SparkSession,
    index_root: str,
    queries: list[str] | list[list[str]],
    k: int = 10,
    cfg: IndexConfig = DEFAULT,
    with_metrics: bool = False,
) -> DataFrame:
    """BM25 top-k for a batch of queries against a built index.

    Returns DataFrame(query_id, rank, doc_id, score) — rank-identical to
    the exhaustive oracle (pinned tie-break score DESC, doc_id ASC).
    Thin wrapper over a cached ``SearchSession`` per index root."""
    sess = _SESSION_CACHE.get(index_root)
    if sess is None or sess.spark is not spark:
        sess = SearchSession(spark, index_root, cfg)
        _SESSION_CACHE[index_root] = sess
    return sess.search(queries, k=k, with_metrics=with_metrics)


def search_bruteforce(
    spark: SparkSession,
    corpus: DataFrame,
    queries: list[str],
    k: int = 10,
) -> DataFrame:
    """Index-free exhaustive BM25 — pure DataFrame expressions end to end
    (no Python UDF on the scoring path; the tokenizer is the codegen'd
    ``tokenize_expr`` equivalent of the frozen spec). Used as the Spark-
    side oracle and for one-shot queries where building an index is not
    worth it."""
    from ..functions.analysis import tokenize_expr

    toks = corpus.select(
        "doc_id", tokenize_expr(F.col("text")).alias("tokens")
    ).withColumn("dl", F.size("tokens"))
    tf = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    qrows = []
    for qid, q in enumerate(queries):
        for t in sorted(set(tokenize(q))):
            qrows.append((qid, t))
    if not qrows:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    qdf = spark.createDataFrame(qrows, "query_id int, term string")

    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            bm25.idf_col(F.col("n_docs"), F.col("df"))
            * bm25.tf_norm_col(F.col("tf"), F.col("dl"), F.col("avgdl")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
