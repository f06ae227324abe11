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

Execution tiers (both proven row-identical in tests):

* FAST path (default when the session is resident): segments are kept
  persisted PRE-PARTITIONED BY range_bucket, and the per-term
  (query_id, idf) plan rides in the kernel closure — so a query batch
  is ONE narrow stage: cached-scan filter(term IN terms) ->
  mapInPandas(WAND) -> gather. No per-query join, no broadcast, no
  shuffle, no AQE re-plan. This is how a serving tier works: the shard
  layout is fixed at load time, queries are routed to it. Measured at
  sandbox scale the eliminated exchange+broadcast was ~5x the kernel
  cost per query.
* SHUFFLE path (huge-vocab / uncached sessions, and gather='spark'
  merge): broadcast join of the query-terms frame against a
  partition-pruned parquet scan, then groupBy(query_id, range_bucket)
  applyInPandas — the general form that never requires the dictionary
  or segment layout to be resident.

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
from ..functions.codec import (
    decode_doc_ids,
    decode_doc_ids_many,
    pfor_decode,
    pfor_decode_many,
)
from ..sources.tables import read_engine_table
from .build import IndexPaths, index_geometry


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
    first_doc (disjoint doc ranges within a term). Decode is BATCHED:
    a hot term at corpus scale spans thousands of blocks, and the
    ~0.15 ms fixed cost of a per-block decode call was the serving
    tier's scale bound (measured: 'the' over 1.28M docs = 7,681 blocks
    = 1.1 s of pure per-block overhead); pfor_decode_many amortizes it
    to one numpy pass over all needed blocks."""

    __slots__ = (
        "idf", "first", "last", "bmax", "n_docs",
        "doc_bytes", "tf_bytes", "dl_bytes", "_cache", "_concat",
        "decoded_blocks",
    )

    def __init__(self, idf: float, pdf: pd.DataFrame):
        order = np.argsort(pdf["first_doc"].to_numpy(), kind="stable")
        self.idf = idf
        self.first = pdf["first_doc"].to_numpy()[order]
        self.last = pdf["last_doc"].to_numpy()[order]
        self.bmax = idf * pdf["block_max_tf_norm"].to_numpy()[order].astype(np.float64)
        self.n_docs = pdf["n_docs"].to_numpy()[order].astype(np.int64)
        self.doc_bytes = pdf["doc_bytes"].to_numpy()[order]
        self.tf_bytes = pdf["tf_bytes"].to_numpy()[order]
        self.dl_bytes = pdf["dl_bytes"].to_numpy()[order]
        self._cache: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._concat: dict[bytes, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self.decoded_blocks = 0

    def decode(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Single-block decode (seed path; cached)."""
        hit = self._cache.get(i)
        if hit is None:
            # int64 throughout the kernel: mixing uint64 with int64 in
            # searchsorted silently upcasts to float64 (lossy past 2^53).
            docs = decode_doc_ids(
                int(self.first[i]), self.doc_bytes[i], int(self.n_docs[i])
            ).astype(np.int64)
            hit = (
                docs,
                pfor_decode(self.tf_bytes[i]),
                pfor_decode(self.dl_bytes[i]),
            )
            self._cache[i] = hit
            self.decoded_blocks += 1
        return hit

    def decode_blocks(
        self, idxs: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(docs, tfs, dls) of the given blocks, concatenated in block
        order — ascending doc_ids, since blocks are disjoint ranges
        sorted by first_doc. Missing blocks are decoded in ONE batched
        pass; decoded blocks are cached per block so a multi-query
        batch decodes each hot block once (the kernel reuses one
        _TermBlocks per (range, term) across the query plan)."""
        if len(idxs) == 0:
            e = np.empty(0, dtype=np.uint64)
            return e.astype(np.int64), e, e
        # Concatenated-result cache: identical block sets (the common
        # case — a hot term whose blocks all survive, queried again in
        # the same batch) return the SAME arrays with zero per-block
        # Python work. Falls back to composing from the per-block cache
        # only for genuinely new mixed sets. Keyed on the EXACT index
        # bytes (a 64-bit hash could collide between two different sets
        # sharing len/first/last and silently return wrong postings) and
        # bounded — distinct mixed sets across a long multi-query batch
        # would otherwise grow it without limit.
        key = idxs.astype(np.int64, copy=False).tobytes()
        hit = self._concat.get(key)
        if hit is not None:
            return hit
        while len(self._concat) >= 64:
            # Evict the OLDEST entry only (insertion order); clearing
            # everything on overflow would dump the warm entries the
            # cache exists for, right when a batch is using them.
            self._concat.pop(next(iter(self._concat)))
        cache = self._cache
        miss = (
            idxs
            if not cache
            else np.array(
                [i for i in idxs.tolist() if i not in cache], dtype=np.int64
            )
        )
        if len(miss):
            docs, dl_ = decode_doc_ids_many(
                self.first[miss].astype(np.uint64),
                list(self.doc_bytes[miss]),
                self.n_docs[miss],
            )
            docs = docs.astype(np.int64)
            tfs, _tl = pfor_decode_many(list(self.tf_bytes[miss]))
            dls, _ll = pfor_decode_many(list(self.dl_bytes[miss]))
            self.decoded_blocks += len(miss)
            if len(miss) == len(idxs):
                # fast path: the whole request was decoded contiguously —
                # store block views for future mixed sets, return as-is.
                offs = np.concatenate(([0], np.cumsum(dl_)))
                for j, i in enumerate(miss.tolist()):
                    sl = slice(int(offs[j]), int(offs[j + 1]))
                    cache[i] = (docs[sl], tfs[sl], dls[sl])
                out = (docs, tfs, dls)
                self._concat[key] = out
                return out
            offs = np.concatenate(([0], np.cumsum(dl_)))
            for j, i in enumerate(miss.tolist()):
                sl = slice(int(offs[j]), int(offs[j + 1]))
                cache[i] = (docs[sl], tfs[sl], dls[sl])
        parts = [cache[i] for i in idxs.tolist()]
        out = (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )
        self._concat[key] = out
        return out

    def score_docs(self, cand: np.ndarray, avgdl: float) -> np.ndarray:
        """Exact idf*tf_norm contribution of this term for each candidate
        doc (0 where the doc has no posting). Decodes exactly the blocks
        that can contain a candidate THROUGH the shared block cache
        (decode_blocks) — a multi-query batch that probes the same hot
        blocks decodes them once, and decoded_blocks counts true decode
        work, never re-decodes."""
        out = np.zeros(len(cand), dtype=np.float64)
        if not len(self.first):
            return out
        bidx = np.searchsorted(self.first, cand, side="right") - 1
        valid = (bidx >= 0) & (cand <= self.last[np.maximum(bidx, 0)])
        if not valid.any():
            return out
        need = np.unique(bidx[valid])
        docs, tfs, dls = self.decode_blocks(need)
        cv = cand[valid]
        pos = np.searchsorted(docs, cv)
        pos = np.minimum(pos, len(docs) - 1)
        hit = docs[pos] == cv
        if hit.any():
            tgt = np.flatnonzero(valid)[hit]
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

    # Per-block upper bounds: own bmax + overlap-window max of other
    # terms. Surviving blocks are decoded ONCE (batched): their postings
    # are simultaneously the candidate set and the bulk contributions.
    sts = [
        _sparse_table(t.bmax) if len(t.bmax) else None for t in terms
    ]
    surv_idx: list[np.ndarray] = []
    surv_data: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for ti, t in enumerate(terms):
        if not len(t.first):
            surv_idx.append(np.empty(0, dtype=np.int64))
            surv_data.append(t.decode_blocks(np.empty(0, dtype=np.int64)))
            continue
        ub = t.bmax.copy()
        for tj, o in enumerate(terms):
            if tj == ti or not len(o.first):
                continue
            lo = np.searchsorted(o.last, t.first, side="left")
            hi = np.searchsorted(o.first, t.last, side="right")
            ub += _range_max(sts[tj], lo, hi)
        keep = ub >= theta - 1e-9  # strict-prune only; float-safe slack
        idxs = np.flatnonzero(keep)
        surv_idx.append(idxs)
        surv_data.append(t.decode_blocks(idxs))

    cand = np.unique(
        np.concatenate([seed] + [d[0] for d in surv_data if len(d[0])])
    )
    # Exact scores: one vectorized += per term for the surviving
    # postings (every surviving doc is in cand, and docs are unique
    # within a term, so plain fancy-index addition is exact), plus a
    # patch-up pass over PRUNED blocks that contain another term's
    # candidates — pruning bounds which blocks can contribute a top-k
    # ENTRY, not which postings exist, so exactness requires these.
    scores = np.zeros(len(cand), dtype=np.float64)
    for t, idxs, (sdocs, stfs, sdls) in zip(terms, surv_idx, surv_data):
        if len(sdocs):
            pos = np.searchsorted(cand, sdocs)
            scores[pos] += t.idf * bm25.tf_norm(stfs, sdls, avgdl)
        if not len(t.first):
            continue
        bidx = np.searchsorted(t.first, cand, side="right") - 1
        valid = (bidx >= 0) & (cand <= t.last[np.maximum(bidx, 0)])
        if not valid.any():
            continue
        need = np.unique(bidx[valid])
        pruned = np.setdiff1d(need, idxs, assume_unique=True)
        if not len(pruned):
            continue
        pdocs, ptfs, pdls = t.decode_blocks(pruned)
        in_pruned = valid & np.isin(bidx, pruned)
        cv = cand[in_pruned]
        ppos = np.searchsorted(pdocs, cv)
        ppos = np.minimum(ppos, len(pdocs) - 1)
        hit = pdocs[ppos] == cv
        if hit.any():
            tgt = np.flatnonzero(in_pruned)[hit]
            scores[tgt] += t.idf * bm25.tf_norm(
                ptfs[ppos[hit]], pdls[ppos[hit]], avgdl
            )
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


def _wand_partition_factory(plan: list[tuple[int, dict[str, float]]], k: int, avgdl: float):
    """FAST-path kernel: one Arrow stream per range-partitioned segment
    partition. ``plan`` = [(query_id, {term: idf})] travels in the
    closure (bytes-tiny), so no join ever touches the blocks. Blocks of
    one range_bucket are guaranteed co-partitioned (session-load
    repartition), so each (query, range) WAND here is exact."""

    def run(batches):
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        out = {
            "query_id": [], "doc_id": [], "score": [],
            "blocks_total": [], "blocks_decoded": [],
        }
        for rb, grb in pdf.groupby("range_bucket", sort=False):
            term_groups = dict(tuple(grb.groupby("term", sort=True)))
            # One _TermBlocks per (range, term), shared across the whole
            # query plan: a term's idf is query-independent, and sharing
            # keeps the per-block decode cache warm — a 25-query batch
            # decodes each hot block once instead of 25 times.
            tb_cache: dict[str, _TermBlocks] = {}
            for qid, tidf in plan:
                terms = []
                for t in sorted(tidf):
                    if t not in term_groups:
                        continue
                    tb = tb_cache.get(t)
                    if tb is None:
                        tb = _TermBlocks(tidf[t], term_groups[t])
                        tb_cache[t] = tb
                    terms.append(tb)
                if not terms:
                    continue
                # decoded_blocks accumulates across the whole query batch
                # (the _TermBlocks are shared per (range, term)); report
                # this query's decode work as the delta, so a later query
                # can never report more decodes than blocks (it reports
                # 0 when the batch cache was already warm).
                before = sum(t.decoded_blocks for t in terms)
                docs, scores = _bmw_topk(terms, k, avgdl)
                n = len(docs)
                if n == 0:
                    continue
                total = int(sum(len(t.first) for t in terms))
                decoded = int(sum(t.decoded_blocks for t in terms) - before)
                out["query_id"].extend([qid] * n)
                out["doc_id"].extend(docs.astype(np.int64).tolist())
                out["score"].extend(scores.tolist())
                out["blocks_total"].extend([total] * n)
                out["blocks_decoded"].extend([decoded] * n)
        if out["query_id"]:
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out["query_id"], dtype=np.int32),
                    "doc_id": np.asarray(out["doc_id"], dtype=np.int64),
                    "score": np.asarray(out["score"], dtype=np.float64),
                    "blocks_total": np.asarray(out["blocks_total"], dtype=np.int64),
                    "blocks_decoded": np.asarray(out["blocks_decoded"], dtype=np.int64),
                }
            )

    return run


_SEG_COLS = [
    "term", "term_bucket", "range_bucket", "first_doc", "last_doc",
    "n_docs", "block_max_tf_norm", "doc_bytes", "tf_bytes", "dl_bytes",
]

# Above this many (range, query, k) result rows the global merge stays
# distributed (gather='spark') instead of collecting to the coordinator.
GATHER_SPARK_THRESHOLD = 200_000


class SearchSession:
    """A resident query tier over one built index.

    Load time does the heavy lifting once — corpus stats, the resident
    dictionary (bounded by ``max_resident_terms``), and the segments
    persisted PRE-PARTITIONED BY ``range_bucket`` — so a query batch on
    the fast path is ONE narrow-stage Spark job: cached-scan filter ->
    mapInPandas WAND -> gather. See module docstring for the two
    execution tiers; ``cache_segments=False`` (one-shot querying, or a
    vocabulary too large to hold resident) selects the shuffle tier."""

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
        # read_engine_table, not read.parquet: build_index writes these
        # through the Iceberg-or-Parquet shim, and a session configured
        # for the catalog backend has no parquet files at these paths —
        # the serving tier must mirror the writer's backend choice
        # (build.py's own prior-index reader already does).
        stats = read_engine_table(spark, self.paths.corpus_stats).collect()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self.epoch = int(stats["epoch"])
        self._dictionary = read_engine_table(spark, self.paths.dictionary)
        self._cached = cache_segments
        seg = read_engine_table(spark, self.paths.segments).select(*_SEG_COLS)
        # Ranges actually present (auto gather switch + partition sizing):
        # dense doc_ids make this exact.
        # Stored geometry wins over the caller's cfg — a session opened
        # with a different range_bits would mis-size the cached layout
        # and the gather auto-switch. Pre-geometry indexes are refused
        # here exactly like merge_indexes refuses them (index_geometry
        # raises): one surface silently falling back to cfg while the
        # other hard-fails was an inconsistent contract.
        range_bits = index_geometry(stats)[1]
        self.n_ranges_est = (self.n_docs >> range_bits) + 1
        if cache_segments:
            # Serving-tier shard load: co-partition blocks by their doc
            # range ONCE (this shuffle is paid at session open, never per
            # query) and keep them hot. Every (query, range) WAND group
            # is then complete within one cached partition, so the fast
            # path needs no per-query exchange. Partition count = the
            # number of ranges CAPPED AT the core count: every cached
            # partition schedules a task + a Python-worker round-trip
            # PER QUERY, so partitions beyond one wave of cores only add
            # fixed overhead (measured at 256 ranges / 32 cores: the old
            # 4x-cores cap ran 4 task waves and put single-query median
            # at 2.14 s; cap=cores runs one wave at 0.44 s). Ranges are
            # near-uniform by construction (dense doc ids, fixed range
            # width), so wave-smoothing oversubscription buys nothing.
            n_parts = max(1, min(self.n_ranges_est,
                                 spark.sparkContext.defaultParallelism))
            self._segments = seg.repartition(n_parts, "range_bucket").persist()
        else:
            self._segments = seg
        self._resident: dict[str, tuple[int, int]] | None = None
        # ONE dictionary job decides residency AND loads the map: the
        # limit(cap + 1) overfetch reveals "too big" (len > cap) without
        # a separate full count() — the old count-then-collect pair ran
        # two full dictionary scans at every session open.
        rows = (
            self._dictionary.select("term", "df", "term_bucket")
            .limit(max_resident_terms + 1)
            .collect()
        )
        if len(rows) <= max_resident_terms:
            self._resident = {
                r["term"]: (int(r["df"]), int(r["term_bucket"])) for r in rows
            }

    def invalidate(self) -> None:
        """Release cached state (unpersist segments). Call when the index
        at this root has been rebuilt or merged in place."""
        if self._cached:
            try:
                self._segments.unpersist()
            except Exception:
                pass

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
        gather: str = "auto",
        path: str | None = None,
    ) -> DataFrame:
        """gather='driver': per-range top-k lists (<= ranges*queries*k
        tiny rows) are collected and merged at the coordinator — the
        standard scatter-gather search-tier shape. gather='spark': the
        merge stays distributed (window + filter). gather='auto'
        (default) picks 'spark' once ranges*queries*k exceeds
        GATHER_SPARK_THRESHOLD — at 10^12 docs with 2^20-doc ranges a
        driver gather would pull ~1M rows per query, so the switch is
        load-bearing, not cosmetic. ``path`` forces 'fast'/'shuffle'
        (tests); default: fast when the session is cached. All
        combinations produce identical rows (pinned tie-break)."""
        spark = self.spark

        empty_schema = "query_id int, rank int, doc_id long, score double"
        if with_metrics:
            empty_schema += ", blocks_total long, blocks_decoded long"
        # k=0 is a valid "no results requested" batch, not an error: the
        # WAND kernel's argpartition(k-1) theta seed and zero-size score
        # reductions assume k >= 1, so guard here instead of crashing in
        # every executor task.
        if k <= 0:
            return spark.createDataFrame([], empty_schema)

        # Q1: tokenize queries with the SAME frozen analyzer as the corpus.
        qterms: list[tuple[int, str]] = []
        for qid, q in enumerate(queries):
            toks = (
                tokenize(q)
                if isinstance(q, str)
                else [t for s in q for t in tokenize(s)]
            )
            qterms.extend((qid, t) for t in sorted(set(toks)))

        empty = spark.createDataFrame([], empty_schema)
        if not qterms:
            return empty

        # Q2: dictionary lookup (resident map or pruned semi-join).
        info = self._lookup(sorted({t for _, t in qterms}))
        if not info:
            return empty
        buckets = sorted({tb for _, tb in info.values()})
        idf_of = {
            t: float(bm25.idf(self.n_docs, np.array([df_]))[0])
            for t, (df_, _tb) in info.items()
        }

        if gather == "auto":
            big = self.n_ranges_est * len(queries) * k > GATHER_SPARK_THRESHOLD
            gather = "spark" if big else "driver"
        use_fast = path == "fast" or (path is None and self._cached)
        if use_fast and not self._cached:
            # The fast kernel is only exact when every range_bucket's
            # blocks are co-partitioned — which only the cache_segments
            # repartition guarantees. On a raw scan a (term, range) group
            # can straddle partitions and yield partial per-doc scores.
            raise ValueError(
                "path='fast' requires cache_segments=True "
                "(uncached sessions must use the shuffle path)"
            )

        if use_fast:
            # FAST path: plan in the closure, one narrow stage over the
            # range-partitioned resident segments. The term IN-list filter
            # is evaluated against cached-batch stats (and against parquet
            # row groups when uncached).
            # One linear pass over qterms, not a rescan per query id —
            # the old per-qid comprehension was O(Q^2 * T) on the driver
            # and would dwarf the narrow-stage win at 10k-query batches.
            by_qid: dict[int, dict[str, float]] = {}
            for q, t in qterms:
                if t in idf_of:
                    by_qid.setdefault(q, {})[t] = idf_of[t]
            plan = sorted(by_qid.items())
            terms_lit = sorted(idf_of)
            blocks = self._segments.filter(
                F.col("term_bucket").isin(buckets) & F.col("term").isin(terms_lit)
            )
            per_range = blocks.mapInPandas(
                _wand_partition_factory(plan, k, self.avgdl), _WAND_SCHEMA
            )
        else:
            # SHUFFLE path: broadcast join of the query-terms frame
            # against a partition-pruned scan, then one exchange to form
            # the (query, range) groups.
            qrows = [
                (qid, t, idf_of[t]) for qid, t in qterms if t in idf_of
            ]
            qdf = spark.createDataFrame(qrows, "query_id int, term string, idf double")
            segments = self._segments.filter(F.col("term_bucket").isin(buckets))
            cand = segments.join(F.broadcast(qdf), "term", "inner")
            per_range = cand.groupBy("query_id", "range_bucket").applyInPandas(
                _wand_factory(k, self.avgdl), _WAND_SCHEMA
            )

        # Q6/Q7: global merge of per-range top-k (<= ranges*queries*k rows).
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
            # Result hand-back goes through one Arrow batch: a pandas
            # frame with exact dtypes takes createDataFrame's Arrow fast
            # path, where a list of tuples takes the row-by-row pickle
            # path — measured 0.28 s vs ~0.03 s for a k-row result, and
            # that delta was the single largest share of serving-tier
            # query latency (fixed cost, independent of index size).
            cols: dict[str, np.ndarray] = {
                "query_id": np.fromiter(
                    (r[0] for r in out), dtype=np.int32, count=len(out)
                ),
                "rank": np.fromiter(
                    (r[1] for r in out), dtype=np.int32, count=len(out)
                ),
                "doc_id": np.fromiter(
                    (r[2] for r in out), dtype=np.int64, count=len(out)
                ),
                "score": np.fromiter(
                    (r[3] for r in out), dtype=np.float64, count=len(out)
                ),
            }
            if with_metrics:
                cols["blocks_total"] = np.fromiter(
                    (r[4] for r in out), dtype=np.int64, count=len(out)
                )
                cols["blocks_decoded"] = np.fromiter(
                    (r[5] for r in out), dtype=np.int64, count=len(out)
                )
            return spark.createDataFrame(pd.DataFrame(cols), schema)
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        return (
            per_range.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*out_cols)
        )


# Resident sessions are heavyweight (persisted segments + resident
# dictionary), so the per-process cache is a small LRU: a long-lived
# serving process that touches many index roots unpersists the
# least-recently-used session instead of pinning every root forever.
SESSION_CACHE_CAP = 8
_SESSION_CACHE: dict[str, tuple[tuple, SearchSession]] = {}
# Guards every read-check-mutate sequence on _SESSION_CACHE: Spark
# drivers routinely run concurrent query threads, and the unlocked
# del/reinsert dance raced (double-del KeyError on the hit path; two
# sessions both persisting the same segments on the miss path).
import threading

_SESSION_LOCK = threading.Lock()
# One construction lock PER ROOT (lock striping): SearchSession
# construction runs several Spark jobs (segments repartition+persist,
# dictionary sizing), so holding the global lock across it would make
# one slow session open head-of-line-block warm-cache hits on every
# OTHER root. The global lock guards only the map mutations (and the
# stripe map itself); the per-root lock serializes open/reopen of one
# root so concurrent misses still build exactly one session. Stripe
# count is bounded by distinct roots this process ever serves.
_ROOT_LOCKS: dict[str, threading.Lock] = {}


def _root_lock(index_root: str) -> threading.Lock:
    with _SESSION_LOCK:
        return _ROOT_LOCKS.setdefault(index_root, threading.Lock())


def _index_signature(index_root: str, spark: SparkSession | None = None) -> tuple:
    """Cheap staleness token for an index root: the corpus_stats file
    listing + mtimes on the parquet backend (every build/merge rewrites
    corpus_stats last), or the table's latest Iceberg snapshot id when
    the root is catalog-backed (no local files to scan — the `.snapshots`
    metadata table is the canonical Iceberg staleness token and changes
    on every rewrite).

    When NEITHER token is obtainable (non-scandir-able storage with no
    catalog, or a catalog whose metadata read fails) the signature is a
    DISTINCT sentinel per call: a constant () would compare equal
    across calls and serve a stale cached session FOREVER after an
    in-place rewrite — the exact staleness this token exists to catch.
    The cost is honest: search() rebuilds the session on every call for
    such roots; hold a ``SearchSession`` directly to serve them
    resident."""
    import os

    stats_dir = IndexPaths(index_root).corpus_stats
    try:
        with os.scandir(stats_dir) as it:
            return tuple(
                sorted((e.name, e.stat().st_mtime_ns) for e in it if e.is_file())
            )
    except OSError:
        pass
    if spark is not None:
        from ..sources.tables import _iceberg_catalog

        catalog = _iceberg_catalog(spark)
        if catalog is not None:
            tbl = f"{catalog}.{stats_dir.strip('/').replace('/', '.')}"
            try:
                row = (
                    spark.read.table(f"{tbl}.snapshots")
                    .agg(F.max("snapshot_id"))
                    .collect()[0]
                )
                return ("iceberg-snapshot", row[0])
            except Exception:
                return ("unverifiable", next(_SIG_UNVERIFIABLE))
    return ("unverifiable", next(_SIG_UNVERIFIABLE))


# Monotonic counter for the unverifiable-staleness sentinel above.
import itertools

_SIG_UNVERIFIABLE = itertools.count()


def index_signature_stable(index_root: str) -> tuple:
    """``_index_signature`` for REPRODUCIBLE fingerprints (the merge
    resume marker): the per-call unverifiable sentinel collapses to a
    constant. A marker folds this value into a string that must compare
    EQUAL across process restarts for the same on-disk state — with the
    per-call sentinel, resuming a crashed merge whose INPUT roots are
    unverifiable would always see a "different input set" and brick the
    exact recovery path the marker protects. Degraded mode is honest and
    documented at the call site: for such roots the caller's other
    marker fields (epoch, n_docs, avgdl) remain the only rebuild guard.
    The serving cache must keep using ``_index_signature`` directly —
    there the per-call sentinel is the point (never serve stale)."""
    sig = _index_signature(index_root)
    if sig and sig[0] == "unverifiable":
        return ("unverifiable",)
    return sig


def release_sessions_under(path: str) -> None:
    """Invalidate and drop every cached ``SearchSession`` whose index
    root IS ``path`` or lives under it — for callers about to delete or
    rewrite that directory (a stale fixture root, an in-place merge):
    nothing will ever search the old path again, so its signature
    re-check never runs and the persisted segments would otherwise
    linger in executor storage until unrelated LRU pressure. Public so
    cache owners never touch ``_SESSION_CACHE``'s internals (eviction
    must always pair the pop with ``invalidate()``)."""
    path = path.rstrip("/")  # cache keys are unslashed roots
    prefix = path + "/"
    with _SESSION_LOCK:
        for root in [
            r for r in _SESSION_CACHE if r == path or r.startswith(prefix)
        ]:
            _SESSION_CACHE.pop(root)[1].invalidate()


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
    Thin wrapper over a cached ``SearchSession`` per index root; a
    rebuilt/merged-in-place index is detected via the corpus_stats
    signature and the stale session's cache is released."""
    # Per-root lock for the whole read-check-(invalidate/create)
    # sequence: two threads hitting the SAME root otherwise both take
    # the hit path and double-del (KeyError), or both take the miss
    # path and build two sessions that each persist() the segments —
    # duplicate-create is the expensive failure, so construction stays
    # inside the per-root critical section. The GLOBAL lock is held
    # only around map mutations, so a slow session open on one root
    # never blocks warm hits on other roots. sess.search() runs
    # unlocked. (release_sessions_under may pop the entry between our
    # insert and the search — harmless: invalidate() only unpersists,
    # and Spark recomputes from the still-present files; retired
    # fixture roots are deleted at process exit, not inline.)
    with _root_lock(index_root):
        sig = _index_signature(index_root, spark)
        with _SESSION_LOCK:
            hit = _SESSION_CACHE.get(index_root)
            stale = None
            if hit is not None and (
                hit[0] != sig or hit[1].spark is not spark
            ):
                stale = _SESSION_CACHE.pop(index_root)
                hit = None
            if hit is not None:
                sess = hit[1]
                del _SESSION_CACHE[index_root]  # re-insert => most recent
                _SESSION_CACHE[index_root] = (sig, sess)
        if stale is not None:
            stale[1].invalidate()
        if hit is None:
            # Construction outside the global lock (several Spark jobs);
            # the per-root lock guarantees single construction per root.
            sess = SearchSession(spark, index_root, cfg)
            with _SESSION_LOCK:
                while len(_SESSION_CACHE) >= SESSION_CACHE_CAP:
                    # LRU eviction: dicts iterate in insertion order and
                    # a cache hit re-inserts above, so the first key is
                    # least recent.
                    lru = next(iter(_SESSION_CACHE))
                    _SESSION_CACHE.pop(lru)[1].invalidate()
                _SESSION_CACHE[index_root] = (sig, sess)
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

    # df for the QUERY terms only, from the term-filtered tf (identical
    # values — df is a per-term corpus count either way): broadcasting a
    # full-vocabulary dfreq ships the entire dictionary to every
    # executor and outgrows the broadcast limit on a large corpus, when
    # only |query terms| rows are ever joined. Filter BEFORE attaching
    # query_id — the qdf join would duplicate a term shared by several
    # queries and inflate its df.
    tfq = tf.filter(F.col("term").isin(sorted({t for _, t in qrows})))
    dfreq = tfq.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tfq.join(F.broadcast(qdf), "term")
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
