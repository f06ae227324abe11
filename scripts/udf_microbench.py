#!/usr/bin/env python
"""Microbench: per-doc vs batch-wide dedup signature kernels.

Times the round-1/2 per-document formulation (Python loop over the
Arrow batch, NumPy per doc) against the round-3 batch-wide kernels
(oculus_crawl_spark.operators.dedup._minhash_band_keys_batch /
_simhash_batch) on the sf0.1 documents corpus replicated K times —
pure pandas-level timing, the same work a Spark Arrow batch does, with
no scheduler noise. Asserts bit-identical output before timing.

Usage: python scripts/udf_microbench.py [replication=8] [trials=3]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from oculus_crawl_spark.functions.analysis import tokenize  # noqa: E402
from oculus_crawl_spark.operators import dedup as D  # noqa: E402


def perdoc_minhash_bands(text: pd.Series) -> pd.Series:
    """The replaced per-document formulation (kept here for the A/B)."""

    def one(txt):
        sh = sorted(set(D._shingle_strings(tokenize(txt))))
        if not sh:
            return None
        h = pd.util.hash_array(np.asarray(sh, dtype=object))
        with np.errstate(over="ignore"):
            t = h[:, None] * D._A + D._B
            bands = t.min(axis=0).reshape(D.N_BANDS, D.ROWS_PER_BAND)
            keys = np.zeros(D.N_BANDS, dtype=np.uint64)
            for r in range(D.ROWS_PER_BAND):
                keys = (keys ^ bands[:, r]) * D._MIX
        return keys.astype(np.int64).tolist()

    return text.map(one)


def perdoc_simhash(text: pd.Series) -> pd.Series:
    def one(txt):
        toks = tokenize(txt)
        if not toks:
            return 0
        terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        h = pd.util.hash_array(terms)
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        score = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
        word = np.where(score > 0, np.uint64(1), np.uint64(0))
        return int((word << np.arange(64, dtype=np.uint64)).sum().astype(np.int64))

    return text.map(one)


def perpair_verify(pdf: pd.DataFrame) -> pd.DataFrame:
    """The replaced per-pair exact-verify (round-3 code): re-tokenize and
    re-shingle both texts of EVERY candidate pair, Python set Jaccard."""
    jac = [
        D.jaccard_tokens(tokenize(ta), tokenize(tb))
        for ta, tb in zip(pdf["a_text"], pdf["b_text"])
    ]
    out = pdf[["a_id", "b_id"]].copy()
    out["jaccard"] = np.round(np.asarray(jac, dtype=np.float64), 6)
    return out


def candidate_pairs_frame(texts: np.ndarray, fanout: int) -> pd.DataFrame:
    """Duplication-heavy candidate set: each doc appears in ~2*fanout
    pairs (candidates ~ true near-dup pairs on a duplicated corpus)."""
    n = len(texts)
    a, b = [], []
    for step in range(1, fanout + 1):
        a.extend(range(n))
        b.extend((i + step) % n for i in range(n))
    return pd.DataFrame(
        {
            "a_id": np.asarray(a, dtype=np.int64),
            "b_id": np.asarray(b, dtype=np.int64),
            "a_text": texts[np.asarray(a)],
            "b_text": texts[np.asarray(b)],
        }
    )


def best_of(fn, series, trials):
    best = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        fn(series)
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    texts = duckdb.sql(
        "select text from '/root/testdata/sf0.1/documents.parquet'"
    ).fetchnumpy()["text"]
    s = pd.Series(np.tile(texts, repl))

    small = s.head(2000)
    a = perdoc_minhash_bands(small)
    b = D._minhash_band_keys_batch(small)
    assert all(
        (x is None and y is None) or list(x) == list(y) for x, y in zip(a, b)
    ), "minhash batch kernel != per-doc formulation"
    assert (
        perdoc_simhash(small).to_numpy() == D._simhash_batch(small).to_numpy()
    ).all(), "simhash batch kernel != per-doc formulation"

    out = {"n_docs": int(len(s)), "trials": trials}
    for name, old, new in (
        ("minhash_bands", perdoc_minhash_bands, D._minhash_band_keys_batch),
        ("simhash", perdoc_simhash, D._simhash_batch),
    ):
        t_old = best_of(old, s, trials)
        t_new = best_of(new, s, trials)
        out[name] = {
            "perdoc_sec": round(t_old, 3),
            "batch_sec": round(t_new, 3),
            "speedup": round(t_old / t_new, 2),
            "docs_per_sec_batch": round(len(s) / t_new),
        }

    # Exact-verify stage A/B (round-4): per-pair tokenize+set Jaccard vs
    # batch-wide unique-doc hashing + searchsorted intersection.
    pairs = candidate_pairs_frame(texts, fanout=4)
    a = perpair_verify(pairs.head(2000))
    b = D._verify_pairs(pairs.head(2000))
    assert (a["jaccard"].to_numpy() == b["jaccard"].to_numpy()).all(), (
        "batched verify != per-pair formulation"
    )
    t_old = best_of(perpair_verify, pairs, trials)
    t_new = best_of(D._verify_pairs, pairs, trials)
    out["minhash_verify"] = {
        "n_pairs": int(len(pairs)),
        "perpair_sec": round(t_old, 3),
        "batch_sec": round(t_new, 3),
        "speedup": round(t_old / t_new, 2),
        "pairs_per_sec_batch": round(len(pairs) / t_new),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
