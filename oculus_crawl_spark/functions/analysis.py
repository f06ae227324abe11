"""FROZEN analysis chain v1 — HTML text extraction + tokenization.

This module is the single source of truth for the per-row invariant
"byte-identical extracted text per url" (BASELINE.json:15): the engine's
Arrow UDFs, the golden-corpus generator (tests/golden), and the oracle
all import *these* functions. Never fork the logic; bump
``IndexConfig.analysis_version`` on any change.

Extraction spec (v1), html: bytes -> text: str
  1. decode UTF-8 with errors='replace'
  2. drop <head>...</head>, <script>...</script>, <style>...</style>
     blocks and <!-- comments --> (case-insensitive, dotall)
  3. replace every remaining tag <...> with one space
  4. unescape HTML entities (&amp; etc.)
  5. collapse whitespace runs to single spaces; strip ends

Tokenization spec (v1), text: str -> list[str]
  1. NFC normalize
  2. casefold
  3. tokens = maximal runs of [a-z0-9] (ASCII; the oracle mirror is
     DuckDB ``regexp_extract_all(lower(text), '[a-z0-9]+')`` — exact for
     ASCII corpora; non-Latin text is a documented v1 non-goal)

Both specs are pure and deterministic: no wall clock, no locale, no
dict-order dependence (SURVEY.md §7.4).
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- pure, frozen spec functions -------------------------------------------

_DROP_BLOCKS = re.compile(
    r"<head\b.*?</head\s*>|<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
# An unterminated trailing tag ("<unclosed" at EOF, common in truncated
# crawls) is stripped to end of input (the optional '>').
_TAG = re.compile(r"<[^>]*>?")
_WS = re.compile(r"\s+")
_TOKEN = re.compile(r"[a-z0-9]+")

# Mirror of the tokenizer for DuckDB oracle SQL (see tokenize docstring).
TOKENIZE_ORACLE_REGEX = "[a-z0-9]+"


def extract_text(html_bytes: bytes | None) -> str:
    """Frozen extraction spec v1 (see module docstring)."""
    if html_bytes is None:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _DROP_BLOCKS.sub(" ", s)
    s = _TAG.sub(" ", s)
    s = _html.unescape(s)
    return _WS.sub(" ", s).strip()


def tokenize(text: str | None) -> list[str]:
    """Frozen tokenization spec v1 (see module docstring)."""
    if not text:
        return []
    return _TOKEN.findall(unicodedata.normalize("NFC", text).casefold())


# --- deterministic page synthesis (FIXTURES.md B1) --------------------------

_WRAP_TEMPLATE = (
    "<html><head><title>doc {doc_id}</title></head>"
    "<body><p>{body}</p></body></html>"
)


def wrap_html(text: str, doc_id: int) -> bytes:
    """Frozen html wrapper: extract_text(wrap_html(t, i)) == t byte-identically
    for any already-whitespace-collapsed t (the documents corpus is)."""
    return _WRAP_TEMPLATE.format(doc_id=doc_id, body=_html.escape(text)).encode("utf-8")


# --- Arrow-vectorized Spark surface -----------------------------------------
# pandas .str ops run C loops over whole Arrow batches: the Spark layer
# sees zero per-row Python (BASELINE.json:15). Kept as small wrappers so
# the UDF body and the pure spec cannot drift apart.


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized mirror of ``extract_text`` — same regexes, same order,
    but each step is one pandas .str C loop over the whole Arrow batch
    instead of a per-row Python call (extraction is the 100 TB ingest
    hot loop). Only rows containing '&' take the per-row entity
    unescape; golden tests pin byte-identity with the pure spec."""
    s = html.str.decode("utf-8", errors="replace")
    null = s.isna()
    s = s.fillna("")
    s = s.str.replace(_DROP_BLOCKS, " ", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    amp = s.str.contains("&", regex=False)
    if amp.any():
        s.loc[amp] = s.loc[amp].map(_html.unescape)
    s = s.str.replace(_WS, " ", regex=True).str.strip()
    if null.any():
        s.loc[null] = ""
    return s


def tokenize_batch(text: pd.Series) -> tuple:
    """Whole-batch FLAT mirror of the frozen tokenize spec: the same
    NFC -> casefold -> [a-z0-9]+ steps as ``tokenize``/``tokenize_udf``,
    returning (flat tokens in document order as an object ndarray,
    tokens-per-row counts). Lives HERE — not in a consumer — because the
    module contract forbids forking the analysis chain: the dedup
    signature kernels (MinHash shingles, SimHash) consume this form, and
    a consumer-local copy would silently miss a v2 spec change that
    bumps ``analysis_version``."""
    from itertools import chain

    import numpy as np

    s = text.fillna("").reset_index(drop=True)
    s = s.str.normalize("NFC").str.casefold()
    lists = s.str.findall(_TOKEN)
    counts = lists.str.len().to_numpy().astype(np.int64)
    flat = np.asarray(list(chain.from_iterable(lists)), dtype=object)
    return flat, counts


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    """Vectorized mirror of ``tokenize`` — NFC normalize, casefold and
    token findall each run as ONE pandas .str C loop over the whole
    Arrow batch (this is the ingest hot loop for non-ASCII corpora,
    where the codegen path is refused). Equality with the per-row spec
    function is pytest-pinned on unicode edge cases."""
    s = text.fillna("").str.normalize("NFC").str.casefold()
    return s.str.findall(_TOKEN)


def tokenize_expr(col):
    """Pure-DataFrame tokenizer, exactly equivalent to ``tokenize`` for
    ASCII input: lower + split on non-alphanumeric runs. Whole-stage
    codegen'd (no Python at all) — used where the plan should stay fully
    JVM-side; the pandas UDF is the spec-bearing path."""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != F.lit(""))
