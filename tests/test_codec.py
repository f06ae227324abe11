"""Property tests for the posting-block codec (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oculus_crawl_spark.functions.codec import (
    decode_doc_ids,
    encode_doc_gaps,
    pfor_decode,
    pfor_encode,
    varint_decode,
    varint_encode,
)

uint64s = st.integers(min_value=0, max_value=2**63 - 1)
arrays = st.lists(uint64s, min_size=0, max_size=2000).map(
    lambda xs: np.array(xs, dtype=np.uint64)
)


@given(arrays)
@settings(max_examples=300, deadline=None)
def test_varint_roundtrip(v):
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@given(arrays)
@settings(max_examples=300, deadline=None)
def test_pfor_roundtrip(v):
    assert np.array_equal(pfor_decode(pfor_encode(v)), v)


@given(st.lists(uint64s, min_size=1, max_size=2000, unique=True))
@settings(max_examples=200, deadline=None)
def test_doc_gaps_roundtrip(ids):
    docs = np.sort(np.array(ids, dtype=np.uint64))
    enc = encode_doc_gaps(docs)
    assert np.array_equal(decode_doc_ids(int(docs[0]), enc, len(docs)), docs)


def test_pfor_exception_path_compresses_skew():
    """Mostly-small values with rare huge outliers must take the
    exception path and still beat plain varint on size."""
    rng = np.random.default_rng(7)
    v = rng.integers(1, 64, size=50_000, dtype=np.uint64)
    v[rng.integers(0, 50_000, 100)] = rng.integers(2**50, 2**62, 100, dtype=np.uint64)
    enc = pfor_encode(v)
    assert np.array_equal(pfor_decode(enc), v)
    assert len(enc) < len(varint_encode(v))
    assert len(enc) < 50_000  # < 1 byte/value despite 62-bit outliers


def test_empty_and_singleton():
    assert len(pfor_decode(pfor_encode(np.empty(0, np.uint64)))) == 0
    one = np.array([12345], dtype=np.uint64)
    assert np.array_equal(
        decode_doc_ids(12345, encode_doc_gaps(one), 1), one
    )
