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


@given(
    st.lists(
        st.lists(uint64s, min_size=0, max_size=150),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_pfor_decode_many_matches_per_block(block_lists):
    from oculus_crawl_spark.functions.codec import pfor_decode_many

    blocks = [np.array(b, dtype=np.uint64) for b in block_lists]
    bufs = [pfor_encode(b) for b in blocks]
    vals, lens = pfor_decode_many(bufs)
    assert np.array_equal(lens, np.array([len(b) for b in blocks]))
    offs = np.concatenate(([0], np.cumsum(lens)))
    for i, b in enumerate(blocks):
        assert np.array_equal(vals[offs[i] : offs[i + 1]], b)


@given(
    st.lists(
        st.lists(uint64s, min_size=1, max_size=200, unique=True),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_decode_doc_ids_many_matches_per_block(id_lists):
    from oculus_crawl_spark.functions.codec import decode_doc_ids_many

    blocks = [np.sort(np.array(ids, dtype=np.uint64)) for ids in id_lists]
    firsts = np.array([b[0] for b in blocks], dtype=np.uint64)
    bufs = [encode_doc_gaps(b) for b in blocks]
    ns = np.array([len(b) for b in blocks], dtype=np.int64)
    out, lens = decode_doc_ids_many(firsts, bufs, ns)
    offs = np.concatenate(([0], np.cumsum(lens)))
    for i, b in enumerate(blocks):
        assert np.array_equal(out[offs[i] : offs[i + 1]], b)
        assert np.array_equal(
            out[offs[i] : offs[i + 1]],
            decode_doc_ids(int(firsts[i]), bufs[i], int(ns[i])),
        )


@given(
    st.lists(
        st.lists(uint64s, min_size=0, max_size=150),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_pfor_encode_many_byte_identical_to_per_block(block_lists):
    """The batched ENCODE path (build/merge write side) must emit the
    exact bytes of per-block pfor_encode — a silent encode divergence
    would only surface in end-to-end grading otherwise."""
    from oculus_crawl_spark.functions.codec import pfor_encode_many

    blocks = [np.array(b, dtype=np.uint64) for b in block_lists]
    assert pfor_encode_many(blocks) == [pfor_encode(b) for b in blocks]


@given(
    st.lists(
        st.lists(uint64s, min_size=1, max_size=200, unique=True),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_encode_doc_gaps_many_byte_identical_to_per_block(id_lists):
    from oculus_crawl_spark.functions.codec import encode_doc_gaps_many

    blocks = [np.sort(np.array(ids, dtype=np.uint64)) for ids in id_lists]
    assert encode_doc_gaps_many(blocks) == [encode_doc_gaps(b) for b in blocks]


def test_encode_many_exception_heavy_and_wide_values():
    """Directed cases the random strategy rarely builds: exception-heavy
    blocks and >2^62 values through BOTH batched encoders."""
    from oculus_crawl_spark.functions.codec import (
        encode_doc_gaps_many,
        pfor_encode_many,
    )

    rng = np.random.default_rng(11)
    heavy = rng.integers(1, 8, size=128, dtype=np.uint64)
    heavy[::3] = rng.integers(2**55, 2**63, size=len(heavy[::3]), dtype=np.uint64)
    wide_ids = np.sort(
        rng.integers(2**62, 2**63 - 1, size=100, dtype=np.uint64)
    )
    wide_ids = np.unique(wide_ids)
    blocks = [heavy, np.arange(128, dtype=np.uint64)]
    assert pfor_encode_many(blocks) == [pfor_encode(b) for b in blocks]
    assert encode_doc_gaps_many([wide_ids]) == [encode_doc_gaps(wide_ids)]


def test_decode_doc_ids_many_zero_length_blocks():
    """0-length blocks are part of the documented contract ('lengths
    mirrors n_docs'); a trailing empty block used to IndexError because
    its start offset equals the total output length."""
    from oculus_crawl_spark.functions.codec import decode_doc_ids_many

    a = np.array([5, 9, 12], dtype=np.uint64)
    bufs = [encode_doc_gaps(a), pfor_encode(np.empty(0, dtype=np.uint64))]
    out, lens = decode_doc_ids_many(
        np.array([5, 0], dtype=np.uint64), bufs, np.array([3, 0])
    )
    assert out.tolist() == [5, 9, 12] and lens.tolist() == [3, 0]
    # empty block sandwiched between real ones
    b = np.array([100], dtype=np.uint64)
    out, lens = decode_doc_ids_many(
        np.array([5, 0, 100], dtype=np.uint64),
        [bufs[0], bufs[1], encode_doc_gaps(b)],
        np.array([3, 0, 1]),
    )
    assert out.tolist() == [5, 9, 12, 100] and lens.tolist() == [3, 0, 1]
    # all-empty input
    out, lens = decode_doc_ids_many(
        np.array([0, 0], dtype=np.uint64), [bufs[1], bufs[1]], np.array([0, 0])
    )
    assert out.size == 0 and lens.tolist() == [0, 0]
