"""Posting codec property tests: decode(encode(x)) == x (FIXTURES.md §3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dpr_spark.index.codec import (
    decode_block,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    assert varint_decode(varint_encode(arr), len(arr)).tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(doc_ids, data):
    doc_ids = sorted(doc_ids)
    tfs = [data.draw(st.integers(min_value=1, max_value=1000)) for _ in doc_ids]
    ids_buf, tfs_buf = encode_block(np.array(doc_ids), np.array(tfs))
    d, t = decode_block(ids_buf, tfs_buf, len(doc_ids))
    assert d.tolist() == doc_ids
    assert t.tolist() == tfs


def test_compression_is_real():
    """Delta-gap varint on dense ascending ids must beat 8-byte ints."""
    ids = np.arange(0, 128 * 7, 7, dtype=np.int64) + 10_000_000
    tfs = np.ones(128, dtype=np.int64)
    ids_buf, tfs_buf = encode_block(ids, tfs)
    assert len(ids_buf) < 128 * 8 / 4  # ≥4x smaller than raw int64
    assert len(tfs_buf) == 128  # tf=1 → 1 byte each


def test_empty_block():
    ids_buf, tfs_buf = encode_block(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert ids_buf == b"" and tfs_buf == b""
    d, t = decode_block(ids_buf, tfs_buf, 0)
    assert len(d) == 0 and len(t) == 0
