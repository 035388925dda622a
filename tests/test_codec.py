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


def test_decode_blocks_batch_matches_per_block():
    """Batched multi-block decode == per-block decode, including blocks
    whose first gap is a large absolute doc id (the segmented-cumsum
    base subtraction)."""
    import numpy as np

    from dpr_spark.index.codec import decode_block, decode_blocks_batch, encode_block

    rng = np.random.default_rng(7)
    blocks = []
    for _ in range(40):
        n = int(rng.integers(1, 200))
        docs = np.cumsum(rng.integers(1, 10_000, size=n)).astype(np.int64)
        tfs = rng.integers(1, 300, size=n).astype(np.int64)
        db, tb = encode_block(docs, tfs)
        blocks.append((db, tb, n, docs, tfs))

    d_all, t_all, starts = decode_blocks_batch(
        [b[0] for b in blocks], [b[1] for b in blocks], [b[2] for b in blocks]
    )
    ends = np.concatenate([starts[1:], [len(d_all)]])
    for i, (db, tb, n, docs, tfs) in enumerate(blocks):
        pd_docs, pd_tfs = decode_block(db, tb, n)
        assert np.array_equal(pd_docs, docs) and np.array_equal(pd_tfs, tfs)
        assert np.array_equal(d_all[starts[i]:ends[i]], docs), i
        assert np.array_equal(t_all[starts[i]:ends[i]], tfs), i
