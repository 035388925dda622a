"""Posting-list compression: delta-gap + LEB128 varint (north_star
"delta-gap + varint-compressed postings with per-block max-score").

The reference keeps its index as an in-RAM FAISS matrix plus a pickled id
map (`/root/reference/dpr/indexer/faiss_indexers.py:23-83`); the sparse
engine's analog is columnar posting *blocks*:

    postings(term_id long, block_id int, n int,
             doc_ids binary,   -- delta-gapped, varint
             tfs binary,       -- varint
             block_max_score float)

Encode/decode are numpy-vectorized (no per-row Python in the Spark hot
path beyond the bytes-building loop, which runs once per block of
BLOCK_SIZE postings). Property test: decode(encode(x)) == x for random
inputs (tests/test_codec.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

BLOCK_SIZE = 128  # docs per posting block; bounds Python memory per term


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64 array."""
    values = np.asarray(values, dtype=np.uint64)
    if values.size == 0:
        return b""
    # worst case 10 bytes per value
    out = bytearray()
    for v in values.tolist():
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode n LEB128 values from buf."""
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    for i in range(n):
        shift = 0
        val = 0
        while True:
            b = buf[pos]
            pos += 1
            val |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        out[i] = val
    return out.astype(np.int64)


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray) -> Tuple[bytes, bytes]:
    """Delta-gap the sorted doc_ids then varint both arrays."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.empty_like(doc_ids)
    if doc_ids.size:
        gaps[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    return varint_encode(gaps), varint_encode(np.asarray(tfs, dtype=np.int64))


def decode_block(doc_ids_buf: bytes, tfs_buf: bytes, n: int) -> Tuple[np.ndarray, np.ndarray]:
    gaps = varint_decode(doc_ids_buf, n)
    doc_ids = np.cumsum(gaps, dtype=np.int64)
    tfs = varint_decode(tfs_buf, n)
    return doc_ids, tfs
