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


def varint_encode_with_lengths(values: np.ndarray):
    """LEB128-encode a non-negative int64 array. Fully numpy-vectorized:
    ≤10 passes (one per possible byte position), no per-value Python.
    Returns (buffer bytes, per-value byte lengths) so callers can split
    one big encode into sub-ranges without re-encoding."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: 1 + number of 7-bit groups above the first
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    max_nb = int(nbytes.max())
    for j in range(max_nb):
        mask = nbytes > j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = byte | cont
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode n LEB128 values. Vectorized via np.add.reduceat over 7-bit
    groups shifted into place."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    payload = (raw & np.uint8(0x7F)).astype(np.uint64)
    terminal = (raw & np.uint8(0x80)) == 0  # last byte of each value
    starts = np.concatenate([[0], np.flatnonzero(terminal)[:-1] + 1])
    # position of each byte within its value
    idx = np.arange(raw.size, dtype=np.int64)
    within = idx - np.repeat(starts, np.diff(np.concatenate([starts, [raw.size]])))
    shifted = payload << (np.uint64(7) * within.astype(np.uint64))
    vals = np.add.reduceat(shifted, starts)
    return vals[:n].astype(np.int64)


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


def decode_blocks_batch(doc_bufs, tf_bufs, ns) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY blocks in one vectorized pass: buffers are joined and
    varint-decoded together (one numpy pipeline instead of one per
    block), then the per-block delta-gap cumsum is recovered as a
    segmented cumsum — global cumsum minus each block's preceding total
    (valid because every block's first gap is the ABSOLUTE doc id).
    Returns (doc_ids, tfs, starts) where starts[i] is block i's offset
    into the flat arrays; bit-identical to per-block decode_block
    (property-tested in tests/test_codec.py)."""
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
    gaps = varint_decode(b"".join(doc_bufs), total)
    g = np.cumsum(gaps, dtype=np.int64)
    # docs[start+i] = gaps[start] + ... + gaps[start+i] = g[start+i] - g[start-1]
    base = np.zeros(len(ns), dtype=np.int64)
    base[1:] = g[starts[1:] - 1]
    doc_ids = g - np.repeat(base, ns)
    tfs = varint_decode(b"".join(tf_bufs), total)
    return doc_ids, tfs, starts
