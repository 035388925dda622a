"""Round-6 optimization kernels must be drop-in identical to the paths
they replace:

- the Arrow/RE2 ASCII tokenize fast path == the regex-module reference
  tokenizer on ASCII text (and falls back on non-ASCII);
- tf_batch_arrow == tf_batch on mixed corpora;
- the packed 2x-int64 encode shuffle produces bit-identical posting
  blocks to the unpacked 4-column flow;
- the local (window) dense-rank == the two-phase ranged rank.
"""

import random
import string

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from dpr_spark.functions.tokenizer import (
    _all_ascii,
    tokenize,
    tokenize_ascii_arrow,
)
from dpr_spark.index.build import tf_batch, tf_batch_arrow
from dpr_spark.functions.tokenizer import _compiled_fast

ASCII_EDGES = [
    "Hello, World!",
    "a.b.c 1,000,000 x=y+z",
    "",
    "   ",
    "  a  b ",
    "(x+y)=z;",
    "don't stop-me now...",
    "tab\tand\nnewline\x0band\x00nul\x7f",
    "UPPER lower MiXeD 3.5kg",
    "!leading and trailing!",
    "_under_score_",
]


def _ascii_random(n, seed):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + string.punctuation + " \t\n\x0b\x0c\r"
    return ["".join(rng.choices(alphabet, k=rng.randrange(0, 120))) for _ in range(n)]


def test_ascii_arrow_matches_reference_on_edges():
    arr = pa.array(ASCII_EDGES)
    assert _all_ascii(arr)
    flat, lens = tokenize_ascii_arrow(arr)
    toks = flat.to_pylist()
    got, pos = [], 0
    for n in lens:
        got.append(toks[pos : pos + n])
        pos += n
    assert got == [tokenize(t) for t in ASCII_EDGES]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ascii_arrow_matches_reference_random(seed):
    texts = _ascii_random(300, seed)
    arr = pa.array(texts)
    assert _all_ascii(arr)
    flat, lens = tokenize_ascii_arrow(arr)
    toks = flat.to_pylist()
    pos = 0
    for t, n in zip(texts, lens):
        assert toks[pos : pos + n] == tokenize(t), repr(t)
        pos += n


def _hist(out):
    """(doc, term, tf) set + doclen map from a tf_batch-style result."""
    if out is None:
        return set(), {}
    u_doc, lens, terms, tfs = out
    terms = terms.to_pylist() if isinstance(terms, (pa.Array, pa.ChunkedArray)) else list(terms)
    rows = set(zip(u_doc.tolist(), terms, np.asarray(tfs).tolist()))
    return rows, {i: int(l) for i, l in enumerate(np.asarray(lens).tolist())}


@pytest.mark.parametrize(
    "texts",
    [
        ASCII_EDGES,
        ASCII_EDGES + ["naïve crème", "東京 3.5kg", "emoji 🙂 here"],  # fallback path
        [None, "", "plain text", None],
    ],
)
def test_tf_batch_arrow_matches_tf_batch(texts):
    ref = tf_batch(pd.Series(texts, dtype="object"), _compiled_fast())
    got = tf_batch_arrow(pa.array(texts, type=pa.string()))
    ref_rows, ref_lens = _hist(ref)
    got_rows, got_lens = _hist(got)
    assert got_rows == ref_rows
    assert got_lens == ref_lens


def test_packed_encode_blocks_bit_identical(spark, pages_df):
    """build_index (packed encode) must produce exactly the blocks the
    unpacked flow produces."""
    from dpr_spark.index.build import build_index_from_docs, _encode_blocks

    docs = pages_df.select(
        F.xxhash64("url").bitwiseAND(F.lit((1 << 30) - 1)).alias("doc_id"),
        "text",
    ).dropDuplicates(["doc_id"])
    idx = build_index_from_docs(spark, docs, build_blocks=True)
    packed = idx.blocks.orderBy("term_id", "block_id").collect()
    unpacked = (
        _encode_blocks(
            idx.postings.join(
                F.broadcast(idx.dictionary.select("term_id", "idf")), "term_id"
            ).select("term_id", "doc_id", "tf", "doclen", "idf"),
            idx.stats.avgdl,
            k1=1.2,
            b=0.75,
            num_partitions=8,
        )
        .orderBy("term_id", "block_id")
        .collect()
    )
    assert len(packed) == len(unpacked) > 0
    for a, b_ in zip(packed, unpacked):
        assert a.term_id == b_.term_id
        assert a.block_id == b_.block_id
        assert a.n == b_.n
        assert a.doc_ids == b_.doc_ids
        assert a.tfs == b_.tfs
        assert a.block_max_score == b_.block_max_score
    idx.unpersist()


def test_local_rank_matches_ranged_rank(spark):
    from dpr_spark.plans.ids import assign_dense_ids

    pdf = pd.DataFrame({"k": [f"w{i:04d}" for i in range(997)]}).sample(
        frac=1.0, random_state=7
    )
    df = spark.createDataFrame(pdf)
    cleanup = []
    ranged = {
        r.k: r.id for r in assign_dense_ids(df, "k", "id", cleanup=cleanup).collect()
    }
    local = {
        r.k: r.id for r in assign_dense_ids(df, "k", "id", local=True).collect()
    }
    assert local == ranged
    for c in cleanup:
        c.unpersist()
