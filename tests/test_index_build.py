"""Index-table invariants (FIXTURES.md §3): posting blocks decode back to
the exact postings; block ids are per-term ordered first-doc-ids;
block_max equals the max BM25 component in the block."""

import numpy as np
import pytest

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.index.codec import BLOCK_SIZE, decode_block


def test_blocks_roundtrip_to_postings(index):
    postings = {}
    for r in index.postings.collect():
        postings.setdefault(r.term_id, []).append((r.doc_id, r.tf))
    for t in postings:
        postings[t].sort()

    decoded = {}
    maxes_ok = 0
    avgdl = index.stats.avgdl
    doclen = {r.doc_id: r.doclen for r in index.docstats.collect()}
    idf = {r.term_id: r.idf for r in index.dictionary.collect()}
    for r in index.blocks.collect():
        ids, tfs = decode_block(bytes(r.doc_ids), bytes(r.tfs), r.n)
        assert r.n <= BLOCK_SIZE
        assert r.block_id == ids[0]  # block_id = first doc id
        assert (np.diff(ids) > 0).all()  # strictly ascending inside block
        decoded.setdefault(r.term_id, []).extend(zip(ids.tolist(), tfs.tolist()))
        # block_max == max component in block (float32 storage)
        comp = [
            idf[r.term_id]
            * tf
            * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doclen[d] / avgdl))
            for d, tf in zip(ids.tolist(), tfs.tolist())
        ]
        assert r.block_max_score == pytest.approx(max(comp), rel=1e-6)
        maxes_ok += 1
    for t in decoded:
        decoded[t].sort()
    assert decoded == postings
    assert maxes_ok > 100


def test_dense_ids_are_contiguous(index):
    ids = sorted(r.doc_id for r in index.docstats.collect())
    assert ids == list(range(len(ids)))
    tids = sorted(r.term_id for r in index.dictionary.collect())
    assert tids == list(range(len(tids)))


def test_doc_ids_match_url_rank(index, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    expect = dict(zip(pw.url, pw.doc_id))
    got = {r.url: r.doc_id for r in index.docstats.collect()}
    assert got == expect


def test_doc_split_bits_identical_blocks(spark, pages_df):
    """Head-term splitting (doc_id>>s in the encode shuffle key) must not
    change the decoded postings — blocks stay doc_id-disjoint ranges. A
    tiny threshold forces the auto split on the fixture corpus."""
    import numpy as np

    from dpr_spark.index.build import build_index
    from dpr_spark.index.codec import decode_block

    plain = build_index(spark, pages_df, build_blocks=True)
    # force the auto-split decision via a tiny threshold
    from dpr_spark.index.build import build_index_from_docs, prepare_docs

    cleanup = []
    docs = prepare_docs(pages_df, cleanup=cleanup)
    forced = build_index_from_docs(
        spark, docs, build_blocks=True, cleanup=cleanup, doc_split_threshold=50
    )

    def decoded(idx):
        out = {}
        for r in idx.blocks.collect():
            docs_, tfs = decode_block(r.doc_ids, r.tfs, r.n)
            out.setdefault(r.term_id, []).append((r.block_id, docs_, tfs))
        return {
            t: (
                np.concatenate([c[1] for c in sorted(cs, key=lambda c: c[0])]),
                np.concatenate([c[2] for c in sorted(cs, key=lambda c: c[0])]),
            )
            for t, cs in out.items()
        }

    a, b = decoded(plain), decoded(forced)
    assert set(a) == set(b)
    for t in a:
        assert np.array_equal(a[t][0], b[t][0]), t
        assert np.array_equal(a[t][1], b[t][1]), t
    plain.unpersist(); forced.unpersist()


def test_hash_id_collision_check(spark, pages_df, monkeypatch):
    """id_strategy='hash' must fail loudly when distinct urls collide into
    fewer distinct ids (a silent collision would merge two documents'
    postings). Force one by patching the hash to a constant."""
    import pyspark.sql.functions as SF

    from dpr_spark.index import build as B

    # sanity: the real hash passes the gate on the fixture corpus
    ok = B.prepare_docs(pages_df.limit(50), id_strategy="hash")
    assert ok.select("doc_id").distinct().count() == 50

    monkeypatch.setattr(B.F, "xxhash64", lambda *cols: SF.lit(7))
    with pytest.raises(ValueError, match="collision"):
        B.prepare_docs(pages_df.limit(50), id_strategy="hash")


def test_doc_split_bits_zero_normalized(spark, pages_df):
    """doc_split_bits=0 must behave exactly like None (no per-doc scatter
    in the shuffle key, no run-break divergence in the encoder)."""
    import numpy as np

    from dpr_spark.index.build import build_index_from_docs, prepare_docs
    from dpr_spark.index.codec import decode_block

    def decoded(idx):
        out = {}
        for r in idx.blocks.collect():
            d, t = decode_block(r.doc_ids, r.tfs, r.n)
            out.setdefault(r.term_id, []).append((r.block_id, d, t))
        return {
            k: np.concatenate([c[1] for c in sorted(v, key=lambda c: c[0])])
            for k, v in out.items()
        }

    cleanup = []
    docs = prepare_docs(pages_df.limit(60), cleanup=cleanup)
    zero = build_index_from_docs(spark, docs, build_blocks=True, cleanup=cleanup,
                                 doc_split_bits=0)
    n_blocks_zero = zero.blocks.count()
    dz = decoded(zero)
    zero.unpersist()
    cleanup2 = []
    docs2 = prepare_docs(pages_df.limit(60), cleanup=cleanup2)
    none = build_index_from_docs(spark, docs2, build_blocks=True, cleanup=cleanup2)
    assert none.blocks.count() == n_blocks_zero  # no overlapping-run blowup
    dn = decoded(none)
    none.unpersist()
    assert set(dz) == set(dn)
    for k in dz:
        assert np.array_equal(dz[k], dn[k]), k
