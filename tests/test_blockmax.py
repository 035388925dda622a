"""Block-max search over compressed posting blocks == exact scorer ==
oracle, bit-for-bit — and actually skips blocks (north_star "block-max
WAND intersection")."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def block_segs(spark, index):
    from dpr_spark.query.blockmax import build_block_segments

    blocks, norms = build_block_segments(index, num_buckets=4)
    blocks = blocks.persist()
    norms = norms.persist()
    blocks.count(), norms.count()
    return blocks, norms


def test_blockmax_equals_exact(spark, index, block_segs, queries_df):
    from dpr_spark.query.blockmax import search_blocks
    from dpr_spark.query.scorer import search

    blocks, norms = block_segs
    exact = {
        (r.qid, r.rank): (r.doc_id, r.score)
        for r in search(queries_df, index, k=20).collect()
    }
    got = {
        (r.qid, r.rank): (r.doc_id, r.score)
        for r in search_blocks(spark, queries_df, index, blocks, norms, k=20).collect()
    }
    assert set(exact) == set(got)
    for key in exact:
        ed, es = exact[key]
        gd, gs = got[key]
        assert ed == gd, f"{key}: doc {gd} != {ed}"
        assert gs == es, f"{key}: score bit-mismatch {gs} vs {es}"


def test_blockmax_matches_oracle_small_k(spark, index, block_segs, oracle):
    """Small k forces the pruned paths; stopword-heavy queries have the
    big lists and tie runs."""
    from dpr_spark.query.blockmax import search_blocks

    blocks, norms = block_segs
    questions = [
        (0, "the of and to"),
        (1, "the café"),
        (2, "of naïve zürich the a"),
        (3, "the the the"),
        (4, "nonexistentterm the"),
    ]
    qdf = spark.createDataFrame(questions, "qid long, question string")
    for k in (3, 10):
        got = {}
        for r in search_blocks(spark, qdf, index, blocks, norms, k=k).collect():
            got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
        for qid, q in questions:
            expect = oracle.search(q, k)
            actual = sorted(got.get(qid, []))
            assert [d for _, d, _ in actual] == [d for d, _ in expect], (k, q)
            for (_, _, s), (_, es) in zip(actual, expect):
                assert s == es, (k, q, s, es)


@pytest.fixture(scope="module")
def big_local(spark):
    """One-bucket local arrays for counter comparisons: a 2000-doc corpus
    so stopword lists span many 128-posting blocks."""
    from dpr_spark.fixtures.corpus import gen_pages_pdf
    from dpr_spark.index.build import build_index
    from dpr_spark.query.blockmax import build_block_segments
    from dpr_spark.query.wand import build_impact_segments

    pages = gen_pages_pdf(2000, seed=11)
    idx = build_index(spark, spark.createDataFrame(pages), build_blocks=False)
    idx.postings.persist().count()
    blocks, norms = build_block_segments(idx, num_buckets=1)
    seg = build_impact_segments(idx, num_buckets=1)
    bpdf = blocks.toPandas()
    npdf = norms.toPandas()
    spdf = seg.drop("bucket").toPandas()
    return idx, bpdf, npdf, spdf


def test_block_skipping_beats_maxscore(spark, big_local):
    """The block path must (a) return bit-identical results to the
    MaxScore segment path and (b) touch fewer postings: whole blocks of
    essential terms are skipped by block_max + suffix bound, and probes
    only decode candidate-bearing blocks."""
    from dpr_spark.query.blockmax import _search_bucket
    from dpr_spark.query.wand import _driver_query_terms, _search_partition
    from dpr_spark.query.blockmax import _driver_query_terms_idf

    idx, bpdf, npdf, spdf = big_local
    qdf = spark.createDataFrame(
        [(0, "the of and café to a zürich"), (1, "the naïve of señor")],
        "qid long, question string",
    )
    qt_seg = _driver_query_terms(spark, qdf, idx)
    qt_blk = _driver_query_terms_idf(spark, qdf, idx)
    k = 10

    seg_stats = {}
    seg_out = list(_search_partition(iter([spdf]), qt_seg, k, stats=seg_stats))[0]
    blk_stats = {}
    blk_out = _search_bucket(
        bpdf, npdf, qt_blk, k, idx.stats.avgdl, stats=blk_stats
    )

    def canon(df):
        return sorted(
            (int(q), int(d), float(s))
            for q, d, s in zip(df["qid"], df["doc_id"], df["score"])
        )

    # local top-k supersets agree on the exact top-k per query
    for qid in (0, 1):
        a = sorted(
            [t for t in canon(seg_out) if t[0] == qid],
            key=lambda t: (-t[2], t[1]),
        )[:k]
        b = sorted(
            [t for t in canon(blk_out) if t[0] == qid],
            key=lambda t: (-t[2], t[1]),
        )[:k]
        assert a == b

    assert blk_stats["blocks_decoded"] < blk_stats["blocks_total"], blk_stats
    assert blk_stats["postings_decoded"] < seg_stats["postings_touched"], (
        blk_stats,
        seg_stats,
    )


def test_roundtrip_blocks_cover_all_postings(spark, big_local):
    """Decoding every block reproduces the exact posting rows (doc_id, tf)
    per term — the blocks are a lossless encoding of postings v1."""
    from dpr_spark.index.codec import decode_block

    idx, bpdf, npdf, spdf = big_local
    got = {}
    for r in bpdf.itertuples():
        docs, tfs = decode_block(r.doc_ids, r.tfs, r.n)
        got.setdefault(r.term_id, []).append((r.block_id, docs, tfs))
    exact = idx.postings.toPandas()
    by_term = {
        t: g.sort_values("doc_id")
        for t, g in exact.groupby("term_id")
    }
    assert set(got) == set(by_term)
    for t, chunks in got.items():
        chunks.sort(key=lambda c: c[0])
        docs = np.concatenate([c[1] for c in chunks])
        tfs = np.concatenate([c[2] for c in chunks])
        ref = by_term[t]
        assert np.array_equal(docs, ref["doc_id"].to_numpy(np.int64))
        assert np.array_equal(tfs, ref["tf"].to_numpy(np.int64))


def test_sparse_accumulator_work_scales_with_postings(spark, big_local):
    """The per-query work must scale with postings decoded, not bucket
    size: a selective query over a 2000-doc bucket may only write scores
    for slots its own postings touch (the old dense zero-fill did
    O(n_docs) per query regardless)."""
    from dpr_spark.query.blockmax import _driver_query_terms_idf, _search_bucket

    idx, bpdf, npdf, spdf = big_local
    n_docs = len(npdf)
    # pick three genuinely rare terms from the dictionary
    rare = (
        idx.dictionary.filter("df between 2 and 15")
        .orderBy("df")
        .limit(3)
        .toPandas()
    )
    assert len(rare) == 3, "fixture corpus lost its rare terms"
    budget = int(rare["df"].sum())
    q = " ".join(rare["term"])
    qdf = spark.createDataFrame([(0, q)], "qid long, question string")
    qt = _driver_query_terms_idf(spark, qdf, idx)

    stats = {}
    out = _search_bucket(bpdf, npdf, qt, 10, idx.stats.avgdl, stats=stats)
    assert len(out) > 0
    # every score write maps to a posting of a query term (no dense fill)
    assert stats["score_writes"] <= budget, (stats, budget)
    assert stats["cand_peak"] <= budget
    assert stats["score_writes"] < n_docs // 4, (stats, n_docs)

    # work is per-query linear: 20 copies of the query -> ~20x the writes
    qt20 = [(i, qt[0][1], qt[0][2]) for i in range(20)]
    stats20 = {}
    _search_bucket(bpdf, npdf, qt20, 10, idx.stats.avgdl, stats=stats20)
    assert stats20["score_writes"] <= 20 * stats["score_writes"]


def test_query_wave_batching_identical(spark, index, block_segs, queries_df):
    """Wave-split queries (broadcast batches) must return bit-identical
    results to a single wave — queries are independent."""
    from dpr_spark.query.blockmax import search_blocks

    blocks, norms = block_segs

    def canon(df):
        return sorted(
            (r.qid, r.rank, r.doc_id, r.score) for r in df.collect()
        )

    one = canon(search_blocks(spark, queries_df, index, blocks, norms, k=10,
                              batch_size=10**6))
    waved = canon(search_blocks(spark, queries_df, index, blocks, norms, k=10,
                                batch_size=7))
    assert one == waved


def test_ten_thousand_queries_wave_batched(spark, index, block_segs):
    """Serving-path scale gate: 10k queries flow through search_blocks in
    broadcast waves (3 jobs at batch 4096) — no query list in any task
    closure — and every query gets a full result set; a spot-checked
    subset is bit-identical to the exact scorer."""
    from dpr_spark.fixtures.corpus import gen_pages_pdf, gen_queries_pdf
    from dpr_spark.query.blockmax import search_blocks
    from dpr_spark.query.scorer import search

    blocks, norms = block_segs
    pages = gen_pages_pdf(300, seed=42)  # the index fixture's corpus
    qpdf = gen_queries_pdf(pages, n_queries=10000, seed=99)
    qdf = spark.createDataFrame(qpdf[["qid", "question"]])
    res = search_blocks(spark, qdf, index, blocks, norms, k=3, batch_size=4096).persist()
    per_q = res.groupBy("qid").count()
    assert per_q.count() == 10000
    assert per_q.filter("count != 3").count() == 0

    sub_ids = list(range(0, 10000, 997))
    sub = spark.createDataFrame(
        qpdf[qpdf.qid.isin(sub_ids)][["qid", "question"]]
    )
    exact = {
        (r.qid, r.rank): (r.doc_id, r.score) for r in search(sub, index, k=3).collect()
    }
    got = {
        (r.qid, r.rank): (r.doc_id, r.score)
        for r in res.filter(F.col("qid").isin(sub_ids)).collect()
    }
    assert got == exact
    res.unpersist(True)


def test_packed_encode_blocks_bit_identical(spark, index):
    """The packed encode input (td/dt int64 pairs + broadcast idf, taken
    automatically for big dense-id builds) must produce byte-identical
    blocks to the unpacked join flow — same proof obligation as the index
    build's packed encode shuffle (tests/test_codec.py)."""
    from dpr_spark.query.blockmax import build_block_segments

    assert index.doc_id_bounds is not None  # dense build records bounds

    def canon(blocks):
        return sorted(
            (
                r.bucket,
                r.term_id,
                r.block_id,
                r.n,
                bytes(r.doc_ids),
                bytes(r.tfs),
                float(r.block_max_score),
            )
            for r in blocks.collect()
        )

    b_packed, n_packed = build_block_segments(index, num_buckets=4, pack=True)
    b_plain, n_plain = build_block_segments(index, num_buckets=4, pack=False)
    assert canon(b_packed) == canon(b_plain)
    assert sorted(map(tuple, n_packed.collect())) == sorted(
        map(tuple, n_plain.collect())
    )
