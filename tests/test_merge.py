"""Index merge == fresh build over the concatenated corpus, bit for bit
(the Lucene segment-merge analog; north rule: construction, MERGE,
compression, top-k)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def halves(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs

    pw = assign_doc_ids(pages_pdf.head(200))
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    a = build_index_from_docs(
        spark, docs.filter(F.col("doc_id") % 2 == 0), build_blocks=False,
        build_positional=True,
    )
    b = build_index_from_docs(
        spark, docs.filter(F.col("doc_id") % 2 == 1), build_blocks=False,
        build_positional=True,
    )
    fresh = build_index_from_docs(
        spark, docs, build_blocks=False, build_positional=True
    )
    return a, b, fresh


def test_merged_index_identical_to_fresh_build(spark, halves):
    from dpr_spark.index.merge import merge_indexes

    a, b, fresh = halves
    merged = merge_indexes(spark, [a, b])

    assert merged.stats.n_docs == fresh.stats.n_docs
    assert merged.stats.avgdl == fresh.stats.avgdl  # bit-equal float

    mdict = sorted(tuple(r) for r in merged.dictionary.collect())
    fdict = sorted(tuple(r) for r in fresh.dictionary.collect())
    assert mdict == fdict  # same term_ids, df, idf floats

    mpost = sorted(tuple(r) for r in merged.postings.collect())
    fpost = sorted(tuple(r) for r in fresh.postings.collect())
    assert mpost == fpost

    mpos = sorted(tuple(r) for r in merged.positions.collect())
    fpos = sorted(tuple(r) for r in fresh.positions.collect())
    assert mpos == fpos


def test_merged_index_search_bit_identical(spark, halves, queries_df):
    from dpr_spark.index.merge import merge_indexes
    from dpr_spark.query.scorer import search
    from dpr_spark.query.wand import build_impact_segments, search_segments

    a, b, fresh = halves
    merged = merge_indexes(spark, [a, b])
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, fresh, k=10).collect()
    )
    got_exact = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, merged, k=10).collect()
    )
    assert got_exact == exp
    seg = build_impact_segments(merged, num_buckets=4)
    got_seg = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search_segments(spark, queries_df, merged, seg, k=10).collect()
    )
    assert got_seg == exp


def test_merged_phrase_search(spark, halves, pages_pdf):
    """Positions merge: a verbatim bigram of an odd-half doc is found in
    the merged index, identically to the fresh positional build."""
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.index.merge import merge_indexes
    from dpr_spark.query.phrase import phrase_search_index

    a, b, fresh = halves
    merged = merge_indexes(spark, [a, b])
    row = fresh.docstats.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id").first()
    text = pages_pdf.set_index("url").loc[row.url, "text"]
    bigram = " ".join(tokenize(text)[:2])
    phrases = [(0, bigram)]
    got = sorted(
        (r.qid, r.rank, r.doc_id, round(r.score, 9))
        for r in phrase_search_index(spark, merged, merged.positions, phrases, k=5).collect()
    )
    exp = sorted(
        (r.qid, r.rank, r.doc_id, round(r.score, 9))
        for r in phrase_search_index(spark, fresh, fresh.positions, phrases, k=5).collect()
    )
    assert got == exp and got


def test_merge_three_way_and_blocks(spark, pages_pdf, queries_df):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.merge import merge_indexes
    from dpr_spark.query.blockmax import build_block_segments, search_blocks
    from dpr_spark.query.scorer import search

    pw = assign_doc_ids(pages_pdf.head(150))
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    parts = [
        build_index_from_docs(
            spark, docs.filter(F.col("doc_id") % 3 == i), build_blocks=False
        )
        for i in range(3)
    ]
    merged = merge_indexes(spark, parts, build_blocks=True)
    assert merged.positions is None  # no input carried positions
    fresh = build_index_from_docs(spark, docs, build_blocks=False)
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, fresh, k=10).collect()
    )
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, merged, k=10).collect()
    )
    assert got == exp
    bb, nn = build_block_segments(merged, num_buckets=4)
    got_blocks = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search_blocks(spark, queries_df, merged, bb, nn, k=10).collect()
    )
    assert got_blocks == exp


def test_merge_rejects_overlapping_docs(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.merge import merge_indexes

    pw = assign_doc_ids(pages_pdf.head(60))
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    a = build_index_from_docs(spark, docs.filter(F.col("doc_id") < 40), build_blocks=False)
    b = build_index_from_docs(spark, docs.filter(F.col("doc_id") >= 20), build_blocks=False)
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, [a, b])


def test_search_across_segments_bit_identical(spark, halves, queries_df):
    """Lucene multi-segment searcher contract: blended (df, N, avgdl)
    statistics + per-segment scoring == the merged index == the fresh
    build, bit for bit."""
    from dpr_spark.index.merge import search_across
    from dpr_spark.query.scorer import search

    a, b, fresh = halves
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, fresh, k=10).collect()
    )
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search_across(spark, queries_df, [a, b], k=10).collect()
    )
    assert got == exp


def test_tiered_merge_policy_select():
    from dpr_spark.index.merge import TieredMergePolicy

    p = TieredMergePolicy(merge_factor=4)
    # four size-tier-1 segments merge; the mega segment is left alone
    assert p.select([100, 110, 90, 105, 50_000]) == [[0, 1, 2, 3]]
    # under merge_factor per tier: nothing to do
    assert p.select([100, 110, 50_000]) == []
    # two full groups in one tier
    assert p.select([100] * 8) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    # max_merged_docs caps the output size
    assert TieredMergePolicy(4, max_merged_docs=300).select([100] * 4) == []


def test_segment_set_merge_invariant(spark, pages_pdf, queries_df):
    """SegmentSet: results identical before and after maybe_merge, and
    the policy actually folds the small segments."""
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.merge import SegmentSet, TieredMergePolicy

    pw = assign_doc_ids(pages_pdf.head(160))
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    segs = SegmentSet()
    for i in range(4):
        segs.add(
            build_index_from_docs(
                spark, docs.filter(F.col("doc_id") % 4 == i), build_blocks=False
            )
        )
    before = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in segs.search(spark, queries_df, k=10).collect()
    )
    n = segs.maybe_merge(spark, TieredMergePolicy(merge_factor=4))
    assert n == 1 and len(segs.segments) == 1
    after = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in segs.search(spark, queries_df, k=10).collect()
    )
    assert after == before
