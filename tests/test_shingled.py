"""Shingled (index_phrases) phrase search: bit-identity vs the unigram
positional engine, kernel contracts, fallback rules."""

import pytest
from pyspark.sql import functions as F

from dpr_spark.fixtures.corpus import assign_doc_ids, gen_pages_pdf
from dpr_spark.index.build import build_index_from_docs
from dpr_spark.query.phrase import phrase_search_index
from dpr_spark.query.shingled import (
    build_shingle_index,
    doc_gram_positions,
    phrase_search_shingled,
)

PHRASES = [
    (0, "the of and"),
    (1, "was for on"),
    (2, "the the"),
    (3, "zzznope missing"),
    (4, "of the"),
    (5, "café naïve"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    pages = assign_doc_ids(gen_pages_pdf(400, seed=23))
    docs = spark.createDataFrame(pages[["doc_id", "text"]])
    idx = build_index_from_docs(spark, docs, build_blocks=False, build_positional=True)
    sidx = build_shingle_index(spark, docs)
    return docs, idx, sidx


def test_bit_identical_to_unigram_engine(spark, corpus):
    docs, idx, sidx = corpus
    uni = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in phrase_search_index(spark, idx, idx.positions, PHRASES, k=10).collect()
    )
    shi = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in phrase_search_shingled(spark, idx, sidx, PHRASES, k=10).collect()
    )
    assert uni == shi  # scores bit-equal, not just rank-equal
    assert len(uni) > 0


def test_gram_positions_contract(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.gram): (r.doclen, r.tf, list(r.positions))
        for r in doc_gram_positions(docs).collect()
    }
    # overlapping occurrences, ascending positions, unigram doclen
    assert rows[(1, "a b")] == (5, 2, [0, 2])
    assert rows[(1, "b a")] == (5, 2, [1, 3])
    # docs shorter than the shingle emit nothing
    assert not any(d in (2, 3) for d, _ in rows)


def test_repeated_token_phrase_counts_overlaps(spark, corpus):
    # "the the" in a doc with k consecutive 'the's has pf=k-1 — verify
    # the two engines agree on a synthetic overlap-heavy corpus
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "the x the the")],
        "doc_id long, text string",
    )
    idx = build_index_from_docs(spark, docs, build_blocks=False, build_positional=True)
    sidx = build_shingle_index(spark, docs)
    q = [(0, "the the")]
    uni = {(r.doc_id): r.score for r in phrase_search_index(spark, idx, idx.positions, q).collect()}
    shi = {(r.doc_id): r.score for r in phrase_search_shingled(spark, idx, sidx, q).collect()}
    assert uni == shi and set(uni) == {1, 2}


def test_single_term_phrase_rejected(spark, corpus):
    docs, idx, sidx = corpus
    with pytest.raises(ValueError, match="shingle-able"):
        phrase_search_shingled(spark, idx, sidx, [(0, "the")])


def test_shingle_df_is_rarer_than_unigram_df(spark, corpus):
    # the acceleration premise: bigram df << min unigram df for the
    # stopword-head pairs the Zipf corpus is full of
    docs, idx, sidx = corpus
    uni_df = {
        r.term: r.df
        for r in idx.dictionary.filter(F.col("term").isin("the", "of")).collect()
    }
    bi = sidx.grams.filter(F.col("gram") == "the of").collect()
    assert bi and bi[0].df < min(uni_df.values())
