"""Pluggable similarity (query/similarity.py): classic TF-IDF and
LM Dirichlet rank+score identity vs the pure-Python oracle, over the
same index the BM25 tests use — proving similarity is a formula swap,
not an index variant."""

import pytest


def _collect(res):
    out = {}
    for r in res.collect():
        out.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid in out:
        out[qid].sort()
    return out


@pytest.mark.parametrize(
    "sim", ["classic", "lmdirichlet", "lmjelinekmercer", "dfi"]
)
def test_similarity_rank_identity(index, queries_df, queries_pdf, oracle, sim):
    from dpr_spark.query.similarity import search_similarity

    got = _collect(search_similarity(queries_df, index, similarity=sim, k=10))
    n_checked = 0
    for _, row in queries_pdf.iterrows():
        if sim == "classic":
            expect = oracle.classic_search(row.question, 10)
        elif sim == "lmjelinekmercer":
            expect = oracle.lmjelinekmercer_search(row.question, 10)
        elif sim == "dfi":
            expect = oracle.dfi_search(row.question, 10)
        else:
            expect = oracle.lmdirichlet_search(row.question, 10)
        actual = got.get(row.qid, [])
        assert len(actual) == len(expect), f"qid={row.qid} count"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"{sim} qid={row.qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9)
            n_checked += 1
    assert n_checked > 100


def test_similarity_bm25_route_matches_default(index, queries_df):
    """similarity='bm25' is the same engine as scorer.search — one
    pluggable entry point (Lucene setSimilarity)."""
    from dpr_spark.query.scorer import search
    from dpr_spark.query.similarity import search_similarity

    a = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search_similarity(queries_df, index, similarity="bm25", k=5).collect()
    )
    b = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, index, k=5).collect()
    )
    assert a == b


def test_similarity_rankings_actually_differ(index, queries_df):
    """The three similarities are not accidentally the same formula: at
    least one query ranks docs differently under classic vs bm25."""
    from dpr_spark.query.scorer import search
    from dpr_spark.query.similarity import search_similarity

    bm = {
        (r.qid, r.rank): r.doc_id for r in search(queries_df, index, k=10).collect()
    }
    cl = {
        (r.qid, r.rank): r.doc_id
        for r in search_similarity(queries_df, index, similarity="classic", k=10).collect()
    }
    assert any(bm[key] != cl.get(key) for key in bm)


def test_unknown_similarity_raises(index, queries_df):
    from dpr_spark.query.similarity import search_similarity

    with pytest.raises(ValueError):
        search_similarity(queries_df, index, similarity="nope")
