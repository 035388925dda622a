"""Dis-max queries (query/dismax.py): rank+score identity vs the
pure-Python oracle across tie_breaker settings, plus the degenerate
contracts (tb=0 best-clause-wins; single-clause == plain BM25)."""

import pytest


def _queries(queries_pdf, n=12):
    """Boosted two-clause dis-max queries derived from the fixture
    question set: clause 0 = the question (boost 1.0), clause 1 = its
    first two tokens (boost 2.5)."""
    from dpr_spark.functions.tokenizer import tokenize

    out = []
    for _, row in queries_pdf.head(n).iterrows():
        toks = tokenize(row.question)
        out.append(
            (int(row.qid), [(row.question, 1.0), (" ".join(toks[:2]), 2.5)])
        )
    return out


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_dismax_rank_identity(spark, index, queries_pdf, oracle, tb):
    from dpr_spark.query.dismax import dismax_search

    qs = _queries(queries_pdf)
    got = {}
    for r in dismax_search(spark, qs, index, tie_breaker=tb, k=10).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    n_checked = 0
    for qid, clauses in qs:
        expect = oracle.dismax_search(clauses, tie_breaker=tb, k=10)
        actual = sorted(got.get(qid, []))
        assert len(actual) == len(expect), f"qid={qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"tb={tb} qid={qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9)
            n_checked += 1
    assert n_checked > 50


def test_dismax_single_clause_is_bm25(spark, index, queries_df, queries_pdf):
    """One clause with boost 1.0 and any tie_breaker == plain BM25."""
    from dpr_spark.query.dismax import dismax_search
    from dpr_spark.query.scorer import search

    qs = [(int(r.qid), [(r.question, 1.0)]) for _, r in queries_pdf.head(8).iterrows()]
    a = sorted(
        (r.qid, r.rank, r.doc_id, round(r.score, 9))
        for r in dismax_search(spark, qs, index, tie_breaker=0.7, k=10).collect()
    )
    qdf = queries_df.filter(queries_df.qid.isin([q for q, _ in qs]))
    b = sorted(
        (r.qid, r.rank, r.doc_id, round(r.score, 9))
        for r in search(qdf, index, k=10).collect()
    )
    assert a == b


def test_dismax_tiebreaker_changes_scores(spark, index, queries_pdf):
    """tb=0 vs tb=1 genuinely differ on multi-clause queries (the knob
    is wired through, not ignored)."""
    from dpr_spark.query.dismax import dismax_search

    qs = _queries(queries_pdf, n=6)
    s0 = {
        (r.qid, r.doc_id): r.score
        for r in dismax_search(spark, qs, index, tie_breaker=0.0, k=10).collect()
    }
    s1 = {
        (r.qid, r.doc_id): r.score
        for r in dismax_search(spark, qs, index, tie_breaker=1.0, k=10).collect()
    }
    common = set(s0) & set(s1)
    assert common and any(s1[key] > s0[key] + 1e-12 for key in common)
