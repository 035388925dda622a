"""Term vectors (query/termvectors.py) vs brute-force tokenization:
tf, df, idf and positions for requested docs, served from index tables."""

import math

import pytest


@pytest.fixture(scope="module")
def pos_index(spark, pages_df):
    from dpr_spark.index.build import build_index

    idx = build_index(spark, pages_df, build_positional=True)
    idx.postings.persist().count()
    return idx


def test_term_vectors_match_brute_force(spark, pos_index, pages_pdf, oracle):
    from dpr_spark.query.termvectors import term_vectors

    doc_ids = sorted(oracle.doc_tokens)[3:8]
    rows = term_vectors(spark, pos_index, doc_ids).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.term] = (
            r.tf, r.df, r.idf, list(r.positions) if r.positions else None
        )
    N = oracle.N
    for d in doc_ids:
        toks = oracle.doc_tokens[d]
        expect = {}
        for i, t in enumerate(toks):
            tf, _, _, pos = expect.get(t, (0, 0, 0.0, []))
            pos = pos + [i]
            expect[t] = (tf + 1, 0, 0.0, pos)
        assert set(got[d]) == set(expect), f"doc={d} term sets differ"
        for t, (tf, df, idf, pos) in got[d].items():
            etf, _, _, epos = expect[t]
            assert tf == etf, f"doc={d} term={t}"
            assert df == oracle.df[t]
            eidf = math.log((N - oracle.df[t] + 0.5) / (oracle.df[t] + 0.5) + 1.0)
            assert idf == pytest.approx(eidf, rel=1e-12)
            assert pos == epos, f"doc={d} term={t} positions"


def test_term_vectors_without_positions(spark, index, oracle):
    """A non-positional index serves tf/df/idf without a positions
    column (ES: term vectors without the positions flag)."""
    from dpr_spark.query.termvectors import term_vectors

    doc_ids = sorted(oracle.doc_tokens)[:2]
    df = term_vectors(spark, index, doc_ids, with_positions=True)
    # the base `index` fixture may or may not be positional; the column
    # contract must reflect what the index can serve
    if index.positions is None:
        assert "positions" not in df.columns
    rows = df.collect()
    assert {r.doc_id for r in rows} == set(doc_ids)
    for r in rows:
        assert r.tf >= 1 and r.df >= 1 and r.idf > 0
