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


def test_term_vectors_artificial(spark, index, oracle):
    """Artificial-doc term vectors: tf/positions from the text, df/idf
    from the index; unseen terms get df 0 and the df-0 idf."""
    import math

    from dpr_spark.query.termvectors import term_vectors_for_text

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    text = f"{terms[0]} {terms[2]} {terms[0]} zzneverindexed"
    rows = term_vectors_for_text(spark, [(7, text)], index).collect()
    got = {r.term: (r.tf, list(r.positions), r.df, r.idf) for r in rows}
    assert got[terms[0]][0] == 2 and got[terms[0]][1] == [0, 2]
    assert got[terms[2]] [0] == 1 and got[terms[2]][1] == [1]
    assert got[terms[0]][2] == oracle.df[terms[0]]
    assert got[terms[0]][3] == pytest.approx(oracle.idf(terms[0]), abs=1e-12)
    tf, pos, df, idf = got["zzneverindexed"]
    assert (tf, pos, df) == (1, [3], 0)
    n = oracle.N
    assert idf == pytest.approx(math.log((n + 0.5) / 0.5 + 1.0), abs=1e-12)
