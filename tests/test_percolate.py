"""Percolator (query/percolate.py): match-pair identity vs the pure-
Python twin over the fixture corpus, clause semantics, and the analyzer
variant."""

import pytest


def _vocab_by_df(pages_pdf, lo, hi):
    """corpus terms with df in [lo, hi] — selective but not singleton."""
    from dpr_spark.functions.tokenizer import tokenize

    df = {}
    for text in pages_pdf.text:
        for t in set(tokenize(text)):
            df[t] = df.get(t, 0) + 1
    return sorted(t for t, d in df.items() if lo <= d <= hi and t.isalpha())


def _queries(pages_pdf):
    from dpr_spark.query.percolate import PercolatorQuery

    v = _vocab_by_df(pages_pdf, 10, 120)
    assert len(v) >= 8, v
    return [
        PercolatorQuery(0, must=(v[0],)),
        PercolatorQuery(1, must=(v[1], v[2])),
        PercolatorQuery(2, should=(v[0], v[3], v[4]), msm=2),
        PercolatorQuery(3, must=(v[0],), must_not=(v[5],)),
        PercolatorQuery(4, should=(v[6], v[7])),  # should-only, >=1 rule
        PercolatorQuery(5, must=(v[1],), should=(v[1], v[3]), msm=1),  # dup term
        PercolatorQuery(6, must=("zzznope",)),  # OOV -> never matches
    ]


def test_percolate_matches_twin(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.percolate import percolate, percolate_py, register_queries

    qs = _queries(pages_pdf)
    reg = register_queries(spark, qs)
    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    got = {}
    for r in percolate(docs, reg).collect():
        got.setdefault(int(r.doc_id), []).append(int(r.pqid))
    n_pairs = 0
    for d, text in zip(pw.doc_id, pw.text):
        expect = percolate_py(text, qs)
        assert sorted(got.get(int(d), [])) == expect, f"doc={d}"
        n_pairs += len(expect)
    assert n_pairs > 50  # the fixture corpus genuinely exercises matching
    # and every query except the OOV one fires somewhere
    fired = {p for ps in got.values() for p in ps}
    assert fired >= {0, 1, 2, 3, 4, 5} and 6 not in fired


def test_percolate_with_analyzer(spark, pages_pdf):
    """Registered words and doc tokens pass the same stop/stem chain: a
    query registered as a plural matches docs containing the singular."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.percolate import (
        PercolatorQuery,
        percolate,
        percolate_py,
        register_queries,
    )

    v = _vocab_by_df(pages_pdf, 10, 120)
    qs = [PercolatorQuery(0, must=(v[0] + "s",)), PercolatorQuery(1, must=(v[1],))]
    reg = register_queries(spark, qs, analyzer=ENGLISH_S)
    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    got = {}
    for r in percolate(docs, reg, analyzer=ENGLISH_S).collect():
        got.setdefault(int(r.doc_id), []).append(int(r.pqid))
    any_match = False
    for d, text in zip(pw.doc_id, pw.text):
        expect = percolate_py(text, qs, analyzer=ENGLISH_S)
        assert sorted(got.get(int(d), [])) == expect, f"doc={d}"
        any_match = any_match or 0 in expect
    assert any_match  # the stemmed plural really matched singular docs


def test_register_validation(spark):
    from dpr_spark.query.percolate import PercolatorQuery, register_queries

    with pytest.raises(ValueError, match="nothing to match"):
        register_queries(spark, [PercolatorQuery(0, must_not=("x",))])
    with pytest.raises(ValueError, match="msm"):
        register_queries(spark, [PercolatorQuery(0, should=("a",), msm=2)])


def test_percolate_phrase_clauses(spark):
    """Phrase subscriptions: term presence isn't enough — adjacency in
    order is verified; mixed-clause queries need both."""
    from dpr_spark.query.percolate import (
        PercolatorQuery,
        percolate,
        percolate_py,
        register_phrases,
        register_queries,
    )

    qs = [
        PercolatorQuery(1, phrases=("supply chain attack",)),
        PercolatorQuery(2, must=("fresh",), phrases=("chain attack",)),
        PercolatorQuery(3, phrases=("attack chain",)),  # reversed order
        PercolatorQuery(4, must=("supply",)),  # term-only, no phrases
    ]
    reg = register_queries(spark, qs)
    book = register_phrases(spark, qs)
    docs = spark.createDataFrame(
        [
            (10, "a supply chain attack on fresh targets"),
            (11, "supply of attack dogs chain fresh"),  # terms, not phrase
            (12, "the chain attack was fresh"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.pqid)
        for r in percolate(docs, reg, phrase_book=book).collect()
    )
    assert got == [(10, 1), (10, 2), (10, 4), (11, 4), (12, 2)]
    # pure-python twin agrees doc by doc
    for did, text in [(r.doc_id, r.text) for r in docs.collect()]:
        exp = sorted(p for d, p in got if d == did)
        assert percolate_py(text, qs) == exp


def test_percolate_phrase_book_none_when_no_phrases(spark):
    from dpr_spark.query.percolate import PercolatorQuery, register_phrases

    assert register_phrases(spark, [PercolatorQuery(1, must=("x",))]) is None
