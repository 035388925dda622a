"""Query-string language (query/querystring.py): parser contract +
rank identity vs the pure-Python twin across clause kinds."""

import pytest


@pytest.fixture(scope="module")
def qs_positions(spark, index, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.phrase import build_positions

    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    pos = build_positions(docs, index.dictionary).persist()
    pos.count()
    return pos


def test_parse_query_string():
    from dpr_spark.query.querystring import parse_query_string

    cs = parse_query_string('+spark windo~ -batch "window agg" filt* x~2')
    got = [(c.kind, c.occur, c.text, c.edits) for c in cs]
    assert ("term", "must", "spark", 1) in got
    assert ("fuzzy", "should", "windo", 1) in got
    assert ("term", "must_not", "batch", 1) in got
    assert ("phrase", "should", "window agg", 1) in got
    assert ("wildcard", "should", "filt*", 1) in got
    assert ("fuzzy", "should", "x", 2) in got
    # duplicates collapse; cids dense
    cs2 = parse_query_string("spark spark +spark")
    assert [(c.kind, c.occur) for c in cs2] == [
        ("term", "should"), ("term", "must")
    ]
    with pytest.raises(ValueError):
        parse_query_string("   ")


def _qs_queries(oracle):
    """Operator queries built FROM the fixture corpus so every clause
    kind actually exercises matches (phrases from real adjacencies)."""
    ids = sorted(oracle.doc_tokens)
    p1 = " ".join(oracle.doc_tokens[ids[3]][5:7])
    p2 = " ".join(oracle.doc_tokens[ids[9]][2:4])
    return [
        (0, f'+the "{p1}"'),
        (1, f'of -"{p2}" was'),
        (2, "he th* from"),
        (3, "wjth~ she"),
        (4, f'+was +"{p1}"'),
        (5, "his -her it"),
    ]


def test_query_string_rank_identity(spark, index, qs_positions, oracle):
    from dpr_spark.oracle.bm25 import query_string_twin
    from dpr_spark.query.querystring import query_string_search

    QS = _qs_queries(oracle)
    res = query_string_search(
        spark, QS, index, positions=qs_positions, k=10, max_expansions=8
    )
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    checked = 0
    for qid, q in QS:
        exp = query_string_twin(oracle, q, k=10, max_expansions=8)
        actual = sorted(got.get(qid, []))
        assert [a[1] for a in actual] == [d for d, _ in exp], f"qid={qid} q={q!r}"
        for a, (_, es) in zip(actual, exp):
            assert a[2] == pytest.approx(es, rel=1e-9)
        checked += len(exp)
    assert checked >= 30


def test_query_string_must_not_phrase_vetoes(spark, index, qs_positions, oracle):
    """A -"phrase" clause removes exactly the docs where the phrase
    occurs (vs the same query without it)."""
    from dpr_spark.query.querystring import query_string_search

    ids = sorted(oracle.doc_tokens)
    a, b = oracle.doc_tokens[ids[3]][5:7]
    base = query_string_search(
        spark, [(0, f"{a} {b}")], index, positions=qs_positions, k=1000
    )
    minus = query_string_search(
        spark, [(0, f'{a} {b} -"{a} {b}"')], index,
        positions=qs_positions, k=1000,
    )
    base_docs = {r.doc_id for r in base.collect()}
    minus_docs = {r.doc_id for r in minus.collect()}
    removed = base_docs - minus_docs
    assert minus_docs < base_docs
    toks = [a, b]
    for d in removed:
        dt = oracle.doc_tokens[d]
        assert any(
            dt[i : i + 2] == toks for i in range(len(dt) - 1)
        ), f"doc {d} vetoed without containing the phrase"


def test_query_string_requires_positions_for_phrases(spark, index):
    from dpr_spark.query.querystring import query_string_search

    with pytest.raises(ValueError):
        query_string_search(spark, [(0, '"a b"')], index, positions=None)


def test_default_operator_and(spark, index, qs_positions, oracle):
    """ES default_operator=AND: bare tokens become MUST — rank-identical
    to the twin, and every returned doc contains every bare token."""
    from dpr_spark.oracle.bm25 import query_string_twin
    from dpr_spark.query.querystring import (
        parse_query_string,
        query_string_search,
    )

    cs = parse_query_string("alpha beta -gamma", default_operator="and")
    assert [(c.occur, c.text) for c in cs] == [
        ("must", "alpha"), ("must", "beta"), ("must_not", "gamma"),
    ]

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    q = f"{terms[0]} {terms[4]}"
    QS = [(0, q)]
    rows = query_string_search(
        spark, QS, index, positions=qs_positions, k=10,
        default_operator="and",
    ).collect()
    assert rows
    exp = query_string_twin(oracle, q, k=10, default_operator="and")
    got = sorted((r.rank, r.doc_id, round(r.score, 9)) for r in rows)
    want = [
        (i + 1, d, round(sc, 9)) for i, (d, sc) in enumerate(exp)
    ]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, d, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)
    # AND semantics: every hit contains both tokens
    for _, d, _ in got:
        toks = set(oracle.doc_tokens[d])
        assert terms[0] in toks and terms[4] in toks
    # and is strictly a subset of the OR result's matches
    or_rows = query_string_search(
        spark, QS, index, positions=qs_positions, k=1000,
    ).collect()
    assert {r.doc_id for r in rows} <= {r.doc_id for r in or_rows}
