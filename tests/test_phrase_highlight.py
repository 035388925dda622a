"""Phrase-aware highlighting (query/phrase.py::phrase_search_index_highlight)
vs a pure-Python twin: exact-phrase BM25 top-k + first occurrence + a
lead/span/trail token fragment, checked position- and string-exact."""

import math

import pytest

from dpr_spark import BM25_B, BM25_K1

K, LEAD, TRAIL = 3, 3, 3


@pytest.fixture(scope="module")
def docs_df(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    return spark.createDataFrame(pw[["doc_id", "text"]])


@pytest.fixture(scope="module")
def positions(spark, index, docs_df):
    from dpr_spark.query.phrase import build_positions

    pos = build_positions(docs_df, index.dictionary).persist()
    pos.count()
    yield pos
    pos.unpersist()


def _phrases(oracle):
    doc_ids = sorted(oracle.doc_tokens)
    out = []
    for i, d in enumerate(doc_ids[:5]):
        toks = oracle.doc_tokens[d]
        n = 2 + (i % 3)
        start = (11 * i) % (len(toks) - n)
        out.append(" ".join(toks[start : start + n]))
    return list(enumerate(out))


def _twin(oracle, phrase: str, k: int):
    """(doc_id, score, first_pos, fragment) top-k, phrase-BM25 with
    tf = adjacent occurrence count."""
    words = phrase.split(" ")
    span = len(words)
    idf_sum = sum(oracle.idf(t) for t in words)
    if any(t not in oracle.df for t in words):
        return []
    hits = []
    for d, toks in oracle.doc_tokens.items():
        starts = [
            p
            for p in range(len(toks) - span + 1)
            if toks[p : p + span] == words
        ]
        if not starts:
            continue
        pf = len(starts)
        dl = oracle.doclen[d]
        score = (
            idf_sum
            * pf
            * (BM25_K1 + 1.0)
            / (pf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / oracle.avgdl))
        )
        p0 = starts[0]
        s0 = max(p0 - LEAD, 0)
        frag = " ".join(toks[s0 : p0 + span + TRAIL])
        hits.append((d, score, p0, frag))
    hits.sort(key=lambda t: (-t[1], t[0]))
    return hits[:k]


def test_phrase_highlight_matches_twin(spark, index, positions, docs_df, oracle):
    from dpr_spark.query.phrase import phrase_search_index_highlight

    phrases = _phrases(oracle)
    rows = phrase_search_index_highlight(
        spark, index, positions, docs_df, phrases, k=K, lead=LEAD, trail=TRAIL
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append(r)
    for v in got.values():
        v.sort(key=lambda r: r.rank)
    for qid, phrase in phrases:
        want = _twin(oracle, phrase, K)
        g = got.get(qid, [])
        assert [r.doc_id for r in g] == [d for d, _, _, _ in want], f"qid={qid}"
        for r, (d, s, p0, frag) in zip(g, want):
            assert r.score == pytest.approx(s, abs=1e-9)
            assert r.first_pos == p0
            assert r.fragment == frag, f"qid={qid} doc={d}"


def test_fragment_contains_phrase(spark, index, positions, docs_df, oracle):
    from dpr_spark.query.phrase import phrase_search_index_highlight

    phrases = _phrases(oracle)
    rows = phrase_search_index_highlight(
        spark, index, positions, docs_df, phrases, k=K
    ).collect()
    assert rows
    by_qid = dict(phrases)
    for r in rows:
        assert by_qid[r.qid] in r.fragment
