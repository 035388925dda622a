"""Phrase suggester (query/phrasesuggest.py) vs the pure-Python
stupid-backoff twin (oracle/bm25.py::phrase_suggest_twin)."""

import pytest


@pytest.fixture(scope="module")
def lm(spark, pages_df):
    from dpr_spark.query.phrasesuggest import build_bigram_lm

    return build_bigram_lm(pages_df.selectExpr("text"))


def _misspell(q: str) -> str:
    """Deterministically corrupt the longest token (drop its 2nd char)."""
    toks = q.split()
    i = max(range(len(toks)), key=lambda j: (len(toks[j]), -j))
    t = toks[i]
    toks[i] = t[0] + t[2:] if len(t) > 3 else t + "x"
    return " ".join(toks)


def test_phrase_suggest_matches_twin(spark, index, lm, queries_pdf, oracle):
    from dpr_spark.oracle.bm25 import phrase_suggest_twin
    from dpr_spark.query.phrasesuggest import suggest_phrases

    qs = [
        (int(q.qid), _misspell(q.question))
        for _, q in queries_pdf.head(8).iterrows()
    ]
    res = suggest_phrases(spark, qs, index, lm, max_edits=1, per_term=3, topn=3)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.suggestion, r.score))
    checked = 0
    for qid, q in qs:
        exp = phrase_suggest_twin(
            oracle.doc_tokens, oracle.df, q, max_edits=1, per_term=3, topn=3
        )
        actual = sorted(got.get(qid, []))
        assert [(a[0], a[1]) for a in actual] == [
            (e[0], e[1]) for e in exp
        ], f"qid={qid} q={q!r}"
        for a, e in zip(actual, exp):
            assert a[2] == pytest.approx(e[2], rel=1e-12)
        checked += len(exp)
    assert checked >= 20


def test_phrase_suggest_corrects_misspelling(spark, index, lm, queries_pdf):
    """For a 1-edit corruption of a real corpus phrase, some top-3
    suggestion restores the original token (the LM prefers attested
    bigrams)."""
    from dpr_spark.query.phrasesuggest import suggest_phrases

    hits = 0
    qs = []
    originals = {}
    for _, q in queries_pdf.head(10).iterrows():
        bad = _misspell(q.question)
        if bad == q.question:
            continue
        qid = int(q.qid)
        qs.append((qid, bad))
        originals[qid] = q.question.lower()
    res = suggest_phrases(spark, qs, index, lm, max_edits=1, per_term=3, topn=3)
    by_qid = {}
    for r in res.collect():
        by_qid.setdefault(r.qid, []).append(r.suggestion)
    for qid, sugs in by_qid.items():
        if originals[qid] in [s.lower() for s in sugs]:
            hits += 1
    assert hits >= len(qs) // 2, f"only {hits}/{len(qs)} corrected"


def test_original_phrase_always_competes(spark, index, lm):
    """A clean query with no in-vocab 1-edit neighbors returns itself."""
    from dpr_spark.query.phrasesuggest import suggest_phrases

    res = suggest_phrases(
        spark, [(0, "the spark window")], index, lm, topn=5
    ).collect()
    sugs = [r.suggestion for r in res]
    assert "the spark window" in sugs
