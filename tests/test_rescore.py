"""Query rescoring (Lucene QueryRescorer): window rows re-ranked by
first + weight * phrase score, tail untouched below — vs the oracle."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def positions(spark, pages_pdf, index):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.phrase import build_positions

    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    pos = build_positions(docs, index.dictionary).persist()
    pos.count()
    return pos


def _twin(oracle, question, window, weight, k):
    first = oracle.search(question, k=k)
    ph = dict(oracle.phrase_search(question, k=10**9))
    win = first[:window]
    tail = first[window:]
    comb = sorted(
        ((d, s + weight * ph.get(d, 0.0)) for d, s in win),
        key=lambda ds: (-ds[1], ds[0]),
    )
    out = [(i + 1, d, s, True) for i, (d, s) in enumerate(comb)]
    out += [(window + j + 1, d, s, False) for j, (d, s) in enumerate(tail)]
    return out


def test_rescore_matches_twin(spark, index, positions, pages_pdf, oracle):
    """Queries = verbatim document bigrams, so the phrase boost really
    fires for some window docs and reorders them."""
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.query.rescore import rescore_phrase
    from dpr_spark.query.scorer import search

    qs = []
    for i, d in enumerate(sorted(oracle.doc_tokens)[:6]):
        toks = oracle.doc_tokens[d]
        qs.append((i, " ".join(toks[2:4])))
    qdf = spark.createDataFrame(qs, "qid int, question string")
    first = search(qdf, index, k=15)
    got = {}
    for r in rescore_phrase(
        spark, qdf, index, positions, first, window=8, weight=0.5
    ).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score, r.rescored))
    for v in got.values():
        v.sort()
    reordered = 0
    for qid, q in qs:
        exp = _twin(oracle, q, 8, 0.5, 15)
        act = got.get(qid, [])
        assert [(a[0], a[1], a[3]) for a in act] == [(e[0], e[1], e[3]) for e in exp], q
        for a, e in zip(act, exp):
            assert a[2] == pytest.approx(e[2], abs=1e-9)
        plain = [d for d, _ in oracle.search(q, 15)]
        if [a[1] for a in act] != plain:
            reordered += 1
    assert reordered > 0  # the boost genuinely changed some ranking


def test_rescore_weight_zero_is_first_pass(spark, index, positions, queries_df):
    from dpr_spark.query.rescore import rescore_phrase
    from dpr_spark.query.scorer import search

    first = search(queries_df, index, k=12).persist()
    out = rescore_phrase(
        spark, queries_df, index, positions, first, window=6, weight=0.0
    )
    got = sorted((r.qid, r.rank, r.doc_id, r.score) for r in out.collect())
    exp = sorted((r.qid, r.rank, r.doc_id, r.score) for r in first.collect())
    assert got == exp
    first.unpersist()
