"""CommonTermsQuery (query/commonterms.py): candidates from
low-frequency terms only, full-BM25 scoring on candidates, all-high
fallback — engine == a pure-Python twin over the oracle's postings,
and the candidate restriction is demonstrably load-bearing."""

import pytest


def _expected(oracle, question, cutoff, k=20):
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    terms = sorted(set(tokenize(normalize_question(question))))
    resolved = [t for t in terms if t in oracle.postings]
    low = [t for t in resolved if oracle.df[t] <= cutoff * oracle.N]
    gens = low if low else resolved
    cand = set()
    for t in gens:
        cand.update(oracle.postings[t])
    scores = {}
    for t in resolved:
        for d, _tf in oracle.postings[t].items():
            if d in cand:
                scores[d] = scores.get(d, 0.0) + oracle.score_one(t, d)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def test_common_terms_vs_twin_and_fallback(spark, index, oracle, queries_pdf, queries_df):
    from dpr_spark.query.commonterms import common_terms_search

    # a cutoff at the corpus's median df splits real queries both ways
    dfs = sorted(oracle.df.values())
    cutoff = dfs[len(dfs) // 2] / oracle.N
    got = {}
    res = common_terms_search(queries_df, index, cutoff=cutoff, k=20)
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for q in got:
        got[q].sort()
    n_checked = 0
    n_restricted = 0
    for _, row in queries_pdf.iterrows():
        expect = _expected(oracle, row.question, cutoff, k=20)
        plain = oracle.search(row.question, 20)
        if [d for d, _ in expect] != [d for d, _ in plain]:
            n_restricted += 1
        actual = got.get(row.qid, [])
        assert len(actual) == len(expect), f"qid={row.qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"qid={row.qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9)
            n_checked += 1
    assert n_checked > 100
    # the candidate restriction changed at least one query's ranking —
    # otherwise this test is vacuously equal to plain BM25
    assert n_restricted > 0


def test_common_terms_all_high_falls_back_to_bm25(spark, index, oracle, queries_df):
    """cutoff=0 makes every term high-frequency -> every query takes the
    all-generate fallback -> identical to the plain exact scorer."""
    from dpr_spark.query.commonterms import common_terms_search
    from dpr_spark.query.scorer import search

    a = sorted(
        map(tuple, common_terms_search(queries_df, index, cutoff=0.0, k=10).collect())
    )
    b = sorted(map(tuple, search(queries_df, index, k=10).collect()))
    assert a == b and len(a) > 0
