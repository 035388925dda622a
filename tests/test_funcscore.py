"""Function-score queries (query/funcscore.py): rank+score identity vs
the pure-Python oracle across decay kinds, boost modes and
field_value_factor, using doclen as the doc-value column."""

import pytest


def _run(spark, index, queries_pdf, oracle, fn_expr, fn_py, boost_mode, n=10):
    from dpr_spark.query.funcscore import search_function_score

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(n))
    res = search_function_score(
        qdf, index, index.docstats, "doclen", fn_expr, boost_mode=boost_mode, k=10
    )
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    checked = 0
    for _, q in queries_pdf.head(n).iterrows():
        expect = oracle.function_score_search(
            q.question, oracle.doclen, fn_py, boost_mode=boost_mode, k=10
        )
        actual = sorted(got.get(int(q.qid), []))
        assert len(actual) == len(expect), f"qid={q.qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"qid={q.qid} rank={rank}"
            assert score == pytest.approx(escore, rel=1e-12)
            checked += 1
    assert checked > 30


@pytest.mark.parametrize("kind", ["exp", "gauss", "linear"])
def test_decay_rank_identity(spark, index, queries_pdf, oracle, kind):
    from dpr_spark.query.funcscore import decay_expr, decay_py

    # prefer short docs: decay with distance from doclen=0
    _run(
        spark, index, queries_pdf, oracle,
        lambda c: decay_expr(c, kind, origin=0.0, scale=80.0, offset=10.0, decay=0.5),
        lambda v: decay_py(v, kind, origin=0.0, scale=80.0, offset=10.0, decay=0.5),
        "multiply",
    )


def test_boost_mode_sum(spark, index, queries_pdf, oracle):
    from dpr_spark.query.funcscore import decay_expr, decay_py

    _run(
        spark, index, queries_pdf, oracle,
        lambda c: decay_expr(c, "exp", origin=0.0, scale=50.0),
        lambda v: decay_py(v, "exp", origin=0.0, scale=50.0),
        "sum",
    )


@pytest.mark.parametrize("modifier", ["log1p", "sqrt"])
def test_field_value_factor(spark, index, queries_pdf, oracle, modifier):
    from dpr_spark.query.funcscore import (
        field_value_factor_expr,
        field_value_factor_py,
    )

    _run(
        spark, index, queries_pdf, oracle,
        lambda c: field_value_factor_expr(c, factor=0.25, modifier=modifier),
        lambda v: field_value_factor_py(v, factor=0.25, modifier=modifier),
        "multiply",
    )


def test_function_changes_ranking(spark, index, queries_pdf):
    """A steep short-doc decay genuinely reorders vs plain BM25."""
    from dpr_spark.query.funcscore import decay_expr, search_function_score
    from dpr_spark.query.scorer import search

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(10))
    plain = {
        (r.qid, r.rank): r.doc_id for r in search(qdf, index, k=10).collect()
    }
    boosted = {
        (r.qid, r.rank): r.doc_id
        for r in search_function_score(
            qdf, index, index.docstats, "doclen",
            lambda c: decay_expr(c, "exp", origin=0.0, scale=20.0, decay=0.1),
            k=10,
        ).collect()
    }
    assert any(plain[key] != boosted.get(key) for key in plain)


def test_decay_param_validation():
    from pyspark.sql import functions as F

    from dpr_spark.query.funcscore import decay_expr

    with pytest.raises(ValueError):
        decay_expr(F.lit(1.0), "exp", 0.0, scale=0.0)
    with pytest.raises(ValueError):
        decay_expr(F.lit(1.0), "exp", 0.0, scale=1.0, decay=1.5)
    with pytest.raises(ValueError):
        decay_expr(F.lit(1.0), "nope", 0.0, scale=1.0)


def test_boosting_query_matches_oracle(spark, index, queries_pdf, oracle):
    """search_boosting vs BM25Oracle.boosting_search: demoted docs keep
    rank eligibility at score × negative_boost."""
    from dpr_spark.query.funcscore import search_boosting

    qs = queries_pdf.head(10)
    qdf = spark.createDataFrame(qs[["qid", "question"]])
    # negative text per query: the NEXT query's text (deterministic,
    # guaranteed to overlap some docs)
    negs = [
        (int(q.qid), qs.iloc[(i + 1) % len(qs)].question)
        for i, (_, q) in enumerate(qs.iterrows())
    ]
    ndf = spark.createDataFrame(negs, "qid long, neg_question string")
    got = {}
    for r in search_boosting(qdf, index, ndf, negative_boost=0.2, k=10).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    checked = 0
    for (qid, neg), (_, q) in zip(negs, qs.iterrows()):
        exp = oracle.boosting_search(q.question, neg, negative_boost=0.2, k=10)
        actual = sorted(got.get(qid, []))
        assert [a[1] for a in actual] == [d for d, _ in exp], f"qid={qid}"
        for a, (_, es) in zip(actual, exp):
            assert a[2] == pytest.approx(es, rel=1e-12)
        checked += len(exp)
    assert checked > 50


def test_boosting_demotes_not_vetoes(spark, index, queries_pdf, oracle):
    """A doc matching the negative query stays in results (vs must_not)
    and every demoted score is exactly base × negative_boost."""
    from dpr_spark.query.funcscore import search_boosting
    from dpr_spark.query.scorer import search

    q = queries_pdf.iloc[0]
    qdf = spark.createDataFrame([(0, q.question)], "qid long, question string")
    # negative = the positive itself: EVERY match demotes
    ndf = spark.createDataFrame([(0, q.question)], "qid long, neg_question string")
    base = {r.doc_id: r.score for r in search(qdf, index, k=10).collect()}
    demoted = {
        r.doc_id: r.score
        for r in search_boosting(qdf, index, ndf, negative_boost=0.5, k=10).collect()
    }
    assert set(demoted) == set(base)  # nothing vetoed
    for d, s in demoted.items():
        assert s == pytest.approx(base[d] * 0.5, rel=1e-12)

    with pytest.raises(ValueError):
        search_boosting(qdf, index, ndf, negative_boost=0.0)
