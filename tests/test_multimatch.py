"""multi_match modes over the fielded index (query/multimatch.py):
best_fields (dis-max + tie_breaker) and cross_fields (blended-df
term-centric) vs the pure-Python FieldedBM25Oracle twins; most_fields
equivalence to search_fielded."""

import pytest


@pytest.fixture(scope="module")
def fielded_docs_pdf(pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.functions.tokenizer import tokenize

    pw = assign_doc_ids(pages_pdf)[["doc_id", "url", "text"]].copy()
    pw["title"] = pw["text"].map(lambda t: " ".join(tokenize(t)[:4]))
    return pw


@pytest.fixture(scope="module")
def fielded_oracle(fielded_docs_pdf):
    from dpr_spark.oracle.bm25 import FieldedBM25Oracle

    o = FieldedBM25Oracle(
        fields=("text", "title"), weights={"text": 1.0, "title": 2.0}
    )
    for _, row in fielded_docs_pdf.iterrows():
        o.add(int(row.doc_id), {"text": row.text, "title": row.title})
    o.build()
    return o


@pytest.fixture(scope="module")
def fielded_index(spark, fielded_docs_pdf):
    from dpr_spark.index.fielded import build_fielded_index

    docs = spark.createDataFrame(fielded_docs_pdf)
    idx = build_fielded_index(
        spark, docs, fields=("text", "title"), weights={"text": 1.0, "title": 2.0}
    )
    idx.postings.persist().count()
    return idx


def _collect(df):
    out = {}
    for r in df.orderBy("qid", "rank").collect():
        out.setdefault(r.qid, []).append((r.doc_id, r.score))
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_best_fields_rank_identity(
    spark, fielded_index, fielded_oracle, queries_df, queries_pdf, tie
):
    from dpr_spark.query.multimatch import multi_match_best_fields

    got = _collect(
        multi_match_best_fields(queries_df, fielded_index, k=10, tie_breaker=tie)
    )
    checked = 0
    for _, q in queries_pdf.iterrows():
        exp = fielded_oracle.best_fields_search(q.question, k=10, tie_breaker=tie)
        actual = got.get(int(q.qid), [])
        assert [d for d, _ in actual] == [d for d, _ in exp], f"qid={q.qid}"
        for (_, a), (_, e) in zip(actual, exp):
            assert a == pytest.approx(e, rel=1e-12)
        checked += len(exp)
    assert checked > 100


def test_cross_fields_rank_identity(
    spark, fielded_index, fielded_oracle, queries_df, queries_pdf
):
    from dpr_spark.query.multimatch import multi_match_cross_fields

    got = _collect(multi_match_cross_fields(queries_df, fielded_index, k=10))
    checked = 0
    for _, q in queries_pdf.iterrows():
        exp = fielded_oracle.cross_fields_search(q.question, k=10)
        actual = got.get(int(q.qid), [])
        assert [d for d, _ in actual] == [d for d, _ in exp], f"qid={q.qid}"
        for (_, a), (_, e) in zip(actual, exp):
            assert a == pytest.approx(e, rel=1e-12)
        checked += len(exp)
    assert checked > 100


def test_best_fields_tie_breaker_one_is_most_fields(
    spark, fielded_index, queries_df
):
    """tie_breaker=1.0 makes best_fields = sum of field scores =
    most_fields (search_fielded) — the ES documented equivalence."""
    from dpr_spark.index.fielded import search_fielded
    from dpr_spark.query.multimatch import multi_match_best_fields

    bf = _collect(
        multi_match_best_fields(queries_df, fielded_index, k=10, tie_breaker=1.0)
    )
    mf = _collect(search_fielded(queries_df, fielded_index, k=10))
    assert set(bf) == set(mf)
    for qid in bf:
        assert [d for d, _ in bf[qid]] == [d for d, _ in mf[qid]], f"qid={qid}"
        for (_, a), (_, e) in zip(bf[qid], mf[qid]):
            assert a == pytest.approx(e, rel=1e-12)


def test_cross_fields_blends_df(spark, fielded_index, fielded_oracle):
    """A term present in both fields scores with ONE blended idf (from
    the max df), strictly less than the per-field idf sum that
    most_fields would award for a title+text co-occurrence."""
    import math

    o = fielded_oracle
    term = None
    for t, d in o.df["title"].items():
        if 0 < d < o.df["text"].get(t, 0):
            term = t
            break
    assert term is not None
    df_b = max(o.df[f].get(term, 0) for f in o.fields)
    idf_b = math.log((o.N - df_b + 0.5) / (df_b + 0.5) + 1.0)
    assert idf_b < o.idf("title", term)  # blended ≤ the rarer field's idf
