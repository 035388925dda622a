"""RM3 pseudo-relevance feedback vs the pure-Python oracle twin
(BM25+RM3, the Lucene/Pyserini strong sparse baseline;
dpr_spark/query/rm3.py)."""

import pytest


@pytest.fixture(scope="module")
def docs_df(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    return spark.createDataFrame(pw[["doc_id", "text"]])


@pytest.mark.parametrize(
    "fb_docs,fb_terms,alpha", [(10, 10, 0.5), (5, 20, 0.3), (3, 5, 0.9)]
)
def test_rm3_vs_oracle(
    spark, index, docs_df, queries_pdf, oracle, fb_docs, fb_terms, alpha
):
    from dpr_spark.query.rm3 import rm3_search

    qsub = queries_pdf.head(10)
    qdf = spark.createDataFrame(qsub[["qid", "question"]])
    expect = {
        int(row.qid): oracle.rm3_search(
            row.question, k=10, fb_docs=fb_docs, fb_terms=fb_terms, alpha=alpha
        )
        for _, row in qsub.iterrows()
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = rm3_search(
        spark, qdf, index, docs_df, k=10,
        fb_docs=fb_docs, fb_terms=fb_terms, alpha=alpha,
    ).collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid in got:
        got[qid].sort()
    for qid, exp in expect.items():
        actual = got.get(qid, [])
        assert len(actual) == len(exp), f"qid={qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, exp):
            assert doc_id == edoc, f"qid={qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9), f"qid={qid} rank={rank}"


def test_rm3_alpha_one_equals_scaled_bm25(spark, index, docs_df, queries_pdf, oracle):
    """alpha=1 turns off expansion: ranks must equal plain BM25 and the
    scores its alpha/|q| scaling."""
    from dpr_spark.query.rm3 import rm3_search

    row = queries_pdf.iloc[0]
    qdf = spark.createDataFrame([(int(row.qid), row.question)], ["qid", "question"])
    rows = rm3_search(spark, qdf, index, docs_df, k=10, alpha=1.0).collect()
    assert rows
    plain = oracle.search(row.question, 10)
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    n_terms = len(set(tokenize(normalize_question(row.question))))
    got = sorted((r.rank, r.doc_id, r.score) for r in rows)
    for (rank, doc_id, score), (edoc, escore) in zip(got, plain):
        assert doc_id == edoc
        assert score == pytest.approx(escore / n_terms, abs=1e-9)
