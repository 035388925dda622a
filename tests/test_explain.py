"""Score explain (Lucene Explanation analog): per-term components sum
bit-exactly to the engine score; every component is the oracle's."""

import pytest
from pyspark.sql import functions as F


def test_explain_components_sum_to_score(spark, index, queries_df):
    from dpr_spark.query.explain import explain_topk

    ex = explain_topk(spark, queries_df, index, k=5).persist()
    sums = (
        ex.groupBy("qid", "doc_id", "score")
        .agg(F.sum("component").alias("s"))
        .collect()
    )
    assert sums
    for r in sums:
        # same float formula; fold order may differ (sum vs ascending
        # term), so exact-to-1-ulp, not bit-equal
        assert r.s == pytest.approx(r.score, abs=1e-12), (r.qid, r.doc_id)
    ex.unpersist()


def test_explain_matches_oracle_components(spark, index, queries_pdf, oracle):
    from dpr_spark.query.explain import explain_topk

    qpdf = queries_pdf[["qid", "question"]].head(6)
    qdf = spark.createDataFrame(qpdf)
    ex = explain_topk(spark, qdf, index, k=3)
    got = {}
    for r in ex.collect():
        got[(r.qid, r.doc_id, r.term)] = (r.tf, r.df, r.idf, r.component)
    assert got
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    for _, row in qpdf.iterrows():
        terms = sorted(set(tokenize(normalize_question(row.question))))
        for doc_id, _score in oracle.search(row.question, 3):
            for t in terms:
                tf = oracle.postings.get(t, {}).get(doc_id)
                if tf is None:
                    assert (row.qid, doc_id, t) not in got
                    continue
                gtf, gdf, gidf, gcomp = got[(row.qid, doc_id, t)]
                assert gtf == tf
                assert gdf == len(oracle.postings[t])
                assert gidf == pytest.approx(oracle.idf(t), abs=1e-12)
                assert gcomp == pytest.approx(oracle.score_one(t, doc_id), abs=1e-12)
