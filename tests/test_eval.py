"""Validation suite vs the pure-Python oracle: has_answer, accuracy@k,
results JSON schema (SURVEY.md §2.9, FIXTURES.md §3)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def eval_frames(spark, index, queries_df, queries_pdf, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.scorer import search

    results = search(queries_df, index, k=10).persist()
    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    answers = spark.createDataFrame(queries_pdf[["qid", "question", "answers"]])
    return results, docs, answers


def test_has_answer_matches_oracle(spark, eval_frames, oracle, queries_pdf):
    from dpr_spark.eval.validation import annotate_hits
    from dpr_spark.oracle.bm25 import has_answer

    results, docs, answers = eval_frames
    got = {
        (r.qid, r.doc_id): r.has_answer
        for r in annotate_hits(results, docs, answers).collect()
    }
    amap = {int(r.qid): list(r.answers) for _, r in queries_pdf.iterrows()}
    assert len(got) > 50
    for (qid, doc_id), hit in got.items():
        assert hit == has_answer(amap[qid], oracle.doc_text[doc_id]), (qid, doc_id)


def test_accuracy_at_k_matches_oracle(spark, eval_frames, oracle, queries_pdf):
    from dpr_spark.eval.validation import accuracy_at_k, annotate_hits
    from dpr_spark.oracle.bm25 import has_answer, top_k_hits

    results, docs, answers = eval_frames
    hits = annotate_hits(results, docs, answers)
    got = {r.k: (r.hits, r.accuracy) for r in accuracy_at_k(hits, len(queries_pdf), 10).collect()}

    per_q = []
    for _, row in queries_pdf.iterrows():
        top = oracle.search(row.question, 10)
        per_q.append([has_answer(list(row.answers), oracle.doc_text[d]) for d, _ in top])
    expect = top_k_hits(per_q, 10)
    for k in range(1, 11):
        assert got[k][0] == expect[k - 1], f"k={k}"
        assert got[k][1] == pytest.approx(expect[k - 1] / len(queries_pdf))


def test_results_json_schema(spark, eval_frames, tmp_path):
    from dpr_spark.eval.validation import results_json

    results, docs, answers = eval_frames
    out = results_json(results, docs, answers)
    schema = dict(out.dtypes)
    assert schema["question"] == "string"
    assert schema["answers"] == "array<string>"
    assert "array<struct" in schema["ctxs"]
    rows = out.collect()
    assert len(rows) == answers.count()
    # ctxs sorted by rank, scores stringified (dense_retriever.py:353)
    r = next(x for x in rows if len(x.ctxs) >= 2)
    assert isinstance(r.ctxs[0]["score"], str)
    assert float(r.ctxs[0]["score"]) >= float(r.ctxs[1]["score"])
    # writable as JSON
    out.write.mode("overwrite").json(str(tmp_path / "results_json"))


def test_regex_match_udf(spark):
    from dpr_spark.eval.validation import regex_match_udf

    df = spark.createDataFrame(
        [
            ("the answer is 42 here", ["answer\\s+is\\s+\\d+"], True),
            ("no match at all", ["^xyz$"], False),
            ("bad pattern survives", ["([unclosed"], False),
            ("Case Insensitive", ["case insensitive"], True),
        ],
        "text string, answers array<string>, expect boolean",
    )
    rows = df.withColumn("got", regex_match_udf()(F.col("text"), F.col("answers"))).collect()
    for r in rows:
        assert r.got == r.expect, r.text
