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


def test_average_rank(spark):
    from dpr_spark.eval.validation import average_rank

    scored = spark.createDataFrame(
        [
            (0, 10, 3.0), (0, 11, 2.0), (0, 12, 1.0),       # gold 11 -> rank 1
            (1, 20, 5.0), (1, 21, 5.0), (1, 22, 4.0),       # gold 21: tie, 20 < 21 -> rank 1
            (2, 30, 9.0), (2, 31, 1.0),                     # gold 30 -> rank 0
        ],
        "qid long, doc_id long, score double",
    )
    gold = spark.createDataFrame(
        [(0, 11), (1, 21), (2, 30)], "qid long, gold_doc_id long"
    )
    row = average_rank(scored, gold).collect()[0]
    assert row.n_questions == 3
    assert row.av_rank == (1 + 1 + 0) / 3


def test_to_kilt_format(spark):
    import json

    from dpr_spark.eval.validation import to_kilt_format
    from pyspark.sql import functions as F

    results = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 200), (1, 1, 300)],
        "qid long, rank int, doc_id long",
    )
    mapping = spark.createDataFrame(
        [(100, "w100", 5), (200, "w200", 6), (300, "w300", 7)],
        "doc_id long, wikipedia_id string, end_paragraph_id int",
    )
    gold = spark.createDataFrame(
        [(0, "k0", "q zero"), (1, "k1", "q one"), (2, "k2", "no results")],
        "qid long, kilt_id string, input string",
    )
    rows = {r.id: r for r in to_kilt_format(results, mapping, gold).collect()}
    assert rows["k0"].input == "q zero"
    prov = rows["k0"].output[0].provenance
    assert [p.wikipedia_id for p in prov] == ["w100", "w200"]  # rank order
    assert prov[1].end_paragraph_id == 6
    assert list(rows["k2"].output[0].provenance) == []  # no results -> empty
