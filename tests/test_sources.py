"""S1-S4 scan operators against fixture TSV/JSON files."""

import json

import pytest


@pytest.fixture(scope="module")
def tsv_paths(tmp_path_factory, pages_pdf, queries_pdf):
    from dpr_spark.fixtures.corpus import (
        assign_doc_ids,
        write_passages_tsv,
        write_queries_tsv,
    )

    d = tmp_path_factory.mktemp("tsv")
    pw = assign_doc_ids(pages_pdf)
    write_passages_tsv(str(d / "passages.tsv"), pw)
    write_queries_tsv(str(d / "qa.tsv"), queries_pdf)
    return d


def test_read_passages_tsv(spark, tsv_paths, pages_pdf):
    from dpr_spark.sources.readers import read_passages_tsv

    df = read_passages_tsv(spark, str(tsv_paths / "passages.tsv"), id_prefix="wiki:")
    rows = df.collect()
    assert len(rows) == len(pages_pdf)
    assert all(r.id.startswith("wiki:") for r in rows[:5])
    texts = set(pages_pdf["text"])
    assert all(r.text in texts for r in rows[:20])


def test_read_qa_tsv_python_literal_answers(spark, tsv_paths, queries_pdf):
    from dpr_spark.sources.readers import read_qa_tsv

    df = read_qa_tsv(spark, str(tsv_paths / "qa.tsv"))
    rows = {r.question: list(r.answers) for r in df.collect()}
    assert len(rows) == len(queries_pdf)
    for _, row in queries_pdf.head(10).iterrows():
        assert rows[row.question] == list(row.answers)


def test_read_json_and_jsonl(spark, tmp_path):
    from dpr_spark.sources.readers import read_json_dataset, read_jsonl_dataset, union_sources

    data = [
        {"question": "q1", "answers": ["a"], "positive_ctxs": [{"title": "t", "text": "x"}]},
        {"question": "q2", "answers": ["b", "c"], "positive_ctxs": []},
    ]
    (tmp_path / "d.json").write_text(json.dumps(data))
    with open(tmp_path / "d.jsonl", "w") as f:
        for r in data:
            f.write(json.dumps(r) + "\n")

    j = read_json_dataset(spark, str(tmp_path / "d.json"))
    l = read_jsonl_dataset(spark, str(tmp_path / "d.jsonl"))
    assert j.count() == 2 and l.count() == 2
    assert {r.question for r in j.collect()} == {"q1", "q2"}
    # nested ctx struct survived (biencoder_data.py:81-108 shape)
    assert "positive_ctxs" in j.columns
    u = union_sources(j.select("question", "answers"), l.select("question", "answers"))
    assert u.count() == 4


def test_positive_ctx_filter(spark, tmp_path):
    """P6: drop training rows with empty positive_ctxs
    (`biencoder_data.py:77-79`)."""
    from pyspark.sql import functions as F

    from dpr_spark.sources.readers import read_json_dataset

    data = [
        {"question": "q1", "positive_ctxs": [{"text": "x"}]},
        {"question": "q2", "positive_ctxs": []},
    ]
    (tmp_path / "p.json").write_text(json.dumps(data))
    df = read_json_dataset(spark, str(tmp_path / "p.json"))
    kept = df.filter(F.size("positive_ctxs") > 0).collect()
    assert [r.question for r in kept] == ["q1"]
