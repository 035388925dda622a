"""Fielded (title+text) index + weighted BM25F-style search
(r4 VERDICT Missing #1 / next-round #1): rank identity vs the
pure-Python FieldedBM25Oracle, weight semantics, save/load."""

import pytest


def _title_of(text: str) -> str:
    """Deterministic synthetic title: the first 4 tokens of the page
    (the fixture pages carry no title column — input_hint schema)."""
    from dpr_spark.functions.tokenizer import tokenize

    return " ".join(tokenize(text)[:4])


@pytest.fixture(scope="module")
def fielded_docs_pdf(pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)[["doc_id", "url", "text"]].copy()
    pw["title"] = pw["text"].map(_title_of)
    return pw


@pytest.fixture(scope="module")
def fielded_oracle(fielded_docs_pdf):
    from dpr_spark.oracle.bm25 import FieldedBM25Oracle

    o = FieldedBM25Oracle(fields=("text", "title"), weights={"text": 1.0, "title": 2.0})
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


def _spark_results(spark, fielded_index, queries_df, k, weights=None):
    from dpr_spark.index.fielded import search_fielded

    rows = search_fielded(queries_df, fielded_index, k=k, weights=weights).collect()
    out = {}
    for r in rows:
        out.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid in out:
        out[qid].sort()
    return out


@pytest.mark.parametrize("k", [10, 50])
def test_fielded_rank_identity(
    spark, fielded_index, fielded_oracle, queries_df, queries_pdf, k
):
    got = _spark_results(spark, fielded_index, queries_df, k)
    n_checked = 0
    for _, row in queries_pdf.iterrows():
        expect = fielded_oracle.search(row.question, k)
        actual = got.get(row.qid, [])
        assert len(actual) == len(expect), f"qid={row.qid} count"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"qid={row.qid} rank={rank}: {doc_id} != {edoc}"
            assert score == pytest.approx(escore, abs=1e-9), (
                f"qid={row.qid} rank={rank} doc={doc_id}"
            )
            n_checked += 1
    assert n_checked > 100


def test_fielded_stats_match_oracle(fielded_index, fielded_oracle):
    assert fielded_index.n_docs == fielded_oracle.N
    for f in ("text", "title"):
        assert fielded_index.avgdl[f] == pytest.approx(fielded_oracle.avgdl[f], abs=1e-12)
    # per-(field, term) df identity + term_id order == (term, field) order
    rows = fielded_index.dictionary.collect()
    fields = fielded_index.fields
    got_df = {(fields[r.field_id], r.term): r.df for r in rows}
    exp_df = {
        (f, t): df
        for f in fields
        for t, df in fielded_oracle.df[f].items()
    }
    assert got_df == exp_df
    by_id = sorted((r.term_id, r.term, r.field_id) for r in rows)
    assert [x[1:] for x in by_id] == sorted((t, f) for _i, t, f in by_id)


def test_title_weight_changes_ranking(spark, fielded_index, fielded_oracle):
    """A query matching many titles must rank differently under a large
    title weight than under title weight 0 — and weight overrides work
    at query time without a rebuild (weights are index META, applied at
    score time)."""
    from dpr_spark.oracle.bm25 import FieldedBM25Oracle

    # pick a term frequent in titles (titles are text prefixes, so any
    # common leading term works); use the oracle's title dictionary
    title_df = fielded_oracle.df["title"]
    term = max(title_df, key=lambda t: (title_df[t], t))
    qdf = spark.createDataFrame([(0, term)], "qid long, question string")

    flat = _spark_results(
        spark, fielded_index, qdf, 10, weights={"text": 1.0, "title": 0.0}
    )
    boosted = _spark_results(
        spark, fielded_index, qdf, 10, weights={"text": 1.0, "title": 10.0}
    )
    assert flat[0] != boosted[0]

    # title-weight-0 == the single-field BM25 engine on text alone
    o = FieldedBM25Oracle(fields=("text", "title"), weights={"text": 1.0, "title": 0.0})
    o.doc_tokens = fielded_oracle.doc_tokens
    o.build()
    expect = o.search(term, 10)
    actual = [(d, s) for _r, d, s in flat[0]]
    assert [d for d, _ in actual] == [d for d, _ in expect]


def test_fielded_save_load_roundtrip(spark, fielded_index, queries_df, tmp_path):
    from dpr_spark.index.fielded import FieldedIndex

    path = str(tmp_path / "fidx")
    fielded_index.save(path)
    loaded = FieldedIndex.load(spark, path)
    assert loaded.fields == fielded_index.fields
    assert loaded.weights == fielded_index.weights
    assert loaded.n_docs == fielded_index.n_docs
    assert loaded.avgdl == fielded_index.avgdl
    got = _spark_results(spark, loaded, queries_df.limit(5), 10)
    exp = _spark_results(spark, fielded_index, queries_df.limit(5), 10)
    assert got == exp


def test_empty_field_docs(spark):
    """Docs with an empty title still count in N for the title field
    (avgdl denominator) and never match title probes."""
    from dpr_spark.index.fielded import build_fielded_index, search_fielded

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "alpha headline"),
            (1, "alpha beta", ""),
            (2, "delta", None),
        ],
        "doc_id long, text string, title string",
    )
    idx = build_fielded_index(spark, docs, fields=("text", "title"))
    assert idx.n_docs == 3
    assert idx.avgdl["title"] == pytest.approx(2.0 / 3.0)
    qdf = spark.createDataFrame([(0, "alpha")], "qid long, question string")
    rows = search_fielded(qdf, idx, k=10).collect()
    got = {r.doc_id: r.score for r in rows}
    assert set(got) == {0, 1}
    # doc 0 matches alpha in BOTH fields -> strictly higher score
    assert got[0] > got[1]


def test_fielded_analyzed_rank_identity(spark, fielded_docs_pdf, queries_pdf, tmp_path):
    """BM25F over an ANALYZED fielded index (stop + s-stem on every
    field): rank+score identity vs the analyzer-aware FieldedBM25Oracle,
    and the analyzer survives save/load."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.index.fielded import FieldedIndex, build_fielded_index, search_fielded
    from dpr_spark.oracle.bm25 import FieldedBM25Oracle

    o = FieldedBM25Oracle(
        fields=("text", "title"), weights={"text": 1.0, "title": 2.0},
        analyzer=ENGLISH_S,
    )
    for _, row in fielded_docs_pdf.iterrows():
        o.add(int(row.doc_id), {"text": row.text, "title": row.title})
    o.build()

    docs = spark.createDataFrame(fielded_docs_pdf)
    idx = build_fielded_index(
        spark, docs, fields=("text", "title"),
        weights={"text": 1.0, "title": 2.0}, analyzer=ENGLISH_S,
    )
    p = str(tmp_path / "fidx")
    idx.save(p)
    back = FieldedIndex.load(spark, p)
    assert back.analyzer == ENGLISH_S

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(10))
    for which in (idx, back):
        got = {}
        for r in search_fielded(qdf, which, k=10).collect():
            got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
        n = 0
        for _, q in queries_pdf.head(10).iterrows():
            expect = o.search(q.question, 10)
            actual = sorted(got.get(int(q.qid), []))
            assert len(actual) == len(expect), f"qid={q.qid}"
            for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
                assert doc_id == edoc, f"qid={q.qid} rank={rank}"
                assert score == pytest.approx(escore, abs=1e-9)
                n += 1
        assert n > 30
    idx.unpersist()


def test_fielded_positions_and_field_phrase(spark):
    """Positions are per field; a phrase matching only in text does NOT
    match a title-scoped phrase query, and title stats drive the score."""
    import pyspark.sql.functions as F

    from dpr_spark.index.fielded import (
        build_fielded_index,
        build_positions_fielded,
        phrase_search_fielded,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta in the body only", "unrelated words here"),
            (2, "nothing relevant in this text", "alpha beta title"),
            (3, "alpha beta everywhere", "alpha beta twice alpha beta"),
        ],
        "doc_id long, text string, title string",
    )
    idx = build_fielded_index(spark, docs, fields=("text", "title"))
    pos = build_positions_fielded(docs, idx)
    got = {
        r.doc_id: (r.rank, r.score)
        for r in phrase_search_fielded(
            spark, idx, pos, [(0, "alpha beta")], "title"
        ).collect()
    }
    assert set(got) == {2, 3}  # doc 1 matches in text only
    assert got[3][0] == 1  # pf=2 in a longer title still wins
    # field isolation the other way: text-scoped phrase sees docs 1, 3
    got_t = {
        r.doc_id
        for r in phrase_search_fielded(
            spark, idx, pos, [(0, "alpha beta")], "text"
        ).collect()
    }
    assert got_t == {1, 3}
