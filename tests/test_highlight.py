"""Snippet/best-fragment generation vs the pure-Python twin
(Lucene Highlighter parity; dpr_spark/query/highlight.py)."""

import pytest


@pytest.mark.parametrize("window", [5, 30])
def test_highlight_vs_oracle(spark, index, pages_pdf, queries_pdf, oracle, window):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.oracle.bm25 import best_fragment
    from dpr_spark.query.highlight import highlight
    from dpr_spark.query.scorer import search

    qsub = queries_pdf.head(12)
    qdf = spark.createDataFrame(qsub[["qid", "question"]])
    results = search(qdf, index, k=5)

    qt_rows = []
    qterms = {}
    for _, row in qsub.iterrows():
        terms = sorted(set(tokenize(normalize_question(row.question))))
        qterms[row.qid] = terms
        qt_rows += [(int(row.qid), t) for t in terms]
    qt = spark.createDataFrame(qt_rows, "qid int, term string")

    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])

    rows = highlight(results, docs, qt, window=window).collect()
    # every (qid, doc_id) of the top-k must produce a fragment (BM25
    # results contain >=1 query term by construction)
    assert len(rows) == results.count()
    for r in rows:
        exp = best_fragment(oracle.doc_tokens[r.doc_id], qterms[r.qid], window)
        assert exp is not None
        assert (r.start_tok, r.n_hits, r.fragment) == exp, (r.qid, r.doc_id)
        # the fragment really contains a query term and starts on a hit
        frag_toks = r.fragment.split(" ")
        assert frag_toks[0] in qterms[r.qid]
        assert sum(1 for t in frag_toks if t in qterms[r.qid]) == r.n_hits


def test_highlight_no_hit_docs_dropped(spark):
    from dpr_spark.query.highlight import highlight

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")], "doc_id long, text string"
    )
    results = spark.createDataFrame([(0, 0), (0, 1)], "qid int, doc_id long")
    qt = spark.createDataFrame([(0, "beta")], "qid int, term string")
    rows = highlight(results, docs, qt, window=2).collect()
    assert [(r.qid, r.doc_id, r.fragment) for r in rows] == [(0, 0, "beta gamma")]
