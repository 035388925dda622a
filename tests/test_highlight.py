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


@pytest.mark.parametrize("window,n_frags", [(5, 3), (10, 2), (3, 5)])
def test_highlight_multi_vs_oracle(
    spark, index, pages_pdf, queries_pdf, oracle, window, n_frags
):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.oracle.bm25 import best_fragments
    from dpr_spark.query.highlight import highlight_multi
    from dpr_spark.query.scorer import search

    qsub = queries_pdf.head(8)
    qdf = spark.createDataFrame(qsub[["qid", "question"]])
    results = search(qdf, index, k=5)
    qt_rows, qterms = [], {}
    for _, row in qsub.iterrows():
        terms = sorted(set(tokenize(normalize_question(row.question))))
        qterms[row.qid] = terms
        qt_rows += [(int(row.qid), t) for t in terms]
    qt = spark.createDataFrame(qt_rows, "qid int, term string")
    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])

    rows = highlight_multi(
        results, docs, qt, window=window, n_fragments=n_frags
    ).collect()
    got = {}
    for r in rows:
        got.setdefault((r.qid, r.doc_id), []).append(
            (r.frag_rank, r.start_tok, r.n_hits, r.fragment)
        )
    for v in got.values():
        v.sort()
    n_checked = 0
    for (qid, doc_id), frags in got.items():
        exp = best_fragments(
            oracle.doc_tokens[doc_id], qterms[qid], window, n_frags
        )
        assert frags == exp, (qid, doc_id)
        # fragments are pairwise non-overlapping
        starts = [s for _r, s, _n, _f in frags]
        for i, a in enumerate(starts):
            for b in starts[i + 1:]:
                assert abs(a - b) >= window
        n_checked += len(frags)
    assert n_checked > results.count()  # small windows split into multis
    # frag_rank 1 equals the single-fragment highlighter everywhere
    from dpr_spark.query.highlight import highlight

    single = {
        (r.qid, r.doc_id): (r.start_tok, r.n_hits, r.fragment)
        for r in highlight(results, docs, qt, window=window).collect()
    }
    for key, frags in got.items():
        assert (frags[0][1], frags[0][2], frags[0][3]) == single[key], key
