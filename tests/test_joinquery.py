"""has_child join queries (query/joinquery.py) vs a brute-force
pure-Python twin over the fixture corpus: all four score modes and the
child-count bounds."""

import pytest
from pyspark.sql import functions as F


def _twin(oracle, question, parent_of, mode, min_c=1, max_c=0, k=10):
    from dpr_spark.functions.analysis import analyze_query

    terms = analyze_query(question, oracle.analyzer)
    scores = {}
    for t in terms:
        for d in oracle.postings.get(t, ()):
            scores[d] = scores.get(d, 0.0) + oracle.score_one(t, d)
    groups = {}
    for d, s in scores.items():
        groups.setdefault(parent_of(d), []).append(s)
    out = []
    for p, ss in groups.items():
        n = len(ss)
        if n < min_c or (max_c and n > max_c):
            continue
        if mode == "max":
            sc = max(ss)
        elif mode == "sum":
            sc = sum(ss)
        elif mode == "avg":
            sc = sum(ss) / n
        else:
            sc = 0.0
        out.append((p, sc, n))
    if mode == "none":
        out.sort(key=lambda x: x[0])
    else:
        out.sort(key=lambda x: (-x[1], x[0]))
    return [(i + 1, p, sc, n) for i, (p, sc, n) in enumerate(out[:k])]


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "none"])
def test_has_child_matches_twin(spark, index, queries_pdf, oracle, mode):
    from dpr_spark.query.joinquery import has_child_search

    cp = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(7)).alias("parent")
    )
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    got = {}
    res = has_child_search(qdf, index, cp, score_mode=mode, k=5)
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.parent, r.score, r.n_children))
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        expect = _twin(oracle, q.question, lambda d: d % 7, mode, k=5)
        actual = sorted(got.get(int(q.qid), []))
        assert len(actual) == len(expect), f"mode={mode} qid={q.qid}"
        for (rank, p, sc, n), (erank, ep, esc, en) in zip(actual, expect):
            assert (rank, p, n) == (erank, ep, en), f"mode={mode} qid={q.qid}"
            assert sc == pytest.approx(esc, abs=1e-9)
            checked += 1
    assert checked > 20


def test_has_child_count_bounds(spark, index, queries_pdf, oracle):
    """parent = doc_id % 97 (~3 children each) so the [3, 4] bounds
    genuinely split the parent population."""
    from dpr_spark.query.joinquery import has_child_search

    cp = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(97)).alias("parent")
    )
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(5))
    res = has_child_search(
        qdf, index, cp, score_mode="max", min_children=3, max_children=4, k=10
    )
    rows = res.collect()
    assert rows and all(3 <= r.n_children <= 4 for r in rows)
    for _, q in queries_pdf.head(5).iterrows():
        expect = _twin(oracle, q.question, lambda d: d % 97, "max", 3, 4, 10)
        actual = sorted(
            (r.rank, r.parent, round(r.score, 9), r.n_children)
            for r in rows
            if r.qid == int(q.qid)
        )
        assert actual == [(a, b, round(c, 9), d) for a, b, c, d in expect]


def test_has_child_validation(spark, index):
    from dpr_spark.query.joinquery import has_child_search

    cp = index.docstats.select("doc_id", F.lit(0).alias("parent"))
    q = spark.createDataFrame([(0, "x")], "qid long, question string")
    with pytest.raises(ValueError, match="score_mode"):
        has_child_search(q, index, cp, score_mode="best")
    with pytest.raises(ValueError, match="min_children"):
        has_child_search(q, index, cp, min_children=0)


def test_has_parent_matches_twin(spark, index, queries_pdf, oracle):
    """has_parent (score=true/false) vs brute force: children inherit
    their parent's BM25 score; filter mode ranks by doc_id."""
    from dpr_spark.query.joinquery import has_parent_search

    # parent of doc d = the decade leader d - d%10 (a real indexed doc)
    cp = index.docstats.select(
        "doc_id",
        (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(10))).alias("parent"),
    )
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(5))
    for score in (True, False):
        res = has_parent_search(qdf, index, cp, score=score, k=15)
        got = {}
        for r in res.collect():
            got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.parent, r.score))
        checked = 0
        for _, q in queries_pdf.head(5).iterrows():
            pscores = dict(oracle.search(q.question, k=10**9))
            kids = []
            for d in oracle.doc_tokens:
                p = d - d % 10
                if p in pscores:
                    kids.append((d, p, pscores[p]))
            if score:
                kids.sort(key=lambda t: (-t[2], t[0]))
            else:
                kids.sort(key=lambda t: t[0])
                kids = [(d, p, 0.0) for d, p, _ in kids]
            expect = [(i + 1, d, p, s) for i, (d, p, s) in enumerate(kids[:15])]
            actual = sorted(got.get(int(q.qid), []))
            assert [(a[0], a[1], a[2]) for a in actual] == [
                (e[0], e[1], e[2]) for e in expect
            ], f"score={score} qid={q.qid}"
            for a, e in zip(actual, expect):
                assert a[3] == pytest.approx(e[3], rel=1e-12)
            checked += len(expect)
        assert checked >= 50


def test_has_child_inner_hits(spark, index, queries_pdf, oracle):
    """inner_hits: per ranked parent, the top-2 matching children equal
    brute force over the oracle's full scoring."""
    from dpr_spark.query.joinquery import has_child_inner_hits, has_child_search

    cp = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(7)).alias("parent")
    )
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(4))
    parents = has_child_search(qdf, index, cp, score_mode="max", k=3)
    inner = has_child_inner_hits(qdf, index, cp, parents, size=2)
    got = {}
    for r in inner.collect():
        got.setdefault((r.qid, r.parent), []).append((r.rank, r.doc_id, r.score))
    pk = {(r.qid, r.parent) for r in parents.collect()}
    assert set(got) == pk  # exactly the ranked parents get inner hits
    checked = 0
    for _, q in queries_pdf.head(4).iterrows():
        full = oracle.search(q.question, k=10**9)
        by_parent = {}
        for d, s in full:  # score desc, doc_id asc already
            by_parent.setdefault(d % 7, []).append((d, s))
        for (qid, p), hits in got.items():
            if qid != int(q.qid):
                continue
            expect = [(i + 1, d, s) for i, (d, s) in enumerate(by_parent[p][:2])]
            actual = sorted(hits)
            assert [(a[0], a[1]) for a in actual] == [(e[0], e[1]) for e in expect]
            for a, e in zip(actual, expect):
                assert a[2] == pytest.approx(e[2], rel=1e-12)
            checked += 1
    assert checked >= 8
