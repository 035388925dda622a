"""Match-set aggregations (query/aggs.py): match_count / stats_agg /
terms_agg vs a brute-force pure-Python twin over the fixture corpus."""

import pytest
from pyspark.sql import functions as F


def _oracle_matches(oracle, question):
    from dpr_spark.functions.analysis import analyze_query

    docs = set()
    for t in analyze_query(question, oracle.analyzer):
        docs.update(oracle.postings.get(t, ()))
    return docs


def test_match_count(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import match_count

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(12))
    got = {r.qid: r.total_hits for r in match_count(qdf, index).collect()}
    checked = 0
    for _, q in queries_pdf.head(12).iterrows():
        n = len(_oracle_matches(oracle, q.question))
        if n == 0:
            assert int(q.qid) not in got
        else:
            assert got[int(q.qid)] == n, f"qid={q.qid}"
            checked += 1
    assert checked >= 10


def test_stats_agg(spark, index, queries_pdf, oracle):
    from dpr_spark.query.aggs import stats_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(10))
    res = stats_agg(qdf, index, index.docstats, "doclen").collect()
    got = {r.qid: (r.n, r.min, r.max, r.sum, r.avg) for r in res}
    for _, q in queries_pdf.head(10).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        dls = [float(oracle.doclen[d]) for d in docs]
        n, mn, mx, sm, av = got[int(q.qid)]
        assert n == len(dls)
        assert mn == min(dls) and mx == max(dls)
        assert sm == pytest.approx(sum(dls), rel=1e-12)
        assert av == pytest.approx(sm / n, rel=1e-12)


def test_terms_agg_exact_topsize(spark, index, queries_pdf, oracle):
    """Buckets of doc_id % 5: counts and the (count desc, value asc)
    top-3 match the brute-force twin; also exercises the salted path."""
    from dpr_spark.query.aggs import terms_agg

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(10))
    vals = index.docstats.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(5)).alias("bucket")
    )
    for salt in (None, 4):
        res = terms_agg(qdf, index, vals, "bucket", size=3, salt_buckets=salt)
        got = {}
        for r in res.collect():
            got.setdefault(r.qid, []).append((r.rank, r.value, r["count"]))
        for _, q in queries_pdf.head(10).iterrows():
            docs = _oracle_matches(oracle, q.question)
            if not docs:
                continue
            counts = {}
            for d in docs:
                counts[d % 5] = counts.get(d % 5, 0) + 1
            expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
            expect = [(i + 1, v, c) for i, (v, c) in enumerate(expect)]
            assert sorted(got[int(q.qid)]) == expect, f"salt={salt} qid={q.qid}"


def test_significant_terms_matches_twin(spark, index, queries_pdf, oracle):
    """JLH scores and top-5 selection vs a brute-force twin."""
    from dpr_spark.query.aggs import significant_terms

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    got = {}
    for r in significant_terms(qdf, index, size=5, min_fg=2).collect():
        got.setdefault(r.qid, []).append(
            (r.rank, r.term, r.fg_count, r.bg_count, r.score)
        )
    N = float(oracle.N)
    checked = 0
    for _, q in queries_pdf.head(8).iterrows():
        docs = _oracle_matches(oracle, q.question)
        if not docs:
            continue
        fg = {}
        for d in docs:
            for t in set(oracle.doc_tokens[d]):
                fg[t] = fg.get(t, 0) + 1
        scored = []
        for t, c in fg.items():
            if c < 2:
                continue
            fgr = c / len(docs)
            bgr = oracle.df[t] / N
            scored.append((t, c, oracle.df[t], (fgr - bgr) * (fgr / bgr)))
        scored.sort(key=lambda x: (-x[3], x[0]))
        expect = [
            (i + 1, t, c, df, sc) for i, (t, c, df, sc) in enumerate(scored[:5])
        ]
        actual = sorted(got.get(int(q.qid), []))
        assert [(a[0], a[1], a[2], a[3]) for a in actual] == [
            (e[0], e[1], e[2], e[3]) for e in expect
        ], f"qid={q.qid}"
        for a, e in zip(actual, expect):
            assert a[4] == pytest.approx(e[4], rel=1e-12)
            checked += 1
    assert checked > 20
