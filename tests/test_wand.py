"""Doc-partitioned searcher == exact scorer == oracle, bit-for-bit
(SURVEY.md §7 step 5: "verify == v1 exhaustive == oracle")."""

import pytest


@pytest.fixture(scope="module")
def segments(index):
    from dpr_spark.query.wand import build_impact_segments

    seg = build_impact_segments(index, num_buckets=8).persist()
    seg.count()
    return seg


def test_wand_equals_exact(spark, index, segments, queries_df):
    from dpr_spark.query.scorer import search
    from dpr_spark.query.wand import search_segments

    exact = {
        (r.qid, r.rank): (r.doc_id, r.score)
        for r in search(queries_df, index, k=20).collect()
    }
    wand = {
        (r.qid, r.rank): (r.doc_id, r.score)
        for r in search_segments(spark, queries_df, index, segments, k=20).collect()
    }
    assert set(exact) == set(wand)
    for key in exact:
        ed, es = exact[key]
        wd, ws = wand[key]
        assert ed == wd, f"{key}: doc {wd} != {ed}"
        assert ws == es, f"{key}: score bit-mismatch {ws} vs {es}"


def test_wand_matches_oracle(spark, index, segments, queries_pdf, oracle):
    from dpr_spark.query.wand import search_segments

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]])
    got = {}
    for r in search_segments(spark, qdf, index, segments, k=10).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for _, row in queries_pdf.iterrows():
        expect = oracle.search(row.question, 10)
        actual = sorted(got.get(row.qid, []))
        assert [(d) for _, d, _ in actual] == [d for d, _ in expect], row.question
        for (_, _, s), (_, es) in zip(actual, expect):
            assert s == pytest.approx(es, abs=1e-9)
