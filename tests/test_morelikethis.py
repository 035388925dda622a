"""More-like-this queries vs the pure-Python oracle twin
(Lucene MoreLikeThis parity; dpr_spark/query/morelikethis.py)."""

import pytest


@pytest.fixture(scope="module")
def docs_df(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    return spark.createDataFrame(pw[["doc_id", "text"]])


def _check_topk(rows, expect_by_qid, label):
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid in got:
        got[qid].sort()
    for qid, expect in expect_by_qid.items():
        actual = got.get(qid, [])
        assert len(actual) == len(expect), f"{label} qid={qid} count"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"{label} qid={qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9), (
                f"{label} qid={qid} rank={rank} doc={doc_id}"
            )


@pytest.mark.parametrize(
    "min_tf,min_df,max_terms", [(2, 3, 25), (1, 1, 10), (3, 5, 5)]
)
def test_mlt_vs_oracle(spark, index, docs_df, oracle, min_tf, min_df, max_terms):
    from dpr_spark.query.morelikethis import more_like_this

    seed_ids = sorted(oracle.doc_tokens)[::61][:6]  # 6 spread-out seeds
    seeds = spark.createDataFrame(
        list(enumerate(seed_ids)), "qid int, doc_id long"
    )
    expect = {
        qid: oracle.more_like_this(
            d, k=15, min_tf=min_tf, min_df=min_df, max_query_terms=max_terms
        )
        for qid, d in enumerate(seed_ids)
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = more_like_this(
        spark, seeds, docs_df, index, k=15,
        min_tf=min_tf, min_df=min_df, max_query_terms=max_terms,
    ).collect()
    _check_topk(rows, expect, f"mlt_{min_tf}_{min_df}_{max_terms}")


def test_mlt_excludes_seed(spark, index, docs_df, oracle):
    from dpr_spark.query.morelikethis import more_like_this

    seed = sorted(oracle.doc_tokens)[0]
    seeds = spark.createDataFrame([(0, seed)], "qid int, doc_id long")
    rows = more_like_this(
        spark, seeds, docs_df, index, k=1000, min_tf=1, min_df=1
    ).collect()
    assert rows
    assert all(r.doc_id != seed for r in rows)


@pytest.mark.parametrize("min_tf,min_df,max_terms", [(2, 3, 25), (1, 1, 10)])
def test_mlt_unlike_vs_oracle(
    spark, index, docs_df, oracle, min_tf, min_df, max_terms
):
    from dpr_spark.query.morelikethis import more_like_this

    all_ids = sorted(oracle.doc_tokens)
    seed_ids = all_ids[::61][:6]
    # per query: two unlike docs offset from the seed so their term sets
    # overlap the corpus vocabulary but differ per qid
    unlike_rows = []
    for qid, d in enumerate(seed_ids):
        unlike_rows.append((qid, all_ids[(d + 7) % len(all_ids)]))
        unlike_rows.append((qid, all_ids[(d + 13) % len(all_ids)]))
    seeds = spark.createDataFrame(
        list(enumerate(seed_ids)), "qid int, doc_id long"
    )
    unlike = spark.createDataFrame(unlike_rows, "qid int, doc_id long")
    expect = {
        qid: oracle.more_like_this(
            d, k=15, min_tf=min_tf, min_df=min_df,
            max_query_terms=max_terms,
            unlike_docs=[u for q, u in unlike_rows if q == qid],
        )
        for qid, d in enumerate(seed_ids)
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = more_like_this(
        spark, seeds, docs_df, index, k=15,
        min_tf=min_tf, min_df=min_df, max_query_terms=max_terms,
        unlike=unlike,
    ).collect()
    _check_topk(rows, expect, f"mlt_unlike_{min_tf}_{min_df}_{max_terms}")
    # unlike docs never appear in their query's results
    unl_by_qid = {}
    for q, u in unlike_rows:
        unl_by_qid.setdefault(q, set()).add(u)
    assert all(r.doc_id not in unl_by_qid.get(r.qid, ()) for r in rows)


def test_mlt_unlike_seed_terms_refill(spark, index, docs_df, oracle):
    """Skipping unlike terms refills the cap: with the seed itself as the
    unlike doc every candidate term is skipped and no results survive."""
    from dpr_spark.query.morelikethis import more_like_this

    seed = sorted(oracle.doc_tokens)[0]
    seeds = spark.createDataFrame([(0, seed)], "qid int, doc_id long")
    unlike = spark.createDataFrame([(0, seed)], "qid int, doc_id long")
    rows = more_like_this(
        spark, seeds, docs_df, index, k=10, min_tf=1, min_df=1,
        unlike=unlike,
    ).collect()
    assert rows == []
