"""The north_rule gate: Spark BM25 top-k == single-node oracle, docIDs AND
scores (FIXTURES.md §3 `results`)."""

import pytest


def _spark_results(index, queries_df, k):
    from dpr_spark.query.scorer import search

    rows = search(queries_df, index, k=k).collect()
    out = {}
    for r in rows:
        out.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid in out:
        out[qid].sort()
    return out


@pytest.mark.parametrize("k", [10, 100])
def test_rank_identity(index, queries_df, queries_pdf, oracle, k):
    got = _spark_results(index, queries_df, k)
    n_checked = 0
    for _, row in queries_pdf.iterrows():
        expect = oracle.search(row.question, k)
        actual = got.get(row.qid, [])
        assert len(actual) == len(expect), f"qid={row.qid} count"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, (
                f"qid={row.qid} rank={rank}: doc {doc_id} != oracle {edoc}"
            )
            assert score == pytest.approx(escore, abs=1e-9), (
                f"qid={row.qid} rank={rank} doc={doc_id}"
            )
            n_checked += 1
    assert n_checked > 100  # the query set genuinely exercises the index


def test_index_stats_match_oracle(index, oracle):
    assert index.stats.n_docs == oracle.N
    assert index.stats.avgdl == pytest.approx(oracle.avgdl, abs=1e-12)
    # dictionary df == oracle df for every term
    dic = {r.term: r.df for r in index.dictionary.collect()}
    assert dic == oracle.df


def test_docstats_match_oracle(index, oracle):
    rows = index.docstats.collect()
    assert len(rows) == oracle.N
    for r in rows:
        assert r.doclen == oracle.doclen[r.doc_id], r.doc_id
