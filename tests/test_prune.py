"""Static index pruning (index/prune.py) vs a pure-Python twin: the
kept set is the rounded-impact top-N per term, surviving postings score
bit-identically (full-corpus stats), deep tail is gone."""

import pytest
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.functions.normalize import normalize_question

KEEP = 5


def _twin_pruned(oracle, keep_n):
    """term -> set(doc_id) surviving the rounded-impact top-N rule."""
    kept = {}
    for t, plist in oracle.postings.items():
        imps = []
        for d, tf in plist.items():
            dl = oracle.doclen[d]
            imp = (
                oracle.idf(t)
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / oracle.avgdl))
            )
            imps.append((round(imp, 6), d))
        imps.sort(key=lambda x: (-x[0], x[1]))
        kept[t] = {d for _, d in imps[:keep_n]}
    return kept


def _twin_search(oracle, kept, question, k=10):
    from dpr_spark.functions.tokenizer import tokenize

    terms = sorted(set(tokenize(normalize_question(question))))
    scores = {}
    for t in terms:
        if t not in oracle.postings:
            continue
        for d in oracle.postings[t]:
            if d in kept[t]:
                scores[d] = scores.get(d, 0.0) + oracle.score_one(t, d)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def pruned(spark, index):
    from dpr_spark.index.prune import prune_postings

    return prune_postings(index, keep_n=KEEP)


def test_lists_capped_and_stats_shared(index, pruned):
    over = (
        pruned.postings.groupBy("term_id").count().filter(F.col("count") > KEEP)
    ).count()
    assert over == 0
    # full-corpus statistics by contract: same dictionary object, same stats
    assert pruned.stats.avgdl == index.stats.avgdl
    assert pruned.dictionary is index.dictionary
    assert pruned.postings.count() < index.postings.count()


def test_pruned_search_matches_twin(spark, pruned, oracle, queries_pdf):
    from dpr_spark.query.scorer import search

    kept = _twin_pruned(oracle, KEEP)
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(12))
    rows = search(qdf, pruned, k=10).collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for v in got.values():
        v.sort()
    for _, qr in queries_pdf.head(12).iterrows():
        want = _twin_search(oracle, kept, qr["question"])
        g = got.get(int(qr["qid"]), [])
        assert [d for _, d, _ in g] == [d for d, _ in want], qr["question"]
        for (_, _, s), (_, ws) in zip(g, want):
            assert s == pytest.approx(ws, abs=1e-9)


def test_surviving_scores_unchanged(spark, index, pruned, queries_pdf):
    """A doc that appears in BOTH result lists has the same score only
    if every matched posting survived; a surviving SINGLE-term match
    must score identically to the unpruned index (scores of surviving
    postings are unchanged by contract)."""
    from dpr_spark.query.scorer import search

    # single-term queries: score = that term's impact, so any doc in the
    # pruned result must carry its exact unpruned score
    qdf = spark.createDataFrame(
        [(i, q.split()[0]) for i, (_, q) in enumerate(
            queries_pdf[["qid", "question"]].head(5).itertuples(index=False)
        )],
        "qid int, question string",
    )
    full = {(r.qid, r.doc_id): r.score for r in search(qdf, index, k=50).collect()}
    for r in search(qdf, pruned, k=50).collect():
        assert full[(r.qid, r.doc_id)] == r.score
