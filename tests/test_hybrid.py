"""Hybrid BM25+vector RRF fusion (query/hybrid.py) vs a pure-Python
twin over the oracle's BM25 ranks and numpy cosine ranks."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vecs(pages_pdf):
    """Deterministic synthetic embeddings: doc_id-seeded unit vectors."""
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    rng = np.random.default_rng(7)
    out = {}
    for d in pw.doc_id:
        v = rng.standard_normal(16)
        out[int(d)] = v / np.linalg.norm(v)
    return out


def _py_rrf(rankings, weights, k_rrf=60, k=10):
    scores = {}
    for (ranks, w) in zip(rankings, weights):
        for d, r in ranks.items():
            scores[d] = scores.get(d, 0.0)
    for d in scores:
        s = 0.0
        for (ranks, w) in zip(rankings, weights):  # src ascending
            if d in ranks:
                s = s + w / (k_rrf + float(ranks[d]))
        scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_rrf_fuse_matches_twin(spark):
    """Hand-built rankings fuse exactly like the python twin, including
    docs present in only one ranking and weighted sources."""
    from dpr_spark.query.hybrid import rrf_fuse

    r1 = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 20)],
        "qid int, rank int, doc_id long",
    )
    r2 = spark.createDataFrame(
        [(0, 1, 12), (0, 2, 13), (1, 1, 21), (1, 2, 20)],
        "qid int, rank int, doc_id long",
    )
    got = {}
    for r in rrf_fuse([r1, r2], k=10, k_rrf=60, weights=[1.0, 0.5]).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    exp0 = _py_rrf(
        [{10: 1, 11: 2, 12: 3}, {12: 1, 13: 2}], [1.0, 0.5]
    )
    actual0 = sorted(got[0])
    assert [a[1] for a in actual0] == [d for d, _ in exp0]
    for a, (_, es) in zip(actual0, exp0):
        assert a[2] == pytest.approx(es, rel=1e-15)
    # doc 20: rank1 in r1 (w=1) + rank2 in r2 (w=.5) beats 21 (rank1, w=.5)
    assert [a[1] for a in sorted(got[1])][0] == 20


def test_hybrid_search_end_to_end(spark, index, queries_pdf, oracle, vecs):
    """Full hybrid path vs python twin: oracle BM25 ranks + numpy cosine
    ranks fused with RRF."""
    from dpr_spark.query.hybrid import hybrid_search_rrf

    qs = queries_pdf.head(6)
    qdf = spark.createDataFrame(qs[["qid", "question"]])
    emb = spark.createDataFrame(
        [(d, [float(x) for x in v]) for d, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    # query vectors: the embedding of the qid-th doc (deterministic)
    doc_ids = sorted(vecs)
    qvecs = spark.createDataFrame(
        [
            (int(q.qid), [float(x) for x in vecs[doc_ids[int(q.qid) % len(doc_ids)]]])
            for _, q in qs.iterrows()
        ],
        "qid long, qv array<double>",
    )
    got = {}
    res = hybrid_search_rrf(qdf, index, emb, qvecs, k=10, depth=50)
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))

    checked = 0
    for _, q in qs.iterrows():
        qid = int(q.qid)
        text_ranks = {
            d: i + 1 for i, (d, _) in enumerate(oracle.search(q.question, k=50))
        }
        qv = vecs[doc_ids[qid % len(doc_ids)]]
        cos = []
        for d, v in vecs.items():
            c = float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            cos.append((d, c))
        cos.sort(key=lambda t: (-t[1], t[0]))
        vec_ranks = {d: i + 1 for i, (d, _) in enumerate(cos[:50])}
        exp = _py_rrf([text_ranks, vec_ranks], [1.0, 1.0], k=10)
        actual = sorted(got.get(qid, []))
        assert [a[1] for a in actual] == [d for d, _ in exp], f"qid={qid}"
        for a, (_, es) in zip(actual, exp):
            assert a[2] == pytest.approx(es, rel=1e-12)
        checked += len(exp)
    assert checked >= 50
