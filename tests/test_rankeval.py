"""eval/rankeval.py vs hand-computed metrics on a tiny fixed example
plus a property test against a pure-Python twin over the fixture
corpus rankings."""

import math

import pytest
from pyspark.sql import functions as F


def _py_rank_eval(topk, qrels, k=10, max_rel=3):
    """topk: {qid: [(rank, doc_id)]}; qrels: {(qid, doc): rel}."""
    out = {}
    for qid, rows in topk.items():
        rows = sorted(rows)[:k]
        rels = [qrels.get((qid, d), 0) for _r, d in rows]
        retrieved = len(rows)
        rel_hits = sum(1 for r in rels if r > 0)
        first = next((i + 1 for i, r in enumerate(rels) if r > 0), None)
        dcg = sum(
            (2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(rels)
        )
        judged = sorted(
            (rel, doc)
            for (q, doc), rel in qrels.items()
            if q == qid and rel > 0
        )
        ideal = sorted(
            ((-rel, doc) for rel, doc in judged)
        )[:k]
        idcg = sum(
            (2 ** (-nr) - 1) / math.log2(i + 2)
            for i, (nr, _d) in enumerate(ideal)
        )
        n_rel = len(judged)
        err, p = 0.0, 1.0
        for i, r in enumerate(rels):
            rp = (2 ** r - 1) / 2 ** max_rel
            err += p * rp / (i + 1)
            p *= 1.0 - rp
        out[qid] = dict(
            retrieved=retrieved,
            precision_k=rel_hits / retrieved if retrieved else 0.0,
            recall_k=rel_hits / n_rel if n_rel else 0.0,
            rr=1.0 / first if first else 0.0,
            dcg_k=dcg,
            ndcg_k=dcg / idcg if idcg > 0 else 0.0,
            err_k=err,
        )
    return out


def test_rank_eval_hand_example(spark):
    from dpr_spark.eval.rankeval import rank_eval

    # qid 0: ranks 1..3 with rel 2, 0, 1; judged rel>0: docs 10 (2),
    # 12 (1), 99 (3, NOT retrieved)
    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12),
         (1, 1, 20), (1, 2, 21)],          # qid 1: nothing relevant
        "qid long, rank int, doc_id long",
    )
    qrels = spark.createDataFrame(
        [(0, 10, 2), (0, 12, 1), (0, 99, 3), (1, 77, 2)],
        "qid long, doc_id long, rel int",
    )
    got = {r.qid: r.asDict() for r in rank_eval(results, qrels, k=10).collect()}

    g0 = got[0]
    assert g0["retrieved"] == 3
    assert g0["precision_k"] == pytest.approx(2 / 3)
    assert g0["recall_k"] == pytest.approx(2 / 3)
    assert g0["rr"] == pytest.approx(1.0)
    dcg = 3 / math.log2(2) + 0 / math.log2(3) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert g0["dcg_k"] == pytest.approx(dcg)
    assert g0["ndcg_k"] == pytest.approx(dcg / idcg)
    err = (3 / 8) / 1 + (1 - 3 / 8) * 0 / 2 + (1 - 3 / 8) * (1 / 8) / 3
    assert g0["err_k"] == pytest.approx(err)

    g1 = got[1]
    assert g1["precision_k"] == 0.0
    assert g1["recall_k"] == 0.0  # judged rel exists but none retrieved
    assert g1["rr"] == 0.0
    assert g1["ndcg_k"] == 0.0
    assert g1["err_k"] == 0.0


def test_rank_eval_vs_python_twin_on_corpus(spark, index, queries_pdf, oracle):
    from dpr_spark.eval.rankeval import rank_eval
    from dpr_spark.query.scorer import search

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    res = search(qdf, index, k=10)
    topk = {}
    for r in res.collect():
        topk.setdefault(r.qid, []).append((r.rank, r.doc_id))
    # graded judgments: rel = doc_id % 4 for every 7th doc
    qrels_rows = [
        (qid, d, int(d % 4))
        for qid in topk
        for d in oracle.doc_tokens
        if d % 7 == 0
    ]
    qrels = spark.createDataFrame(
        qrels_rows, "qid long, doc_id long, rel int"
    )
    expect = _py_rank_eval(
        topk, {(q, d): r for q, d, r in qrels_rows}, k=10
    )
    got = {r.qid: r.asDict() for r in rank_eval(res, qrels, k=10).collect()}
    assert set(got) == set(expect)
    for qid, e in expect.items():
        g = got[qid]
        for m, v in e.items():
            assert g[m] == pytest.approx(v, abs=1e-9), f"qid={qid} {m}"
