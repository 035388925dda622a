"""ES nested (block-join) query — query/nestedquery.py vs a pure-Python
twin: child-level BM25 over width-token paragraph chunks, parent score =
score_mode over matching children, inner_hits = best child."""

import math

import pytest
from pyspark.sql import functions as F

from dpr_spark.functions.normalize import normalize_question
from dpr_spark.oracle.bm25 import BM25Oracle

WIDTH = 8
K = 10


def _chunks(text: str, width: int = WIDTH):
    words = text.split(" ")
    n = max(1, math.ceil(len(words) / width))
    return [" ".join(words[i * width : (i + 1) * width]) for i in range(n)]


@pytest.fixture(scope="module")
def nested_fixture(pages_pdf):
    pdf = pages_pdf.reset_index(drop=True).copy()
    pdf["doc_id"] = pdf.index.astype("int64")
    child_key = {}  # (parent, ix) -> oracle child id
    o = BM25Oracle()
    cid = 0
    for _, r in pdf.iterrows():
        for ix, chunk in enumerate(_chunks(r["text"])):
            o.add(cid, chunk)
            child_key[cid] = (int(r["doc_id"]), ix)
            cid += 1
    o.build()
    return pdf[["doc_id", "text"]], o, child_key


def _twin(o: BM25Oracle, child_key, question: str, mode: str, k: int = K):
    ranked = o.search(normalize_question(question), k=o.N)
    per_parent = {}
    for cdoc, s in ranked:
        parent, ix = child_key[cdoc]
        per_parent.setdefault(parent, []).append((ix, s))
    out = []
    for parent, kids in per_parent.items():
        scores = [s for _, s in kids]
        score = {
            "max": max(scores),
            "sum": sum(sorted(scores)),
            "avg": sum(sorted(scores)) / len(scores),
        }[mode]
        best_ix, best_s = max(kids, key=lambda t: (t[1], -t[0]))
        out.append((parent, score, best_ix, best_s))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


@pytest.fixture(scope="module")
def engine_results(spark, nested_fixture, queries_pdf):
    from dpr_spark.query.nestedquery import nested_children, nested_search

    pdf, _, _ = nested_fixture
    docs = spark.createDataFrame(pdf)
    children = nested_children(docs, width=WIDTH)
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))

    def run(mode):
        rows = nested_search(spark, qdf, children, k=K, score_mode=mode).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        for v in by_q.values():
            v.sort(key=lambda r: r.rank)
        return by_q

    return run


def test_max_mode_matches_twin(engine_results, nested_fixture, queries_pdf):
    _, o, child_key = nested_fixture
    by_q = engine_results("max")
    for _, qr in queries_pdf.head(8).iterrows():
        want = _twin(o, child_key, qr["question"], "max")
        got = by_q.get(int(qr["qid"]), [])
        assert [r.doc_id for r in got] == [p for p, _, _, _ in want]
        for r, (p, s, bix, bs) in zip(got, want):
            assert r.score == pytest.approx(s, rel=1e-12)
            assert r.best_child_ix == bix
            assert r.best_child_score == pytest.approx(bs, rel=1e-12)


@pytest.mark.parametrize("mode", ["sum", "avg"])
def test_sum_avg_modes_match_twin(engine_results, nested_fixture, queries_pdf, mode):
    _, o, child_key = nested_fixture
    by_q = engine_results(mode)
    for _, qr in queries_pdf.head(8).iterrows():
        want = _twin(o, child_key, qr["question"], mode)
        got = by_q.get(int(qr["qid"]), [])
        assert [r.doc_id for r in got] == [p for p, _, _, _ in want]
        for r, (p, s, bix, bs) in zip(got, want):
            assert r.score == pytest.approx(s, rel=1e-9)
            assert r.best_child_ix == bix


def test_children_are_block_adjacent_ids(spark, nested_fixture):
    """The child id layout is the Lucene block contract: children of a
    parent occupy parent*2^CHILD_BITS + ix, so the parent join is pure
    integer arithmetic."""
    from dpr_spark.query.nestedquery import CHILD_BITS, nested_children

    pdf, _, _ = nested_fixture
    docs = spark.createDataFrame(pdf.head(5))
    rows = nested_children(docs, width=WIDTH).collect()
    for r in rows:
        cid = r.doc_id * (1 << CHILD_BITS) + r.child_ix
        assert (cid >> CHILD_BITS) == r.doc_id
        assert (cid % (1 << CHILD_BITS)) == r.child_ix
