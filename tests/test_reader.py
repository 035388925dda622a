"""Reader-side operators: span selection vs the pure-Python twin of
get_best_spans (`reader_data.py:370-416`), EM-per-top-k, gold-passage
join, positive-ctx filter."""

import numpy as np
import pytest


def _mk_passages(spark, rows):
    return spark.createDataFrame(
        rows,
        "qid long, passage_idx int, relevance_score double, "
        "start_logits array<double>, end_logits array<double>, tokens array<string>",
    )


def test_best_spans_matches_python_twin(spark):
    from dpr_spark.eval.reader import best_spans, best_spans_py

    rng = np.random.default_rng(5)
    rows = []
    for qid in range(6):
        L = int(rng.integers(3, 20))
        sl = np.round(rng.normal(size=L), 3).tolist()
        el = np.round(rng.normal(size=L), 3).tolist()
        toks = [f"w{qid}_{i}" for i in range(L)]
        rows.append((qid, 0, 1.0, sl, el, toks))
    df = _mk_passages(spark, rows)
    for max_len, top in [(5, 1), (5, 3), (10, 2), (1, 4)]:
        got = {}
        for r in best_spans(df, max_answer_length=max_len, top_spans=top).collect():
            got.setdefault(r.qid, []).append(
                (r.span_rank, r.start_idx, r.end_idx, r.score, r.prediction)
            )
        for qid, _, _, sl, el, toks in rows:
            exp = best_spans_py(sl, el, max_len, top)
            act = sorted(got.get(qid, []))
            assert len(act) == len(exp), (max_len, top, qid)
            for (ar, asx, aex, asc, apred), (er, es, ee, esc) in zip(act, exp):
                assert (ar, asx, aex) == (er, es, ee), (max_len, top, qid)
                assert asc == pytest.approx(esc)
                assert apred == " ".join(toks[es : ee + 1])


def test_best_spans_overlap_semantics(spark):
    """Reference semantics: containment is suppressed, PARTIAL overlap is
    allowed (`reader_data.py:390-399`)."""
    from dpr_spark.eval.reader import best_spans_py

    # start/end crafted so best span = (1,2); (0,3) contains it -> skipped;
    # (2,3) partially overlaps -> kept.
    start = [1.0, 10.0, 5.0, 0.0]
    end = [0.0, 1.0, 10.0, 4.0]
    out = best_spans_py(start, end, max_answer_length=4, top_spans=2)
    spans = [(s, e) for _, s, e, _ in out]
    assert spans[0] == (1, 2)  # 10 + 10
    assert spans[1] == (2, 3)  # 5 + 4, overlaps (1,2) but no containment


def test_em_by_topk(spark):
    from dpr_spark.eval.reader import em_by_topk

    preds = spark.createDataFrame(
        [
            (0, 10, "The Answer!"),
            (0, 50, "wrong"),
            (1, 10, "an apple"),
            (1, 50, "apple"),
        ],
        "qid long, top_k int, prediction string",
    )
    gold = spark.createDataFrame(
        [(0, "the answer"), (1, "apple")], "qid long, answer string"
    )
    got = {r.top_k: r.em for r in em_by_topk(preds, gold).collect()}
    # k=10: q0 EM (punct/case normalized), q1 EM ("an" article dropped) -> 1.0
    # k=50: q0 miss, q1 EM -> 0.5
    assert got == {10: 1.0, 50: 0.5}


def test_gold_passage_join(spark):
    from dpr_spark.eval.reader import gold_passage_join

    samples = spark.createDataFrame(
        [
            (0, "who wrote it", "who wrote it ?"),
            (1, "missing q", "missing q toks"),
            (2, "only via tokens", "tokenized form"),
        ],
        "qid long, question string, question_tokens string",
    )
    gold = spark.createDataFrame(
        [
            ("who wrote it", "title0", "ctx0"),
            ("tokenized form", "title2", "ctx2"),
        ],
        "question string, title string, context string",
    )
    got = {r.qid: (r.gold_title, r.gold_context) for r in gold_passage_join(samples, gold).collect()}
    assert got[0] == ("title0", "ctx0")
    assert got[1] == (None, None)
    assert got[2] == ("title2", "ctx2")  # fallback key


def test_positive_ctx_filter(spark):
    from dpr_spark.eval.reader import positive_ctx_filter

    df = spark.createDataFrame(
        [(0, ["a"]), (1, []), (2, ["b", "c"])],
        "qid long, positive_ctxs array<string>",
    )
    assert sorted(r.qid for r in positive_ctx_filter(df).collect()) == [0, 2]


def test_chunked_accuracy(spark):
    from dpr_spark.eval.validation import chunked_accuracy

    # table 100 has the answer only in an UNRETRIEVED chunk (1002);
    # table 200 has it in the retrieved chunk.
    chunks = spark.createDataFrame(
        [
            (1001, 100, "nothing here"),
            (1002, 100, "the secret word"),
            (2001, 200, "another secret word here"),
            (3001, 300, "empty"),
        ],
        "chunk_id long, table_id long, text string",
    )
    results = spark.createDataFrame(
        [(0, 1, 1001), (0, 2, 3001), (1, 1, 3001), (1, 2, 2001)],
        "qid long, rank int, chunk_id long",
    )
    answers = spark.createDataFrame(
        [(0, ["secret word"]), (1, ["secret word"])],
        "qid long, answers array<string>",
    )
    rows = {r.k: r for r in chunked_accuracy(results, chunks, answers, 2, 2).collect()}
    # q0: chunk hits never (1001/3001 miss), table hit at rank 1 (table 100
    # contains it in chunk 1002). q1: chunk+table hit at rank 2.
    assert rows[1].chunk_hits == 0 and rows[2].chunk_hits == 1
    assert rows[1].table_hits == 1 and rows[2].table_hits == 2
    assert rows[2].table_accuracy == 1.0
