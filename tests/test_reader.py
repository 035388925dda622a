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


def _mk_ctxs(spec):
    """spec: list of (doc_id, title, text, has_answer)."""
    from dpr_spark.functions.tokenizer import tokenize

    return [
        {"doc_id": d, "title": t, "tokens": tokenize(x), "has_answer": h}
        for d, t, x, h in spec
    ]


def test_select_reader_passages_matches_python_twin(spark):
    """Spark selection == the reference-transcribed python twin on a
    fixture covering: gold-page branch, fallback branch with
    max_positives cap, span-verify failure (has_answer flag true but no
    token match -> neither positive nor negative), negative cap
    arithmetic, and the skip-no-positives drop."""
    from dpr_spark.eval.reader import (
        select_reader_passages,
        select_reader_passages_py,
    )
    from dpr_spark.functions.tokenizer import tokenize

    answers = {
        0: ["alpha beta", "gamma"],
        1: ["delta One"],
        2: ["zz unfindable"],
    }
    gold_titles = {0: "Gold Page", 1: None, 2: None}
    per_q = {
        0: _mk_ctxs(
            [
                (10, "gold page", "xx alpha beta yy", True),   # gold positive
                (11, "other", "alpha beta gamma", True),        # non-gold positive
                (12, "gold page", "nothing here", False),       # negative
                (13, "gold page", "claims answer but empty", True),  # span-verify fail
                (14, "misc", "plain negative", False),
            ]
        ),
        # no gold map entry -> fallback branch; max_positives=2 caps it
        1: _mk_ctxs(
            [
                (20, "a", "delta one here", True),
                (21, "b", "nope", False),
                (22, "c", "delta one twice delta one", True),
                (23, "d", "delta one third", True),   # beyond max_positives=2
                (24, "e", "negative two", False),
                (25, "f", "negative three", False),
                (26, "g", "negative four", False),
            ]
        ),
        # all positives fail span verification -> question dropped
        2: _mk_ctxs(
            [
                (30, "x", "claims answer", True),
                (31, "y", "negative", False),
            ]
        ),
    }

    rows = []
    for qid, ctxs in per_q.items():
        for rank, c in enumerate(ctxs, start=1):
            rows.append((qid, rank, c["doc_id"], c["title"], c["tokens"], c["has_answer"]))
    results = spark.createDataFrame(
        rows, "qid long, rank int, doc_id long, title string, tokens array<string>, has_answer boolean"
    )
    questions = spark.createDataFrame(
        [(q, a) for q, a in answers.items()], "qid long, answers array<string>"
    )
    gold = spark.createDataFrame(
        [(q, t) for q, t in gold_titles.items() if t], "qid long, gold_title string"
    )

    got = {}
    out = select_reader_passages(
        results, questions, gold, max_positives=2, max_negatives=2, min_negatives=3
    )
    for r in out.collect():
        got.setdefault(r.qid, {"positive": [], "negative": []})[r.role].append(
            (r.sel_rank, r.doc_id, [(s.start, s.end) for s in r.spans])
        )

    for qid, ctxs in per_q.items():
        pos, neg = select_reader_passages_py(
            ctxs, answers[qid], gold_titles[qid],
            max_positives=2, max_negatives=2, min_negatives=3,
        )
        if not pos:
            assert qid not in got, (qid, got.get(qid))
            continue
        g = got[qid]
        assert sorted(g["positive"]) == [
            (i + 1, d, list(s)) for i, (d, s) in enumerate(pos)
        ], (qid, g["positive"], pos)
        assert sorted(g["negative"]) == [
            (i + 1, d, []) for i, (d, _) in enumerate(neg)
        ], (qid, g["negative"], neg)

    # negative-cap arithmetic: qid 1 has 1 positive in python twin? no — 2
    # positives (cap) -> neg cap = min(max(20, 2), 3) = 3 negatives of 4
    assert len(got[1]["negative"]) == 3

    # eval mode: first eval_passages ctxs as role=passage, no span work
    ev = select_reader_passages(results, questions, gold, is_train=False, eval_passages=3)
    per = {}
    for r in ev.collect():
        assert r.role == "passage" and list(r.spans) == []
        per.setdefault(r.qid, []).append((r.sel_rank, r.doc_id))
    for qid, ctxs in per_q.items():
        _, passages = select_reader_passages_py(
            ctxs, answers[qid], is_train=False, eval_passages=3
        )
        assert sorted(per[qid]) == [(i + 1, d) for i, (d, _) in enumerate(passages)]
