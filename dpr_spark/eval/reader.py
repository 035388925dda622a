"""Reader-side operators: extractive span selection (K3), EM-per-top-k
rollup (A4) and the gold-passage map join (J4) — the answer-extraction
half of the reference pipeline (SURVEY.md §2.9).

- best_spans mirrors `get_best_spans`
  (`/root/reference/dpr/data/reader_data.py:370-416`): per passage, score
  every (start, end) span with end-start < max_answer_length as
  start_logit + end_logit, order by score (stable on generation order, as
  the reference's sorted() is), then greedily keep spans skipping any
  that CONTAIN or ARE CONTAINED BY an already-chosen span (partial
  overlaps are allowed — the reference's exact condition). The
  `_extend_span_to_full_words` BPE-subtoken step is the identity here
  because tokens are whole words.
- em_by_topk mirrors `train_extractive_reader.py:251-262`: per-question
  exact match of the predicted span at each top-docs threshold, then
  mean EM per threshold.
- gold_passage_join mirrors `_get_gold_ctx_dict` + its consumers
  (`reader_data.py:536-569`): a broadcast left join of samples onto the
  gold (question -> title/context) map, keyed by the question with a
  fallback to the tokenized question form.

Each passage row is independent, so best_spans is a narrow mapInPandas
(no shuffle); at 10^12 passages it scales with the scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dpr_spark.functions.normalize import normalize_answer_col

SPAN_SCHEMA = (
    "qid long, passage_idx int, span_rank int, start_idx int, end_idx int, "
    "score double, relevance_score double, prediction string"
)


def best_spans_py(
    start_logits,
    end_logits,
    max_answer_length: int,
    top_spans: int,
):
    """Pure-Python twin of the per-row kernel (the pytest oracle).
    Returns [(rank, start, end, score)]."""
    scores = []
    for i, s in enumerate(start_logits):
        for j, e in enumerate(end_logits[i : i + max_answer_length]):
            scores.append(((i, i + j), s + e))
    scores = sorted(scores, key=lambda x: x[1], reverse=True)
    chosen = []
    out = []
    for (si, ei), sc in scores:
        if any(si <= ps <= pe <= ei or ps <= si <= ei <= pe for ps, pe in chosen):
            continue
        chosen.append((si, ei))
        out.append((len(chosen), si, ei, sc))
        if len(chosen) == top_spans:
            break
    return out


def _spans_row(start, end, max_answer_length, top_spans):
    """Vectorized span scoring + greedy suppression for one passage."""
    ls, le = len(start), len(end)
    n = min(ls, le)
    if n == 0:
        return []
    # generation order: i asc, then j asc — band j-i in [0, max_len)
    ii, jj, sc = [], [], []
    for d in range(max_answer_length):
        m = n - d
        if m <= 0:
            break
        i = np.arange(m)
        ii.append(i)
        jj.append(i + d)
        sc.append(start[:m] + end[d:n])
    ii = np.concatenate(ii)
    jj = np.concatenate(jj)
    sc = np.concatenate(sc)
    # reference order: i asc then j asc within i; re-order the band layout
    gen = np.lexsort((jj, ii))
    ii, jj, sc = ii[gen], jj[gen], sc[gen]
    order = np.argsort(-sc, kind="stable")  # stable == reference sorted()
    chosen = []
    out = []
    for t in order:
        si, ei = int(ii[t]), int(jj[t])
        if any(si <= ps <= pe <= ei or ps <= si <= ei <= pe for ps, pe in chosen):
            continue
        chosen.append((si, ei))
        out.append((len(chosen), si, ei, float(sc[t])))
        if len(chosen) == top_spans:
            break
    return out


def best_spans(
    passages: DataFrame,
    max_answer_length: int = 10,
    top_spans: int = 1,
) -> DataFrame:
    """passages(qid, passage_idx, relevance_score, start_logits
    array<double>, end_logits array<double>, tokens array<string>) ->
    one row per selected span with its extracted text."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "qid", "passage_idx", "span_rank", "start_idx", "end_idx",
                "score", "relevance_score", "prediction",
            )}
            for r in pdf.itertuples():
                start = np.asarray(r.start_logits, dtype=np.float64)
                end = np.asarray(r.end_logits, dtype=np.float64)
                toks = list(r.tokens)
                for rank, si, ei, sc in _spans_row(
                    start, end, max_answer_length, top_spans
                ):
                    rows["qid"].append(r.qid)
                    rows["passage_idx"].append(r.passage_idx)
                    rows["span_rank"].append(rank)
                    rows["start_idx"].append(si)
                    rows["end_idx"].append(ei)
                    rows["score"].append(sc)
                    rows["relevance_score"].append(r.relevance_score)
                    rows["prediction"].append(" ".join(toks[si : ei + 1]))
            yield pd.DataFrame(rows)

    cols = ["qid", "passage_idx", "relevance_score", "start_logits", "end_logits", "tokens"]
    return passages.select(*cols).mapInPandas(run, SPAN_SCHEMA)


def em_by_topk(predictions: DataFrame, gold: DataFrame) -> DataFrame:
    """A4: predictions(qid, top_k, prediction) x gold(qid, answer) ->
    (top_k, em) where em = mean over questions of max-over-answers exact
    match after answer normalization (`train_extractive_reader.py:251-262`,
    normalization per `qa_validation.py:214-232`)."""
    em_row = (
        predictions.join(F.broadcast(gold), "qid")
        .withColumn(
            "hit",
            (normalize_answer_col("prediction") == normalize_answer_col("answer")).cast("int"),
        )
        .groupBy("qid", "top_k")
        .agg(F.max("hit").alias("em"))
    )
    return em_row.groupBy("top_k").agg(F.avg("em").alias("em")).orderBy("top_k")


def gold_passage_join(
    samples: DataFrame, gold: DataFrame, broadcast_gold: bool = True
) -> DataFrame:
    """J4: samples(qid, question[, question_tokens]) LEFT JOIN the gold
    map on question, falling back to the tokenized-question key
    (`reader_data.py:536-569`: NQ carries both forms). gold(question,
    title, context). Broadcast by default — the gold file is small; pass
    broadcast_gold=False for a sort-merge join at scale."""
    g = F.broadcast(gold) if broadcast_gold else gold
    g1 = g.select(
        F.col("question").alias("_gq"),
        F.col("title").alias("_gt1"),
        F.col("context").alias("_gc1"),
    )
    out = samples.join(g1, samples["question"] == g1["_gq"], "left").drop("_gq")
    if "question_tokens" in samples.columns:
        g2 = g.select(
            F.col("question").alias("_gq2"),
            F.col("title").alias("_gt2"),
            F.col("context").alias("_gc2"),
        )
        out = out.join(g2, out["question_tokens"] == g2["_gq2"], "left").drop("_gq2")
        return out.select(
            *[c for c in samples.columns],
            F.coalesce("_gt1", "_gt2").alias("gold_title"),
            F.coalesce("_gc1", "_gc2").alias("gold_context"),
        )
    return out.select(
        *[c for c in samples.columns],
        F.col("_gt1").alias("gold_title"),
        F.col("_gc1").alias("gold_context"),
    )


def positive_ctx_filter(samples: DataFrame, positives_col: str = "positive_ctxs") -> DataFrame:
    """P6: drop samples with no positive contexts
    (`biencoder_data.py:77-79`)."""
    return samples.filter(F.size(F.col(positives_col)) > 0)
