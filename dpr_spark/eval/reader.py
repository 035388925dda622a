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


SPANS_TYPE = "array<struct<start:int,end:int>>"


def find_answer_spans_col(toks, ans_toks):
    """All (start, end) token spans where ans_toks occurs contiguously in
    toks — `_find_answer_positions` (`reader_data.py:519-527`) on word
    tokens instead of BERT ids (the repo-wide tokenizer-analog choice,
    same as best_spans). Pure Catalyst: a slice-compare at every start
    position; starts ascending, 0-based, end inclusive."""
    la, n = F.size(ans_toks), F.size(toks)
    starts = F.sequence(F.lit(0), n - la)
    hits = F.filter(starts, lambda i: F.slice(toks, i + 1, la) == ans_toks)
    spans = F.transform(
        hits,
        lambda i: F.struct(
            i.cast("int").alias("start"), (i + la - 1).cast("int").alias("end")
        ),
    )
    # the when() guards the descending-sequence case (la > n) and empty
    # answers; CaseWhen branches evaluate lazily, so no invalid slice runs
    return F.when((la > 0) & (la <= n), spans).otherwise(
        F.array().cast(SPANS_TYPE)
    )


def select_reader_passages(
    results: DataFrame,
    questions: DataFrame,
    gold: DataFrame = None,
    is_train: bool = True,
    max_positives: int = 20,
    max_negatives: int = 50,
    min_negatives: int = 150,
    max_retriever_passages: int = 200,
    eval_passages: int = 100,
    skip_no_positives: bool = True,
) -> DataFrame:
    """Reader TRAINING-sample construction — `_select_reader_passages` +
    the selection half of `preprocess_retriever_data`
    (`/root/reference/dpr/data/reader_data.py:234-521`), as one Catalyst
    plan (windows over qid; no Python in the path):

    - results(qid, rank, doc_id, title, tokens array<string>,
      has_answer boolean): the retriever output joined with passage
      tokens, rank ascending = retriever order.
    - questions(qid, answers array<string>); gold(qid, gold_title)
      optional — the reference keys its gold map by question string;
      here the key is qid, i.e. apply gold_passage_join (J4) first.

    Train semantics (defaults = DEFAULT_PREPROCESSING_CFG_TRAIN,
    `reader_data.py:220-229`): truncate to max_retriever_passages;
    positives = ctxs whose has_answer flag survives ANSWER-SPAN
    verification (some answer's token sequence occurs in the passage);
    prefer positives from the gold wiki page (title match, case-folded
    — `_is_from_gold_wiki_page`, `reader_data.py:572-576`), UNCAPPED,
    falling back to the first max_positives span-verified positives in
    retriever order; negatives = ctxs with has_answer false (the
    retriever flag — span-check failures do NOT become negatives),
    capped at min(max(10·n_pos, max_negatives), min_negatives);
    questions with no positives are dropped (skip_no_positves). Eval
    (`is_train=False`): no positives, first eval_passages ctxs as
    role='passage' (`DEFAULT_EVAL_PASSAGES`, `reader_data.py:232`).
    include_gold_passage (speech-QA only, default off upstream) is not
    implemented.

    -> (qid, role, sel_rank, rank, doc_id, title, spans) where spans are
    the verified answer spans in (answer index, start) order — the
    reference's flattened `answers_spans` before the question+title
    offset shift (that shift is tensorizer arithmetic, out of scope with
    T4)."""
    from pyspark.sql import Window

    r = results.filter(F.col("rank") <= max_retriever_passages)
    w = Window.partitionBy("qid").orderBy("rank")

    if not is_train:
        return (
            r.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= eval_passages)
            .select(
                "qid",
                F.lit("passage").alias("role"),
                F.col("_rn").alias("sel_rank"),
                "rank",
                "doc_id",
                "title",
                F.array().cast(SPANS_TYPE).alias("spans"),
            )
        )

    q = questions.select("qid", F.col("answers").alias("_answers"))
    r = r.join(F.broadcast(q), "qid")
    if gold is not None:
        r = r.join(F.broadcast(gold.select("qid", "gold_title")), "qid", "left")
    else:
        r = r.withColumn("gold_title", F.lit(None).cast("string"))

    from dpr_spark.functions.tokenizer import tokenize_col

    toks = F.col("tokens")
    spans = F.flatten(
        F.transform(
            F.col("_answers"), lambda a: find_answer_spans_col(toks, tokenize_col(a))
        )
    )
    wq = Window.partitionBy("qid")
    r2 = (
        r.withColumn(
            "spans",
            F.when(F.col("has_answer"), spans).otherwise(F.array().cast(SPANS_TYPE)),
        )
        .withColumn("is_pos_cand", F.col("has_answer") & (F.size("spans") > 0))
        .withColumn(
            "is_gold_pos",
            F.col("is_pos_cand")
            & F.col("gold_title").isNotNull()
            & (F.lower("title") == F.lower("gold_title")),
        )
        .withColumn("n_gold", F.sum(F.col("is_gold_pos").cast("int")).over(wq))
        .withColumn("cand_rank", F.sum(F.col("is_pos_cand").cast("int")).over(w))
        .withColumn(
            "is_positive",
            F.when(F.col("n_gold") > 0, F.col("is_gold_pos")).otherwise(
                F.col("is_pos_cand") & (F.col("cand_rank") <= max_positives)
            ),
        )
        .withColumn("n_pos", F.sum(F.col("is_positive").cast("int")).over(wq))
        .withColumn(
            "_neg_cap",
            F.least(
                F.greatest(F.lit(max_negatives), F.col("n_pos") * 10),
                F.lit(min_negatives),
            ),
        )
        .withColumn("neg_rank", F.sum((~F.col("has_answer")).cast("int")).over(w))
        .withColumn(
            "is_negative",
            ~F.col("has_answer") & (F.col("neg_rank") <= F.col("_neg_cap")),
        )
    )
    if skip_no_positives:
        r2 = r2.filter(F.col("n_pos") > 0)
    return (
        r2.withColumn(
            "role",
            F.when(F.col("is_positive"), F.lit("positive")).when(
                F.col("is_negative"), F.lit("negative")
            ),
        )
        .filter(F.col("role").isNotNull())
        .withColumn(
            "sel_rank",
            F.when(
                F.col("role") == "positive",
                F.sum(F.col("is_positive").cast("int")).over(w),
            ).otherwise(F.col("neg_rank")),
        )
        .select("qid", "role", "sel_rank", "rank", "doc_id", "title", "spans")
    )


def select_reader_passages_py(
    ctxs,
    answers,
    gold_title=None,
    is_train: bool = True,
    max_positives: int = 20,
    max_negatives: int = 50,
    min_negatives: int = 150,
    max_retriever_passages: int = 200,
    eval_passages: int = 100,
):
    """Pure-Python twin of select_reader_passages for ONE question — a
    direct transcription of `_select_reader_passages`
    (`reader_data.py:419-521`) used as the pytest oracle. ctxs are
    rank-ordered dicts {doc_id, title, tokens, has_answer}. Returns
    (positives, negatives) as [(doc_id, spans)] lists in selection
    order."""
    from dpr_spark.functions.tokenizer import tokenize

    ctxs = ctxs[:max_retriever_passages]
    ans_toks = [tokenize(a) for a in answers]
    if not is_train:
        return [], [(c["doc_id"], []) for c in ctxs[:eval_passages]]

    def spans(c):
        out = []
        for at in ans_toks:
            la = len(at)
            if la == 0:
                continue
            t = list(c["tokens"])
            for i in range(len(t) - la + 1):
                if t[i : i + la] == at:
                    out.append((i, i + la - 1))
        return out

    pos = [c for c in ctxs if c["has_answer"]]
    neg = [c for c in ctxs if not c["has_answer"]]
    gold_pos = (
        [c for c in pos if c["title"].lower() == gold_title.lower()]
        if gold_title
        else []
    )
    sel = [(c, spans(c)) for c in gold_pos]
    sel = [(c, s) for c, s in sel if s]
    if not sel:
        sel = [(c, spans(c)) for c in pos]
        sel = [(c, s) for c, s in sel if s][:max_positives]
    cap = min(max(10 * len(sel), max_negatives), min_negatives)
    return [(c["doc_id"], s) for c, s in sel], [(c["doc_id"], []) for c in neg[:cap]]
