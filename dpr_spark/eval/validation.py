"""Validation operators V1/V2/V4 + A1 and the results JSON sink S7 — the
full `dense_retriever.py` evaluation surface (SURVEY.md §2.9, §3.1 steps
6-7).

The reference fans has_answer out over a multiprocessing.Pool
(`/root/reference/dpr/data/qa_validation.py:63-68`); here it is one
Arrow-vectorized stage. The JSON sink mirrors save_results
(`dense_retriever.py:337-379`): per question a nested record
{question, answers[], ctxs:[{id, title, text, score, has_answer}]}.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dpr_spark.oracle.bm25 import has_answer as _has_answer_py


def has_answer_udf():
    """V1 (string match): NFD + SimpleTokenizer-uncased token-subsequence
    containment (`qa_validation.py:175-193`), vectorized over Arrow
    batches. Args: text column, answers array column."""

    @F.pandas_udf(T.BooleanType())
    def _ha(text: pd.Series, answers: pd.Series) -> pd.Series:
        return pd.Series(
            [
                bool(_has_answer_py(list(a), t)) if t is not None and a is not None else False
                for t, a in zip(text, answers)
            ]
        )

    return _ha


def regex_match_udf():
    """V2 (regex match): compile each answer as a regex with I+U+M, bad
    patterns -> False (`qa_validation.py:195-210`)."""
    import re as _re
    import unicodedata

    @F.pandas_udf(T.BooleanType())
    def _rm(text: pd.Series, answers: pd.Series) -> pd.Series:
        out = []
        for t, ans in zip(text, answers):
            hit = False
            if t is not None and ans is not None:
                nt = unicodedata.normalize("NFD", t)
                for a in ans:
                    try:
                        pat = _re.compile(
                            unicodedata.normalize("NFD", a),
                            flags=_re.IGNORECASE + _re.UNICODE + _re.MULTILINE,
                        )
                    except BaseException:
                        continue
                    if pat.search(nt) is not None:
                        hit = True
                        break
            out.append(hit)
        return pd.Series(out)

    return _rm


def annotate_hits(
    results: DataFrame, docs: DataFrame, answers: DataFrame, match_type: str = "string"
) -> DataFrame:
    """J1+V1/V2: results(qid, rank, doc_id, score) ⋈ docs(doc_id, text)
    ⋈ answers(qid, answers) -> + has_answer. The reference's Pool map
    (`qa_validation.py:63-68`) is just this join + UDF stage."""
    udf = has_answer_udf() if match_type == "string" else regex_match_udf()
    return (
        results.join(docs.select("doc_id", "text"), "doc_id")
        .join(answers.select("qid", "answers"), "qid")
        .withColumn("has_answer", udf(F.col("text"), F.col("answers")))
    )


def accuracy_at_k(hits: DataFrame, n_questions: int, max_k: int) -> DataFrame:
    """A1 cumulative first-hit histogram (`qa_validation.py:72-78`,
    `dense_retriever.py:301-315`): accuracy(k) = |{q: first hit rank <= k}|
    / n_questions. Returns (k, hits, accuracy) for k=1..max_k."""
    spark = hits.sparkSession
    first = hits.groupBy("qid").agg(
        F.min(F.when(F.col("has_answer"), F.col("rank"))).alias("first_hit")
    )
    ks = spark.range(1, max_k + 1).select(F.col("id").cast("int").alias("k"))
    return (
        ks.join(first, F.col("first_hit") <= F.col("k"), "left")
        .groupBy("k")
        .agg(F.count("qid").cast("long").alias("hits"))
        .select(
            "k",
            "hits",
            (F.col("hits") / F.lit(float(n_questions))).alias("accuracy"),
        )
        .orderBy("k")
    )


def chunked_accuracy(
    results: DataFrame,
    chunks: DataFrame,
    answers: DataFrame,
    n_questions: int,
    max_k: int,
    match_type: str = "string",
) -> DataFrame:
    """V6 two-level table-chunk hit accounting
    (`qa_validation.py:239-282` calculate_chunked_matches +
    `dense_retriever.py:439-458` validate_tables): per retrieved CHUNK,
    (a) chunk_hit = answer in the chunk text, (b) table_hit = answer in
    ANY chunk of the chunk's parent table; both rolled into cumulative
    first-hit histograms. results(qid, rank, chunk_id), chunks(chunk_id,
    table_id, text), answers(qid, answers).

    Scale shape: chunk hits evaluate only retrieved chunks; table hits
    evaluate only chunks of RETRIEVED tables (a semi-join fan-out, never
    the whole corpus)."""
    spark = results.sparkSession
    udf = has_answer_udf() if match_type == "string" else regex_match_udf()
    r = results.join(chunks.select("chunk_id", "table_id", "text"), "chunk_id").join(
        F.broadcast(answers.select("qid", "answers")), "qid"
    )
    r = r.withColumn("chunk_hit", udf(F.col("text"), F.col("answers"))).select(
        "qid", "rank", "table_id", "chunk_hit"
    )
    # parent-table verdict per (qid, table_id): any chunk of the table hits
    qt = r.select("qid", "table_id").distinct()
    tv = (
        qt.join(chunks.select("table_id", "text"), "table_id")
        .join(F.broadcast(answers.select("qid", "answers")), "qid")
        .withColumn("h", udf(F.col("text"), F.col("answers")))
        .groupBy("qid", "table_id")
        .agg(F.max("h").alias("table_hit"))
    )
    hits = r.join(tv, ["qid", "table_id"])
    first = hits.groupBy("qid").agg(
        F.min(F.when(F.col("chunk_hit"), F.col("rank"))).alias("first_chunk"),
        F.min(F.when(F.col("table_hit"), F.col("rank"))).alias("first_table"),
    )
    ks = spark.range(1, max_k + 1).select(F.col("id").cast("int").alias("k"))
    agg = (
        ks.join(F.broadcast(first), F.lit(True), "left")
        .groupBy("k")
        .agg(
            F.sum((F.col("first_chunk") <= F.col("k")).cast("long")).alias("chunk_hits"),
            F.sum((F.col("first_table") <= F.col("k")).cast("long")).alias("table_hits"),
        )
    )
    nq = float(n_questions)
    return agg.select(
        "k",
        F.coalesce("chunk_hits", F.lit(0)).alias("chunk_hits"),
        (F.coalesce("chunk_hits", F.lit(0)) / F.lit(nq)).alias("chunk_accuracy"),
        F.coalesce("table_hits", F.lit(0)).alias("table_hits"),
        (F.coalesce("table_hits", F.lit(0)) / F.lit(nq)).alias("table_accuracy"),
    ).orderBy("k")


def average_rank(scored: DataFrame, gold: DataFrame) -> DataFrame:
    """A5 average-rank validation (`train_dense_encoder.py:294-429`, esp.
    408-428): per question, the 0-based position of the gold passage in
    the score-descending order; output = 1 row (av_rank, n_questions).

    Computed as a COUNT join, not a sort: rank(gold) = #docs scoring
    strictly above gold (ties by doc_id asc) — no per-query window, no
    global sort; scales as one broadcast join + aggregation."""
    gscore = scored.join(
        F.broadcast(gold.select("qid", F.col("gold_doc_id").alias("doc_id"))),
        ["qid", "doc_id"],
    ).select("qid", F.col("score").alias("gscore"), F.col("doc_id").alias("gdoc"))
    ranks = (
        scored.join(F.broadcast(gscore), "qid")
        .withColumn(
            "above",
            (
                (F.col("score") > F.col("gscore"))
                | ((F.col("score") == F.col("gscore")) & (F.col("doc_id") < F.col("gdoc")))
            ).cast("long"),
        )
        .groupBy("qid")
        .agg(F.sum("above").alias("rank"))
    )
    return ranks.agg(
        F.avg("rank").alias("av_rank"), F.count("*").cast("long").alias("n_questions")
    )


def to_kilt_format(results: DataFrame, mapping: DataFrame, gold: DataFrame) -> DataFrame:
    """S11 KILT output conversion (`retriever_data.py:304-334`
    convert_to_kilt): per question {id, input, output:[{provenance:
    [{wikipedia_id, end_paragraph_id}]}]} with provenance in rank order
    via the broadcast doc mapping join. results(qid, rank, doc_id),
    mapping(doc_id, wikipedia_id, end_paragraph_id), gold(qid, kilt_id,
    input)."""
    prov = (
        results.join(
            F.broadcast(mapping.select("doc_id", "wikipedia_id", "end_paragraph_id")),
            "doc_id",
            "left",
        )
        .groupBy("qid")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("rank", "wikipedia_id", "end_paragraph_id")
                )
            ).alias("rp")
        )
        .select(
            "qid",
            F.transform(
                "rp",
                lambda x: F.struct(
                    x["wikipedia_id"].alias("wikipedia_id"),
                    x["end_paragraph_id"].alias("end_paragraph_id"),
                ),
            ).alias("provenance"),
        )
    )
    return gold.join(prov, "qid", "left").select(
        F.col("kilt_id").alias("id"),
        F.col("input"),
        F.array(
            F.struct(F.coalesce("provenance", F.array()).alias("provenance"))
        ).alias("output"),
    )


def results_json(
    results: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """S7 nested output (`dense_retriever.py:337-379`, README.md:216-233):
    one row per question with ctxs sorted by rank; write with
    .write.json(...). Scores stringified like the reference (`:353`)."""
    annotated = annotate_hits(results, docs, queries)
    ctx = F.struct(
        F.col("doc_id").cast("string").alias("id"),
        F.col("title"),
        F.col("text"),
        F.col("score").cast("string").alias("score"),
        F.col("has_answer"),
    )
    if "title" in annotated.columns:
        with_title = annotated  # preserve an existing title column
    elif "url" in docs.columns:
        with_title = annotated.join(
            docs.select("doc_id", F.col("url").alias("title")), "doc_id"
        )
    else:
        with_title = annotated.withColumn("title", F.lit(None).cast("string"))
    per_q = (
        with_title.withColumn("ctx", ctx)
        .groupBy("qid")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "ctx"))).alias("rc"))
        .select("qid", F.transform("rc", lambda x: x["ctx"]).alias("ctxs"))
    )
    return (
        queries.select("qid", "question", "answers")
        .join(per_q, "qid", "left")
        .select("qid", "question", "answers", F.coalesce("ctxs", F.array()).alias("ctxs"))
    )
