"""RM3 pseudo-relevance feedback — the BM25+RM3 query-expansion
baseline of the Lucene/Pyserini stack (DPR's README points at Pyserini
for its sparse numbers, `/root/reference/README.md:25-26`; Anserini's
BM25+RM3 is the standard strong sparse baseline on the same datasets).

Deterministic contract (oracle-checked in engine_queries.py and
tests/test_rm3.py):

1. first pass: plain BM25 top `fb_docs` per query (the engine's exact
   scorer semantics — set-of-terms queries, ties doc_id ASC);
2. relevance model (RM1 with BM25 document weights): for every term t
   in a feedback doc d,  w(t|q) += (tf(t,d) / doclen(d)) * s(q,d)
   where s is d's first-pass BM25 score; weights are normalized to sum
   1 per query and the top `fb_terms` kept (ties term ASC);
3. RM3 interpolation: final(t) = alpha * 1/|q_terms|   for original
   query terms, plus (1-alpha) * w'(t) for expansion terms (a term in
   both gets the sum);
4. second pass: weighted BM25 — score(d) = Σ_t final(t) * bm25(t, d),
   top-k, ties doc_id ASC.

Scale shape: the feedback set is queries × fb_docs rows — its doc ids
broadcast into the docs table (stored-fields access, same as
more-like-this; never a postings-by-doc scan), so only feedback docs
are tokenized. Both scoring passes probe the postings in place with
the (tiny) weighted-term side broadcast."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex

RM3_FB_DOCS = 10
RM3_FB_TERMS = 10
RM3_ALPHA = 0.5


def _bm25_component(avgdl: float, k1: float, b: float):
    return (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl))
        )
    )


def _weighted_topk(
    weights: DataFrame, index: InvertedIndex, k: int, k1: float, b: float
) -> DataFrame:
    """weights(qid, term_id, idf, w) -> weighted-BM25 top-k."""
    joined = index.postings.join(
        F.broadcast(weights.select("qid", "term_id", "idf", "w")), "term_id"
    )
    scored = joined.groupBy("qid", "doc_id").agg(
        F.sum(F.col("w") * _bm25_component(index.stats.avgdl, k1, b)).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def expansion_weights(
    first_pass: DataFrame,
    docs: DataFrame,
    index: InvertedIndex,
    fb_terms: int = RM3_FB_TERMS,
    lowercase_first: bool = False,
    selection_round: int = 0,
) -> DataFrame:
    """first_pass(qid, doc_id, score) -> (qid, term, w_norm): the RM1
    relevance model over the feedback docs, normalized, top fb_terms."""
    from dpr_spark.functions.analysis import tokenize_analyze_udf
    from dpr_spark.functions.tokenizer import tokenize_col

    # feedback docs tokenize through the INDEX's analysis chain — a
    # stemmed dictionary would silently drop raw expansion terms
    toks = (
        tokenize_col("text", lowercase_first=True)
        if lowercase_first
        else tokenize_analyze_udf(index.analyzer)(F.col("text"))
    )
    fb = F.broadcast(first_pass.select("qid", "doc_id", "score")).join(
        docs.select("doc_id", "text"), "doc_id"
    ).withColumn("_toks", toks)
    term_tf = (
        fb.select(
            "qid", "doc_id", "score",
            F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        .groupBy("qid", "doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.first("dl").alias("dl"),
            F.first("score").alias("s"),
        )
    )
    wsum = term_tf.groupBy("qid", "term").agg(
        F.sum(F.col("tf").cast("double") / F.col("dl") * F.col("s")).alias("w_raw")
    )
    total = wsum.groupBy("qid").agg(F.sum("w_raw").alias("w_total"))
    norm = wsum.join(F.broadcast(total), "qid").select(
        "qid", "term", (F.col("w_raw") / F.col("w_total")).alias("w_norm")
    )
    key = F.col("w_norm")
    if selection_round > 0:
        key = F.round(key, selection_round)
    w = Window.partitionBy("qid").orderBy(F.desc(key), F.asc("term"))
    return (
        norm.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= fb_terms)
        .select("qid", "term", "w_norm")
    )


def rm3_search(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    docs: DataFrame,
    k: int = DEFAULT_TOP_K,
    fb_docs: int = RM3_FB_DOCS,
    fb_terms: int = RM3_FB_TERMS,
    alpha: float = RM3_ALPHA,
    k1: float = BM25_K1,
    b: float = BM25_B,
    lowercase_first: bool = False,
    selection_round: int = 0,
    first_pass: Optional[DataFrame] = None,
) -> DataFrame:
    """queries(qid, question) -> (qid, rank, doc_id, score) under RM3.

    `first_pass` overrides the initial retrieval (e.g. a segments/
    blockmax run) — it must carry (qid, doc_id, score) rows."""
    from dpr_spark.query.scorer import query_terms, search

    if first_pass is None:
        first_pass = search(queries, index, k=fb_docs, k1=k1, b=b)

    exp = expansion_weights(
        first_pass, docs, index, fb_terms=fb_terms,
        lowercase_first=lowercase_first, selection_round=selection_round,
    )
    qt = query_terms(queries, analyzer=index.analyzer)  # (qid, term), set semantics
    n_q = qt.groupBy("qid").agg(F.count("*").alias("n_terms"))
    orig = qt.join(F.broadcast(n_q), "qid").select(
        "qid", "term", (F.lit(alpha) / F.col("n_terms").cast("double")).alias("w")
    )
    expw = exp.select("qid", "term", (F.lit(1.0 - alpha) * F.col("w_norm")).alias("w"))
    final = (
        orig.unionByName(expw)
        .groupBy("qid", "term")
        .agg(F.sum("w").alias("w"))
    )
    # weighted terms are query-sized: broadcast INTO the dictionary scan
    weights = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(final), "term"
    )
    return _weighted_topk(weights, index, k=k, k1=k1, b=b)
