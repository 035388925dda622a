"""Score explanation — per-term BM25 breakdown for top-k results (the
Lucene `IndexSearcher.explain` / `Explanation` tree analog, flattened to
rows: one row per (query, doc, matched term) with every number that
entered the score).

Serving stacks expose this as "why did this doc rank here": relevance
debugging, feature logging for LTR training data, and regression triage
all read it. The reference's analog boundary is the retriever's scored
results dump (`/root/reference/dense_retriever.py:337-379` emits
per-result scores); Lucene exposes the full per-term tree — this is
that surface.

Plan shape: the top-k (qid, doc_id) pairs are QUERY-sized (k·|queries|)
and broadcast INTO the postings probe alongside the resolved query
terms — postings are touched once, nothing doc-sized shuffles, and the
probe is the same broadcast-join shape the scorer itself uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex, impact_expr
from dpr_spark.query.wand import query_term_pairs


def explain_pairs(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    pairs: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(qid, doc_id, term, tf, doclen, df, idf, component) for every
    query term matching each requested (qid, doc_id) pair; the pair's
    score is exactly sum(component) (same float formula as the engine,
    impact_expr). `pairs` must be query-sized (top-k output, a debug
    list) — it broadcasts into the postings probe."""
    qt = query_term_pairs(queries, index, with_idf=False).select("qid", "term_id")
    # the dictionary is scanned with the broadcast query-term ids (never
    # broadcast itself); the RESOLVED query-sized map broadcasts back
    terms_meta = index.dictionary.select("term_id", "term", "df", "idf").join(
        F.broadcast(qt.select("term_id").distinct()), "term_id"
    )
    comp = (
        index.postings.join(F.broadcast(qt), "term_id")
        .join(F.broadcast(pairs.select("qid", "doc_id")), ["qid", "doc_id"])
        .join(F.broadcast(terms_meta), "term_id")
    )
    return comp.select(
        "qid",
        "doc_id",
        "term",
        "tf",
        "doclen",
        "df",
        "idf",
        impact_expr(index.stats.avgdl, k1, b).alias("component"),
    )


def explain_topk(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Run the exact scorer, keep the top-k, and explain every kept
    (qid, doc_id): (qid, rank, doc_id, term, tf, doclen, df, idf,
    component, score). sum(component) over a (qid, doc_id) == score,
    bit for bit (asserted in tests/test_explain.py)."""
    from dpr_spark.query.scorer import search

    top = search(queries, index, k=k)
    ex = explain_pairs(spark, queries, index, top, k1=k1, b=b)
    return ex.join(F.broadcast(top), ["qid", "doc_id"]).select(
        "qid", "rank", "doc_id", "term", "tf", "doclen", "df", "idf",
        "component", "score",
    )
