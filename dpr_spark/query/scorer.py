"""Exact BM25 top-k query engine (SURVEY.md J6 + M1 + K1).

Replaces `dense_retriever.py`'s FAISS `search_knn`
(`/root/reference/dpr/indexer/faiss_indexers.py:107-112`, k=100 per
`conf/dense_retriever.yaml`) with a declarative DataFrame DAG:

    queries ──normalize(P5)──tokenize(T1)──explode──distinct──►
      broadcast INTO dictionary scan  [term -> term_id, idf; the
        vocab-sized dictionary never broadcasts or shuffles]
      ⋈ postings on term_id    [the J6 join; resolved terms broadcast,
        postings probed in place]
      ──per-(qid,doc) ordered float fold──window top-k──results

Rank identity details (must mirror oracle/bm25.py bit-for-bit):
- per-term component: idf * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
  all float64, same operation order;
- the per-document sum folds components in ascending `term` order via
  sort_array + aggregate — the same order the oracle uses, so float
  addition rounds identically;
- ties: score DESC, doc_id ASC; ranks 1-based; docs sharing no query
  term never appear.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas-UDF string annotations resolve here

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.functions.normalize import normalize_question_col
from dpr_spark.functions.tokenizer import tokenize_udf
from dpr_spark.index.build import InvertedIndex


def query_terms(queries: DataFrame, analyzer=None) -> DataFrame:
    """queries(qid, question) -> distinct (qid, term); duplicate query
    terms count once (set semantics, fixed by the oracle contract).
    analyzer: the index's analysis chain (functions/analysis.Analyzer) —
    query terms must pass through the same stop/stem chain the postings
    did (Lucene: search with the index's analyzer)."""
    if analyzer is not None:
        from pyspark.sql import types as T

        from dpr_spark.functions.analysis import analyze_query

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def qtok(s: pd.Series) -> pd.Series:
            return s.map(lambda q: analyze_query(q, analyzer) if q is not None else [])

        return queries.select("qid", F.explode(qtok("question")).alias("term"))
    return (
        queries.select(
            "qid",
            F.explode(
                tokenize_udf()(normalize_question_col(F.col("question")))
            ).alias("term"),
        )
        .distinct()
    )


def score_exact(
    queries: DataFrame,
    index: InvertedIndex,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(qid, doc_id, score) for every candidate doc (>=1 shared term)."""
    avgdl = index.stats.avgdl
    qt = query_terms(queries, analyzer=index.analyzer)
    # the query-term side is bytes; it broadcasts INTO the vocab-sized
    # dictionary scan (the dictionary is the big side at 10^12-doc scale
    # and never broadcasts on the query path)
    qt = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(qt), "term"
    )
    # queries are tiny (q * ~5 terms): broadcast them so the postings
    # table is probed in place — no 10^10-row shuffle on term_id
    joined = index.postings.join(F.broadcast(qt), "term_id")
    component = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl))
        )
    )
    # ordered float fold keyed by term_id: term_id is the DENSE RANK of
    # term, so ascending term_id == ascending term — the oracle's fold
    # order bit-for-bit — while the shuffled struct carries an 8-byte long
    # instead of the term string and sort_array compares longs
    parts = joined.select(
        "qid", "doc_id", F.struct(F.col("term_id"), component.alias("component")).alias("tc")
    )
    return (
        parts.groupBy("qid", "doc_id")
        .agg(F.sort_array(F.collect_list("tc")).alias("tcs"))
        .select(
            "qid",
            "doc_id",
            F.aggregate(
                "tcs", F.lit(0.0), lambda acc, x: acc + x["component"]
            ).alias("score"),
        )
    )


def top_k(scored: DataFrame, k: int = DEFAULT_TOP_K) -> DataFrame:
    """K1: results(qid, rank, doc_id, score). Window row_number is exact
    and fine up to ~10^5 candidates/query; the WAND engine (query/wand.py)
    is the scale path that avoids materializing all candidates."""
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def search(
    queries: DataFrame,
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    deletes: DataFrame = None,
) -> DataFrame:
    """deletes: optional tombstone set (doc_id) — excluded BEFORE the
    top-k (Lucene liveDocs); term statistics stay stale until
    index.deletes.purge_deletes, Lucene's documented trade."""
    scored = score_exact(queries, index, k1=k1, b=b)
    if deletes is not None:
        from dpr_spark.index.deletes import exclude_deleted

        scored = exclude_deleted(scored, deletes)
    return top_k(scored, k)


def attach_passages(results: DataFrame, index: InvertedIndex, docs: DataFrame) -> DataFrame:
    """J1: results -> passage text lookup (`dense_retriever.py:352`,
    `:461-469`). Broadcast only when the doc side is small; at 10^12 docs
    this is a sort-merge join on doc_id (results side is tiny * k)."""
    return results.join(docs.select("doc_id", "url", "text"), "doc_id", "inner")
