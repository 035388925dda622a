"""Lucene CommonTermsQuery: query terms split at a document-frequency
cutoff; only the LOW-frequency terms generate candidates, high-frequency
(stopword-class) terms contribute to scoring on those candidates but
never create matches of their own. A query with no low-frequency term
falls back to all-terms-generate (Lucene's documented degenerate case).

Contract (the twin and pytest enforce it):
  generators(q) = {t : df_t <= cutoff · N}, or ALL resolved terms when
                  that set is empty
  candidates(q) = docs containing >= 1 generator term
  score(q, d)   = full BM25 over EVERY query term present in d
                  (generator or not), for d in candidates(q)

Why this matters at 10^12 docs: a stopword's posting list is
corpus-sized. The standard scorer folds a per-document state for every
doc any query term touches — a "the big table" query funnels ~N docs
through the groupBy. Here the candidate set comes from the short
posting lists only; the stopword postings still stream through the
scan (their honest at-rest cost — our postings are term-keyed, so no
doc-pruned seek exists), but they hash-join against the
candidate-sized set BEFORE any per-document fold state is built, so
shuffle and fold stay candidate-sized, not corpus-sized.

The scoring fold is score_exact's ascending-term_id float fold — the
same expression, restricted to candidates — so rank identity against
the plain BM25 oracle on the candidate subset is bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.scorer import query_terms, top_k


def common_terms_search(
    queries: DataFrame,
    index: InvertedIndex,
    cutoff: float = 0.01,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(qid, rank, doc_id, score) under the CommonTermsQuery contract
    (`cutoff` = Lucene's maxTermFrequency fraction)."""
    n = float(index.stats.n_docs)
    avgdl = index.stats.avgdl
    qt = index.dictionary.select("term", "term_id", "idf", "df").join(
        F.broadcast(query_terms(queries, analyzer=index.analyzer)), "term"
    )
    qt = qt.withColumn(
        "is_low", F.col("df").cast("double") <= F.lit(cutoff) * F.lit(n)
    )
    n_low = qt.groupBy("qid").agg(
        F.sum(F.col("is_low").cast("int")).alias("n_low")
    )
    qt = qt.join(F.broadcast(n_low), "qid").withColumn(
        "gen", F.col("is_low") | (F.col("n_low") == 0)
    )
    # candidate probe: generator (short) posting lists only
    cand = (
        index.postings.join(
            F.broadcast(qt.filter("gen").select("qid", "term_id")), "term_id"
        )
        .select("qid", "doc_id")
        .distinct()
    )
    # scoring probe: every resolved term, pruned to candidates BEFORE
    # any per-document fold state exists
    joined = index.postings.join(
        F.broadcast(qt.select("qid", "term_id", "idf")), "term_id"
    ).join(cand, ["qid", "doc_id"])
    component = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl)
            )
        )
    )
    parts = joined.select(
        "qid",
        "doc_id",
        F.struct(F.col("term_id"), component.alias("component")).alias("tc"),
    )
    scored = (
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
    return top_k(scored, k)
