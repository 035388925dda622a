"""Disjunction-max queries with tie-breaker and per-clause boosts —
the Lucene `DisjunctionMaxQuery` / `BoostQuery` surface.

Contract (documented, oracle-checked): a query is a list of boosted
clauses; each clause is a text string whose tokens score as an ordinary
BM25 disjunction (set semantics, like query_terms). Per document,

    clause_score(c, d) = boost_c · Σ_{t ∈ c ∩ d} bm25(t, d)
    score(q, d)        = max_c clause_score
                         + tie_breaker · (Σ_c clause_score − max_c)

tie_breaker = 0 is the pure "best field wins" dis-max; 1.0 degrades to
a boosted boolean sum — exactly Lucene's documented parameterization.
A document qualifies when it matches ≥ 1 clause term.

Scale shape: the clause rows are query-sized and broadcast INTO the
vocab-sized dictionary scan (repo-wide discipline); postings are probed
in place with the resolved (qid, clause_id, term_id, boost) triples
broadcast; the clause collapse and the max/sum fold both ride the same
per-(qid, doc) aggregation — one postings touch, no extra shuffle over
the BM25 plan.

`/root/reference`'s Lucene/Pyserini baseline exposes dis-max through
Anserini's dismax query generators; the reference itself has no sparse
query engine (training code), so the contract implemented here is
Lucene's public one.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.boolquery import _component

# (qid, [(clause_text, boost), ...])
DisMaxQuery = Tuple[int, Sequence[Tuple[str, float]]]


def _clause_rows(queries: Sequence[DisMaxQuery]):
    """-> [(qid, clause_id, boost, term)]; clause text normalizes like a
    question (P5, same as scorer.query_terms) and tokens are a set per
    clause; the same term may appear in two clauses (scored per clause,
    as Lucene scores each sub-query independently)."""
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    rows = []
    for qid, clauses in queries:
        for cid, (text, boost) in enumerate(clauses):
            for t in sorted(set(tokenize(normalize_question(text)))):
                rows.append((qid, cid, float(boost), t))
    return rows


def dismax_search(
    spark: SparkSession,
    queries: Sequence[DisMaxQuery],
    index: InvertedIndex,
    tie_breaker: float = 0.0,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """results(qid, rank, doc_id, score) under the dis-max contract."""
    rows = _clause_rows(queries)
    if not rows:
        raise ValueError("no tokenizable clauses")
    qdf = spark.createDataFrame(rows, "qid long, clause_id int, boost double, term string")
    qt = index.dictionary.select("term", "term_id", "idf").join(
        F.broadcast(qdf), "term"
    )
    joined = index.postings.join(
        F.broadcast(qt.select("qid", "clause_id", "boost", "term_id", "idf")),
        "term_id",
    )
    # ascending-term_id ordered float fold per clause (the scorer's
    # determinism device): a single-clause boost-1.0 dis-max is then
    # bit-identical to plain BM25, and the oracle's ascending-term
    # iteration rounds the same way
    tc = joined.select(
        "qid",
        "doc_id",
        "clause_id",
        "boost",
        F.struct(
            F.col("term_id"),
            _component(index.stats.avgdl, k1, b).alias("component"),
        ).alias("tc"),
    )
    clause = (
        tc.groupBy("qid", "doc_id", "clause_id", "boost")
        .agg(F.sort_array(F.collect_list("tc")).alias("tcs"))
        .select(
            "qid",
            "doc_id",
            (
                F.col("boost")
                * F.aggregate("tcs", F.lit(0.0), lambda a, x: a + x["component"])
            ).alias("bcs"),
        )
    )
    scored = clause.groupBy("qid", "doc_id").agg(
        (
            F.max("bcs")
            + F.lit(float(tie_breaker)) * (F.sum("bcs") - F.max("bcs"))
        ).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
