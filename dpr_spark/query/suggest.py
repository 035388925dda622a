"""Completion suggester — the Lucene suggest module's
document-frequency-weighted term completions (TermFreqIteratorWrapper
over the index dictionary feeding an AnalyzingSuggester /
AnalyzingInfixSuggester, simplified to the dictionary contract):

    suggest("sp") -> the n highest-weight vocabulary terms starting
    with (or, infix mode, containing) "sp"

Weight = document frequency (Lucene's default when the suggester is fed
from index terms). Distinct from query/fuzzy.spell_suggest (did-you-
mean for misspelled OOV terms) and boolquery.expand_prefix (internal
query rewrite): this is the user-facing autocomplete surface, returning
the terms themselves with weights and ranks.

Scale shape: the prefix set is query-sized and broadcasts into the
vocab-sized dictionary scan; prefix mode pushes StringStartsWith to the
parquet scan (the FST-seek analog, same as expand_prefix); infix mode
honestly costs a vocab scan (Lucene pays an n-gram index for the same
contract — a declared trade). The per-qid top-n runs over only the
matching rows."""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark.index.build import InvertedIndex


def suggest_completions(
    spark: SparkSession,
    prefixes: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    n: int = 5,
    mode: str = "prefix",
) -> DataFrame:
    """(qid, rank, term, weight): top-n completions per prefix, weight
    (=df) desc then term asc. mode: "prefix" | "infix". An analyzed
    index suggests from its ANALYZED vocabulary (what's searchable)."""
    if mode not in ("prefix", "infix"):
        raise ValueError(f"unknown mode {mode!r}")
    rows = [(qid, p.lower()) for qid, p in prefixes]
    if not rows or any(not p for _, p in rows):
        raise ValueError("empty prefix")
    pdf = spark.createDataFrame(rows, "qid long, prefix string")
    cond = (
        F.col("term").startswith(F.col("prefix"))
        if mode == "prefix"
        else F.col("term").contains(F.col("prefix"))
    )
    dic = index.dictionary.select("term", F.col("df").alias("weight"))
    if mode == "prefix":
        # literal OR-of-StartsWith reaches the dictionary scan (the
        # FST-seek analog; infix has no pushable literal — full scan is
        # that mode's honest cost)
        flt = None
        for p in sorted({p for _q, p in rows}):
            c = F.col("term").startswith(p)
            flt = c if flt is None else (flt | c)
        dic = dic.filter(flt)
    cand = F.broadcast(pdf).join(dic, cond)
    w = Window.partitionBy("qid").orderBy(F.desc("weight"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("qid", "rank", "term", "weight")
    )


def context_term_weights(index: InvertedIndex, doc_values: DataFrame, ctx_col: str) -> DataFrame:
    """(term, ctx, weight) — per-context document frequency: the
    context-enabled suggester's index-time payload (ES stores context
    values with each suggestion entry; here one postings-sized groupBy
    computed once per taxonomy, reused across suggest calls)."""
    # vocab-sized dictionary broadcast: allowed here because this is an
    # INDEX-TIME payload computed once per taxonomy (the build-time
    # dictionary->postings exception, not a query-path broadcast)
    return (
        index.postings.join(
            F.broadcast(index.dictionary.select("term_id", "term")), "term_id"
        )
        .join(doc_values.select("doc_id", F.col(ctx_col).alias("ctx")), "doc_id")
        .groupBy("term", "ctx")
        .agg(F.count("*").alias("weight"))
    )


def suggest_completions_in_context(
    spark: SparkSession,
    prefixes: Sequence[Tuple[int, str, str]],
    ctx_weights: DataFrame,
    n: int = 5,
) -> DataFrame:
    """(qid, rank, term, weight): ES completion suggester with category
    CONTEXTS — each request carries a context value and only terms
    carried by documents of that context suggest, weighted by the
    in-context df. prefixes: [(qid, prefix, ctx)]."""
    rows = [(qid, p.lower(), c) for qid, p, c in prefixes]
    if not rows or any(not p for _, p, _ in rows):
        raise ValueError("empty prefix")
    pdf = spark.createDataFrame(rows, "qid long, prefix string, ctx string")
    # literal OR-of-StartsWith pushes into the weights scan like the
    # plain suggester's dictionary seek
    flt = None
    for p in sorted({p for _q, p, _c in rows}):
        c = F.col("term").startswith(p)
        flt = c if flt is None else (flt | c)
    cand = ctx_weights.filter(flt).join(
        F.broadcast(pdf),
        F.col("term").startswith(F.col("prefix"))
        & (ctx_weights["ctx"] == pdf["ctx"]),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("weight"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("qid", "rank", "term", "weight")
    )
