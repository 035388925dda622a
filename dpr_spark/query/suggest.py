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


def suggest_completions_fuzzy(
    spark: SparkSession,
    prefixes: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    n: int = 5,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    exact_first: bool = True,
) -> DataFrame:
    """Typo-tolerant autocomplete (Lucene suggest FuzzySuggester, its
    documented defaults): a vocabulary term completes a typed prefix
    when some prefix of the term, within one char of the typed length,
    is within `max_edits` edits of it — so "spqr" still completes to
    the "spark..." terms. Lucene's guards apply verbatim: the first
    `non_fuzzy_prefix` chars must match exactly, and typed prefixes
    shorter than `min_fuzzy_length` match exactly (no fuzz). Output
    (qid, rank, term, weight, dist): weight = df, dist = best
    qualifying prefix distance (0 = exact prefix).

    Ranking: exact-prefix completions first when `exact_first` (the
    Lucene exactFirst option), then weight DESC, term ASC.

    Scale shape: the tiny prefix set broadcasts into the ONE dictionary
    scan; the non-fuzzy head chars become a pushed StartsWith
    disjunction — exact pruning (never a semantic change), because the
    contract itself fixes those chars."""
    rows = [(qid, p.lower()) for qid, p in prefixes]
    if not rows or any(not p for _, p in rows):
        raise ValueError("empty prefix")
    if non_fuzzy_prefix < 1:
        raise ValueError("non_fuzzy_prefix must be >= 1 (the pushed-scan contract)")
    pdf = spark.createDataFrame(rows, "qid long, prefix string")
    dic = index.dictionary.select("term", F.col("df").alias("weight"))
    # pushed pruning — EXACT: fuzz never touches the first
    # non_fuzzy_prefix chars, and short prefixes match in full
    lits = sorted(
        {
            p if len(p) < min_fuzzy_length else p[:non_fuzzy_prefix]
            for _q, p in rows
        }
    )
    flt = None
    for h in lits:
        c = F.col("term").startswith(h)
        flt = c if flt is None else (flt | c)
    dic = dic.filter(flt)
    plen = F.length("prefix")
    fuzzy_ok = plen >= F.lit(min_fuzzy_length)

    def _d(delta):
        win = plen + F.lit(delta)
        return F.when(
            win >= F.lit(non_fuzzy_prefix),
            F.levenshtein(
                F.substring(F.col("term"), 1, win), F.col("prefix"), max_edits
            ),
        ).otherwise(F.lit(-1))

    dists = F.array(
        *[
            F.when(F.col(f"_d{i}") >= 0, F.col(f"_d{i}")).otherwise(F.lit(999))
            for i in range(3)
        ]
    )
    head_ok = F.substring(F.col("term"), 1, non_fuzzy_prefix) == F.substring(
        F.col("prefix"), 1, non_fuzzy_prefix
    )
    cand = (
        F.broadcast(pdf)
        .join(dic, F.length("term") >= plen - F.lit(max_edits))
        .withColumn("_exact", F.col("term").startswith(F.col("prefix")))
        .withColumn("_d0", _d(-1))
        .withColumn("_d1", _d(0))
        .withColumn("_d2", _d(1))
        .withColumn(
            "dist",
            F.when(F.col("_exact"), F.lit(0)).otherwise(F.array_min(dists)),
        )
        .filter(
            F.col("_exact")
            | (fuzzy_ok & head_ok & (F.col("dist") <= F.lit(max_edits)))
        )
        .drop("_d0", "_d1", "_d2", "_exact")
    )
    order = [F.desc("weight"), F.asc("term")]
    if exact_first:
        order = [F.asc((F.col("dist") > 0).cast("int"))] + order
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("qid", "rank", "term", "weight", "dist")
    )
