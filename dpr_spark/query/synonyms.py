"""Query-time synonym expansion — the Lucene `SynonymQuery` contract:
all terms of a synonym group score as ONE pseudo-term, with tf = the
SUM of the group members' tfs in the doc and df = the MAX docFreq over
the members (Lucene SynonymQuery javadoc: "scores documents as if the
terms were one term", blended max-docFreq statistics). This keeps a
rare synonym from inflating idf and double-counting a doc that
contains two spellings.

Scale shape: the synonyms table is vocabulary-sized and NEVER
broadcasts — the tiny query-term side is broadcast INTO its scan
(left_semi), same discipline as the dictionary (r4 ADVICE on
spell_suggest). Everything that reaches the postings probe is
query-sized: (qid, group, term_id) triples.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex


def expand_synonyms(
    spark: SparkSession,
    queries: DataFrame,
    synonyms: DataFrame,
    analyzer=None,
) -> DataFrame:
    """(qid, group, term) — one row per group member. `group` is the
    query's own token (each query token starts its own group; its
    synonyms join it). synonyms(term, syn) is DIRECTIONAL — symmetric
    closure is the table builder's job, not query time; with an
    analyzed index, the synonyms table must be in ANALYZED terms (the
    query token is analyzed before the synonym lookup, like Lucene's
    SynonymGraphFilter sitting after the stemmer)."""
    from dpr_spark.functions.analysis import analyze_query
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def qtok(s: pd.Series) -> pd.Series:
        return s.map(
            lambda q: analyze_query(q, analyzer) if q is not None else []
        )

    base = queries.select("qid", F.explode(qtok("question")).alias("group"))
    # query-sized broadcast into the vocab-sized synonyms scan
    syn = synonyms.join(
        F.broadcast(base.select(F.col("group").alias("term")).distinct()), "term"
    ).select(F.col("term").alias("group"), F.col("syn").alias("term"))
    members = base.withColumn("term", F.col("group")).unionByName(
        base.join(F.broadcast(syn), "group").select("qid", "group", "term")
    )
    return members.distinct()


def synonym_search(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    synonyms: DataFrame,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k where each query token and its synonyms score as one
    SynonymQuery group: per (qid, group, doc) tf_sum over members, idf
    from the group's MAX df; per-doc score = Σ over groups, folded in
    ascending group order (deterministic)."""
    members = expand_synonyms(spark, queries, synonyms, analyzer=index.analyzer)
    # group members are query-sized: broadcast INTO the dictionary scan
    resolved = index.dictionary.select("term", "term_id", "df").join(
        F.broadcast(members), "term"
    )
    # blended statistics: df_g = max df over resolved members
    gstats = resolved.groupBy("qid", "group").agg(F.max("df").alias("df_g"))
    n = float(index.stats.n_docs)
    gstats = gstats.withColumn(
        "idf_g",
        F.log(
            (F.lit(n) - F.col("df_g") + F.lit(0.5)) / (F.col("df_g") + F.lit(0.5))
            + F.lit(1.0)
        ),
    )
    probe = index.postings.join(
        F.broadcast(resolved.select("qid", "group", "term_id")), "term_id"
    )
    per_group = probe.groupBy("qid", "group", "doc_id").agg(
        F.sum("tf").alias("tf_g"), F.first("doclen").alias("doclen")
    )
    comp = (
        F.col("idf_g")
        * F.col("tf_g").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf_g").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(index.stats.avgdl))
        )
    )
    scored = (
        per_group.join(F.broadcast(gstats), ["qid", "group"])
        .select("qid", "doc_id", "group", comp.alias("c"))
        .groupBy("qid", "doc_id")
        # ascending-group fold: deterministic float order (same trick as
        # the segments searcher's ascending-term fold)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("group", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("score")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
