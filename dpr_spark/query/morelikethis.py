"""More-like-this queries: find documents similar to a seed document —
the Lucene `MoreLikeThis` surface of the fulltext tier (related-page /
near-duplicate-discovery queries over a crawl corpus).

Deterministic contract (oracle-checked in engine_queries.py and
tests/test_morelikethis.py):

- interesting terms come from the SEED DOC'S TEXT (the stored-fields /
  term-vector access path — reading a doc's term vector back out of the
  inverted index would scan term-keyed postings by doc_id, the wrong
  access pattern at scale);
- a term qualifies when seed tf >= min_tf AND corpus df >= min_df
  (Lucene MoreLikeThis minTermFreq/minDocFreq), ranked by
  (tf * idf DESC, term ASC) and capped at max_query_terms (Lucene
  maxQueryTerms, ties made deterministic); idf is the engine's BM25 idf
  (one idf definition everywhere, unlike Lucene's classic-idf selector);
- the selected terms run as a plain BM25 disjunction (set semantics),
  and the seed document itself is excluded from its results;
- `unlike` (ES more_like_this `unlike` / Lucene MLT skip-terms): per
  query, documents whose terms should NOT drive similarity — any term
  that appears in one of the query's unlike docs is removed from the
  candidate set BEFORE ranking/capping (so the cap refills with the
  next-best liked terms, matching Lucene's selection order), and the
  unlike docs join the seeds in the result exclusion (ES `include`
  defaults to false for all input documents).

Scale shape: seeds are few — the seeds→docs join broadcasts the seed
ids, so only seed docs are tokenized; term selection is a seed-sized
aggregate; scoring probes the postings in place with the selected-term
side broadcast (bounded by seeds × max_query_terms). `unlike` docs are
seed-shaped: broadcast ids, tokenize only those rows, anti-join a
query-sized term set."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex

MLT_MIN_TF = 2
MLT_MIN_DF = 3
MLT_MAX_TERMS = 25


def interesting_terms(
    seeds: DataFrame,
    docs: DataFrame,
    index: InvertedIndex,
    min_tf: int = MLT_MIN_TF,
    min_df: int = MLT_MIN_DF,
    max_query_terms: int = MLT_MAX_TERMS,
    lowercase_first: bool = False,
    selection_round: int = 0,
    unlike: Optional[DataFrame] = None,
) -> DataFrame:
    """seeds(qid, doc_id) ⋈ docs(doc_id, text) -> (qid, term, term_id,
    idf): the seed's qualifying terms, ranked (tf*idf DESC, term ASC),
    top max_query_terms. `selection_round` > 0 ranks on the rounded
    tf*idf (cross-engine oracle runs: JVM and DuckDB ln() may differ in
    the last ulp; the pure-Python twin uses the raw key).
    `unlike(qid, doc_id)`: terms occurring in a query's unlike docs are
    dropped before ranking (the cap refills with next-best terms)."""
    from dpr_spark.functions.analysis import tokenize_analyze_udf
    from dpr_spark.functions.tokenizer import tokenize_col

    seed_docs = F.broadcast(seeds.select("qid", "doc_id")).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    # reference-faithful Arrow tokenizer by default (matches the index
    # build — including the index's analysis chain, so seed terms land
    # in the stemmed vocabulary); lowercase_first selects the DuckDB-
    # mirrorable Catalyst spelling for oracle-checked entries (ASCII)
    toks = (
        tokenize_col("text", lowercase_first=True)
        if lowercase_first
        else tokenize_analyze_udf(index.analyzer)(F.col("text"))
    )
    tf = (
        seed_docs.select("qid", F.explode(toks).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    # seed term vectors are query-sized: broadcast INTO the dictionary
    # scan (df >= min_df stays a pushable scan filter on the big side)
    cand = (
        index.dictionary.select("term", "term_id", "df", "idf")
        .filter(F.col("df") >= min_df)
        .join(F.broadcast(tf), "term")
    )
    if unlike is not None:
        # same analyzer as the liked side; unlike docs are seed-shaped,
        # so the skip-term set is query-sized and broadcasts
        skip = (
            F.broadcast(unlike.select("qid", "doc_id"))
            .join(docs.select("doc_id", "text"), "doc_id")
            .select("qid", F.explode(toks).alias("term"))
            .distinct()
        )
        cand = cand.join(F.broadcast(skip), ["qid", "term"], "left_anti")
    key = F.col("tf").cast("double") * F.col("idf")
    if selection_round > 0:
        key = F.round(key, selection_round)
    w = Window.partitionBy("qid").orderBy(F.desc(key), F.asc("term"))
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_query_terms)
        .select("qid", "term", "term_id", "idf")
    )


def more_like_this(
    spark: SparkSession,
    seeds: DataFrame,
    docs: DataFrame,
    index: InvertedIndex,
    k: int = DEFAULT_TOP_K,
    min_tf: int = MLT_MIN_TF,
    min_df: int = MLT_MIN_DF,
    max_query_terms: int = MLT_MAX_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    lowercase_first: bool = False,
    selection_round: int = 0,
    unlike: Optional[DataFrame] = None,
) -> DataFrame:
    """seeds(qid, doc_id) -> (qid, rank, doc_id, score): BM25 top-k of
    the seed's interesting-term disjunction, seed doc excluded. With
    `unlike(qid, doc_id)`, unlike-doc terms are skipped in selection
    and unlike docs are excluded from the results (ES include=false
    applies to every input document)."""
    qt = interesting_terms(
        seeds, docs, index, min_tf=min_tf, min_df=min_df,
        max_query_terms=max_query_terms, lowercase_first=lowercase_first,
        selection_round=selection_round, unlike=unlike,
    )
    joined = index.postings.join(
        F.broadcast(qt.select("qid", "term_id", "idf")), "term_id"
    )
    component = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("doclen").cast("double") / F.lit(index.stats.avgdl)
            )
        )
    )
    scored = joined.groupBy("qid", "doc_id").agg(F.sum(component).alias("score"))
    excluded = seeds.select("qid", "doc_id")
    if unlike is not None:
        excluded = excluded.unionByName(unlike.select("qid", "doc_id"))
    scored = scored.join(F.broadcast(excluded), ["qid", "doc_id"], "left_anti")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
