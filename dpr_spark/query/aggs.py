"""Aggregations over a query's FULL match set — the Elasticsearch
search-aggregation surface (`aggs`) for our match semantics:

- match_count:  total_hits per query (ES track_total_hits=true; Lucene
  TotalHitCountCollector) — how many docs contain ≥1 query term.
- stats_agg:    count/min/max/sum/avg of a numeric doc value over the
  matches (ES `stats` aggregation).
- terms_agg:    top-`size` (value, count) buckets of a categorical doc
  value over the matches (ES `terms` aggregation), count desc / value
  asc, EXACT (no shard-approximation error — Spark's shuffle gives us
  the global counts ES approximates with shard_size).

This differs from query/facets.py, which counts buckets over the TOP-K
results (the UI facet); these run over every matched document.

Scale shape: query terms resolve once (broadcast into the dictionary
scan), postings are probed in place, and the only doc-sized motion is
the distinct (qid, doc_id) match collapse — map-side partial
aggregation bounds the shuffle. Doc values join candidate rows only
(narrow SMJ). terms_agg's final per-qid top-size runs over already-
aggregated (qid, value, count) rows via the exact two-level salted
top-N (extras/domains.cap_per_key), so a query matching 10^8 docs with
10^6 distinct values cannot funnel one window task.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark.extras.domains import cap_per_key
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.wand import query_term_pairs


def _matches(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """distinct (qid, doc_id) docs containing ≥1 query term."""
    qt = query_term_pairs(queries, index, with_idf=False)
    return (
        index.postings.join(F.broadcast(qt), "term_id")
        .select("qid", "doc_id")
        .distinct()
    )


def match_count(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(qid, total_hits) — ES track_total_hits / Lucene
    TotalHitCountCollector. Queries with zero matches are absent (the
    caller left-joins its query table if it needs explicit zeros)."""
    return _matches(queries, index).groupBy("qid").agg(
        F.count("*").alias("total_hits")
    )


def stats_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
) -> DataFrame:
    """(qid, n, min, max, sum, avg) of `field` over the match set."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    c = F.col(field).cast("double")
    return m.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
    )


def terms_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    size: int = 10,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """(qid, value, count, rank): top-`size` buckets of `field` over the
    match set, count desc then value asc. Exact — the bucket counts are
    globally aggregated before the per-qid top-size."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", F.col(field).alias("value")), "doc_id"
    )
    counts = m.groupBy("qid", "value").agg(F.count("*").alias("count"))
    order = [F.col("count").desc(), F.col("value").asc()]
    top = cap_per_key(counts, ["qid"], order, size, salt_buckets=salt_buckets)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "value", "count", "rank"
    )


def significant_terms(
    queries: DataFrame,
    index: InvertedIndex,
    size: int = 10,
    min_fg: int = 2,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """(qid, term, fg_count, bg_count, score, rank): terms UNUSUALLY
    frequent in a query's match set vs the whole corpus — the ES
    `significant_terms` aggregation with its default JLH heuristic:

        score = (fg% − bg%) · (fg% / bg%)
        fg% = fg_count / n_matches,  bg% = df / N

    fg_count counts MATCHING docs containing the term (document
    frequency within the foreground, like ES); min_fg prunes noise.
    Exact — no shard approximation and no sampling (ES's sampler
    aggregation is the knob it needs because a node recomputes term
    vectors; here the postings table already holds the counts).

    Scale shape: the one genuinely large step is matches ⋈ postings on
    doc_id (every matched doc contributes its term list — the same
    information ES pulls from term vectors); it is a co-partitioned
    SMJ whose output collapses immediately via a map-side-combined
    count per (qid, term_id). Background df comes from the dictionary
    (vocab-sized, never broadcast or shuffled — fg is the small side
    joined into it). Per-qid top-size rides the exact salted top-N.
    Score arithmetic is a single closed-form expression over integer
    counts — no float fold, so rank order is engine-independent."""
    m = _matches(queries, index)
    n_match = m.groupBy("qid").agg(F.count("*").alias("n_matches"))
    fg = (
        m.join(index.postings.select("doc_id", "term_id"), "doc_id")
        .groupBy("qid", "term_id")
        .agg(F.count("*").alias("fg_count"))
        .filter(F.col("fg_count") >= min_fg)
    )
    n_docs = float(index.stats.n_docs)
    scored = (
        fg.join(index.dictionary.select("term_id", "term", "df"), "term_id")
        .join(F.broadcast(n_match), "qid")
        .withColumn("_fgr", F.col("fg_count") / F.col("n_matches"))
        .withColumn("_bgr", F.col("df").cast("double") / F.lit(n_docs))
        .withColumn(
            "score",
            (F.col("_fgr") - F.col("_bgr")) * (F.col("_fgr") / F.col("_bgr")),
        )
        .select("qid", "term", "fg_count", F.col("df").alias("bg_count"), "score")
    )
    order = [F.col("score").desc(), F.col("term").asc()]
    top = cap_per_key(scored, ["qid"], order, size, salt_buckets=salt_buckets)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "term", "fg_count", "bg_count", F.col("score").alias("score"), "rank"
    )
