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
