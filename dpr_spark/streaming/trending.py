"""Streaming trending terms — windowed term-frequency tracking over the
crawl stream (the Top-K Frequent Term Queries problem on streaming
data): event-time windows with a watermark maintain per-(window, term)
counts incrementally — occurrence counts EXACT, document counts HLL
(the ES cardinality trade: exact distinct-url would chain a second
stateful dedup; the sketch keeps state at one register set per term); a window's counts
emit once the watermark finalizes it (append mode), and top-k ranking
is a cheap batch query over the emitted sink — the stream does the
corpus-sized work, the ranking touches vocab-sized rows.

Design notes:
- tokenization is the engine's reference tokenizer via the same Arrow
  UDF the index build uses, so "trending" terms are exactly the terms
  the index would carry;
- state per (window, term) is two longs — vocab x window-count sized,
  never doc-sized; the incremental agg is Spark's native partial-merge
  (same machinery as crawlstats' windowed counts);
- late pages inside the allowed lateness still count; pages later than
  the watermark drop — asserted in tests/test_streaming_trending.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dpr_spark.functions.normalize import normalize_question_col
from dpr_spark.functions.tokenizer import tokenize_udf


def trending_terms_stream(
    pages: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    min_len: int = 3,
) -> DataFrame:
    """(window_start, window_end, term, n_occ, n_docs): windowed term
    stats (n_occ exact, n_docs HLL-approximate); terms shorter than
    `min_len` chars are dropped (the stopword-class guard — 'the'
    trending is noise)."""
    toks = pages.select(
        F.col("warc_ts"),
        F.col("url"),
        F.explode(tokenize_udf()(normalize_question_col(F.col("text")))).alias(
            "term"
        ),
    ).filter(F.length("term") >= min_len)
    return (
        toks.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("term"))
        .agg(
            F.count("*").alias("n_occ"),
            F.approx_count_distinct("url").alias("n_docs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n_occ",
            "n_docs",
        )
    )


def top_trending(sink: DataFrame, k: int = 10) -> DataFrame:
    """(window_start, rank, term, n_occ, n_docs): per finalized window,
    the k most frequent terms (n_occ desc, term asc) — a batch query
    over the stream's sink, vocab-sized input."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.desc("n_occ"), F.asc("term")
    )
    return (
        sink.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "rank", "term", "n_occ", "n_docs")
    )
