"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    -> flagship BM25 top-k query over sf0.001 documents.
queries()       -> one entry per implemented operator (SURVEY.md §2),
                   implemented in dpr_spark.engine_queries.
oracle_sql()    -> DuckDB twins for EVERY entry — len(oracle_sql()) ==
                   len(queries()), asserted in tests/test_entry.py (since
                   round 4:
                   the nested-JSON sinks compare as canonical Jackson
                   wire bytes rebuilt with string_agg, the table-parser
                   fixture's chunk algebra has a slice-arithmetic SQL
                   spelling, and the round-4 Lucene-parity query surface
                   — phrase/bool/prefix/fuzzy/span-near/highlight/
                   more-like-this/RM3/facets — each carries a positions-
                   or expansion-based SQL twin; see engine_queries.py).
                   Round 5 adds BM25F, ordered spans, search_after
                   paging, sort-by-field, index merge, multi-segment
                   search, explain, synonyms, minimum_should_match +
                   range filters, field collapsing, live/purged deletes,
                   two-stage rescoring, dismax, function-score,
                   percolator, regexp, suggesters (completion + bigram-LM
                   phrase), has_child, nested bool trees, the ES
                   aggregation family (significant terms, histogram,
                   date_histogram, percentiles, cardinality, top_hits,
                   range, composite), multi_match best/cross_fields,
                   term vectors, boosting queries, hybrid BM25+vector
                   RRF, the content link graph (fixed-point PageRank,
                   HITS, anchor-text BM25F, rank-feature boost), the
                   index_phrases shingle engine, sibling/normalize
                   pipeline aggs, diversified_sampler, terms_set, and
                   the web-corpus cleaning family (Gopher repetition
                   stats, n-gram decontamination, PII redaction, URL
                   canonicalization + latest-wins, boilerplate
                   stripping), plus session-4: LM Jelinek-Mercer / DFI
                   similarities, CommonTermsQuery, span_multi,
                   matrix_stats / t_test / boxplot+percentile_ranks /
                   scripted_metric / runtime fields / date_range /
                   background-filtered significant_terms / serial_diff
                   + percentiles_bucket / frequent_item_sets,
                   geo_bounding_box + bounds/centroid, index aliases +
                   rollover + indices_boost, rollup downsampling,
                   transform pivot, and EQL sequence detection,
                   plus session-5: exact stratified sampling, sequence
                   packing, learned-sparse (SPLADE-style) retrieval,
                   gap-based sessionization (native session_window),
                   late-interaction multi-vector MaxSim, string_stats,
                   random_sampler, and the nestable minimal-interval
                   `intervals` query, plus session-6: term-range
                   queries (Lucene TermRangeQuery with a pushed
                   range-seek envelope), the full Gopher
                   non-repetition quality rule set, and the C4
                   cleaning heuristics, plus session-8: custom routing
                   (shard-targeted search, both ES search types),
                   nested block-join queries with inner_hits,
                   phrase-aware highlighting, MMR diversified
                   reranking, static index pruning, and SemDeDup
                   semantic near-dedup, plus session-9:
                   transposition-aware fuzzy (Damerau-Levenshtein,
                   Lucene's default), children / reverse_nested /
                   geo_distance-rings / categorize_text aggregations,
                   gapped ordered spans (SpanGapQuery), and distributed
                   BPE tokenizer training (iteration-0 pair statistics
                   twinned; the merge loop is pytest-verified against
                   the pure-Python Sennrich twin), plus session-11:
                   MoreLikeThis unlike docs, term-suggester
                   missing/popular/always modes, mojibake repair
                   (JVM latin1 roundtrip), WHATWG charset sniffing,
                   index shrink via the stored routing-space hash,
                   multi-fragment highlighting, RFC 9309 robots.txt
                   evaluation, hierarchical taxonomy facets, and
                   query-string default_operator=AND —
                   every one DuckDB-twinned (the exact count is
                   len(queries()), asserted == len(oracle_sql()) in
                   tests/test_entry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 (k1=1.2, b=0.75) top-10 over the sf0.001 documents
    table for the fixed NQ-style query set, results joined to passage
    text (the dense_retriever.py replacement surface)."""
    from dpr_spark.engine_queries import q_topk_join_text

    fn, _ = q_topk_join_text()
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dpr_spark.engine_queries import all_entries

    return {name: fn for name, (fn, _sql) in all_entries().items()}


def oracle_sql() -> dict[str, str]:
    from dpr_spark.engine_queries import all_entries

    return {name: sql for name, (_fn, sql) in all_entries().items() if sql is not None}
