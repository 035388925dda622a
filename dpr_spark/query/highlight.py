"""Snippet / best-fragment generation for search results — the Lucene
Highlighter / UnifiedHighlighter surface of the fulltext tier (the
reference displays retrieved passages verbatim, `dense_retriever.py:
337-379`; a web-scale serving stack highlights them).

Deterministic contract (token space; oracle-checked):

- doc tokens and query terms use the engine tokenizer (lowercased);
- a hit is any token position whose token is one of the query's
  DISTINCT terms;
- the fragment is the `window`-token window with the MOST hits, among
  windows starting at a hit position (for a fixed-width window, some
  optimal window starts at a hit); ties break to the leftmost start;
- output: (qid, doc_id, start_tok, n_hits, fragment) with `fragment`
  the space-joined token slice — a renderer maps token offsets back to
  character spans via the tokenizer's offsets view (T2). Docs with no
  hit produce no row (cannot happen for BM25 results, which require at
  least one matching term).

Scale shape: ONE pure-Catalyst projection per (result, doc) row — no
Python, no extra shuffle beyond the results→docs join the output
already requires (J1). The per-row cost is O(hits² + tokens) array
math inside whole-stage codegen; `window` and query size bound hits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def best_fragment_cols(
    toks: Column, qterms: Column, window: int = 30
) -> tuple[Column, Column, Column]:
    """(start_tok, n_hits, fragment) columns over a token-array column
    and a query-term-array column. Null start_tok when no token hits."""
    hitpos = F.filter(
        F.transform(toks, lambda x, i: F.when(F.array_contains(qterms, x), i)),
        lambda p: p.isNotNull(),
    )

    def hits_in(s: Column) -> Column:
        return F.size(F.filter(hitpos, lambda p: (p >= s) & (p < s + F.lit(window))))

    # struct ordering = (neg_hits ASC, start ASC) -> max hits, leftmost
    best = F.array_min(
        F.transform(
            hitpos,
            lambda s: F.struct((-hits_in(s)).alias("neg"), s.alias("start")),
        )
    )
    start = best["start"]
    n_hits = -best["neg"]
    fragment = F.array_join(F.slice(toks, start + F.lit(1), window), " ")
    return start, n_hits, fragment


def highlight(
    results: DataFrame,
    docs: DataFrame,
    query_terms: DataFrame,
    window: int = 30,
    lowercase_first: bool = False,
) -> DataFrame:
    """results(qid, doc_id[, ...]) ⋈ docs(doc_id, text) ⋈
    query_terms(qid, term) -> (qid, doc_id, start_tok, n_hits, fragment).

    `lowercase_first` selects the Catalyst tokenizer spelling that a
    DuckDB oracle can mirror (ASCII-equal; see tokenize_col)."""
    from dpr_spark.functions.tokenizer import tokenize_col

    qarr = query_terms.groupBy("qid").agg(
        F.array_sort(F.collect_set("term")).alias("_qterms")
    )
    j = (
        results.select("qid", "doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
        .join(F.broadcast(qarr), "qid")
        .withColumn("_toks", tokenize_col("text", lowercase_first=lowercase_first))
    )
    start, n_hits, fragment = best_fragment_cols(
        F.col("_toks"), F.col("_qterms"), window=window
    )
    return (
        j.select(
            "qid",
            "doc_id",
            start.alias("start_tok"),
            n_hits.alias("n_hits"),
            fragment.alias("fragment"),
        )
        .filter(F.col("start_tok").isNotNull())
    )
