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


def best_fragments_cols(
    toks: Column, qterms: Column, window: int = 30, n_fragments: int = 3
) -> Column:
    """array<struct<start_tok, n_hits, fragment>>: the top
    `n_fragments` NON-OVERLAPPING windows (Lucene Highlighter
    getBestFragments / ES number_of_fragments), in selection order.

    Greedy contract (token space, deterministic): candidates start at
    hit positions, ranked (hits DESC, start ASC); walk that ranking and
    accept a candidate iff its [start, start+window) is disjoint from
    every already-accepted fragment, until n_fragments are taken — the
    Lucene highlighter's discard-overlapping rule. The walk is a pure
    Catalyst `aggregate` fold over the candidate array (bounded by the
    doc's hit count), still zero-Python and zero extra shuffle."""
    hitpos = F.filter(
        F.transform(toks, lambda x, i: F.when(F.array_contains(qterms, x), i)),
        lambda p: p.isNotNull(),
    )

    def hits_in(s: Column) -> Column:
        return F.size(F.filter(hitpos, lambda p: (p >= s) & (p < s + F.lit(window))))

    cands = F.array_sort(
        F.transform(
            hitpos,
            lambda s: F.struct((-hits_in(s)).alias("neg"), s.alias("start")),
        )
    )
    sel = F.aggregate(
        cands,
        F.expr("CAST(array() AS array<int>)"),
        lambda acc, c: F.when(
            (F.size(acc) < F.lit(n_fragments))
            & ~F.exists(acc, lambda s0: F.abs(s0 - c["start"]) < F.lit(window)),
            F.concat(acc, F.array(c["start"])),
        ).otherwise(acc),
    )
    return F.transform(
        sel,
        lambda s: F.struct(
            s.alias("start_tok"),
            hits_in(s).alias("n_hits"),
            F.array_join(F.slice(toks, s + F.lit(1), window), " ").alias(
                "fragment"
            ),
        ),
    )


def highlight_multi(
    results: DataFrame,
    docs: DataFrame,
    query_terms: DataFrame,
    window: int = 30,
    n_fragments: int = 3,
    lowercase_first: bool = False,
) -> DataFrame:
    """Multi-fragment highlighting: (qid, doc_id, frag_rank, start_tok,
    n_hits, fragment), frag_rank 1.. in greedy-selection order (hits
    DESC, start ASC, non-overlapping). Docs with no hit produce no
    rows; every doc emits at most n_fragments rows."""
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
    frags = best_fragments_cols(
        F.col("_toks"), F.col("_qterms"), window=window, n_fragments=n_fragments
    )
    return j.select(
        "qid", "doc_id", F.posexplode(frags).alias("_pos", "_f")
    ).select(
        "qid",
        "doc_id",
        (F.col("_pos") + 1).cast("int").alias("frag_rank"),
        F.col("_f")["start_tok"].alias("start_tok"),
        F.col("_f")["n_hits"].alias("n_hits"),
        F.col("_f")["fragment"].alias("fragment"),
    )
