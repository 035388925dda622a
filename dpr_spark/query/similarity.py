"""Pluggable similarity scoring: classic TF-IDF and LM Dirichlet top-k
over the same inverted index and the same probe-in-place plan as the
BM25 scorer (query/scorer.py).

Lucene ships similarity as a pluggable strategy (`BM25Similarity` is the
default since 6.0; `ClassicSimilarity` is the pre-6.0 TF-IDF;
`LMDirichletSimilarity` the language-model option) — the reference's
Lucene/Pyserini baseline (`/root/reference/README.md:25-26`) therefore
exposes all three on one index. Here each similarity is a different
Catalyst column formula over the identical (dictionary ⋈ broadcast
query-terms) → (postings probed in place) join; nothing about the index
layout, partitioning, or shuffle shape changes, which is the point: at
10^12 docs the scoring formula is free, the data motion is not.

Contracts (documented formulas, implemented bit-for-bit in the DuckDB
twins in engine_queries.py and the pure-Python oracle used by pytest):

classic (Lucene ClassicSimilarity, coord/queryNorm dropped as in
Lucene 7+):
    score(q,d) = Σ_t  sqrt(tf) · idf² · 1/sqrt(dl)
    idf        = 1 + ln(N / (df + 1))

lmdirichlet (Lucene LMDirichletSimilarity, Zhai & Lafferty smoothing):
    component  = ln(1 + tf / (mu · p(t|C))) + ln(mu / (dl + mu))
    p(t|C)     = ctf_t / total_tokens   (collection term frequency)
    score(q,d) = Σ_t  max(0, component)
    (the per-term clamp is Lucene's documented behavior: scores stay
    non-negative; a term rarer in the doc than in the collection
    contributes nothing)

Determinism: per-document components fold in ascending term_id order
(the dense rank of term — identical to ascending-term, the oracle's
order), so float addition rounds identically across engines; ties break
score DESC, doc_id ASC everywhere.

ctf is not in the dictionary (adding it would change the index schema
and the merge bit-identity contract), so lmdirichlet derives it at
query time with ONE extra postings probe restricted to the resolved
query terms (broadcast term_ids → groupBy(term_id).sum(tf)) — query-
sized output, posting-probe-sized cost, same shape as the scoring probe
itself. total_tokens is an exact integer Σ doclen over docstats (NOT
n_docs·avgdl, which would re-round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dpr_spark import DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.scorer import query_terms, top_k

LM_MU = 2000.0  # Lucene LMDirichletSimilarity default


def _resolved(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(qid, term_id, df) — query terms resolved against the dictionary;
    the tiny query side broadcasts INTO the vocab-sized dictionary scan
    (the repo-wide query-path broadcast discipline)."""
    qt = query_terms(queries)
    return index.dictionary.select("term", "term_id", "df").join(
        F.broadcast(qt), "term"
    )


def _ordered_fold(parts: DataFrame) -> DataFrame:
    """(qid, doc_id, score): ascending-term_id float fold of `component`
    (same determinism device as scorer.score_exact)."""
    tc = parts.select(
        "qid",
        "doc_id",
        F.struct(F.col("term_id"), F.col("component")).alias("tc"),
    )
    return (
        tc.groupBy("qid", "doc_id")
        .agg(F.sort_array(F.collect_list("tc")).alias("tcs"))
        .select(
            "qid",
            "doc_id",
            F.aggregate("tcs", F.lit(0.0), lambda a, x: a + x["component"]).alias(
                "score"
            ),
        )
    )


def score_classic(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(qid, doc_id, score) under classic TF-IDF (contract above)."""
    n = float(index.stats.n_docs)
    qt = _resolved(queries, index)
    joined = index.postings.join(F.broadcast(qt), "term_id")
    idf = F.lit(1.0) + F.log(F.lit(n) / (F.col("df").cast("double") + F.lit(1.0)))
    component = (
        F.sqrt(F.col("tf").cast("double"))
        * idf
        * idf
        / F.sqrt(F.col("doclen").cast("double"))
    )
    return _ordered_fold(
        joined.select("qid", "doc_id", "term_id", component.alias("component"))
    )


def score_lmdirichlet(
    queries: DataFrame, index: InvertedIndex, mu: float = LM_MU
) -> DataFrame:
    """(qid, doc_id, score) under LM Dirichlet (contract above)."""
    qt = _resolved(queries, index)
    # exact integer collection length recovered from the stored stats:
    # avgdl = Σdl/N in float64, and round(avgdl·N) is exact while
    # Σdl·2^-52 < 0.5 (merge._sum_doclen's argument) — no doc-sized
    # docstats job per query
    total_tokens = float(int(round(index.stats.avgdl * index.stats.n_docs)))
    # ctf for the resolved terms only: distinct term_ids broadcast into a
    # postings probe; output is query-term-sized
    tids = qt.select("term_id").distinct()
    ctf = (
        index.postings.join(F.broadcast(tids), "term_id")
        .groupBy("term_id")
        .agg(F.sum(F.col("tf").cast("double")).alias("ctf"))
    )
    joined = index.postings.join(
        F.broadcast(qt.join(ctf, "term_id")), "term_id"
    )
    p_c = F.col("ctf") / F.lit(total_tokens)
    dl = F.col("doclen").cast("double")
    raw = F.log(
        F.lit(1.0) + F.col("tf").cast("double") / (F.lit(mu) * p_c)
    ) + F.log(F.lit(mu) / (dl + F.lit(mu)))
    component = F.greatest(F.lit(0.0), raw)
    return _ordered_fold(
        joined.select("qid", "doc_id", "term_id", component.alias("component"))
    )


def _ctf_for(queries: DataFrame, index: InvertedIndex):
    """(resolved query terms joined with ctf, total collection tokens) —
    the shared collection-statistics probe of the LM/DFI family: ONE
    postings probe restricted to the resolved term_ids (query-sized
    output), exact integer Σ doclen for the collection length."""
    qt = _resolved(queries, index)
    total_tokens = float(int(round(index.stats.avgdl * index.stats.n_docs)))
    tids = qt.select("term_id").distinct()
    ctf = (
        index.postings.join(F.broadcast(tids), "term_id")
        .groupBy("term_id")
        .agg(F.sum(F.col("tf").cast("double")).alias("ctf"))
    )
    return qt.join(ctf, "term_id"), total_tokens


LM_LAMBDA = 0.1  # Lucene LMJelinekMercerSimilarity default


def score_lmjelinekmercer(
    queries: DataFrame, index: InvertedIndex, lam: float = LM_LAMBDA
) -> DataFrame:
    """(qid, doc_id, score) under LM Jelinek-Mercer smoothing (Lucene
    LMJelinekMercerSimilarity; Zhai & Lafferty 2001):

        component  = ln(1 + ((1−λ)·tf/dl) / (λ·p(t|C)))
        p(t|C)     = ctf_t / total_tokens
        score(q,d) = Σ_t component      (always ≥ 0: the log argument
                                         is > 1 whenever tf > 0)

    Same plan shape as lmdirichlet: the formula changes, the data
    motion does not."""
    qtc, total_tokens = _ctf_for(queries, index)
    joined = index.postings.join(F.broadcast(qtc), "term_id")
    p_c = F.col("ctf") / F.lit(total_tokens)
    dl = F.col("doclen").cast("double")
    component = F.log(
        F.lit(1.0)
        + (F.lit(1.0 - lam) * F.col("tf").cast("double") / dl)
        / (F.lit(lam) * p_c)
    )
    return _ordered_fold(
        joined.select("qid", "doc_id", "term_id", component.alias("component"))
    )


def score_dfi(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(qid, doc_id, score) under divergence-from-independence (Lucene
    DFISimilarity, standardized measure; Kocabaş, Dinçer & Karaoğlan
    2014):

        expected   = ctf_t · dl / total_tokens
        measure    = (tf − expected) / sqrt(expected)
        component  = log2(1 + measure)   if tf > expected, else 0
        score(q,d) = Σ_t component

    A term occurring no more often than independence predicts
    contributes nothing (Lucene's documented clamp)."""
    qtc, total_tokens = _ctf_for(queries, index)
    joined = index.postings.join(F.broadcast(qtc), "term_id")
    dl = F.col("doclen").cast("double")
    expected = F.col("ctf") * dl / F.lit(total_tokens)
    tf = F.col("tf").cast("double")
    measure = (tf - expected) / F.sqrt(expected)
    component = F.when(
        tf > expected, F.log2(F.lit(1.0) + measure)
    ).otherwise(F.lit(0.0))
    return _ordered_fold(
        joined.select("qid", "doc_id", "term_id", component.alias("component"))
    )


def search_similarity(
    queries: DataFrame,
    index: InvertedIndex,
    similarity: str = "classic",
    k: int = DEFAULT_TOP_K,
    mu: float = LM_MU,
    lam: float = LM_LAMBDA,
) -> DataFrame:
    """results(qid, rank, doc_id, score) under the named similarity.
    `bm25` routes to the default scorer so callers can treat this as the
    single pluggable entry point (Lucene IndexSearcher.setSimilarity)."""
    if similarity == "bm25":
        from dpr_spark.query.scorer import score_exact

        return top_k(score_exact(queries, index), k)
    if similarity == "classic":
        return top_k(score_classic(queries, index), k)
    if similarity == "lmdirichlet":
        return top_k(score_lmdirichlet(queries, index, mu=mu), k)
    if similarity == "lmjelinekmercer":
        return top_k(score_lmjelinekmercer(queries, index, lam=lam), k)
    if similarity == "dfi":
        return top_k(score_dfi(queries, index), k)
    raise ValueError(f"unknown similarity {similarity!r}")
