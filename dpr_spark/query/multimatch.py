"""multi_match query modes over the fielded index — the ES `multi_match`
surface (Lucene's multi-field query rewrites):

- most_fields:  Σ_f w_f·BM25_f — already `index/fielded.search_fielded`
  (kept there; it is the BM25F-style sum the baseline runs).
- best_fields:  per-field scores combined with a dis-max —
  score = max_f s_f + tie_breaker · Σ_{f≠argmax} s_f (Lucene
  DisjunctionMaxQuery over one query per field; ES default mode).
- cross_fields: TERM-centric blending (Lucene BlendedTermQuery): a
  term's idf is computed from the blended df = max_f df_f(t) so a term
  rare in `title` but common in `text` is not double-rewarded; per term
  a doc takes its best per-field contribution (dis-max across fields),
  then contributions sum over terms. This is ES's fix for the
  "first_name/last_name" problem where best_fields/most_fields see two
  independent vocabularies.

Determinism: every float fold is ordered — per-field sums fold in
ascending term_id (== ascending term within a field), the cross-field
max is exact (no addition), and the final per-doc sums fold ascending
(field_id or term). The pure-Python twins in oracle/bm25.py mirror the
same order (tests/test_multimatch.py).

Scale shape (same discipline as search_fielded): the tiny query-term
set broadcasts INTO the vocab-sized dictionary scan (left-semi) — the
dictionary never shuffles or broadcasts; resolved terms (≤ q·terms·
n_fields rows) broadcast into the postings probe, so postings are
scanned in place with no doc-sized shuffle before the per-doc
aggregation, which is map-side combined.

Reference parity: DPR's Pyserini/Lucene baseline searches title+text
together (README.md:25-26; dpr/data/retriever_data.py:253-287 carries
title per passage) — these are the standard Lucene rewrites of that
multi-field query.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.fielded import FieldedIndex, _per_field_case
from dpr_spark.query.scorer import query_terms, top_k


def _probe(queries: DataFrame, index: FieldedIndex, extra_cols=()) -> DataFrame:
    """postings rows joined to resolved query terms:
    (qid, term, field_id, term_id, idf, df, doc_id, tf, doclen)."""
    qt = query_terms(queries, analyzer=index.analyzer)
    resolved = index.dictionary.join(
        F.broadcast(qt.select("term").distinct()), "term", "left_semi"
    ).select("term", "field_id", "term_id", "df", "idf")
    qt = qt.join(F.broadcast(resolved), "term")
    return index.postings.join(
        F.broadcast(
            qt.select("qid", "term", "field_id", "term_id", "df", "idf", *extra_cols)
        ),
        "term_id",
    )


def _tf_norm(index: FieldedIndex, k1: float, b: float):
    avgdl_expr = _per_field_case(index.fields, index.avgdl)
    return (
        F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / avgdl_expr)
        )
    )


def multi_match_best_fields(
    queries: DataFrame,
    index: FieldedIndex,
    k: int = DEFAULT_TOP_K,
    tie_breaker: float = 0.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
    weights: Optional[Dict[str, float]] = None,
) -> DataFrame:
    """(qid, rank, doc_id, score) — ES multi_match best_fields / Lucene
    DisjunctionMaxQuery(tieBreaker) over one BM25 query per field:
    score = best field score + tie_breaker · (other field scores)."""
    w = weights or index.weights
    probe = _probe(queries, index)
    component = F.col("idf") * _tf_norm(index, k1, b)
    parts = probe.select(
        "qid",
        "doc_id",
        "field_id",
        F.struct(F.col("term_id"), component.alias("component")).alias("tc"),
    )
    w_expr = _per_field_case(index.fields, w)
    fscore = (
        parts.groupBy("qid", "doc_id", "field_id")
        .agg(F.sort_array(F.collect_list("tc")).alias("tcs"))
        .select(
            "qid",
            "doc_id",
            "field_id",
            (
                w_expr
                * F.aggregate("tcs", F.lit(0.0), lambda a, x: a + x["component"])
            ).alias("s"),
        )
    )
    # ≤ n_fields rows per (qid, doc): fold ascending field_id; the max
    # is exact (no float addition), the sum is field_id-ordered
    agg = (
        fscore.groupBy("qid", "doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("field_id", "s"))).alias("fs")
        )
        .select(
            "qid",
            "doc_id",
            F.transform("fs", lambda x: x["s"]).alias("svals"),
        )
    )
    mx = F.array_max("svals")
    sm = F.aggregate("svals", F.lit(0.0), lambda a, x: a + x)
    scored = agg.select(
        "qid",
        "doc_id",
        (mx + F.lit(float(tie_breaker)) * (sm - mx)).alias("score"),
    )
    return top_k(scored, k)


def multi_match_cross_fields(
    queries: DataFrame,
    index: FieldedIndex,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    weights: Optional[Dict[str, float]] = None,
) -> DataFrame:
    """(qid, rank, doc_id, score) — ES multi_match cross_fields / Lucene
    BlendedTermQuery: per term, idf is blended from the MAX df across
    fields (one vocabulary statistic for what is conceptually one
    field), a doc takes its best per-field contribution for that term,
    and the per-term contributions sum."""
    w = weights or index.weights
    n = float(index.n_docs)
    # blended df = max over ALL fields of the term — resolved on the
    # dictionary side (a post-probe window would only see fields the
    # doc actually matches)
    qt = query_terms(queries, analyzer=index.analyzer)
    resolved = index.dictionary.join(
        F.broadcast(qt.select("term").distinct()), "term", "left_semi"
    ).select("term", "field_id", "term_id", "df")
    wb = Window.partitionBy("term")
    resolved = resolved.withColumn("df_b", F.max("df").over(wb))
    idf_b = F.log(
        (F.lit(n) - F.col("df_b") + F.lit(0.5)) / (F.col("df_b") + F.lit(0.5))
        + F.lit(1.0)
    )
    resolved = resolved.withColumn("idf_b", idf_b)
    # term-centric: a repeated query term contributes once (the per-term
    # dis-max collapses duplicates anyway — make it explicit)
    qt = qt.select("qid", "term").distinct()
    qterms = qt.join(
        F.broadcast(resolved.select("term", "field_id", "term_id", "idf_b")),
        "term",
    )
    probe = index.postings.join(
        F.broadcast(qterms.select("qid", "term", "field_id", "term_id", "idf_b")),
        "term_id",
    )
    w_expr = _per_field_case(index.fields, w)
    cand = w_expr * F.col("idf_b") * _tf_norm(index, k1, b)
    # per (qid, doc, term): best field contribution — exact max
    tcomp = (
        probe.select("qid", "doc_id", "term", cand.alias("cand"))
        .groupBy("qid", "doc_id", "term")
        .agg(F.max("cand").alias("comp"))
    )
    scored = (
        tcomp.groupBy("qid", "doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("term", "comp"))).alias("tcs"))
        .select(
            "qid",
            "doc_id",
            F.aggregate("tcs", F.lit(0.0), lambda a, x: a + x["comp"]).alias(
                "score"
            ),
        )
    )
    return top_k(scored, k)


def combined_field_norms(index, weights=None) -> DataFrame:
    """(doc_id, dl_c) — the combined-field length norm: Σ_f w_f·dl_f per
    doc. The Lucene norms-file analog for `combined_fields`: computed
    ONCE from the fielded postings (distinct (doc, field, doclen) rows)
    and meant to be persisted/stored next to the index at scale — the
    search path never scans the corpus for lengths."""
    w = weights or index.weights
    from dpr_spark.index.fielded import _per_field_case

    # index-time norms computation (once per index) — the build-time
    # dictionary->postings broadcast exception applies
    dl = (
        index.postings.join(
            F.broadcast(index.dictionary.select("term_id", "field_id")),
            "term_id",
        )
        .select("doc_id", "field_id", "doclen")
        .distinct()
    )
    w_expr = _per_field_case(index.fields, w)
    return dl.groupBy("doc_id").agg(
        F.sum(w_expr * F.col("doclen").cast("double")).alias("dl_c")
    )


def search_combined_fields(
    queries: DataFrame,
    index,
    norms: DataFrame,
    n_docs: int,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    weights=None,
) -> DataFrame:
    """ES `combined_fields`: fields blend into ONE pseudo-field before
    BM25 — per (term, doc) tf_c = Σ_f w_f·tf_f, per doc dl_c = Σ_f
    w_f·dl_f (the `norms` table), df = docs containing the term in ANY
    field, ONE BM25 per term. Differs from cross_fields (per-field
    scores, blended df) and best_fields (dis-max): term-centric, the
    text-book BM25F.

    Scale shape: the probe rows (postings ⋈ broadcast query terms) are
    the only data touched — df-any and tf_c both aggregate the probe,
    so no corpus pass happens at query time."""
    from dpr_spark.index.fielded import _per_field_case
    from dpr_spark.query.scorer import query_terms

    w = weights or index.weights
    qt = query_terms(queries, analyzer=index.analyzer)
    resolved = index.dictionary.join(
        F.broadcast(qt.select("term").distinct()), "term", "left_semi"
    ).select("term", "field_id", "term_id")
    qt = qt.join(F.broadcast(resolved), "term")
    probed = index.postings.join(
        F.broadcast(qt.select("qid", "term", "field_id", "term_id")), "term_id"
    )
    w_expr = _per_field_case(index.fields, w)
    ctf = probed.groupBy("qid", "term", "doc_id").agg(
        F.sum(w_expr * F.col("tf").cast("double")).alias("ctf")
    )
    # df over the combined field: distinct docs per term, FROM THE PROBE
    df_any = (
        probed.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    avg_row = norms.agg(
        (F.sum("dl_c") / F.lit(float(n_docs))).alias("a")
    ).collect()[0]
    avgdl_c = float(avg_row["a"] or 0.0) or 1.0
    scored = (
        ctf.join(F.broadcast(df_any), "term")
        .join(norms, "doc_id")
        .select(
            "qid",
            "doc_id",
            (
                idf
                * F.col("ctf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("ctf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl_c") / F.lit(avgdl_c))
                )
            ).alias("c"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("c").alias("score"))
    )
    w_rank = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
