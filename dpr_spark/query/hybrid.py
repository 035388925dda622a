"""Hybrid retrieval: BM25 ∪ vector search fused with Reciprocal Rank
Fusion — the ES 8.x `rrf` retriever / Vespa-style hybrid ranking
(Cormack et al. 2009: RRF outperforms individual rankers without score
calibration, which is exactly why serving stacks fuse on RANKS — BM25
and cosine scores are not commensurable).

    score(d) = Σ_i  w_i / (k_rrf + rank_i(d))      (missing → no term)

The reference's own pipeline is the motivating case: DPR retrieves
dense (FAISS) and its README baselines BM25 (Lucene) — hybrid fusion of
the two is the published best practice (DPR paper §6.2 reports
BM25+DPR fusion results).

Scale shape: fusion consumes two ALREADY top-`depth` rankings —
query×depth-sized inputs, never corpus-sized. The union + per-(qid,
doc) sum is map-side combined; the final per-qid top-k is one window
over ≤ 2·depth rows per query. The upstream rankers keep their own
scale shapes (probe-in-place BM25, broadcast-queries cosine scan).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark import DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = DEFAULT_TOP_K,
    k_rrf: int = 60,
    weights: Optional[Sequence[float]] = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, rank, doc_id, score) — fuse (qid, rank, doc_id) rankings by
    weighted reciprocal rank. Rank-only: upstream scores never mix.
    Contributions fold in ranking order (struct sort) so the float sum
    is engine-deterministic."""
    ws = [float(w) for w in (weights or [1.0] * len(rankings))]
    if len(ws) != len(rankings):
        raise ValueError("one weight per ranking")
    parts = None
    for i, (r, w) in enumerate(zip(rankings, ws)):
        c = r.select(
            "qid",
            F.col(id_col).alias("doc_id"),
            F.struct(
                F.lit(i).alias("src"),
                (F.lit(w) / (F.lit(float(k_rrf)) + F.col("rank").cast("double"))).alias("c"),
            ).alias("sc"),
        )
        parts = c if parts is None else parts.unionByName(c)
    fused = (
        parts.groupBy("qid", "doc_id")
        .agg(F.sort_array(F.collect_list("sc")).alias("scs"))
        .select(
            "qid",
            "doc_id",
            F.aggregate("scs", F.lit(0.0), lambda a, x: a + x["c"]).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def hybrid_search_rrf(
    queries: DataFrame,
    index: InvertedIndex,
    emb: DataFrame,
    qvecs: DataFrame,
    k: int = DEFAULT_TOP_K,
    k_rrf: int = 60,
    depth: int = 100,
    w_text: float = 1.0,
    w_vec: float = 1.0,
) -> DataFrame:
    """BM25 top-`depth` + brute-cosine top-`depth` → RRF top-k.
    `emb`: (vec_id, embedding) with vec_id == doc_id; `qvecs`:
    (qid, qv) query vectors aligned with `queries` (qid, question)."""
    from dpr_spark.extras.ann import brute_cosine_topk
    from dpr_spark.query.scorer import search

    text_rank = search(queries, index, k=depth).select("qid", "rank", "doc_id")
    vec_rank = brute_cosine_topk(emb, qvecs, k=depth).select(
        "qid", "rank", F.col("vec_id").alias("doc_id")
    )
    return rrf_fuse(
        [text_rank, vec_rank], k=k, k_rrf=k_rrf, weights=[w_text, w_vec]
    )


def linear_fuse(
    rankings: Sequence[DataFrame],
    weights: Optional[Sequence[float]] = None,
    k: int = DEFAULT_TOP_K,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(qid, rank, doc_id, score) — ES 8.x `linear` retriever with the
    minmax normalizer: each source's scores rescale to [0, 1] within the
    query's candidate set, then fuse as a weighted sum (a doc missing
    from a source contributes 0 for it). A degenerate source (all
    candidates tied) normalizes to 1.0 — they are all its best.
    Contributions fold in source order so the float sum is
    engine-deterministic; callers feed ROUNDED upstream scores so the
    min/max cut is too."""
    ws = [float(w) for w in (weights or [1.0] * len(rankings))]
    if len(ws) != len(rankings):
        raise ValueError("one weight per ranking")
    parts = None
    for i, (r, w) in enumerate(zip(rankings, ws)):
        wq = Window.partitionBy("qid")
        s = F.col(score_col).cast("double")
        rng = F.max(s).over(wq) - F.min(s).over(wq)
        n = F.when(rng == 0, F.lit(1.0)).otherwise((s - F.min(s).over(wq)) / rng)
        c = r.select(
            "qid",
            F.col(id_col).alias("doc_id"),
            F.struct(
                F.lit(i).alias("src"), (F.lit(w) * n).alias("c")
            ).alias("sc"),
        )
        parts = c if parts is None else parts.unionByName(c)
    fused = (
        parts.groupBy("qid", "doc_id")
        .agg(F.sort_array(F.collect_list("sc")).alias("scs"))
        .select(
            "qid",
            "doc_id",
            F.aggregate("scs", F.lit(0.0), lambda a, x: a + x["c"]).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
