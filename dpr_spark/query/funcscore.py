"""Function-score queries: relevance × a document-value function — the
Elasticsearch ``function_score`` / Lucene ``FunctionScoreQuery`` +
``DoubleValuesSource`` surface.

Two function families (both ES-documented):

- decay(kind, origin, scale, offset, decay): exp / gauss / linear decay
  of distance from `origin` on a numeric doc value — ES's recency /
  proximity boosts. Parameterized exactly like ES: the function equals
  `decay` at distance `scale` past `offset`.
      exp:    decay ** (dist / scale)
      gauss:  exp(-dist² / (2σ²)),  σ² = -scale² / (2·ln decay)
      linear: max(0, (s - dist) / s),  s = scale / (1 - decay)
  with dist = max(0, |value - origin| - offset).
- field_value_factor(factor, modifier): score × modifier(value·factor),
  modifier ∈ {none, log1p, sqrt} — ES field_value_factor.

boost_mode: "multiply" (default) or "sum", like ES.

Semantics follow ES: the function applies to EVERY matched document
(not a top-k rescoring window — query/rescore.py is that other shape),
so the engine scores exhaustively (scorer.score_exact, postings probed
in place with the query terms broadcast) and joins the doc-value column
only onto candidate (qid, doc_id) rows — a narrow sort-merge join at
corpus scale, never a corpus-wide function evaluation. WAND-style
pruning is unsound here by design: the boost re-orders scores after
summation, so max-score bounds on BM25 alone don't bound the final
score.

The reference's analog: DPR re-ranks dense hits by retriever score
only; function-score is the standard serving-stack generalization
(Lucene FunctionScoreQuery is public API).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.scorer import score_exact


def decay_expr(col, kind: str, origin: float, scale: float,
               offset: float = 0.0, decay: float = 0.5):
    """The ES decay function as a Catalyst column (float64)."""
    if scale <= 0:
        raise ValueError("scale must be > 0")
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    dist = F.greatest(
        F.lit(0.0),
        F.abs(col.cast("double") - F.lit(float(origin))) - F.lit(float(offset)),
    )
    if kind == "exp":
        lam = math.log(decay) / scale
        return F.exp(F.lit(lam) * dist)
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    if kind == "linear":
        s = scale / (1.0 - decay)
        return F.greatest(F.lit(0.0), (F.lit(s) - dist) / F.lit(s))
    raise ValueError(f"unknown decay kind {kind!r}")


def decay_py(value: float, kind: str, origin: float, scale: float,
             offset: float = 0.0, decay: float = 0.5) -> float:
    """Pure-Python twin of decay_expr (oracle side), same float64 ops."""
    dist = max(0.0, abs(float(value) - origin) - offset)
    if kind == "exp":
        return math.exp((math.log(decay) / scale) * dist)
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return math.exp(-(dist * dist) / (2.0 * sigma2))
    if kind == "linear":
        s = scale / (1.0 - decay)
        return max(0.0, (s - dist) / s)
    raise ValueError(kind)


def field_value_factor_expr(col, factor: float = 1.0, modifier: str = "none"):
    v = col.cast("double") * F.lit(float(factor))
    if modifier == "none":
        return v
    if modifier == "log1p":
        return F.log1p(v)
    if modifier == "sqrt":
        return F.sqrt(v)
    raise ValueError(f"unknown modifier {modifier!r}")


def field_value_factor_py(value: float, factor: float = 1.0,
                          modifier: str = "none") -> float:
    v = float(value) * factor
    if modifier == "none":
        return v
    if modifier == "log1p":
        return math.log1p(v)
    if modifier == "sqrt":
        return math.sqrt(v)
    raise ValueError(modifier)


def search_function_score(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    fn_expr,
    boost_mode: str = "multiply",
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    deletes: Optional[DataFrame] = None,
) -> DataFrame:
    """results(qid, rank, doc_id, score) where
    score = bm25 ∘ fn_expr(doc_values[field]) under boost_mode.

    fn_expr: a callable column -> column (e.g.
    `lambda c: decay_expr(c, "exp", origin=0, scale=500)`), evaluated on
    the candidate rows only.
    """
    scored = score_exact(queries, index, k1=k1, b=b)
    if deletes is not None:
        from dpr_spark.index.deletes import exclude_deleted

        scored = exclude_deleted(scored, deletes)
    vals = doc_values.select("doc_id", F.col(field).alias("_fv"))
    joined = scored.join(vals, "doc_id")
    boost = fn_expr(F.col("_fv"))
    if boost_mode == "multiply":
        final = F.col("score") * boost
    elif boost_mode == "sum":
        final = F.col("score") + boost
    else:
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    out = joined.select("qid", "doc_id", final.alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )


def search_boosting(
    queries: DataFrame,
    index: InvertedIndex,
    negative: DataFrame,
    negative_boost: float = 0.2,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES `boosting` query / Lucene BoostingQuery: the positive query
    scores normally; any matched doc that ALSO matches the negative
    query keeps its rank eligibility but is demoted — final score =
    bm25 · negative_boost for negative matches, bm25 otherwise. Unlike
    must_not (a hard veto, query/boolquery.py), boosting keeps the doc.

    `queries`: (qid, question) positive queries.
    `negative`: (qid, neg_question) — per-query negative text, analyzed
    with the index's analyzer like any query.

    Scale shape: the positive side is the probe-in-place exact scorer;
    the negative side resolves through the same broadcast-into-
    dictionary discipline and produces a (qid, doc_id) match-flag set
    over candidate docs only, merged with one narrow left join before
    the top-k. WAND pruning stays sound per side but is skipped here —
    the demotion re-orders after scoring (same reason as
    function_score)."""
    if not 0.0 < negative_boost <= 1.0:
        raise ValueError("negative_boost must be in (0, 1]")
    from dpr_spark.query.scorer import query_terms, top_k

    pos = score_exact(queries, index, k1=k1, b=b)
    nq = negative.select("qid", F.col("neg_question").alias("question"))
    nt = query_terms(nq, analyzer=index.analyzer)
    resolved = index.dictionary.select("term", "term_id").join(
        F.broadcast(nt.select("term").distinct()), "term", "left_semi"
    )
    nt = nt.join(F.broadcast(resolved), "term")
    neg_matches = (
        index.postings.join(
            F.broadcast(nt.select("qid", "term_id").distinct()), "term_id"
        )
        .select("qid", "doc_id")
        .distinct()
        .withColumn("_neg", F.lit(True))
    )
    scored = pos.join(neg_matches, ["qid", "doc_id"], "left").select(
        "qid",
        "doc_id",
        F.when(F.col("_neg").isNotNull(),
               F.col("score") * F.lit(float(negative_boost)))
        .otherwise(F.col("score"))
        .alias("score"),
    )
    return top_k(scored, k)
