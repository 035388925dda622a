"""ES ranking-evaluation API (`_rank_eval`) as one Spark stage.

Given a ranked result set and graded relevance judgments, computes the
API's metric suite per query: precision@k, recall@k, reciprocal rank
(the MRR component), DCG@k, nDCG@k, and ERR@k (Chapelle et al. 2009,
the `expected_reciprocal_rank` metric ES ships).

Contracts (deterministic, DuckDB-twinnable):
- precision_k = relevant(rel>0) hits in top-k / retrieved rows (<= k);
- recall_k    = relevant hits in top-k / total relevant judged for the
  query (0.0 when the query has no relevant judgments — ES errors
  instead; a pipeline wants a number);
- rr          = 1 / rank of the first rel>0 hit, 0.0 if none in top-k;
- dcg_k       = Σ (2^rel − 1) / log2(rank + 1) over the top-k;
- ndcg_k      = dcg_k / idcg_k, ideal ranking = judgments sorted
  (rel desc, doc_id asc) — 0.0 when idcg is 0;
- err_k       = Σ_i (1/rank_i) · R_i · Π_{j<i} (1 − R_j) with
  R = (2^rel − 1) / 2^max_rel, folded in rank order.

Scale shape: everything is one judgments⋈results join (both sides
pre-filtered to top-k / judged rows — never corpus-sized), two
groupBy(qid) aggregates, and a per-qid ERR fold over a <= k-element
collected array (pure Catalyst `aggregate`, no Python). The ordered
ERR fold multiplies left-to-right exactly like a rank-ordered windowed
product, so a SQL twin matches bit-for-bit before the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    max_rel: int = 3,
) -> DataFrame:
    """results(qid, rank, doc_id) with rank 1..n per qid;
    qrels(qid, doc_id, rel) with integer rel >= 0. Returns one row per
    qid present in results: (qid, retrieved, precision_k, recall_k,
    rr, dcg_k, ndcg_k, err_k)."""
    top = results.filter(F.col("rank") <= k).select("qid", "rank", "doc_id")
    j = top.join(
        qrels.select("qid", "doc_id", "rel"), ["qid", "doc_id"], "left"
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))

    gain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0))
    r_prob = gain / F.lit(float(2 ** max_rel))
    per_hit = j.select(
        "qid",
        "rank",
        "rel",
        (gain / F.log2(F.col("rank").cast("double") + F.lit(1.0))).alias("dg"),
        r_prob.alias("rp"),
    )
    agg = per_hit.groupBy("qid").agg(
        F.count("*").alias("retrieved"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("rel_hits"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum("dg").alias("dcg_k"),
        F.sort_array(F.collect_list(F.struct("rank", "rp"))).alias("hs"),
    )
    err = F.expr(
        "aggregate(hs,"
        " struct(cast(0.0 as double) as e, cast(1.0 as double) as p),"
        " (acc, x) -> struct(acc.e + acc.p * x.rp / cast(x.rank as double),"
        "                    acc.p * (1.0 - x.rp)),"
        " acc -> acc.e)"
    )

    n_rel = qrels.filter(F.col("rel") > 0).groupBy("qid").agg(
        F.count("*").alias("n_rel")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        qrels.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wq))
        .filter(F.col("irank") <= k)
        .groupBy("qid")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0))
                / F.log2(F.col("irank").cast("double") + F.lit(1.0))
            ).alias("idcg")
        )
    )

    out = (
        agg.join(F.broadcast(n_rel), "qid", "left")
        .join(F.broadcast(ideal), "qid", "left")
        .select(
            "qid",
            "retrieved",
            (
                F.col("rel_hits").cast("double")
                / F.col("retrieved").cast("double")
            ).alias("precision_k"),
            F.when(
                F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                F.col("rel_hits").cast("double") / F.col("n_rel").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall_k"),
            F.when(
                F.col("first_rel").isNotNull(),
                F.lit(1.0) / F.col("first_rel").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("rr"),
            F.col("dcg_k"),
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.col("dcg_k") / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg_k"),
            err.alias("err_k"),
        )
    )
    return out
