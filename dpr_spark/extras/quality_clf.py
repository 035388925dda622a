"""Learned quality classifier: logistic regression over hashed n-grams.

The CCNet / fastText-style quality model of web-scale LLM pipelines
(Wenzek et al. 2020 train a fastText classifier wiki-vs-crawl; the
LLaMA corpus uses the same shape): documents featurize as hashed
unigram+bigram buckets (the same featurizer DSIR uses,
``extras/dsir.hashed_ngram_buckets``; binary presence by default, L1
tf mass as an option), a linear model trains with a FIXED number of
full-batch gradient-descent steps, and every document scores a
calibrated in-domain probability.

Fixed-step full-batch GD (not SGD) is deliberate: the training run is
deterministic given (features, labels, eta, steps) up to float
summation order, which makes it replayable by a pure-Python twin and —
unrolled step by step — by a DuckDB SQL twin for the driver oracle.

Scale shape per step: one broadcast join of the B-row weight table
onto the (doc, bucket) feature stream + a per-doc shuffle for margins,
then a per-bucket shuffle for gradients; the collected artifacts are
the B-row gradient table and a scalar mean residual (B ~ 2^12..2^16 —
driver-sized by construction, like an index manifest). The feature
stream persists across steps; nothing per-doc is ever collected.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark.extras.dsir import hashed_ngram_buckets


def clf_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    mode: str = "binary",
    portable: bool = False,
    lowercase_first: bool = False,
) -> DataFrame:
    """(doc, bucket, x): hashed n-gram features per document.

    ``mode='binary'`` (default): x = 1 if the bucket occurs — the
    hashing-trick bag-of-words presence encoding; well-conditioned for
    few full-batch GD steps because every active feature has unit
    scale. ``mode='l1'``: x = c / sum_b c, tf mass normalized per doc —
    length-invariant but needs far more steps to move the margins."""
    feats = hashed_ngram_buckets(
        df,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        portable=portable,
        lowercase_first=lowercase_first,
    )
    if mode == "binary":
        return feats.select("doc", "bucket", F.lit(1.0).alias("x"))
    if mode != "l1":
        raise ValueError(f"unknown feature mode {mode!r}")
    totals = feats.groupBy("doc").agg(F.sum("c").alias("tot"))
    return feats.join(totals, "doc").select(
        "doc",
        "bucket",
        (F.col("c").cast("double") / F.col("tot").cast("double")).alias("x"),
    )


def _sigmoid(col):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-col))


def train_quality_classifier(
    spark: SparkSession,
    feats: DataFrame,
    labels: DataFrame,
    eta: float = 2.0,
    steps: int = 3,
) -> Tuple[Dict[int, float], float]:
    """Full-batch logistic GD: returns ({bucket: weight}, bias).

    `feats` is (doc, bucket, x); `labels` is (doc, y) with y in {0, 1}.
    Each step: margin_d = bias + sum_b x_db * w_b (broadcast w onto the
    feature stream), residual r_d = sigmoid(margin_d) - y_d, gradient
    g_b = sum_d x_db * r_d / n, update w -= eta * g, bias -= eta *
    mean(r). Weights start at zero, so step 1's margins are exactly the
    bias — the unrolled SQL twin exploits that."""
    feats = feats.persist()
    labels = labels.persist()
    w: Dict[int, float] = {}
    bias = 0.0
    n = None  # recovered from the sentinel row's count on step 1
    for _ in range(steps):
        if w:
            wdf = spark.createDataFrame(
                list(w.items()), "bucket long, w double"
            )
            margins = (
                feats.join(F.broadcast(wdf), "bucket")
                .groupBy("doc")
                .agg((F.lit(bias) + F.sum(F.col("x") * F.col("w"))).alias("m"))
            )
        else:
            margins = labels.select("doc", F.lit(bias).alias("m"))
        resid = labels.join(margins, "doc").select(
            "doc", (_sigmoid(F.col("m")) - F.col("y").cast("double")).alias("r")
        )
        # ONE job per step: the bias gradient (mean residual) rides the
        # bucket-gradient aggregation as a sentinel bucket (-1, never a
        # hash bucket), and n itself is the sentinel row's count (one
        # residual per label) — no separate labels.count() barrier. The
        # driver-side s/n division on the collected float64 sums is the
        # identical IEEE operation Spark's Divide performed in-plan.
        grads = (
            feats.join(resid, "doc")
            .select("bucket", (F.col("x") * F.col("r")).alias("v"))
            .unionByName(
                resid.select(F.lit(-1).cast("long").alias("bucket"), F.col("r").alias("v"))
            )
            .groupBy("bucket")
            .agg(F.sum("v").alias("s"), F.count("v").alias("c"))
            .collect()
        )
        mean_r = None
        for row in grads:
            if row.bucket == -1:
                if n is None:
                    # step 1's margins cover every label (no weight join
                    # yet), so the sentinel count IS the label count
                    n = float(row.c)
                mean_r = row.s / row.c
        for row in grads:
            if row.bucket != -1:
                w[row.bucket] = w.get(row.bucket, 0.0) - eta * (row.s / n)
        bias -= eta * (mean_r if mean_r is not None else 0.0)
    feats.unpersist()
    labels.unpersist()
    return w, bias


def score_quality(
    spark: SparkSession,
    feats: DataFrame,
    weights: Dict[int, float],
    bias: float,
    prob_round: int = 6,
) -> DataFrame:
    """(doc, prob): sigmoid(bias + x . w) per document, rounded so
    cross-engine float noise can't flip the value hash."""
    wdf = spark.createDataFrame(list(weights.items()), "bucket long, w double")
    return (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc")
        .agg(
            F.round(
                _sigmoid(F.lit(bias) + F.sum(F.col("x") * F.col("w"))),
                prob_round,
            ).alias("prob")
        )
    )


def quality_classifier_scores(
    spark: SparkSession,
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    eta: float = 2.0,
    steps: int = 3,
    mode: str = "binary",
    portable: bool = False,
    lowercase_first: bool = False,
    prob_round: int = 6,
) -> DataFrame:
    """One-shot: train in-domain-vs-rest on `df` (positives = docs whose
    id appears in `target_df`) and return (doc, y, prob) for every doc."""
    feats = clf_features(
        df,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        mode=mode,
        portable=portable,
        lowercase_first=lowercase_first,
    ).persist()
    pos = target_df.select(F.col(id_col).alias("doc")).distinct()
    labels = (
        df.select(F.col(id_col).alias("doc"))
        .join(pos.withColumn("y", F.lit(1)), "doc", "left")
        .select("doc", F.coalesce("y", F.lit(0)).alias("y"))
        # docs with zero tokens have no features — they can't train or score
        .join(feats.select("doc").distinct(), "doc", "left_semi")
    )
    w, bias = train_quality_classifier(spark, feats, labels, eta=eta, steps=steps)
    out = labels.join(
        score_quality(spark, feats, w, bias, prob_round=prob_round), "doc"
    ).select("doc", "y", "prob")
    out = out.localCheckpoint()
    feats.unpersist()
    return out
