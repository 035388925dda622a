"""DSIR-style data selection: hashed n-gram importance resampling.

Implements the public recipe of Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling", NeurIPS 2023): featurize
each document as hashed n-gram (unigram + bigram) counts over B
buckets, fit bag-of-hashed-ngrams categorical models for a target
domain and for the raw corpus, weight every raw document by its log
importance ratio log p_target(doc) - log p_raw(doc), and select k
documents without replacement via the Gumbel top-k trick
(argtop-k of log w_i + Gumbel noise samples proportionally to w_i).

This is the selection stage the reference pipeline lacks entirely —
DPR assumes a pre-curated corpus (`/root/reference/dpr/data/
download_data.py` fetches fixed dumps); at 100 TB of crawl the corpus
IS the product and domain-targeted selection is a first-class op.

Scale shape: the gram stream is (docs × ~2·tokens) rows but reduces
by (doc, bucket) with map-side combine before any shuffle; both fitted
distributions are B-row tables (B ~ 2^12..2^16) that BROADCAST onto
the doc-bucket stream; one keyed shuffle computes per-doc sums; the
final selection is a distributed TakeOrderedAndProject (per-partition
top-k, merged on the driver) — never a global sort. Nothing in the
plan materializes per-doc dense vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dpr_spark.extras.dedup import portable_hash60
from dpr_spark.functions.tokenizer import tokenize_col

# 2^60: the value range of portable_hash60, used to turn a hash into a
# uniform in (0, 1) for the Gumbel draw.
_HASH_DEN = float(1 << 60)


def _default_bucket(col, buckets: int):
    """xxhash64 bucket id — the fast JVM path (not DuckDB-replayable)."""
    return F.pmod(F.xxhash64(col), F.lit(buckets))


def _portable_bucket(col, buckets: int):
    """md5-derived bucket id with an identical DuckDB spelling."""
    return portable_hash60(col) % F.lit(buckets)


def hashed_ngram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    portable: bool = False,
    lowercase_first: bool = False,
) -> DataFrame:
    """(doc, bucket, c): hashed unigram+bigram counts per document.

    The DSIR featurizer: every token and every adjacent token pair
    hashes into one of `buckets` buckets; c is the per-doc count.
    Stays Catalyst-native end to end (array transform + explode +
    map-side-combined groupBy) — no Python in the loop.
    """
    # vectorized Arrow n-gram kernel (functions/ngrams_fast.py): the
    # unigram+bigram stream is built in two pyarrow C calls per batch
    # instead of per-element interpreted HOF eval; the bucket hash and
    # the map-side-combined count stay Catalyst-native
    from dpr_spark.functions.ngrams_fast import ngram_rows

    bucket = (_portable_bucket if portable else _default_bucket)(
        F.col("g"), buckets
    )
    return (
        ngram_rows(
            df, 2, id_col=id_col, text_col=text_col,
            lowercase_first=lowercase_first, mode="uni_bi",
            out_id="doc", out_gram="g",
        )
        .select("doc", bucket.alias("bucket"))
        .groupBy("doc", "bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_bucket_logratio(
    raw_feats: DataFrame, target_feats: DataFrame, buckets: int, lam: float = 0.5
) -> DataFrame:
    """(bucket, r): per-bucket log importance ratio
    ln p_target(bucket) - ln p_raw(bucket), add-λ smoothed over the full
    B-bucket support. Only buckets present in the raw corpus are
    emitted — a scored document's buckets are by construction a subset
    of the raw support, so absent rows are never probed."""
    tgt = target_feats.groupBy("bucket").agg(
        F.sum("c").cast("double").alias("ct")
    )
    raw = raw_feats.groupBy("bucket").agg(F.sum("c").cast("double").alias("cq"))
    tt = tgt.agg(F.sum("ct")).first()[0] or 0.0
    tq = raw.agg(F.sum("cq")).first()[0] or 0.0
    r = F.log(
        (F.coalesce(F.col("ct"), F.lit(0.0)) + F.lit(lam))
        / F.lit(tt + lam * buckets)
    ) - F.log((F.col("cq") + F.lit(lam)) / F.lit(tq + lam * buckets))
    return raw.join(tgt, "bucket", "left").select("bucket", r.alias("r"))


def dsir_log_weights(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    lam: float = 0.5,
    portable: bool = False,
    lowercase_first: bool = False,
) -> DataFrame:
    """(doc, logw): per-document log importance weight of `df` (the raw
    corpus) toward `target_df` (the domain to match). The B-row ratio
    table broadcasts onto the (doc, bucket) count stream; one keyed
    shuffle sums per doc. Documents with zero tokens drop (no features
    to weight)."""
    kw = dict(
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        portable=portable,
        lowercase_first=lowercase_first,
    )
    raw_feats = hashed_ngram_buckets(df, **kw).persist()
    tgt_feats = hashed_ngram_buckets(target_df, **kw)
    ratio = dsir_bucket_logratio(raw_feats, tgt_feats, buckets, lam=lam)
    out = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc")
        .agg(F.sum(F.col("c") * F.col("r")).alias("logw"))
        .localCheckpoint()
    )
    raw_feats.unpersist()
    return out


def gumbel_key(doc_col, logw_col, seed: int):
    """log w + Gumbel(0,1) noise, the noise deterministic in the doc id
    and seed: u = (h + 0.5) / 2^60 with h = portable_hash60(doc ':' seed),
    g = -ln(-ln u). Same md5 spelling exists in DuckDB, so the draw —
    and therefore the selected set — replays bit-close in the oracle."""
    h = portable_hash60(F.concat(doc_col.cast("string"), F.lit(f":{seed}")))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_HASH_DEN)
    return logw_col - F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    target_df: DataFrame,
    k: int = 100,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    lam: float = 0.5,
    portable: bool = False,
    lowercase_first: bool = False,
    key_round: int = 6,
) -> DataFrame:
    """(rank, doc, logw, key): k documents sampled without replacement
    with probability proportional to their importance weight (Gumbel
    top-k). Ranks order by the ROUNDED key (ties by doc) so cross-engine
    float noise can't flip a rank; the limit compiles to a distributed
    TakeOrderedAndProject, not a global sort."""
    w = dsir_log_weights(
        df,
        target_df,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        lam=lam,
        portable=portable,
        lowercase_first=lowercase_first,
    )
    keyed = w.select(
        "doc",
        F.round("logw", key_round).alias("logw"),
        F.round(gumbel_key(F.col("doc"), F.col("logw"), seed), key_round).alias(
            "key"
        ),
    )
    top = keyed.orderBy(F.desc("key"), "doc").limit(k)
    from pyspark.sql import Window

    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("key"), "doc"))
        .alias("rank"),
        "doc",
        "logw",
        "key",
    )
