"""Training-mix construction for LLM data pipelines: exact stratified
sampling (per-language/per-domain quotas) and GPT-style sequence
packing (concat-and-chunk token budgeting).

Both are deterministic — sampling ranks on a seeded xxhash64, packing
orders on doc_id — so a re-run over the same snapshot reproduces the
same training set byte-for-byte (the property the reference gets from
seeded torch shuffles, `/root/reference/dpr/utils/data_utils.py:193-
305`, re-expressed as rank-stable Spark plans)."""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark.functions.chunking import shuffle_key


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: Dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    salt_buckets: Optional[int] = None,
    portable: bool = False,
) -> DataFrame:
    """EXACT per-stratum quota sample: ceil(count_s · fraction_s) rows
    from each stratum, chosen by seeded-hash rank — the training-mix
    primitive ("3% of each language", "cap web at 60%"). Unlike
    `df.sampleBy` (Bernoulli — quota only in expectation, different
    rows per run), the quota is met exactly and the pick is a pure
    function of (id, seed).

    Strata absent from `fractions` are dropped (explicit mix only).

    Scale shape: stratum counts are a map-side-combined agg collapsing
    to |strata| rows, broadcast back as quotas; ranking is a per-
    stratum window over the seeded hash. A mega-stratum (all of
    English) funnels through one task's sort, so `salt_buckets=S` runs
    the same two-level EXACT cap as `cap_per_key` generalized to
    per-key quotas: rank within (stratum, salt) first — bounded at
    rows/S — keep `rn <= quota` survivors (the global top-quota by
    hash is contained in the union of per-salt top-quotas), then the
    final per-stratum rank over S·quota rows. No sort of the full
    stratum ever lands on one task.

    `portable=True` ranks on the md5-derived shuffle_key instead of
    xxhash64 so any SQL engine replays the identical sample (the
    DuckDB oracle does); the salt stays xxhash64 either way — the
    two-level cap is exact, so the salt never shows in the result.
    """
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    for s, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {s!r} must be in [0,1], got {f}")
    frac_rows = [(s, float(f)) for s, f in sorted(fractions.items())]
    fdf = df.sparkSession.createDataFrame(frac_rows, f"{stratum_col} string, _frac double")
    quotas = (
        df.groupBy(stratum_col)
        .agg(F.count("*").alias("_n"))
        .join(F.broadcast(fdf), stratum_col)
        .select(stratum_col, F.ceil(F.col("_n") * F.col("_frac")).alias("_quota"))
    )
    h = shuffle_key(id_col, seed, portable=portable)
    order = [h.asc(), F.col(id_col).asc()]
    picked = df.join(F.broadcast(quotas), stratum_col)
    if salt_buckets:
        salt = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.lit(salt_buckets))
        ws = Window.partitionBy(stratum_col, "_salt").orderBy(*order)
        picked = (
            picked.withColumn("_salt", salt)
            .withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") <= F.col("_quota"))
            .drop("_rn", "_salt")
        )
    w = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        picked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_shards: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, shard, offset, bin): GPT-style concat-and-chunk packing —
    docs are sharded by hash, concatenated in doc_id order within a
    shard, and the resulting token stream is cut into fixed `seq_len`
    training sequences. `offset` is the doc's first token's position in
    its shard's stream; `bin = offset // seq_len` is the training
    sequence its first token lands in (a doc may spill into later bins;
    the trainer reads the stream, this map is the manifest).

    Deterministic: shard = pmod(shuffle_key(id), n_shards) (xxhash64,
    or the md5-derived portable key with portable=True so SQL engines
    replay the same sharding) and the intra-shard order is doc_id — a
    re-run over the same snapshot yields the identical packing
    (resumable-training contract).

    Scale shape: ONE hash-partition shuffle to shards, then a running
    sum window per shard. Shards are the parallelism unit — size
    n_shards so a shard's manifest fits a task (the window sorts one
    shard per task); the token stream itself never materializes here,
    only the narrow (id, n_tokens) manifest flows through the shuffle.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("_nt"),
    ).withColumn(
        "shard",
        F.pmod(shuffle_key("doc_id", 0, portable=portable), F.lit(n_shards)).cast(
            "int"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "doc_id",
        "shard",
        (F.sum("_nt").over(w) - F.col("_nt")).alias("offset"),
        F.floor((F.sum("_nt").over(w) - F.col("_nt")) / F.lit(seq_len))
        .cast("long")
        .alias("bin"),
    )


def pack_bins_summary(packed: DataFrame, seq_len: int) -> DataFrame:
    """(shard, bin, n_docs_started, first_doc): per-training-sequence
    manifest summary from `pack_sequences` output — how many documents
    START in each seq_len window and which doc opens it (the record a
    dataloader needs to seek a bin without scanning the shard)."""
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs_started"),
        F.min("doc_id").alias("first_doc"),
    )


def alpha_mix_targets(
    df: DataFrame,
    stratum_col: str,
    alpha: float,
    total: int,
) -> DataFrame:
    """(stratum, n, target): per-stratum sample targets under
    temperature-scaled mixing — p_s ∝ n_s^alpha — the multilingual-LM
    mix rule (mC4 / XLM-R style: alpha<1 upweights tail domains), with
    the real-valued targets resolved to integers by the LARGEST-
    REMAINDER method so sum(target) == total exactly.

    Exactness discipline: the only float op is n_s^alpha, immediately
    rounded to integer MICRO-UNITS (×1e6, the repo's exact-MMR
    discipline); every subsequent step — proportional base share via
    integer division, remainder ranking, leftover distribution — is
    exact BIGINT math, so any engine reproduces identical targets.
    Ties in remainder rank break by stratum value.

    Targets are capped at n_s (sampling is without replacement); a
    capped stratum's shortfall is NOT redistributed — the contract
    reports what the mix rule asked for, bounded by what exists.

    Scale shape: one map-side-combined count collapses the corpus to
    |strata| rows; everything after runs on that coordinator-sized
    table (a single-partition window over strata, same class as every
    quota table in this module)."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n"))
    wu = F.round(F.pow(F.col("n").cast("double"), F.lit(float(alpha))) * 1e6).cast(
        "long"
    )
    t = counts.withColumn("wu", wu)
    tot = t.agg(F.sum("wu").alias("W"))
    t = t.join(F.broadcast(tot))
    # exact integer proportional share: base = (total*wu) div W,
    # remainder = total*wu - base*W (both < 2^53 for any sane mix table)
    t = t.withColumn("base", F.expr(f"({total} * wu) div W")).withColumn(
        "rem", F.lit(total) * F.col("wu") - F.col("base") * F.col("W")
    )
    leftover = F.lit(total) - F.sum("base").over(Window.partitionBy())
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col(stratum_col).asc())
    )
    return (
        t.withColumn("_left", leftover)
        .withColumn("_rk", rk)
        .withColumn(
            "target",
            F.least(
                F.col("base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0),
                F.col("n"),
            ).cast("long"),
        )
        .select(stratum_col, F.col("n").cast("long").alias("n"), "target")
    )


def alpha_mix_sample(
    df: DataFrame,
    stratum_col: str,
    alpha: float,
    total: int,
    seed: int = 0,
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Temperature-mixed training sample: `alpha_mix_targets` quotas
    filled per stratum by seeded-hash rank (the stratified_sample pick
    rule — a pure function of (id, seed), portable=True for SQL-engine
    replay). Returns the sampled rows of `df` unchanged."""
    targets = alpha_mix_targets(df, stratum_col, alpha, total)
    h = shuffle_key(id_col, seed, portable=portable)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(targets.select(stratum_col, "target")), stratum_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("target"))
        .drop("_rn", "target")
    )
