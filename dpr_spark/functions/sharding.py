"""D2: ShardedDataIterator semantics as a Spark plan
(`/root/reference/dpr/utils/data_utils.py:193-305`).

The reference slices an epoch-shuffled index list into `num_shards`
contiguous shards of ceil(T/n) positions, then EQUALIZES iteration
counts: a shard with fewer batches than `max_iterations` re-yields its
first batch ("Fulfilling non complete shard", `:295-301`), and with
`strict_batch_size` a short final batch is extended from the shard's
head (`:287-290` — the reference line reads `len(items)` before `items`
is assigned in that iteration, a latent NameError when batch 0 itself is
short; we implement the documented intent: pad to batch_size from
shard_indices[0:]).

Spark shape: the permutation is a pure function of (id, seed+epoch)
(K4's shuffle_key), positions come from the two-phase ranged-id kernel
(no single-task global window), and padding rows come from a broadcast
join of the tiny per-shard stats against each shard's head batch — the
plan shuffles (id, 8B key) rows only, never payloads (the reference
likewise permutes indices, not samples; callers join the assignment back
to the data by id)."""

from __future__ import annotations

from math import ceil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dpr_spark.functions.chunking import shuffle_key
from dpr_spark.plans.ids import assign_dense_ids


def sharded_epoch_batches(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    batch_size: int,
    epoch: int = 0,
    seed: int = 0,
    strict_batch_size: bool = False,
    portable_key: bool = False,
) -> DataFrame:
    """-> (shard int, iteration int, <id_col>) — which batch of which
    shard each row lands in for this epoch, equalized like the
    reference: every shard yields the same number of iterations
    (max_iterations = ceil(sps/batch) if strict else floor(sps/batch),
    `data_utils.py:237-240`), short shards topping up with copies of
    their first batch, and (strict mode) a short final batch padded from
    the shard head. Padding duplicates ids by design — exactly what the
    reference's DDP equalization does."""
    keyed = df.select(
        F.col(id_col), shuffle_key(id_col, seed + epoch, portable_key).alias("k")
    )
    ranked = assign_dense_ids(keyed, "k", "pos")
    total = ranked._dense_id_count
    sps = ceil(total / max(num_shards, 1))  # samples_per_shard, :232
    max_it = ceil(sps / batch_size) if strict_batch_size else sps // batch_size

    x = (
        ranked.withColumn("shard", F.expr(f"CAST(pos DIV {sps} AS INT)"))
        .withColumn("local", F.expr(f"pos - (pos DIV {sps}) * {sps}"))
        .select(id_col, "shard", "local")
    )
    x = x.persist()
    real = x.select(
        "shard", F.expr(f"CAST(local DIV {batch_size} AS INT)").alias("iteration"), id_col
    )
    stats = (
        x.groupBy("shard")
        .agg(F.count("*").alias("len"))
        .withColumn("its_real", F.ceil(F.col("len") / F.lit(batch_size)).cast("int"))
    )
    head = x.filter(F.col("local") < batch_size)  # shard_indices[0:batch]

    # top-up: iterations its_real..max_it-1 re-yield the first batch
    pad_iters = (
        stats.filter(F.col("its_real") < max_it)
        .select(
            "shard",
            F.explode(F.sequence(F.col("its_real"), F.lit(max_it - 1))).alias("iteration"),
        )
    )
    topup = head.join(F.broadcast(pad_iters), "shard").select(
        "shard", F.col("iteration").cast("int"), id_col
    )

    out = real.unionByName(topup)
    if strict_batch_size:
        # short FINAL batch -> extend to batch_size from the shard head
        last_len = F.col("len") - (F.col("its_real") - 1) * batch_size
        ext_stats = stats.filter((last_len >= 1) & (last_len < batch_size)).select(
            "shard",
            (F.col("its_real") - 1).cast("int").alias("iteration"),
            (F.lit(batch_size) - last_len).alias("need"),
        )
        ext = head.join(F.broadcast(ext_stats), "shard").filter(
            F.col("local") < F.col("need")
        ).select("shard", "iteration", id_col)
        out = out.unionByName(ext)
    return out


def sharded_epoch_sql(
    table: str,
    id_col: str,
    num_shards: int,
    batch_size: int,
    epoch: int = 0,
    seed: int = 0,
    strict_batch_size: bool = False,
) -> str:
    """DuckDB twin of sharded_epoch_batches(portable_key=True) for
    oracle checks (same arithmetic, window rank for the position)."""
    s = seed + epoch
    strict_it = (
        f"CAST(ceil(sps / {batch_size}.0) AS BIGINT)"
        if strict_batch_size
        else f"sps // {batch_size}"
    )
    ext = f"""
      UNION ALL
      SELECT h.shard, (s.its_real - 1)::INT AS iteration, h.{id_col}
      FROM head h JOIN stats s ON h.shard = s.shard
      WHERE s.len - (s.its_real - 1) * {batch_size} BETWEEN 1 AND {batch_size - 1}
        AND h.local < {batch_size} - (s.len - (s.its_real - 1) * {batch_size})
    """ if strict_batch_size else ""
    return f"""
      WITH keyed AS (
        SELECT {id_col},
               ('0x' || substr(md5({id_col}::VARCHAR || ':{s}'), 1, 15))::BIGINT AS k
        FROM {table}),
      pos AS (SELECT {id_col}, row_number() OVER (ORDER BY k) - 1 AS pos FROM keyed),
      params AS (SELECT CAST(ceil(c / {num_shards}.0) AS BIGINT) AS sps
                 FROM (SELECT count(*)::BIGINT AS c FROM pos)),
      x AS (SELECT {id_col}, (pos // sps)::INT AS shard, pos % sps AS local
            FROM pos CROSS JOIN params),
      stats AS (SELECT shard, count(*)::BIGINT AS len,
                       CAST(ceil(count(*) / {batch_size}.0) AS INT) AS its_real
                FROM x GROUP BY shard),
      maxit AS (SELECT {strict_it} AS max_it FROM params),
      head AS (SELECT shard, local, {id_col} FROM x WHERE local < {batch_size})
      , topits AS (SELECT shard,
                          unnest(range(its_real::BIGINT, max_it::BIGINT)) AS it
                   FROM stats CROSS JOIN maxit)
      SELECT shard, (local // {batch_size})::INT AS iteration, {id_col} FROM x
      UNION ALL
      SELECT h.shard, ti.it::INT AS iteration, h.{id_col}
      FROM topits ti JOIN head h ON h.shard = ti.shard
      {ext}"""
