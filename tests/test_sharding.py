"""D2 ShardedDataIterator equalization vs a pure-Python twin of the
reference semantics (`reference/dpr/utils/data_utils.py:193-305`):
contiguous shards over the epoch permutation, short shards re-yield
their first batch up to max_iterations, strict mode pads a short final
batch from the shard head."""

from math import ceil

import pytest
from pyspark.sql import functions as F


def _reference_twin(ids_in_perm_order, num_shards, batch_size, strict):
    """(shard, iteration, id) triples the reference iterator would
    yield, mirroring data_utils.py:226-301 (documented intent for the
    strict extension — the reference line has a latent NameError)."""
    total = len(ids_in_perm_order)
    sps = ceil(total / num_shards)
    max_it = ceil(sps / batch_size) if strict else sps // batch_size
    out = []
    for shard in range(num_shards):
        sl = ids_in_perm_order[shard * sps : min((shard + 1) * sps, total)]
        it = 0
        for i in range(0, len(sl), batch_size):
            batch = sl[i : i + batch_size]
            if strict and len(batch) < batch_size:
                batch = batch + sl[0 : batch_size - len(batch)]
            out.extend((shard, it, d) for d in batch)
            it += 1
        while it < max_it:  # "Fulfilling non complete shard"
            out.extend((shard, it, d) for d in sl[0:batch_size])
            it += 1
    return sorted(out)


@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("n,shards,batch", [(100, 6, 8), (97, 4, 10), (60, 3, 20)])
def test_sharded_epoch_matches_reference_twin(spark, n, shards, batch, strict):
    from dpr_spark.functions.chunking import shuffle_key
    from dpr_spark.functions.sharding import sharded_epoch_batches

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    got = sorted(
        (r.shard, r.iteration, r.doc_id)
        for r in sharded_epoch_batches(
            df, "doc_id", shards, batch, epoch=2, seed=5, strict_batch_size=strict
        ).collect()
    )
    perm = [
        r.doc_id
        for r in df.select("doc_id", shuffle_key("doc_id", 7).alias("k"))
        .orderBy("k", "doc_id")
        .collect()
    ]
    assert got == _reference_twin(perm, shards, batch, strict)


def test_sharded_epoch_layout_independent(spark):
    from dpr_spark.functions.sharding import sharded_epoch_batches

    df = spark.range(80).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, sharded_epoch_batches(
        df, "doc_id", 4, 8, epoch=1, seed=9, strict_batch_size=True,
        portable_key=True).collect()))
    b = sorted(map(tuple, sharded_epoch_batches(
        df.repartition(7), "doc_id", 4, 8, epoch=1, seed=9, strict_batch_size=True,
        portable_key=True).collect()))
    assert a == b


def test_sharded_epoch_equal_iteration_counts(spark):
    """The reference's DDP invariant: every shard sees max_iterations
    batches in strict mode."""
    from dpr_spark.functions.sharding import sharded_epoch_batches

    df = spark.range(97).select(F.col("id").alias("doc_id"))
    rows = sharded_epoch_batches(
        df, "doc_id", 5, 8, epoch=0, seed=1, strict_batch_size=True
    )
    per = (
        rows.groupBy("shard")
        .agg(F.countDistinct("iteration").alias("its"), F.count("*").alias("n"))
        .collect()
    )
    sps = ceil(97 / 5)  # 20
    max_it = ceil(sps / 8)  # 3
    assert {r.its for r in per} == {max_it}
    assert {r.n for r in per} == {max_it * 8}  # strict: every batch full
