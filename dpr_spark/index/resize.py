"""Index shrink / split — the ES ``_shrink`` / ``_split`` lifecycle
APIs over the routed posting layout (query/routing.py).

ES resizes an index without re-indexing because routing always hashes
into a fixed ``number_of_routing_shards`` space and a legal resize
keeps the shard count a divisor of it: a document's new shard is a
deterministic function of its stored routing hash. This module is the
same contract Spark-first:

- the layout stores ``rbucket = hash % R`` per posting row; a resize
  to M shards (M | R, and M a divisor or multiple of the current count
  — the ES factor rule) re-places every row at ``rbucket % M``: pure
  column math, ONE shuffle on the new bucket, no re-tokenize, no
  corpus access;
- shard-LOCAL statistics (per-bucket df / N / avgdl) genuinely change
  when shards merge or split — exactly as Lucene segment merges change
  them under ES. They are recomputed exactly from the stored raw
  (tf, doclen) columns with the same shared impact expression the
  build uses, so ``shrink(build(N), M)`` is row- and float-identical
  to ``build(M)`` (asserted in tests/test_resize.py);
- GLOBAL impacts are corpus-level and layout-invariant: the column is
  copied through verbatim.

Scale shape: a resize reads each posting row once, shuffles once on
the target bucket (plus two shard-sized aggregates for the new local
stats), and writes sorted-by-term partitions — the same write
discipline as the build, so row-group term-skipping survives the
resize. Reference analog: the reference rebuilds its dense index to
re-shard (`/root/reference/dense_retriever.py` loads fixed shard
files); the sparse engine resizes in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark.query.routing import (
    idf_expr,
    impact_expr,
    read_layout_meta,
    write_layout_meta,
)


def resize_layout(
    spark: SparkSession, src_path: str, dst_path: str, num_target: int
) -> dict:
    """Rewrite the routed layout at ``src_path`` to ``num_target``
    shards at ``dst_path``; returns the new meta. Enforces the ES
    factor rule: the target must divide the routing-shard count, and
    must be a divisor (shrink) or a multiple (split) of the current
    shard count."""
    meta = read_layout_meta(src_path)
    n_src, r = int(meta["num_buckets"]), int(meta["num_routing_shards"])
    if num_target <= 0 or r % num_target != 0:
        raise ValueError(
            f"target {num_target} must divide num_routing_shards={r}"
        )
    if not (n_src % num_target == 0 or num_target % n_src == 0):
        raise ValueError(
            f"target {num_target} must be a factor or multiple of "
            f"current {n_src} (ES resize rule)"
        )
    post = spark.read.parquet(src_path)
    re_placed = post.select(
        F.pmod(F.col("rbucket"), F.lit(num_target)).cast("int").alias("bucket"),
        "term",
        "doc_id",
        "tf",
        "doclen",
        "rbucket",
        "impact_global",
    )
    ds = re_placed.select("bucket", "doc_id", "doclen").distinct()
    bstats = ds.groupBy("bucket").agg(
        F.count("*").cast("double").alias("n_b"),
        F.avg("doclen").alias("avgdl_b"),
    )
    df_local = re_placed.groupBy("bucket", "term").agg(
        F.count("*").alias("df_b")
    )
    k1, b = float(meta["k1"]), float(meta["b"])
    out = (
        re_placed.join(df_local, ["bucket", "term"])
        .join(F.broadcast(bstats), "bucket")
        .select(
            "bucket",
            "term",
            "doc_id",
            "tf",
            "doclen",
            "rbucket",
            impact_expr(
                idf_expr(F.col("df_b"), F.col("n_b")), F.col("avgdl_b"), k1, b
            ).alias("impact_local"),
            "impact_global",
        )
    )
    out.repartition("bucket").sortWithinPartitions("term", "doc_id").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(dst_path)
    new_meta = dict(meta, num_buckets=int(num_target))
    write_layout_meta(dst_path, new_meta)
    return new_meta


def shrink_layout(
    spark: SparkSession, src_path: str, dst_path: str, num_target: int
) -> dict:
    """ES ``_shrink``: target must be a factor of the current count."""
    n_src = int(read_layout_meta(src_path)["num_buckets"])
    if n_src % num_target != 0:
        raise ValueError(f"shrink target {num_target} must divide {n_src}")
    return resize_layout(spark, src_path, dst_path, num_target)


def split_layout(
    spark: SparkSession, src_path: str, dst_path: str, num_target: int
) -> dict:
    """ES ``_split``: target must be a multiple of the current count."""
    n_src = int(read_layout_meta(src_path)["num_buckets"])
    if num_target % n_src != 0:
        raise ValueError(f"split target {num_target} must be a multiple of {n_src}")
    return resize_layout(spark, src_path, dst_path, num_target)
