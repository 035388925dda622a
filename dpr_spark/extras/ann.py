"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k as the exact baseline, and LSH-bucketed /
IVF-style variants as the scale path (SURVEY.md M1/M2 analogs — the
reference's search_knn is exact dot-product over an in-RAM matrix,
`/root/reference/dpr/indexer/faiss_indexers.py:107-112`; its HNSW option
`:118-232` is the approximate analog).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a, b):
    """Exact cosine as pure column math (JVM-side, codegen): ordered
    left-to-right float64 fold — deterministic."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    filter_expr=None,
) -> DataFrame:
    """Exact top-k: broadcast queries x scan embeddings; ties by id.
    At scale this is one pass over the corpus (queries broadcast), the
    same shape FAISS Flat gives the reference.

    filter_expr: optional Catalyst predicate over `emb`'s columns — the
    ES `knn.filter` contract (PRE-filter: all k results satisfy it, vs
    post-filtering which can return < k). Applied before the projection
    so Catalyst pushes it into the parquet scan (asserted in
    tests/test_plans.py)."""
    if filter_expr is not None:
        emb = emb.filter(filter_expr)
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    )
    pairs = F.broadcast(q).crossJoin(e).select(
        "qid", "vec_id", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def add_hyperplane_bucket(
    df: DataFrame, vec_col: str, num_planes: int = 16, seed: int = 42, dim: int | None = None
) -> DataFrame:
    """Append a deterministic random-hyperplane LSH bucket id: bit i =
    sign(v . h_i). Pure column math over literal plane arrays (seeded) —
    no UDF, no shuffle."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long"))
    return df.withColumn("bucket", bucket)


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qv",
    seed: int = 42,
    rank_round: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = vectors whose hyperplane bucket is
    within `probe_hamming` bits of the query's bucket (multi-probe),
    exact cosine re-rank inside. Recall/cost dial = num_planes x probes.
    This is the IVF/LSH scale path: the corpus is scanned once to bucket
    (or pre-bucketed at write time), queries touch only nearby buckets.
    `rank_round` ranks by the cosine ROUNDED to that many decimals (ties
    by vec_id) so rank order is replayable across engines that differ in
    the last ulp."""
    dim = len(emb.select(vec_col).first()[0])
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    e = add_hyperplane_bucket(e, "v", num_planes, seed, dim)
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.transform(qvec_col, lambda x: x.cast("double")).alias("qv"),
    )
    q = add_hyperplane_bucket(q, "qv", num_planes, seed, dim).withColumnRenamed(
        "bucket", "qbucket"
    )
    # multi-probe: query bucket + all buckets at hamming distance <= h
    probes = [0]
    if probe_hamming >= 1:
        probes += [1 << i for i in range(num_planes)]
    if probe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    q = q.withColumn(
        "bucket", F.explode(F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in probes]))
    )
    cand = F.broadcast(q).join(e, "bucket").select(
        "qid", "vec_id", cosine_expr(F.col("qv"), F.col("v")).alias("cosine")
    ).dropDuplicates(["qid", "vec_id"])
    sort_score = (
        F.round("cosine", rank_round) if rank_round is not None else F.col("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(sort_score), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine")
    )
