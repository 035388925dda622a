"""Custom routing / shard-targeted search (the ES ``?routing=`` surface).

A web-scale index shards documents; a query that is known to live in one
tenant/domain/partition should touch ONE shard, not all of them. ES
exposes this as custom routing: index a doc with ``routing=<key>`` and
the doc lands on shard ``hash(key) % num_shards``; search with the same
routing value and only that shard is visited. The reference's retriever
has no routing (it always scans the whole index per query,
``/root/reference/dense_retriever.py:337-379`` iterates every shard
result); at 10^12 documents routed queries are the difference between a
1/N-index scan and a full one, so the engine grows the surface here.

Spark-first design
------------------
- The routed at-rest layout is ONE parquet dataset ``partitionBy("bucket")``
  — a routed query filters ``bucket IN (...)`` and Spark's scan prunes to
  the matching partition DIRECTORIES (``PartitionFilters`` in the plan,
  asserted in tests/test_plans.py). No per-shard index objects, no
  driver-side shard dispatch: partition pruning IS the shard targeting.
- Both ES search types are served from the same layout by precomputing
  two impact columns per posting at build time:

  * ``impact_local``  — BM25 with SHARD-LOCAL statistics (per-bucket
    df/N/avgdl). This is ES's default ``query_then_fetch``: each shard
    scores with its own statistics, including the documented
    small-shard idf bias.
  * ``impact_global`` — BM25 with CORPUS-WIDE statistics, ES's
    ``dfs_query_then_fetch``. ES pays a per-query dfs round trip to
    collect the global stats; in a batch engine the dfs phase runs once
    at build time as a plain aggregation — Spark-idiomatic, same math.

- Build is one tokenize pass; per-bucket stats ride a (bucket) groupBy,
  per-(bucket, term) df a (bucket, term) groupBy — both shuffle keys
  carry the bucket, so a skewed routing key skews only its own shard,
  exactly the failure mode ES documents for custom routing.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1

DEFAULT_NUM_BUCKETS = 16


def route_bucket(col, num_buckets: int, portable: bool = False) -> Column:
    """routing key -> shard id. Default xxhash64 (JVM-side, the engine
    hash); ``portable=True`` derives the bucket from md5 — same pattern
    as functions/chunking.py::shuffle_key — so a SQL oracle can replay
    the identical placement. The md5-derived 60-bit value is
    non-negative, so ``%`` and ``pmod`` agree across engines."""
    if isinstance(col, str):
        col = F.col(col)
    if portable:
        h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        )
    else:
        h = F.xxhash64(col)
    return F.pmod(h, F.lit(num_buckets)).cast("int")


def route_bucket_sql(expr: str, num_buckets: int) -> str:
    """DuckDB spelling of the portable route_bucket (oracle twin)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {num_buckets})::INT"


# number of routing shards (ES ``index.number_of_routing_shards``): the
# fixed hash space rbucket = hash % R stored in the layout; an index
# with N shards (N | R) places docs at bucket = rbucket % N, so any
# resize to M with M | R is pure column math on the stored rbucket —
# no re-hash, no re-tokenize (see index/resize.py)
DEFAULT_NUM_ROUTING_SHARDS = 1024


def idf_expr(df_col: Column, n) -> Column:
    """BM25 idf over a df column and a doc count (column or literal)."""
    return F.log((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def impact_expr(idf: Column, avgdl, k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """Per-posting BM25 impact from tf/doclen columns + an idf column
    and an avgdl (column or literal) — the ONE impact definition shared
    by the build and every layout rewrite, so a resize recomputes
    shard-local impacts bit-identically to a fresh build."""
    return (
        idf
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("doclen").cast("double") / avgdl
            )
        )
    )


def build_routed_layout(
    spark: SparkSession,
    docs: DataFrame,
    routing_col: str,
    path: str,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    portable: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    lowercase_first: bool = True,
    num_routing_shards: int = DEFAULT_NUM_ROUTING_SHARDS,
) -> None:
    """docs(doc_id, text, <routing_col>) -> parquet at ``path``
    partitioned by ``bucket`` with columns
    (term, doc_id, tf, doclen, rbucket, impact_local, impact_global),
    plus a ``_layout_meta.json`` sidecar.

    One tokenize pass feeds doclen, per-bucket stats, global stats, tf,
    and both df flavors; postings are sorted by term within each shard
    partition so the term probe row-group-skips at rest.

    The raw (tf, doclen) columns and the routing-space hash
    ``rbucket = hash % num_routing_shards`` exist so a later shrink or
    split (index/resize.py) can re-place rows (``rbucket % M``) and
    recompute shard-local impacts EXACTLY, without the corpus text.
    ES contract: num_buckets must divide num_routing_shards."""
    from dpr_spark.functions.tokenizer import tokenize_col

    if num_routing_shards % num_buckets != 0:
        raise ValueError(
            f"num_buckets={num_buckets} must divide "
            f"num_routing_shards={num_routing_shards}"
        )
    toks = docs.select(
        "doc_id",
        route_bucket(routing_col, num_routing_shards, portable).alias("rbucket"),
        tokenize_col("text", lowercase_first=lowercase_first).alias("toks"),
    )
    # bucket = rbucket % N == hash % N when N | R (pmod output >= 0)
    toks = toks.withColumn(
        "bucket", F.pmod(F.col("rbucket"), F.lit(num_buckets)).cast("int")
    )
    tf = (
        toks.select(
            "bucket",
            "rbucket",
            "doc_id",
            F.size("toks").alias("doclen"),
            F.explode("toks").alias("term"),
        )
        .groupBy("bucket", "rbucket", "doc_id", "doclen", "term")
        .agg(F.count("*").alias("tf"))
    ).persist()
    ds = tf.select("bucket", "doc_id", "doclen").distinct()
    # dfs phase (global stats): one agg each, done once at build time
    bstats = ds.groupBy("bucket").agg(
        F.count("*").cast("double").alias("n_b"), F.avg("doclen").alias("avgdl_b")
    )
    grow = ds.agg(
        F.count("*").cast("double").alias("n_g"), F.avg("doclen").alias("avgdl_g")
    ).collect()[0]
    n_g, avgdl_g = float(grow["n_g"]), float(grow["avgdl_g"])
    df_local = tf.groupBy("bucket", "term").agg(F.count("*").alias("df_b"))
    df_global = tf.groupBy("term").agg(F.count("*").alias("df_g"))

    post = (
        tf.join(df_local, ["bucket", "term"])
        .join(df_global, "term")
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
            impact_expr(
                idf_expr(F.col("df_g"), F.lit(n_g)), F.lit(avgdl_g), k1, b
            ).alias("impact_global"),
        )
    )
    post.repartition("bucket").sortWithinPartitions("term", "doc_id").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)
    tf.unpersist()
    write_layout_meta(
        path,
        {
            "num_buckets": int(num_buckets),
            "num_routing_shards": int(num_routing_shards),
            "portable": bool(portable),
            "k1": float(k1),
            "b": float(b),
            "lowercase_first": bool(lowercase_first),
        },
    )


def _meta_path(path: str) -> str:
    import os

    return os.path.join(path, "_layout_meta.json")


def write_layout_meta(path: str, meta: dict) -> None:
    import json

    with open(_meta_path(path), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


def read_layout_meta(path: str) -> dict:
    import json

    with open(_meta_path(path)) as f:
        return json.load(f)


def routed_scan(
    spark: SparkSession, path: str, buckets: Sequence[int]
) -> DataFrame:
    """The shard-targeted scan: ``bucket IN (...)`` on the partitioned
    layout is partition pruning — only the matching shard directories
    are listed and read."""
    post = spark.read.parquet(path)
    return post.filter(F.col("bucket").isin([int(x) for x in buckets]))


def resolve_routing(
    spark: SparkSession,
    routings: Sequence[str],
    num_buckets: int,
    portable: bool = False,
) -> dict:
    """routing value -> bucket, via the SAME column expression the build
    used (one tiny local-relation job; never a guess re-implemented in
    Python that could drift from the JVM hash)."""
    vals = sorted(set(routings))
    if not vals:
        return {}
    df = spark.createDataFrame([(v,) for v in vals], "routing string")
    rows = df.select(
        "routing", route_bucket("routing", num_buckets, portable).alias("bucket")
    ).collect()
    return {r["routing"]: int(r["bucket"]) for r in rows}


def search_routed(
    spark: SparkSession,
    layout_path: str,
    queries: Sequence[Tuple[int, str, str]],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    k: int = 10,
    mode: str = "local",
    portable: bool = False,
) -> DataFrame:
    """queries: (qid, question, routing). Each query searches ONLY the
    shard its routing value hashes to. ``mode='local'`` scores with
    shard-local statistics (ES query_then_fetch); ``mode='global'``
    with corpus-wide ones (dfs_query_then_fetch).

    -> (qid, rank, doc_id, score). The query side is tiny by contract
    (a serve wave) and broadcasts into the pruned postings scan."""
    if mode not in ("local", "global"):
        raise ValueError("mode must be 'local' or 'global'")
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    bmap = resolve_routing(
        spark, [r for _, _, r in queries], num_buckets, portable
    )
    qt_rows: List[Tuple[int, str, int]] = []
    for qid, question, routing in queries:
        bucket = bmap[routing]
        for t in sorted(set(tokenize(normalize_question(question)))):
            qt_rows.append((qid, t, bucket))
    if not qt_rows:
        raise ValueError("no tokenizable queries")
    qt = spark.createDataFrame(qt_rows, "qid long, term string, bucket int")
    cand = routed_scan(spark, layout_path, sorted({b for _, _, b in qt_rows})).join(
        F.broadcast(qt), ["bucket", "term"]
    )
    impact = "impact_local" if mode == "local" else "impact_global"
    scored = cand.groupBy("qid", "doc_id").agg(F.sum(impact).alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
