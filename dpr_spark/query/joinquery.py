"""Relation join queries — rank PARENT entities by the relevance of
their CHILD documents: the Elasticsearch `has_child` query (Lucene
join module, ToParentBlockJoinQuery / ScoreMode) re-expressed for a
web corpus, where the natural parent of a page is its site/source and
the serving question is "which SITES are most relevant", not "which
pages".

Contract (ES has_child):

    score(parent) = mode over {bm25(q, child) : child matches}
    mode ∈ {max, sum, avg, none};  min_children / max_children bound
    the qualifying child count (a parent outside the bounds drops out).

`none` ranks parents as filters only (matched == qualifying), ordered
by parent id — ES's score_mode=none.

Scale shape: children score through the ordinary exact BM25 plan
(postings probed in place, query terms broadcast); the child→parent
map is a narrow 2-column table that sort-merge-joins on doc_id (or
stays exchange-free when bucketed by doc_id); the parent fold is one
groupBy over already-scored candidate rows — map-side partial agg, no
doc-sized shuffle beyond the candidates themselves. The per-query
top-k of parents rides the same window as every other searcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.scorer import score_exact

SCORE_MODES = ("max", "sum", "avg", "none")


def has_child_search(
    queries: DataFrame,
    index: InvertedIndex,
    child_parent: DataFrame,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int = 0,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(qid, rank, parent, score, n_children): top-k parents per query.

    child_parent: (doc_id, parent) — the join field (ES join-field
    mapping). A child with no parent row never contributes; a parent's
    n_children counts its MATCHING children for this query.
    max_children=0 means unbounded (the ES default)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    scored = score_exact(queries, index, k1=k1, b=b)
    withp = scored.join(child_parent.select("doc_id", "parent"), "doc_id")
    agg = withp.groupBy("qid", "parent").agg(
        F.count("*").alias("n_children"),
        F.max("score").alias("_max"),
        F.sum("score").alias("_sum"),
        F.avg("score").alias("_avg"),
    )
    cond = F.col("n_children") >= min_children
    if max_children:
        cond = cond & (F.col("n_children") <= max_children)
    agg = agg.filter(cond)
    if score_mode == "none":
        out = agg.select("qid", "parent", F.lit(0.0).alias("score"), "n_children")
        order = [F.col("parent").asc()]
    else:
        out = agg.select(
            "qid", "parent", F.col(f"_{score_mode}").alias("score"), "n_children"
        )
        order = [F.col("score").desc(), F.col("parent").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "parent", "score", "n_children")
    )


def has_parent_search(
    queries: DataFrame,
    index: InvertedIndex,
    child_parent: DataFrame,
    score: bool = True,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(qid, rank, doc_id, parent, score): top-k CHILD docs whose parent
    matches the query — the ES `has_parent` query (Lucene join module,
    the other direction of has_child): a child's score is its parent's
    BM25 score (score=True) or 0 with doc_id-ordered ranks (ES
    score=false, filter context). Parents are ordinary indexed docs;
    `child_parent` is (doc_id, parent) with `parent` a doc_id.

    Scale shape: parents score through the ordinary probe-in-place
    plan; only MATCHING parents (candidate-sized) join the child map —
    a narrow join on the parent key with no forced strategy: the child
    map is corpus-sized at web scale and must never broadcast, while
    the matched-parent side ranges from tiny (selective query → AQE
    broadcasts it) to huge (stopword query → SMJ co-partitioned on the
    key), so Catalyst/AQE picks per query."""
    parents = score_exact(queries, index, k1=k1, b=b).withColumnRenamed(
        "doc_id", "parent"
    )
    kids = child_parent.select("doc_id", "parent").join(parents, "parent")
    if score:
        out = kids.select("qid", "doc_id", "parent", "score")
        order = [F.col("score").desc(), F.col("doc_id").asc()]
    else:
        out = kids.select("qid", "doc_id", "parent", F.lit(0.0).alias("score"))
        order = [F.col("doc_id").asc()]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "parent", "score")
    )


def has_child_inner_hits(
    queries: DataFrame,
    index: InvertedIndex,
    child_parent: DataFrame,
    parents_topk: DataFrame,
    size: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
    salt_buckets=None,
    score_round: int = 0,
) -> DataFrame:
    """(qid, parent, rank, doc_id, score): the ES `inner_hits` block of
    a has_child query — for each RANKED parent (the has_child_search
    output), the `size` best-scoring matching children, score desc then
    doc_id.

    Scale shape: children re-score through the probe-in-place plan (the
    same candidate rows the parent fold consumed); the ranked-parent
    set is top-k-sized and broadcasts into it; the per-(qid, parent)
    top-size is the exact salted two-level cap."""
    from dpr_spark.extras.domains import cap_per_key

    scored = score_exact(queries, index, k1=k1, b=b).join(
        child_parent.select("doc_id", "parent"), "doc_id"
    )
    keep = parents_topk.select("qid", "parent").distinct()
    mine = scored.join(F.broadcast(keep), ["qid", "parent"], "left_semi")
    # score_round>0 ranks on round(score, d) — the cross-engine tie
    # discipline for oracle entries; 0 ranks on the raw float
    key = F.round("score", score_round) if score_round else F.col("score")
    order = [key.desc(), F.col("doc_id").asc()]
    top = cap_per_key(mine, ["qid", "parent"], order, size, salt_buckets)
    w = Window.partitionBy("qid", "parent").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "parent", "rank", "doc_id", "score"
    )


def children_bucket_agg(
    parents: DataFrame,
    children: DataFrame,
    bucket_col: str,
    child_value_col: str,
    parent_id_col: str = "doc_id",
) -> DataFrame:
    """ES `children` AGGREGATION (the aggregation twin of has_child):
    bucket PARENTS by `bucket_col`, then switch context to their CHILD
    documents and aggregate over them —
    (bucket, n_parents, n_children, avg_child_value).

    Scale shape: the parent side is projected to the 2 columns the agg
    needs before the join (id, bucket — narrow at any corpus size);
    children join on the parent id (sort-merge, or exchange-free when
    both sides are bucketed by parent id, the block-join layout) and
    fold with map-side partial aggregation. n_parents counts DISTINCT
    parents per bucket from the parent side alone — no fan-out through
    the child join can inflate it."""
    p = parents.select(
        F.col(parent_id_col).alias("_pid"), F.col(bucket_col).alias("bucket")
    )
    by_parent = p.groupBy("bucket").agg(
        F.countDistinct("_pid").alias("n_parents")
    )
    ch = children.select(
        F.col(parent_id_col).alias("_pid"),
        F.col(child_value_col).alias("_v"),
    )
    by_children = (
        ch.join(p, "_pid")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_children"),
            F.avg(F.col("_v").cast("double")).alias("avg_child_value"),
        )
    )
    return by_parent.join(by_children, "bucket", "left").select(
        "bucket",
        "n_parents",
        F.coalesce("n_children", F.lit(0)).alias("n_children"),
        "avg_child_value",
    )


def reverse_nested_agg(
    children: DataFrame,
    parents: DataFrame,
    child_key_col: str,
    parent_value_col: str,
    parent_id_col: str = "doc_id",
    size: int = 10,
    salt_buckets=None,
) -> DataFrame:
    """ES `reverse_nested` aggregation (also the `parent` agg shape):
    bucket CHILD documents by `child_key_col`, then jump back OUT to the
    parent context — per child-key bucket, the number of DISTINCT
    parent documents owning a qualifying child and the mean of a
    parent-level value over those parents. Top `size` buckets by
    (n_parents DESC, key ASC).

    Scale shape: (key, parent) pairs collapse map-side BEFORE any
    parent data joins in (the dedup is the reverse_nested semantic:
    one parent counts once per bucket however many children hit); the
    parent table then joins only the collapsed pairs. The final
    bucket ranking sees one row per DISTINCT key (vocab-sized, not
    corpus-sized); salt_buckets runs it as the two-level exact top-N
    when even that is funnel-shaped."""
    pairs = (
        children.select(
            F.col(child_key_col).alias("key"),
            F.col(parent_id_col).alias("_pid"),
        )
        .distinct()
    )
    pv = parents.select(
        F.col(parent_id_col).alias("_pid"),
        F.col(parent_value_col).cast("double").alias("_pv"),
    )
    agg = (
        pairs.join(pv, "_pid")
        .groupBy("key")
        .agg(
            F.count("*").alias("n_parents"),
            F.avg("_pv").alias("avg_parent_value"),
        )
    )
    from dpr_spark.extras.domains import cap_per_key

    order = [F.desc("n_parents"), F.asc("key")]
    top = cap_per_key(
        agg.withColumn("_g", F.lit(0)), ["_g"], order, size,
        salt_buckets=salt_buckets,
    )
    w = Window.partitionBy("_g").orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select("rank", "key", "n_parents", "avg_parent_value")
    )
