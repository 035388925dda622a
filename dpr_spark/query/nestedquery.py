"""ES ``nested`` query — block-join scoring over nested sub-documents.

ES's ``nested`` field type indexes each element of an object array as
its OWN hidden Lucene document, stored in the same block as its parent;
a ``nested`` query scores every nested doc independently and joins the
scores back to the parent with ``score_mode`` (max / sum / avg), with
``inner_hits`` exposing the best-matching child. Lucene implements the
join with block-adjacent doc ids (ToParentBlockJoinQuery). This is the
last member of the join-query family next to has_child / has_parent
(query/joinquery.py) — those join SEPARATE documents; ``nested`` joins
a document to parts of ITSELF, which is how a web index scores long
pages by their best paragraph without losing them to length
normalization.

Spark-first design
------------------
- Children ARE index documents: a parent's paragraphs get child doc ids
  ``parent_id * 2^CHILD_BITS + child_ix`` — the same contiguous-block
  id layout Lucene uses, so the parent join is integer arithmetic
  (``child_id >> CHILD_BITS``), not a lookup table that would need its
  own shuffle at 10^12 docs.
- The child corpus is built by the REAL index build (same tokenizer,
  dictionary, df/avgdl over children — exactly ES: nested stats are
  child-level) and searched by the production segments engine.
- ``score_mode='max'`` retrieves the exact parent top-k from a child
  top-(k·maxc) where maxc = max children per parent: if parent P is in
  the true top-k, every child beating P's best child belongs to one of
  the ≤ k-1 parents ranked above P, each owning ≤ maxc children, so
  P's best child sits within child-rank (k-1)·maxc + 1. One bounded
  child search, no exhaustive scan.
- ``score_mode in ('sum', 'avg')`` needs EVERY matching child per
  surviving parent, so it folds the exhaustive exact scorer's
  candidates (documented cost; max is the serving mode).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CHILD_BITS = 20  # <= 2^20 children per parent; parent ids < 2^43


def nested_children(
    docs: DataFrame, width: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """docs -> one row per nested sub-document (the paragraph split):
    (doc_id, child_ix, chunk). Reuses the chunking primitive (T5)."""
    from dpr_spark.functions.chunking import chunk_text

    c = chunk_text(docs, text_col=text_col, id_col=id_col, max_words=width)
    return c.select(
        F.col(id_col).alias("doc_id"),
        F.col("chunk_id").alias("child_ix"),
        "chunk",
    )


def nested_search(
    spark: SparkSession,
    queries: DataFrame,
    children: DataFrame,
    k: int = 10,
    score_mode: str = "max",
) -> DataFrame:
    """queries(qid, question) × children(doc_id, child_ix, chunk) ->
    (qid, rank, doc_id, score, best_child_ix, best_child_score).

    Child-level BM25 (stats over the child corpus, the ES nested
    contract), parent score = score_mode over its matching children;
    inner_hits = the best child (ties -> smallest child_ix). Parents
    rank (score desc, doc_id asc)."""
    if score_mode not in ("max", "sum", "avg"):
        raise ValueError("score_mode must be max, sum, or avg")
    from dpr_spark.index.build import build_index_from_docs

    child_docs = children.select(
        (
            F.col("doc_id") * F.lit(1 << CHILD_BITS) + F.col("child_ix")
        ).alias("doc_id"),
        F.col("chunk").alias("text"),
    )
    idx = build_index_from_docs(spark, child_docs, build_blocks=False)

    if score_mode == "max":
        from dpr_spark.query.wand import build_impact_segments, search_segments

        maxc = children.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
        seg = build_impact_segments(idx, num_buckets=16)
        hits = search_segments(spark, queries, idx, seg, k=int(k) * int(maxc))
    else:
        # exhaustive: every candidate child, no top-k cutoff inside the
        # child search (sum/avg must see all matching children)
        from dpr_spark.query.scorer import score_exact

        hits = score_exact(queries, idx)

    parent = F.shiftright("doc_id", CHILD_BITS).alias("parent_id")
    child_ix = (
        F.col("doc_id") % F.lit(1 << CHILD_BITS)
    ).cast("int").alias("child_ix")
    per_child = hits.select("qid", parent, child_ix, "score")
    agg = {
        "max": F.max("score"),
        "sum": F.sum("score"),
        "avg": F.avg("score"),
    }[score_mode]
    # best child: max (score, -child_ix) struct — ties pick the earliest
    best = F.max(F.struct(F.col("score"), (-F.col("child_ix")).alias("nix")))
    parents = per_child.groupBy("qid", "parent_id").agg(
        agg.alias("score"), best.alias("b")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("parent_id"))
    return (
        parents.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "rank",
            F.col("parent_id").alias("doc_id"),
            "score",
            (-F.col("b.nix")).cast("int").alias("best_child_ix"),
            F.col("b.score").alias("best_child_score"),
        )
    )
