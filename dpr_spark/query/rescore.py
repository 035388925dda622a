"""Two-stage retrieval: query rescoring — the Lucene QueryRescorer /
Elasticsearch `rescore` contract: a cheap first pass ranks the corpus,
then only the top `window` docs per query are re-scored by a more
expensive second query and re-ranked among themselves; rows below the
window keep their first-pass order and scores, appended after the
rescored block. The standard production shape for expensive rerankers
(proximity, ML models): the second stage's cost is bounded by
window · |queries|, never corpus-sized.

The second query here is the exact-phrase score of the query string
(query/phrase.py semantics — the proximity boost): docs where the
words appear adjacent in order rise; combined = first + weight · phrase.
Phrase scoring runs as the ordinary positional probe (term-keyed,
bounded by the phrase terms' postings) and joins onto the window —
candidate restriction is a join after the probe, the same shape every
restriction in this engine takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.index.build import InvertedIndex


def rescore_phrase(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    positions: DataFrame,
    first_pass: DataFrame,
    window: int = 50,
    weight: float = 1.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(qid, rank, doc_id, score, rescored) — first_pass(qid, rank,
    doc_id, score) with its top `window` rows per query re-ranked by
    score + weight·phrase_score(question), tail rows unchanged below.
    The query strings ride to the driver (bytes/query — the phrase
    engine's documented boundary)."""
    from dpr_spark.query.phrase import phrase_search_index

    qlist = [
        (int(r.qid), r.question)
        for r in queries.select("qid", "question").collect()
    ]
    # k is a no-op bound here: we need every phrase-matching doc that
    # could sit in some query's window, and matches are bounded by the
    # phrase terms' postings either way
    phr = phrase_search_index(
        spark, index, positions, qlist, k=1 << 30, k1=k1, b=b
    ).select("qid", "doc_id", F.col("score").alias("_ph"))

    win = first_pass.filter(F.col("rank") <= window).drop("rank")
    tail = first_pass.filter(F.col("rank") > window)

    comb = (
        win.join(phr, ["qid", "doc_id"], "left")
        .withColumn(
            "score",
            F.col("score") + F.lit(float(weight)) * F.coalesce("_ph", F.lit(0.0)),
        )
        .drop("_ph")
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    win2 = comb.withColumn("rank", F.row_number().over(w2)).select(
        "qid", "rank", "doc_id", "score", F.lit(True).alias("rescored")
    )
    # tail keeps first-pass order and scores below the rescored block;
    # window is a per-call constant, so first-pass ranks shift by it
    tail2 = tail.select(
        "qid", "rank", "doc_id", "score", F.lit(False).alias("rescored")
    )
    return win2.unionByName(tail2)
