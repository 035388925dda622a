"""Document deletion — the Lucene delete lifecycle on our index:

- delete-by-id / delete-by-url produce a TOMBSTONE set (Lucene's
  deleted-docs bitset, kept index-side, never mutating postings);
- searches exclude tombstoned docs at candidate time (liveDocs applied
  in the postings iterator) while term statistics (df, N, avgdl) stay
  STALE until a purge — exactly Lucene's documented trade: deletes are
  cheap, statistics catch up at merge;
- purge_deletes rewrites the index WITHOUT the tombstoned docs and is
  bit-identical to a fresh build over the surviving corpus (same
  dictionary dense-rank ids, df/idf/avgdl floats, postings) — the
  merge-time reclaim, implemented by reusing the build's own back half
  (_finish_index) on the filtered posting rows.

Scale shape: a tombstone set is operationally small relative to the
corpus (Lucene keeps it in RAM per segment); it broadcasts into the
anti-joins and ships to the segments kernel as one sorted int64 array.
The purge touches posting-sized tables once — the same cost a
compaction/merge already pays.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.index.build import InvertedIndex, _finish_index


def deletes_for_urls(index: InvertedIndex, urls: DataFrame) -> DataFrame:
    """(doc_id) tombstones for the given urls(url) — delete-by-term on
    the unique key (Lucene deleteDocuments(Term)). The tiny url set
    broadcasts into the docstats scan."""
    return index.docstats.join(
        F.broadcast(urls.select("url").distinct()), "url", "left_semi"
    ).select("doc_id")


def exclude_deleted(candidates: DataFrame, deletes: DataFrame) -> DataFrame:
    """Drop tombstoned docs from a candidate/result DataFrame BEFORE its
    top-k (liveDocs filter). Broadcast anti-join — tombstones are the
    small side by contract."""
    return candidates.join(
        F.broadcast(deletes.select("doc_id")), "doc_id", "left_anti"
    )


def deletes_array(deletes: DataFrame) -> np.ndarray:
    """Sorted int64 doc_ids for the segments kernel (the in-RAM liveDocs
    form; one driver collect of the tombstone set)."""
    return np.array(
        sorted(r.doc_id for r in deletes.select("doc_id").distinct().collect()),
        dtype=np.int64,
    )


def purge_deletes(
    spark: SparkSession,
    index: InvertedIndex,
    deletes: DataFrame,
    build_blocks: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> InvertedIndex:
    """Rewrite the index without the tombstoned docs — bit-identical to
    a fresh build over the surviving corpus (asserted in
    tests/test_deletes.py): surviving posting rows are recovered with
    their term STRINGS (one dictionary join), then the build's own back
    half recomputes doclens, df, dense term ids, idf, avgdl and blocks
    from them. Terms whose every doc died drop out of the dictionary,
    exactly as a fresh build would never see them."""
    live_stats = exclude_deleted(index.docstats, deletes).select("doc_id", "url")
    n_live = live_stats.count()
    tf_live = (
        exclude_deleted(index.postings, deletes)
        .join(F.broadcast(index.dictionary.select("term_id", "term")), "term_id")
        .select("term", "doc_id", "tf", "doclen")
        .persist()
    )
    n_tf_live = tf_live.count()
    cleanup: list = []
    purged = _finish_index(
        spark, tf_live, live_stats, n_live,
        build_blocks=build_blocks, k1=k1, b=b, cleanup=cleanup,
        id_strategy=index.id_strategy, n_tf=n_tf_live,
    )
    if index.positions is not None:
        idmap = (
            index.dictionary.select("term", F.col("term_id").alias("_old"))
            .join(purged.dictionary.select("term", "term_id"), "term")
            .select("_old", "term_id")
        )
        purged.positions = (
            exclude_deleted(index.positions, deletes)
            .withColumnRenamed("term_id", "_old")
            .join(F.broadcast(idmap), "_old")
            .select("term_id", "doc_id", "tf", "doclen", "positions")
        )
    return purged
