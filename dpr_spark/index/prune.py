"""Static index pruning (Carmel et al., SIGIR 2001 — the top-N
variant; the impact-ordered serving trick modern learned-sparse /
impact indexes ship with): each posting list keeps only its N
highest-impact entries, everything else is dropped AT BUILD TIME.

Why a web index wants it: head terms at 10^12 docs carry posting lists
with billions of entries whose tail can never reach a top-k result —
pruning caps every list at N, bounding both the at-rest bytes and the
worst-case postings a query wave can touch, at a documented recall
trade (scores of SURVIVING postings are unchanged, so precision@k
mostly holds while deep recall degrades).

Contract (standard static pruning):
- corpus statistics (df / idf / N / avgdl) stay the FULL-corpus values
  — the lexicon "lies" about list length, surviving postings score
  bit-identically to the unpruned index;
- the prune order is the query-independent BM25 impact (rounded, ties
  doc_id asc) so the kept set is deterministic and a SQL oracle can
  replay it.

Spark shape: ONE window shuffle keyed by term_id at build time (vocab-
parallel, the same partitioning the posting encoder already uses);
serving reads strictly less afterwards. The pruned index is a plain
InvertedIndex — every existing searcher (exact / segments / blockmax)
serves it unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1


def prune_postings(index, keep_n: int, k1: float = BM25_K1, b: float = BM25_B):
    """index -> a new InvertedIndex whose posting lists keep only their
    keep_n highest-impact entries (impact rounded to 6 dp for a
    replayable order, ties doc_id asc). Dictionary, stats and docstats
    are shared unchanged (full-corpus statistics by contract)."""
    from dpr_spark.index.build import InvertedIndex, impact_expr

    if keep_n < 1:
        raise ValueError("keep_n must be >= 1")
    p = index.postings.join(
        F.broadcast(index.dictionary.select("term_id", "idf")), "term_id"
    )
    w = Window.partitionBy("term_id").orderBy(
        F.desc(F.round(impact_expr(index.stats.avgdl, k1, b), 6)),
        F.asc("doc_id"),
    )
    pruned = (
        p.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= keep_n)
        .select(*index.postings.columns)
    )
    return InvertedIndex(
        docstats=index.docstats,
        dictionary=index.dictionary,
        postings=pruned,
        blocks=None,
        stats=index.stats,
        analyzer=getattr(index, "analyzer", None),
    )
