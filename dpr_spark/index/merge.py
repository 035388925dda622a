"""Index merge — combine independently built inverted indexes WITHOUT
retokenizing (the Lucene segment-merge analog; the north rule names the
pipeline explicitly: posting-list construction, MERGE, compression,
top-k scoring).

Why a real merge and not a rebuild: at 10^12 docs the tokenize pass is
the dominant build cost (two Arrow passes over every byte of text). A
crawl arrives in waves that are indexed independently (per-day builds,
per-source builds, the NRT delta's compaction output); combining them
must touch only index-sized tables — dictionaries (vocab rows) and
postings (posting rows) — never the raw pages.

Merged-output contract (asserted in tests/test_merge.py): the merged
index is IDENTICAL to a fresh build over the concatenated corpus —
same dictionary (term -> term_id dense rank over the union vocabulary,
same df/idf floats), same postings, same stats — so every engine
(exact / segments / blockmax / phrase) returns bit-identical results
on it. This holds because the per-side inputs are exact sufficient
statistics: df_merged = Σ df_side (doc spaces are disjoint),
sum_doclen = Σ side sums (integer arithmetic), and tf/doclen rows pass
through untouched; only term_id is rewritten.

Cost shape at scale: one vocab-sized union+sum (dictionary merge), one
vocab-ranked id assignment, and one map-side id rewrite per side's
postings (join against a broadcast old->new id map; at a 10^9-term
vocabulary the id map exceeds broadcast and the join degrades to a
co-partitioned shuffle on term_id — the same cost Lucene pays
rewriting postings at merge time). The doc-sized tables (docstats,
postings, positions) are only UNIONED, never shuffled by doc.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1
from dpr_spark.index.build import IndexStats, InvertedIndex, _encode_blocks
from dpr_spark.plans.ids import assign_dense_ids


def _union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)


def merge_indexes(
    spark: SparkSession,
    indexes: Sequence[InvertedIndex],
    build_blocks: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    check_disjoint: bool = True,
    cleanup: Optional[list] = None,
) -> InvertedIndex:
    """N-way merge of already-built indexes over DISJOINT doc_id spaces
    (Lucene segments are doc-disjoint by construction; ours come from
    disjoint crawl waves or a partitioned build).

    check_disjoint: verify no doc_id appears in two inputs (one
    distinct-count over the unioned doc_id column — doc-sized but
    2-column-narrow). Disable only when disjointness is guaranteed by
    construction (e.g. range-partitioned builds).

    Positions merge when EVERY input carries them (a half-positional
    merge would silently serve wrong phrase results); otherwise the
    merged index has positions=None.
    """
    indexes = list(indexes)
    if len(indexes) < 2:
        raise ValueError("merge_indexes needs at least two indexes")
    cleanup = cleanup if cleanup is not None else []

    n_docs = sum(ix.stats.n_docs for ix in indexes)
    docstats = _union_all([ix.docstats.select("doc_id", "url", "doclen") for ix in indexes])
    if check_disjoint:
        distinct = docstats.select("doc_id").distinct().count()
        if distinct != n_docs:
            raise ValueError(
                f"doc_id spaces overlap: {n_docs} docs across inputs, "
                f"{distinct} distinct doc_ids — merge requires disjoint "
                "doc spaces (dedup/latest-wins upstream, or compact())"
            )

    # merged vocabulary: df adds exactly because doc spaces are disjoint.
    vocab = (
        _union_all([ix.dictionary.select("term", "df") for ix in indexes])
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    # same id rule as a fresh build (_finish_index): dense rank by term
    ranked = assign_dense_ids(vocab, "term", "term_id", cleanup=cleanup)

    # exact integer doclen sum -> bit-identical avgdl vs a fresh build
    sum_dl = docstats.agg(F.sum("doclen")).first()[0] or 0
    stats = IndexStats(n_docs, float(sum_dl) / n_docs if n_docs else 0.0)

    dictionary = ranked.withColumn(
        "idf",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
    ).select("term", F.reverse("term").alias("rterm"), "term_id", "df", "idf")

    # per-side old->new id maps (vocab-sized, term strings never ride
    # with the postings); the postings rewrite is one narrow join each
    have_positions = all(ix.positions is not None for ix in indexes)
    post_parts, pos_parts = [], []
    for ix in indexes:
        idmap = (
            ix.dictionary.select("term", F.col("term_id").alias("_old"))
            .join(dictionary.select("term", "term_id"), "term")
            .select("_old", "term_id")
        )
        bmap = F.broadcast(idmap)
        post_parts.append(
            ix.postings.withColumnRenamed("term_id", "_old")
            .join(bmap, "_old")
            .select("term_id", "doc_id", "tf", "doclen")
        )
        if have_positions:
            pos_parts.append(
                ix.positions.withColumnRenamed("term_id", "_old")
                .join(bmap, "_old")
                .select("term_id", "doc_id", "tf", "doclen", "positions")
            )
    postings = _union_all(post_parts)
    positions = _union_all(pos_parts) if have_positions else None

    blocks = None
    if build_blocks:
        par = spark.sparkContext.defaultParallelism
        blocks = _encode_blocks(
            postings.join(F.broadcast(dictionary.select("term_id", "idf")), "term_id"),
            stats.avgdl,
            k1=k1,
            b=b,
            num_partitions=2 * par,
        )

    strategies = {ix.id_strategy for ix in indexes}
    merged = InvertedIndex(
        docstats,
        dictionary,
        postings,
        blocks,
        stats,
        cached=cleanup,
        id_strategy=strategies.pop() if len(strategies) == 1 else None,
    )
    merged.positions = positions
    return merged
