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
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dpr_spark import BM25_B, BM25_K1, DEFAULT_TOP_K
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
    # ONE doc-sized job: the disjointness gate (countDistinct doc_id) and
    # the exact integer doclen sum (bit-identical avgdl vs a fresh build)
    # ride the same aggregation instead of two separate actions
    srow = docstats.agg(
        F.countDistinct("doc_id").alias("nd") if check_disjoint else F.lit(None).alias("nd"),
        F.sum("doclen").alias("sd"),
    ).collect()[0]
    if check_disjoint:
        distinct = int(srow["nd"])
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
    # same id rule as a fresh build (_finish_index): dense rank by term;
    # a provably small union vocabulary (Catalyst estimate — the inputs'
    # dictionaries are usually cached with accurate stats) ranks with the
    # local window, skipping the two-phase sampler+counts jobs
    from dpr_spark.index.build import LOCAL_TERM_RANK_EST_BYTES, _plan_size_bytes

    vest = _plan_size_bytes(vocab)
    vlocal = vest is not None and vest <= LOCAL_TERM_RANK_EST_BYTES
    ranked = assign_dense_ids(vocab, "term", "term_id", cleanup=cleanup, local=vlocal)
    if vlocal:
        ranked = ranked.persist()
        cleanup.append(ranked)

    sum_dl = srow["sd"] or 0
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


def _sum_doclen(ix: InvertedIndex) -> int:
    """Exact integer Σdoclen recovered from stats: avgdl = Σdl/N in
    float64, and round(avgdl·N) is exact while Σdl·2^-52 < 0.5 — true up
    to Σdl ≈ 2^52 (a 10^12-doc × 300-token corpus is ~3·10^14, error
    ~0.07), so no extra docstats pass per search."""
    return int(round(ix.stats.avgdl * ix.stats.n_docs))


def search_across(
    spark: SparkSession,
    queries: DataFrame,
    indexes: Sequence[InvertedIndex],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k ACROSS unmerged segments with globally blended
    statistics — Lucene's multi-segment IndexSearcher contract: term
    statistics (df, N, avgdl) aggregate over all segments at query time,
    scoring runs per segment, results union into one global top-k.

    Bit-identical to searching the merged index (and a fresh build over
    the union — asserted in tests/test_merge.py): global df is the exact
    per-segment sum (disjoint docs), avgdl the exact blended mean, and a
    doc's components fold in ascending LOCAL term_id — the dense rank by
    term restricted to a sub-corpus vocabulary preserves term order, so
    the fold order equals the merged index's ascending merged-term_id
    fold for every doc.

    Cost shape: only query-term rows leave any dictionary (broadcast
    semi-probe per segment); each segment's postings are probed in place
    exactly as single-index search does; the final window sees the union
    of per-segment candidates. This is what makes the merge policy a
    THROUGHPUT choice (fewer probes, better compression) rather than a
    correctness requirement — Lucene's position exactly."""
    from dpr_spark.query.scorer import query_terms, top_k

    indexes = list(indexes)
    if not indexes:
        raise ValueError("no segments")
    n_docs = sum(ix.stats.n_docs for ix in indexes)
    sum_dl = sum(_sum_doclen(ix) for ix in indexes)
    avgdl = float(sum_dl) / n_docs if n_docs else 0.0

    qt = query_terms(queries)
    needed = qt.select("term").distinct()
    gdf = (
        _union_all(
            [
                ix.dictionary.join(F.broadcast(needed), "term").select("term", "df")
                for ix in indexes
            ]
        )
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    gidf = gdf.select(
        "term",
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ).alias("idf"),
    )
    qti = qt.join(F.broadcast(gidf), "term")

    component = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl))
        )
    )
    scored_parts = []
    for ix in indexes:
        seg_qt = (
            ix.dictionary.select("term", "term_id")
            .join(F.broadcast(qti), "term")
            .select("qid", "term_id", "idf")
        )
        joined = ix.postings.join(F.broadcast(seg_qt), "term_id")
        parts = joined.select(
            "qid",
            "doc_id",
            F.struct(F.col("term_id"), component.alias("component")).alias("tc"),
        )
        scored_parts.append(
            parts.groupBy("qid", "doc_id")
            .agg(F.sort_array(F.collect_list("tc")).alias("tcs"))
            .select(
                "qid",
                "doc_id",
                F.aggregate(
                    "tcs", F.lit(0.0), lambda acc, x: acc + x["component"]
                ).alias("score"),
            )
        )
    return top_k(_union_all(scored_parts), k)


class TieredMergePolicy:
    """Which segments to merge, and when — Lucene TieredMergePolicy's
    public contract, simplified: segments are tiered by size (tier =
    floor(log_factor(n_docs))), and any tier holding >= merge_factor
    segments merges them (size-similar inputs make merges cheap and keep
    the segment count logarithmic in corpus size). max_merged_docs caps
    a merge's output so one mega-segment never re-merges forever."""

    def __init__(self, merge_factor: int = 4, max_merged_docs: Optional[int] = None):
        if merge_factor < 2:
            raise ValueError("merge_factor >= 2")
        self.merge_factor = merge_factor
        self.max_merged_docs = max_merged_docs

    def select(self, sizes: Sequence[int]) -> List[List[int]]:
        """[n_docs per segment] -> groups of segment POSITIONS to merge
        (each group >= merge_factor members, same size tier, output under
        max_merged_docs). Deterministic: positions ascend within a group."""
        import math

        tiers = {}
        for i, n in enumerate(sizes):
            t = int(math.log(max(n, 1), self.merge_factor))
            tiers.setdefault(t, []).append(i)
        groups = []
        for t in sorted(tiers):
            members = tiers[t]
            while len(members) >= self.merge_factor:
                take = members[: self.merge_factor]
                if (
                    self.max_merged_docs is not None
                    and sum(sizes[i] for i in take) > self.max_merged_docs
                ):
                    break
                groups.append(take)
                members = members[self.merge_factor :]
        return groups


class SegmentSet:
    """A live collection of disjoint-doc segments: crawl waves / NRT
    compaction outputs land via add(); queries run across ALL segments
    with blended statistics (search, bit-identical to one merged index);
    maybe_merge() applies a TieredMergePolicy in the background the way
    Lucene's merge scheduler does — correctness never depends on it."""

    def __init__(self, indexes: Sequence[InvertedIndex] = ()):
        self.segments: List[InvertedIndex] = list(indexes)

    def add(self, index: InvertedIndex) -> None:
        self.segments.append(index)

    def search(
        self, spark: SparkSession, queries: DataFrame, k: int = DEFAULT_TOP_K,
        k1: float = BM25_K1, b: float = BM25_B,
    ) -> DataFrame:
        return search_across(spark, queries, self.segments, k=k, k1=k1, b=b)

    def maybe_merge(
        self,
        spark: SparkSession,
        policy: TieredMergePolicy,
        build_blocks: bool = False,
        check_disjoint: bool = False,
    ) -> int:
        """Apply one round of the policy; returns the number of merges
        performed. check_disjoint defaults OFF here: segments entered
        through add() come from disjoint waves by construction and were
        already unioned by every search."""
        groups = policy.select([ix.stats.n_docs for ix in self.segments])
        if not groups:
            return 0
        merged_out, consumed = [], set()
        for g in groups:
            merged_out.append(
                merge_indexes(
                    spark,
                    [self.segments[i] for i in g],
                    build_blocks=build_blocks,
                    check_disjoint=check_disjoint,
                )
            )
            consumed.update(g)
        self.segments = [
            ix for i, ix in enumerate(self.segments) if i not in consumed
        ] + merged_out
        return len(groups)
