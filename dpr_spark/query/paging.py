"""Result pagination (search_after) and sort-by-field result modes —
the serving-stack surface a rank-by-score searcher alone lacks
(r4 VERDICT Missing #5; Lucene analogs: IndexSearcher.searchAfter and
Sort/SortField over doc values).

Pagination contract (searchAfter, not offset): the client echoes the
LAST row of the previous page — (score, doc_id) for relevance order,
(field, doc_id) for field order — and the engine returns the k rows
strictly after it. Engine scores are deterministic bit-for-bit, so the
echoed floats reproduce the exact boundary. Unlike OFFSET paging, the
per-bucket heap still emits ≤ k rows per (query, bucket): page N's
merge window sorts the same ≤ k·B rows page 1's did, so deep pages cost
the same as page 1 (asserted in tests/test_paging.py by plan shape and
by the postings_touched counter).

Sort-by-field: Lucene's Sort(SortField) — top-k of the query's MATCHES
ordered by a stored per-doc column (recency, length, ...), not by BM25
score. Matching is OR-semantics over query terms (any-term hit), the
same match set BM25 scores; selection is a two-level exact top-N
(extras/domains.cap_per_key) so one mega-query hitting 10^8 docs cannot
funnel through a single window task.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import DEFAULT_TOP_K
from dpr_spark.extras.domains import cap_per_key
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.wand import query_term_pairs, search_segments

Cursor = Tuple[float, int]


def cursors_from_page(page: DataFrame) -> Dict[int, Cursor]:
    """{qid: (score, doc_id)} of each query's last (deepest-rank) row —
    the search_after cursor for the next page, with the engine's exact
    float score. One driver collect of ≤ |queries| rows: a cursor is by
    definition client-held state between calls, never doc-scale."""
    w = Window.partitionBy("qid").orderBy(F.desc("rank"))
    last = (
        page.withColumn("_rl", F.row_number().over(w))
        .filter(F.col("_rl") == 1)
        .select("qid", "score", "doc_id")
    )
    return {int(r.qid): (float(r.score), int(r.doc_id)) for r in last.collect()}


def search_after(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    segments: DataFrame,
    cursors: Dict[int, Cursor],
    k: int = DEFAULT_TOP_K,
    resolve: str = "auto",
) -> DataFrame:
    """Next page of ≤ k rows strictly after each query's cursor in
    (score DESC, doc_id ASC) order — ranks are page-relative (1..k).
    Queries absent from `cursors` get their page 1."""
    return search_segments(
        spark, queries, index, segments, k=k, resolve=resolve, cursors=cursors
    )


def search_collapse(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    k: int = DEFAULT_TOP_K,
    per_group: int = 1,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """(qid, rank, doc_id, <field>, score) — BM25 top-k with at most
    per_group results per (query, field value): Lucene field collapsing
    (CollapsingTopDocsCollector / Elasticsearch `collapse`), the "one
    result per domain" serving contract. Collapse happens over the FULL
    candidate set before the top-k — a dominated group contributes its
    best doc(s) only, so page depth never re-admits collapsed duplicates.

    Plan: exact scoring (postings probed in place) -> doc-values join
    (narrow 2-column sort-merge on doc_id at scale, SURVEY J1 shape) ->
    exact two-level top-N inside each (qid, field) group (cap_per_key,
    salting for mega-groups) -> final top-k over group winners. Scores
    are the ordinary BM25 scores — collapsing filters, never rescores.
    """
    from dpr_spark.query.scorer import score_exact

    scored = score_exact(queries, index)
    withf = scored.join(doc_values.select("doc_id", field), "doc_id")
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    winners = cap_per_key(
        withf, ["qid", field], order, per_group, salt_buckets=salt_buckets
    )
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        winners.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", field, "score")
    )


def search_sort_by_field(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    k: int = DEFAULT_TOP_K,
    ascending: bool = False,
    salt_buckets: Optional[int] = None,
    cursors: Optional[Dict[int, Tuple]] = None,
) -> DataFrame:
    """(qid, rank, doc_id, <field>) — top-k MATCHES of each query ordered
    by a per-doc stored column instead of BM25 score (Lucene
    Sort(SortField) over doc values).

    Plan: resolve query terms (broadcast into the dictionary scan, never
    shuffling it) -> probe postings with the broadcast (qid, term_id)
    pairs -> collapse to distinct (qid, doc_id) matches -> join the doc-
    values column -> exact two-level top-N per qid (cap_per_key with
    optional salting for mega-queries). The postings table is probed in
    place (only matched (qid, doc_id) rows shuffle); the doc-values side
    is a narrow 2-column table that sort-merge-joins on doc_id at scale —
    the same shape as the results->passage lookup (SURVEY J1) — or stays
    exchange-free when written bucketed by doc_id.

    cursors: optional {qid: (field_value, doc_id)} search_after map in
    field order — rows at-or-before the cursor are dropped BEFORE the
    top-N, so deep pages sort the same candidate set page 1 did.
    """
    qt = query_term_pairs(queries, index, with_idf=False)
    matches = (
        index.postings.join(F.broadcast(qt), "term_id")
        .select("qid", "doc_id")
        .distinct()
    )
    fcol = F.col(field)
    scored = matches.join(doc_values.select("doc_id", field), "doc_id")
    if cursors:
        cdf = spark.createDataFrame(
            [(int(q), c[0], int(c[1])) for q, c in cursors.items()],
            ["qid", "_c_field", "_c_doc"],
        )
        scored = scored.join(F.broadcast(cdf), "qid", "left")
        after_field = fcol > F.col("_c_field") if ascending else fcol < F.col("_c_field")
        scored = scored.filter(
            F.col("_c_field").isNull()
            | after_field
            | ((fcol == F.col("_c_field")) & (F.col("doc_id") > F.col("_c_doc")))
        ).drop("_c_field", "_c_doc")
    order = [fcol.asc() if ascending else fcol.desc(), F.col("doc_id").asc()]
    top = cap_per_key(scored, ["qid"], order, k, salt_buckets=salt_buckets)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "rank", "doc_id", field
    )


# ---------------------------------------------------------------------------
# Index-time sorting + early termination (Lucene IndexSorting analog)
# ---------------------------------------------------------------------------


def build_sorted_layout(
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    n_ranges: int = 16,
    path: Optional[str] = None,
):
    """Sort-field-aware postings layout — the Lucene index-sorting
    analog (IndexWriterConfig.setIndexSort): postings annotated with the
    doc's sort value and bucketed into `n_ranges` VALUE RANGES, so a
    sort-by-field query probes ranges in field order and STOPS as soon
    as every query holds k matches (early termination — Lucene's
    TopFieldCollector over a sorted index does exactly this per
    segment).

    Range assignment: boundaries from approx quantiles of the value
    distribution; a doc's range_id counts boundaries STRICTLY below its
    value, so all docs sharing a value share a range — which is what
    makes early termination exact (the k-th match can never tie with a
    value in an unprobed range).

    One postings⋈doc-values join at LAYOUT BUILD time (the index-sort
    cost Lucene pays at flush/merge); queries then never touch the
    doc-values table. With `path`, the layout persists partitioned by
    range_id — a probe of range i is a partition-pruned scan.
    Returns (sorted_postings_df, boundaries)."""
    vals = doc_values.select(
        "doc_id", F.col(field).cast("double").alias("_v")
    )
    qs = [i / n_ranges for i in range(1, n_ranges)]
    bounds = vals.approxQuantile("_v", qs, 0.001)
    rid = F.lit(0)
    for b in sorted(set(bounds)):
        rid = rid + F.when(F.col("_v") > F.lit(float(b)), 1).otherwise(0)
    out = (
        index.postings.select("term_id", "doc_id")
        .join(vals, "doc_id")
        .withColumn("range_id", rid.cast("int"))
    )
    if path is not None:
        out.write.partitionBy("range_id").mode("overwrite").parquet(path)
        out = index.postings.sparkSession.read.parquet(path)
    return out, sorted(set(bounds))


def search_sorted_layout(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    sorted_postings: DataFrame,
    k: int = DEFAULT_TOP_K,
    ascending: bool = True,
    stats: Optional[dict] = None,
) -> DataFrame:
    """(qid, rank, doc_id, value): sort-by-field top-k over a
    build_sorted_layout layout with EARLY TERMINATION — ranges are
    probed in field order and a query leaves the probe set the moment
    it holds k matches; fully-satisfied waves stop the loop. Results
    are identical to search_sort_by_field (asserted in
    tests/test_paging.py); `stats` (optional dict) receives
    {"ranges_probed": n, "ranges_total": m}.

    Driver-side loop cost: ≤ n_ranges jobs, each a partition-pruned
    scan of ONE range joined with the still-pending queries' terms —
    the Spark spelling of Lucene's per-segment early-terminating
    TopFieldCollector."""
    qt = query_term_pairs(queries, index, with_idf=False).persist()
    rids = sorted(
        r.range_id for r in sorted_postings.select("range_id").distinct().collect()
    )
    if not ascending:
        rids = rids[::-1]
    pending = {int(r.qid) for r in qt.select("qid").distinct().collect()}
    have: Dict[int, int] = {q: 0 for q in pending}
    parts = []
    probed = 0
    for rid in rids:
        if not pending:
            break
        probed += 1
        qsel = qt if len(have) == len(pending) else qt.join(
            F.broadcast(
                spark.createDataFrame([(q,) for q in sorted(pending)], "qid long")
            ),
            "qid",
            "left_semi",
        )
        probe = (
            sorted_postings.filter(F.col("range_id") == rid)
            .join(F.broadcast(qsel), "term_id")
            .select("qid", "doc_id", "_v")
            .distinct()
            .persist()
        )
        for r in probe.groupBy("qid").agg(F.count("*").alias("n")).collect():
            have[int(r.qid)] = have.get(int(r.qid), 0) + int(r.n)
            if have[int(r.qid)] >= k:
                pending.discard(int(r.qid))
        parts.append(probe)
    qt.unpersist()
    if stats is not None:
        stats["ranges_probed"] = probed
        stats["ranges_total"] = len(rids)
    if not parts:
        return spark.createDataFrame(
            [], "qid long, rank int, doc_id long, value double"
        )
    matches = parts[0]
    for pdf in parts[1:]:
        matches = matches.unionByName(pdf)
    order = [
        F.col("_v").asc() if ascending else F.col("_v").desc(),
        F.col("doc_id").asc(),
    ]
    top = cap_per_key(matches, ["qid"], order, k)
    w = Window.partitionBy("qid").orderBy(*order)
    res = top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "rank", "doc_id", F.col("_v").alias("value")
    )
    res = res.persist()
    res.count()
    for pdf in parts:
        pdf.unpersist()
    return res


def search_sliced(
    spark: SparkSession,
    queries: DataFrame,
    index: InvertedIndex,
    segments: DataFrame,
    slice_id: int,
    slice_max: int,
    k: int = DEFAULT_TOP_K,
    cursors: Optional[Dict[int, Cursor]] = None,
    resolve: str = "auto",
) -> DataFrame:
    """ES sliced scroll (`slice: {id, max}`): an independent ranking of
    the doc partition doc_id % max == id, so `max` workers drain one
    result set in parallel — each slice pages with its OWN search_after
    cursors. The slice predicate applies at the postings iterator
    (before pruning and the per-bucket heap), so a slice pays only its
    share, and the union of all slices' pages is exactly the unsliced
    ranking re-partitioned by doc_id % max (tests/test_paging.py)."""
    if not 0 <= slice_id < slice_max:
        raise ValueError("need 0 <= slice_id < slice_max")
    return search_segments(
        spark, queries, index, segments, k=k, resolve=resolve,
        cursors=cursors, doc_slice=(slice_id, slice_max),
    )


def search_pinned(
    spark,
    queries: DataFrame,
    index: InvertedIndex,
    pins: Sequence[Tuple[int, Sequence[int]]],
    k: int = DEFAULT_TOP_K,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES `pinned` query: per query, the listed doc ids rank first IN
    LIST ORDER (whether or not they match organically), the organic
    BM25 ranking follows with pinned docs removed. Pins are promotion
    metadata, so a pinned doc carries score NULL→0.0 unless it matched;
    the organic scores are untouched (ES gives pins artificial
    above-everything scores; we keep real ones and let `kind` mark the
    provenance).

    pins: [(qid, [doc_id, ...])] — editorial, query-sized, broadcast.
    """
    from dpr_spark.query.scorer import score_exact

    rows = []
    for qid, ids in pins:
        for pos, d in enumerate(ids):
            rows.append((qid, int(d), pos))
    pdf = F.broadcast(
        spark.createDataFrame(rows, "qid long, doc_id long, pin_pos int")
    )
    scored = score_exact(queries, index, k1=k1, b=b)
    organic = scored.join(pdf, ["qid", "doc_id"], "left_anti")
    w_org = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    org_ranked = organic.withColumn("r", F.row_number().over(w_org)).select(
        "qid", "doc_id",
        F.col("score").alias("score"),
        (F.col("r") + F.lit(1_000_000)).alias("ord"),  # after every pin
        F.lit("organic").alias("kind"),
    )
    pinned = pdf.join(
        scored.select("qid", "doc_id", "score"), ["qid", "doc_id"], "left"
    ).select(
        "qid", "doc_id",
        F.coalesce("score", F.lit(0.0)).alias("score"),
        F.col("pin_pos").cast("long").alias("ord"),
        F.lit("pinned").alias("kind"),
    )
    both = pinned.unionByName(org_ranked)
    w = Window.partitionBy("qid").orderBy(F.asc("ord"), F.asc("doc_id"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "kind", "doc_id", "score")
    )
