"""Aggregations over a query's FULL match set — the Elasticsearch
search-aggregation surface (`aggs`) for our match semantics:

- match_count:  total_hits per query (ES track_total_hits=true; Lucene
  TotalHitCountCollector) — how many docs contain ≥1 query term.
- stats_agg:    count/min/max/sum/avg of a numeric doc value over the
  matches (ES `stats` aggregation).
- terms_agg:    top-`size` (value, count) buckets of a categorical doc
  value over the matches (ES `terms` aggregation), count desc / value
  asc, EXACT (no shard-approximation error — Spark's shuffle gives us
  the global counts ES approximates with shard_size).

This differs from query/facets.py, which counts buckets over the TOP-K
results (the UI facet); these run over every matched document.

Scale shape: query terms resolve once (broadcast into the dictionary
scan), postings are probed in place, and the only doc-sized motion is
the distinct (qid, doc_id) match collapse — map-side partial
aggregation bounds the shuffle. Doc values join candidate rows only
(narrow SMJ). terms_agg's final per-qid top-size runs over already-
aggregated (qid, value, count) rows via the exact two-level salted
top-N (extras/domains.cap_per_key), so a query matching 10^8 docs with
10^6 distinct values cannot funnel one window task.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dpr_spark.extras.domains import cap_per_key
from dpr_spark.index.build import InvertedIndex
from dpr_spark.query.wand import query_term_pairs


def _matches(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """distinct (qid, doc_id) docs containing ≥1 query term."""
    qt = query_term_pairs(queries, index, with_idf=False)
    return (
        index.postings.join(F.broadcast(qt), "term_id")
        .select("qid", "doc_id")
        .distinct()
    )


def match_count(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(qid, total_hits) — ES track_total_hits / Lucene
    TotalHitCountCollector. Queries with zero matches are absent (the
    caller left-joins its query table if it needs explicit zeros)."""
    return _matches(queries, index).groupBy("qid").agg(
        F.count("*").alias("total_hits")
    )


def stats_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
) -> DataFrame:
    """(qid, n, min, max, sum, avg) of `field` over the match set."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    c = F.col(field).cast("double")
    return m.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
    )


def extended_stats_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    sigma: float = 2.0,
) -> DataFrame:
    """ES `extended_stats` + `median_absolute_deviation` + a
    single-metric `top_metrics` over the match set: (qid, n, sum_v,
    sum_sq, avg_v, var_v, std_v, upper_v, lower_v, mad_v, top_v).

    Variance is derived from the EXACT integer sums (sum_sq/n −
    (sum/n)², population form like ES) rather than a streaming
    aggregate, so the arithmetic is the same IEEE expression an oracle
    writes and cross-engine bit-stability doesn't hinge on accumulator
    order. MAD = median(|v − median(v)|) with exact interpolated
    percentiles; top_v = the metric at the maximum doc_id (ES
    top_metrics with sort: doc_id desc)."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    c = F.col(field).cast("double")
    med = m.groupBy("qid").agg(
        F.expr(f"percentile({field}, 0.5)").alias("med")
    )
    mad = (
        m.join(med, "qid")
        .groupBy("qid")
        .agg(F.expr(f"percentile(abs({field} - med), 0.5)").alias("mad_v"))
    )
    base = m.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.sum(F.col(field)).cast("long").alias("sum_v"),
        F.sum(F.col(field) * F.col(field)).cast("long").alias("sum_sq"),
        F.max_by(c, F.col("doc_id")).alias("top_v"),
    )
    avg = F.col("sum_v").cast("double") / F.col("n")
    var = F.col("sum_sq").cast("double") / F.col("n") - avg * avg
    std = F.sqrt(var)
    return (
        base.join(mad, "qid")
        .select(
            "qid",
            "n",
            "sum_v",
            "sum_sq",
            avg.alias("avg_v"),
            var.alias("var_v"),
            std.alias("std_v"),
            (avg + F.lit(sigma) * std).alias("upper_v"),
            (avg - F.lit(sigma) * std).alias("lower_v"),
            F.col("mad_v"),
            "top_v",
        )
    )


def percentile_ranks_boxplot_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    rank_values: Sequence[float] = (),
) -> DataFrame:
    """ES `percentile_ranks` + `boxplot` over the match set, with exact
    deterministic contracts instead of t-digest approximation:

    - pct_rank(x) = 100·|{v ≤ x}| / n per requested x (columns
      `rank_at_<i>`), the CDF the t-digest estimates;
    - boxplot: q1/q2/q3 as exact interpolated percentiles (Spark
      `percentile` ≡ DuckDB `quantile_cont` bit-at-6dp), whiskers as
      the ES contract's min/max clamped to q1−1.5·IQR / q3+1.5·IQR."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    c = F.col(field).cast("double")
    aggs = [F.count("*").alias("n"), F.min(c).alias("mn"), F.max(c).alias("mx")]
    for i, x in enumerate(rank_values):
        aggs.append(
            (
                F.sum(F.when(c <= F.lit(float(x)), 1).otherwise(0))
                * F.lit(100.0)
            ).alias(f"le_{i}")
        )
    for q, nm in ((0.25, "q1"), (0.5, "q2"), (0.75, "q3")):
        aggs.append(F.expr(f"percentile({field}, {q})").alias(nm))
    out = m.groupBy("qid").agg(*aggs)
    iqr = F.col("q3") - F.col("q1")
    cols = [
        F.col("qid"),
        F.col("n"),
        F.col("q1"),
        F.col("q2"),
        F.col("q3"),
        F.greatest(F.col("mn"), F.col("q1") - F.lit(1.5) * iqr).alias("lower_whisker"),
        F.least(F.col("mx"), F.col("q3") + F.lit(1.5) * iqr).alias("upper_whisker"),
    ]
    cols += [
        (F.col(f"le_{i}") / F.col("n")).alias(f"rank_at_{i}")
        for i in range(len(rank_values))
    ]
    return out.select(*cols)


def terms_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    size: int = 10,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """(qid, value, count, rank): top-`size` buckets of `field` over the
    match set, count desc then value asc. Exact — the bucket counts are
    globally aggregated before the per-qid top-size."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", F.col(field).alias("value")), "doc_id"
    )
    counts = m.groupBy("qid", "value").agg(F.count("*").alias("count"))
    order = [F.col("count").desc(), F.col("value").asc()]
    top = cap_per_key(counts, ["qid"], order, size, salt_buckets=salt_buckets)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "value", "count", "rank"
    )


def significant_terms(
    queries: DataFrame,
    index: InvertedIndex,
    size: int = 10,
    min_fg: int = 2,
    salt_buckets: Optional[int] = None,
    background: Optional[DataFrame] = None,
) -> DataFrame:
    """(qid, term, fg_count, bg_count, score, rank): terms UNUSUALLY
    frequent in a query's match set vs the whole corpus — the ES
    `significant_terms` aggregation with its default JLH heuristic:

        score = (fg% − bg%) · (fg% / bg%)
        fg% = fg_count / n_matches,  bg% = df / N

    fg_count counts MATCHING docs containing the term (document
    frequency within the foreground, like ES); min_fg prunes noise.
    With `background` (ES background_filter: a (doc_id) set), bg% uses
    the term's df WITHIN that set over its size instead of the global
    dictionary stats — the one extra cost is a postings ⋈ background
    co-partitioned join whose output collapses to vocab-sized counts;
    compute it once per (background, index) and cache when reused. Terms
    absent from the background set drop out (ES expects the background
    to contain the foreground; a 0 bg-count has no defined JLH score).
    Exact — no shard approximation and no sampling (ES's sampler
    aggregation is the knob it needs because a node recomputes term
    vectors; here the postings table already holds the counts).

    Scale shape: the one genuinely large step is matches ⋈ postings on
    doc_id (every matched doc contributes its term list — the same
    information ES pulls from term vectors); it is a co-partitioned
    SMJ whose output collapses immediately via a map-side-combined
    count per (qid, term_id). Background df comes from the dictionary
    (vocab-sized, never broadcast or shuffled — fg is the small side
    joined into it). Per-qid top-size rides the exact salted top-N.
    Score arithmetic is a single closed-form expression over integer
    counts — no float fold, so rank order is engine-independent."""
    m = _matches(queries, index)
    n_match = m.groupBy("qid").agg(F.count("*").alias("n_matches"))
    fg = (
        m.join(index.postings.select("doc_id", "term_id"), "doc_id")
        .groupBy("qid", "term_id")
        .agg(F.count("*").alias("fg_count"))
        .filter(F.col("fg_count") >= min_fg)
    )
    if background is None:
        n_docs = float(index.stats.n_docs)
        bg = index.dictionary.select("term_id", "term", "df")
    else:
        bset = background.select("doc_id").distinct()
        n_docs = float(bset.count())
        bg_counts = (
            index.postings.select("term_id", "doc_id")
            .join(bset, "doc_id")
            .groupBy("term_id")
            .agg(F.count("*").alias("df"))
        )
        bg = index.dictionary.select("term_id", "term").join(
            bg_counts, "term_id"
        )
    scored = (
        fg.join(bg, "term_id")
        .join(F.broadcast(n_match), "qid")
        .withColumn("_fgr", F.col("fg_count") / F.col("n_matches"))
        .withColumn("_bgr", F.col("df").cast("double") / F.lit(n_docs))
        .withColumn(
            "score",
            (F.col("_fgr") - F.col("_bgr")) * (F.col("_fgr") / F.col("_bgr")),
        )
        .select("qid", "term", "fg_count", F.col("df").alias("bg_count"), "score")
    )
    order = [F.col("score").desc(), F.col("term").asc()]
    top = cap_per_key(scored, ["qid"], order, size, salt_buckets=salt_buckets)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "term", "fg_count", "bg_count", F.col("score").alias("score"), "rank"
    )


def histogram_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    interval: float,
    min_doc_count: int = 1,
) -> DataFrame:
    """(qid, bucket, count) — ES `histogram` aggregation over the match
    set: bucket = floor(value / interval) * interval.

    min_doc_count=0 reproduces ES's empty-bucket filling: buckets are
    densified per qid from the min to the max OBSERVED bucket via
    `sequence` + explode (the ES contract — the range is data-derived,
    not a parameter). Scale shape: counts aggregate map-side before the
    (qid, bucket) shuffle; densification explodes only
    (max−min)/interval rows per qid — bucket-count-sized, never
    doc-sized."""
    iv = float(interval)
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    idx = F.floor(F.col(field).cast("double") / F.lit(iv)).cast("long")
    counts = m.groupBy("qid", idx.alias("_b")).agg(F.count("*").alias("count"))
    if min_doc_count > 0:
        out = counts.filter(F.col("count") >= min_doc_count)
    else:
        # single-pass densify: collapse each qid's buckets to one row
        # (span + a bucket->count map), then explode the dense range and
        # look counts up in the map. The former span + left-self-join
        # shape referenced the unpersisted `counts` subtree twice, which
        # re-executed the whole match pipeline (index build included)
        # per reference — guide §7.2 "duplicated subtrees".
        g = counts.groupBy("qid").agg(
            F.min("_b").alias("_lo"),
            F.max("_b").alias("_hi"),
            F.map_from_entries(
                F.collect_list(F.struct("_b", "count"))
            ).alias("_m"),
        )
        out = g.select(
            "qid", F.explode(F.sequence("_lo", "_hi")).alias("_b"), "_m"
        ).select(
            "qid",
            "_b",
            F.coalesce(F.element_at("_m", F.col("_b")), F.lit(0).cast("long")).alias(
                "count"
            ),
        )
    return out.select(
        "qid", (F.col("_b") * F.lit(iv)).alias("bucket"), "count"
    )


def date_histogram_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    ts_field: str,
    unit: str = "day",
) -> DataFrame:
    """(qid, bucket, count) — ES `date_histogram`
    (calendar_interval=unit) over the match set; bucket is
    date_trunc(unit, ts) (weeks are ISO-Monday in both Spark and
    DuckDB). The page-table contract carries `warc_ts:timestamp`
    (crawl time) — this is the "crawl volume over time for pages
    matching q" panel. Same scale shape as histogram_agg: map-side
    combine, bucket-count-sized output."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", ts_field), "doc_id"
    )
    b = F.date_trunc(unit, F.col(ts_field))
    return m.groupBy("qid", b.alias("bucket")).agg(
        F.count("*").alias("count")
    )


def percentiles_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    pcts: tuple = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """(qid, pct, value) — ES `percentiles` aggregation over the match
    set.

    exact=True uses Spark's exact `percentile` (linear interpolation on
    the sorted values — the textbook definition DuckDB's quantile_cont
    shares, so it is oracle-comparable). Its state is a value→count map
    per (qid): fine for doc-value fields with bounded distinct
    cardinality, wrong for 10^8 distinct floats. exact=False is the
    100 TB path — `percentile_approx` (a positive-error quantile sketch
    with bounded memory, Greenwald-Khanna style), the same trade ES
    makes with t-digest."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    v = F.col(field).cast("double")
    ps = [float(p) for p in pcts]
    agg = (
        F.percentile(v, ps) if exact else F.percentile_approx(v, ps, accuracy)
    )
    plit = F.array(*[F.lit(p) for p in ps])
    return (
        m.groupBy("qid")
        .agg(agg.alias("_vals"))
        .select("qid", F.posexplode("_vals").alias("_i", "value"))
        .select(
            "qid",
            F.element_at(plit, F.col("_i") + 1).alias("pct"),
            "value",
        )
    )


def cardinality_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """(qid, cardinality) — ES `cardinality` aggregation over the match
    set.

    exact=True: two-level distinct — the (qid, value) collapse
    map-side-combines before its shuffle, then a count per qid; no
    single task ever holds a query's full value set. exact=False is
    HLL++ (`approx_count_distinct`, relative error `rsd`) — constant
    memory per (qid), the exact trade ES's cardinality agg makes, for
    when values-per-query itself is shuffle-prohibitive."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    if exact:
        return (
            m.select("qid", field)
            .distinct()
            .groupBy("qid")
            .agg(F.count("*").alias("cardinality"))
        )
    return m.groupBy("qid").agg(
        F.approx_count_distinct(field, rsd).alias("cardinality")
    )


def top_hits_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    size: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int = 0,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """(qid, value, rank, doc_id, score) — ES `top_hits` inside a
    `terms` bucket: for each (query, bucket value), the `size`
    highest-BM25 matched docs. "Best page per domain for q" in one
    plan.

    Scale shape: scoring is the existing probe-in-place exact scorer
    (postings never shuffle); the per-(qid, value) top-size is the
    exact salted two-level cap, so one mega-bucket cannot funnel a
    single window task. score_round>0 ranks on round(score, d) — the
    cross-engine tie discipline entries use; 0 ranks on the raw
    float."""
    from dpr_spark.query.scorer import score_exact

    s = score_exact(queries, index, k1=k1, b=b).join(
        doc_values.select("doc_id", F.col(field).alias("value")), "doc_id"
    )
    key = F.round("score", score_round) if score_round else F.col("score")
    order = [key.desc(), F.col("doc_id").asc()]
    top = cap_per_key(s, ["qid", "value"], order, size, salt_buckets)
    w = Window.partitionBy("qid", "value").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "value", "rank", "doc_id", "score"
    )


AUTO_HIST_UNITS = ("day", "week", "month", "quarter", "year")


def auto_date_histogram_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    ts_field: str,
    target_buckets: int = 10,
    units: Sequence[str] = AUTO_HIST_UNITS,
) -> DataFrame:
    """(qid, unit, bucket, count) — ES `auto_date_histogram`: per query,
    the FINEST calendar unit whose bucket count fits target_buckets
    (falling back to the coarsest). Deterministic: the choice is a pure
    function of the matched timestamps, computed as one multi-unit
    distinct-count pass; the chosen unit then buckets the same match
    set. Two aggregations total, both with map-side combine — the
    interval search ES does by merging shard trees is here a column of
    countDistincts."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", F.col(ts_field).alias("_ts")), "doc_id"
    )
    truncs = m.select(
        "qid", "_ts", *[F.date_trunc(u, F.col("_ts")).alias(f"_t_{u}") for u in units]
    ).persist()
    counts = truncs.groupBy("qid").agg(
        *[F.countDistinct(f"_t_{u}").alias(f"_n_{u}") for u in units]
    )
    chosen = None
    for u in units[:-1]:
        c = F.when(F.col(f"_n_{u}") <= target_buckets, F.lit(u))
        chosen = c if chosen is None else chosen.when(
            F.col(f"_n_{u}") <= target_buckets, F.lit(u)
        )
    chosen = chosen.otherwise(F.lit(units[-1]))
    sel = counts.select("qid", chosen.alias("unit"))
    bucket = None
    for u in units:
        b = F.when(F.col("unit") == u, F.col(f"_t_{u}"))
        bucket = b if bucket is None else bucket.when(F.col("unit") == u, F.col(f"_t_{u}"))
    out = (
        truncs.join(F.broadcast(sel), "qid")
        .withColumn("_bucket", bucket)
        .groupBy("qid", "unit", "_bucket")
        .agg(F.count("*").alias("count"))
        .select(
            "qid", "unit",
            F.date_format("_bucket", "yyyy-MM-dd").alias("bucket"), "count",
        )
    )
    out = out.localCheckpoint()
    truncs.unpersist()
    return out


def sampler_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    shard_size: int = 100,
    max_docs_per_value: Optional[int] = None,
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int = 6,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """(qid, value, count) — ES `sampler` / `diversified_sampler`:
    downstream aggregation restricted to each query's `shard_size`
    best-scoring matches; the diversified form first caps docs per
    `field` value (max_docs_per_value) so one dominant site cannot fill
    the sample. Deterministic: the cut orders by (round(score,
    score_round) DESC, doc_id) — a total order, so the sample is a
    function of the data, not of shard layout (ES samples per shard;
    at 100 TB run the same two-level cap with salt_buckets).

    The aggregation over the sample here is a terms count per value —
    the common sampler body; callers wanting a different body can take
    `sample_docs` below."""
    sample = sample_docs(
        queries, index, doc_values, field, shard_size, max_docs_per_value,
        k1=k1, b=b, score_round=score_round, salt_buckets=salt_buckets,
    )
    return sample.groupBy("qid", "value").agg(F.count("*").alias("count"))


def sample_docs(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    shard_size: int = 100,
    max_docs_per_value: Optional[int] = None,
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int = 6,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """The sampler's selection stage: (qid, doc_id, value, score) rows
    surviving the (optional) per-value diversity cap and the per-query
    top-shard_size cut. Both cuts are the exact salted two-level cap."""
    from dpr_spark.query.scorer import score_exact

    s = score_exact(queries, index, k1=k1, b=b).join(
        doc_values.select("doc_id", F.col(field).alias("value")), "doc_id"
    )
    key = F.round("score", score_round) if score_round else F.col("score")
    order = [key.desc(), F.col("doc_id").asc()]
    if max_docs_per_value is not None:
        s = cap_per_key(s, ["qid", "value"], order, max_docs_per_value, salt_buckets)
    return cap_per_key(s, ["qid"], order, shard_size, salt_buckets)


def _range_conditions(field_col, ranges, cast_fn):
    """[(key, condition)] for explicit [lo, hi) buckets; None unbounded."""
    out = []
    for lo, hi in ranges:
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (field_col >= cast_fn(lo))
        if hi is not None:
            cond = cond & (field_col < cast_fn(hi))
        out.append((key, cond))
    return out


def _one_pass_ranges(m: DataFrame, conds) -> DataFrame:
    """ONE pass over the match set: every range is a conditional sum in
    a single (qid) groupBy, then a stack() unpivot emits the
    (qid, range_key, count) rows — ranges-sized output, zero extra
    scans. (ES ranges may overlap: a doc lands in every range containing
    its value; empty ranges emit 0 — the range list is the schema.)"""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"_r{i}")
        for i, (_k, cond) in enumerate(conds)
    ]
    per_q = m.groupBy("qid").agg(*aggs)
    stack = ", ".join(
        f"'{k}', _r{i}" for i, (k, _c) in enumerate(conds)
    )
    return per_q.selectExpr(
        "qid", f"stack({len(conds)}, {stack}) as (range_key, count)"
    )


def range_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    ranges: Sequence[tuple],
) -> DataFrame:
    """(qid, range_key, count) — ES `range` aggregation over the match
    set: explicit [lo, hi) buckets; None = unbounded. One pass — each
    range is a conditional sum in the same groupBy (N ranges never cost
    N scans of the match set)."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    v = F.col(field).cast("double")
    conds = _range_conditions(v, ranges, lambda x: F.lit(float(x)))
    return _one_pass_ranges(m, conds)


def date_range_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    ranges: Sequence[tuple],
) -> DataFrame:
    """(qid, range_key, count) — ES `date_range`: the range aggregation
    on a timestamp field with ISO-date boundaries, [from, to) like ES
    (from inclusive, to exclusive). Same one-pass shape as range_agg."""
    v = F.col(field)
    conds = _range_conditions(
        v, ranges, lambda x: F.to_timestamp(F.lit(x))
    )
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id"
    )
    return _one_pass_ranges(m, conds)


def composite_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    fields: Sequence[str],
    size: int = 10,
    after: Optional[dict] = None,
) -> DataFrame:
    """(qid, <fields...>, count) — ES `composite` aggregation: bucket
    tuples ordered by their NATURAL KEY (fields ascending, NOT count),
    paged `size` at a time with an exclusive `after` key — the
    aggregation analog of search_after (deep bucket pagination without
    re-ranking shards).

    `after`: {field: value} of the last bucket of the previous page
    (same for every query — the ES cursor contract is per-request).

    Scale shape: counts aggregate map-side on (qid, *fields); the
    after-key predicate is a lexicographic tuple comparison PUSHED as a
    filter before the per-qid window, so page N+1 aggregates the same
    shuffle but sorts only surviving buckets."""
    cols = list(fields)
    m = _matches(queries, index).join(
        doc_values.select("doc_id", *cols), "doc_id"
    )
    counts = m.groupBy("qid", *cols).agg(F.count("*").alias("count"))
    if after:
        # lexicographic (f1, f2, ...) > (a1, a2, ...)
        pred = None
        for i, c in enumerate(cols):
            eq = None
            for prev in cols[:i]:
                e = F.col(prev) == F.lit(after[prev])
                eq = e if eq is None else (eq & e)
            gt = F.col(c) > F.lit(after[c])
            term = gt if eq is None else (eq & gt)
            pred = term if pred is None else (pred | term)
        counts = counts.filter(pred)
    w = Window.partitionBy("qid").orderBy(*[F.asc(c) for c in cols])
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .drop("_rn")
        .select("qid", *cols, "count")
    )


def weighted_avg_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    value_field: str,
    weight_field: str,
) -> DataFrame:
    """(qid, weighted_avg) — ES `weighted_avg`: Σ(v·w)/Σ(w) over the
    match set (docs with NULL value or weight are skipped, the ES
    missing-default contract)."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", value_field, weight_field), "doc_id"
    )
    v = F.col(value_field).cast("double")
    w = F.col(weight_field).cast("double")
    ok = m.filter(v.isNotNull() & w.isNotNull())
    return ok.groupBy("qid").agg(
        (F.sum(v * w) / F.sum(w)).alias("weighted_avg")
    )


def matrix_stats_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    x_field: str,
    y_field: str,
) -> DataFrame:
    """(qid, n, mean_x, mean_y, var_x, var_y, cov, corr) — ES
    `matrix_stats` for a field pair over the match set: population
    moments from EXACT integer sums (Σx, Σy, Σx², Σy², Σxy stay longs
    until the final division — the same textual IEEE expression a SQL
    twin writes, so cross-engine bit-stability doesn't hinge on
    accumulator order; the device of extended_stats_agg):

        mean = Σv/n          var  = Σv²/n − mean²
        cov  = Σxy/n − mean_x·mean_y
        corr = cov / sqrt(var_x · var_y)

    One match-set pass, one (qid) groupBy — the doc-sized motion is the
    match collapse itself."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", x_field, y_field), "doc_id"
    )
    x, y = F.col(x_field), F.col(y_field)
    base = m.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
        F.sum(x * y).cast("long").alias("sxy"),
    )
    n = F.col("n").cast("double")
    mean_x = F.col("sx").cast("double") / n
    mean_y = F.col("sy").cast("double") / n
    var_x = F.col("sxx").cast("double") / n - mean_x * mean_x
    var_y = F.col("syy").cast("double") / n - mean_y * mean_y
    cov = F.col("sxy").cast("double") / n - mean_x * mean_y
    return base.select(
        "qid",
        "n",
        mean_x.alias("mean_x"),
        mean_y.alias("mean_y"),
        var_x.alias("var_x"),
        var_y.alias("var_y"),
        cov.alias("cov"),
        (cov / F.sqrt(var_x * var_y)).alias("corr"),
    )


def t_test_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    a_field: str,
    b_field: str,
) -> DataFrame:
    """(qid, n, t_stat) — ES `t_test` (paired): t over the per-doc
    differences d = a − b of the match set,

        t = mean(d) / sqrt(s²_d / n),   s²_d = (Σd² − (Σd)²/n) / (n−1)

    Σd and Σd² are exact longs; queries whose match set has n ≤ 1 or
    zero variance yield NULL (the ES cannot-compute contract)."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", a_field, b_field), "doc_id"
    )
    d = F.col(a_field) - F.col(b_field)
    base = m.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.sum(d).cast("long").alias("sd"),
        F.sum(d * d).cast("long").alias("sdd"),
    )
    n = F.col("n").cast("double")
    mean_d = F.col("sd").cast("double") / n
    var_s = (F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col("sd").cast("double") / n) / (n - F.lit(1.0))
    t = F.when(
        (F.col("n") > 1) & (var_s > 0), mean_d / F.sqrt(var_s / n)
    ).otherwise(F.lit(None).cast("double"))
    return base.select("qid", "n", t.alias("t_stat"))


def value_count_missing_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
) -> DataFrame:
    """(qid, value_count, missing) — ES `value_count` + `missing` in one
    pass: non-null values of `field` over the match set, and matched
    docs lacking the field (left join → NULL)."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", field), "doc_id", "left"
    )
    c = F.col(field)
    return m.groupBy("qid").agg(
        F.count(c).alias("value_count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("missing"),
    )


def scripted_metric_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    fields: Sequence[str],
    map_partial,
    reduce_partials,
    partial_schema: str,
    out_schema: str,
) -> DataFrame:
    """ES `scripted_metric` with Spark-shaped phases: the user's
    map/combine script runs as `map_partial(pdf) -> partial rows per
    qid` over each Arrow batch of the match set (the per-shard
    map+combine), and `reduce_partials(pdf) -> one row` folds a query's
    partials (the coordinating reduce). Only combined partials shuffle
    — the map-side-combine contract ES documents for scripted_metric,
    here enforced by construction.

    Scripts are vectorized pandas (never per-row Python); the match-set
    join is the only doc-sized motion."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", *fields), "doc_id"
    )

    def _map(batches):
        for pdf in batches:
            if len(pdf):
                yield map_partial(pdf)

    partials = m.mapInPandas(_map, schema=partial_schema)
    return partials.groupBy("qid").applyInPandas(
        lambda pdf: reduce_partials(pdf), schema=out_schema
    )


def pipeline_metrics(
    buckets: DataFrame,
    partition_col: str = "qid",
    order_col: str = "bucket",
    count_col: str = "count",
    window: int = 3,
) -> DataFrame:
    """ES pipeline aggregations — `derivative`, `cumulative_sum` and
    `moving_fn` (unweightedAvg over a trailing `window` buckets) —
    computed over a parent histogram's bucket series. One window pass,
    partitioned by query: no shuffle beyond the parent aggregation's own
    partitioning, and the state per query is the bucket series itself
    (bounded by the histogram's bucket count, never by doc count).
    ES omits the first bucket's derivative; we emit 0.0 there so the
    column is non-null (driver hash discipline).

    Buckets with no matching docs are absent from the parent series
    (min_doc_count=1 semantics): lag/window operate over PRESENT buckets
    in order, exactly as ES does with min_doc_count >= 1."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    cnt = F.col(count_col).cast("double")
    deriv = F.coalesce(cnt - F.lag(cnt).over(w), F.lit(0.0))
    cum = F.sum(cnt).over(w.rowsBetween(Window.unboundedPreceding, 0))
    mov = F.avg(cnt).over(w.rowsBetween(-(window - 1), 0))
    return buckets.select(
        partition_col,
        order_col,
        count_col,
        deriv.alias("deriv"),
        cum.cast("long").alias("cum"),
        F.round(mov, 6).alias("mov_avg"),
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """ES `frequent_item_sets` at max_size=2 (the Apriori pair level,
    exact): items co-occurring in >= min_support distinct baskets.
    (a, b) with a < b lexicographically; support = distinct-basket
    count.

    Scale shape: one distinct collapse on (basket, item), one
    within-basket self-join (a < b keeps each pair once) co-partitioned
    on the basket key, one map-side-combined pair count. Pair blowup is
    bounded by per-basket item-set size squared — the honest Apriori
    cost; a min_support prune on single items runs FIRST so items too
    rare to pair never enter the join (the Apriori downward-closure
    property)."""
    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    # Apriori prune: an item in < min_support baskets can't be in a pair
    freq = b.groupBy("_i").agg(F.count("*").alias("_n")).filter(
        F.col("_n") >= min_support
    )
    b = b.join(freq.select("_i"), "_i").select("_b", "_i")
    pairs = b.alias("x").join(
        b.alias("y"),
        (F.col("x._b") == F.col("y._b")) & (F.col("x._i") < F.col("y._i")),
    ).select(F.col("x._i").alias("item_a"), F.col("y._i").alias("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def serial_diff(
    buckets: DataFrame,
    lag: int = 1,
    partition_col: str = "qid",
    order_col: str = "bucket",
    count_col: str = "count",
) -> DataFrame:
    """ES `serial_diff` pipeline agg: count − count(lag buckets back)
    over the parent series; the first `lag` buckets have no referent —
    ES omits them, we emit NULL-as-0 is WRONG for diffs, so they are
    DROPPED (the ES omission contract). Same single-window-pass shape
    as pipeline_metrics."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    c = F.col(count_col).cast("double")
    prev = F.lag(c, lag).over(w)
    return (
        buckets.withColumn("_p", prev)
        .filter(F.col("_p").isNotNull())
        .select(
            partition_col, order_col, count_col,
            (c - F.col("_p")).alias("diff"),
        )
    )


def percentiles_bucket(
    buckets: DataFrame,
    pcts: Sequence[float] = (25.0, 50.0, 75.0),
    partition_col: str = "qid",
    count_col: str = "count",
) -> DataFrame:
    """ES `percentiles_bucket`: exact interpolated percentiles of the
    SIBLING bucket-count series per query (Spark `percentile` ≡ DuckDB
    `quantile_cont`); one bucket-count-sized groupBy."""
    aggs = [
        F.expr(f"percentile({count_col}, {p / 100.0})").alias(f"p{int(p)}")
        for p in pcts
    ]
    return buckets.groupBy(partition_col).agg(*aggs)


def bucket_sort(
    buckets: DataFrame,
    partition_col: str = "qid",
    sort_col: str = "count",
    tiebreak_col: str = "bucket",
    size: int = 3,
    ascending: bool = False,
) -> DataFrame:
    """ES `bucket_sort` pipeline: truncate each query's bucket list to
    the top `size` buckets by a metric (ties broken by the bucket key so
    the cut is deterministic). Applied AFTER sibling pipeline metrics,
    matching ES's pipeline ordering."""
    key = F.asc(sort_col) if ascending else F.desc(sort_col)
    w = Window.partitionBy(partition_col).orderBy(key, F.asc(tiebreak_col))
    return (
        buckets.withColumn("_bs_rn", F.row_number().over(w))
        .filter(F.col("_bs_rn") <= size)
        .drop("_bs_rn")
    )


def sibling_bucket_metrics(
    buckets: DataFrame,
    partition_col: str = "qid",
    value_col: str = "count",
) -> DataFrame:
    """ES sibling pipeline aggregations — `avg_bucket`, `sum_bucket`,
    `min_bucket`, `max_bucket`, `stats_bucket` — one row per query
    summarizing the parent histogram's bucket metric. One grouped pass;
    state per query is five scalars."""
    return buckets.groupBy(partition_col).agg(
        F.round(F.avg(F.col(value_col).cast("double")), 6).alias("avg_bucket"),
        F.sum(value_col).cast("long").alias("sum_bucket"),
        F.min(value_col).cast("long").alias("min_bucket"),
        F.max(value_col).cast("long").alias("max_bucket"),
        F.count("*").cast("long").alias("n_buckets"),
    )


def normalize_agg(
    buckets: DataFrame,
    partition_col: str = "qid",
    value_col: str = "count",
    method: str = "percent_of_sum",
    out_col: str = "share",
) -> DataFrame:
    """ES `normalize` pipeline aggregation: rescale each bucket's metric
    within its query. percent_of_sum = v / Σv; mean = (v-min)/(max-min)
    (ES's rescale_0_1 uses the same denominator). A window over the
    parent's partitioning — no extra shuffle."""
    w = Window.partitionBy(partition_col)
    v = F.col(value_col).cast("double")
    if method == "percent_of_sum":
        expr = v / F.sum(v).over(w)
    elif method == "rescale_0_1":
        rng = F.max(v).over(w) - F.min(v).over(w)
        expr = F.when(rng == 0, F.lit(0.0)).otherwise((v - F.min(v).over(w)) / rng)
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    return buckets.withColumn(out_col, F.round(expr, 6))


def bucket_script(buckets: DataFrame, expr, out_col: str = "value") -> DataFrame:
    """ES `bucket_script` pipeline: a per-bucket metric computed from
    the bucket's sibling metrics (a Catalyst expression — stays inside
    the parent aggregation's scan, no pass of its own)."""
    return buckets.withColumn(out_col, expr)


def bucket_selector(
    buckets: DataFrame,
    predicate,
) -> DataFrame:
    """ES `bucket_selector` pipeline: drop buckets failing a predicate
    over their metrics (a Catalyst boolean expression — pushed into the
    parent agg's output scan, no extra pass)."""
    return buckets.filter(predicate)


def filters_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    filters: Sequence,
    other_bucket: bool = False,
) -> DataFrame:
    """ES `filters` aggregation: named-filter buckets over the match
    set. `filters` is [(name, Column-over-doc_values)]; other_bucket
    adds ES's `_other_` bucket (docs matching NO filter; a null
    predicate counts as non-matching, per ES filter context). All
    buckets come out of ONE groupBy(qid) pass as conditional sums —
    adding a filter adds a column, not a scan."""
    m = _matches(queries, index).join(doc_values, "doc_id")
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond in filters
    ]
    names = [n for n, _ in filters]
    if other_bucket:
        none = None
        for _n, cond in filters:
            hit = F.when(cond, True).otherwise(False)  # null -> False
            none = hit if none is None else (none | hit)
        aggs.append(F.sum(F.when(~none, 1).otherwise(0)).alias("_other_"))
        names.append("_other_")
    wide = m.groupBy("qid").agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        "qid", f"stack({len(names)}, {stack}) as (bucket, count)"
    )


def global_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
) -> DataFrame:
    """ES `global` bucket: the corpus-wide stats of `field` attached
    next to each query's match-set stats (the DSL's escape hatch from
    query scope — 'my results vs everything'). The global side is ONE
    corpus aggregate broadcast-crossed onto the per-qid rows."""
    matched = stats_agg(queries, index, doc_values, field)
    c = F.col(field).cast("double")
    g = doc_values.agg(
        F.count("*").alias("g_n"),
        F.sum(c).alias("g_sum"),
        F.avg(c).alias("g_avg"),
    )
    return matched.crossJoin(F.broadcast(g))


def adjacency_matrix_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    filters: Sequence,
) -> DataFrame:
    """ES `adjacency_matrix`: one bucket per named filter and per
    pairwise intersection (key 'a&b' in the caller's filter order, the
    ES key contract). n filters -> n(n+1)/2 conditional sums in ONE
    groupBy pass — the cost is the match-set scan, not the pair count
    (ES caps n at 100 for the same reason). Empty buckets are omitted,
    like ES."""
    m = _matches(queries, index).join(doc_values, "doc_id")
    names = [n for n, _ in filters]
    conds = dict(filters)
    keys, aggs = [], []
    for i, a in enumerate(names):
        for b in names[i:]:
            key = a if a == b else f"{a}&{b}"
            cond = conds[a] if a == b else (conds[a] & conds[b])
            keys.append(key)
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(key))
    wide = m.groupBy("qid").agg(*aggs)
    stack = ", ".join(f"'{k}', `{k}`" for k in keys)
    return wide.selectExpr(
        "qid", f"stack({len(keys)}, {stack}) as (bucket, count)"
    ).filter(F.col("count") > 0)


def rare_terms_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    max_doc_count: int = 1,
) -> DataFrame:
    """ES `rare_terms`: the long-tail buckets whose match-set doc count
    is <= max_doc_count — the tail a terms agg's top-N misses. EXACT
    (no CuckooFilter false positives): the groupBy is the same shuffle
    terms_agg already pays; the tail filter happens post-aggregation on
    (qid, value, count) rows, which are bounded by distinct values, not
    docs."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", F.col(field).alias("value")), "doc_id"
    )
    counts = m.groupBy("qid", "value").agg(F.count("*").alias("count"))
    return counts.filter(F.col("count") <= max_doc_count)


def multi_terms_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    fields: Sequence[str],
    size: int = 10,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """ES `multi_terms`: composite-key buckets over the match set,
    top-`size` per query by count desc then key values asc — exact
    global counts, same salted top-N discipline as terms_agg."""
    m = _matches(queries, index).join(
        doc_values.select("doc_id", *fields), "doc_id"
    )
    counts = m.groupBy("qid", *fields).agg(F.count("*").alias("count"))
    order = [F.col("count").desc()] + [F.col(f).asc() for f in fields]
    top = cap_per_key(counts, ["qid"], order, size, salt_buckets=salt_buckets)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", *fields, "count", "rank"
    )


def string_stats_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    round_to: int = 6,
) -> DataFrame:
    """(qid, count, min_length, max_length, avg_r, entropy_r) — ES
    `string_stats` (with show_distribution's entropy) over a string doc
    value of the match set: value count, min/max/avg character length,
    and the Shannon entropy -Σ p_c·log2(p_c) of the CHARACTER
    distribution across all matched values (the ES contract). NULL
    values are skipped; a bucket whose values are all empty strings has
    entropy 0.

    Scale shape: lengths collapse map-side to one row per qid; the
    entropy pass explodes characters but immediately combines map-side
    to (qid, char) rows — the shuffle carries ≤ |qids|·|alphabet| rows,
    never the text. avg/entropy derive from exact integer counts with
    one float expression (the extended_stats discipline), rounded to
    `round_to` before comparison."""
    m = (
        _matches(queries, index)
        .join(doc_values.select("doc_id", F.col(field).alias("v")), "doc_id")
        .filter(F.col("v").isNotNull())
    )
    lens = m.groupBy("qid").agg(
        F.count("*").alias("count"),
        F.min(F.length("v")).alias("min_length"),
        F.max(F.length("v")).alias("max_length"),
        F.sum(F.length("v")).alias("_sum_len"),
    )
    chars = (
        m.select("qid", F.explode(F.split("v", "")).alias("ch"))
        .filter(F.length("ch") > 0)
        .groupBy("qid", "ch")
        .agg(F.count("*").alias("n"))
    )
    tot = chars.groupBy("qid").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot").cast("double")
    ent = (
        chars.join(F.broadcast(tot), "qid")
        .groupBy("qid")
        .agg(F.round(-F.sum(p * F.log2(p)), round_to).alias("entropy_r"))
    )
    return (
        lens.join(ent, "qid", "left")
        .na.fill({"entropy_r": 0.0})
        .select(
            "qid",
            "count",
            "min_length",
            "max_length",
            F.round(
                F.col("_sum_len").cast("double") / F.col("count").cast("double"),
                round_to,
            ).alias("avg_r"),
            "entropy_r",
        )
    )


def random_sampler_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    field: str,
    probability: float,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(qid, value, doc_count, est_count) — ES `random_sampler`: run the
    downstream terms aggregation over a probability-`probability` subset
    of the match set and scale the counts back up by 1/p. Unlike ES's
    per-shard RNG, the draw is a PURE FUNCTION of (doc_id, seed): doc is
    sampled iff hash(doc_id, seed) mod 2^20 < round(p·2^20), so re-runs,
    repartitions, and any SQL engine (portable=True → md5-derived hash,
    replayed by the DuckDB twin) reproduce the identical sample.
    est_count = round(doc_count / p_effective) with p_effective =
    threshold/2^20 — the integer threshold keeps both engines' float
    scaling bit-identical.

    Scale shape: the sample predicate is a map-side filter on the match
    rows (no extra shuffle); everything downstream touches only the
    sampled subset — the whole point of the agg at 100 TB."""
    if not (0.0 < probability <= 1.0):
        raise ValueError(f"probability must be in (0,1], got {probability}")
    from dpr_spark.functions.chunking import shuffle_key

    M = 1 << 20
    threshold = int(round(probability * M))
    key = F.pmod(shuffle_key("doc_id", seed, portable=portable), F.lit(M))
    sampled = _matches(queries, index).filter(key < F.lit(threshold))
    counts = (
        sampled.join(doc_values.select("doc_id", F.col(field).alias("value")), "doc_id")
        .groupBy("qid", "value")
        .agg(F.count("*").alias("doc_count"))
    )
    scale = float(M) / float(threshold)
    return counts.select(
        "qid",
        "value",
        "doc_count",
        F.round(F.col("doc_count").cast("double") * F.lit(scale))
        .cast("bigint")
        .alias("est_count"),
    )


def significant_text(
    queries: DataFrame,
    index: InvertedIndex,
    docs_text: DataFrame,
    size: int = 10,
    sample_size: int = 50,
    min_fg: int = 2,
    filter_duplicate_text: bool = True,
) -> DataFrame:
    """(qid, rank, term, fg_count, bg_count, score) — ES
    `significant_text` aggregation: significant_terms' JLH heuristic,
    but the foreground counts come from RE-ANALYZING the stored text of
    a bounded sample of top hits (ES: free_text fields have no term
    vectors / fielddata, so the agg re-tokenizes _source), with ES's
    `filter_duplicate_text` first: near-boilerplate duplicate texts in
    the sample are collapsed to their best-ranked copy so one
    syndicated page can't mint fake significance.

        sample  = top `sample_size` BM25 hits per query
        fg%     = fg_count / n_sampled,  bg% = df / N  (index stats)
        score   = (fg% − bg%) · (fg% / bg%)

    Scale shape: the only text ever touched is queries × sample_size
    stored docs (bounded by the request, never the corpus); duplicate
    collapse groups on sha2(text) — a 32-byte shuffle key, the text
    itself moves once from the stored-fields join. Background df reads
    the dictionary (vocab-sized, broadcast as the small side of a
    term-string join against the sample's re-analyzed vocabulary).
    Terms absent from the background drop out (same contract as
    significant_terms: JLH needs bg_count > 0)."""
    from dpr_spark.functions.analysis import tokenize_analyze_udf
    from dpr_spark.query.scorer import search

    hits = search(queries, index, k=sample_size).select("qid", "rank", "doc_id")
    sample = hits.join(docs_text.select("doc_id", "text"), "doc_id")
    if filter_duplicate_text:
        wdup = Window.partitionBy("qid", F.sha2(F.col("text"), 256)).orderBy(
            F.asc("rank")
        )
        sample = (
            sample.withColumn("_dup", F.row_number().over(wdup))
            .filter(F.col("_dup") == 1)
            .drop("_dup")
        )
    # re-analyze with the INDEX's recorded chain (ES: the field's
    # analyzer), so fg term spellings join the dictionary's
    sample = sample.select(
        "qid",
        "doc_id",
        tokenize_analyze_udf(index.analyzer)(F.col("text")).alias("toks"),
    )
    n_sampled = sample.groupBy("qid").agg(F.count("*").alias("n_sampled"))
    fg = (
        sample.select("qid", "doc_id", F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").alias("fg_count"))
        .filter(F.col("fg_count") >= min_fg)
    )
    n_docs = float(index.stats.n_docs)
    bg = index.dictionary.select("term", "df")
    scored = (
        fg.join(bg, "term")
        .join(F.broadcast(n_sampled), "qid")
        .withColumn("_fgr", F.col("fg_count") / F.col("n_sampled"))
        .withColumn("_bgr", F.col("df").cast("double") / F.lit(n_docs))
        .withColumn(
            "score",
            (F.col("_fgr") - F.col("_bgr")) * (F.col("_fgr") / F.col("_bgr")),
        )
        .select("qid", "term", "fg_count", F.col("df").alias("bg_count"), "score")
    )
    order = [F.col("score").desc(), F.col("term").asc()]
    top = cap_per_key(scored, ["qid"], order, size)
    w = Window.partitionBy("qid").orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "qid", "rank", "term", "fg_count", "bg_count", "score"
    )


def rate_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    ts_field: str,
    unit: str = "month",
    rate_unit: str = "day",
) -> DataFrame:
    """(qid, bucket, count, rate) — ES `rate` aggregation nested in a
    date_histogram: each calendar bucket's doc count normalized to a
    per-`rate_unit` rate by dividing by the number of rate_units in
    THAT bucket's calendar interval (ES divides by the actual month
    length — 31 for January — not an average). Supported pairs:
    month→day (days in that month), week→day (7), month→week (len/7).

    Same scale shape as date_histogram_agg (map-side combined counts,
    bucket-sized output); the divisor is a per-bucket Catalyst
    expression, no extra pass."""
    buckets = date_histogram_agg(queries, index, doc_values, ts_field, unit=unit)
    if unit == "month" and rate_unit == "day":
        div = F.dayofmonth(F.last_day(F.col("bucket"))).cast("double")
    elif unit == "week" and rate_unit == "day":
        div = F.lit(7.0)
    elif unit == "month" and rate_unit == "week":
        div = F.dayofmonth(F.last_day(F.col("bucket"))).cast("double") / F.lit(7.0)
    else:
        raise ValueError(f"unsupported rate pair {unit}->{rate_unit}")
    return buckets.select(
        "qid",
        "bucket",
        "count",
        (F.col("count").cast("double") / div).alias("rate"),
    )


def moving_percentiles(
    buckets: DataFrame,
    partition_col: str = "qid",
    order_col: str = "bucket",
    count_col: str = "count",
    window: int = 3,
    pct: float = 0.5,
) -> DataFrame:
    """(partition, order, count, mov_pct) — ES `moving_percentiles`
    pipeline aggregation: the interpolated `pct` percentile of the
    trailing `window` PRESENT buckets (min_doc_count>=1 series, like
    pipeline_metrics). Exact linear interpolation at h = (n−1)·pct over
    the sorted trailing values — the quantile_cont contract, NOT ES's
    TDigest approximation: Spark's shuffle-free window already holds
    the exact trailing values (bounded by `window`, never doc count),
    so there is nothing to sketch.

    Scale shape: one window pass over bucket-count-sized rows; state
    per row is `window` doubles."""
    if not (0.0 <= pct <= 1.0):
        raise ValueError(f"pct must be in [0,1], got {pct}")
    w = Window.partitionBy(partition_col).orderBy(order_col).rowsBetween(
        -(window - 1), 0
    )
    arr = F.array_sort(F.collect_list(F.col(count_col).cast("double")).over(w))
    n = F.size(arr)
    h = (n.cast("double") - F.lit(1.0)) * F.lit(float(pct))
    lo_i = F.floor(h).cast("int")
    hi_i = F.ceil(h).cast("int")
    lo = F.element_at(arr, lo_i + F.lit(1))
    hi = F.element_at(arr, hi_i + F.lit(1))
    val = lo + (hi - lo) * (h - lo_i.cast("double"))
    return buckets.select(
        partition_col, order_col, count_col, F.round(val, 6).alias("mov_pct")
    )


def ip_range_agg(
    queries: DataFrame,
    index: InvertedIndex,
    doc_values: DataFrame,
    ip_field: str,
    ranges: Sequence,
) -> DataFrame:
    """(qid, range_idx, range_from, range_to, count) — ES `ip_range`
    aggregation over the match set: [from, to) buckets on dotted-quad
    IPv4 strings, compared in address space (numeric uint32), possibly
    overlapping, computed in ONE pass like range_agg (conditional sums
    + stack — N ranges never cost N scans). None = unbounded end.

    Scale shape: the dotted-quad parse and every range predicate are
    Catalyst column math on the candidate rows; output is
    ranges-per-qid sized."""
    def ip_num(col):
        p = F.split(col, r"\.")
        return (
            F.element_at(p, 1).cast("long") * F.lit(16777216)
            + F.element_at(p, 2).cast("long") * F.lit(65536)
            + F.element_at(p, 3).cast("long") * F.lit(256)
            + F.element_at(p, 4).cast("long")
        )

    m = _matches(queries, index).join(
        doc_values.select("doc_id", F.col(ip_field).alias("_ip")), "doc_id"
    )
    v = ip_num(F.col("_ip"))
    sums = []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (v >= ip_num(F.lit(lo)))
        if hi is not None:
            cond = cond & (v < ip_num(F.lit(hi)))
        sums.append(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(f"_r{i}")
        )
    wide = m.groupBy("qid").agg(*sums)
    stack = ", ".join(
        f"{i}, '{lo or ''}', '{hi or ''}', _r{i}" for i, (lo, hi) in enumerate(ranges)
    )
    return wide.select(
        "qid",
        F.expr(
            f"stack({len(ranges)}, {stack}) AS (range_idx, range_from, range_to, count)"
        ),
    ).select("qid", "range_idx", "range_from", "range_to", "count")


def categorize_text_agg(
    matches: DataFrame,
    docs_text: DataFrame,
    size: int = 10,
    max_tokens: int = 4,
    partition_col: str = "qid",
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """ES `categorize_text` aggregation, made deterministic: group a
    query's matched docs into message categories by a token signature —
    the first `max_tokens` all-letter tokens of the lowercased text
    (tokens containing digits/punctuation are dropped, the ES
    categorizer's number-wildcard behavior; docs with NO letter tokens
    are uncategorized and emit no row). Top `size` categories per query
    by (count DESC, signature ASC).

    ES's implementation is a streaming drain-tree whose categories
    depend on arrival order; this contract keeps its use case (log/
    boilerplate grouping) reproducible and cross-engine checkable.

    Scale shape: the signature is pure Catalyst array math on the doc's
    own text (no UDF, no vocabulary); categories collapse with map-side
    combine; the per-query top-size runs over (qid, signature, count)
    rows through the exact two-level salted top-N."""
    sig = F.array_join(
        F.slice(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x.rlike("^[a-z]+$"),
            ),
            1,
            max_tokens,
        ),
        " ",
    )
    m = matches.join(docs_text.select("doc_id", "text"), "doc_id")
    cats = (
        m.withColumn("category", sig)
        .filter(F.col("category") != "")
        .groupBy(partition_col, "category")
        .agg(F.count("*").alias("count"))
    )
    order = [F.col("count").desc(), F.col("category").asc()]
    top = cap_per_key(cats, [partition_col], order, size, salt_buckets)
    w = Window.partitionBy(partition_col).orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        partition_col, "rank", "category", "count"
    )


def variable_width_histogram(
    df: DataFrame, field: str, buckets: int = 10, round_to: int = 6
) -> DataFrame:
    """(bucket, vmin, vmax, centroid, doc_count) — ES
    `variable_width_histogram`: at most `buckets` variable-width value
    clusters, each reported with min/max/centroid/count.

    ES's streaming nearest-centroid algorithm is shard-order-dependent;
    this engine uses the DETERMINISTIC equal-depth contract instead:
    seed `buckets` equal-count tiles (exact ntile semantics — the first
    `total % buckets` tiles get one extra row), then assign every
    distinct value to the tile of its FIRST row so equal values never
    split across buckets (adjacent tiles sharing a boundary value merge
    into it). Same inputs -> same buckets, on any partitioning, in any
    engine — which is what makes an oracle twin possible at all.

    Scale shape: raw rows collapse map-side to (value, count) — the only
    row-sized shuffle. The ntile positions come from a cumulative sum
    over the DISTINCT-VALUE table ordered by value; that single-
    partition window sees one row per distinct value, not per doc (the
    same coordinator-sized merge ES performs), and histogram fields are
    low-cardinality by construction. Tile arithmetic is closed-form from
    (first_pos, total, buckets): no second pass, no iteration."""
    counts = (
        df.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("value"))
        .agg(F.count("*").alias("cnt"))
    )
    total_df = counts.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy("value")
    pos = counts.join(F.broadcast(total_df)).withColumn(
        "first_pos", F.sum("cnt").over(w) - F.col("cnt") + 1
    )
    B = F.lit(buckets)
    q = F.floor(F.col("total") / B).cast("long")
    r = (F.col("total") - q * B).cast("long")
    big_span = r * (q + 1)  # positions covered by the (q+1)-sized tiles
    p = F.col("first_pos")
    tile = F.when(
        p <= big_span, F.floor((p - 1) / (q + 1)) + 1
    ).otherwise(
        # q == 0 implies total < buckets implies every position is in
        # big_span, so this branch never divides by zero with q >= 1
        r + F.floor((p - big_span - 1) / F.greatest(q, F.lit(1))) + 1
    )
    tiled = pos.withColumn("tile", tile.cast("long"))
    agg = tiled.groupBy("tile").agg(
        F.min("value").cast("long").alias("vmin"),
        F.max("value").cast("long").alias("vmax"),
        F.round(
            F.sum(F.col("value").cast("double") * F.col("cnt"))
            / F.sum("cnt"),
            round_to,
        ).alias("centroid"),
        F.sum("cnt").cast("long").alias("doc_count"),
    )
    wb = Window.orderBy("tile")
    return agg.withColumn(
        "bucket", F.dense_rank().over(wb).cast("long")
    ).select("bucket", "vmin", "vmax", "centroid", "doc_count")


def cumulative_cardinality(
    rows: DataFrame,
    partition_col: str = "qid",
    order_col: str = "bucket",
    value_col: str = "value",
) -> DataFrame:
    """ES `cumulative_cardinality` pipeline agg, EXACT: for each present
    bucket of the parent series, the number of distinct values seen in
    any bucket up to and including it (the "new users per day /
    total-users-to-date" agg).

    ES layers this over per-bucket HLL sketches and is approximate; the
    shuffle gives us the exact number at the same cost class via the
    first-seen collapse: each distinct (partition, value) reduces
    map-side to its MIN bucket (one row per distinct value, never per
    event), new-value counts land on their first bucket, and one
    bucket-series window turns them cumulative. Buckets present in the
    parent series but with no new values still report (carried
    cumulative), matching ES with min_doc_count=1."""
    p, o, v = partition_col, order_col, value_col
    present = rows.select(p, o).distinct()
    firsts = (
        rows.groupBy(p, v)
        .agg(F.min(o).alias(o))
        .groupBy(p, o)
        .agg(F.count("*").alias("new_values"))
    )
    joined = present.join(firsts, [p, o], "left").withColumn(
        "new_values", F.coalesce("new_values", F.lit(0)).cast("long")
    )
    w = (
        Window.partitionBy(p)
        .orderBy(o)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.withColumn(
        "cumulative_distinct", F.sum("new_values").over(w).cast("long")
    )


def change_point(
    buckets: DataFrame,
    partition_col: str = "qid",
    order_col: str = "bucket",
    metric_col: str = "value",
    round_to: int = 6,
) -> DataFrame:
    """ES `change_point` agg under a deterministic contract: the split
    of the parent bucket series into two contiguous segments that
    minimizes total within-segment sum of squared error (the classic
    single change-point / step-detection objective; ES's ML detector
    family includes exactly this step_change case). Ties break to the
    earliest split. Output per partition: the first bucket of the right
    segment (`change_at`), segment means, and the variance reduction
    1 - SSE_split/SSE_total (0.0 when the series is constant). The
    argmin compares costs ROUNDED to `round_to` dp so a last-ulp float
    difference can't flip the winner between engines (the same
    discipline the top-k scorers apply to ranks).

    One window pass over the parent series (state = bucket count, never
    doc count): exclusive prefix sums of x and x² give every candidate
    split's two-segment SSE in closed form — no per-split rescan."""
    p, o, m = partition_col, order_col, metric_col
    w = Window.partitionBy(p).orderBy(o)
    wall = Window.partitionBy(p)
    x = F.col(m).cast("double")
    pre = buckets.select(
        p,
        o,
        x.alias("_x"),
        (F.sum(x).over(w) - x).alias("_s1"),
        (F.sum(x * x).over(w) - x * x).alias("_q1"),
        (F.row_number().over(w) - 1).alias("_n1"),
    ).withColumn("_S", F.sum("_x").over(wall)).withColumn(
        "_Q", F.sum(F.col("_x") * F.col("_x")).over(wall)
    ).withColumn("_N", F.count("*").over(wall))
    cand = pre.filter(F.col("_n1") >= 1)  # both segments non-empty
    n2 = F.col("_N") - F.col("_n1")
    s2 = F.col("_S") - F.col("_s1")
    q2 = F.col("_Q") - F.col("_q1")
    sse1 = F.col("_q1") - F.col("_s1") * F.col("_s1") / F.col("_n1")
    sse2 = q2 - s2 * s2 / n2
    scored = cand.withColumn("_cost", sse1 + sse2)
    best = scored.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(p).orderBy(
                F.round(F.col("_cost"), round_to).asc(), F.col(o).asc()
            )
        ),
    ).filter(F.col("_rk") == 1)
    sse_total = F.col("_Q") - F.col("_S") * F.col("_S") / F.col("_N")
    return best.select(
        p,
        F.col(o).alias("change_at"),
        F.round(F.col("_s1") / F.col("_n1"), round_to).alias("before_mean"),
        F.round(s2 / n2, round_to).alias("after_mean"),
        F.round(
            F.when(sse_total > 0, 1.0 - F.col("_cost") / sse_total).otherwise(
                0.0
            ),
            round_to,
        ).alias("reduction"),
    )
