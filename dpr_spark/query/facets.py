"""Facet counts over search results — the Lucene faceting surface
(per-query value histograms of result metadata: language, source
domain, crawl date bucket...). A serving stack renders these next to
the result list; a training-data pipeline uses them to audit what a
query slice retrieves.

Contract: for each query and each requested facet column, the count of
top-k result docs per distinct value (nulls excluded); columns are cast
to string so heterogeneous facets stack into one output.

Scale shape: one broadcast-able results→docs join (k × queries rows)
followed by an explode over |facets| literals and a partial+final hash
agg — Catalyst-native end to end."""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_counts(
    results: DataFrame, docs: DataFrame, facets: Sequence[str]
) -> DataFrame:
    """results(qid, doc_id[, ...]) ⋈ docs(doc_id, <facet cols>) ->
    (qid, facet, value, n)."""
    if not facets:
        raise ValueError("no facet columns")
    j = results.select("qid", "doc_id").join(
        docs.select("doc_id", *facets), "doc_id"
    )
    fv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(f).alias("facet"),
                    F.col(f).cast("string").alias("value"),
                )
                for f in facets
            ]
        )
    ).alias("fv")
    return (
        j.select("qid", fv)
        .select("qid", F.col("fv.facet").alias("facet"), F.col("fv.value").alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("qid", "facet", "value")
        .agg(F.count("*").alias("n"))
    )


def drill_sideways(
    results: DataFrame,
    docs: DataFrame,
    selections: Mapping[str, str],
) -> DataFrame:
    """Lucene DrillSideways over a result set: the user has drilled down
    on one value per dimension (`selections`); the HIT set applies every
    selection, but each dimension's facet counts are computed with all
    OTHER selections applied and its OWN selection lifted — the counts a
    faceted-search UI needs to show "what else is available in this
    dimension" without the dimension filtering itself out
    (lucene/facet DrillSideways: one query, N+1 perspectives).

    Output: (qid, facet, value, n) — per dimension the sideways value
    histogram (nulls excluded, exactly like facet_counts), plus one
    `('_hits', '*')` row per qid carrying the fully-drilled hit count
    (0-hit queries keep their row, so the sheet is total).

    Scale shape: ONE pass, no per-dimension re-query — the Lucene trick
    re-expressed relationally. After the k×queries results→docs join,
    a doc's `_miss` = number of failed selections decides every
    perspective at once: it is a HIT iff _miss = 0, and it contributes
    to dimension d's sideways counts iff _miss = 0 (all selections hold)
    or _miss = 1 with d itself the one miss. The explode emits
    |selections| rows per candidate; everything downstream is a
    partial+final hash agg. Null-safe: a NULL dimension value fails its
    selection (and never appears as a counted value)."""
    if not selections:
        raise ValueError("no drill-down selections")
    dims = list(selections)
    j = results.select("qid", "doc_id").join(
        docs.select("doc_id", *dims), "doc_id"
    )
    miss = None
    for d, v in selections.items():
        m = F.when(F.col(d).eqNullSafe(F.lit(v)), 0).otherwise(1)
        miss = m if miss is None else miss + m
    j = j.withColumn("_miss", miss)
    fv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("facet"),
                    F.col(d).cast("string").alias("value"),
                    F.col(d).eqNullSafe(F.lit(selections[d])).alias("own_ok"),
                )
                for d in dims
            ]
        )
    ).alias("fv")
    side = (
        j.select("qid", "_miss", fv)
        .filter(
            (F.col("_miss") == 0)
            | ((F.col("_miss") == 1) & (~F.col("fv.own_ok")))
        )
        .filter(F.col("fv.value").isNotNull())
        .groupBy("qid", F.col("fv.facet").alias("facet"), F.col("fv.value").alias("value"))
        .agg(F.count("*").alias("n"))
    )
    hits = (
        results.select("qid")
        .distinct()
        .join(
            j.filter(F.col("_miss") == 0).groupBy("qid").agg(F.count("*").alias("n")),
            "qid",
            "left",
        )
        .select(
            "qid",
            F.lit("_hits").alias("facet"),
            F.lit("*").alias("value"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    return side.unionByName(hits)


def taxonomy_facets(
    results: DataFrame,
    doc_paths: DataFrame,
    path_col: str = "path",
    sep: str = "/",
    under: str = "",
    top_n: int = 10,
) -> DataFrame:
    """Hierarchical (taxonomy) facets — the lucene/facet path taxonomy:
    each result doc carries a path like ``"science/physics/quantum"``;
    the UI asks "what are the top child categories under <under> for
    this query's hits?" and drills down a level at a time.

    results(qid, doc_id[, ...]) ⋈ doc_paths(doc_id, <path_col>) ->
    (qid, rank, child, label, n): the ``top_n`` IMMEDIATE children of
    ``under`` ranked (n DESC, label ASC), where ``n`` counts result
    docs whose path passes through that child (Lucene
    ``FacetsCollector`` + ``getTopChildren(n, path...)``). ``child`` is
    the full path of the child node, ``label`` its last segment.
    ``under=""`` lists the taxonomy roots.

    Scale shape: the k×queries result set joins doc paths (narrow J1
    join); the level selection is pure string column math (no explode
    of all ancestors — only the one requested level materializes), then
    a partial+final hash agg and the exact per-qid top-N window."""
    from pyspark.sql import Window

    depth = 0 if not under else len(under.split(sep))
    j = results.select("qid", "doc_id").join(
        doc_paths.select("doc_id", F.col(path_col).alias("_p")), "doc_id"
    )
    parts = F.split(F.col("_p"), re_escape_sep(sep))
    if under:
        j = j.filter(
            (F.size(parts) > depth)
            & (F.array_join(F.slice(parts, 1, depth), sep) == F.lit(under))
        )
    else:
        j = j.filter(F.size(parts) > 0)
    child = F.array_join(F.slice(parts, 1, depth + 1), sep)
    label = F.element_at(parts, depth + 1)
    counts = (
        j.select("qid", child.alias("child"), label.alias("label"))
        .groupBy("qid", "child", "label")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("n"), F.asc("label"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("qid", "rank", "child", "label", "n")
    )


def re_escape_sep(sep: str) -> str:
    """F.split takes a regex; escape the separator literally."""
    import re as _re

    return _re.escape(sep)
