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

from typing import Sequence

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
