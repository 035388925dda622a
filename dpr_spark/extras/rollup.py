"""Rollup / downsampling — the ES rollup-job + TSDB downsampling
contract: a raw event stream is pre-aggregated into a coarse-grained
rollup table (one row per (time bucket, group) carrying decomposable
partial aggregates), and calendar-ALIGNED queries are answered from the
rollup EXACTLY — sum of sums, min of mins, count of counts; avg is
re-derived as sum/count at query time, never averaged-of-averages.

Scale shape: the rollup build is ONE map-side-combined shuffle on
(bucket, groups) — output is bucket-count-sized, never event-sized. A
query served from the rollup touches ~days×groups rows instead of the
raw 10^12-event table; `can_serve` is the router's alignment check
(week/month queries over a day rollup: yes; hour queries: no — the
raw table is the honest fallback, same as ES's rollup search).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

# calendar units a 'day'-grained rollup can serve exactly
_ALIGNED = {
    "day": {"day", "week", "month", "quarter", "year"},
    "hour": {"hour", "day", "week", "month", "quarter", "year"},
    "week": {"week"},
    "month": {"month", "quarter", "year"},
}


def can_serve(rollup_unit: str, query_unit: str) -> bool:
    """True when every `query_unit` bucket is a union of whole
    `rollup_unit` buckets (calendar alignment — weeks are NOT unions of
    months, hours always nest)."""
    return query_unit in _ALIGNED.get(rollup_unit, set())


def build_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    unit: str = "day",
    group_cols: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """(bucket, *group_cols, n, sum_v, min_v, max_v): the decomposable
    partial aggregates of `value_col` per (date_trunc(unit), groups).
    avg is intentionally absent — it is NOT decomposable; readers
    derive it as sum/count."""
    b = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    v = F.col(value_col)
    return events.groupBy(b, *[F.col(c) for c in group_cols]).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def rollup_histogram(
    rollup: DataFrame,
    rollup_unit: str,
    query_unit: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Re-bucket the rollup to a coarser calendar unit EXACTLY:
    (bucket, *groups, n, sum_v, min_v, max_v, avg_v). Raises when the
    units don't align (the caller must fall back to the raw table —
    serving a misaligned query from a rollup silently drops edge
    events, the failure mode ES's rollup search refuses too)."""
    if not can_serve(rollup_unit, query_unit):
        raise ValueError(
            f"a {rollup_unit!r} rollup cannot serve {query_unit!r} exactly"
        )
    b = F.date_trunc(query_unit, F.col("bucket")).alias("bucket")
    out = rollup.groupBy(b, *[F.col(c) for c in group_cols]).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    return out.withColumn(
        "avg_v", F.col("sum_v") / F.col("n").cast("double")
    )
