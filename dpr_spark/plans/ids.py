"""Scalable deterministic dense-id assignment (0..N-1 by sort order).

A single-partition `row_number() OVER (ORDER BY col)` window is the
textbook non-scalable step (all rows through one task). The two-phase
form is shuffle-equivalent to a global sort but embarrassingly parallel:

  1. repartitionByRange(col) + sortWithinPartitions(col) — global order
     across ordered range partitions;
  2. count rows per partition (tiny job), prefix-sum the counts on the
     driver, broadcast the offsets;
  3. mapInPandas: id = partition_offset + local running index.

Deterministic for unique `col` values regardless of sampled range
boundaries (order, not placement, defines the id). This is the engine's
doc_id (dense rank of url, FIXTURES.md §1) and term_id assignment at
10^12-row scale (SURVEY.md §4 "explicit engineering").
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranged_parts(
    df: DataFrame,
    order_col: str,
    num_partitions: Optional[int] = None,
    cleanup: Optional[list] = None,
):
    """The two-phase rank's shared machinery: globally range-sorted
    persisted partitions + broadcast per-partition id offsets + total row
    count. Callers either attach ids row-by-row (assign_dense_ids) or
    FUSE the id arithmetic into their own mapInPandas kernel (the index
    build fuses it into tokenize — one Python stage instead of two).

    order_col values MUST be unique (same requirement as the narrow
    path): ids are positional over the persisted partitions, and callers
    routinely run MULTIPLE jobs over them (tf kernel, then the docstats
    attach). sortWithinPartitions is not stable across a cache-eviction
    recompute, so duplicate keys could silently receive different ids in
    different jobs.

    The partition id is STAMPED INTO THE DATA (`_range_pid`) during the
    counts job — the first action, run on `parts` directly, so the stamp
    equals the cache partition index. Downstream kernels key the offset
    map by the column, never by TaskContext.partitionId(): when the
    attach stage runs inside a UNION (or after a coalesce), task
    partition ids are offset by the sibling child's partition count and
    a TaskContext lookup would silently resolve to the wrong offset
    (observed: every partition missing from the map defaulting to 0 —
    duplicate ids). Consumers raise loudly on a pid the map doesn't
    know. persist() is MEMORY_AND_DISK, so stamped partitions spill
    rather than recompute; only executor loss (job failure on one box)
    could re-stamp under a consumer's context."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # range partitioning SAMPLES its child (one full execution) before the
    # real shuffle (a second): cache the slim input so upstream (e.g. a
    # groupBy over 10^10 tf rows) computes once
    src = df.persist()
    parts = (
        src.repartitionByRange(n, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_range_pid", F.spark_partition_id())
        .persist()
    )
    counts = parts.groupBy("_range_pid").count().collect()
    src.unpersist(True)  # the counts job materialized the `parts` cache
    if cleanup is not None:
        cleanup.append(parts)
    cmap = {int(r["_range_pid"]): int(r["count"]) for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(cmap):
        offsets[pid] = acc
        acc += cmap[pid]
    bc = spark.sparkContext.broadcast(offsets)
    return parts, bc, acc


def assign_dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str,
    num_partitions: Optional[int] = None,
    narrow: bool = False,
    cleanup: Optional[list] = None,
    broadcast_map: bool = True,
    local: bool = False,
) -> DataFrame:
    """narrow=True ranks over order_col ALONE (a slim shuffle: one string
    column instead of the whole row, e.g. no page text) and joins the
    (order_col, id) map back — requires order_col values to be unique.
    AQE picks a broadcast join when the map is small; sort-merge at
    scale.

    cleanup: optional list that receives the DataFrames this function
    persists (the ranked partitions must outlive the returned DataFrame's
    lineage); callers unpersist them when the ids are no longer needed.

    local=True ranks with a plain single-partition row_number window —
    ONE exchange, no sampling job, no counts job, no Python stage.
    Correct at any size (the ids are the same dense rank) but the sort
    runs in one task, so callers only pass it when they KNOW the input is
    driver-scale small (e.g. a vocab bounded by an already-materialized
    row count); the default stays the scalable two-phase path.
    `_dense_id_count` is not computed (no counts job ran)."""
    if local:
        from pyspark.sql import Window

        out = df.withColumn(
            id_col,
            (F.row_number().over(Window.orderBy(order_col)) - 1).cast("long"),
        )
        out._dense_id_count = None
        return out
    if narrow:
        ids = assign_dense_ids(
            df.select(order_col), order_col, id_col, num_partitions, cleanup=cleanup
        )
        # explicit broadcast: the (order_col, id) map is tiny relative to
        # the full rows (no AQE/stats needed to see it). At 10^12 rows set
        # broadcast_map=False — the join becomes sort-merge on order_col.
        out = df.join(F.broadcast(ids) if broadcast_map else ids, order_col)
        out._dense_id_count = ids._dense_id_count  # row count, free byproduct
        return out
    parts, bc, acc = ranged_parts(df, order_col, num_partitions, cleanup)
    out = attach_ids(parts, bc, id_col)
    # the prefix-sum already counted every row: callers (e.g. corpus N for
    # BM25 idf) can reuse it instead of running a count() job
    out._dense_id_count = acc
    return out


def _offset_for(offsets_bc, pid: int) -> int:
    """Offset lookup keyed by the stamped `_range_pid` column. A pid the
    counts job never saw means the cached layout changed under us (e.g. a
    re-stamp after executor loss inside a unioned consumer stage) — ids
    would silently collide, so fail the task instead."""
    offs = offsets_bc.value
    if pid not in offs:
        raise RuntimeError(
            f"ranged_parts partition {pid} is not in the offsets map "
            f"({sorted(offs)}): the cached partition layout changed after "
            "the counts job; rerun the id assignment"
        )
    return offs[pid]


def attach_ids(parts: DataFrame, offsets_bc, id_col: str, columns=None) -> DataFrame:
    """Positional id attach over ranged_parts output: id = partition
    offset + local running index, partition resolved via the stamped
    `_range_pid` column (NOT TaskContext — see ranged_parts: a union or
    coalesce in the consumer plan offsets task partition ids). `columns`
    optionally projects first (row order is preserved by select — ids
    stay the global rank). Requires the ranged_parts order_col to be
    unique — with duplicates, a recompute after cache eviction may
    reorder the tie run between this job and a sibling kernel's job,
    mismatching ids."""
    from pyspark.sql import types as T

    if columns is not None:
        parts = parts.select(*columns, "_range_pid")
    # copy, don't .add(): StructType.add mutates the df's cached schema
    out_schema = T.StructType(
        [f for f in parts.schema.fields if f.name != "_range_pid"]
        + [T.StructField(id_col, T.LongType())]
    )

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in it:
            if not len(pdf):
                continue
            base = _offset_for(offsets_bc, int(pdf["_range_pid"].iloc[0]))
            ids = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf.drop(columns=["_range_pid"]).assign(**{id_col: list(ids)})

    return parts.mapInPandas(assign, out_schema)
