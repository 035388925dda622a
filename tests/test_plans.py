"""Physical-plan shape assertions: the properties that make the engine
viable at 100 TB must be visible in EXPLAIN output, not just intended —
filter pushdown to the parquet scan, column pruning, broadcast joins on
small sides, pinned partition counts."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _explain(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def stored_blocks(spark, index, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("blk") / "block_segments")
    from dpr_spark.query.blockmax import build_block_segments

    blocks, norms = build_block_segments(index, num_buckets=4)
    blocks.write.mode("overwrite").parquet(path)
    return path


def test_blocks_scan_pushes_term_filter(spark, stored_blocks):
    """The query path reads ONLY query-term blocks from storage: the
    term_id IN (...) filter must reach the parquet scan as a pushed
    filter, and the binary payload columns must not defeat pruning."""
    df = spark.read.parquet(stored_blocks).filter(F.col("term_id").isin([1, 2, 3]))
    plan = _explain(df)
    assert "PushedFilters" in plan
    assert "In(term_id" in plan.replace(" ", "")


def test_docs_scan_prunes_columns(spark, tmp_path):
    """prepare_docs without verify_extract must never read `html` (the
    widest column) — ReadSchema shows only what the build needs."""
    from dpr_spark.fixtures.corpus import gen_pages_pdf

    path = str(tmp_path / "pages.parquet")
    pdf = gen_pages_pdf(50, seed=9)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)

    from dpr_spark.index.build import prepare_docs

    docs = prepare_docs(pages)
    plan = _explain(docs)
    # the parquet scan schema must exclude html and warc_ts
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert all("html" not in ln for ln in read), read
    assert all("warc_ts" not in ln for ln in read), read


def test_scorer_uses_broadcast_joins(spark, index, queries_df):
    """J6: the dictionary and the query-term set are broadcast; postings
    are probed in place (no exchange repartitioning the postings table by
    term)."""
    from dpr_spark.query.scorer import score_exact

    plan = _explain(score_exact(queries_df, index))
    assert "BroadcastHashJoin" in plan
    # the big side must not be shuffled on the join key: no
    # hashpartitioning(term_id) exchange in the plan
    assert "hashpartitioning(term_id" not in plan


def test_build_partition_counts_pinned(spark, pages_df):
    """The tokenize layout is 3 tasks/core and the encode shuffle 2
    tasks/core, pinned explicitly so AQE cannot coalesce the expensive
    stages onto few cores."""
    from dpr_spark.plans.ids import ranged_parts

    par = spark.sparkContext.defaultParallelism
    cleanup = []
    parts, bc, total = ranged_parts(
        pages_df.select("url", "text"), "url", 3 * par, cleanup
    )
    assert parts.rdd.getNumPartitions() == 3 * par
    assert total == pages_df.count()
    for c in cleanup:
        c.unpersist(True)


def test_impact_segments_partitioned_by_bucket(spark, index):
    from dpr_spark.query.wand import build_impact_segments

    seg = build_impact_segments(index, num_buckets=8)
    plan = _explain(seg)
    assert "hashpartitioning(bucket" in plan
