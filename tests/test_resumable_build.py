"""Resumability gate (FIXTURES.md §3 build_manifest): kill mid-build,
re-run, only missing shards are processed; the assembled index is
rank-identical to the direct build."""

import pytest


def test_resume_after_failure(spark, pages_df, queries_df, index, tmp_path):
    from dpr_spark.index.manifest import ResumableIndexBuilder

    b = ResumableIndexBuilder(spark, str(tmp_path / "idx"), n_shards=6)

    # crash after 2 shards
    with pytest.raises(RuntimeError, match="injected failure"):
        b.run_shards(pages_df, fail_after=2)
    m1 = b.read_manifest()
    assert sum(1 for r in m1.values() if r.status == "done") == 2

    # resume: processes ONLY the remaining 4
    n2 = b.run_shards(pages_df)
    assert n2 == 4
    m2 = b.read_manifest()
    assert len(m2) == 6 and all(r.status == "done" for r in m2.values())
    # lineage metrics recorded per partition
    assert all(r.rows > 0 and r.bytes > 0 and r.wall_ms >= 0 for r in m2.values())

    # a third run is a no-op
    assert b.run_shards(pages_df) == 0

    # assembled index == direct build (same docstats + same search results)
    idx2 = b.assemble(pages_df, build_blocks=False)
    assert idx2.stats.n_docs == index.stats.n_docs
    assert idx2.stats.avgdl == pytest.approx(index.stats.avgdl, abs=1e-12)

    from dpr_spark.query.scorer import search

    r1 = {(r.qid, r.rank): (r.doc_id, r.score) for r in search(queries_df, index, k=10).collect()}
    r2 = {(r.qid, r.rank): (r.doc_id, r.score) for r in search(queries_df, idx2, k=10).collect()}
    assert r1 == r2

    # manifest surfaces as the build_manifest DataFrame
    mdf = b.manifest_df()
    assert mdf.count() == 6
    assert set(mdf.columns) == {"partition_id", "status", "rows", "bytes", "wall_ms"}


def test_assemble_refuses_incomplete(spark, pages_df, tmp_path):
    from dpr_spark.index.manifest import ResumableIndexBuilder

    b = ResumableIndexBuilder(spark, str(tmp_path / "idx2"), n_shards=4)
    with pytest.raises(RuntimeError):
        b.run_shards(pages_df, fail_after=1)
    with pytest.raises(ValueError, match="shards not built"):
        b.assemble(pages_df)
