"""Document deletion lifecycle (Lucene deletes): tombstoned docs vanish
from every live search with STALE statistics (scores of survivors
unchanged); purge_deletes == fresh build over the survivors, bit for
bit."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tombstones(spark, index):
    # every 7th doc dies
    return index.docstats.filter(F.col("doc_id") % 7 == 0).select("doc_id")


def _expected_after_delete(full_rows, dead, k):
    """Original ranking minus dead docs, re-ranked, top k — the
    stale-stats contract: surviving scores are the ORIGINAL scores."""
    exp = {}
    for r in sorted(full_rows, key=lambda r: (r.qid, r.rank)):
        if r.doc_id in dead:
            continue
        lst = exp.setdefault(r.qid, [])
        if len(lst) < k:
            lst.append((len(lst) + 1, r.doc_id, r.score))
    return exp


def test_live_search_excludes_tombstones_stale_stats(
    spark, index, queries_df, tombstones
):
    from dpr_spark.query.scorer import search
    from dpr_spark.query.wand import build_impact_segments, search_segments

    dead = {r.doc_id for r in tombstones.collect()}
    full = search(queries_df, index, k=1000).collect()
    exp = _expected_after_delete(full, dead, 10)

    got_exact = {}
    for r in search(queries_df, index, k=10, deletes=tombstones).collect():
        got_exact.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for v in got_exact.values():
        v.sort()
    assert got_exact == exp

    seg = build_impact_segments(index, num_buckets=4)
    got_seg = {}
    for r in search_segments(
        spark, queries_df, index, seg, k=10, deletes=tombstones
    ).collect():
        got_seg.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for v in got_seg.values():
        v.sort()
    assert got_seg == exp


def test_deletes_compose_with_pagination(spark, index, queries_df, tombstones):
    """liveDocs apply before the cursor filter: page 2 of a deleted-doc
    search equals ranks k+1..2k of the deleted-doc full ranking."""
    from dpr_spark.query.paging import cursors_from_page, search_after
    from dpr_spark.query.wand import build_impact_segments, search_segments

    seg = build_impact_segments(index, num_buckets=4)
    full = {}
    for r in search_segments(
        spark, queries_df, index, seg, k=10, deletes=tombstones
    ).collect():
        full.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    page1 = search_segments(spark, queries_df, index, seg, k=5, deletes=tombstones)
    page2 = search_segments(
        spark, queries_df, index, seg, k=5,
        deletes=tombstones, cursors=cursors_from_page(page1),
    )
    got = {}
    for r in page2.collect():
        got.setdefault(r.qid, []).append((r.rank + 5, r.doc_id, r.score))
    exp = {
        q: sorted((rk, d, s) for rk, d, s in rows if rk > 5)
        for q, rows in full.items()
    }
    exp = {q: v for q, v in exp.items() if v}
    assert {q: sorted(v) for q, v in got.items()} == exp


def test_purge_equals_fresh_build(spark, pages_pdf, queries_df):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.deletes import purge_deletes
    from dpr_spark.query.scorer import search

    pw = assign_doc_ids(pages_pdf.head(150))
    docs = spark.createDataFrame(pw[["doc_id", "url", "text"]])
    idx = build_index_from_docs(spark, docs, build_blocks=False, build_positional=True)
    dead = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    purged = purge_deletes(spark, idx, dead)
    fresh = build_index_from_docs(
        spark, docs.filter(F.col("doc_id") % 5 != 0),
        build_blocks=False, build_positional=True,
    )
    assert purged.stats.n_docs == fresh.stats.n_docs
    assert purged.stats.avgdl == fresh.stats.avgdl
    pdict = sorted(tuple(r) for r in purged.dictionary.collect())
    fdict = sorted(tuple(r) for r in fresh.dictionary.collect())
    assert pdict == fdict
    ppost = sorted(tuple(r) for r in purged.postings.collect())
    fpost = sorted(tuple(r) for r in fresh.postings.collect())
    assert ppost == fpost
    ppos = sorted(tuple(r) for r in purged.positions.collect())
    fpos = sorted(tuple(r) for r in fresh.positions.collect())
    assert ppos == fpos
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, purged, k=10).collect()
    )
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, fresh, k=10).collect()
    )
    assert got == exp


def test_deletes_for_urls_and_serve_guard(spark, index, tombstones):
    from dpr_spark.index.deletes import deletes_for_urls
    from dpr_spark.serve import make_searcher

    urls = index.docstats.filter(F.col("doc_id") % 7 == 0).select("url")
    via_urls = {r.doc_id for r in deletes_for_urls(index, urls).collect()}
    assert via_urls == {r.doc_id for r in tombstones.collect()}

    with pytest.raises(ValueError, match="tombstones"):
        make_searcher(spark, index, engine="blockmax", deletes=tombstones)


def test_serve_with_deletes(spark, index, queries_pdf, tombstones, tmp_path):
    import os

    from dpr_spark.query.wand import build_impact_segments, search_segments
    from dpr_spark.serve import make_searcher, serve_loop

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    os.makedirs(in_dir)
    qpdf = queries_pdf.head(6)[["qid", "question"]]
    qpdf.to_parquet(in_dir / "b.parquet", index=False)
    (in_dir / "STOP").touch()
    searcher, close = make_searcher(
        spark, index, engine="segments", k=5, deletes=tombstones
    )
    serve_loop(spark, searcher, str(in_dir), str(out_dir), poll_sec=0.05)
    close()
    seg = build_impact_segments(index)
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search_segments(
            spark, spark.createDataFrame(qpdf), index, seg, k=5, deletes=tombstones
        ).collect()
    )
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in spark.read.parquet(str(out_dir / "b")).collect()
    )
    assert got == exp
