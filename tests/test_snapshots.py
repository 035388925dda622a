"""Snapshot catalog: commits, time travel, rollback, snapshot isolation,
append manifests, expiry GC, and index round-trip (north_rule "resumable
from Iceberg snapshot checkpoints"; the parquet+JSON emulation is the
documented sandbox fallback, SURVEY.md §7)."""

import os

import pytest
from pyspark.sql import functions as F

from dpr_spark.index.snapshots import SnapshotCatalog, load_index_at, snapshot_index


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("doc_id"))


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "catalog"))


def test_commit_read_and_time_travel(spark, cat):
    s1 = cat.commit({"t": _df(spark, 0, 10)}, timestamp_ms=1000)
    s2 = cat.commit({"t": _df(spark, 0, 25)}, timestamp_ms=2000)
    assert cat.read("t").count() == 25  # current
    assert cat.read("t", snapshot_id=s1).count() == 10  # VERSION AS OF
    assert cat.read("t", as_of_ms=1500).count() == 10  # TIMESTAMP AS OF
    assert cat.read("t", as_of_ms=2000).count() == 25
    assert [s["snapshot_id"] for s in cat.history()] == [s1, s2]
    with pytest.raises(ValueError):
        cat.read("t", as_of_ms=500)


def test_append_merges_manifest_without_rewrite(spark, cat):
    s1 = cat.commit({"t": _df(spark, 0, 10)})
    files_v1 = set(cat._resolve(snapshot_id=s1)["manifest"]["t"])
    s2 = cat.append({"t": _df(spark, 10, 15)})
    man2 = cat._resolve(snapshot_id=s2)["manifest"]["t"]
    assert files_v1 < set(man2)  # parent files reused, not rewritten
    assert cat.read("t").count() == 15
    assert cat.read("t", snapshot_id=s1).count() == 10


def test_snapshot_isolation_reader_unaffected_by_later_commit(spark, cat):
    cat.commit({"t": _df(spark, 0, 10)})
    reader = cat.read("t")  # planned against snapshot 1's file list
    cat.commit({"t": _df(spark, 0, 99)})
    assert reader.count() == 10  # still sees its snapshot
    assert cat.read("t").count() == 99


def test_rollback_preserves_history(spark, cat):
    s1 = cat.commit({"t": _df(spark, 0, 10)})
    s2 = cat.commit({"t": _df(spark, 0, 20)})
    s3 = cat.rollback(s1)
    assert cat.read("t").count() == 10
    # rollback is a NEW snapshot sharing s1's files — s2 stays readable,
    # and the rollback itself can be rolled back
    assert cat.read("t", snapshot_id=s2).count() == 20
    s4 = cat.rollback(s2)
    assert cat.read("t").count() == 20
    assert [s["snapshot_id"] for s in cat.history()] == [s1, s2, s3, s4]


def test_expire_gc_keeps_shared_files(spark, cat):
    s1 = cat.commit({"t": _df(spark, 0, 10)})
    cat.commit({"t": _df(spark, 0, 20)})
    s3 = cat.rollback(s1)  # shares s1's data files
    dead = cat.expire(keep_last=2)  # drops s1; its files live on via s3
    assert dead == []
    assert cat.read("t", snapshot_id=s3).count() == 10
    cat.commit({"t": _df(spark, 0, 5)})
    dead = cat.expire(keep_last=1)  # drops s2 and s3 -> their files go
    assert dead and all(f.endswith(".parquet") for f in dead)
    assert all(not os.path.exists(f) for f in dead)
    assert cat.read("t").count() == 5


def test_crashed_writer_files_invisible_to_manifest_readers(spark, cat):
    cat.commit({"t": _df(spark, 0, 10)})
    # simulate a crashed/concurrent writer dumping files into the table
    # data area WITHOUT a metadata commit
    stray = os.path.join(cat.workdir, "data", "t", "snap=999")
    _df(spark, 0, 50).write.parquet(stray)
    assert cat.read("t").count() == 10  # manifest plan ignores strays


def test_index_snapshot_round_trip_rank_identical(spark, tmp_path):
    from dpr_spark.fixtures.corpus import gen_pages_pdf
    from dpr_spark.index.build import build_index
    from dpr_spark.query.scorer import search

    cat = SnapshotCatalog(spark, str(tmp_path / "idxcat"))
    pages = spark.createDataFrame(gen_pages_pdf(300, seed=11))
    idx = build_index(spark, pages, build_blocks=False)
    sid = snapshot_index(cat, idx, timestamp_ms=42_000)
    assert cat.properties(snapshot_id=sid)["n_docs"] == idx.stats.n_docs

    qdf = spark.createDataFrame([(0, "the big table scan")], ["qid", "question"])
    want = [(r.doc_id, round(r.score, 6)) for r in search(qdf, idx, k=5).orderBy("rank").collect()]
    idx2 = load_index_at(cat, as_of_ms=42_000)
    got = [(r.doc_id, round(r.score, 6)) for r in search(qdf, idx2, k=5).orderBy("rank").collect()]
    assert got == want
    idx.unpersist()


def test_index_snapshot_carries_positions_and_id_strategy(spark, tmp_path):
    """A snapshot commit preserves the positional postings and the doc-id
    contract: a time-traveled index can phrase-serve and still fail fast
    as an NRT base."""
    from dpr_spark.fixtures.corpus import gen_pages_pdf
    from dpr_spark.index.build import build_index
    from dpr_spark.query.phrase import phrase_search_index

    cat = SnapshotCatalog(spark, str(tmp_path / "poscat"))
    pages_pdf = gen_pages_pdf(200, seed=31)
    pages = spark.createDataFrame(pages_pdf)
    idx = build_index(
        spark, pages, build_blocks=False, build_positional=True, id_strategy="hash"
    )
    snapshot_index(cat, idx, timestamp_ms=50_000)

    idx2 = load_index_at(cat, as_of_ms=50_000)
    assert idx2.id_strategy == "hash"
    assert idx2.positions is not None

    from dpr_spark.functions.tokenizer import tokenize

    bigram = " ".join(tokenize(pages_pdf["text"].iloc[0])[:2])
    qdf = [(0, bigram)]
    want = sorted(
        (r.rank, r.doc_id, round(r.score, 9))
        for r in phrase_search_index(spark, idx, idx.positions, qdf, k=5).collect()
    )
    got = sorted(
        (r.rank, r.doc_id, round(r.score, 9))
        for r in phrase_search_index(spark, idx2, idx2.positions, qdf, k=5).collect()
    )
    assert got == want and want
    idx.unpersist()


def test_concurrent_commit_fenced(spark, tmp_path):
    """r3 VERDICT next-round #6: two writers interleave — the second
    publish (started from a now-stale parent) raises instead of silently
    clobbering current, and the manifest is uncorrupted."""
    import pytest

    from dpr_spark.index.snapshots import ConcurrentCommitError, SnapshotCatalog

    wd = str(tmp_path / "cat")
    w1 = SnapshotCatalog(spark, wd)
    w2 = SnapshotCatalog(spark, wd)
    df = spark.range(3).toDF("v")
    s1 = w1.commit({"t": df})

    # writer 1 starts a commit (reads meta), writer 2 lands one first
    stale = w1._read_meta()
    s2 = w2.commit({"t": df.withColumn("v", df.v + 1)})
    with pytest.raises(ConcurrentCommitError):
        w1._publish(stale, s2 + 1, "overwrite", {"t": []}, None, None)

    # no corruption: writer 2's snapshot is current, history is intact
    meta = w1._read_meta()
    assert meta["current"] == s2
    assert [s["snapshot_id"] for s in meta["snapshots"]] == [s1, s2]
    assert w1.read("t").count() == 3


def test_pit_pins_snapshot_through_expire_and_search(spark, cat, pages_df):
    """ES point-in-time: an open PIT keeps its snapshot readable (and
    rank-stable) across later commits AND expiry; closing it releases
    the pin and the next expire reclaims the files."""
    from dpr_spark.index.build import build_index
    from dpr_spark.query.scorer import search

    v1_pages = pages_df.limit(120)
    idx1 = build_index(spark, v1_pages)
    s1 = snapshot_index(cat, idx1, timestamp_ms=1000)
    pit = cat.open_pit()
    assert pit["snapshot_id"] == s1

    # live index moves on twice (expire keeps only the newest w/o pins)
    idx2 = build_index(spark, pages_df.limit(200))
    snapshot_index(cat, idx2, timestamp_ms=2000)
    idx3 = build_index(spark, pages_df.limit(260))
    snapshot_index(cat, idx3, timestamp_ms=3000)
    dead = cat.expire(keep_last=1)
    kept_ids = {s["snapshot_id"] for s in cat.history()}
    assert s1 in kept_ids, "pinned snapshot must survive expire"
    assert len(kept_ids) == 2  # newest + pinned; the middle one dropped
    assert dead  # the unpinned middle snapshot's files were reclaimed

    qdf = spark.createDataFrame([(0, "the spark window")], ["qid", "question"])
    pinned_idx = load_index_at(cat, snapshot_id=pit["snapshot_id"])
    got_pit = [
        (r.rank, r.doc_id)
        for r in search(qdf, pinned_idx, k=5).orderBy("rank").collect()
    ]
    got_v1 = [
        (r.rank, r.doc_id)
        for r in search(qdf, idx1, k=5).orderBy("rank").collect()
    ]
    assert got_pit == got_v1  # PIT reads v1 exactly, not the live index

    cat.close_pit(pit["pit_id"])
    assert cat.pits() == {}
    cat.expire(keep_last=1)
    assert {s["snapshot_id"] for s in cat.history()} != kept_ids
    with pytest.raises(ValueError):
        cat._resolve(snapshot_id=s1)


def test_pit_double_open_and_unknown_close(spark, cat):
    cat.commit({"t": _df(spark, 0, 5)})
    pit = cat.open_pit(pit_id="p1")
    with pytest.raises(ValueError):
        cat.open_pit(pit_id="p1")
    with pytest.raises(KeyError):
        cat.close_pit("nope")
    cat.close_pit(pit["pit_id"])


def test_alias_zero_downtime_reindex(spark, tmp_path, pages_df):
    """ES alias swap: readers through the alias see v1, one atomic set()
    repoints to a NEW catalog (reindex), pinned aliases stay frozen."""
    from dpr_spark.index.build import build_index
    from dpr_spark.index.snapshots import AliasRegistry
    from dpr_spark.query.scorer import search

    reg = AliasRegistry(str(tmp_path / "aliases.json"))
    cat1 = SnapshotCatalog(spark, str(tmp_path / "cat_v1"))
    idx1 = build_index(spark, pages_df.limit(100))
    s1 = snapshot_index(cat1, idx1, timestamp_ms=1000)
    reg.set("web", str(tmp_path / "cat_v1"))
    reg.set("web-frozen", str(tmp_path / "cat_v1"), snapshot_id=s1)

    qdf = spark.createDataFrame([(0, "the spark window")], ["qid", "question"])
    r1 = [(r.rank, r.doc_id) for r in search(qdf, reg.resolve(spark, "web"), k=5)
          .orderBy("rank").collect()]

    # reindex: v2 in a brand-new catalog; one atomic repoint
    cat2 = SnapshotCatalog(spark, str(tmp_path / "cat_v2"))
    idx2 = build_index(spark, pages_df.limit(220))
    snapshot_index(cat2, idx2, timestamp_ms=2000)
    reg.set("web", str(tmp_path / "cat_v2"))

    r2 = [(r.rank, r.doc_id) for r in search(qdf, reg.resolve(spark, "web"), k=5)
          .orderBy("rank").collect()]
    frozen = [(r.rank, r.doc_id) for r in
              search(qdf, reg.resolve(spark, "web-frozen"), k=5)
              .orderBy("rank").collect()]
    assert frozen == r1          # pinned alias is a stable named view
    assert r2 != r1              # live alias serves the reindexed corpus

    assert set(reg.aliases()) == {"web", "web-frozen"}
    reg.drop("web-frozen")
    with pytest.raises(KeyError):
        reg.resolve(spark, "web-frozen")
    with pytest.raises(KeyError):
        reg.drop("nope")
