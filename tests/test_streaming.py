"""Structured-Streaming incremental index refresh: new page files become
searchable doc_terms deltas without a rebuild."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_batch(path, rows):
    pq.write_table(
        pa.table(
            {"url": [r[0] for r in rows], "text": [r[1] for r in rows]},
        ),
        path,
    )


def test_streaming_refresh(spark, tmp_path):
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), [("u1", "alpha beta gamma"), ("u2", "beta delta")])

    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"))
    q = r.start(str(src), PAGES_SCHEMA)
    q.awaitTermination(120)

    dt = r.delta_doc_terms()
    assert dt is not None
    terms = {(row.term) for row in dt.collect()}
    assert {"alpha", "beta", "gamma", "delta"} <= terms
    n1 = dt.count()

    # second batch arrives -> only the new file is processed (checkpoint)
    _write_batch(str(src / "b2.parquet"), [("u3", "epsilon beta")])
    q2 = r.start(str(src), PAGES_SCHEMA)
    q2.awaitTermination(120)
    dt2 = r.delta_doc_terms()
    assert dt2.count() == n1 + 2  # epsilon + beta for u3, nothing re-tokenized
    assert r.delta_docs().count() == 3

    # compaction folds delta into a searchable index
    base = spark.createDataFrame([("u0", "alpha zeta")], PAGES_SCHEMA)
    delta_pages = spark.createDataFrame(
        [("u1", "alpha beta gamma"), ("u2", "beta delta"), ("u3", "epsilon beta")],
        PAGES_SCHEMA,
    )
    idx = r.compact(base, delta_pages)
    assert idx.stats.n_docs == 4
    qdf = spark.createDataFrame([(0, "beta")], "qid long, question string")
    from dpr_spark.query.scorer import search

    hits = search(qdf, idx, k=10).count()
    assert hits == 3  # u1, u2, u3 contain beta


def test_streaming_refresh_into_snapshot_catalog(spark, tmp_path):
    """Catalog mode: each micro-batch is an append snapshot (time travel
    over freshness states); redelivered epochs are skipped, so the
    at-least-once foreachBatch contract yields exactly-once appends."""
    import shutil

    from dpr_spark.index.snapshots import SnapshotCatalog
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), [("u1", "alpha beta"), ("u2", "beta")])
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"), catalog=cat)
    r.start(str(src), PAGES_SCHEMA).awaitTermination(120)
    assert len(cat.history()) == 1
    n1 = r.delta_doc_terms().count()
    assert n1 == 3  # alpha+beta for u1, beta for u2

    _write_batch(str(src / "b2.parquet"), [("u3", "gamma beta")])
    r.start(str(src), PAGES_SCHEMA).awaitTermination(120)
    hist = cat.history()
    assert len(hist) == 2 and hist[-1]["operation"] == "append"
    assert r.delta_doc_terms().count() == n1 + 2
    # time travel: the delta state BEFORE b2 arrived
    assert cat.read("doc_terms", snapshot_id=hist[0]["snapshot_id"]).count() == n1

    # at-least-once redelivery: wiping the checkpoint replays every file
    # under an epoch id that is already committed -> skipped, no double
    # append
    shutil.rmtree(str(tmp_path / "delta" / "_checkpoint"))
    r.start(str(src), PAGES_SCHEMA).awaitTermination(120)
    assert len(cat.history()) == 2
    assert r.delta_doc_terms().count() == n1 + 2


def test_streaming_percolator_alerts(spark, tmp_path):
    """Standing queries alert on matching pages per micro-batch;
    a resumed stream processes only NEW files (no duplicate alerts)."""
    from dpr_spark.query.percolate import PercolatorQuery, percolate_py
    from dpr_spark.streaming.alerts import StreamingPercolator

    src = tmp_path / "incoming"
    src.mkdir()
    batch1 = [("u1", "alpha beta gamma"), ("u2", "beta delta"), ("u3", "zeta")]
    _write_batch(str(src / "b1.parquet"), batch1)

    queries = [
        PercolatorQuery(0, must=("alpha",)),
        PercolatorQuery(1, should=("delta", "zeta"), msm=1),
        PercolatorQuery(2, must=("beta",), must_not=("gamma",)),
    ]
    p = StreamingPercolator(spark, queries, str(tmp_path / "alerts"))
    p.start(str(src), PAGES_SCHEMA).awaitTermination(120)

    got = {(r.url, r.pqid) for r in p.alerts().collect()}
    expect = set()
    for url, text in batch1:
        for pqid in percolate_py(text, queries):
            expect.add((url, pqid))
    assert got == expect and got  # u1->0, u2->1 & 2, u3->1

    # second batch: checkpoint resume — only the new file alerts
    batch2 = [("u4", "alpha zeta"), ("u5", "nothing matches here")]
    _write_batch(str(src / "b2.parquet"), batch2)
    p.start(str(src), PAGES_SCHEMA).awaitTermination(120)
    got2 = {(r.url, r.pqid) for r in p.alerts().collect()}
    expect2 = set(expect)
    for url, text in batch2:
        for pqid in percolate_py(text, queries):
            expect2.add((url, pqid))
    assert got2 == expect2
    assert len([1 for r in p.alerts().collect()]) == len(got2)  # no dupes
