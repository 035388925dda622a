"""Streaming MinHash near-dup (streaming/neardup.py): within-batch
cluster-min survives, cross-batch ledger probes drop later near-copies,
distinct docs pass, epoch replay is idempotent."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1)

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "builds postings and scores bm25 queries over the crawl corpus"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token edit: high jaccard
OTHER = (
    "completely different content about window aggregation watermarks "
    "and late arriving events in structured streaming pipelines today"
)


def _write_batch(path, rows, order=0):
    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array(
                    [T0 + datetime.timedelta(seconds=r[1]) for r in rows],
                    type=pa.timestamp("us"),
                ),
                "text": [r[2] for r in rows],
            }
        ),
        path,
    )
    # the file source orders batches by modification time; two files
    # written in the same clock tick would arrive in UNDEFINED order —
    # pin arrival order explicitly (this test models sequenced arrival)
    import os

    t = 1_700_000_000 + order * 60
    os.utime(path, (t, t))


def test_streaming_neardup_within_and_across_batches(spark, tmp_path):
    from dpr_spark.streaming.neardup import StreamingNearDeduper

    src = tmp_path / "incoming"
    src.mkdir()
    # b1: near-identical pair (a1 is cluster-min url) + one distinct doc
    _write_batch(
        str(src / "b1.parquet"),
        [("a1", 10, BASE), ("a2", 5, NEAR), ("b1", 7, OTHER)],
        order=0,
    )
    # b2: a near-copy of BASE from a new url (ledger hit), an exact copy
    # of OTHER (ledger hit), and a brand-new doc
    _write_batch(
        str(src / "b2.parquet"),
        [("c1", 20, NEAR), ("c2", 21, OTHER), ("d1", 22, BASE + " extra tail entirely new words appended here")],
        order=1,
    )

    d = StreamingNearDeduper(spark, str(tmp_path / "nd"), threshold=0.5)
    d.start(str(src), PAGES_SCHEMA).awaitTermination(180)

    kept = sorted(r.url for r in d.docs().collect())
    # a2 drops within-batch (cluster min = a1); c1/c2 drop on the ledger;
    # d1 survives only if its tail pushes similarity below threshold —
    # with a 20%-longer doc est-jaccard stays >= 0.5, so it drops too.
    assert "a1" in kept and "b1" in kept
    assert "a2" not in kept and "c1" not in kept and "c2" not in kept

    dups = {r.url: (r.dup_of, r.scope) for r in d.dups().collect()}
    assert dups["a2"] == ("a1", "batch")
    assert dups["c1"] == ("a1", "ledger")
    assert dups["c2"] == ("b1", "ledger")
    for r in d.dups().collect():
        assert r.est_jaccard is None or r.est_jaccard >= 0.5


def test_streaming_neardup_distinct_docs_all_survive(spark, tmp_path):
    from dpr_spark.streaming.neardup import StreamingNearDeduper

    src = tmp_path / "incoming"
    src.mkdir()
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "spark catalyst tungsten codegen shuffle partition broadcast join",
    ]
    _write_batch(str(src / "b1.parquet"), [(f"u{i}", i, t) for i, t in enumerate(texts)])

    d = StreamingNearDeduper(spark, str(tmp_path / "nd"), threshold=0.5)
    d.start(str(src), PAGES_SCHEMA).awaitTermination(120)
    assert sorted(r.url for r in d.docs().collect()) == ["u0", "u1", "u2"]
    assert d.dups().count() == 0


def test_streaming_neardup_replay_idempotent(spark, tmp_path):
    from dpr_spark.streaming.neardup import StreamingNearDeduper

    d = StreamingNearDeduper(spark, str(tmp_path / "nd"), threshold=0.5)
    b1 = spark.createDataFrame(
        [("a1", T0, BASE), ("a2", T0, NEAR), ("b1", T0, OTHER)],
        PAGES_SCHEMA,
    )
    b2 = spark.createDataFrame([("c1", T0, NEAR), ("e1", T0, OTHER + " x")], PAGES_SCHEMA)
    d.process_batch(b1, 0)
    d.process_batch(b2, 1)
    first = sorted((r.url,) for r in d.docs().collect())
    dups_first = sorted((r.url, r.dup_of, r.scope) for r in d.dups().collect())
    # at-least-once replay of epoch 1: same world, same result
    d.process_batch(b2, 1)
    assert sorted((r.url,) for r in d.docs().collect()) == first
    assert sorted((r.url, r.dup_of, r.scope) for r in d.dups().collect()) == dups_first


def test_streaming_neardup_state_is_text_free(spark, tmp_path):
    """The cross-batch ledger holds signatures and band keys only."""
    from dpr_spark.streaming.neardup import StreamingNearDeduper

    d = StreamingNearDeduper(spark, str(tmp_path / "nd"), threshold=0.5)
    b1 = spark.createDataFrame([("a1", T0, BASE)], PAGES_SCHEMA)
    d.process_batch(b1, 0)
    sigs = spark.read.parquet(str(tmp_path / "nd" / "sigs" / "epoch=0"))
    buckets = spark.read.parquet(str(tmp_path / "nd" / "buckets" / "epoch=0"))
    assert set(sigs.columns) == {"url", "sig"}
    assert set(buckets.columns) == {"band", "key", "url"}
