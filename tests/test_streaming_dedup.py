"""Streaming exact dedup (streaming/dedup.py): first copy per content
digest survives within and across micro-batches; epoch replay is
idempotent."""

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


def _write_batch(path, rows):
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


def test_streaming_dedup_within_and_across_batches(spark, tmp_path):
    from dpr_spark.streaming.dedup import StreamingDeduper

    src = tmp_path / "incoming"
    src.mkdir()
    # b1: "same text" twice (u2 earlier) + one unique
    _write_batch(
        str(src / "b1.parquet"),
        [("u1", 10, "same text"), ("u2", 5, "same text"), ("u3", 7, "unique one")],
    )
    # b2 (later epoch): replays "same text" from a new url + a new doc
    _write_batch(
        str(src / "b2.parquet"),
        [("u4", 20, "same text"), ("u5", 21, "brand new")],
    )

    d = StreamingDeduper(spark, str(tmp_path / "dedup"))
    d.start(str(src), PAGES_SCHEMA).awaitTermination(120)

    rows = {r.url: r.text for r in d.docs().collect()}
    # earliest copy of "same text" is u2; u1 (same batch) and u4 (later
    # batch) are dropped
    assert rows == {"u2": "same text", "u3": "unique one", "u5": "brand new"}

    # a later drain with old content admits nothing new
    _write_batch(str(src / "b3.parquet"), [("u6", 30, "unique one")])
    d.start(str(src), PAGES_SCHEMA).awaitTermination(120)
    assert {r.url for r in d.docs().collect()} == {"u2", "u3", "u5"}


def test_streaming_dedup_epoch_replay_is_idempotent(spark, tmp_path):
    from dpr_spark.streaming.dedup import StreamingDeduper

    d = StreamingDeduper(spark, str(tmp_path / "dedup"))
    b0 = spark.createDataFrame(
        [("u1", T0, "aaa"), ("u2", T0, "bbb")], PAGES_SCHEMA
    )
    d.process_batch(b0, 0)
    b1 = spark.createDataFrame(
        [("u3", T0, "aaa"), ("u4", T0, "ccc")], PAGES_SCHEMA
    )
    d.process_batch(b1, 1)
    first = sorted((r.url, r.digest) for r in d.docs().collect())
    # at-least-once delivery: epoch 1 replays — same survivors, no dupes
    d.process_batch(b1, 1)
    assert sorted((r.url, r.digest) for r in d.docs().collect()) == first
    assert {r.url for r in d.docs().collect()} == {"u1", "u2", "u4"}
    # ledger holds one digest per admitted doc
    assert d.ledger().count() == 3
