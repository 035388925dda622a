"""Watermarked streaming crawl analytics (streaming/crawlstats.py):

- crawl_rate_stream: append-mode windowed agg — a window emits only
  after the watermark passes its end; late rows inside the allowed
  lateness count, rows later than the watermark are dropped.
- content_change_stream: stateful CDC — 'new' on first sight,
  'updated' on digest change, silence on unchanged re-crawl; state
  advances anyway.

Each phase is a checkpointed Trigger.AvailableNow run over a file
source, so the watermark carried in the checkpoint advances between
phases exactly like micro-batches in a live stream.
"""

import datetime
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

T0 = datetime.datetime(2024, 1, 1)


def _ts(minutes, seconds=0):
    return T0 + datetime.timedelta(minutes=minutes, seconds=seconds)


def _write_batch(path, rows):
    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array(
                    [r[1] for r in rows], type=pa.timestamp("us")
                ),
                "source": [r[2] for r in rows],
                "text": [r[3] for r in rows],
            }
        ),
        path,
    )


def _run_phase(spark, transform, src, out, ckpt):
    q = (
        transform(
            spark.readStream.schema(PAGES_SCHEMA).parquet(str(src))
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _md5(s):
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_crawl_rate_windows_emit_on_watermark(spark, tmp_path):
    from dpr_spark.streaming.crawlstats import crawl_rate_stream

    src = tmp_path / "incoming"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def transform(pages):
        return crawl_rate_stream(pages, window="1 minute", watermark="2 minutes")

    # phase 1: minute-0 traffic only -> watermark still before any
    # window end -> nothing finalized, nothing emitted
    _write_batch(
        str(src / "b1.parquet"),
        [
            ("u1", _ts(0, 10), "cc", "aaaa"),
            ("u2", _ts(0, 40), "cc", "bb"),
            ("u3", _ts(0, 50), "news", "cccccc"),
        ],
    )
    _run_phase(spark, transform, src, out, ckpt)
    got = spark.read.schema(
        "window_start timestamp, window_end timestamp, source string,"
        " n_pages long, total_chars long"
    ).parquet(str(out))
    assert got.count() == 0

    # phase 2: minute-5 traffic + one LATE minute-0 row. Watermark at
    # the start of this batch is max(b1)-2min < 0, so the late row is
    # inside the allowed lateness and must count. After the batch the
    # watermark is 5:00-2:00=3:00 > 1:00, finalizing the minute-0
    # windows WITH the late row.
    _write_batch(
        str(src / "b2.parquet"),
        [
            ("u4", _ts(5, 0), "cc", "dd"),
            ("u5", _ts(0, 30), "cc", "eee"),  # late, within lateness
        ],
    )
    _run_phase(spark, transform, src, out, ckpt)
    rows = {
        (r.window_start, r.source): (r.n_pages, r.total_chars)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows[(_ts(0), "cc")] == (3, 9)  # u1+u2+late u5
    assert rows[(_ts(0), "news")] == (1, 6)
    assert len(rows) == 2  # minute-5 window not finalized yet

    # phase 3: minute-10 traffic + one TOO-LATE minute-0 row (watermark
    # is now 3:00 > its window end 1:00 -> dropped). Finalizes the
    # minute-5 window without contamination.
    _write_batch(
        str(src / "b3.parquet"),
        [
            ("u6", _ts(10, 0), "cc", "f"),
            ("u7", _ts(0, 20), "cc", "gggggggg"),  # beyond watermark
        ],
    )
    _run_phase(spark, transform, src, out, ckpt)
    rows = {
        (r.window_start, r.source): (r.n_pages, r.total_chars)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows[(_ts(5), "cc")] == (1, 2)  # u4 only, u7 dropped
    assert rows[(_ts(0), "cc")] == (3, 9)  # unchanged: emitted once
    assert len(rows) == 3


def test_content_change_stream_cdc(spark, tmp_path):
    from dpr_spark.streaming.crawlstats import content_change_stream

    src = tmp_path / "incoming"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def transform(pages):
        return content_change_stream(pages, watermark="2 minutes")

    # phase 1: u1,u2 first-sight; u3 has TWO versions in one batch
    # (ts order: v1 then v2) -> 'new' + 'updated' in the same batch
    _write_batch(
        str(src / "b1.parquet"),
        [
            ("u1", _ts(0, 10), "cc", "one"),
            ("u2", _ts(0, 20), "cc", "two"),
            ("u3", _ts(0, 5), "cc", "v1"),
            ("u3", _ts(0, 45), "cc", "v2"),
        ],
    )
    _run_phase(spark, transform, src, out, ckpt)
    got = {
        (r.url, r.change): (r.prev_digest, r.digest)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got[("u1", "new")] == (None, _md5("one"))
    assert got[("u3", "new")] == (None, _md5("v1"))
    assert got[("u3", "updated")] == (_md5("v1"), _md5("v2"))
    assert len(got) == 4

    # phase 2: u1 changed -> 'updated'; u2 re-crawled unchanged -> no
    # row (but state advanced); u4 first-sight -> 'new'
    _write_batch(
        str(src / "b2.parquet"),
        [
            ("u1", _ts(5, 0), "cc", "one-b"),
            ("u2", _ts(5, 10), "cc", "two"),
            ("u4", _ts(5, 20), "cc", "four"),
        ],
    )
    _run_phase(spark, transform, src, out, ckpt)
    all_rows = spark.read.parquet(str(out)).collect()
    assert len(all_rows) == 6
    upd = [r for r in all_rows if r.url == "u1" and r.change == "updated"]
    assert len(upd) == 1 and upd[0].prev_digest == _md5("one")
    assert not [r for r in all_rows if r.url == "u2" and r.change == "updated"]

    # phase 3: u2 changes relative to the (silently advanced) state
    _write_batch(
        str(src / "b3.parquet"),
        [("u2", _ts(10, 0), "cc", "two-b")],
    )
    _run_phase(spark, transform, src, out, ckpt)
    rows = [
        r
        for r in spark.read.parquet(str(out)).collect()
        if r.url == "u2" and r.change == "updated"
    ]
    assert len(rows) == 1 and rows[0].prev_digest == _md5("two")

def test_content_change_state_gc_after_ttl(spark, tmp_path):
    """State is GC'd `ttl` past a url's last crawl: after the watermark
    passes the timeout, a re-crawl with IDENTICAL content emits 'new'
    again — proof the digest state was dropped, i.e. state is bounded
    by the active-url set, not crawl history."""
    from dpr_spark.streaming.crawlstats import content_change_stream

    src = tmp_path / "incoming"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def transform(pages):
        return content_change_stream(
            pages, watermark="2 minutes", state_ttl_minutes=1
        )

    _write_batch(str(src / "b1.parquet"), [("u1", _ts(0, 0), "cc", "same")])
    _run_phase(spark, transform, src, out, ckpt)
    # unrelated traffic pushes the watermark to 8:00 > u1's 1:00 timeout
    _write_batch(str(src / "b2.parquet"), [("zz", _ts(10, 0), "cc", "x")])
    _run_phase(spark, transform, src, out, ckpt)
    # identical re-crawl: with live state this would be silent
    _write_batch(str(src / "b3.parquet"), [("u1", _ts(15, 0), "cc", "same")])
    _run_phase(spark, transform, src, out, ckpt)

    u1 = [r for r in spark.read.parquet(str(out)).collect() if r.url == "u1"]
    assert sorted(r.change for r in u1) == ["new", "new"]
    assert all(r.prev_digest is None for r in u1)
