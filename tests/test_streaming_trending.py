"""Streaming trending terms (streaming/trending.py): windowed exact
occurrence counts finalize on the watermark (late-in-lateness counts,
too-late drops), top_trending ranks finalized windows."""

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

T0 = datetime.datetime(2024, 6, 1)


def _ts(minutes, seconds=0):
    return T0 + datetime.timedelta(minutes=minutes, seconds=seconds)


def _write_batch(path, rows, order=0):
    import os

    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "text": [r[2] for r in rows],
            }
        ),
        path,
    )
    t = 1_700_000_000 + order * 60
    os.utime(path, (t, t))


def test_trending_terms_watermark_and_topk(spark, tmp_path):
    from dpr_spark.streaming.trending import top_trending, trending_terms_stream

    src = tmp_path / "incoming"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def phase():
        q = (
            trending_terms_stream(
                spark.readStream.schema(PAGES_SCHEMA).parquet(str(src)),
                window="1 minute",
                watermark="2 minutes",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # minute-0 traffic: 'crawler' x3 occurrences in 2 docs, 'spark' x2
    _write_batch(
        str(src / "b1.parquet"),
        [
            ("u1", _ts(0, 10), "crawler spark crawler"),
            ("u2", _ts(0, 40), "crawler spark the it"),  # short terms drop
        ],
        order=0,
    )
    phase()
    assert (
        not out.exists()
        or spark.read.schema(
            "window_start timestamp, window_end timestamp, term string,"
            " n_occ long, n_docs long"
        ).parquet(str(out)).count() == 0
    )

    # minute-5 traffic + a LATE minute-0 page (inside lateness: counts);
    # finalizes minute-0
    _write_batch(
        str(src / "b2.parquet"),
        [
            ("u3", _ts(5, 0), "engine engine"),
            ("u4", _ts(0, 30), "crawler"),  # late, within lateness
        ],
        order=1,
    )
    phase()
    rows = {
        (r.window_start, r.term): (r.n_occ, r.n_docs)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows[(_ts(0), "crawler")][0] == 4  # 3 + late u4
    assert rows[(_ts(0), "spark")][0] == 2
    assert (_ts(0), "it") not in rows  # min_len guard (len 2 < 3)
    assert (_ts(5), "engine") not in rows  # not finalized yet

    # minute-10 + a TOO-LATE minute-0 page (dropped); finalizes minute-5
    _write_batch(
        str(src / "b3.parquet"),
        [("u5", _ts(10, 0), "done"), ("u6", _ts(0, 20), "crawler crawler")],
        order=2,
    )
    phase()
    sink = spark.read.parquet(str(out))
    rows = {
        (r.window_start, r.term): r.n_occ for r in sink.collect()
    }
    assert rows[(_ts(5), "engine")] == 2
    assert rows[(_ts(0), "crawler")] == 4  # too-late u6 did NOT count

    top = top_trending(sink, k=1).collect()
    by_win = {r.window_start: (r.rank, r.term, r.n_occ) for r in top}
    assert by_win[_ts(0)] == (1, "crawler", 4)
    assert by_win[_ts(5)] == (1, "engine", 2)
