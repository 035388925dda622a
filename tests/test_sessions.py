"""Sessionization (extras/sessions.py): session_window semantics vs a
python gaps-and-islands twin (including the exact-gap boundary), plus
the append-mode streaming contract (watermark closes sessions)."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from dpr_spark.extras.sessions import session_stats, sessionize

T0 = datetime.datetime(2024, 1, 1)


def _ts(minutes, seconds=0):
    return T0 + datetime.timedelta(minutes=minutes, seconds=seconds)


def _python_sessions(rows, gap_sec):
    """Twin: inclusive extend (t - prev <= gap); end = last + gap."""
    from collections import defaultdict

    by = defaultdict(list)
    for uid, ts, v in rows:
        by[uid].append((ts, v))
    out = []
    for uid, evs in by.items():
        evs.sort()
        cur = None
        for ts, v in evs:
            if cur and (ts - cur["last"]).total_seconds() <= gap_sec:
                cur["n"] += 1
                cur["v"] += v
                cur["last"] = ts
            else:
                if cur:
                    out.append(cur)
                cur = {"uid": uid, "start": ts, "last": ts, "n": 1, "v": v}
        out.append(cur)
    return {
        (c["uid"], c["start"], c["last"] + datetime.timedelta(seconds=gap_sec)): (
            c["n"],
            round(c["v"], 4),
        )
        for c in out
    }


@pytest.fixture()
def events_rows():
    # user 1: three events inside one 10-min-gap session, then a break
    # user 2: an event EXACTLY gap after the previous (boundary: still
    # MERGES — session_window's extend is inclusive), then one at
    # gap+1s (breaks)
    return [
        (1, _ts(0), 1.0),
        (1, _ts(4), 2.0),
        (1, _ts(9), 3.0),
        (1, _ts(40), 4.0),
        (2, _ts(0), 5.0),
        (2, _ts(10), 6.0),  # exactly 10 minutes after -> SAME session
        (2, _ts(20, 1), 7.0),  # 10:01 after -> NEW session
    ]


def test_sessionize_matches_python_twin(spark, events_rows):
    df = spark.createDataFrame(events_rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_sum)
        for r in sessionize(df, gap="10 minutes").collect()
    }
    assert got == _python_sessions(events_rows, 600)
    # boundary rows: exactly-gap merged, gap+1s broke -> two sessions
    assert sum(1 for (u, _, _) in got if u == 2) == 2
    assert (2, _ts(0), _ts(20)) in got  # 0 and 10:00 in ONE session


def test_session_stats(spark, events_rows):
    df = spark.createDataFrame(events_rows, "user_id long, ts timestamp, value double")
    s = sessionize(df, gap="10 minutes")
    st = {r.user_id: (r.n_sessions, r.avg_events) for r in session_stats(s).collect()}
    assert st[1] == (2, 2.0)  # sessions of 3 and 1 events
    assert st[2] == (2, 1.5)


def test_sessionize_streaming_watermark_closes_sessions(spark, tmp_path):
    """Two AvailableNow phases over a file source: phase-1 events form an
    open session that only emits once phase-2 advances the watermark
    past its end; a too-late phase-2 row is dropped, not resurrected."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "incoming"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def write(path, rows):
        pq.write_table(
            pa.table(
                {
                    "user_id": [r[0] for r in rows],
                    "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                    "value": [float(r[2]) for r in rows],
                }
            ),
            path,
        )

    def run_phase():
        q = (
            sessionize(
                spark.readStream.schema(schema).parquet(str(src)),
                gap="10 minutes",
                watermark="5 minutes",
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write(src / "b0.parquet", [(1, _ts(0), 1.0), (1, _ts(4), 2.0)])
    run_phase()
    got0 = spark.read.parquet(str(out)).collect()
    assert got0 == []  # watermark (max_ts - 5m) hasn't passed session end

    # phase 2: an event far ahead advances the watermark past the
    # session's end (4m + 10m gap = 14m < 60m - 5m); also a too-late
    # straggler at t=1m that must be dropped (watermark from phase 1 is
    # at most 4m - 5m < 0 … so make it late vs phase-2's final mark)
    write(src / "b1.parquet", [(1, _ts(60), 9.0)])
    run_phase()
    rows = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_sum)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows == {
        (1, _ts(0), _ts(14)): (2, 3.0)  # closed phase-1 session emitted
    }

    # phase 3: a row at t=1m is now behind the watermark (55m) -> dropped
    write(src / "b2.parquet", [(1, _ts(1), 99.0), (1, _ts(120), 1.0)])
    run_phase()
    rows = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.read.parquet(str(out)).collect()
    }
    # the dropped straggler neither creates a session nor reopens one
    assert rows == {(1, _ts(0)): 2, (1, _ts(60)): 1}
