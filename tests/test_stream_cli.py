"""stream.py spark-submit surface: each mode drains a directory of page
files with --once and leaves a checkpointed, re-runnable output."""

import datetime
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = datetime.datetime(2024, 1, 1)


def _write(path, rows):
    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array(
                    [T0 + datetime.timedelta(minutes=r[1]) for r in rows],
                    type=pa.timestamp("us"),
                ),
                "text": [r[2] for r in rows],
            }
        ),
        path,
    )


def _run(mode, src, out, extra=()):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "stream.py"),
         "--mode", mode, "--src", str(src), "--out", str(out), "--once",
         *extra],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_stream_cli_dedup_and_trending(tmp_path, spark):
    src = tmp_path / "in"
    src.mkdir()
    _write(str(src / "b1.parquet"),
           [("u1", 0, "alpha beta alpha"), ("u2", 1, "alpha beta alpha"),
            ("u3", 2, "gamma delta words here")])

    out_d = tmp_path / "dedup"
    _run("dedup", src, out_d)
    docs = spark.read.parquet(str(out_d / "docs"))
    kept = sorted(r.url for r in docs.collect())
    assert kept == ["u1", "u3"]  # u2 is a byte-identical copy

    # trending: watermark holds minute-0/1/2 windows open after one
    # batch — a second drained batch at minute-10 finalizes them
    out_t = tmp_path / "trend"
    _run("trending", src, out_t)
    _write(str(src / "b2.parquet"), [("u4", 10, "closer page")])
    _run("trending", src, out_t)
    sink = spark.read.parquet(str(out_t / "data"))
    terms = {}
    for r in sink.collect():  # one row per (window, term): sum windows
        terms[r.term] = terms.get(r.term, 0) + r.n_occ
    assert terms.get("alpha") == 4 and terms.get("gamma") == 1
