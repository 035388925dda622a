"""Sessionization — gap-based event sessions (web-analytics sessions,
crawl-burst grouping) via Spark's NATIVE `session_window`, the engine
primitive purpose-built for this: merging windows [t, t+gap) per key,
incrementally maintained by the streaming state store, no UDF and no
gaps-and-islands window-function emulation.

Semantics (Spark session_window contract, asserted empirically in
tests/test_sessions.py against a python twin): an event at time t
extends the current session iff t - previous_t <= gap (INCLUSIVE —
an event landing exactly gap after the previous one still merges,
because its window [t, t+gap) is adjacent to the session's end);
session_start = first event ts, session_end = last event ts + gap.

Scale shape: ONE shuffle on the session key; in batch mode the merge
is a per-key sort inside the aggregation (no self-join, no window-
function pass over the raw stream); in streaming mode state is one
(key, open-session) row per active key, GC'd by the watermark. The
same call works on a batch OR a streaming DataFrame — pass
`watermark=` for append-mode streams so closed sessions emit exactly
once and state is bounded.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: Optional[str] = "value",
    watermark: Optional[str] = None,
) -> DataFrame:
    """(key, session_start, session_end, n_events, value_sum): one row
    per (key, session). `watermark` (e.g. "1 hour") is required for
    append-mode streaming — a session emits once the watermark passes
    its end (last event + gap); late rows inside the lateness bound
    still merge, later ones drop (the standard watermark contract)."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("value_sum"))
    out = events.groupBy(
        F.col(key_col), F.session_window(F.col(ts_col), gap).alias("sw")
    ).agg(*aggs)
    return out.select(
        key_col,
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
        *(["value_sum"] if value_col is not None else []),
    )


def session_stats(sessions: DataFrame, key_col: str = "user_id") -> DataFrame:
    """(key, n_sessions, avg_session_sec, avg_events): per-key rollup of
    a `sessionize` result — the report row of a crawl/session monitor.
    Durations use (end - start) which INCLUDES the trailing gap (the
    session_window end is last-event + gap); single-event sessions
    therefore have duration == gap, not 0 — stated so downstream
    dashboards don't "fix" it twice."""
    dur = F.col("session_end").cast("double") - F.col("session_start").cast("double")
    return sessions.groupBy(key_col).agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg(dur), 3).alias("avg_session_sec"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
    )
