"""Watermarked streaming analytics over the crawl: windowed per-source
crawl-rate aggregation (the Structured Streaming watermark + windowed
agg surface) and a custom stateful content-change detector
(`applyInPandasWithState`) that emits a row whenever a re-crawled url's
content digest changes — the CDC feed an incremental indexer consumes.

Semantics:

- `crawl_rate_stream`: event-time windows over `warc_ts` with a
  watermark; APPEND output mode, so a window only emits once the
  watermark passes its end — late pages inside the allowed lateness
  still count, pages later than the watermark are dropped (asserted in
  tests/test_streaming_crawlstats.py with crafted per-batch event
  times).
- `content_change_stream`: state per url holds the last seen
  (digest, warc_ts); a batch's newest version per url compares against
  state and emits (url, warc_ts, prev_digest, digest, change) rows for
  first-sight and changed-content crawls; unchanged re-crawls emit
  nothing but still advance state. State times out
  `state_ttl_minutes` past the watermark (GC for urls never crawled
  again — state stays bounded by the active-url set, not crawl
  history).

Scale shape: both operators shuffle once on their grouping key; state
rows are (url → 16-byte digest + ts), never text. The windowed agg is
the engine's native incremental aggregation (partial aggregates merged
by the state store); the CDC operator's per-group work is O(batch rows
for that url).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def crawl_rate_stream(
    pages: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    group_col: str = "source",
) -> DataFrame:
    """(window_start, window_end, <group_col>, n_pages, total_chars):
    event-time windowed crawl rate with late-data handling; append-mode
    ready (emit once finalized)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col(group_col))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_pages",
            "total_chars",
        )
    )


CHANGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("prev_digest", StringType()),
        StructField("digest", StringType()),
        StructField("change", StringType()),  # 'new' | 'updated'
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("digest", StringType()), StructField("ts", LongType())]
)


def _digest(text: str) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def _make_change_fn(state_ttl_minutes: int):
    ttl_ms = int(state_ttl_minutes) * 60_000

    def _change_fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        url = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values("warc_ts")
        prev_digest, _prev_ts = state.get if state.exists else (None, None)
        out = []
        for _, r in rows.iterrows():
            d = _digest(r["text"])
            if prev_digest is None:
                out.append((url, r["warc_ts"], None, d, "new"))
                prev_digest = d
            elif d != prev_digest:
                out.append((url, r["warc_ts"], prev_digest, d, "updated"))
                prev_digest = d
        last_ts_ms = int(pd.Timestamp(rows["warc_ts"].iloc[-1]).value // 1_000_000)
        state.update((prev_digest, last_ts_ms))
        # GC `ttl` past the url's LAST CRAWL (not past the current
        # watermark, which is still 0 in the first batch and would
        # expire everything as soon as it advances)
        state.setTimeoutTimestamp(
            max(last_ts_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in CHANGE_SCHEMA.fields]
            )

    return _change_fn


def content_change_stream(
    pages: DataFrame,
    watermark: str = "2 minutes",
    state_ttl_minutes: int = 1,
) -> DataFrame:
    """CDC over the crawl: one row per url whose content digest changed
    (or was first seen) — applyInPandasWithState with event-time
    timeout, keyed by url. State for a url is GC'd once the watermark
    passes its last crawl by `state_ttl_minutes`."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy("url")
        .applyInPandasWithState(
            _make_change_fn(state_ttl_minutes),
            outputStructType=CHANGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
