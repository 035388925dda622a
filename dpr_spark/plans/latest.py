"""Latest-version-wins dedup for re-crawled pages (web-crawl upsert).

A Common-Crawl-style table (BASELINE.json:input_hint — url, warc_ts,
html, text, lang) re-fetches the same url across crawls: several rows
share a url and differ only in warc_ts. The engine's contract everywhere
downstream (dense-rank id assignment, the xxhash64 collision gate, one
posting run per doc) is ONE row per url, so the build, the streaming
delta, and compaction all need an explicit "newest crawl wins" operator.

Spark-first shape: ``groupBy(key).agg(max_by(payload, version))`` — an
aggregation with map-side partial combine, so re-crawl-heavy inputs
collapse BEFORE the shuffle: each input partition contributes at most one
candidate row per key, and only winners ride the exchange. (Catalyst
plans the struct-buffered max_by as a SortAggregate pair — a per-
partition sort by the grouping key, cheap and spillable.) The window
alternative (``row_number() over (partition by key order by version
desc) = 1``) shuffles EVERY version of every key and only then sorts and
filters; at 100 TB with monthly re-crawls that is an order of magnitude
more shuffled bytes for the same answer.

Reference parity: DPR's corpus loaders keep the LAST inserted row per id
(plain dict insert, `/root/reference/dpr/data/retriever_data.py:253-287`)
— "last write wins" by file order. Here the same semantics are explicit
and deterministic: the version tuple, not input order, picks the winner.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Cols = Union[str, Sequence[str]]


def _as_list(cols: Cols) -> list:
    return [cols] if isinstance(cols, str) else list(cols)


def latest_by_key(df: DataFrame, keys: Cols, version_cols: Cols) -> DataFrame:
    """Keep, per key, the single row with the greatest version tuple.

    ``version_cols`` compare lexicographically (struct ordering), so pass
    a tiebreak column (e.g. a content digest or event id) after the
    timestamp if two versions of a key can share a timestamp — with a
    fully tied version tuple ``max_by`` picks an arbitrary row of the tie,
    which is only acceptable when tied rows are identical (the re-crawl
    case: same url fetched twice in one crawl yields the same record).

    Null semantics (explicit, not engine-dependent): each version column
    is compared through an (is-not-null, value) pair, so a NULL version
    always loses to any non-null one, and a key whose versions are ALL
    null falls back to the arbitrary-tie rule above — the row itself is
    kept (never a null payload). Without the flag this rides on how the
    engine orders null struct fields inside max_by, which is exactly the
    kind of undocumented behavior a version upgrade breaks.

    Column order of the result matches the input. One shuffle, map-side
    combined.
    """
    keys = _as_list(keys)
    version_cols = _as_list(version_cols)
    missing = [c for c in keys + version_cols if c not in df.columns]
    if missing:
        raise ValueError(f"latest_by_key: missing columns {missing} in {df.columns}")
    payload = [c for c in df.columns if c not in keys]
    ver = F.struct(
        *[
            x
            for c in version_cols
            for x in (
                F.col(c).isNotNull().alias(f"_{c}_nn"),
                F.col(c).alias(c),
            )
        ]
    )
    row = F.max_by(F.struct(*[F.col(c) for c in payload]), ver).alias("_latest")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(row)
    return out.select(
        *[F.col(c) if c in keys else F.col(f"_latest.{c}") for c in df.columns]
    )
