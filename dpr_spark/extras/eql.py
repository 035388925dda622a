"""EQL-style sequence detection over an event table — the Elastic EQL
`sequence by <key> with maxspan=<t> [step1] [step2] ... [stepK]`
contract, with the match rule fixed deterministically:

    a match starts at EVERY step-1 event; each later step binds to the
    EARLIEST event of its type strictly after the previous step (the
    greedy minimal chain); the match emits iff the last step's
    timestamp is within `maxspan` of the first's.

(ES EQL's engine is also greedy-earliest per step; we keep every
step-1 anchor rather than ES's head-sequence dedup so the output is a
pure per-anchor function — deterministic, SQL-twinnable, and an
ES-style dedup is one `min_by` per tail away.)

Scale shape: ONE shuffle on the sequence key. Every event row gets
"earliest ts of step s strictly after me" via a single descending-
frame window MIN per step (linear in events, no self-join); chaining
step s to s+1 is a co-partitioned join on (key, exact ts) — the
partitioning from the window pass is reused, so K steps cost K-1
narrow joins and zero extra shuffles. The naive temporal self-join
(events x events per user) never happens.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_match(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    maxspan_seconds: float = None,
) -> DataFrame:
    """(key, t1, ..., tK) — one row per step-1 anchor whose greedy
    chain completes (within maxspan when given). Timestamps strictly
    increase along a row."""
    if len(steps) < 2:
        raise ValueError("a sequence needs >= 2 steps")
    ts = F.col(ts_col)
    # RANGE frame over epoch-micros: "strictly after" means strictly
    # greater TIMESTAMP, not merely a later row — two events sharing a
    # timestamp must not satisfy each other (a ROWS frame would leak on
    # ties, ordered arbitrarily within equal ts)
    tsm = F.expr(
        f"timestampdiff(MICROSECOND, timestamp'2000-01-01 00:00:00', {ts_col})"
    )
    ev = events.select(key, ts_col, type_col).withColumn("_tsm", tsm)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_tsm").asc())
        .rangeBetween(1, Window.unboundedFollowing)
    )
    # one window pass: for every event, the earliest strictly-later ts
    # of each later step's type
    for i, st in enumerate(steps[1:], start=2):
        nxt = F.min(
            F.when(F.col(type_col) == F.lit(st), ts)
        ).over(w)
        ev = ev.withColumn(f"_n{i}", nxt)
    ev = ev.persist()
    # anchors: step-1 events with their chain start
    chain = ev.filter(F.col(type_col) == F.lit(steps[0])).select(
        key, ts.alias("t1"), F.col("_n2").alias("t2")
    )
    # chain step s -> s+1: read step-s's own "next" pointer by joining
    # back on (key, exact ts) — co-partitioned, no new shuffle key
    for i in range(2, len(steps)):
        step_rows = (
            ev.filter(F.col(type_col) == F.lit(steps[i - 1]))
            .select(
                F.col(key).alias("_k"),
                ts.alias("_t"),
                F.col(f"_n{i + 1}").alias("_nx"),
            )
            # duplicate (key, ts) step events collapse to the earliest
            # next pointer, so the exact-ts join can never fan out
            .groupBy("_k", "_t")
            .agg(F.min("_nx").alias(f"t{i + 1}"))
        )
        chain = chain.join(
            step_rows,
            (F.col(key) == F.col("_k")) & (F.col(f"t{i}") == F.col("_t")),
        ).drop("_k", "_t")
    cols: List = [F.col(key)] + [
        F.col(f"t{i}") for i in range(1, len(steps) + 1)
    ]
    out = chain.select(*cols)
    last = f"t{len(steps)}"
    out = out.filter(F.col(last).isNotNull())
    if maxspan_seconds is not None:
        span = F.expr(f"timestampdiff(SECOND, t1, {last})")
        out = out.filter(span <= F.lit(int(maxspan_seconds)))
    return out
