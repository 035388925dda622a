"""EQL sequence detection (extras/eql.py): greedy earliest-after
chaining, every step-1 anchor, maxspan cutoff, incomplete chains
dropped, duplicate-(key, ts) step events never fan out."""

import datetime

import pytest

T0 = datetime.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + datetime.timedelta(seconds=s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_sequence_greedy_chain_and_maxspan(spark):
    from dpr_spark.extras.eql import sequence_match

    ev = _ev(
        spark,
        [
            # user 1: A@0 -> earliest B after is @10 (not @20) -> C@30
            (1, 0, "A"), (1, 10, "B"), (1, 20, "B"), (1, 30, "C"),
            # second anchor A@15 -> B@20 -> C@30
            (1, 15, "A"),
            # user 2: chain completes but span 100 > 50 -> dropped
            (2, 0, "A"), (2, 40, "B"), (2, 100, "C"),
            # user 3: no C after B -> incomplete -> dropped
            (3, 0, "A"), (3, 5, "B"), (3, 3, "C"),
        ],
    )
    got = sorted(
        (r.user_id, (r.t1 - T0).total_seconds(), (r.t2 - T0).total_seconds(),
         (r.t3 - T0).total_seconds())
        for r in sequence_match(
            ev, ["A", "B", "C"], maxspan_seconds=50
        ).collect()
    )
    assert got == [(1, 0.0, 10.0, 30.0), (1, 15.0, 20.0, 30.0)]


def test_sequence_strictly_after_and_two_steps(spark):
    from dpr_spark.extras.eql import sequence_match

    # B at the SAME ts as A must not bind (strictly after)
    ev = _ev(spark, [(1, 0, "A"), (1, 0, "B"), (1, 7, "B")])
    got = [
        ((r.t1 - T0).total_seconds(), (r.t2 - T0).total_seconds())
        for r in sequence_match(ev, ["A", "B"]).collect()
    ]
    assert got == [(0.0, 7.0)]


def test_sequence_duplicate_step_ts_no_fanout(spark):
    from dpr_spark.extras.eql import sequence_match

    # two B events at the identical ts: the exact-ts chain join must
    # still emit ONE row per anchor
    ev = _ev(
        spark,
        [(1, 0, "A"), (1, 5, "B"), (1, 5, "B"), (1, 9, "C")],
    )
    rows = sequence_match(ev, ["A", "B", "C"]).collect()
    assert len(rows) == 1
    assert (rows[0].t3 - T0).total_seconds() == 9.0
