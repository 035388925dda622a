"""Rollup / downsampling (extras/rollup.py): a day rollup serves
week/month queries EXACTLY (sum of sums == raw aggregation, avg derived
sum/count), alignment is enforced, and the rollup table is
bucket-count-sized."""

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    t0 = datetime.datetime(2025, 3, 1)
    for i in range(500):
        rows.append(
            (
                i,
                t0 + datetime.timedelta(hours=(i * 7) % (24 * 40)),
                ["click", "view", "buy"][i % 3],
                float((i * 37) % 100) / 4.0,
            )
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_rollup_week_from_day_exact(spark, events):
    from dpr_spark.extras.rollup import build_rollup, rollup_histogram

    day = build_rollup(events, unit="day", group_cols=["event_type"])
    # the rollup is bucket-sized: 40 days x 3 types >= rows, << 500 events
    assert day.count() <= 40 * 3
    got = {
        (r.bucket, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in rollup_histogram(
            day, "day", "week", group_cols=["event_type"]
        ).collect()
    }
    raw = {
        (r.bucket, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v, r.avg_v)
        for r in events.groupBy(
            F.date_trunc("week", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            (F.sum("value") / F.count("*")).alias("avg_v"),
        )
        .collect()
    }
    assert set(got) == set(raw)
    for k in raw:
        gn, gs, gmn, gmx, gav = got[k]
        rn, rs, rmn, rmx, rav = raw[k]
        assert gn == rn and gmn == rmn and gmx == rmx
        assert gs == pytest.approx(rs, abs=1e-9)
        assert gav == pytest.approx(rav, abs=1e-12)


def test_rollup_alignment_enforced(spark, events):
    from dpr_spark.extras.rollup import build_rollup, can_serve, rollup_histogram

    day = build_rollup(events, unit="day")
    assert can_serve("day", "month") and not can_serve("day", "hour")
    assert not can_serve("month", "week")  # weeks cross month boundaries
    with pytest.raises(ValueError):
        rollup_histogram(day, "day", "hour")
