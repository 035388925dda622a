"""cumulative_cardinality + change_point (query/aggs.py) vs brute force."""

import pytest

from dpr_spark.query.aggs import change_point, cumulative_cardinality


def test_cumulative_cardinality(spark):
    rows = [
        # (partition, bucket, value)
        ("a", 1, "u1"), ("a", 1, "u2"), ("a", 2, "u1"),  # bucket 2: no new
        ("a", 3, "u3"), ("a", 3, "u1"),
        ("b", 1, "u1"),
        ("b", 5, "u9"), ("b", 5, "u9"),
    ]
    df = spark.createDataFrame(rows, "qid string, bucket int, value string")
    got = {
        (r.qid, r.bucket): (r.new_values, r.cumulative_distinct)
        for r in cumulative_cardinality(df).collect()
    }
    assert got == {
        ("a", 1): (2, 2),
        ("a", 2): (0, 2),
        ("a", 3): (1, 3),
        ("b", 1): (1, 1),
        ("b", 5): (1, 2),
    }


def brute_change_point(series):
    """series: ordered [(bucket, x)] -> (change_at, before, after, red)."""
    xs = [x for _b, x in series]
    n = len(xs)

    def sse(seg):
        mu = sum(seg) / len(seg)
        return sum((v - mu) ** 2 for v in seg)

    best = None
    for k in range(1, n):
        cost = sse(xs[:k]) + sse(xs[k:])
        key = (round(cost, 6), series[k][0])
        if best is None or key < best[0]:
            mu1 = sum(xs[:k]) / k
            mu2 = sum(xs[k:]) / (n - k)
            total = sse(xs)
            red = round(1.0 - cost / total, 6) if total > 0 else 0.0
            best = (key, (series[k][0], round(mu1, 6), round(mu2, 6), red))
    return best[1]


CASES = [
    # clean step
    [(i, 1.0) for i in range(5)] + [(i, 10.0) for i in range(5, 10)],
    # ramp (best split still well-defined)
    [(i, float(i)) for i in range(8)],
    # constant series -> reduction 0, earliest split wins
    [(i, 3.0) for i in range(6)],
    # two points
    [(0, 1.0), (1, 100.0)],
]


@pytest.mark.parametrize("series", CASES)
def test_change_point_matches_brute(spark, series):
    df = spark.createDataFrame(
        [("q", b, x) for b, x in series], "qid string, bucket int, x double"
    )
    r = change_point(df, "qid", "bucket", "x").collect()
    assert len(r) == 1
    got = (r[0].change_at, r[0].before_mean, r[0].after_mean, r[0].reduction)
    assert got == brute_change_point(series)


def test_change_point_partitioning_invariant(spark):
    series = [(i, 1.0 if i < 7 else 5.0) for i in range(20)]
    df = spark.createDataFrame(
        [("q", b, x) for b, x in series], "qid string, bucket int, x double"
    )
    a = change_point(df, "qid", "bucket", "x").collect()
    b = change_point(
        df.repartition(7, "bucket"), "qid", "bucket", "x"
    ).collect()
    assert a == b
    assert a[0].change_at == 7
