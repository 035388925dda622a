"""variable_width_histogram (query/aggs.py) vs a literal-ntile twin."""

import pytest
from pyspark.sql import functions as F

from dpr_spark.query.aggs import variable_width_histogram


def brute(values, B):
    """Exact-ntile seeding + min-tile-per-value, in plain Python."""
    vs = sorted(values)
    n = len(vs)
    q, r = divmod(n, B)
    tiles = []
    for t in range(1, B + 1):
        size = q + 1 if t <= r else q
        tiles += [t] * size
    first_tile = {}
    for v, t in zip(vs, tiles):
        first_tile.setdefault(v, t)
    byb = {}
    for v in values:
        byb.setdefault(first_tile[v], []).append(v)
    out = []
    for rank, t in enumerate(sorted(byb), 1):
        b = byb[t]
        out.append(
            (rank, min(b), max(b), round(sum(b) / len(b), 6), len(b))
        )
    return out


CASES = [
    ([1, 1, 1, 1, 2, 3, 50, 51, 52, 1000], 3),
    ([5] * 20, 4),                      # one distinct value -> one bucket
    (list(range(100)), 8),              # uniform
    ([1, 2], 10),                       # fewer rows than buckets
    ([0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 9, 9, 9, 9, 9, 100], 5),  # heavy ties
]


@pytest.mark.parametrize("values,B", CASES)
def test_matches_brute_force(spark, values, B):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id long, x long")
    got = [
        (r.bucket, r.vmin, r.vmax, r.centroid, r.doc_count)
        for r in variable_width_histogram(df, "x", buckets=B).orderBy("bucket").collect()
    ]
    assert got == brute(values, B)


def test_partitioning_invariant(spark):
    values = [1, 1, 1, 1, 2, 3, 50, 51, 52, 1000, 7, 7, 7, 800]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id long, x long")
    a = variable_width_histogram(df, "x", 4).orderBy("bucket").collect()
    b = (
        variable_width_histogram(df.repartition(13, "id"), "x", 4)
        .orderBy("bucket")
        .collect()
    )
    assert a == b


def test_invariants(spark):
    values = list(range(50)) + [10] * 30 + [49] * 5
    B = 6
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id long, x long")
    rows = variable_width_histogram(df, "x", B).orderBy("bucket").collect()
    assert len(rows) <= B
    assert sum(r.doc_count for r in rows) == len(values)
    # buckets are disjoint, ordered ranges; equal values never split
    for a, b in zip(rows, rows[1:]):
        assert a.vmax < b.vmin
