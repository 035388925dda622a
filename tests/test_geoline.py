"""geo_line agg (query/geo.py) vs a plain-Python twin."""

from dpr_spark.query.geo import geo_line_agg


def test_geo_line_matches_brute(spark):
    rows = [
        # (user, ts_ord, lat, lon)
        (1, 3, 10.0, 20.0),
        (1, 1, 11.5, 21.25),
        (1, 2, 12.0, 22.0),
        (2, 1, 30.0, 40.0),
    ]
    df = spark.createDataFrame(rows, "u int, t int, lat double, lon double")
    out = {
        r.u: (r.line, r.n_points, r.complete)
        for r in geo_line_agg(df, "u", ["t"], size=2).collect()
    }
    assert out[1] == ("21.250000 11.500000, 22.000000 12.000000", 2, False)
    assert out[2] == ("40.000000 30.000000", 1, True)


def test_geo_line_partitioning_invariant(spark):
    rows = [(1, i, float(i), float(2 * i)) for i in range(30)]
    df = spark.createDataFrame(rows, "u int, t int, lat double, lon double")
    a = geo_line_agg(df, "u", ["t"], size=7).collect()
    b = geo_line_agg(df.repartition(11, "t"), "u", ["t"], size=7).collect()
    assert a == b
    assert a[0].n_points == 7 and not a[0].complete
