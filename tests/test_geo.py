"""Geo search (query/geo.py): haversine vs a python twin, bounding-box
completeness, tile transform, and scan pushdown of the box."""

import math

import pyspark.sql.functions as F

from dpr_spark.query.geo import (
    EARTH_RADIUS_KM,
    geo_distance_search,
    geotile_cols,
    geotile_grid_agg,
)


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_geo_distance_matches_python_twin(spark):
    pts = [(i, -50 + i * 7.3, -100 + i * 13.7) for i in range(20)]
    geo = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    q = [(0, 10.0, 20.0, 5000.0)]
    got = [(r.doc_id, r.dist) for r in
           geo_distance_search(spark, q, geo, k=100).orderBy("rank").collect()]
    exp = sorted(
        ((d, round(_hav(10.0, 20.0, la, lo), 6)) for d, la, lo in pts
         if round(_hav(10.0, 20.0, la, lo), 6) <= 5000.0),
        key=lambda t: (t[1], t[0]),
    )
    assert got == exp
    assert len(got) > 2


def test_geo_box_never_clips_the_circle(spark):
    # a ring of points at exactly 0.99r in every direction must all
    # survive the box prefilter (the box is derived from r at the
    # widest latitude, so it contains the circle)
    qlat, qlon, r = 48.0, 11.0, 800.0
    pts = []
    for i in range(36):
        brg = math.radians(i * 10.0)
        d = 0.99 * r / EARTH_RADIUS_KM
        p1 = math.radians(qlat)
        lat2 = math.asin(
            math.sin(p1) * math.cos(d) + math.cos(p1) * math.sin(d) * math.cos(brg)
        )
        lon2 = math.radians(qlon) + math.atan2(
            math.sin(brg) * math.sin(d) * math.cos(p1),
            math.cos(d) - math.sin(p1) * math.sin(lat2),
        )
        pts.append((i, math.degrees(lat2), math.degrees(lon2)))
    geo = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    got = geo_distance_search(spark, [(0, qlat, qlon, r)], geo, k=100)
    assert got.count() == 36


def test_geotile_transform_known_values(spark):
    # zoom 1: four quadrants; (0,0) sits in tile (1,1)'s corner —
    # slippy-map convention puts lat 0 at y boundary 1, lon 0 at x 1
    df = spark.createDataFrame(
        [(1, 40.0, -74.0), (2, -33.9, 151.2), (3, 0.0, 0.0)],
        "doc_id long, lat double, lon double",
    )
    x, y = geotile_cols(F.col("lat"), F.col("lon"), 1)
    got = {r.doc_id: (r.x, r.y) for r in df.select("doc_id", x.alias("x"), y.alias("y")).collect()}
    assert got[1] == (0, 0)   # NW quadrant (New York)
    assert got[2] == (1, 1)   # SE quadrant (Sydney)
    assert got[3] == (1, 1)   # boundary point goes to the SE tile


def test_geotile_grid_agg_counts(spark):
    rows = [(0, i, 40.0 + (i % 3) * 0.01, -74.0) for i in range(7)] + [
        (0, 100, -33.9, 151.2)
    ]
    pts = spark.createDataFrame(rows, "qid long, doc_id long, lat double, lon double")
    got = [(r.tile_x, r.tile_y, r["count"]) for r in
           geotile_grid_agg(pts, zoom=5, size=5).orderBy("rank").collect()]
    assert got[0][2] == 7 and got[1][2] == 1


def test_geo_box_pushes_to_stored_scan(spark, tmp_path):
    pts = [(i, -50 + i * 7.3, -100 + i * 13.7) for i in range(20)]
    spark.createDataFrame(pts, "doc_id long, lat double, lon double").write.parquet(
        str(tmp_path / "geo")
    )
    stored = spark.read.parquet(str(tmp_path / "geo"))
    df = geo_distance_search(spark, [(0, 10.0, 20.0, 5000.0)], stored, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the box reaches the parquet scan as range predicates on lat/lon
    assert "PushedFilters:" in plan and "GreaterThanOrEqual(lat" in plan
