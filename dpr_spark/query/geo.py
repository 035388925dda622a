"""Geo queries over per-doc (lat, lon) doc-values: `geo_distance`
search (ES geo_distance query + sort-by-_geo_distance) and the
`geotile_grid` aggregation (slippy-map tile buckets).

Scale shape: the distance search NEVER computes haversine over the
corpus — a per-query bounding box (a pure range predicate on lat/lon,
pushed into the parquet scan when the geo table is at rest, and a
partition-pruning key when it is lat-bucketed) prefilters candidates;
the exact haversine runs on the survivors only. This is exactly
Lucene's two-phase geo: BKD-tree box visit, then exact distance
verify. The tile aggregation is integer math after one projective
transform — a groupBy on (tile_x, tile_y) with map-side combine.

Float discipline: distances are doubles (JVM and DuckDB trig can
differ in the last ulp), so rankings order by round(dist, 6) like
every float ranking in the suite. Tile indices are floor() of the
transform — exact for any input not within ~1e-15 of a tile boundary.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark import DEFAULT_TOP_K

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = math.pi * EARTH_RADIUS_KM / 180.0  # ~111.195


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km, pure Catalyst column math."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlam) * F.sin(dlam)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, float, float, float]],
    doc_geo: DataFrame,
    k: int = DEFAULT_TOP_K,
    dist_round: int = 6,
) -> DataFrame:
    """queries: (qid, lat, lon, radius_km) -> (qid, rank, doc_id, dist)
    for docs within radius, nearest first (ties by doc_id).

    The broadcast query row carries its own bounding box; the join
    condition is the BOX (range predicates the optimizer can use), and
    haversine runs only on box survivors."""
    rows = []
    for qid, lat, lon, radius in queries:
        dlat = radius / KM_PER_DEG_LAT
        # shrink-proof longitude width at the box's widest latitude
        wide = min(90.0, max(abs(lat) + dlat, 0.0))
        coslat = math.cos(math.radians(wide))
        dlon = 180.0 if coslat <= 1e-9 else min(180.0, radius / (KM_PER_DEG_LAT * coslat))
        rows.append(
            (qid, float(lat), float(lon), float(radius),
             lat - dlat, lat + dlat, lon - dlon, lon + dlon)
        )
    qdf = spark.createDataFrame(
        rows,
        "qid long, qlat double, qlon double, radius double, "
        "lat_lo double, lat_hi double, lon_lo double, lon_hi double",
    )
    # per-query boxes are join-side values and cannot push into the
    # scan; the wave's literal ENVELOPE (union of boxes) can — at rest
    # that is row-group skipping on a lat/lon-sorted geo table
    doc_geo = doc_geo.filter(
        (F.col("lat") >= F.lit(min(r[4] for r in rows)))
        & (F.col("lat") <= F.lit(max(r[5] for r in rows)))
        & (F.col("lon") >= F.lit(min(r[6] for r in rows)))
        & (F.col("lon") <= F.lit(max(r[7] for r in rows)))
    )
    boxed = doc_geo.join(
        F.broadcast(qdf),
        (F.col("lat") >= F.col("lat_lo"))
        & (F.col("lat") <= F.col("lat_hi"))
        & (F.col("lon") >= F.col("lon_lo"))
        & (F.col("lon") <= F.col("lon_hi")),
    )
    dist = haversine_km(F.col("qlat"), F.col("qlon"), F.col("lat"), F.col("lon"))
    hits = boxed.withColumn("dist", F.round(dist, dist_round)).filter(
        F.col("dist") <= F.col("radius")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "dist")
    )


def geotile_cols(lat, lon, zoom: int):
    """(tile_x, tile_y) at `zoom` — the OSM slippy-map transform ES's
    geotile_grid uses. Pure column math; y clamps at the mercator cut
    like ES (abs(lat) <= 85.05112878 assumed by callers)."""
    n = float(1 << zoom)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long")
    latr = F.radians(lat)
    y = F.floor(
        (F.lit(1.0) - F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(n)
    ).cast("long")
    return x, y


def geotile_grid_agg(
    points: DataFrame,
    zoom: int = 5,
    size: int = 5,
    partition_col: str = "qid",
) -> DataFrame:
    """points(qid, doc_id, lat, lon) -> top `size` tiles per query by
    doc count (ties by tile coords) — ES geotile_grid. One groupBy with
    map-side combine; the window runs over tile-count rows, never
    docs."""
    x, y = geotile_cols(F.col("lat"), F.col("lon"), zoom)
    counts = (
        points.withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .groupBy(partition_col, "tile_x", "tile_y")
        .agg(F.count("*").alias("count"))
    )
    w = Window.partitionBy(partition_col).orderBy(
        F.desc("count"), F.asc("tile_x"), F.asc("tile_y")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select(partition_col, "rank", "tile_x", "tile_y", "count")
    )

def geo_bounding_box_search(
    spark: SparkSession,
    queries: Sequence[Tuple[int, float, float, float, float]],
    doc_geo: DataFrame,
    k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """ES geo_bounding_box filter: queries = (qid, top, left, bottom,
    right) -> (qid, rank, doc_id, lat, lon) for docs inside the box,
    doc_id ascending (a filter has no score — the ES constant-score
    contract; rank is the deterministic tiebreak order).

    Scale shape: boxes broadcast; the join condition is pure range
    predicates on lat/lon — pushable into the scan at rest, exactly the
    BKD box visit with no verify phase needed."""
    qdf = F.broadcast(
        spark.createDataFrame(
            list(queries), "qid long, top double, left double, bottom double, right double"
        )
    )
    hit = doc_geo.join(
        qdf,
        (F.col("lat") <= F.col("top"))
        & (F.col("lat") >= F.col("bottom"))
        & (F.col("lon") >= F.col("left"))
        & (F.col("lon") <= F.col("right")),
    )
    w = Window.partitionBy("qid").orderBy(F.asc("doc_id"))
    return (
        hit.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "lat", "lon")
    )


def geo_bounds_centroid_agg(
    matches: DataFrame, doc_geo: DataFrame
) -> DataFrame:
    """ES geo_bounds + geo_centroid over a (qid, doc_id) match set:
    (qid, n, top, bottom, left, right, c_lat, c_lon) — the bounding
    box of matched points and their arithmetic centroid (valid away
    from the antimeridian, which the doc-geo contract guarantees)."""
    m = matches.join(doc_geo, "doc_id")
    return m.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.max("lat").alias("top"),
        F.min("lat").alias("bottom"),
        F.min("lon").alias("left"),
        F.max("lon").alias("right"),
        F.avg("lat").alias("c_lat"),
        F.avg("lon").alias("c_lon"),
    )



GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cols(lat, lon, precision: int):
    """(cell, geohash) at `precision` chars — the classic geohash cell:
    5·precision bits interleaved lon-first over the equirectangular
    split of (lon+180)/360 and (lat+90)/180, then base-32 encoded
    (Niemeyer alphabet — ES geohash_grid's bucket keys).

    All math is exact integer arithmetic on cell indices < 2^25
    (precision <= 5 covers the ES default grid sizes), carried in
    doubles only through floor() — bit-identical across engines, the
    same float discipline as geotile_cols. The integer `cell` is
    returned alongside the string so grouping can shuffle an 8-byte
    key and render the string once per bucket."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    x = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits)))
        .cast("long"),
        F.lit((1 << lon_bits) - 1),
    )
    y = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits)))
        .cast("long"),
        F.lit((1 << lat_bits) - 1),
    )
    cell = None
    for i in range(nbits):  # bit i from the MSB; even bits are longitude
        if i % 2 == 0:
            src, sb = x, lon_bits - 1 - i // 2
        else:
            src, sb = y, lat_bits - 1 - (i - 1) // 2
        bit = F.pmod(
            F.floor(src.cast("double") / F.lit(float(1 << sb))).cast("long"),
            F.lit(2),
        )
        term = bit * F.lit(1 << (nbits - 1 - i))
        cell = term if cell is None else cell + term
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_B32])
    chars = []
    for i in range(precision):
        digit = F.pmod(
            F.floor(
                cell.cast("double") / F.lit(float(1 << (5 * (precision - 1 - i))))
            ).cast("long"),
            F.lit(32),
        )
        chars.append(F.element_at(alphabet, (digit + F.lit(1)).cast("int")))
    return cell, F.concat(*chars)


def geohash_grid_agg(
    points: DataFrame,
    precision: int = 4,
    size: int = 5,
    partition_col: str = "qid",
) -> DataFrame:
    """points(qid, doc_id, lat, lon) -> top `size` geohash cells per
    query by doc count (ties by hash asc) — ES geohash_grid. Same
    shape as geotile_grid_agg: one map-side-combined groupBy on the
    8-byte integer cell; the base-32 string renders per BUCKET (first
    value in the group — a function of the cell), never per doc."""
    cell, ghash = geohash_cols(F.col("lat"), F.col("lon"), precision)
    counts = (
        points.withColumn("_cell", cell)
        .withColumn("_gh", ghash)
        .groupBy(partition_col, "_cell")
        .agg(F.count("*").alias("count"), F.first("_gh").alias("geohash"))
    )
    w = Window.partitionBy(partition_col).orderBy(F.desc("count"), F.asc("geohash"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select(partition_col, "rank", "geohash", "count")
    )


def geo_distance_rings_agg(
    points: DataFrame,
    origin_lat: float,
    origin_lon: float,
    edges: "Sequence[float]",
    partition_col: str = "qid",
) -> DataFrame:
    """ES `geo_distance` AGGREGATION: distance rings around one origin.
    points(qid, doc_id, lat, lon) -> one row per (qid, ring) with the
    ring's [from_km, to_km) bounds (NULL to = unbounded last ring) and
    the doc count — ES's half-open ring contract, every ring reported
    even when empty.

    Scale shape: ONE pass — haversine to the (literal) origin is pure
    Catalyst column math, the ring index is a CASE fold over the edge
    literals, and the count is a map-side-combined groupBy over
    (qid, ring); rings × queries rows reach the driver, never docs.
    Distances round to 6 dp before the edge test (the cross-engine
    trig discipline of geo_distance_search)."""
    es = [float(e) for e in edges]
    if es != sorted(es) or len(set(es)) != len(es) or not es:
        raise ValueError("edges must be strictly increasing and non-empty")
    dist = F.round(
        haversine_km(
            F.lit(origin_lat), F.lit(origin_lon), F.col("lat"), F.col("lon")
        ),
        6,
    )
    ring = F.lit(len(es))
    for i in range(len(es) - 1, -1, -1):
        ring = F.when(dist < F.lit(es[i]), F.lit(i)).otherwise(ring)
    counts = (
        points.withColumn("ring", ring)
        .groupBy(partition_col, "ring")
        .agg(F.count("*").alias("count"))
    )
    # dense ring spine per qid so empty rings report count 0 (ES shape)
    qids = points.select(partition_col).distinct()
    bounds = [(i,
               0.0 if i == 0 else es[i - 1],
               es[i] if i < len(es) else None)
              for i in range(len(es) + 1)]
    spine = qids.crossJoin(
        points.sparkSession.createDataFrame(
            bounds, "ring int, from_km double, to_km double"
        )
    )
    return (
        spine.join(counts, [partition_col, "ring"], "left")
        .select(
            partition_col, "ring", "from_km", "to_km",
            F.coalesce("count", F.lit(0)).alias("count"),
        )
    )


def geo_line_agg(
    points: DataFrame,
    partition_col: str,
    sort_cols: Sequence[str],
    lat_col: str = "lat",
    lon_col: str = "lon",
    size: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """ES `geo_line` aggregation: per group, the first `size` points in
    `sort_cols` order joined into a LINESTRING-style "lon lat, lon lat"
    string, plus `n_points` (points kept) and `complete` (ES's flag:
    false when the group had more points than `size` kept).

    `sort_cols` must be a deterministic total order within each group
    (pass a tiebreaker column; ES sorts on a doc value where ties are
    shard-order-dependent — this engine refuses that nondeterminism).

    Scale shape: one window rank partitioned by the group key prunes to
    <= size rows per group BEFORE any list materializes, then one
    groupBy assembles the capped struct array — per-group state is
    bounded by `size`, never by group row count."""
    w = Window.partitionBy(partition_col).orderBy(
        *[F.col(c).asc() for c in sort_cols]
    )
    fmt = f"%.{round_to}f"
    pt = F.concat_ws(
        " ",
        F.format_string(fmt, F.col(lon_col).cast("double")),
        F.format_string(fmt, F.col(lat_col).cast("double")),
    )
    ranked = points.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_pt", pt
    )
    return (
        ranked.groupBy(partition_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rk") <= size,
                                F.struct("_rk", "_pt"),
                            )
                        )
                    ),
                    lambda s: s["_pt"],
                ),
                ", ",
            ).alias("line"),
            F.least(F.count("*"), F.lit(size).cast("long")).alias("n_points"),
            (F.count("*") <= size).alias("complete"),
        )
    )
