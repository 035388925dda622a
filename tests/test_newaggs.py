"""Session-9 aggregation additions: ES `children` / `reverse_nested`
aggregations (query/joinquery.py), `geo_distance` rings
(query/geo.py::geo_distance_rings_agg), and `categorize_text`
(query/aggs.py::categorize_text_agg) — each checked against a
hand-computed / brute-force twin on a tiny deterministic fixture."""

import math

import pytest


@pytest.fixture(scope="module")
def parents(spark):
    rows = [
        (1, "a", 100),
        (2, "a", 300),
        (3, "b", 50),
        (4, "c", 70),   # childless parent
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


@pytest.fixture(scope="module")
def children(spark):
    rows = [
        (1, 0, "x", 4),
        (1, 1, "y", 2),
        (2, 0, "x", 6),
        (3, 0, "x", 8),
        (3, 1, "z", 1),
        (3, 2, "x", 3),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, child_ix int, lead string, nw int"
    )


def test_children_bucket_agg(parents, children):
    from dpr_spark.query.joinquery import children_bucket_agg

    res = children_bucket_agg(
        parents, children, bucket_col="source", child_value_col="nw"
    ).collect()
    got = {r.bucket: (r.n_parents, r.n_children, r.avg_child_value) for r in res}
    assert got["a"] == (2, 3, pytest.approx((4 + 2 + 6) / 3))
    assert got["b"] == (1, 3, pytest.approx((8 + 1 + 3) / 3))
    # childless bucket still reports its parents, with 0 children
    assert got["c"][0] == 1 and got["c"][1] == 0 and got["c"][2] is None


def test_reverse_nested_agg(parents, children):
    from dpr_spark.query.joinquery import reverse_nested_agg

    res = reverse_nested_agg(
        children, parents, child_key_col="lead", parent_value_col="n_chars"
    ).collect()
    got = {r.key: (r.rank, r.n_parents, r.avg_parent_value) for r in res}
    # 'x' children live in parents 1, 2, 3 — parent 3 counts ONCE
    assert got["x"][1:] == (3, pytest.approx((100 + 300 + 50) / 3))
    assert got["y"][1:] == (1, pytest.approx(100.0))
    assert got["z"][1:] == (1, pytest.approx(50.0))
    # ranks: n_parents desc, key asc
    assert got["x"][0] == 1 and got["y"][0] == 2 and got["z"][0] == 3


def test_reverse_nested_salted_matches_plain(parents, children):
    from dpr_spark.query.joinquery import reverse_nested_agg

    plain = sorted(map(tuple, reverse_nested_agg(
        children, parents, "lead", "n_chars", size=2
    ).collect()))
    salted = sorted(map(tuple, reverse_nested_agg(
        children, parents, "lead", "n_chars", size=2, salt_buckets=3
    ).collect()))
    assert plain == salted and len(plain) == 2


def _hav_km(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def test_geo_distance_rings(spark):
    from dpr_spark.query.geo import geo_distance_rings_agg

    pts_rows = [
        (0, d, float(-40 + 17 * d % 80), float(-100 + 23 * d % 200))
        for d in range(40)
    ] + [(1, d, float(10 + d), float(20 + d)) for d in range(5)]
    pts = spark.createDataFrame(
        pts_rows, "qid long, doc_id long, lat double, lon double"
    )
    edges = [1000.0, 5000.0]
    res = geo_distance_rings_agg(pts, 10.0, 20.0, edges).collect()
    got = {(r.qid, r.ring): (r.from_km, r.to_km, r["count"]) for r in res}
    # brute force
    want = {}
    for qid, _d, lat, lon in pts_rows:
        dist = round(_hav_km(10.0, 20.0, lat, lon), 6)
        ring = sum(dist >= e for e in edges)
        want[(qid, ring)] = want.get((qid, ring), 0) + 1
    for qid in (0, 1):
        for ring in range(len(edges) + 1):
            frm = 0.0 if ring == 0 else edges[ring - 1]
            to = edges[ring] if ring < len(edges) else None
            assert got[(qid, ring)] == (frm, to, want.get((qid, ring), 0))
    # dense spine: every (qid, ring) present even when empty
    assert len(got) == 2 * (len(edges) + 1)

    with pytest.raises(ValueError):
        geo_distance_rings_agg(pts, 0.0, 0.0, [5.0, 1.0])


def test_categorize_text_agg(spark):
    from dpr_spark.query.aggs import categorize_text_agg

    docs = spark.createDataFrame(
        [
            (1, "error at line 42 connecting to db"),
            (2, "error at line 7 connecting to db"),
            (3, "Error AT line 99 timeout"),
            (4, "warning disk 3 full on host x1"),
            (5, "12 34 56"),          # no letter tokens -> uncategorized
        ],
        "doc_id long, text string",
    )
    matches = spark.createDataFrame(
        [(0, d) for d in range(1, 6)], "qid long, doc_id long"
    )
    res = categorize_text_agg(matches, docs, size=10, max_tokens=4).collect()
    got = [(r.rank, r.category, r["count"]) for r in sorted(res, key=lambda r: r.rank)]
    # signature = first 4 all-letter tokens, lowercased; digit tokens
    # drop out; doc 5 has no letter tokens and is uncategorized
    assert got == [
        (1, "error at line connecting", 2),
        (2, "error at line timeout", 1),
        (3, "warning disk full on", 1),
    ]
