"""Link-graph analytics (extras/graph.py): fixed-point PageRank vs a
pure-Python integer twin, dangling-mass handling, edge derivation."""

import collections

import pyspark.sql.functions as F
import pytest

from dpr_spark.extras.graph import SCALE, pagerank, shingle_edges


def _py_pagerank(nodes, pairs, n_iter=5, scale=SCALE):
    od = collections.Counter(s for s, _ in pairs)
    n = len(nodes)
    rank = {v: scale for v in nodes}
    tele = (scale * 15) // 100
    for _ in range(n_iter):
        dang = sum(rank[v] for v in nodes if od[v] == 0)
        dsh = dang // n
        s = collections.Counter()
        for u, v in pairs:
            s[v] += rank[u] // od[u]
        rank = {v: tele + (85 * (s[v] + dsh)) // 100 for v in nodes}
    return rank


def _run(spark, nodes, pairs, n_iter=5):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.node: r.pr for r in pagerank(ndf, edf, n_iter=n_iter).collect()}
    assert got == _py_pagerank(nodes, pairs, n_iter=n_iter)
    return got


def test_pagerank_matches_integer_twin_bitexact(spark):
    # diamond + a dangling sink: 0->1, 0->2, 1->3, 2->3; 3 dangles
    got = _run(spark, [0, 1, 2, 3], [(0, 1), (0, 2), (1, 3), (2, 3)])
    # the sink of both paths must dominate; the source is teleport-poor
    assert got[3] == max(got.values())
    assert got[0] == min(got.values())


def test_pagerank_cycle_is_uniform(spark):
    # a 3-cycle is rank-symmetric: every node holds exactly SCALE forever
    got = _run(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)])
    assert set(got.values()) == {SCALE}


def test_pagerank_all_dangling_redistributes_uniformly(spark):
    got = _run(spark, [0, 1, 2, 3], [], n_iter=3)
    assert len(set(got.values())) == 1


def test_pagerank_mass_conserved(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    got = _run(spark, list(range(6)), pairs)
    total = sum(got.values())
    # integer truncation only ever loses mass, at most a few units per
    # node per iteration
    assert 0 <= 6 * SCALE - total < 6 * SCALE * 1e-9


def test_pagerank_partitioning_invariant(spark):
    # fixed-point arithmetic: identical bits at 1 and 16 shuffle
    # partitions (the float version cannot promise this)
    nodes = list(range(40))
    pairs = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, (i * 11 + 1) % 40) for i in range(0, 40, 2)
    ]
    pairs = sorted({(s, d) for s, d in pairs if s != d})
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = _run(spark, nodes, pairs)
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        b = _run(spark, nodes, pairs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_pagerank_empty_nodes_raises(spark):
    ndf = spark.createDataFrame([], "node long")
    edf = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(ndf, edf)


def test_shingle_edges_contract(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (5, "zz alpha beta gamma qq"),
        (9, "alpha beta gamma epsilon"),
        (12, "nothing shared here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    edges = shingle_edges(docs, n=3, min_df=2, max_df=3).collect()
    pairs = {(e.src, e.dst, e.anchor) for e in edges}
    # "alpha beta gamma" appears in docs 1, 5, 9 (df=3): consecutive
    # pairs 1->5 and 5->9; "beta gamma delta" etc. have df=1 -> dropped
    assert (1, 5, "alpha beta gamma") in pairs
    assert (5, 9, "alpha beta gamma") in pairs
    assert all(e.src < e.dst for e in edges)
    assert not any(e.src == 12 or e.dst == 12 for e in edges)


def test_shingle_edges_short_docs_no_error(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "")], "doc_id long, text string"
    )
    assert shingle_edges(docs, n=3).count() == 0


def _py_hits(nodes, pairs, n_iter=3, scale=None):
    from dpr_spark.extras.graph import HITS_SCALE

    scale = scale or HITS_SCALE
    hub = {v: scale for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(n_iter):
        s = collections.Counter()
        for u, v in pairs:
            s[v] += hub[u]
        m = max(max(s.values(), default=0), 1)
        auth = {v: (s[v] * scale) // m for v in nodes}
        s = collections.Counter()
        for u, v in pairs:
            s[u] += auth[v]
        m = max(max(s.values(), default=0), 1)
        hub = {v: (s[v] * scale) // m for v in nodes}
    return hub, auth


def test_hits_matches_integer_twin_bitexact(spark):
    from dpr_spark.extras.graph import hits

    nodes = list(range(8))
    pairs = [(0, 3), (1, 3), (2, 3), (3, 4), (0, 4), (5, 6)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(ndf, edf).collect()}
    hub, auth = _py_hits(nodes, pairs)
    assert got == {v: (hub[v], auth[v]) for v in nodes}
    # node 3 has the most in-links from good hubs; node 0 links to both
    # strong authorities
    assert got[3][1] == max(a for _, a in got.values())
    assert got[0][0] == max(h for h, _ in got.values())
    # edge-less node scores zero on both axes
    assert got[7] == (0, 0)


def test_pagerank_local_and_iterative_agree(spark, monkeypatch):
    """The single-task fixed-point kernel and the iterative plan must be
    bit-identical (integer arithmetic both sides)."""
    import dpr_spark.extras.graph as g

    nodes = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0), (3, 1), (4, 5), (6, 6),
         (7, 0), (7, 99), (0, 1)],  # dup edge + edge into a non-base dst
        "src long, dst long",
    )
    local = {
        r.node: r.pr
        for r in g.pagerank(nodes.select("doc_id"), edges, n_iter=5).collect()
    }
    monkeypatch.setattr(g, "LOCAL_GRAPH_EDGES_MAX", 0)
    iterative = {
        r.node: r.pr
        for r in g.pagerank(nodes.select("doc_id"), edges, n_iter=5).collect()
    }
    assert local == iterative


def test_hits_local_and_iterative_agree(spark, monkeypatch):
    import dpr_spark.extras.graph as g

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 1), (3, 4), (5, 5), (6, 42), (1, 2)],
        "src long, dst long",
    )
    local = {
        (r.node): (r.hub, r.auth)
        for r in g.hits(nodes.select("doc_id"), edges, n_iter=3).collect()
    }
    monkeypatch.setattr(g, "LOCAL_GRAPH_EDGES_MAX", 0)
    iterative = {
        (r.node): (r.hub, r.auth)
        for r in g.hits(nodes.select("doc_id"), edges, n_iter=3).collect()
    }
    assert local == iterative
