"""drill_sideways vs a brute-force pure-Python twin.

Lucene DrillSideways contract (lucene/facet): hits apply every
drill-down selection; dimension d's facet counts are computed over the
result set with d's own selection lifted and all OTHER selections kept.
"""

import itertools

import pytest
from pyspark.sql import Row


def _twin(rows, selections):
    """Brute-force: per dimension, re-filter with that dim lifted."""
    out = {}
    dims = list(selections)
    for d in dims:
        others = {k: v for k, v in selections.items() if k != d}
        for r in rows:
            if all(r[k] == v for k, v in others.items()):
                if r[d] is not None:
                    key = (r["qid"], d, str(r[d]))
                    out[key] = out.get(key, 0) + 1
    hits = {}
    for r in rows:
        if all(r[k] == v for k, v in selections.items()):
            hits[r["qid"]] = hits.get(r["qid"], 0) + 1
    for qid in {r["qid"] for r in rows}:
        out[(qid, "_hits", "*")] = hits.get(qid, 0)
    return out


@pytest.fixture(scope="module")
def facet_fixture(spark):
    langs = ["en", "de", None, "fr"]
    sources = ["a", "b", "c"]
    docs, results = [], []
    i = 0
    for lang, src in itertools.product(langs, sources):
        for _ in range(2):
            docs.append(Row(doc_id=i, lang=lang, source=src))
            i += 1
    # qid 1 sees every doc; qid 2 a slice with zero full hits
    for d in docs:
        results.append(Row(qid=1, doc_id=d.doc_id))
    for d in docs[:5]:
        if not (d.lang == "en" and d.source == "b"):
            results.append(Row(qid=2, doc_id=d.doc_id))
    return docs, results


def test_drill_sideways_matches_brute_force(spark, facet_fixture):
    from dpr_spark.query.facets import drill_sideways

    docs, results = facet_fixture
    selections = {"lang": "en", "source": "b"}
    got = drill_sideways(
        spark.createDataFrame(results),
        spark.createDataFrame(
            docs, schema="doc_id long, lang string, source string"
        ),
        selections,
    ).collect()
    got_map = {(r.qid, r.facet, r.value): r.n for r in got}
    joined = [
        {**r.asDict(), **d.asDict()}
        for r in results
        for d in docs
        if d.doc_id == r.doc_id
    ]
    want = _twin(joined, selections)
    # twin includes zero-count sideways keys never emitted; drop zeros
    want = {k: v for k, v in want.items() if v or k[1] == "_hits"}
    assert got_map == want


def test_drill_sideways_single_dim_equals_sideways_without_self(
    spark, facet_fixture
):
    """One dimension: sideways counts = unfiltered value histogram."""
    from dpr_spark.query.facets import drill_sideways

    docs, results = facet_fixture
    got = drill_sideways(
        spark.createDataFrame(results),
        spark.createDataFrame(
            docs, schema="doc_id long, lang string, source string"
        ),
        {"lang": "de"},
    ).collect()
    side = {
        (r.qid, r.value): r.n for r in got if r.facet == "lang"
    }
    joined = [
        (r.qid, d.lang)
        for r in results
        for d in docs
        if d.doc_id == r.doc_id and d.lang is not None
    ]
    want = {}
    for k in joined:
        want[k] = want.get(k, 0) + 1
    assert side == want


def test_drill_sideways_requires_selection(spark, facet_fixture):
    from dpr_spark.query.facets import drill_sideways

    docs, results = facet_fixture
    with pytest.raises(ValueError):
        drill_sideways(
            spark.createDataFrame(results),
            spark.createDataFrame(
                docs, schema="doc_id long, lang string, source string"
            ),
            {},
        )


def _tax_twin(doc_paths, results, under, top_n, sep="/"):
    depth = 0 if not under else len(under.split(sep))
    counts = {}
    for qid, doc_id in results:
        p = doc_paths.get(doc_id)
        if p is None:
            continue
        parts = p.split(sep)
        if len(parts) <= depth:
            continue
        if under and sep.join(parts[:depth]) != under:
            continue
        child = sep.join(parts[: depth + 1])
        counts[(qid, child, parts[depth])] = (
            counts.get((qid, child, parts[depth]), 0) + 1
        )
    out = {}
    by_qid = {}
    for (qid, child, label), n in counts.items():
        by_qid.setdefault(qid, []).append((-n, label, child))
    for qid, lst in by_qid.items():
        lst.sort()
        out[qid] = [
            (r + 1, child, label, -negn)
            for r, (negn, label, child) in enumerate(lst[:top_n])
        ]
    return out


@pytest.mark.parametrize("under,top_n", [("", 3), ("sci", 5), ("sci/phys", 2)])
def test_taxonomy_facets_vs_twin(spark, under, top_n):
    from dpr_spark.query.facets import taxonomy_facets

    paths = [
        "sci/phys/quantum", "sci/phys/classical", "sci/bio",
        "sci/phys/quantum", "arts/music", "arts", "sci",
        "sci/bio/genetics", "arts/music/jazz", "sci/phys",
    ]
    doc_paths = {i: p for i, p in enumerate(paths)}
    results = [(1, i) for i in range(len(paths))] + [
        (2, i) for i in range(0, len(paths), 2)
    ]
    rdf = spark.createDataFrame(results, "qid int, doc_id long")
    pdf = spark.createDataFrame(
        list(doc_paths.items()), "doc_id long, path string"
    )
    rows = taxonomy_facets(rdf, pdf, under=under, top_n=top_n).collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.child, r.label, r.n))
    for v in got.values():
        v.sort()
    want = _tax_twin(doc_paths, results, under, top_n)
    want = {q: v for q, v in want.items() if v}
    assert got == want, (under, got, want)
