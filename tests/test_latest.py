"""Re-crawl upsert semantics (plans/latest.py): newest-version-wins at
build, in the streaming delta view, and at compaction.

Reference parity: DPR's corpus loaders keep the last inserted row per id
(`/root/reference/dpr/data/retriever_data.py:253-287` dict insert) —
last-write-wins by file order; here the winner is picked by an explicit
version column instead."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts(day):
    return datetime.datetime(2024, 1, day)


PAGES_T = "url string, warc_ts timestamp, text string, lang string"


def test_latest_by_key_picks_max_version_tuple(spark):
    from dpr_spark.plans.latest import latest_by_key

    df = spark.createDataFrame(
        [
            ("a", _ts(1), "old a", "en"),
            ("a", _ts(3), "new a", "en"),
            ("a", _ts(2), "mid a", "en"),
            ("b", _ts(1), "only b", "en"),
        ],
        PAGES_T,
    )
    got = {
        r.url: r.text for r in latest_by_key(df, "url", "warc_ts").collect()
    }
    assert got == {"a": "new a", "b": "only b"}
    # column order preserved
    assert latest_by_key(df, "url", "warc_ts").columns == df.columns


def test_latest_by_key_tiebreak_column(spark):
    from dpr_spark.plans.latest import latest_by_key

    df = spark.createDataFrame(
        [("k", _ts(1), "x", "en"), ("k", _ts(1), "y", "en")], PAGES_T
    )
    # same timestamp: the text column itself breaks the tie deterministically
    got = latest_by_key(df, "url", ["warc_ts", "text"]).collect()
    assert len(got) == 1 and got[0].text == "y"


def test_latest_by_key_missing_column_raises(spark):
    from dpr_spark.plans.latest import latest_by_key

    df = spark.createDataFrame([("a", "t")], "url string, text string")
    with pytest.raises(ValueError, match="missing columns"):
        latest_by_key(df, "url", "warc_ts")


def test_latest_by_key_plan_is_partial_aggregate_not_window(spark):
    """Plan shape: an aggregate pair around ONE exchange (partial combine
    collapses re-crawls map-side); never a Window (which would shuffle
    every version of every key)."""
    from dpr_spark.plans.latest import latest_by_key

    df = spark.createDataFrame([("a", _ts(1), "t", "en")], PAGES_T)
    plan = latest_by_key(df, "url", "warc_ts")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
    assert "Aggregate" in plan


def test_prepare_docs_dedup_latest(spark):
    from dpr_spark.index.build import prepare_docs

    pages = spark.createDataFrame(
        [
            ("u1", _ts(1), "january crawl", "en"),
            ("u1", _ts(2), "february crawl", "en"),
            ("u2", _ts(1), "stable page", "en"),
        ],
        PAGES_T,
    )
    docs = prepare_docs(pages, dedup_latest=True).collect()
    got = {r.url: r.text for r in docs}
    assert got == {"u1": "february crawl", "u2": "stable page"}
    ids = {r.url: r.doc_id for r in docs}
    assert len(set(ids.values())) == 2

    # without the flag the duplicate url comes through twice (the
    # documented uniqueness contract the caller must then satisfy)
    assert prepare_docs(pages, id_strategy="hash").count() == 3


def test_prepare_docs_dedup_latest_requires_warc_ts(spark):
    from dpr_spark.index.build import prepare_docs

    pages = spark.createDataFrame([("u", "t")], "url string, text string")
    with pytest.raises(ValueError, match="warc_ts"):
        prepare_docs(pages, dedup_latest=True)


def test_build_index_dedup_latest_matches_manual_dedup(spark):
    """build_index(dedup_latest=True) over a re-crawled table ==
    build_index over the manually deduped table (same postings)."""
    from dpr_spark.index.build import build_index

    rows, dedup_rows = [], []
    for i in range(40):
        u = f"https://site-{i:03d}.test/"
        rows.append((u, _ts(1), f"old text {i} alpha", "en"))
        newest = (u, _ts(2), f"new text {i} beta gamma", "en")
        rows.append(newest)
        dedup_rows.append(newest)
    full = build_index(spark, spark.createDataFrame(rows, PAGES_T), dedup_latest=True)
    manual = build_index(spark, spark.createDataFrame(dedup_rows, PAGES_T))
    a = {(r.term, r.doc_id, r.tf) for r in full.postings.join(
        full.dictionary.select("term_id", "term"), "term_id").select(
        "term", "doc_id", "tf").collect()}
    b = {(r.term, r.doc_id, r.tf) for r in manual.postings.join(
        manual.dictionary.select("term_id", "term"), "term_id").select(
        "term", "doc_id", "tf").collect()}
    assert a == b
    assert full.stats.n_docs == 40
    full.unpersist()
    manual.unpersist()


# ---------------------------------------------------------------------------
# streaming re-crawl upsert
# ---------------------------------------------------------------------------

STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_batch(path, rows):
    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "text": [r[2] for r in rows],
            }
        ),
        path,
    )


def test_streaming_recrawl_upsert(spark, tmp_path):
    """A re-crawled url: within-batch, cross-batch, and base-override
    resolution all pick the newest version."""
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    src = tmp_path / "incoming"
    src.mkdir()
    # batch 1 contains TWO fetches of u1 (within-batch re-crawl)
    _write_batch(
        str(src / "b1.parquet"),
        [
            ("u1", _ts(1), "alpha beta"),
            ("u1", _ts(2), "gamma delta"),
            ("u2", _ts(1), "epsilon"),
        ],
    )
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"))
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)

    view = r.searchable_doc_terms()
    u1 = F.xxhash64(F.lit("u1"))
    terms1 = {t.term for t in view.filter(F.col("doc_id") == u1).collect()}
    assert terms1 == {"gamma", "delta"}  # within-batch: newest fetch only

    # batch 2 re-crawls u1 again (cross-batch re-crawl)
    _write_batch(str(src / "b2.parquet"), [("u1", _ts(3), "zeta")])
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    terms2 = {
        t.term
        for t in r.searchable_doc_terms().filter(F.col("doc_id") == u1).collect()
    }
    assert terms2 == {"zeta"}

    # base override: u1's base postings are replaced, u0's survive
    base = spark.createDataFrame(
        [
            (-999, "u0", 2, "eta", 1),
            (int(spark.range(1).select(u1).first()[0]), "u1", 2, "theta", 2),
        ],
        "doc_id long, url string, doclen int, term string, tf long",
    ).select("doc_id", "doclen", "term", "tf")
    merged = r.searchable_doc_terms(base)
    by_doc = {}
    for row in merged.collect():
        by_doc.setdefault(row.doc_id, set()).add(row.term)
    assert by_doc[-999] == {"eta"}
    assert by_doc[int(spark.range(1).select(u1).first()[0])] == {"zeta"}


def test_fresh_index_nrt_search(spark, tmp_path):
    """fresh_index: base + delta searchable WITHOUT rebuild — overrides,
    new docs, and new vocabulary all served; base-only scoring
    bit-identical to the base index (stale stats reused)."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.scorer import search
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    base_pages = spark.createDataFrame(
        [("u0", "alpha beta"), ("u1", "gamma delta")], "url string, text string"
    )
    base_idx = build_index_from_docs(
        spark,
        base_pages.withColumn("doc_id", F.xxhash64("url")),
        build_blocks=False,
        id_strategy="hash",
    )

    src = tmp_path / "incoming"
    src.mkdir()
    # u1 re-crawled with new text; u2 brand new with new vocabulary
    _write_batch(
        str(src / "b1.parquet"),
        [("u1", _ts(2), "epsilon beta"), ("u2", _ts(2), "zeta beta")],
    )
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"))
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)

    fresh = r.fresh_index(base_idx)
    assert fresh.stats.n_docs == 3

    def hits(question):
        qdf = spark.createDataFrame([(0, question)], "qid long, question string")
        return {r_.doc_id for r_ in search(qdf, fresh, k=10).collect()}

    h = lambda u: int(spark.range(1).select(F.xxhash64(F.lit(u))).first()[0])
    assert hits("beta") == {h("u0"), h("u1"), h("u2")}  # old + updated + new
    assert hits("gamma") == set() and hits("delta") == set()  # overridden text gone
    assert hits("epsilon") == {h("u1")}  # updated content serves
    assert hits("zeta") == {h("u2")}  # NEW vocabulary serves pre-compaction

    # base-vocabulary scoring over an untouched doc is bit-identical
    qdf = spark.createDataFrame([(0, "alpha")], "qid long, question string")
    s_fresh = {r_.doc_id: r_.score for r_ in search(qdf, fresh, k=10).collect()}
    s_base = {r_.doc_id: r_.score for r_ in search(qdf, base_idx, k=10).collect()}
    assert s_fresh == s_base
    fresh.unpersist()
    base_idx.unpersist()


def test_fresh_index_positional_nrt_phrase(spark, tmp_path):
    """r4 Missing #2 / next-round #4: a positional base + positional
    delta serves phrase queries over the FRESH corpus state — identical
    doc sets to a full positional rebuild before compaction (scores use
    the documented stale NRT stats), and bit-identical results after
    auto-less manual compact()."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.phrase import phrase_search_index
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    base_pages = spark.createDataFrame(
        [("u0", "alpha beta gamma"), ("u1", "gamma delta alpha beta")],
        "url string, text string",
    )
    base_idx = build_index_from_docs(
        spark,
        base_pages.withColumn("doc_id", F.xxhash64("url")),
        build_blocks=False,
        id_strategy="hash",
        build_positional=True,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    # u1 re-crawled: "gamma delta" phrase gone, "beta alpha" appears;
    # u2 new doc with a new-vocabulary phrase
    _write_batch(
        str(src / "b1.parquet"),
        [("u1", _ts(2), "beta alpha epsilon"), ("u2", _ts(2), "zeta beta alpha")],
    )
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"), positional=True)
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)

    fresh = r.fresh_index(base_idx)
    assert fresh.positions is not None
    h = lambda u: int(spark.range(1).select(F.xxhash64(F.lit(u))).first()[0])

    def docs_of(idx, phrase):
        rows = phrase_search_index(
            spark, idx, idx.positions, [(0, phrase)], k=10
        ).collect()
        return {r_.doc_id for r_ in rows}

    # stale-base phrase no longer matches the re-crawled doc
    assert docs_of(fresh, "gamma delta") == set()
    # fresh re-crawl phrase + brand-new-vocabulary phrase serve
    assert docs_of(fresh, "beta alpha") == {h("u1"), h("u2")}
    assert docs_of(fresh, "zeta beta") == {h("u2")}
    # untouched base doc still serves its phrases
    assert docs_of(fresh, "alpha beta") == {h("u0")}

    # doc sets == full positional rebuild for every probe
    full_pages = spark.createDataFrame(
        [
            ("u0", "alpha beta gamma"),
            ("u1", "beta alpha epsilon"),
            ("u2", "zeta beta alpha"),
        ],
        "url string, text string",
    )
    full_idx = build_index_from_docs(
        spark,
        full_pages.withColumn("doc_id", F.xxhash64("url")),
        build_blocks=False,
        id_strategy="hash",
        build_positional=True,
    )
    for p in ("gamma delta", "beta alpha", "zeta beta", "alpha beta"):
        assert docs_of(fresh, p) == docs_of(full_idx, p), p

    # compaction folds the positional delta: bit-identical to the rebuild
    # (delta pages passed explicitly — retention needs a CompactionPolicy)
    delta_pages = spark.createDataFrame(
        [("u1", "beta alpha epsilon"), ("u2", "zeta beta alpha")],
        "url string, text string",
    )
    compacted = r.compact(base_pages, delta_pages, reset=True)
    assert compacted.positions is not None  # refresher is positional
    for p in ("beta alpha", "zeta beta", "alpha beta"):
        got = sorted(
            map(tuple, phrase_search_index(
                spark, compacted, compacted.positions, [(0, p)], k=10
            ).collect())
        )
        exp = sorted(
            map(tuple, phrase_search_index(
                spark, full_idx, full_idx.positions, [(0, p)], k=10
            ).collect())
        )
        assert got == exp, p
    fresh.unpersist()
    base_idx.unpersist()
    full_idx.unpersist()
    compacted.unpersist()


def test_fresh_index_positional_base_requires_positional_delta(spark, tmp_path):
    """A positional base with a positions-less delta must fail fast —
    silently serving stale/missing phrase results is the r4 bug."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    base_pages = spark.createDataFrame(
        [("u0", "alpha beta")], "url string, text string"
    )
    base_idx = build_index_from_docs(
        spark,
        base_pages.withColumn("doc_id", F.xxhash64("url")),
        build_blocks=False,
        id_strategy="hash",
        build_positional=True,
    )
    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), [("u1", _ts(2), "gamma beta")])
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"))  # NOT positional
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    with pytest.raises(ValueError, match="positional"):
        r.fresh_index(base_idx)
    base_idx.unpersist()


def test_compact_recrawl_does_not_double_count(spark):
    """base and delta share a url: compaction must NOT merge both
    versions' postings under the shared xxhash64 doc_id."""
    from dpr_spark.query.scorer import search
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    r = StreamingIndexRefresher(spark, "/tmp/_unused_delta_dir")
    base = spark.createDataFrame(
        [("u1", _ts(1), "alpha beta", "en"), ("u2", _ts(1), "alpha", "en")],
        PAGES_T,
    )
    delta = spark.createDataFrame([("u1", _ts(2), "gamma", "en")], PAGES_T)
    idx = r.compact(base, delta)
    assert idx.stats.n_docs == 2
    terms = {
        (row.term, row.tf)
        for row in idx.postings.join(
            idx.dictionary.select("term_id", "term"), "term_id"
        )
        .filter(F.col("doc_id") == F.xxhash64(F.lit("u1")))
        .select("term", "tf")
        .collect()
    }
    assert terms == {("gamma", 1)}  # not alpha/beta, no doubled tf
    # and the new content is searchable
    qdf = spark.createDataFrame([(0, "gamma")], "qid long, question string")
    hits = search(qdf, idx, k=10).collect()
    assert len(hits) == 1
    idx.unpersist()


def test_compact_snapshot_and_reset_lifecycle(spark, tmp_path):
    """full-build -> delta -> compact(commit + reset): the index catalog
    records the lifecycle, and the cleared delta no longer re-overrides
    the new base."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.snapshots import SnapshotCatalog, snapshot_index
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    base_pages = spark.createDataFrame(
        [("u0", "alpha beta"), ("u1", "gamma delta")], "url string, text string"
    )
    base = build_index_from_docs(
        spark,
        base_pages.withColumn("doc_id", F.xxhash64("url")),
        build_blocks=False,
        id_strategy="hash",
    )
    cat = SnapshotCatalog(spark, str(tmp_path / "idx_cat"))
    snapshot_index(cat, base, operation="full-build")

    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), [("u1", _ts(2), "epsilon")])
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"))
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    assert r.delta_doc_terms() is not None

    delta_pages = spark.createDataFrame(
        [("u1", _ts(2), "epsilon", "en")], PAGES_T
    )
    idx2 = r.compact(base_pages, delta_pages, index_catalog=cat, reset=True)
    ops = [s["operation"] for s in cat.history()]
    assert ops == ["full-build", "compact"]
    # the delta is gone: the new base is served as-is
    assert r.delta_doc_terms() is None
    assert r.fresh_index(idx2) is idx2
    # and the pre-compaction index is still time-travelable
    old = cat.read("postings", snapshot_id=cat.history()[0]["snapshot_id"])
    assert old.count() == 4  # alpha+beta+gamma+delta postings of the old base
    idx2.unpersist()
    base.unpersist()


def test_reset_delta_catalog_mode_preserves_history(spark, tmp_path):
    """Catalog-mode reset commits an empty overwrite snapshot: current
    reads are empty, earlier freshness states remain time-travelable."""
    from dpr_spark.index.snapshots import SnapshotCatalog
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), [("u1", _ts(1), "alpha beta")])
    cat = SnapshotCatalog(spark, str(tmp_path / "delta_cat"))
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"), catalog=cat)
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    n1 = r.delta_doc_terms().count()
    assert n1 == 2
    first_sid = cat.history()[0]["snapshot_id"]

    r.reset_delta()
    assert r.delta_doc_terms().count() == 0
    assert [s["operation"] for s in cat.history()][-1] == "compact-reset"
    assert cat.read("doc_terms", snapshot_id=first_sid).count() == n1


def test_compact_without_warc_ts_delta_wins(spark):
    """No version column anywhere: delta rows default above base rows."""
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    r = StreamingIndexRefresher(spark, "/tmp/_unused_delta_dir2")
    schema = "url string, text string"
    base = spark.createDataFrame([("u1", "old words")], schema)
    delta = spark.createDataFrame([("u1", "fresh words")], schema)
    idx = r.compact(base, delta)
    terms = {
        row.term
        for row in idx.postings.join(
            idx.dictionary.select("term_id", "term"), "term_id"
        ).collect()
    }
    assert terms == {"fresh", "words"}
    idx.unpersist()


def test_latest_by_key_null_versions_lose_never_null_payload(spark):
    """Explicit null semantics: a null version loses to any non-null one,
    and an all-null key keeps a real row (never a null payload)."""
    from dpr_spark.plans.latest import latest_by_key

    df = spark.createDataFrame(
        [
            ("a", None, "a-null", "en"),
            ("a", _ts(1), "a-v1", "en"),
            ("b", None, "b-null", "en"),
            ("b", None, "b-null", "en"),
        ],
        PAGES_T,
    )
    got = {r.url: r.text for r in latest_by_key(df, "url", "warc_ts").collect()}
    assert got == {"a": "a-v1", "b": "b-null"}
    assert all(v is not None for v in got.values())


def test_compact_mixed_warc_ts_presence_delta_still_wins(spark):
    """ADVICE r3: base has warc_ts (epoch-seconds, large positive), delta
    lacks it — the delta re-crawl must STILL win (old behavior dropped it
    silently because base warc_ts > the delta's 0 default). Warns on the
    mixed schema."""
    import warnings

    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    r = StreamingIndexRefresher(spark, "/tmp/_unused_delta_dir3")
    base = spark.createDataFrame(
        [("u1", _ts(5), "stale words", "en")], PAGES_T
    )
    delta = spark.createDataFrame(
        [("u1", "fresh words")], "url string, text string"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        idx = r.compact(base, delta)
        assert any("warc_ts present on only one" in str(x.message) for x in w)
    terms = {
        row.term
        for row in idx.postings.join(
            idx.dictionary.select("term_id", "term"), "term_id"
        ).collect()
    }
    assert terms == {"fresh", "words"}
    idx.unpersist()


def test_compact_same_warc_ts_tie_goes_to_delta(spark):
    """Both sides carry warc_ts and they tie: the delta (re-fetch) wins
    via the origin tiebreak."""
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    r = StreamingIndexRefresher(spark, "/tmp/_unused_delta_dir4")
    base = spark.createDataFrame([("u1", _ts(2), "base words", "en")], PAGES_T)
    delta = spark.createDataFrame([("u1", _ts(2), "delta words", "en")], PAGES_T)
    idx = r.compact(base, delta)
    terms = {
        row.term
        for row in idx.postings.join(
            idx.dictionary.select("term_id", "term"), "term_id"
        ).collect()
    }
    assert terms == {"delta", "words"}
    idx.unpersist()


def test_auto_compaction_policy_fires_and_preserves_results(spark, tmp_path):
    """r3 VERDICT next-round #5: stream micro-batches across the policy
    threshold -> compaction fires automatically, the delta resets, the
    rebuilt index serves the SAME doc set as the pre-compact fresh_index
    view, and the snapshot catalog records the compact commit."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.index.snapshots import SnapshotCatalog
    from dpr_spark.query.scorer import search
    from dpr_spark.streaming.refresh import CompactionPolicy, StreamingIndexRefresher

    base_pages = spark.createDataFrame(
        [("u0", "alpha beta"), ("u1", "gamma delta")], "url string, text string"
    )
    base_idx = build_index_from_docs(
        spark,
        base_pages.withColumn("doc_id", F.xxhash64("url")),
        build_blocks=False,
        id_strategy="hash",
    )

    src = tmp_path / "incoming"
    src.mkdir()
    # batch 1: below threshold (1 doc < min_delta_docs=2)
    _write_batch(str(src / "b1.parquet"), [("u1", _ts(2), "epsilon beta")])
    icat = SnapshotCatalog(spark, str(tmp_path / "idx_cat"))
    pol = CompactionPolicy(
        base_pages, max_delta_fraction=0.5, min_delta_docs=2, index_catalog=icat
    )
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"), policy=pol)
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    assert r.compactions == 0  # 1 delta doc < max(2, 0.5*2)

    # pre-compact NRT view, captured as doc-id hit sets
    fresh = r.fresh_index(base_idx)

    def hits(idx, question):
        qdf = spark.createDataFrame([(0, question)], "qid long, question string")
        return {row.doc_id for row in search(qdf, idx, k=10).collect()}

    pre = {q: hits(fresh, q) for q in ("beta", "epsilon", "zeta", "alpha")}

    # batch 2 crosses the threshold (2 distinct delta docs >= 2)
    _write_batch(str(src / "b2.parquet"), [("u2", _ts(3), "zeta beta")])
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    assert r.compactions == 1
    assert r.current_index is not None
    # delta cleared; fresh_index over the NEW base is the identity
    assert r.delta_doc_terms() is None
    assert r.fresh_index(r.current_index) is r.current_index
    # catalog recorded the compact commit
    assert [s["operation"] for s in icat.history()][-1] == "compact"

    # the same queries hit the same docs post-compact — plus u2, which
    # streamed in WITH the compacting batch
    h = lambda u: int(spark.range(1).select(F.xxhash64(F.lit(u))).first()[0])
    post = {q: hits(r.current_index, q) for q in ("beta", "epsilon", "zeta", "alpha")}
    assert post["alpha"] == pre["alpha"] == {h("u0")}
    assert post["epsilon"] == pre["epsilon"] == {h("u1")}
    assert pre["beta"] == {h("u0"), h("u1")}
    assert post["beta"] == {h("u0"), h("u1"), h("u2")}
    assert post["zeta"] == {h("u2")}
    # policy rolled base_pages to the collapsed union
    assert pol.base_pages.count() == 3
    base_idx.unpersist()


def test_fresh_index_rejects_dense_id_base(spark, tmp_path):
    """ADVICE r3: a dense-rank base makes the delta override a silent
    no-op (doc ids never match) — the contract is now recorded in the
    saved index and enforced at fresh_index time."""
    from dpr_spark.index.build import InvertedIndex, build_index
    from dpr_spark.streaming.refresh import StreamingIndexRefresher

    pages = spark.createDataFrame(
        [("u0", _ts(1), "alpha beta", "en")], PAGES_T
    )
    dense = build_index(spark, pages, build_blocks=False)
    assert dense.id_strategy == "dense_rank"

    # id_strategy round-trips through save/load
    out = str(tmp_path / "idx")
    dense.save(out)
    loaded = InvertedIndex.load(spark, out)
    assert loaded.id_strategy == "dense_rank"

    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(str(src / "b1.parquet"), [("u0", _ts(2), "gamma")])
    r = StreamingIndexRefresher(spark, str(tmp_path / "delta"))
    r.start(str(src), STREAM_SCHEMA).awaitTermination(120)
    with pytest.raises(ValueError, match="hash-id base"):
        r.fresh_index(loaded)

    # a hash-id build of the same pages is accepted
    hashed = build_index(spark, pages, build_blocks=False, id_strategy="hash")
    assert hashed.id_strategy == "hash"
    fresh = hashed and r.fresh_index(hashed)
    assert fresh.stats.n_docs == 1  # u0 overridden, still one doc
    dense.unpersist()
    hashed.unpersist()
