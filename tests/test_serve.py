"""Resident serving mode (dense_retriever.py:183-298 DenseRPCRetriever
analog): index loads once, query batches drain from a directory, results
match the one-shot engine, steady-state q/s reported."""

import json
import os


def test_serve_loop_drains_batches(spark, index, queries_pdf, tmp_path):
    from dpr_spark.query.scorer import search
    from dpr_spark.serve import make_searcher, serve_loop

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(in_dir)

    b1 = queries_pdf.head(10)[["qid", "question"]]
    b2 = queries_pdf.tail(10)[["qid", "question"]]
    b1.to_parquet(in_dir / "batch_a.parquet", index=False)
    b2.to_parquet(in_dir / "batch_b.parquet", index=False)
    (in_dir / "STOP").touch()  # pre-staged: loop drains then exits

    searcher, close = make_searcher(spark, index, engine="segments", k=5)
    stats = serve_loop(spark, searcher, str(in_dir), str(out_dir), poll_sec=0.05)
    close()

    assert [b["name"] for b in stats["batches"]] == ["batch_a.parquet", "batch_b.parquet"]
    assert stats["steady_qps"] is not None and stats["steady_qps"] > 0
    on_disk = json.load(open(out_dir / "serve_stats.json"))
    assert on_disk["batches"] == stats["batches"]

    # served results == one-shot engine results, per batch
    for name, pdf in (("batch_a", b1), ("batch_b", b2)):
        got = sorted(
            (r.qid, r.rank, r.doc_id, r.score)
            for r in spark.read.parquet(str(out_dir / name)).collect()
        )
        exp = sorted(
            (r.qid, r.rank, r.doc_id, r.score)
            for r in search(spark.createDataFrame(pdf), index, k=5).collect()
        )
        assert got == exp


def test_make_searcher_blockmax_from_storage(spark, index, queries_df, tmp_path):
    """The blockmax searcher serves straight off the bucketed at-rest
    layout when the index dir carries one (nothing re-persisted)."""
    from dpr_spark.query.blockmax import build_block_segments, save_serving_layout
    from dpr_spark.query.scorer import search
    from dpr_spark.serve import make_searcher

    path = str(tmp_path / "idx")
    blocks, norms = build_block_segments(index, num_buckets=4)
    save_serving_layout(spark, blocks, norms, path, 4)

    searcher, close = make_searcher(spark, index, engine="blockmax", index_dir=path, k=5)
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score) for r in searcher(queries_df).collect()
    )
    close()
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(queries_df, index, k=5).collect()
    )
    assert got == exp


def test_serve_loop_coalesces_backlog_same_results(spark, index, queries_pdf, tmp_path):
    """r3 VERDICT next-round #7: a pending backlog drains as ONE searcher
    wave (fixed per-job cost amortized), re-keyed qids are restored, and
    per-batch results are identical to the one-shot engine even when two
    batches REUSE the same qids."""
    from dpr_spark.query.scorer import search
    from dpr_spark.serve import make_searcher, serve_loop

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(in_dir)

    b1 = queries_pdf.head(8)[["qid", "question"]].copy()
    b2 = queries_pdf.tail(8)[["qid", "question"]].copy()
    b2["qid"] = b1["qid"].to_numpy()  # same qids in both batches
    b1.to_parquet(in_dir / "w_a.parquet", index=False)
    b2.to_parquet(in_dir / "w_b.parquet", index=False)
    (in_dir / "STOP").touch()

    searcher, close = make_searcher(spark, index, engine="segments", k=5)
    stats = serve_loop(spark, searcher, str(in_dir), str(out_dir), poll_sec=0.05)
    close()

    # both batches rode one wave
    assert [b["wave"] for b in stats["batches"]] == [0, 0]
    for name, pdf in (("w_a", b1), ("w_b", b2)):
        got = sorted(
            (r.qid, r.rank, r.doc_id, r.score)
            for r in spark.read.parquet(str(out_dir / name)).collect()
        )
        exp = sorted(
            (r.qid, r.rank, r.doc_id, r.score)
            for r in search(spark.createDataFrame(pdf), index, k=5).collect()
        )
        assert got == exp, name


def test_serve_loop_phrase_multibatch_wave(spark, index, pages_pdf, oracle, tmp_path):
    """ADVICE r4 (high): a coalesced wave re-keys qids to i*2^32+qid,
    which overflowed the phrase engine's int qid schema and crashed the
    serve loop exactly when a backlog formed. Two pending phrase batches
    must drain in ONE wave with per-batch results == the oracle."""
    import pandas as pd

    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.phrase import build_positions
    from dpr_spark.serve import make_searcher, serve_loop

    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    pos = build_positions(docs, index.dictionary)

    ds = sorted(oracle.doc_tokens)
    p1 = " ".join(oracle.doc_tokens[ds[4]][1:3])
    p2 = " ".join(oracle.doc_tokens[ds[7]][2:4])

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    os.makedirs(in_dir)
    pd.DataFrame({"qid": [0], "question": [p1]}).to_parquet(
        in_dir / "p_a.parquet", index=False
    )
    pd.DataFrame({"qid": [0], "question": [p2]}).to_parquet(
        in_dir / "p_b.parquet", index=False
    )
    (in_dir / "STOP").touch()

    searcher, close = make_searcher(spark, index, engine="phrase", k=5, positions=pos)
    try:
        stats = serve_loop(spark, searcher, str(in_dir), str(out_dir), poll_sec=0.05)
    finally:
        close()
    assert [b["wave"] for b in stats["batches"]] == [0, 0]  # one wave
    for name, phrase in (("p_a", p1), ("p_b", p2)):
        got = sorted(
            (r.qid, r.rank, r.doc_id, round(r.score, 9))
            for r in spark.read.parquet(str(out_dir / name)).collect()
        )
        exp = [
            (0, i + 1, doc, round(s, 9))
            for i, (doc, s) in enumerate(oracle.phrase_search(phrase, 5))
        ]
        assert got == exp, name
        assert exp


def test_make_searcher_phrase_engine(spark, index, pages_pdf, oracle, tmp_path):
    """engine='phrase': positions resident, batch answers == oracle."""
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.query.phrase import build_positions
    from dpr_spark.serve import make_searcher

    pw = assign_doc_ids(pages_pdf)
    docs = spark.createDataFrame(pw[["doc_id", "text"]])
    pos = build_positions(docs, index.dictionary)

    d = sorted(oracle.doc_tokens)[4]
    phrase = " ".join(oracle.doc_tokens[d][1:3])
    qdf = spark.createDataFrame([(0, phrase)], ["qid", "question"])

    searcher, close = make_searcher(spark, index, engine="phrase", k=5, positions=pos)
    try:
        got = sorted(
            (r.qid, r.rank, r.doc_id, round(r.score, 9)) for r in searcher(qdf).collect()
        )
    finally:
        close()
    exp = [
        (0, i + 1, doc, round(s, 9))
        for i, (doc, s) in enumerate(oracle.phrase_search(phrase, 5))
    ]
    assert got == exp
    assert exp  # the bigram really matched


def test_serve_loop_paged_batch_mixed_wave(spark, index, queries_pdf, tmp_path):
    """search_after on the serving path: a batch carrying
    (after_score, after_doc) cursor columns returns page 2, coalesced in
    the SAME wave as a plain page-1 batch (null-filled cursors + re-keyed
    qids), and a non-segments engine rejects cursor batches loudly."""
    import pytest

    from dpr_spark.query.paging import cursors_from_page
    from dpr_spark.query.wand import build_impact_segments, search_segments
    from dpr_spark.serve import make_searcher, serve_loop

    seg = build_impact_segments(index, num_buckets=8)
    qpdf = queries_pdf.head(8)[["qid", "question"]].copy()
    qdf = spark.createDataFrame(qpdf)
    full = {}
    for r in search_segments(spark, qdf, index, seg, k=10).collect():
        full.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    cursors = cursors_from_page(search_segments(spark, qdf, index, seg, k=5))

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(in_dir)
    paged = qpdf.copy()
    paged["after_score"] = paged.qid.map(lambda q: cursors[int(q)][0])
    paged["after_doc"] = paged.qid.map(lambda q: cursors[int(q)][1])
    paged.to_parquet(in_dir / "b1_page2.parquet", index=False)
    qpdf.to_parquet(in_dir / "b2_plain.parquet", index=False)
    (in_dir / "STOP").touch()

    searcher, close = make_searcher(spark, index, engine="segments", k=5)
    stats = serve_loop(spark, searcher, str(in_dir), str(out_dir), poll_sec=0.05)
    close()
    assert {b["wave"] for b in stats["batches"]} == {0}  # one coalesced wave

    got2 = {}
    for r in spark.read.parquet(str(out_dir / "b1_page2")).collect():
        got2.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    exp2 = {
        q: sorted((rk - 5, d, s) for rk, d, s in rows if rk > 5)
        for q, rows in full.items()
    }
    exp2 = {q: v for q, v in exp2.items() if v}
    assert {q: sorted(v) for q, v in got2.items()} == exp2

    got1 = {}
    for r in spark.read.parquet(str(out_dir / "b2_plain")).collect():
        got1.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    exp1 = {q: sorted((rk, d, s) for rk, d, s in rows if rk <= 5) for q, rows in full.items()}
    assert {q: sorted(v) for q, v in got1.items()} == exp1

    blk, bclose = make_searcher(spark, index, engine="blockmax", k=5)
    with pytest.raises(ValueError, match="search_after"):
        blk(spark.createDataFrame(paged))
    bclose()


def test_serve_loop_dedupe_questions_same_results(spark, index, queries_pdf, tmp_path):
    """dedupe_questions=True: a wave where many qids ask the SAME
    question searches each distinct question once and fans results back
    out — per-qid output identical to the non-deduped path."""
    import pandas as pd

    from dpr_spark.query.scorer import search
    from dpr_spark.serve import make_searcher, serve_loop

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(in_dir)

    base = queries_pdf.head(4)[["qid", "question"]].reset_index(drop=True)
    # 12 qids over 4 distinct questions (each repeated 3x)
    dup = pd.DataFrame(
        {
            "qid": range(12),
            "question": [base.question[i % 4] for i in range(12)],
        }
    )
    dup.to_parquet(in_dir / "batch_dup.parquet", index=False)
    (in_dir / "STOP").touch()

    searcher, close = make_searcher(spark, index, engine="segments", k=5)
    serve_loop(
        spark, searcher, str(in_dir), str(out_dir), poll_sec=0.05,
        dedupe_questions=True,
    )
    close()

    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in spark.read.parquet(str(out_dir / "batch_dup")).collect()
    )
    exp = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in search(spark.createDataFrame(dup), index, k=5).collect()
    )
    assert got == exp and len(got) > 0
