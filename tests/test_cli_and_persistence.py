"""S8 serialize/deserialize analog (InvertedIndex.save/load) and the
spark-submit entry points build_index.py / query.py driven end-to-end."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_index_save_load_roundtrip(spark, index, queries_df, tmp_path):
    from dpr_spark.index.build import InvertedIndex
    from dpr_spark.query.scorer import search

    path = str(tmp_path / "idx")
    index.save(path)
    loaded = InvertedIndex.load(spark, path)
    assert loaded.stats.n_docs == index.stats.n_docs
    assert loaded.stats.avgdl == index.stats.avgdl
    assert loaded.blocks is not None

    r1 = {(r.qid, r.rank): (r.doc_id, r.score) for r in search(queries_df, index, k=5).collect()}
    r2 = {(r.qid, r.rank): (r.doc_id, r.score) for r in search(queries_df, loaded, k=5).collect()}
    assert r1 == r2


@pytest.mark.slow
def test_cli_build_and_query(tmp_path, pages_pdf, queries_pdf):
    """Drive the CLIs as subprocesses (the spark-submit surface)."""
    from dpr_spark.fixtures.corpus import write_queries_tsv

    pages_path = str(tmp_path / "pages.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pages_pdf[["url", "text"]].head(150), preserve_index=False),
        pages_path,
    )
    write_queries_tsv(str(tmp_path / "qa.tsv"), queries_pdf.head(10))

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "build_index.py"),
         "--pages", pages_path, "--out", str(tmp_path / "idx"),
         "--segments-buckets", "4", "--positional"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out1.returncode == 0, out1.stderr[-2000:]
    assert "built index: 150 docs" in out1.stdout

    out2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qa.tsv"),
         "--k", "5", "--out", str(tmp_path / "run"),
         "--engine", "segments", "--eval", "--pages", pages_path],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "searched 10 queries" in out2.stdout
    assert os.path.isdir(tmp_path / "run" / "results")
    assert os.path.isdir(tmp_path / "run" / "results_json")
    assert "accuracy@" in out2.stdout

    # phrase engine over the same (positional) index: one query is a
    # verbatim bigram of a real document, so it MUST return rows
    from dpr_spark.functions.tokenizer import tokenize

    bigram = " ".join(tokenize(pages_pdf["text"].iloc[0])[:2])
    ph = queries_pdf.head(2).copy()
    ph.loc[ph.index[0], "question"] = bigram
    write_queries_tsv(str(tmp_path / "qa_phrase.tsv"), ph)
    out3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"),
         "--queries", str(tmp_path / "qa_phrase.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_phrase"),
         "--engine", "phrase"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert "searched 2 queries" in out3.stdout
    import pyarrow.parquet as _pq

    nrows = _pq.read_table(str(tmp_path / "run_phrase" / "results")).num_rows
    assert nrows > 0

    # phrase_prefix engine: the bigram with its last token truncated
    # still matches via the prefix expansion (superset of exact phrase)
    t0, t1 = bigram.split(" ")
    ph.loc[ph.index[0], "question"] = f"{t0} {t1[: max(1, len(t1) - 1)]}"
    write_queries_tsv(str(tmp_path / "qa_mpp.tsv"), ph)
    out3b = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"),
         "--queries", str(tmp_path / "qa_mpp.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_mpp"),
         "--engine", "phrase_prefix", "--max-expansions", "8"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out3b.returncode == 0, out3b.stderr[-2000:]
    nrows = _pq.read_table(str(tmp_path / "run_mpp" / "results")).num_rows
    assert nrows > 0

    # RM3 expansion layered over the segments engine
    out4 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qa.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_rm3"),
         "--engine", "segments", "--rm3", "--rm3-fb-docs", "5",
         "--pages", pages_path],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out4.returncode == 0, out4.stderr[-2000:]
    assert "[segments+rm3]" in out4.stdout
    nrows = _pq.read_table(str(tmp_path / "run_rm3" / "results")).num_rows
    assert nrows > 0

    # CommonTermsQuery mode: rare terms generate, frequent terms score
    out5 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qa.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_ct"),
         "--engine", "exact", "--common-terms", "0.5"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out5.returncode == 0, out5.stderr[-2000:]
    assert "[common_terms]" in out5.stdout
    nrows = _pq.read_table(str(tmp_path / "run_ct" / "results")).num_rows
    assert nrows > 0


@pytest.mark.slow
def test_cli_blockmax_storage_roundtrip(tmp_path, pages_pdf, queries_pdf):
    """Build writes block segments + norms to storage; query.py serves
    from the stored parquet with --engine blockmax and agrees with the
    exact engine."""
    from dpr_spark.fixtures.corpus import write_queries_tsv

    pages_path = str(tmp_path / "pages.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pages_pdf[["url", "text"]].head(120), preserve_index=False),
        pages_path,
    )
    write_queries_tsv(str(tmp_path / "qa.tsv"), queries_pdf.head(6))

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "build_index.py"),
         "--pages", pages_path, "--out", str(tmp_path / "idx"),
         "--block-buckets", "4"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out1.returncode == 0, out1.stderr[-2000:]
    assert os.path.isdir(tmp_path / "idx" / "block_segments")
    assert os.path.isdir(tmp_path / "idx" / "block_norms")

    results = {}
    for engine in ("blockmax", "exact"):
        out2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "query.py"),
             "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qa.tsv"),
             "--k", "5", "--out", str(tmp_path / f"run_{engine}"),
             "--engine", engine],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert out2.returncode == 0, out2.stderr[-2000:]
        import pyarrow.parquet as pq2

        t = pq2.read_table(str(tmp_path / f"run_{engine}" / "results")).to_pandas()
        results[engine] = sorted(
            (int(r.qid), int(r["rank"]), int(r.doc_id), float(r.score))
            for _, r in t.iterrows()
        )
    assert results["blockmax"] == results["exact"]


@pytest.mark.slow
def test_cli_snapshot_build_and_time_travel_query(tmp_path, pages_pdf, queries_pdf):
    """build_index.py --snapshot-dir commits a catalog snapshot; query.py
    pointed at the catalog serves the index, including VERSION AS OF an
    older snapshot after the corpus grows."""
    from dpr_spark.fixtures.corpus import write_queries_tsv

    import pyarrow as pa
    import pyarrow.parquet as pq

    write_queries_tsv(str(tmp_path / "qa.tsv"), queries_pdf.head(5))
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    for n, tag in ((100, "v1"), (150, "v2")):
        pages_path = str(tmp_path / f"pages_{tag}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pages_pdf[["url", "text"]].head(n), preserve_index=False),
            pages_path,
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "build_index.py"),
             "--pages", pages_path, "--out", str(tmp_path / f"idx_{tag}"),
             "--no-blocks", "--snapshot-dir", str(tmp_path / "catalog")],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
    assert "committed snapshot 2" in out.stdout

    for sid, n_docs in ((1, 100), (2, 150)):
        out2 = subprocess.run(
            [sys.executable, os.path.join(REPO, "query.py"),
             "--index", str(tmp_path / "catalog"), "--snapshot-id", str(sid),
             "--queries", str(tmp_path / "qa.tsv"),
             "--k", "5", "--out", str(tmp_path / f"run_s{sid}"),
             "--engine", "exact"],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert out2.returncode == 0, out2.stderr[-2000:]
        assert "searched 5 queries" in out2.stdout


@pytest.mark.slow
def test_cli_search_after_and_sort_by(tmp_path, pages_pdf, queries_pdf):
    """query.py paging surface: a query parquet carrying (after_score,
    after_doc) returns page 2 == ranks 6..10 of the k=10 run; --sort-by
    ranks matches by a doc-values column."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(pages_pdf[["url", "text"]].head(120), preserve_index=False),
        pages_path,
    )
    qpdf = queries_pdf.head(5)[["qid", "question"]]
    qpath = str(tmp_path / "q.parquet")
    qpdf.to_parquet(qpath, index=False)

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    run = lambda *a: subprocess.run(
        [sys.executable, *a], capture_output=True, text=True, timeout=420, env=env
    )
    out = run(os.path.join(REPO, "build_index.py"), "--pages", pages_path,
              "--out", str(tmp_path / "idx"), "--segments-buckets", "4")
    assert out.returncode == 0, out.stderr[-2000:]

    out = run(os.path.join(REPO, "query.py"), "--index", str(tmp_path / "idx"),
              "--queries", qpath, "--k", "10", "--out", str(tmp_path / "full"),
              "--engine", "segments")
    assert out.returncode == 0, out.stderr[-2000:]
    full = pq.read_table(str(tmp_path / "full" / "results")).to_pandas()

    cur = full[full["rank"] == 5][["qid", "score", "doc_id"]].rename(
        columns={"score": "after_score", "doc_id": "after_doc"}
    )
    q2 = qpdf.merge(cur, on="qid")
    q2path = str(tmp_path / "q2.parquet")
    q2.to_parquet(q2path, index=False)
    out = run(os.path.join(REPO, "query.py"), "--index", str(tmp_path / "idx"),
              "--queries", q2path, "--k", "5", "--out", str(tmp_path / "p2"),
              "--engine", "segments")
    assert out.returncode == 0, out.stderr[-2000:]
    p2 = pq.read_table(str(tmp_path / "p2" / "results")).to_pandas()
    exp = full[full["rank"] > 5].copy()
    exp["rank"] -= 5
    key = ["qid", "rank", "doc_id", "score"]
    assert (
        p2[key].sort_values(key).reset_index(drop=True).equals(
            exp[key].sort_values(key).reset_index(drop=True))
    )

    # sort-by-field over synthetic doc values keyed by url
    dv = pages_pdf.head(120)[["url"]].copy()
    dv["ts"] = [(i * 37) % 101 for i in range(len(dv))]
    dvpath = str(tmp_path / "dv.parquet")
    dv.to_parquet(dvpath, index=False)
    out = run(os.path.join(REPO, "query.py"), "--index", str(tmp_path / "idx"),
              "--queries", qpath, "--k", "5", "--out", str(tmp_path / "srt"),
              "--engine", "segments", "--sort-by", "ts", "--doc-values", dvpath)
    assert out.returncode == 0, out.stderr[-2000:]
    srt = pq.read_table(str(tmp_path / "srt" / "results")).to_pandas()
    assert set(srt.columns) == {"qid", "rank", "doc_id", "ts"}
    assert len(srt) > 0
    for _, g in srt.sort_values(["qid", "rank"]).groupby("qid"):
        ts = list(g.ts)
        assert ts == sorted(ts, reverse=True)


def test_cli_query_string_and_phrase_suggest(tmp_path, pages_pdf, queries_pdf):
    """--query-string parses operators (incl. a phrase needing the
    positional index); --phrase-suggest emits whole-query corrections."""
    from dpr_spark.fixtures.corpus import write_queries_tsv
    from dpr_spark.functions.tokenizer import tokenize

    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(pages_pdf[["url", "text"]].head(120), preserve_index=False),
        pages_path,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "build_index.py"),
         "--pages", pages_path, "--out", str(tmp_path / "idx"), "--positional"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out1.returncode == 0, out1.stderr[-2000:]

    toks = tokenize(pages_pdf["text"].iloc[0])
    qs = queries_pdf.head(2).copy()
    qs.loc[qs.index[0], "question"] = f'+{toks[0]} "{toks[1]} {toks[2]}" th*'
    qs.loc[qs.index[1], "question"] = f"{toks[3]} -{toks[4]}"
    write_queries_tsv(str(tmp_path / "qs.tsv"), qs)
    out2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qs.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_qs"), "--query-string"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "[query-string]" in out2.stdout
    import pyarrow.parquet as _pq

    assert _pq.read_table(str(tmp_path / "run_qs" / "results")).num_rows > 0

    bad = queries_pdf.head(1).copy()
    w = max(tokenize(bad["question"].iloc[0]), key=len)
    bad.loc[bad.index[0], "question"] = bad["question"].iloc[0].replace(
        w, w[0] + w[2:], 1
    )
    write_queries_tsv(str(tmp_path / "ps.tsv"), bad)
    out3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "ps.tsv"),
         "--out", str(tmp_path / "run_ps"), "--phrase-suggest", "3",
         "--pages", pages_path],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert "[phrase-suggest]" in out3.stdout
    assert _pq.read_table(
        str(tmp_path / "run_ps" / "phrase_suggestions")
    ).num_rows > 0


def test_cli_intervals_mode(tmp_path, pages_pdf, queries_pdf):
    """--intervals treats each question as an intervals Match rule over
    the positional index; --intervals-ordered + --max-gaps wire through."""
    from dpr_spark.fixtures.corpus import write_queries_tsv
    from dpr_spark.functions.tokenizer import tokenize

    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(pages_pdf[["url", "text"]].head(120), preserve_index=False),
        pages_path,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "build_index.py"),
         "--pages", pages_path, "--out", str(tmp_path / "idx"), "--positional"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out1.returncode == 0, out1.stderr[-2000:]

    toks = tokenize(pages_pdf["text"].iloc[0])
    qs = queries_pdf.head(1).copy()
    qs.loc[qs.index[0], "question"] = f"{toks[0]} {toks[3]}"
    write_queries_tsv(str(tmp_path / "qs.tsv"), qs)
    out2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qs.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_iv"),
         "--intervals", "--intervals-ordered", "--max-gaps", "12"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "[intervals-ordered]" in out2.stdout
    import pyarrow.parquet as _pq

    t = _pq.read_table(str(tmp_path / "run_iv" / "results"))
    assert t.num_rows > 0
    assert "n_intervals" in t.schema.names and "score" in t.schema.names

    # --term-range against the same index: '[LO..HI)' bracket syntax
    lo, hi = sorted({toks[0], toks[3], toks[1]})[:2]
    qs2 = queries_pdf.head(1).copy()
    qs2.loc[qs2.index[0], "question"] = f"[{lo}..{hi}z]"
    write_queries_tsv(str(tmp_path / "qr.tsv"), qs2)
    out3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "query.py"),
         "--index", str(tmp_path / "idx"), "--queries", str(tmp_path / "qr.tsv"),
         "--k", "5", "--out", str(tmp_path / "run_tr"), "--term-range"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert "[term-range]" in out3.stdout
    assert _pq.read_table(str(tmp_path / "run_tr" / "results")).num_rows > 0


@pytest.mark.slow
def test_cli_tokenizer_train(tmp_path, pages_pdf):
    """tokenizer_train.py end to end: merges match the pure-Python
    Sennrich twin on the same pages; vocab covers chars+merges+marker;
    --encode output reconstructs losslessly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pages_pdf[["url", "text"]].head(120), preserve_index=False
        ),
        pages_path,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tokenizer_train.py"),
         "--pages", pages_path, "--out", str(tmp_path / "bpe"),
         "--merges", "12", "--encode", str(tmp_path / "enc")],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "merges=12" in out.stdout

    from dpr_spark.extras.bpe import END, bpe_train_local
    from dpr_spark.functions.tokenizer import tokenize

    wc = {}
    for t in pages_pdf["text"].head(120):
        for w in tokenize(t):
            wc[w] = wc.get(w, 0) + 1
    want = bpe_train_local(wc, num_merges=12)

    got = pq.read_table(str(tmp_path / "bpe" / "merges.parquet")).to_pylist()
    got = [(r["step"], r["left"], r["right"], r["pair_count"]) for r in got]
    assert sorted(got) == want

    vocab = {r["symbol"]: r["kind"]
             for r in pq.read_table(str(tmp_path / "bpe" / "vocab.parquet")).to_pylist()}
    assert vocab[END] == "marker"
    for _, l, r, _ in want:
        assert vocab[l + r] == "merge"

    enc = {r["doc_id"]: r["subwords"]
           for r in pq.read_table(str(tmp_path / "enc")).to_pylist()}
    row = pages_pdf.head(120).iloc[7]
    assert "".join(enc[row["url"]]) == "".join(
        t + END for t in tokenize(row["text"])
    )


def test_index_admin_cli(tmp_path, pages_pdf):
    """index_admin.py end-to-end as subprocesses: build-layout ->
    shrink (self-verifying) -> check-layout; check over a saved index;
    a corrupted layout exits nonzero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages_path = str(tmp_path / "pages.parquet")
    pdf = pages_pdf.head(120).reset_index(drop=True).copy()
    pdf["doc_id"] = pdf.index.astype("int64")
    pq.write_table(
        pa.Table.from_pandas(pdf[["doc_id", "text", "lang"]],
                             preserve_index=False),
        pages_path,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    layout = str(tmp_path / "layout")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"),
         "build-layout", "--pages", pages_path, "--out", layout,
         "--routing-col", "lang", "--buckets", "8", "--portable"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "built layout: 8 buckets" in out.stdout

    shrunk = str(tmp_path / "layout4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"),
         "shrink", "--src", layout, "--out", shrunk, "--buckets", "4"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "shrink:" in out.stdout and "4 buckets" in out.stdout
    assert "BAD" not in out.stdout

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"),
         "check-layout", "--src", shrunk],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    # corrupt the meta (wrong bucket count) -> placement check fails
    import json
    meta_p = os.path.join(shrunk, "_layout_meta.json")
    meta = json.load(open(meta_p))
    meta["num_buckets"] = 2
    json.dump(meta, open(meta_p, "w"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "index_admin.py"),
         "check-layout", "--src", shrunk],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 1
    assert "BAD bucket_placement" in out.stdout
