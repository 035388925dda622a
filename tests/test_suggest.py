"""Completion suggester (query/suggest.py) vs a brute-force twin over
the oracle vocabulary, prefix + infix modes, and analyzed-vocab
suggestions."""

import pytest


def _twin(oracle, prefix, n=5, infix=False):
    cand = [
        (t, d) for t, d in oracle.df.items()
        if (prefix in t if infix else t.startswith(prefix))
    ]
    cand.sort(key=lambda td: (-td[1], td[0]))
    return [(i + 1, t, d) for i, (t, d) in enumerate(cand[:n])]


def _prefixes(oracle, n=4):
    seen = []
    for t in sorted(oracle.df):
        if len(t) >= 4 and t.isalpha() and t[:2] not in seen:
            seen.append(t[:2])
        if len(seen) >= n:
            break
    return seen


@pytest.mark.parametrize("mode", ["prefix", "infix"])
def test_suggest_matches_twin(spark, index, oracle, mode):
    from dpr_spark.query.suggest import suggest_completions

    ps = _prefixes(oracle)
    queries = [(i, p) for i, p in enumerate(ps)] + [(99, "zzznope")]
    res = suggest_completions(spark, queries, index, n=5, mode=mode)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.term, r.weight))
    n_rows = 0
    for qid, p in queries:
        expect = _twin(oracle, p, 5, infix=(mode == "infix"))
        assert sorted(got.get(qid, [])) == expect, f"mode={mode} prefix={p!r}"
        n_rows += len(expect)
    assert n_rows >= 10 and 99 not in got


def test_suggest_analyzed_vocab(spark, pages_pdf):
    """Suggestions over an analyzed index come from the STEMMED
    vocabulary — what a search would actually match."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.suggest import suggest_completions

    pw = assign_doc_ids(pages_pdf)
    idx = build_index_from_docs(
        spark, spark.createDataFrame(pw[["doc_id", "text"]]),
        build_blocks=False, analyzer=ENGLISH_S,
    )
    vocab = {r.term for r in idx.dictionary.select("term").collect()}
    ps = sorted({t[:2] for t in vocab if len(t) >= 4 and t.isalpha()})[:3]
    res = suggest_completions(spark, list(enumerate(ps)), idx, n=5)
    rows = res.collect()
    assert rows and all(r.term in vocab for r in rows)
    idx.unpersist()


def test_suggest_validation(spark, index):
    from dpr_spark.query.suggest import suggest_completions

    with pytest.raises(ValueError, match="mode"):
        suggest_completions(spark, [(0, "ab")], index, mode="fuzzy")
    with pytest.raises(ValueError, match="empty"):
        suggest_completions(spark, [(0, "")], index)


def test_cli_new_query_modes(tmp_path, pages_pdf, queries_pdf):
    """query.py --suggest / --regexp / --similarity / --boost drive the
    new surfaces end-to-end over a CLI-built index."""
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dpr_spark.fixtures.corpus import write_queries_tsv

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pages_pdf[["url", "text"]].head(120), preserve_index=False
        ),
        pages_path,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    def run(*extra):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "query.py"),
             "--index", str(tmp_path / "idx"),
             "--queries", str(tmp_path / "qa.tsv"),
             "--k", "5", "--engine", "exact", *extra],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    built = subprocess.run(
        [sys.executable, os.path.join(repo, "build_index.py"),
         "--pages", pages_path, "--out", str(tmp_path / "idx"), "--no-blocks"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert built.returncode == 0, built.stderr[-2000:]
    write_queries_tsv(str(tmp_path / "qa.tsv"), queries_pdf.head(4))

    assert "[lmdirichlet]" in run("--out", str(tmp_path / "r1"),
                                  "--similarity", "lmdirichlet")
    assert "[exact+boost]" in run("--out", str(tmp_path / "r2"),
                                  "--boost", "doclen:exp:0:80",
                                  "--doc-values", str(tmp_path / "idx" / "docstats"))
    # regexp: derive a live 2-char prefix pattern from the corpus
    from dpr_spark.functions.tokenizer import tokenize

    t0 = next(t for t in tokenize(pages_pdf["text"].iloc[0]) if len(t) >= 4)
    rq = queries_pdf.head(2).copy()
    rq.loc[rq.index[0], "question"] = t0[:2] + ".*"
    rq.loc[rq.index[1], "question"] = "zzz[0-9]+"
    write_queries_tsv(str(tmp_path / "qa_rx.tsv"), rq)
    out3 = subprocess.run(
        [sys.executable, os.path.join(repo, "query.py"),
         "--index", str(tmp_path / "idx"),
         "--queries", str(tmp_path / "qa_rx.tsv"),
         "--k", "5", "--out", str(tmp_path / "r3"), "--regexp"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert "[regexp]" in out3.stdout
    # suggest mode writes a suggestions dir
    sq = queries_pdf.head(1).copy()
    sq.loc[sq.index[0], "question"] = t0[:2]
    write_queries_tsv(str(tmp_path / "qa_sg.tsv"), sq)
    out4 = subprocess.run(
        [sys.executable, os.path.join(repo, "query.py"),
         "--index", str(tmp_path / "idx"),
         "--queries", str(tmp_path / "qa_sg.tsv"),
         "--out", str(tmp_path / "r4"), "--suggest", "5"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out4.returncode == 0, out4.stderr[-2000:]
    assert os.path.isdir(tmp_path / "r4" / "suggestions")
    assert pq.read_table(str(tmp_path / "r4" / "suggestions")).num_rows > 0


# --------------------- FuzzySuggester (typo-tolerant) ---------------------


def _fuzzy_twin(oracle, prefix, n=5, max_edits=1, nfp=1, mfl=3,
                exact_first=True):
    from dpr_spark.oracle.bm25 import _levenshtein

    p = prefix.lower()
    out = []
    for t, w in oracle.df.items():
        exact = t.startswith(p)
        if exact:
            dist = 0
        else:
            if len(p) < mfl or t[:nfp] != p[:nfp]:
                continue
            if len(t) < len(p) - max_edits:
                continue
            best = 999
            for L in (len(p) - 1, len(p), len(p) + 1):
                if L < nfp:
                    continue
                d = _levenshtein(t[:L], p, max_edits)
                if d >= 0:
                    best = min(best, d)
            dist = best
            if dist > max_edits:
                continue
        out.append((t, w, dist))
    out.sort(key=lambda x: ((x[2] > 0) if exact_first else False, -x[1], x[0]))
    return [(i + 1, t, w, d) for i, (t, w, d) in enumerate(out[:n])]


def test_fuzzy_suggest_vs_twin(spark, index, oracle):
    from dpr_spark.query.suggest import suggest_completions_fuzzy

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    t_long = next(t for t in terms if len(t) >= 5)
    cases = [
        (0, t_long[:3]),                       # clean prefix
        (1, t_long[:2] + "z" + t_long[3]),     # typo inside the prefix
        (2, t_long[:2]),                       # short: exact-only regime
        (3, "zzqq"),                           # hopeless: no rows
    ]
    rows = suggest_completions_fuzzy(spark, cases, index, n=5).collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.term, r.weight, r.dist))
    for v in got.values():
        v.sort()
    for qid, p in cases:
        want = _fuzzy_twin(oracle, p, n=5)
        assert got.get(qid, []) == want, (qid, p)
    assert 0 in got and 1 in got        # typo'd prefix still completes
    assert 3 not in got
    # exact-first: within qid 0, dist-0 rows precede dist>0 rows
    for qid, sugg in got.items():
        dists = [d for _r, _t, _w, d in sugg]
        assert dists == sorted(dists, key=lambda d: d > 0)


def test_fuzzy_suggest_respects_guards(spark, index, oracle):
    """non_fuzzy_prefix pins the head char; min_fuzzy_length gates
    short prefixes to exact."""
    from dpr_spark.query.suggest import suggest_completions_fuzzy

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    t_long = next(t for t in terms if len(t) >= 5)
    # head-char typo: never fuzzy-matches (Lucene nonFuzzyPrefix=1)
    head_typo = ("z" if t_long[0] != "z" else "q") + t_long[1:4]
    rows = suggest_completions_fuzzy(
        spark, [(0, head_typo)], index, n=5
    ).collect()
    assert all(r.term.startswith(head_typo[0]) for r in rows)
    # short prefix: only exact completions even with a typo
    rows2 = suggest_completions_fuzzy(
        spark, [(0, t_long[0] + "z")], index, n=5
    ).collect()
    assert all(r.term.startswith(t_long[0] + "z") for r in rows2)
