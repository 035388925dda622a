"""Analysis chain (functions/analysis.py): stemmer unit vectors, the
S-stemmer's SQL twin equivalence, and end-to-end rank identity of
analyzed indexes (stop + s / stop + porter) vs the pure-Python oracle
across the exact and segments engines, plus save/load persistence."""

import pytest


# --- unit vectors -----------------------------------------------------------

PORTER_CASES = {
    # every example from Porter (1980) steps 1-5
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_published_vectors():
    from dpr_spark.functions.analysis import porter_stem

    bad = {w: porter_stem(w) for w, e in PORTER_CASES.items() if porter_stem(w) != e}
    assert not bad


def test_s_stem_rules():
    from dpr_spark.functions.analysis import s_stem

    assert s_stem("ponies") == "pony"
    assert s_stem("flies") == "fly"
    assert s_stem("caresses") == "caresse"  # es -> e (drop s)
    assert s_stem("cats") == "cat"
    assert s_stem("bus") == "bus"  # us exception
    assert s_stem("pass") == "pass"  # ss exception
    assert s_stem("is") == "is"  # len guard
    assert s_stem("goes") == "goe"  # oes fails rule 2, cascades to rule 3


def test_s_stem_sql_twin_on_corpus_vocab(pages_pdf):
    """The SQL CASE and the Python s_stem agree on every distinct term
    of the fixture corpus plus the rule-edge words."""
    import duckdb

    from dpr_spark.functions.analysis import s_stem, s_stem_sql_case
    from dpr_spark.functions.tokenizer import tokenize

    vocab = sorted({t for text in pages_pdf.text for t in tokenize(text)})
    vocab += ["ponies", "caresses", "goes", "trees", "bus", "pass", "ies", "s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE v(t VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?)", [(t,) for t in vocab])
    got = dict(con.execute(f"SELECT t, {s_stem_sql_case('t')} FROM v").fetchall())
    assert got == {t: s_stem(t) for t in vocab}


def test_analyze_tokens_stop_then_stem():
    from dpr_spark.functions.analysis import ENGLISH_S

    toks = ["the", "ponies", "are", "in", "fields", "this", "is", "it"]
    assert ENGLISH_S.analyze_tokens(toks) == ["pony", "field"]


def test_analyzer_spec_roundtrip():
    from dpr_spark.functions.analysis import Analyzer, ENGLISH_PORTER

    back = Analyzer.from_spec(ENGLISH_PORTER.spec())
    assert back == ENGLISH_PORTER
    assert Analyzer.from_spec(None) is None


# --- end-to-end rank identity ----------------------------------------------


def _analyzed_oracle(pages_pdf, analyzer):
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.oracle.bm25 import BM25Oracle

    pw = assign_doc_ids(pages_pdf)
    o = BM25Oracle(analyzer=analyzer)
    for d, t in zip(pw.doc_id, pw.text):
        o.add(int(d), t)
    o.build()
    return o


def _docs_df(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    return spark.createDataFrame(pw[["doc_id", "text"]])


@pytest.mark.parametrize("which", ["s", "porter"])
def test_analyzed_rank_identity_exact(spark, pages_pdf, queries_pdf, which):
    from dpr_spark.functions.analysis import ENGLISH_PORTER, ENGLISH_S
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.scorer import search

    analyzer = ENGLISH_S if which == "s" else ENGLISH_PORTER
    idx = build_index_from_docs(
        spark, _docs_df(spark, pages_pdf), build_blocks=False, analyzer=analyzer
    )
    o = _analyzed_oracle(pages_pdf, analyzer)
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(15))
    got = {}
    for r in search(qdf, idx, k=10).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    n = 0
    for _, q in queries_pdf.head(15).iterrows():
        expect = o.search(q.question, 10)
        actual = sorted(got.get(int(q.qid), []))
        assert len(actual) == len(expect), f"qid={q.qid}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"{which} qid={q.qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9)
            n += 1
    assert n > 40
    idx.unpersist()


def test_analyzed_rank_identity_segments(spark, pages_pdf, queries_pdf):
    """The wand/segments engine resolves query terms through the same
    analyzer chain (wand.py query resolution, both local and UDF paths
    go through analyze_query)."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.wand import build_impact_segments, search_segments

    idx = build_index_from_docs(
        spark, _docs_df(spark, pages_pdf), build_blocks=False, analyzer=ENGLISH_S
    )
    o = _analyzed_oracle(pages_pdf, ENGLISH_S)
    seg = build_impact_segments(idx, num_buckets=8)
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(12))
    got = {}
    for r in search_segments(spark, qdf, idx, seg, k=10).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for _, q in queries_pdf.head(12).iterrows():
        expect = [
            (i + 1, d, round(s, 9)) for i, (d, s) in enumerate(o.search(q.question, 10))
        ]
        assert sorted(got.get(int(q.qid), [])) == expect, f"qid={q.qid}"
    idx.unpersist()


def test_analyzed_doclen_counts_survivors(spark, pages_pdf):
    """doclen == the oracle's surviving-token count per doc (stopwords
    excluded from length normalization, Lucene field-norm semantics)."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.index.build import build_index_from_docs

    idx = build_index_from_docs(
        spark, _docs_df(spark, pages_pdf), build_blocks=False, analyzer=ENGLISH_S
    )
    o = _analyzed_oracle(pages_pdf, ENGLISH_S)
    got = {r.doc_id: r.doclen for r in idx.docstats.collect()}
    assert got == o.doclen
    # and the analyzer genuinely shortened something
    o_raw = _analyzed_oracle(pages_pdf, None)
    assert sum(got.values()) < sum(o_raw.doclen.values())
    idx.unpersist()


def test_analyzer_save_load_roundtrip(spark, pages_pdf, queries_pdf, tmp_path):
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.index.build import InvertedIndex, build_index_from_docs
    from dpr_spark.query.scorer import search

    idx = build_index_from_docs(
        spark, _docs_df(spark, pages_pdf), build_blocks=False, analyzer=ENGLISH_S
    )
    p = str(tmp_path / "analyzed_idx")
    idx.save(p)
    back = InvertedIndex.load(spark, p)
    assert back.analyzer == ENGLISH_S
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(5))
    a = sorted(map(tuple, search(qdf, idx, k=10).collect()))
    b = sorted(map(tuple, search(qdf, back, k=10).collect()))
    assert a == b
    idx.unpersist()


def test_analyzed_phrase_position_gaps(spark):
    """Lucene position-increment semantics: a dropped stopword leaves a
    GAP — survivors keep original token positions on both the doc and
    query sides, so 'fast the scan' matches only docs where one token
    sat between fast and scan, and 'fast scan' only true adjacency."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.phrase import phrase_search_index

    docs = spark.createDataFrame(
        [
            (0, "the fast scan works"),   # fast@1 scan@2 (gap-adjacent)
            (1, "fast the scan"),         # fast@0 scan@2 (one-gap)
            (2, "fast scan"),             # fast@0 scan@1
            (3, "scan fast"),             # wrong order
        ],
        "doc_id long, text string",
    )
    idx = build_index_from_docs(
        spark, docs, build_blocks=False, build_positional=True,
        analyzer=ENGLISH_S, repartition=False,
    )

    def hits(phrase):
        res = phrase_search_index(spark, idx, idx.positions, [(0, phrase)], k=10)
        return sorted(r.doc_id for r in res.collect())

    assert hits("fast scan") == [0, 2]
    assert hits("fast the scan") == [1]       # the gap is REQUIRED
    assert hits("the fast scan") == [0, 2]    # leading stopword: no gap
    idx.unpersist()


def test_analyzed_positional_rank_identity(spark, pages_pdf):
    """Analyzed positional phrase search vs a gap-aware pure-Python
    twin over the fixture corpus (scores to 1e-9)."""
    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.phrase import phrase_search_index

    analyzer = ENGLISH_S
    idx = build_index_from_docs(
        spark, _docs_df(spark, pages_pdf), build_blocks=False,
        build_positional=True, analyzer=analyzer,
    )
    o = _analyzed_oracle(pages_pdf, analyzer)

    # verbatim 3-token snippets from real docs (gaps arise naturally)
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    phrases = []
    for i, text in enumerate(pw.text.head(8)):
        toks = tokenize(text)
        phrases.append((i, " ".join(toks[3:6])))

    # gap-aware python twin of phrase_search_index
    doc_pos = {}
    for d, text in zip(pw.doc_id, pw.text):
        pairs = analyzer.analyze_with_positions(tokenize(text))
        m = {}
        for p, t in pairs:
            m.setdefault(t, []).append(p)
        doc_pos[int(d)] = m

    def twin(phrase, k=10):
        pairs = analyzer.analyze_with_positions(
            tokenize(normalize_question(phrase))
        )
        if not pairs:
            return []
        terms = [t for _, t in pairs]
        if any(t not in o.df for t in terms):
            return []
        idf_sum = sum(o.idf(t) for t in terms)
        out = []
        for d, m in doc_pos.items():
            if any(t not in m for t in terms):
                continue
            starts = None
            for off, t in pairs:
                s = {p - off for p in m[t]}
                starts = s if starts is None else (starts & s)
            pf = len(starts)
            if pf == 0:
                continue
            dl = o.doclen[d]
            score = (
                idf_sum * pf * (o.k1 + 1.0)
                / (pf + o.k1 * (1.0 - o.b + o.b * dl / o.avgdl))
            )
            out.append((d, score))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    res = phrase_search_index(spark, idx, idx.positions, phrases, k=10)
    got = {}
    for r in res.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    n = 0
    for qid, phrase in phrases:
        expect = twin(phrase)
        actual = sorted(got.get(qid, []))
        assert len(actual) == len(expect), f"qid={qid} {phrase!r}"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"qid={qid}"
            assert score == pytest.approx(escore, abs=1e-9)
            n += 1
    assert n > 8  # the verbatim snippets really matched their docs
    idx.unpersist()


def test_cli_build_with_analyzer(tmp_path, pages_pdf, queries_pdf, spark):
    """build_index.py --analyzer english-s records the chain; the loaded
    index searches rank-identically to the analyzed oracle."""
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pages_pdf[["url", "text"]].head(120), preserve_index=False
        ),
        pages_path,
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "build_index.py"),
         "--pages", pages_path, "--out", str(tmp_path / "idx"),
         "--analyzer", "english-s", "--no-blocks"],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    from dpr_spark.functions.analysis import ENGLISH_S
    from dpr_spark.index.build import InvertedIndex
    from dpr_spark.oracle.bm25 import BM25Oracle
    from dpr_spark.query.scorer import search

    idx = InvertedIndex.load(spark, str(tmp_path / "idx"))
    assert idx.analyzer == ENGLISH_S

    # the CLI's dense ids are assigned by url order over the 120-row slice
    pw = pages_pdf.head(120).sort_values("url").reset_index(drop=True)
    o = BM25Oracle(analyzer=ENGLISH_S)
    for d, t in enumerate(pw.text):
        o.add(d, t)
    o.build()
    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(6))
    got = {}
    for r in search(qdf, idx, k=5).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for _, q in queries_pdf.head(6).iterrows():
        expect = [
            (i + 1, d, round(s, 9)) for i, (d, s) in enumerate(o.search(q.question, 5))
        ]
        assert sorted(got.get(int(q.qid), [])) == expect, f"qid={q.qid}"


def test_analyzed_equals_preanalyzed_corpus(spark, pages_pdf, queries_pdf):
    """Equivalence oracle for every non-positional engine: an ANALYZED
    index over the raw corpus scores bit-identically to a PLAIN index
    built over pre-analyzed text with pre-analyzed queries (same
    vocabulary, doclens, avgdl, term_ids) — proving blockmax / RM3 /
    MLT / synonyms all resolve through the index's chain."""
    from dpr_spark.functions.analysis import ENGLISH_S, analyze_query
    from dpr_spark.fixtures.corpus import assign_doc_ids
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.index.build import build_index_from_docs

    pw = assign_doc_ids(pages_pdf)
    raw = spark.createDataFrame(pw[["doc_id", "text"]])
    pre_pdf = pw[["doc_id"]].copy()
    pre_pdf["text"] = [
        " ".join(ENGLISH_S.analyze_tokens(tokenize(t))) for t in pw.text
    ]
    pre = spark.createDataFrame(pre_pdf[["doc_id", "text"]])

    a = build_index_from_docs(spark, raw, build_blocks=True, analyzer=ENGLISH_S)
    p = build_index_from_docs(spark, pre, build_blocks=True)

    qa = spark.createDataFrame(queries_pdf[["qid", "question"]].head(8))
    qp_pdf = queries_pdf[["qid", "question"]].head(8).copy()
    qp_pdf["question"] = [
        " ".join(analyze_query(q, ENGLISH_S)) for q in qp_pdf.question
    ]
    qp = spark.createDataFrame(qp_pdf)

    def rows(df):
        return sorted((r.qid, r.rank, r.doc_id, r.score) for r in df.collect())

    def rows9(df):
        # RM3/MLT expansion weights ride an UNORDERED partial sum over
        # feedback/seed rows (partition layout differs between the two
        # corpora) — identical to the last ulp only; compare at 9 dp
        return sorted((r.qid, r.doc_id, round(r.score, 9)) for r in df.collect())

    # blockmax engine
    from dpr_spark.query.blockmax import build_block_segments, search_blocks

    ba, na = build_block_segments(a)
    bp, np_ = build_block_segments(p)
    assert rows(search_blocks(spark, qa, a, ba, na, k=10)) == rows(
        search_blocks(spark, qp, p, bp, np_, k=10)
    )

    # RM3 (feedback docs' text: raw on the analyzed side, pre on plain)
    from dpr_spark.query.rm3 import rm3_search

    assert rows9(rm3_search(spark, qa, a, raw, k=10, fb_docs=5, fb_terms=5)) == rows9(
        rm3_search(spark, qp, p, pre, k=10, fb_docs=5, fb_terms=5)
    )

    # MoreLikeThis over the same seed docs
    from dpr_spark.query.morelikethis import more_like_this

    seeds = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(pw.doc_id.head(5))], "qid long, doc_id long"
    )
    assert rows9(more_like_this(spark, seeds, raw, a, k=10, min_df=1)) == rows9(
        more_like_this(spark, seeds, pre, p, k=10, min_df=1)
    )

    # synonyms (table in ANALYZED terms on both sides)
    from dpr_spark.query.synonyms import synonym_search

    vocab = sorted(
        {t for text in pre_pdf.text for t in tokenize(text) if len(t) >= 4}
    )[:4]
    syn = spark.createDataFrame(
        [(vocab[0], vocab[1]), (vocab[2], vocab[3])], "term string, syn string"
    )
    assert rows(synonym_search(spark, qa, a, syn, k=10)) == rows(
        synonym_search(spark, qp, p, syn, k=10)
    )
    a.unpersist(); p.unpersist()
