"""Lucene-parity query surface: exact-phrase (positional postings),
boolean must/should/must_not, and prefix queries — each checked
rank-AND-score-identical against the pure-Python oracle twins in
dpr_spark/oracle/bm25.py (the reference's sparse baseline is Lucene,
`/root/reference/README.md:25-26`; PhraseQuery/BooleanQuery/PrefixQuery
are its standard query types over the same index)."""

import pytest


@pytest.fixture(scope="module")
def docs_df(spark, pages_pdf):
    from dpr_spark.fixtures.corpus import assign_doc_ids

    pw = assign_doc_ids(pages_pdf)
    return spark.createDataFrame(pw[["doc_id", "text"]])


@pytest.fixture(scope="module")
def positions(spark, index, docs_df):
    from dpr_spark.query.phrase import build_positions

    pos = build_positions(docs_df, index.dictionary).persist()
    pos.count()
    yield pos
    pos.unpersist()


def _corpus_phrases(oracle):
    """Phrases guaranteed to occur (token slices of real docs) + one
    adjacent-nowhere pair + one OOV phrase."""
    doc_ids = sorted(oracle.doc_tokens)
    out = []
    for i, d in enumerate(doc_ids[:6]):
        toks = oracle.doc_tokens[d]
        if len(toks) >= 7:
            n = 2 + (i % 3)  # phrase lengths 2..4
            start = (7 * i) % (len(toks) - n)
            out.append(" ".join(toks[start : start + n]))
    # in-vocab terms that (almost surely) never appear adjacent in this order
    toks0 = oracle.doc_tokens[doc_ids[0]]
    out.append(f"{toks0[-1]} {toks0[0]} {toks0[-1]}")
    out.append("zzzunseen phrase")  # OOV term -> must yield no rows
    return list(enumerate(out))


def _check_topk(rows, expect_by_qid, label):
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, r.score))
    for qid in got:
        got[qid].sort()
    for qid, expect in expect_by_qid.items():
        actual = got.get(qid, [])
        assert len(actual) == len(expect), f"{label} qid={qid} count"
        for (rank, doc_id, score), (edoc, escore) in zip(actual, expect):
            assert doc_id == edoc, f"{label} qid={qid} rank={rank}"
            assert score == pytest.approx(escore, abs=1e-9), (
                f"{label} qid={qid} rank={rank} doc={doc_id}"
            )
    extra = set(got) - set(q for q, e in expect_by_qid.items() if e)
    assert not extra, f"{label} unexpected qids {extra}"


def test_positions_consistent_with_postings(index, positions):
    from pyspark.sql import functions as F

    bad = positions.filter(
        (F.size("positions") != F.col("tf"))
        | (F.col("positions") != F.sort_array("positions"))
    ).count()
    assert bad == 0
    assert positions.count() == index.postings.count()
    ptf = positions.agg(F.sum("tf")).collect()[0][0]
    btf = index.postings.agg(F.sum("tf")).collect()[0][0]
    assert ptf == btf


@pytest.mark.parametrize("k", [5, 50])
def test_phrase_search_index_vs_oracle(spark, index, positions, oracle, k):
    from dpr_spark.query.phrase import phrase_search_index

    phrases = _corpus_phrases(oracle)
    expect = {qid: oracle.phrase_search(p, k) for qid, p in phrases}
    assert sum(len(v) for v in expect.values()) > 0  # suite exercises matches
    rows = phrase_search_index(spark, index, positions, phrases, k=k).collect()
    _check_topk(rows, expect, "phrase_index")


def test_phrase_search_docs_vs_oracle(spark, docs_df, oracle):
    from dpr_spark.query.phrase import phrase_search_docs

    phrases = _corpus_phrases(oracle)
    expect = {qid: oracle.phrase_search(p, 10) for qid, p in phrases}
    rows = phrase_search_docs(spark, docs_df, phrases, k=10).collect()
    _check_topk(rows, expect, "phrase_docs")


def test_phrase_single_term_equals_term_query(spark, index, positions, oracle):
    """A 1-token phrase must degenerate to the plain BM25 term query."""
    from dpr_spark.query.phrase import phrase_search_index

    term = max(oracle.df, key=lambda t: (oracle.df[t], t))
    expect = {0: oracle.phrase_search(term, 10)}
    assert expect[0] == oracle.search(term, 10)
    rows = phrase_search_index(spark, index, positions, [(0, term)], k=10).collect()
    _check_topk(rows, expect, "phrase_1term")


def _bool_cases(oracle):
    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    a, b, c, d = terms[0], terms[1], terms[len(terms) // 2], terms[-1]
    return [
        (0, [a], [c], []),          # must + should
        (1, [a, b], [], []),        # conjunction
        (2, [], [a, c], [b]),       # pure disjunction with exclusion
        (3, [a], [], [b]),          # must with exclusion
        (4, [a, "zzzunseen"], [c], []),  # OOV must -> empty
        (5, [], [d], []),           # rare-term disjunction
        (6, [c], [c, a], [d]),      # duplicate term across clauses
    ]


def test_bool_search_vs_oracle(spark, index, oracle):
    from dpr_spark.query.boolquery import bool_search

    cases = _bool_cases(oracle)
    expect = {
        qid: oracle.bool_search(m, s, x, k=20) for qid, m, s, x in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    assert expect[4] == []  # the OOV-must case really is empty
    rows = bool_search(spark, cases, index, k=20).collect()
    _check_topk(rows, expect, "bool")


def test_bool_must_not_excludes(spark, index, oracle):
    """Every returned doc contains all must terms and no must_not term."""
    from dpr_spark.query.boolquery import bool_search

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    m, x = terms[2], terms[3]
    rows = bool_search(spark, [(0, [m], [], [x])], index, k=1000).collect()
    assert rows
    for r in rows:
        toks = set(oracle.doc_tokens[r.doc_id])
        assert m in toks and x not in toks


def _bigram_where(oracle, pred):
    """First document bigram (tok[i], tok[i+1]) satisfying pred(df_i, df_j)."""
    for d in sorted(oracle.doc_tokens):
        toks = oracle.doc_tokens[d]
        for i in range(len(toks) - 1):
            if pred(oracle.df[toks[i]], oracle.df[toks[i + 1]]):
                return f"{toks[i]} {toks[i + 1]}"
    raise AssertionError("no such bigram in fixture corpus")


def test_phrase_pass_selection_both_branches(spark, index, positions, oracle):
    """The cost-based single-pass vs two-pass choice: a rare+common
    phrase takes the survivor-filtered two-pass plan, a common+common
    phrase the one-shuffle plan — results oracle-identical either way."""
    from dpr_spark.query import phrase as ph

    rare_common = _bigram_where(oracle, lambda a, b: min(a, b) <= 3 and max(a, b) >= 30)
    common_common = _bigram_where(oracle, lambda a, b: min(a, b) >= 30)

    chosen = []
    orig = ph._choose_two_pass

    def spy(df_rows):
        out = orig(df_rows)
        chosen.append(out)
        return out

    ph._choose_two_pass = spy
    try:
        for q, want_two in [(rare_common, True), (common_common, False)]:
            expect = {0: oracle.phrase_search(q, 10)}
            rows = ph.phrase_search_index(
                spark, index, positions, [(0, q)], k=10
            ).collect()
            _check_topk(rows, expect, f"pass_sel:{q}")
            assert chosen[-1] is want_two, (q, chosen)
    finally:
        ph._choose_two_pass = orig


@pytest.mark.parametrize("window", [3, 8, 50])
def test_span_near_vs_oracle(spark, index, positions, oracle, window):
    from dpr_spark.query.phrase import span_near_search_index

    doc_ids = sorted(oracle.doc_tokens)
    queries = []
    for i, d in enumerate(doc_ids[:5]):
        toks = oracle.doc_tokens[d]
        if len(toks) >= 12:
            # terms sampled non-adjacently from a real doc -> guaranteed
            # co-occurrence at SOME window size
            queries.append((i, f"{toks[1]} {toks[6]} {toks[10]}"))
    queries.append((9, "zzzunseen thing"))
    expect = {
        qid: oracle.span_near_search(q, k=20, window=window) for qid, q in queries
    }
    if window >= 50:
        assert sum(len(v) for v in expect.values()) > 0
    rows = span_near_search_index(
        spark, index, positions, queries, window=window, k=20
    ).collect()
    _check_topk(rows, expect, f"span_near_w{window}")


def test_span_near_window_monotone(spark, index, positions, oracle):
    """A wider window can only add matches (per qid, the matched doc set
    grows monotonically with window)."""
    from dpr_spark.query.phrase import span_near_search_index

    d = sorted(oracle.doc_tokens)[2]
    toks = oracle.doc_tokens[d]
    q = [(0, f"{toks[0]} {toks[5]}")]
    sets = []
    for w in (2, 10, 100):
        rows = span_near_search_index(spark, index, positions, q, window=w, k=1000)
        sets.append({r.doc_id for r in rows.collect()})
    assert sets[0] <= sets[1] <= sets[2]
    assert sets[2]  # the widest window certainly matches the source doc


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_ordered_vs_oracle(spark, index, positions, oracle, slop):
    """Ordered-with-gaps (r4 Missing #4): engine == pure-Python greedy
    twin across slops, on phrases with real matches + never-adjacent +
    OOV cases."""
    from dpr_spark.query.phrase import span_ordered_search_index

    phrases = _corpus_phrases(oracle)
    expect = {qid: oracle.span_ordered_search(p, k=20, slop=slop) for qid, p in phrases}
    assert sum(len(v) for v in expect.values()) > 0
    rows = span_ordered_search_index(
        spark, index, positions, phrases, slop=slop, k=20
    ).collect()
    _check_topk(rows, expect, f"span_ordered_s{slop}")


def test_span_ordered_slop0_equals_phrase(spark, index, positions, oracle):
    """slop=0 must degenerate to the exact-phrase engine bit-for-bit."""
    from dpr_spark.query.phrase import phrase_search_index, span_ordered_search_index

    phrases = _corpus_phrases(oracle)
    a = sorted(
        map(tuple, span_ordered_search_index(
            spark, index, positions, phrases, slop=0, k=30
        ).collect())
    )
    b = sorted(
        map(tuple, phrase_search_index(spark, index, positions, phrases, k=30).collect())
    )
    assert a == b and len(a) > 0


def test_span_ordered_slop_monotone(spark, index, positions, oracle):
    """A larger slop can only add matches (the width bound relaxes) and
    ordering matters: a reversed never-adjacent phrase stays empty at
    slop=0 but its in-order counterpart gains matches with slop."""
    from dpr_spark.query.phrase import span_ordered_search_index

    d0 = sorted(oracle.doc_tokens)[0]
    toks = oracle.doc_tokens[d0]
    # two in-order tokens with one gap: matches only at slop >= 1
    q = [(0, f"{toks[0]} {toks[2]}")]
    prev = -1
    for slop in (0, 1, 4):
        n = span_ordered_search_index(
            spark, index, positions, q, slop=slop, k=1000
        ).count()
        assert n >= prev
        prev = n
    assert prev > 0  # slop=4 certainly matches doc d0


def test_prefix_search_vs_oracle(spark, index, oracle):
    from dpr_spark.query.boolquery import prefix_search

    # 1-2 char prefixes of real vocabulary (several expansions each),
    # plus a no-match prefix
    terms = sorted(oracle.df)
    prefixes = sorted({t[:2] for t in terms[:40] if len(t) >= 2})[:6]
    prefixes += [terms[len(terms) // 2][:1], "zzznope"]
    cases = list(enumerate(prefixes))
    expect = {
        qid: oracle.prefix_search(p, k=15, max_expansions=4) for qid, p in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = prefix_search(spark, cases, index, k=15, max_expansions=4).collect()
    _check_topk(rows, expect, "prefix")


def test_wildcard_search_vs_oracle(spark, index, oracle):
    from dpr_spark.query.boolquery import wildcard_search

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    t0, t1 = terms[0], terms[4]
    cases = [
        (0, f"{t0[0]}*"),                         # prefix-equivalent glob
        (1, f"*{t1[-1]}"),                        # suffix
        (2, f"{t0[0]}?{t0[2:]}" if len(t0) >= 3 else f"{t0}?"),  # ? wildcard
        (3, "*"),                                 # matches everything (capped)
        (4, "zzz*nope"),                          # no match
    ]
    expect = {
        qid: oracle.wildcard_search(p, k=15, max_expansions=4) for qid, p in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = wildcard_search(spark, cases, index, k=15, max_expansions=4).collect()
    _check_topk(rows, expect, "wildcard")


def test_term_range_search_vs_oracle(spark, index, oracle):
    from dpr_spark.query.boolquery import term_range_search

    terms = sorted(oracle.df)
    mid = terms[len(terms) // 2]
    cases = [
        (0, terms[0], mid, True, True),       # bounded inclusive
        (1, terms[0], mid, False, False),     # exclusive both ends
        (2, mid, None, True, True),           # open hi
        (3, None, mid, True, True),           # open lo
        (4, "zz", "zzz", True, True),         # (almost surely) empty
        (5, terms[2], terms[2], True, True),  # single-term degenerate
    ]
    expect = {
        qid: oracle.term_range_search(
            lo, hi, k=15, max_expansions=4, inc_lo=il, inc_hi=ih
        )
        for qid, lo, hi, il, ih in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = term_range_search(spark, cases, index, k=15, max_expansions=4).collect()
    _check_topk(rows, expect, "term_range")


def test_term_range_envelope_prunes_but_preserves(spark, index, oracle):
    """The pushed envelope filter is a superset of every clause: results
    with and without it are identical (bounded clauses only — the case
    where the envelope actually applies)."""
    from dpr_spark.query.boolquery import expand_term_range, term_range_search

    terms = sorted(oracle.df)
    cases = [(0, terms[1], terms[-2], True, False), (1, terms[0], terms[3], True, True)]
    got = {
        (r.qid, r.rank): (r.doc_id, round(r.score, 9))
        for r in term_range_search(spark, cases, index, k=10, max_expansions=4).collect()
    }
    pdf = spark.createDataFrame(
        [(q, lo, hi, il, ih) for q, lo, hi, il, ih in cases],
        "qid long, lo string, hi string, inc_lo boolean, inc_hi boolean",
    )
    no_env = expand_term_range(index, pdf, 4, envelope=None)
    env = expand_term_range(index, pdf, 4, envelope=(terms[0], terms[-2]))
    assert sorted(map(tuple, no_env.collect())) == sorted(map(tuple, env.collect()))
    assert got  # the bounded clauses matched something


def test_index_save_load_roundtrip_with_positions(
    spark, pages_df, oracle, tmp_path
):
    """build_index(build_positional=True) -> save -> load -> phrase query
    identical to the oracle (S8 resume surface extended with the .pos
    analog)."""
    from dpr_spark.index.build import InvertedIndex, build_index
    from dpr_spark.query.phrase import phrase_search_index

    idx = build_index(spark, pages_df, build_blocks=False, build_positional=True)
    assert idx.positions is not None
    path = str(tmp_path / "posidx")
    idx.save(path)
    idx.unpersist()

    loaded = InvertedIndex.load(spark, path)
    assert loaded.positions is not None
    d = sorted(oracle.doc_tokens)[7]
    toks = oracle.doc_tokens[d]
    phrase = " ".join(toks[2:5])
    expect = {0: oracle.phrase_search(phrase, 10)}
    assert expect[0]
    rows = phrase_search_index(
        spark, loaded, loaded.positions, [(0, phrase)], k=10
    ).collect()
    _check_topk(rows, expect, "phrase_loaded")


def test_matched_queries_annotation(spark, index, queries_pdf, oracle):
    """ES matched_queries: each top-k hit carries the sorted names of
    named clauses with >=1 term in the doc, '' when none — vs brute
    force over oracle postings."""
    from dpr_spark.functions.tokenizer import tokenize
    from dpr_spark.query.boolquery import matched_queries
    from dpr_spark.query.scorer import search

    qs = queries_pdf.head(6)
    qdf = spark.createDataFrame(qs[["qid", "question"]])
    results = search(qdf, index, k=10)
    # two named clauses per query: first token / remaining tokens
    named = []
    for _, q in qs.iterrows():
        toks = tokenize(q.question)
        named.append((int(q.qid), "head", toks[0]))
        if len(toks) > 1:
            named.append((int(q.qid), "tail", " ".join(toks[1:])))
    out = matched_queries(spark, results, named, index)
    got = {(r.qid, r.doc_id): r.matched_queries for r in out.collect()}
    assert len(got) == results.count()
    checked = 0
    for _, q in qs.iterrows():
        qid = int(q.qid)
        toks = tokenize(q.question)
        groups = {"head": {toks[0]}, "tail": set(toks[1:])}
        for d, _s in oracle.search(q.question, k=10):
            names = sorted(
                n for n, ts in groups.items()
                if ts and any(d in oracle.postings.get(t, {}) for t in ts)
            )
            assert got[(qid, d)] == ",".join(names), f"qid={qid} doc={d}"
            checked += 1
    assert checked >= 40


def test_matched_queries_empty_for_unnamed_docs(spark, index, queries_pdf):
    """A named clause matching NO result doc yields '' annotations, and
    rows/columns of the input survive unchanged."""
    from dpr_spark.query.boolquery import matched_queries
    from dpr_spark.query.scorer import search

    qdf = spark.createDataFrame(queries_pdf[["qid", "question"]].head(2))
    results = search(qdf, index, k=5)
    named = [(int(r.qid), "ghost", "zzzznonexistenttoken") for r in qdf.collect()]
    out = matched_queries(spark, results, named, index)
    rows = out.collect()
    assert len(rows) == results.count()
    assert all(r.matched_queries == "" for r in rows)
    assert set(out.columns) == set(results.columns) | {"matched_queries"}


def test_span_first_vs_oracle(spark, index, positions, oracle):
    from dpr_spark.query.phrase import span_first_search_index

    doc_ids = sorted(oracle.doc_tokens)
    queries = []
    for i, d in enumerate(doc_ids[:5]):
        toks = oracle.doc_tokens[d]
        if len(toks) >= 12:
            queries.append((i, f"{toks[1]} {toks[6]}"))
    queries.append((9, "zzzunseen thing"))
    for first_n in (4, 10, 10_000):
        expect = {
            qid: oracle.span_first_search(q, k=20, window=8, first_n=first_n)
            for qid, q in queries
        }
        rows = span_first_search_index(
            spark, index, positions, queries, window=8, first_n=first_n, k=20
        ).collect()
        _check_topk(rows, expect, f"span_first_n{first_n}")
    # unbounded first_n must equal plain span_near
    from dpr_spark.query.phrase import span_near_search_index

    a = {(r.qid, r.doc_id, round(r.score, 9)) for r in rows}
    b = {
        (r.qid, r.doc_id, round(r.score, 9))
        for r in span_near_search_index(
            spark, index, positions, queries, window=8, k=20
        ).collect()
    }
    assert a == b


def test_span_or_near_vs_oracle(spark, index, positions, oracle):
    from dpr_spark.query.phrase import span_or_near_search_index

    doc_ids = sorted(oracle.doc_tokens)
    toks0 = oracle.doc_tokens[doc_ids[0]]
    toks1 = oracle.doc_tokens[doc_ids[1]]
    queries = [
        # clause 1 = OR of two real terms, clause 2 = one real term
        (0, [[toks0[1], toks1[2]], [toks0[5]]]),
        # one alternative is OOV -> clause still resolves through the other
        (1, [[toks0[1], "zzzunseen"], [toks0[3]]]),
        # a whole clause OOV -> no rows
        (2, [[toks0[1]], ["zzzunseen"]]),
    ]
    expect = {
        qid: oracle.span_or_near_search(cl, k=20, window=8)
        for qid, cl in queries
    }
    rows = span_or_near_search_index(
        spark, index, positions, queries, window=8, k=20
    ).collect()
    _check_topk(rows, expect, "span_or_near")
    assert not [r for r in rows if r.qid == 2]


def test_span_not_vs_oracle(spark, index, positions, oracle):
    from dpr_spark.query.phrase import span_not_search_index

    doc_ids = sorted(oracle.doc_tokens)
    toks0 = oracle.doc_tokens[doc_ids[0]]
    queries = [
        (0, toks0[1], toks0[2]),       # exclude right next to an include
        (1, toks0[1], "zzzunseen"),    # unresolvable exclude = plain term
        (2, "zzzunseen", toks0[1]),    # unresolvable include = no rows
    ]
    for dist in (0, 3, 10):
        expect = {
            qid: oracle.span_not_search(inc, exc, k=20, dist=dist)
            for qid, inc, exc in queries
        }
        rows = span_not_search_index(
            spark, index, positions, queries, dist=dist, k=20
        ).collect()
        _check_topk(rows, expect, f"span_not_d{dist}")
    assert not [r for r in rows if r.qid == 2]


def _mpp_cases(oracle):
    """match_phrase_prefix cases off real doc slices: take a 2-3 token
    slice and truncate the last token to its first 1-2 chars; plus a
    single-char bare prefix, an OOV head, and a dead prefix."""
    doc_ids = sorted(oracle.doc_tokens)
    out = []
    for i, d in enumerate(doc_ids[:5]):
        toks = oracle.doc_tokens[d]
        if len(toks) >= 6:
            n = 2 + (i % 2)
            start = (5 * i) % (len(toks) - n)
            sl = toks[start : start + n]
            cut = max(1, len(sl[-1]) - 1 - (i % 2))
            out.append(" ".join(sl[:-1] + [sl[-1][:cut]]))
    any_tok = oracle.doc_tokens[doc_ids[0]][0]
    out.append(any_tok[0])  # bare 1-char prefix, no exact head
    out.append(f"zzzunseen {any_tok[0]}")  # OOV head -> no rows
    out.append(f"{any_tok} zzz")  # dead prefix -> no rows
    return list(enumerate(out))


@pytest.mark.parametrize("max_exp", [2, 16])
def test_match_phrase_prefix_vs_oracle(
    spark, index, positions, oracle, max_exp
):
    from dpr_spark.query.phrase import match_phrase_prefix_search_index

    cases = _mpp_cases(oracle)
    expect = {
        qid: oracle.match_phrase_prefix_search(q, 10, max_expansions=max_exp)
        for qid, q in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = match_phrase_prefix_search_index(
        spark, index, positions, cases, max_expansions=max_exp, k=10
    ).collect()
    _check_topk(rows, expect, f"mpp_{max_exp}")


def test_match_phrase_prefix_exact_term_superset(spark, index, positions, oracle):
    """A full-token 'prefix' must rank every exact-phrase match (the
    expansion set contains the exact term, so matches are a superset
    and scores use the max-idf clause contract)."""
    from dpr_spark.query.phrase import match_phrase_prefix_search_index

    doc_ids = sorted(oracle.doc_tokens)
    toks = oracle.doc_tokens[doc_ids[0]]
    phrase = " ".join(toks[:2])
    exact_docs = {d for d, _s in oracle.phrase_search(phrase, 10**9)}
    rows = match_phrase_prefix_search_index(
        spark, index, positions, [(0, phrase)], max_expansions=10**6, k=10**9
    ).collect()
    got_docs = {r.doc_id for r in rows}
    assert exact_docs <= got_docs


@pytest.mark.parametrize("max_exp", [3, 16])
def test_match_bool_prefix_vs_oracle(spark, index, oracle, max_exp):
    from dpr_spark.query.boolquery import match_bool_prefix_search

    cases = _mpp_cases(oracle)  # same shapes; bool semantics differ on
    # the OOV-head and dead-prefix cases (optional clauses still match)
    expect = {
        qid: oracle.match_bool_prefix_search(q, 10, max_expansions=max_exp)
        for qid, q in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    # the OOV-head case must return rows here (unlike match_phrase_prefix)
    oov_qid = next(qid for qid, q in cases if q.startswith("zzzunseen "))
    assert len(expect[oov_qid]) > 0
    rows = match_bool_prefix_search(
        spark, cases, index, max_expansions=max_exp, k=10
    ).collect()
    _check_topk(rows, expect, f"mbp_{max_exp}")


def test_span_within_and_containing(spark):
    """within counts little-term occurrences inside big (a,b) windows;
    containing counts a-anchored windows holding the little term."""
    from dpr_spark.index.build import build_index_from_docs
    from dpr_spark.query.phrase import span_within_search_index

    docs = spark.createDataFrame(
        [
            # a..c..b window: c inside
            (1, "alpha mid core mid beta filler filler filler"),
            # a and b too far apart (>= window)
            (2, "alpha x1 x2 x3 x4 x5 x6 x7 x8 x9 beta core"),
            # window exists but c outside it
            (3, "core x alpha mid beta filler filler filler"),
            # two windows, c in one; second alpha anchors no window
            (4, "alpha core beta filler alpha far far far"),
        ],
        "doc_id long, text string",
    )
    idx = build_index_from_docs(spark, docs, build_blocks=False, build_positional=True)
    q = [(0, "alpha", "beta", "core")]
    win = {
        r.doc_id: r.score
        for r in span_within_search_index(
            spark, idx, idx.positions, q, window=5, mode="within"
        ).collect()
    }
    assert set(win) == {1, 4}
    cont = {
        r.doc_id: r.score
        for r in span_within_search_index(
            spark, idx, idx.positions, q, window=5, mode="containing"
        ).collect()
    }
    assert set(cont) == {1, 4}
    # doc 3: c before the window start -> excluded in both modes
    # doc 2: pair outside the window -> excluded

def test_span_multi_vs_oracle(spark, index, positions, oracle):
    """SpanMultiTermQueryWrapper-in-SpanNear: wildcard clause expands to
    its top-df terms (capped), clause positions = union, clause idf =
    union-df pseudo-term; engine == pure-Python twin including an
    empty-expansion query (no rows) and a cap-binding broad glob."""
    from dpr_spark.query.phrase import span_multi_search_index

    toks = sorted(oracle.postings)
    t0 = toks[0]
    queries = [
        (0, [t0[:2] + "*", toks[-1]]),
        (1, [t0, toks[len(toks) // 2][:3] + "*"]),
        (2, ["?" + t0[1:], toks[1]]),
        (3, ["*", t0]),          # cap-binding: every term matches
        (4, ["zzznope*", t0]),   # empty expansion -> no rows
    ]
    expect = {
        qid: oracle.span_multi_search(cl, k=20, window=8, max_expansions=4)
        for qid, cl in queries
    }
    assert sum(len(v) for v in expect.values()) > 0
    assert not expect[4]
    rows = span_multi_search_index(
        spark, index, positions, queries, window=8, max_expansions=4, k=20
    ).collect()
    _check_topk(rows, expect, "span_multi")


def test_span_multi_literal_only_equals_span_near(spark, index, positions, oracle):
    """With no multi-term clause, span_multi degenerates to span-near
    (same verify fold, idf of a 1-term union = plain idf)."""
    from dpr_spark.query.phrase import (
        span_multi_search_index,
        span_near_search_index,
    )

    phrases = _corpus_phrases(oracle)
    a = sorted(
        map(
            tuple,
            span_multi_search_index(
                spark, index, positions,
                [(qid, p.split()) for qid, p in phrases], window=8, k=30,
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            span_near_search_index(
                spark, index, positions, phrases, window=8, k=30
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def _gap_cases(oracle):
    """Gapped clauses over real doc token slices: (a, gap, b) triples
    where the gap width is exactly the real spacing (matches), too big
    (must NOT match at slop 0), plus an OOV clause."""
    d0 = sorted(oracle.doc_tokens)[0]
    toks = oracle.doc_tokens[d0]
    cases = [
        (0, [(toks[0], 0), (toks[2], 1)]),        # exact one-token gap
        (1, [(toks[0], 0), (toks[1], 0)]),        # adjacent (gap 0)
        (2, [(toks[0], 0), (toks[1], 3)]),        # gap too wide for slop 0
        (3, [(toks[3], 0), (toks[5], 1), (toks[6], 0)]),
        (4, [(toks[0], 0), ("zzzunseen", 2)]),    # OOV -> no rows
    ]
    return cases


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_gap_vs_oracle(spark, index, positions, oracle, slop):
    """Gapped ordered spans (Lucene SpanGapQuery): engine == pure-Python
    twin across slops; the gap enforces minimum spacing AND counts
    toward the width bound."""
    from dpr_spark.query.phrase import span_gap_search_index

    cases = _gap_cases(oracle)
    expect = {qid: oracle.span_gap_search(seq, k=20, slop=slop) for qid, seq in cases}
    assert sum(len(v) for v in expect.values()) > 0
    rows = span_gap_search_index(
        spark, index, positions, cases, slop=slop, k=20
    ).collect()
    _check_topk(rows, expect, f"span_gap_s{slop}")


def test_span_gap_zero_gaps_equals_ordered(spark, index, positions, oracle):
    """All-zero gaps must reproduce span_ordered exactly (same greedy
    contract, same width bound) — the degeneracy that anchors the gap
    semantics to the existing oracle-proven operator."""
    from dpr_spark.query.phrase import (
        span_gap_search_index,
        span_ordered_search_index,
    )

    phrases = [(qid, p) for qid, p in _corpus_phrases(oracle) if " " in p][:4]
    gapped = [
        (qid, [(t, 0) for t in p.split()])
        for qid, p in phrases
    ]
    for slop in (0, 2):
        a = sorted(map(tuple, span_gap_search_index(
            spark, index, positions, gapped, slop=slop, k=30
        ).collect()))
        b = sorted(map(tuple, span_ordered_search_index(
            spark, index, positions, phrases, slop=slop, k=30
        ).collect()))
        assert a == b and len(a) > 0


def test_span_gap_requires_spacing(spark, index, positions, oracle):
    """At slop 0 a gap-g clause pair matches docs where the tokens sit
    EXACTLY g+1 apart — never adjacent occurrences (the minimum-spacing
    rule) and never wider ones (the width bound)."""
    from dpr_spark.query.phrase import span_gap_search_index

    d0 = sorted(oracle.doc_tokens)[0]
    toks = oracle.doc_tokens[d0]
    a, b = toks[0], toks[2]
    rows = span_gap_search_index(
        spark, index, positions, [(0, [(a, 0), (b, 1)])], slop=0, k=1000
    ).collect()
    got = {r.doc_id for r in rows}
    want = set()
    for d, dt in oracle.doc_tokens.items():
        pa = [i for i, t in enumerate(dt) if t == a]
        pb = {i for i, t in enumerate(dt) if t == b}
        if any(p + 2 in pb for p in pa):
            want.add(d)
    assert got == want and d0 in want
