"""Fuzzy (edit-distance) queries vs the pure-Python oracle twin
(Lucene FuzzyQuery parity; dpr_spark/query/fuzzy.py)."""

import pytest


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


def _misspell(term: str, i: int) -> str:
    """One deterministic edit: substitute, insert, or delete at position i."""
    mode = i % 3
    p = i % max(1, len(term))
    if mode == 0:
        return term[:p] + ("x" if term[p] != "x" else "y") + term[p + 1 :]
    if mode == 1:
        return term[:p] + "z" + term[p:]
    return term[:p] + term[p + 1 :] if len(term) > 2 else term + "q"


def _fuzzy_cases(oracle):
    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    cases = [
        (0, _misspell(terms[0], 0)),                      # head term, 1 sub
        (1, _misspell(terms[3], 1)),                      # insert
        (2, _misspell(terms[5], 2)),                      # delete
        (3, terms[1]),                                    # exact (dist 0)
        (4, f"{_misspell(terms[2], 0)} {terms[4]}"),      # multi-clause
        (5, "zzzzzzzzzzzz"),                              # far from everything
    ]
    return cases


def test_levenshtein_twin_matches_spark(spark):
    """The oracle's thresholded edit distance == Spark's levenshtein."""
    from pyspark.sql import functions as F

    from dpr_spark.oracle.bm25 import _levenshtein

    pairs = [
        ("kitten", "sitting"), ("abc", "abc"), ("abc", "abd"), ("a", ""),
        ("abcd", "abdc"), ("spark", "spank"), ("spark", "sparkle"),
        ("table", "tale"), ("zü", "zu"),
    ]
    for thr in (1, 2, 3):
        df = spark.createDataFrame(pairs, "a string, b string").select(
            "a", "b", F.levenshtein("a", "b", thr).alias("d")
        )
        for r in df.collect():
            assert r.d == _levenshtein(r.a, r.b, thr), (r.a, r.b, thr)


@pytest.mark.parametrize(
    "max_edits,max_expansions,prefix_len", [(1, 8, 0), (2, 4, 0), (1, 8, 1)]
)
def test_fuzzy_search_vs_oracle(
    spark, index, oracle, max_edits, max_expansions, prefix_len
):
    from dpr_spark.query.fuzzy import fuzzy_search

    cases = _fuzzy_cases(oracle)
    expect = {
        qid: oracle.fuzzy_search(
            q, k=15, max_edits=max_edits,
            max_expansions=max_expansions, prefix_len=prefix_len,
        )
        for qid, q in cases
    }
    assert sum(len(v) for v in expect.values()) > 0
    rows = fuzzy_search(
        spark, cases, index, k=15, max_edits=max_edits,
        max_expansions=max_expansions, prefix_len=prefix_len,
    ).collect()
    _check_topk(rows, expect, f"fuzzy_e{max_edits}_x{max_expansions}_p{prefix_len}")


def test_spell_suggest_vs_oracle(spark, index, oracle):
    from dpr_spark.query.fuzzy import spell_suggest

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    # mutate past position 0: prefix_len=1 pruning requires a shared
    # first letter (the standard spell-check trade, tested as such)
    t_long = next(t for t in terms if len(t) >= 5)
    q0 = f"{t_long[:2]}z{t_long[2:]} {terms[1]}"  # mid-word insert + known
    q1 = _misspell(terms[6], 1)
    q2 = terms[2]                                  # in-vocab -> no rows
    cases = [(0, q0), (1, q1), (2, q2)]
    rows = spell_suggest(spark, cases, index, n_suggestions=3).collect()
    got = {}
    for r in rows:
        got.setdefault((r.qid, r.clause), []).append((r.rank, r.suggestion, r.df))
    for v in got.values():
        v.sort()
    expect = {}
    for qid, q in cases:
        for clause, sugg in oracle.spell_suggest(q, n_suggestions=3).items():
            if sugg:
                expect[(qid, clause)] = sugg
    assert got == expect
    assert any(qid == 0 for qid, _c in got)  # the misspelling got suggestions
    assert all(qid != 2 for qid, _c in got)  # in-vocab token produced none


def test_fuzzy_exact_term_includes_plain_bm25(spark, index, oracle):
    """dist-0 expansion has boost 1.0, so an exact single-term query's
    fuzzy score >= its plain BM25 score on every returned doc."""
    from dpr_spark.query.fuzzy import fuzzy_search

    term = sorted(oracle.df, key=lambda t: -oracle.df[t])[0]
    rows = fuzzy_search(spark, [(0, term)], index, k=10).collect()
    assert rows
    plain = dict(oracle.search(term, k=oracle.N))
    for r in rows:
        assert r.score >= plain.get(r.doc_id, 0.0) - 1e-9


def test_damerau_distance_matches_duckdb():
    """damerau_distance implements DuckDB's damerau_levenshtein exactly
    (unrestricted DL — the oracle twin swaps one SQL function name)."""
    import random

    import duckdb

    from dpr_spark.query.fuzzy import damerau_distance

    rng = random.Random(42)
    alpha = "abcde"
    pairs = [("CA", "ABC"), ("ab", "ba"), ("sprak", "spark"), ("", "xy")]
    for _ in range(200):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 8)))
        pairs.append((a, b))
    con = duckdb.connect()
    for a, b in pairs:
        want = con.sql(
            "select damerau_levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert damerau_distance(a, b) == want, (a, b)


def test_fuzzy_transpositions_reach_swaps(spark, index, oracle):
    """An adjacent-swap typo is 1 edit with transpositions=True (Lucene's
    default) and 2 without: the swap term expands at max_edits=1 only in
    transposition mode, and exact-term queries are mode-invariant."""
    from dpr_spark.query.fuzzy import expand_fuzzy, fuzzy_search

    term = next(
        t for t in sorted(oracle.df, key=lambda x: -oracle.df[x])
        if len(t) >= 4 and any(a != b for a, b in zip(t, t[1:]))
    )
    i = next(j for j in range(len(term) - 1) if term[j] != term[j + 1])
    swap = term[:i] + term[i + 1] + term[i] + term[i + 2:]
    cdf = spark.createDataFrame([(0, swap)], "qid long, clause string")
    with_t = expand_fuzzy(index, cdf, max_edits=1, transpositions=True).collect()
    without = expand_fuzzy(index, cdf, max_edits=1).collect()
    assert any(r.term == term and r.dist == 1 for r in with_t), (term, swap)
    assert all(r.term != term for r in without)
    # mode-invariance on an exact in-vocabulary query
    a = fuzzy_search(spark, [(0, term)], index, k=10).collect()
    b = fuzzy_search(spark, [(0, term)], index, k=10, transpositions=True).collect()
    key = lambda r: (r.qid, r.rank, r.doc_id, round(r.score, 9))
    assert sorted(map(key, a)) == sorted(map(key, b))


@pytest.mark.parametrize("mode", ["popular", "always"])
def test_spell_suggest_modes_vs_oracle(spark, index, oracle, mode):
    """ES term-suggester suggest_mode: popular (suggestion df must
    exceed the input token's df) and always (every token, self
    excluded)."""
    from dpr_spark.query.fuzzy import spell_suggest

    terms = sorted(oracle.df, key=lambda t: -oracle.df[t])
    t_long = next(t for t in terms if len(t) >= 5)
    # mix: a misspelling (OOV), a mid-df in-vocab term (popular should
    # suggest higher-df neighbours only), and a head term (popular
    # should usually suggest nothing)
    cases = [
        (0, f"{t_long[:2]}z{t_long[2:]}"),
        (1, terms[len(terms) // 2]),
        (2, terms[0]),
    ]
    rows = spell_suggest(
        spark, cases, index, n_suggestions=3, suggest_mode=mode
    ).collect()
    got = {}
    for r in rows:
        got.setdefault((r.qid, r.clause), []).append(
            (r.rank, r.suggestion, r.df)
        )
    for v in got.values():
        v.sort()
    expect = {}
    for qid, q in cases:
        for clause, sugg in oracle.spell_suggest(
            q, n_suggestions=3, suggest_mode=mode
        ).items():
            if sugg:
                expect[(qid, clause)] = sugg
    assert got == expect
    # always-mode must produce suggestions for the in-vocab tokens
    if mode == "always":
        assert any(qid in (1, 2) for qid, _c in got)
    # no clause ever suggests itself, and popular respects the df bar
    for (qid, clause), sugg in got.items():
        assert all(s != clause for _r, s, _d in sugg)
        if mode == "popular":
            bar = oracle.df.get(clause, 0)
            assert all(d > bar for _r, _s, d in sugg)
