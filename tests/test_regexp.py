"""Regexp queries (query/boolquery.py regexp_search): literal-prefix
extraction, rank identity vs the oracle twin, pushed-prefix plan, and
the unsupported-construct gate."""

import pytest


def test_regex_literal_prefix():
    from dpr_spark.query.boolquery import regex_literal_prefix

    assert regex_literal_prefix("spark.*") == "spark"
    assert regex_literal_prefix("spark") == "spark"
    assert regex_literal_prefix("spa?rk") == "sp"  # 'a' optional
    assert regex_literal_prefix("spar*k") == "spa"  # 'r' optional
    assert regex_literal_prefix("spark{0,2}") == "spar"
    assert regex_literal_prefix("sp[aeiou]rk") == "sp"
    assert regex_literal_prefix("spark+") == "spark"  # + requires one
    assert regex_literal_prefix(r"a\.b") == "a.b"  # escaped literal
    assert regex_literal_prefix("(ab|cd)x") == ""  # alternation first
    assert regex_literal_prefix(".*ing") == ""
    assert regex_literal_prefix("WIN.*") == "win"


def _vocab_prefixes(pages_pdf, n=4):
    from dpr_spark.functions.tokenizer import tokenize

    terms = sorted({t for text in pages_pdf.text for t in tokenize(text) if t.isalpha()})
    # a few real 2-char prefixes so patterns genuinely match terms
    seen = []
    for t in terms:
        if len(t) >= 4 and t[:2] not in seen:
            seen.append(t[:2])
        if len(seen) >= n:
            break
    return seen


def test_regexp_rank_identity(spark, index, pages_pdf, oracle):
    from dpr_spark.query.boolquery import regexp_search

    p = _vocab_prefixes(pages_pdf)
    patterns = [
        (0, f"{p[0]}.*"),                 # prefix-prunable
        (1, f"{p[1]}[a-z]+"),             # char class
        (2, f"{p[2]}.*|{p[3]}.*"),        # alternation (no global prefix)
        (3, f"{p[0]}[a-z]?[a-z]*s"),      # quantifiers + required suffix
        (4, "zzz[0-9]+nope"),             # matches nothing
    ]
    got = {}
    for r in regexp_search(spark, patterns, index, k=10, max_expansions=8).collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id, round(r.score, 9)))
    for qid, pat in patterns:
        expect = [
            (i + 1, d, round(s, 9))
            for i, (d, s) in enumerate(oracle.regexp_search(pat, 10, max_expansions=8))
        ]
        assert sorted(got.get(qid, [])) == expect, f"qid={qid} pat={pat}"
    assert got  # at least one pattern matched


def test_regexp_prefix_pushes_to_dictionary_scan(spark, index, tmp_path):
    from dpr_spark.index.build import InvertedIndex
    from dpr_spark.query.boolquery import regexp_search

    path = str(tmp_path / "stored")
    index.save(path)
    stored = InvertedIndex.load(spark, path)
    plan = regexp_search(
        spark, [(0, "wo.*"), (1, "wi[a-z]+")], stored, k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(term,w" in plan, plan


def test_regexp_rejects_unsupported(spark, index):
    from dpr_spark.query.boolquery import regexp_search

    with pytest.raises(ValueError, match="lookaround"):
        regexp_search(spark, [(0, "spa(?=rk)")], index)
    with pytest.raises(Exception):
        regexp_search(spark, [(0, "spa(rk")], index)  # malformed
