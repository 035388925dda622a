"""ExactSubstr dedup (extras/substrdedup.py) vs a brute-force twin.

The twin enumerates every length-L window literally, counts repeats,
unions coverage, and cuts spans with plain Python string slicing — the
definition, with none of the plan's fingerprinting or folds."""

import pytest
from pyspark.sql import functions as F

from dpr_spark.extras.substrdedup import (
    duplicate_spans,
    duplicate_window_positions,
    exact_substr_dedup,
)


def brute_force(rows, L):
    """rows: [(doc_id, text)] -> (dup_positions, spans, cleaned)."""
    from collections import Counter

    counts = Counter()
    for _d, t in rows:
        for p in range(len(t) - L + 1):
            counts[t[p : p + L]] += 1
    dup_pos = {}
    for d, t in rows:
        ps = [
            p
            for p in range(len(t) - L + 1)
            if counts[t[p : p + L]] > 1
        ]
        if ps:
            dup_pos[d] = ps
    spans = {}
    for d, ps in dup_pos.items():
        merged = []
        for p in ps:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + L)
            else:
                merged.append([p, p + L])
        spans[d] = [tuple(m) for m in merged]
    cleaned = {}
    for d, t in rows:
        out, cur = [], 0
        for s, e in spans.get(d, []):
            out.append(t[cur:s])
            cur = e
        out.append(t[cur:])
        cleaned[d] = "".join(out)
    return dup_pos, spans, cleaned


CORPUS = [
    # docs 1 and 2 share a 30-char run at different offsets
    (1, "aaaa THE SHARED DUPLICATED RUN X zzzz unique tail one"),
    (2, "prefix two THE SHARED DUPLICATED RUN X and a different end"),
    # doc 3 repeats a window WITHIN itself
    (3, "repeat me repeat me repeat me!"),
    # doc 4 is all-unique
    (4, "completely original text with no twin anywhere at all"),
    # doc 5 shorter than L
    (5, "tiny"),
    # doc 6 duplicates doc 1 entirely (whole-text removal on both)
    (6, "aaaa THE SHARED DUPLICATED RUN X zzzz unique tail one"),
]


@pytest.mark.parametrize("L", [8, 12, 20])
def test_matches_brute_force(spark, L):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    exp_pos, exp_spans, exp_clean = brute_force(CORPUS, L)

    got_pos = {
        (r.doc_id, r.pos)
        for r in duplicate_window_positions(df, L).collect()
    }
    assert got_pos == {
        (d, p) for d, ps in exp_pos.items() for p in ps
    }

    got_spans = {}
    for r in duplicate_spans(df, L).collect():
        got_spans.setdefault(r.doc_id, []).append((r.start, r.end))
    got_spans = {d: sorted(v) for d, v in got_spans.items()}
    assert got_spans == exp_spans

    got_clean = {
        r.doc_id: (r.clean_text, r.removed_chars)
        for r in exact_substr_dedup(df, L).collect()
    }
    assert set(got_clean) == {d for d, _ in CORPUS}
    for d, t in CORPUS:
        ct, rc = got_clean[d]
        assert ct == exp_clean[d], (d, L)
        assert rc == len(t) - len(exp_clean[d])


def test_whole_doc_removed(spark):
    # identical docs: every char covered -> clean_text == ""
    df = spark.createDataFrame(
        [(1, "x" * 40), (2, "x" * 40)], "doc_id long, text string"
    )
    out = {r.doc_id: r.clean_text for r in exact_substr_dedup(df, 10).collect()}
    assert out == {1: "", 2: ""}


def test_no_duplicates_is_identity(spark):
    texts = [
        "alpha beta gamma delta epsilon",
        "zeta eta theta iota kappa",
        "lambda mu nu xi omicron pi",
        "rho sigma tau upsilon phi",
        "chi psi omega aleph bet",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.clean_text, r.removed_chars) for r in exact_substr_dedup(df, 12).collect()}
    for i, t in rows:
        assert out[i] == (t, 0)


def test_guarantee_no_long_dup_survives(spark):
    """Lee et al. invariant: after removal, no verbatim duplicated run of
    >= 2L-1 chars remains (on the ORIGINAL duplicate set; removal can
    create new adjacencies, which the method re-runs for)."""
    L = 10
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    cleaned = [
        (r.doc_id, r.clean_text) for r in exact_substr_dedup(df, L).collect()
    ]
    orig = dict(CORPUS)
    # any surviving window of the ORIGINAL text that was duplicated must
    # be gone from the cleaned text
    from collections import Counter

    counts = Counter()
    for _d, t in CORPUS:
        for p in range(len(t) - L + 1):
            counts[t[p : p + L]] += 1
    for d, ct in cleaned:
        for p in range(len(orig[d]) - L + 1):
            w = orig[d][p : p + L]
            if counts[w] > 1:
                assert w not in ct, (d, w)


def test_plan_shape(spark):
    """Window enumeration must be a Generate feeding the key shuffle —
    no Python (BatchEvalPython / ArrowEvalPython) anywhere."""
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = duplicate_spans(df, 10)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    assert "EvalPython" not in plan
