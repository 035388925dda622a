"""Quality classifier (extras/quality_clf.py) vs a pure-Python twin.

The twin reruns the exact fixed-step full-batch logistic GD with
hashlib/math; the Spark pipeline (portable hash family) must agree on
every rounded probability, and the learned model must separate the
in-domain docs from the junk."""

import hashlib
import math
from collections import Counter

import pytest

from dpr_spark.functions.tokenizer import tokenize

B, ETA, STEPS = 512, 2.0, 3

DOCS = [
    (0, "spark window agg over the big table scan", "src0"),
    (1, "fast scan filter pushes to the scan", "src0"),
    (2, "hash merge sort key order by key", "src0"),
    (3, "customer join order join line part", "src0"),
    (4, "buy cheap pills now click here now", "src1"),
    (5, "lorem ipsum dolor sit amet consectetur", "src1"),
    (6, "the the the the the the the the", "src1"),
    (7, "window window spark agg table scan merge", "src1"),
    (8, "zzz qqq xxx yyy www vvv", "src1"),
    (9, "sort key hash join merge scan filter table", "src1"),
    (10, "click buy cheap lorem pills amet", "src2"),
    (11, "spark table scan filter join order", "src2"),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sig(m: float) -> float:
    return 1.0 / (1.0 + math.exp(-m))


def _twin():
    xs = {}
    for doc, text, _src in DOCS:
        toks = tokenize(text)
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bset = set(_h60(g) % B for g in grams)
        if bset:
            xs[doc] = {b: 1.0 for b in bset}
    ys = {d: 1 if s == "src0" else 0 for d, _t, s in DOCS if d in xs}
    n = len(ys)
    w, bias = {}, 0.0
    for _ in range(STEPS):
        margins = {
            d: bias + sum(x * w.get(b, 0.0) for b, x in xd.items())
            for d, xd in xs.items()
        }
        resid = {d: _sig(margins[d]) - ys[d] for d in xs}
        grads = Counter()
        for d, xd in xs.items():
            for b, x in xd.items():
                grads[b] += x * resid[d] / n
        for b, g in grads.items():
            w[b] = w.get(b, 0.0) - ETA * g
        bias -= ETA * (sum(resid.values()) / n)
    probs = {
        d: round(_sig(bias + sum(x * w[b] for b, x in xd.items())), 6)
        for d, xd in xs.items()
    }
    return ys, probs


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t, s) for d, t, s in DOCS], "doc_id long, text string, source string"
    )


def test_probs_match_twin(spark, docs_df):
    from dpr_spark.extras.quality_clf import quality_classifier_scores

    got = {
        r.doc: (r.y, r.prob)
        for r in quality_classifier_scores(
            spark,
            docs_df,
            docs_df.filter("source = 'src0'"),
            buckets=B,
            eta=ETA,
            steps=STEPS,
            portable=True,
        ).collect()
    }
    ys, probs = _twin()
    assert got == {d: (ys[d], probs[d]) for d in ys}


def test_classifier_separates_domains(spark, docs_df):
    from dpr_spark.extras.quality_clf import quality_classifier_scores

    probs = {
        r.doc: r.prob
        for r in quality_classifier_scores(
            spark,
            docs_df,
            docs_df.filter("source = 'src0'"),
            buckets=B,
            eta=ETA,
            steps=STEPS,
            portable=True,
        ).collect()
    }
    in_domain = [probs[d] for d in (0, 1, 2, 3)]
    junk = [probs[d] for d in (4, 5, 8, 10)]
    assert min(in_domain) > max(junk)
    # three GD steps from zero must have moved positives above the prior
    assert all(p > 0.5 for p in in_domain)
