"""DSIR importance resampling (extras/dsir.py) vs a pure-Python twin.

The twin recomputes hashed n-gram features, add-λ bucket models, log
importance weights, and the Gumbel top-k draw with hashlib/math — the
Spark pipeline (portable hash family) must agree on every rounded
weight, key, and on the selected ranking itself.
"""

import hashlib
import math
from collections import Counter

import pytest

from dpr_spark.functions.tokenizer import tokenize

B, LAM, K, SEED = 512, 0.5, 20, 7

DOCS = [
    # target-ish docs: query/index vocabulary
    (0, "spark window agg over the big table scan", "src0"),
    (1, "fast scan filter pushes to the scan", "src0"),
    (2, "hash merge sort key order by key", "src0"),
    (3, "customer join order join line part", "src0"),
    # off-domain docs: crawl noise
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


def _twin():
    feats = {}
    for doc, text, _src in DOCS:
        toks = tokenize(text)
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        c = Counter(_h60(g) % B for g in grams)
        if c:
            feats[doc] = c
    raw, tgt = Counter(), Counter()
    target_ids = {d for d, _t, s in DOCS if s == "src0"}
    for d, c in feats.items():
        raw.update(c)
        if d in target_ids:
            tgt.update(c)
    tt, tq = sum(tgt.values()), sum(raw.values())
    rows = {}
    for d, c in feats.items():
        logw = sum(
            cnt
            * (
                math.log((tgt.get(b, 0) + LAM) / (tt + LAM * B))
                - math.log((raw[b] + LAM) / (tq + LAM * B))
            )
            for b, cnt in c.items()
        )
        u = (_h60(f"{d}:{SEED}") + 0.5) / 2**60
        key = logw - math.log(-math.log(u))
        rows[d] = (round(logw, 6), round(key, 6))
    sel = sorted(rows.items(), key=lambda kv: (-kv[1][1], kv[0]))[:K]
    ranked = [(i + 1, d, lw, ky) for i, (d, (lw, ky)) in enumerate(sel)]
    return rows, ranked


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t, s) for d, t, s in DOCS], "doc_id long, text string, source string"
    )


def test_log_weights_match_twin(spark, docs_df):
    from dpr_spark.extras.dsir import dsir_log_weights

    got = {
        r.doc: round(r.logw, 6)
        for r in dsir_log_weights(
            docs_df,
            docs_df.filter("source = 'src0'"),
            buckets=B,
            lam=LAM,
            portable=True,
        ).collect()
    }
    rows, _ = _twin()
    assert got == {d: lw for d, (lw, _k) in rows.items()}


def test_resample_matches_twin(spark, docs_df):
    from dpr_spark.extras.dsir import dsir_resample

    got = [
        (r.rank, r.doc, r.logw, r.key)
        for r in dsir_resample(
            docs_df,
            docs_df.filter("source = 'src0'"),
            k=K,
            seed=SEED,
            buckets=B,
            lam=LAM,
            portable=True,
        )
        .orderBy("rank")
        .collect()
    ]
    _, ranked = _twin()
    assert got == ranked
    assert [r[0] for r in got] == list(range(1, len(got) + 1))


def test_weights_prefer_target_domain(spark, docs_df):
    """In-domain docs must average a higher importance weight than the
    deliberately off-domain junk — the property DSIR exists for."""
    from dpr_spark.extras.dsir import dsir_log_weights

    w = {
        r.doc: r.logw
        for r in dsir_log_weights(
            docs_df,
            docs_df.filter("source = 'src0'"),
            buckets=B,
            lam=LAM,
            portable=True,
        ).collect()
    }
    in_domain = [w[d] for d in (0, 1, 2, 3)]
    junk = [w[d] for d in (4, 5, 8, 10)]
    assert min(in_domain) > max(junk)


def test_default_hash_same_selection_properties(spark, docs_df):
    """The fast xxhash64 bucket family is not oracle-replayable but must
    still produce k ranked rows and finite weights."""
    from dpr_spark.extras.dsir import dsir_resample

    rows = (
        dsir_resample(
            docs_df,
            docs_df.filter("source = 'src0'"),
            k=5,
            seed=SEED,
            buckets=B,
            lam=LAM,
        )
        .orderBy("rank")
        .collect()
    )
    assert len(rows) == 5
    assert all(math.isfinite(r.key) and math.isfinite(r.logw) for r in rows)
