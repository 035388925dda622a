"""MMR diversified reranking (extras/ann.py::mmr_rerank) vs a
pure-Python twin, across lambdas; plus the diversity property itself."""

import numpy as np
import pytest


def _twin(ids, rel, V, k, lam, decimals=None):
    ids = np.asarray(ids, np.int64)
    order = np.argsort(ids)
    ids, rel, V = ids[order], np.asarray(rel, float)[order], np.asarray(V, float)[order]
    nrm = np.linalg.norm(V, axis=1)
    nrm[nrm == 0] = 1.0
    sims = (V @ V.T) / np.outer(nrm, nrm)
    if decimals is not None:
        rel = np.round(rel, decimals)
        sims = np.round(sims, decimals)
    out, remaining, maxsim = [], set(range(len(ids))), np.full(len(ids), -np.inf)
    for step in range(min(k, len(ids))):
        best, bu = None, None
        for i in sorted(remaining):
            u = lam * rel[i] if step == 0 else lam * rel[i] - (1 - lam) * maxsim[i]
            if bu is None or u > bu:
                best, bu = i, u
        out.append((step + 1, int(ids[best]), float(bu)))
        remaining.discard(best)
        maxsim = np.maximum(maxsim, sims[:, best])
    return out


@pytest.fixture(scope="module")
def cand_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for qid in range(6):
        n = 15 + qid
        V = rng.normal(size=(n, 8))
        # plant near-duplicates: half the candidates are tiny jitters of
        # the top vector, so pure-relevance top-k would be redundant
        V[1 : n // 2] = V[0] + 0.01 * rng.normal(size=(n // 2 - 1, 8))
        rel = np.sort(rng.random(n))[::-1]
        for i in range(n):
            rows.append((qid, i + 100, float(rel[i]), [float(x) for x in V[i]]))
    return (
        spark.createDataFrame(
            rows, "qid long, id long, rel double, v array<double>"
        ),
        rows,
    )


@pytest.mark.parametrize("lam", [0.3, 0.7, 1.0])
def test_mmr_matches_twin(spark, cand_df, lam):
    from dpr_spark.extras.ann import mmr_rerank

    df, rows = cand_df
    got = {}
    for r in mmr_rerank(df, k=5, lam=lam).collect():
        got.setdefault(r.qid, []).append((r.step, r.id, r.util))
    for v in got.values():
        v.sort()
    for qid in range(6):
        sub = [r for r in rows if r[0] == qid]
        want = _twin(
            [r[1] for r in sub], [r[2] for r in sub],
            np.array([r[3] for r in sub]), 5, lam,
        )
        assert [(s, i) for s, i, _ in got[qid]] == [(s, i) for s, i, _ in want]
        for (_, _, u), (_, _, wu) in zip(got[qid], want):
            assert u == pytest.approx(wu, abs=1e-12)


def test_lambda_one_is_pure_relevance(spark, cand_df):
    from dpr_spark.extras.ann import mmr_rerank

    df, rows = cand_df
    got = {}
    for r in mmr_rerank(df, k=5, lam=1.0).collect():
        got.setdefault(r.qid, []).append((r.step, r.id))
    for qid, sel in got.items():
        sel.sort()
        sub = sorted(
            (r for r in rows if r[0] == qid), key=lambda r: (-r[2], r[1])
        )
        assert [i for _, i in sel] == [r[1] for r in sub[:5]]


def test_diversity_beats_relevance_ranking(spark, cand_df):
    """With planted near-duplicates, MMR (lam=0.5) must select fewer
    duplicates of the seed than pure relevance does."""
    from dpr_spark.extras.ann import mmr_rerank

    df, rows = cand_df
    sel = {}
    for r in mmr_rerank(df, k=5, lam=0.5).collect():
        sel.setdefault(r.qid, set()).add(r.id)
    for qid in range(6):
        n = 15 + qid
        dup_ids = {i + 100 for i in range(1, n // 2)}  # the jitter clones
        mmr_dups = len(sel[qid] & dup_ids)
        # pure relevance would take the top-5 rel, which are ids 100..104
        # (rel sorted desc) — at least 3 of them are clones
        assert mmr_dups <= 1, (qid, sel[qid])


def test_micro_mode_matches_float_selection(spark, cand_df):
    """Integer micro-units (the cross-engine-exact path): same selected
    ids/steps as the float path at lam = 7/10 on generic inputs, utils
    exactly 7*rel_i - 3*maxsim_i."""
    from dpr_spark.extras.ann import mmr_rerank

    df, _ = cand_df
    fsel = {}
    for r in mmr_rerank(df, k=5, lam=0.7).collect():
        fsel.setdefault(r.qid, []).append((r.step, r.id))
    isel = {}
    utypes = set()
    for r in mmr_rerank(df, k=5, micro_lam=(7, 10)).collect():
        isel.setdefault(r.qid, []).append((r.step, r.id))
        utypes.add(type(r.util))
    assert utypes == {int}
    for q in fsel:
        assert sorted(fsel[q]) == sorted(isel[q])
