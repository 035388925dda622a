"""Distributed BPE tokenizer training (extras/bpe.py) vs the
pure-Python Sennrich reference twin: merge-sequence identity, encode
replay, lossless reconstruction, and the left-to-right overlap rule."""

import pytest

from dpr_spark.extras.bpe import (
    END,
    bpe_encode,
    bpe_train,
    bpe_train_local,
    encode_word,
    initial_pair_counts,
    word_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    from dpr_spark.fixtures.corpus import gen_pages_pdf

    pages = gen_pages_pdf(120, seed=11)
    return spark.createDataFrame(pages).selectExpr(
        "url AS doc_id", "text"
    )


@pytest.fixture(scope="module")
def wc_dict(docs):
    return {r.word: r.cnt for r in word_counts(docs).collect()}


def test_merge_sequence_matches_local_twin(spark, docs, wc_dict):
    m_spark = bpe_train(spark, docs, num_merges=25)
    m_local = bpe_train_local(wc_dict, num_merges=25)
    assert len(m_spark) == 25
    assert m_spark == m_local


def test_initial_pair_counts_match_local(spark, docs, wc_dict):
    got = {
        (r["left"], r["right"]): r.cnt
        for r in initial_pair_counts(word_counts(docs)).collect()
    }
    want = {}
    for w, c in wc_dict.items():
        syms = list(w) + [END]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            want[p] = want.get(p, 0) + c
    assert got == want


def test_encode_replays_training_order(wc_dict):
    """Lowest-rank-first encoding == replaying merges in training
    order, word by word (the standard BPE equivalence)."""
    merges = bpe_train_local(wc_dict, num_merges=30)
    ranks = {(l, r): s for s, l, r, _ in merges}
    for word in sorted(wc_dict):
        syms = list(word) + [END]
        for _, left, right, _ in merges:
            res = []
            for x in syms:
                if res and res[-1] == left and x == right:
                    res[-1] = left + right
                else:
                    res.append(x)
            syms = res
        assert encode_word(word, ranks) == syms, word


def test_overlap_resolves_left_to_right():
    merges = bpe_train_local({"aaa": 5, "aab": 2}, num_merges=1)
    # pair (a,a) counts 5*2 + 2 = 12: two overlapping occurrences in
    # 'aaa' but left-to-right gives (aa)(a), never a(aa)
    assert merges[0][1:3] == ("a", "a")
    assert encode_word("aaa", {("a", "a"): 1}) == ["aa", "a", END]


def test_spark_encode_lossless(spark, docs):
    from dpr_spark.functions.tokenizer import tokenize

    merges = bpe_train(spark, docs, num_merges=15)
    enc = {
        r.doc_id: list(r.subwords)
        for r in bpe_encode(docs, merges).collect()
    }
    for r in docs.collect():
        toks = tokenize(r.text)
        want = "".join(t + END for t in toks)
        assert "".join(enc[r.doc_id]) == want
        # every subword boundary respects word boundaries: the count of
        # END markers equals the token count
        assert sum(s.endswith(END) for s in enc[r.doc_id]) == len(toks)


def test_early_stop_on_min_count(spark):
    d = spark.createDataFrame([(0, "ab ab xy")], "doc_id long, text string")
    merges = bpe_train(spark, d, num_merges=50, min_pair_count=2)
    # pairs with count >= 2: (a,b)x2 -> 'ab', then (ab,</w>)x2; the xy
    # word never produces a pair with count 2
    assert [(l, r) for _, l, r, _ in merges] == [("a", "b"), ("ab", END)]


def test_resumable_extends_and_resumes(spark, docs, wc_dict, tmp_path):
    from dpr_spark.extras.bpe import bpe_train_resumable

    want = bpe_train_local(wc_dict, num_merges=14)
    wd = str(tmp_path / "bpe_work")
    # first run stops at 7 with a checkpoint window of 4: state on disk
    # is ckpt@4 + 7 logged merges (a crash mid-window looks the same)
    first = bpe_train_resumable(
        spark, docs, wd, num_merges=7, checkpoint_every=4
    )
    assert first == want[:7]
    # second run replays merges 5-7 from ckpt@4 and extends to 14
    second = bpe_train_resumable(
        spark, docs, wd, num_merges=14, checkpoint_every=4
    )
    assert second == want
    # idempotent re-run: nothing recomputed, same answer
    assert bpe_train_resumable(spark, docs, wd, num_merges=14) == want
