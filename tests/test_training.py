"""Training-mix construction (extras/training.py): exact stratified
sampling and sequence packing vs pure-Python twins."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dpr_spark.extras.training import (
    pack_bins_summary,
    pack_sequences,
    stratified_sample,
)


def _portable_key(doc_id: int, seed: int) -> int:
    return int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _python_sample(rows, fractions, seed):
    import math
    from collections import defaultdict

    by = defaultdict(list)
    for doc_id, lang in rows:
        if lang in fractions:
            by[lang].append(doc_id)
    out = set()
    for lang, ids in by.items():
        quota = math.ceil(len(ids) * fractions[lang])
        ids.sort(key=lambda d: (_portable_key(d, seed), d))
        out.update((lang, d) for d in ids[:quota])
    return out


def test_stratified_sample_matches_python_twin(spark, strata_df):
    fr = {"en": 0.5, "de": 0.25, "fr": 0.1}
    got = {
        (r.lang, r.doc_id)
        for r in stratified_sample(
            strata_df, "lang", fr, seed=7, portable=True
        ).collect()
    }
    rows = [(r.doc_id, r.lang) for r in strata_df.collect()]
    assert got == _python_sample(rows, fr, 7)
    # exact quota per stratum: ceil(100 * f)
    from collections import Counter

    c = Counter(lang for lang, _ in got)
    assert c == {"en": 50, "de": 25, "fr": 10}  # zh dropped: not in the mix


def test_stratified_sample_salted_is_exact(spark, strata_df):
    fr = {"en": 0.37, "de": 0.62}
    plain = stratified_sample(strata_df, "lang", fr, seed=3, portable=True)
    salted = stratified_sample(
        strata_df, "lang", fr, seed=3, portable=True, salt_buckets=5
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_stratified_sample_rejects_bad_fraction(strata_df):
    with pytest.raises(ValueError):
        stratified_sample(strata_df, "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(strata_df, "lang", {})


def test_pack_sequences_matches_python_twin(spark):
    rows = [(i, 5 + (i * 7) % 40) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.shard, r.offset, r.bin)
        for r in pack_sequences(df, seq_len=64, n_shards=4, portable=True).collect()
    }
    # python twin: shard by portable key, cumsum in doc_id order
    from collections import defaultdict

    shards = defaultdict(list)
    for doc_id, nt in rows:
        shards[_portable_key(doc_id, 0) % 4].append((doc_id, nt))
    want = {}
    for s, docs in shards.items():
        off = 0
        for doc_id, nt in sorted(docs):
            want[doc_id] = (s, off, off // 64)
            off += nt
    assert got == want
    # every doc appears exactly once and offsets are stream-contiguous
    assert len(got) == len(rows)


def test_pack_bins_summary(spark):
    df = spark.createDataFrame(
        [(i, 10) for i in range(64)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, seq_len=40, n_shards=2, portable=True)
    summ = pack_bins_summary(packed, seq_len=40)
    rows = {(r.shard, r.bin): (r.n_docs_started, r.first_doc) for r in summ.collect()}
    # 4 docs of 10 tokens start in each 40-token bin, except the tail
    # bin of each shard (the hash split of 64 docs is not exactly even)
    last_bin = {}
    for s, b in rows:
        last_bin[s] = max(last_bin.get(s, -1), b)
    for (s, b), (n, _) in rows.items():
        assert n == 4 or (b == last_bin[s] and 1 <= n <= 4)
    total_docs = sum(n for n, _ in rows.values())
    assert total_docs == 64


def test_pack_sequences_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0, n_shards=4)
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=64, n_shards=0)
