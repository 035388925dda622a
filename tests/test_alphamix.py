"""alpha_mix_targets / alpha_mix_sample (extras/training.py) vs brute force."""

from dpr_spark.extras.training import alpha_mix_sample, alpha_mix_targets


def brute_targets(counts, alpha, total):
    """counts: {stratum: n} -> {stratum: target} (largest remainder in
    integer micro-units, ties by stratum, capped at n)."""
    wu = {s: round((n ** alpha) * 1e6) for s, n in counts.items()}
    W = sum(wu.values())
    base = {s: (total * w) // W for s, w in wu.items()}
    rem = {s: total * wu[s] - base[s] * W for s in wu}
    leftover = total - sum(base.values())
    order = sorted(wu, key=lambda s: (-rem[s], s))
    tgt = dict(base)
    for s in order[:leftover]:
        tgt[s] += 1
    return {s: min(t, counts[s]) for s, t in tgt.items()}


def test_targets_match_brute(spark):
    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    rows = [(f"{s}{i}", s) for s, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    got = {
        r.lang: r.target
        for r in alpha_mix_targets(df, "lang", 0.5, 150).collect()
    }
    assert got == brute_targets(counts, 0.5, 150)
    assert sum(got.values()) == 150


def test_targets_sum_exact_and_capped(spark):
    # tiny stratum gets capped; sum may then fall short (documented)
    counts = {"big": 1000, "tiny": 2}
    rows = [(f"{s}{i}", s) for s, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    got = {
        r.lang: r.target
        for r in alpha_mix_targets(df, "lang", 0.3, 500).collect()
    }
    assert got == brute_targets(counts, 0.3, 500)
    assert got["tiny"] == 2  # capped at n


def test_sample_meets_targets_and_is_deterministic(spark):
    counts = {"en": 50, "fr": 10, "de": 20}
    rows = [(f"{s}{i}", s) for s, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    tgt = {
        r.lang: r.target
        for r in alpha_mix_targets(df, "lang", 0.5, 40).collect()
    }
    a = alpha_mix_sample(df, "lang", 0.5, 40, seed=3).collect()
    b = alpha_mix_sample(
        df.repartition(9, "doc_id"), "lang", 0.5, 40, seed=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_lang = {}
    for r in a:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang == tgt
    # a different seed picks a different subset of the same sizes
    c = alpha_mix_sample(df, "lang", 0.5, 40, seed=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
