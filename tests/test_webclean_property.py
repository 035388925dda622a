"""Hypothesis property tests for extras/webclean.py: randomized inputs
against naive pure-Python twins (repetition stats, URL canonicalization,
PII counts). Each example runs ONE Spark job over a batch of generated
rows, so example counts stay low while shrinkage still isolates a
minimal failing input."""

import collections
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["a", "bb", "ccc", "dd"]

text_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=4),
    min_size=1,
    max_size=6,
).map(lambda lines: "\n".join(" ".join(ln) for ln in lines))


def _py_repetition(text):
    lines = text.split("\n")
    lc = collections.Counter(lines)
    n_lines = len(lines)
    dupn = sum(c for c in lc.values() if c > 1)
    line_chars = sum(len(ln) for ln in lines)
    dupc = sum(c * len(ln) for ln, c in lc.items() if c > 1)
    toks = re.findall(r"[a-z0-9]+", text.lower())
    denom = max(1, len(" ".join(toks)))
    out = {
        "n_lines": n_lines,
        "dup_line_frac": dupn / max(1, n_lines),
        "dup_line_char_frac": dupc / max(1, line_chars),
    }
    for n in (2, 3, 4):
        grams = collections.Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        if grams:
            best_cnt = max(grams.values())
            best_len = max(len(g) for g, c in grams.items() if c == best_cnt)
            out[f"top{n}gram_char_frac"] = best_cnt * best_len / denom
        else:
            out[f"top{n}gram_char_frac"] = 0.0
        if n in (2, 3):
            out[f"dup{n}gram_char_frac"] = (
                sum(c * len(g) for g, c in grams.items() if c > 1) / denom
            )
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(text_strategy, min_size=1, max_size=6))
def test_repetition_stats_matches_python_twin(spark, texts):
    from dpr_spark.extras.webclean import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc: r.asDict() for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        exp = _py_repetition(t)
        for k, v in exp.items():
            assert abs(got[i][k] - v) < 1e-6, (k, t, got[i][k], v)


def _py_canon(u):
    c = u.lower()
    c = re.sub(r"#.*$", "", c)
    c = re.sub(r"^https?://", "", c)
    c = re.sub(r"^www\.", "", c)
    c = re.sub(r"(utm_[a-z0-9]+|fbclid|gclid)=[^&#]*&?", "", c)
    c = re.sub(r"[?&]+$", "", c)
    c = re.sub(r"/+$", "", c)
    return c


url_strategy = st.builds(
    lambda scheme, www, host, segs, params, frag, slash: (
        scheme
        + www
        + host
        + ("/" + "/".join(segs) if segs else "")
        + slash
        + ("?" + "&".join(f"{k}={v}" for k, v in params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["https://", "http://", ""]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.sampled_from(["Example.com", "test.org"]),
    segs=st.lists(st.sampled_from(["a", "P2", "x"]), max_size=3),
    params=st.lists(
        st.sampled_from(
            [("utm_source", "x"), ("utm_a9", "y"), ("gclid", "z"),
             ("fbclid", "f"), ("ref", "1"), ("id", "22")]
        ),
        max_size=4,
    ),
    frag=st.sampled_from(["", "#frag", "#a?utm_b=1"]),
    slash=st.sampled_from(["", "/"]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(url_strategy, min_size=1, max_size=20))
def test_canonical_url_matches_python_twin(spark, urls):
    from dpr_spark.extras.webclean import canonical_url

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    got = {r.i: r.c for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == _py_canon(u), u


pii_piece = st.sampled_from(
    [
        "plain words here",
        "user.name@mail.example.com",
        "a@b.co",
        "10.0.0.1",
        "255.1.2.33",
        "555-010-1234",
        "+123 456 7890",
        "not.an.ip.really",
        "almost@nodot",
    ]
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(st.lists(pii_piece, min_size=1, max_size=5).map(" ".join),
                      min_size=1, max_size=10))
def test_pii_counts_match_python_twin(spark, texts):
    from dpr_spark.extras.webclean import EMAIL_RX, IPV4_RX, PHONE_RX, pii_redact

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc: r for r in pii_redact(df).collect()}
    for i, t in enumerate(texts):
        assert got[i].n_email == len(re.findall(EMAIL_RX, t)), t
        assert got[i].n_ip == len(re.findall(IPV4_RX, t)), t
        assert got[i].n_phone == len(re.findall(PHONE_RX, t)), t
        red = re.sub(EMAIL_RX, "<EMAIL>", t)
        red = re.sub(IPV4_RX, "<IP>", red)
        red = re.sub(PHONE_RX, "<PHONE>", red)
        assert got[i].redacted == red, t
