"""extras/webclean.py: Gopher repetition stats, n-gram decontamination,
PII redaction, URL canonicalization, boilerplate stripping — exact
expected values on crafted corpora, plus the no-shuffle plan contract
for the per-row operators."""

import pytest
from pyspark.sql import functions as F

from dpr_spark.extras.webclean import (
    canonical_url,
    decontaminated,
    latest_by_canonical_url,
    ngram_decontaminate,
    pii_redact,
    repetition_stats,
    strip_boilerplate,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_stats_exact(spark):
    # lines: [a b, a b, c d]; tokens: a b a b c d (joined chars = 11)
    df = spark.createDataFrame([(1, "a b\na b\nc d")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r.n_lines == 3
    assert r.dup_line_frac == pytest.approx(2 / 3, abs=1e-6)
    # duplicate line chars 2*3=6 over total line chars 9
    assert r.dup_line_char_frac == pytest.approx(6 / 9, abs=1e-6)
    # 2-grams: "a b" x2, "b a", "b c", "c d" -> top = 2 occurrences * 3 chars
    assert r.top2gram_char_frac == pytest.approx(6 / 11, abs=1e-6)
    assert r.dup2gram_char_frac == pytest.approx(6 / 11, abs=1e-6)
    # 3-grams all unique (count 1, len 5)
    assert r.top3gram_char_frac == pytest.approx(5 / 11, abs=1e-6)
    assert r.dup3gram_char_frac == 0.0
    # 4-grams all unique, len 7
    assert r.top4gram_char_frac == pytest.approx(7 / 11, abs=1e-6)


def test_repetition_stats_short_doc_no_grams(spark):
    df = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    r = repetition_stats(df).collect()[0]
    assert r.n_lines == 1 and r.dup_line_frac == 0.0
    assert r.top2gram_char_frac == 0.0 and r.dup3gram_char_frac == 0.0


def test_repetition_stats_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(repetition_stats(df))
    assert "Exchange" not in plan  # pure per-row column math


def test_gopher_quality_rules_exact(spark):
    from dpr_spark.extras.webclean import gopher_quality_rules

    rows = [
        # 8 words, mean len (3+3+3+2+4+3+3+4)/8=3.125, stops the/with/and
        (1, "the cat sat on with mat and hats"),
        (2, "# ## #"),                             # 3 hash-words, symbol 3/3
        (3, "- one\n- two\n• three\nplain line"),  # 3/4 bullet lines
        (4, "wait...\nmore…\nplain"),              # 2/3 ellipsis ends
        (5, "12 99 42"),                           # zero alpha words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc: r for r in gopher_quality_rules(df, min_words=3).collect()}
    r1 = out[1]
    assert r1.n_words == 8
    assert r1.mean_word_len == pytest.approx(3.125, abs=1e-6)
    assert r1.stop_word_hits == 3  # the, with, and
    assert r1.gopher_pass
    r2 = out[2]
    assert r2.symbol_word_ratio == pytest.approx(4 / 3, abs=1e-6)
    assert not r2.rule_symbol_ratio and not r2.gopher_pass
    r3 = out[3]
    assert r3.bullet_line_frac == pytest.approx(3 / 4, abs=1e-6)
    assert r3.rule_bullet_lines  # 0.75 <= 0.9 default
    r4 = out[4]
    assert r4.ellipsis_line_frac == pytest.approx(2 / 3, abs=1e-6)
    assert not r4.rule_ellipsis_lines
    r5 = out[5]
    assert r5.alpha_word_frac == 0.0 and not r5.rule_alpha_words


def test_gopher_quality_rules_no_shuffle(spark):
    from dpr_spark.extras.webclean import gopher_quality_rules

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(gopher_quality_rules(df))
    assert "Exchange" not in plan  # one corpus pass, per-row math


def test_c4_clean_exact(spark):
    from dpr_spark.extras.webclean import c4_clean

    rows = [
        # 3 kept lines (terminal punct + >=5 words) -> 3 sentences, keeps
        (1, "This line has five good words.\nshort one.\n"
            "Another fine long line here!\nno punct ending line five\n"
            "A third proper sentence right here?"),
        (2, "Lorem Ipsum dolor sit amet etc.\nGood line with five words.\n"
            "One more fine line right here.\nAnd a fourth proper one too."),
        (3, "var x = { a: 1 }. This is code-ish with braces here.\nYes."),
        (4, 'He said "these quoted ends count."\nShort.'),
        (5, "this has the badword verboten inside.\nPlus two more fine "
            "lines here.\nAnd a third full sentence too."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc: r
        for r in c4_clean(df, badwords=("verboten",), min_sentences=3).collect()
    }
    r1 = out[1]
    assert r1.n_lines == 5 and r1.n_kept_lines == 3
    assert r1.n_sentences == 3 and r1.c4_keep
    assert "short one." not in r1.clean_text        # <5 words
    assert "no punct" not in r1.clean_text          # no terminal punct
    r2 = out[2]
    assert not r2.rule_no_lorem_ipsum and not r2.c4_keep
    assert r2.rule_min_sentences                    # 4 kept sentences
    r3 = out[3]
    assert not r3.rule_no_brace and not r3.c4_keep
    r4 = out[4]
    assert r4.n_kept_lines == 1                     # quote-terminated kept
    assert r4.n_sentences == 1 and not r4.rule_min_sentences
    r5 = out[5]
    assert not r5.rule_no_badword and not r5.c4_keep
    assert r5.rule_min_sentences                    # 3 kept sentences


def test_c4_clean_no_shuffle(spark):
    from dpr_spark.extras.webclean import c4_clean

    df = spark.createDataFrame([(1, "a b c d e.")], "doc_id long, text string")
    plan = _plan(c4_clean(df))
    assert "Exchange" not in plan


def test_pii_redact_exact(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co or 10.0.0.1 or 555-123-4567 done"), (2, "clean")],
        "doc_id long, text string",
    )
    rows = {r.doc: r for r in pii_redact(df).collect()}
    assert (rows[1].n_email, rows[1].n_ip, rows[1].n_phone) == (1, 1, 1)
    assert rows[1].redacted == "mail <EMAIL> or <IP> or <PHONE> done"
    assert (rows[2].n_email, rows[2].n_ip, rows[2].n_phone) == (0, 0, 0)
    assert rows[2].redacted == "clean"


def test_pii_redact_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert "Exchange" not in _plan(pii_redact(df))


def test_ngram_decontaminate_and_clean_split(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "five six seven"), (3, "two three five")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("two three",), ("nine ten",)], "gram string")
    hits = {r.doc: r.n_hits for r in ngram_decontaminate(docs, bench, n=2).collect()}
    assert hits == {1: 1, 3: 1}
    clean = sorted(r.doc_id for r in decontaminated(docs, bench, n=2).collect())
    assert clean == [2]


def test_ngram_decontaminate_hash_and_text_agree(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common gram tail w{i + 1}") for i in range(20)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("common gram tail",)], "gram string")
    a = sorted(map(tuple, ngram_decontaminate(docs, bench, n=3, join_on="hash").collect()))
    b = sorted(map(tuple, ngram_decontaminate(docs, bench, n=3, join_on="text").collect()))
    assert a == b and len(a) == 20


def test_ngram_decontaminate_broadcasts_bench(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b",)], "gram string")
    assert "BroadcastExchange" in _plan(ngram_decontaminate(docs, bench, n=2))


@pytest.mark.parametrize(
    "url,canon",
    [
        ("https://WWW.Example.com/Path/?utm_source=x&id=3#frag", "example.com/path/?id=3"),
        ("http://example.com/a/?utm_a=1", "example.com/a"),
        ("https://example.com/a?utm_a=1&utm_b=2", "example.com/a"),
        ("example.com/a?ref=1&gclid=xyz", "example.com/a?ref=1"),
        ("https://www.example.com///", "example.com"),
        ("https://example.com/a#x?utm_a=1", "example.com/a"),
    ],
)
def test_canonical_url(spark, url, canon):
    got = spark.range(1).select(canonical_url(F.lit(url)).alias("c")).collect()[0].c
    assert got == canon


def test_latest_by_canonical_url(spark):
    df = spark.createDataFrame(
        [
            ("https://www.a.com/x?utm_s=1", 1, 10),
            ("http://a.com/x/", 2, 20),
            ("https://a.com/y", 3, 30),
        ],
        "url string, ts long, doc_id long",
    )
    out = {r.canonical_url: (r.ts, r.doc_id) for r in
           latest_by_canonical_url(df, keep_cols=("doc_id",)).collect()}
    assert out == {"a.com/x": (2, 20), "a.com/y": (3, 30)}


def test_strip_boilerplate_exact(spark):
    rows = [
        (1, "g", "HDR\nbody one\nFTR"),
        (2, "g", "HDR\nbody two\nFTR"),
        (3, "g", "HDR\nbody three\nFTR"),
        (4, "h", "HDR\nother"),  # different group: HDR survives there
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc: r for r in
           strip_boilerplate(df, min_docs=3).collect()}
    assert out[1].n_lines == 3 and out[1].n_removed == 2
    assert out[1].clean_text == "body one"
    assert out[2].clean_text == "body two"
    assert out[4].n_removed == 0 and out[4].clean_text == "HDR\nother"


def test_strip_boilerplate_all_lines_removed(spark):
    rows = [(i, "g", "HDR") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = strip_boilerplate(df, min_docs=3).collect()
    assert all(r.clean_text == "" and r.n_removed == 1 for r in out)


def test_dup_span_strip_exact(spark):
    from dpr_spark.extras.webclean import dup_span_strip

    # "x y z" occurs in docs 1 and 2 -> covered in both; doc 3 untouched
    docs = spark.createDataFrame(
        [
            (1, "a x y z b"),
            (2, "c c x y z"),
            (3, "p q r s t"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in dup_span_strip(docs, k=3, min_docs=2).collect()}
    assert (out[1].n_tokens, out[1].n_covered) == (5, 3)
    assert out[1].clean_text == "a b"
    assert out[2].clean_text == "c c"
    assert out[3].n_covered == 0 and out[3].clean_text == "p q r s t"
    assert out[1].dup_span_frac == pytest.approx(0.6, abs=1e-6)


def test_dup_span_strip_overlapping_windows_merge(spark):
    from dpr_spark.extras.webclean import dup_span_strip

    # both docs share the 4-token run "a b c d": two overlapping 3-gram
    # windows cover the whole run, not just disjoint chunks
    docs = spark.createDataFrame(
        [(1, "q a b c d w"), (2, "a b c d")],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in dup_span_strip(docs, k=3, min_docs=2).collect()}
    assert out[1].clean_text == "q w" and out[1].n_covered == 4
    assert out[2].clean_text == "" and out[2].n_covered == 4


def test_dup_span_strip_within_doc_repeat_not_stripped(spark):
    from dpr_spark.extras.webclean import dup_span_strip

    # min_docs=2 counts DISTINCT docs: a within-doc repeat survives
    docs = spark.createDataFrame(
        [(1, "x y z q x y z"), (2, "unrelated words only here")],
        "doc_id long, text string",
    )
    out = {r.doc: r for r in dup_span_strip(docs, k=3, min_docs=2).collect()}
    assert out[1].n_covered == 0


def test_dup_span_strip_short_docs_pass_through(spark):
    from dpr_spark.extras.webclean import dup_span_strip

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc: r for r in dup_span_strip(docs, k=3, min_docs=2).collect()}
    assert out[1].n_covered == 0 and out[1].clean_text == "a b"


def test_strip_boilerplate_counts_distinct_docs_not_occurrences(spark):
    # one doc repeating a line 5 times must NOT make it boilerplate
    rows = [(1, "g", "X\nX\nX\nX\nX"), (2, "g", "X\nY")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc: r for r in strip_boilerplate(df, min_docs=3).collect()}
    assert out[1].n_removed == 0 and out[2].n_removed == 0
