"""Byte-identity invariant: extract_text(html) == text per url
(BASELINE.json:input_hint; FIXTURES.md §1)."""

from pyspark.sql import functions as F

from dpr_spark.functions.textextract import (
    extract_text,
    extract_text_udf,
    extract_title,
    render_html,
)


def test_roundtrip_simple():
    t = "hello world this is a test"
    assert extract_text(render_html(t, "ti")) == t
    assert extract_title(render_html(t, "ti")) == "ti"


def test_roundtrip_entities_and_unicode():
    t = "a & b < c café 东京 o’brien " + " ".join(f"w{i}" for i in range(45))
    assert extract_text(render_html(t)) == t


def test_fixture_corpus_byte_identity(pages_pdf):
    for h, t in zip(pages_pdf["html"], pages_pdf["text"]):
        assert extract_text(h) == t


def test_udf_matches_pure(spark, pages_df, pages_pdf):
    got = (
        pages_df.select("url", extract_text_udf()(F.col("html")).alias("ex"), "text")
        .withColumn("ok", F.col("ex") == F.col("text"))
        .agg(F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("bad"))
        .collect()[0]
    )
    assert got.bad == 0
