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


# --------------------------- charset sniffing ---------------------------

CS_TEXT = "café o’brien — plain words here"


def _page(kind):
    """(html_bytes, want_charset, want_source, want_text)."""
    from dpr_spark.functions.textextract import decode_html

    if kind == "utf8_meta":
        doc = '<html><head><meta charset="utf-8"></head><body>%s</body></html>' % CS_TEXT
        return doc.encode("utf-8"), "utf-8", "meta", doc
    if kind == "cp1252_meta":
        doc = '<html><head><meta charset="iso-8859-1"></head><body>%s</body></html>' % CS_TEXT
        return doc.encode("cp1252"), "cp1252", "meta", doc
    if kind == "http_equiv":
        doc = ('<html><head><meta http-equiv="Content-Type" '
               'content="text/html; charset=windows-1252"></head>'
               "<body>%s</body></html>") % CS_TEXT
        return doc.encode("cp1252"), "cp1252", "meta", doc
    if kind == "utf16_bom":
        doc = "<html><body>%s</body></html>" % CS_TEXT
        return b"\xff\xfe" + doc.encode("utf-16-le"), "utf-16-le", "bom", doc
    if kind == "utf8_bom":
        doc = "<html><body>%s</body></html>" % CS_TEXT
        return b"\xef\xbb\xbf" + doc.encode("utf-8"), "utf-8", "bom", doc
    if kind == "default":
        doc = "<html><body>%s</body></html>" % CS_TEXT
        return doc.encode("utf-8"), "utf-8", "default", doc
    raise ValueError(kind)


KINDS = ["utf8_meta", "cp1252_meta", "http_equiv", "utf16_bom", "utf8_bom", "default"]


def test_detect_and_decode_pure():
    from dpr_spark.functions.textextract import decode_html, detect_charset

    for kind in KINDS:
        raw, cs, src, doc = _page(kind)
        assert detect_charset(raw) == (cs, src), kind
        assert decode_html(raw) == doc, kind


def test_charset_report_udfs(spark):
    from dpr_spark.functions.textextract import charset_report

    rows = [(i, bytearray(_page(k)[0])) for i, k in enumerate(KINDS)]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r.doc: (r.charset, r.source, r.text) for r in charset_report(df).collect()}
    for i, k in enumerate(KINDS):
        _raw, cs, src, doc = _page(k)
        assert got[i] == (cs, src, doc), k


def test_decode_never_raises_on_garbage():
    from dpr_spark.functions.textextract import decode_html

    # declared utf-8 but invalid bytes -> U+FFFD, no exception
    out = decode_html(b'<meta charset="utf-8">ok\xc3ok')
    assert "ok�ok" in out
