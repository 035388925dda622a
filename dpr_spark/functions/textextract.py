"""Deterministic html <-> text rendering/extraction (SURVEY.md T6 analog).

The reference parses HTML-token streams into linearized text
(`/root/reference/dpr/data/biencoder_data.py:252-337` NQTableParser); our
input table carries ``html: binary`` alongside the authoritative
``text: string`` (BASELINE.json:input_hint), with the per-row invariant
``extract_text(html) == text`` byte-identically.

One shared pure function is imported by BOTH the Spark pandas UDF and the
pytest oracle, so the invariant is definitionally checkable. Fixtures render
``html`` FROM ``text`` with :func:`render_html`; :func:`extract_text` inverts
it exactly (including HTML entity escaping round-trip).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

PARA_WORDS = 20  # fixture paragraphs are 20 words (FIXTURES.md §1)

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)


def render_html(text: str, title: str = "") -> bytes:
    """Render the canonical fixture HTML for a page: paragraphs of
    PARA_WORDS whitespace-split words, entity-escaped, UTF-8 encoded."""
    words = text.split(" ")
    paras = [
        " ".join(words[i : i + PARA_WORDS]) for i in range(0, len(words), PARA_WORDS)
    ]
    body = "".join("<p>%s</p>" % _html.escape(p, quote=False) for p in paras)
    doc = "<html><head><title>%s</title></head><body>%s</body></html>" % (
        _html.escape(title, quote=False),
        body,
    )
    return doc.encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Invert :func:`render_html`: decode UTF-8, pull <p> bodies, unescape
    entities, re-join with single spaces. Byte-identical to the source
    ``text`` by construction (tests/test_textextract.py)."""
    doc = html_bytes.decode("utf-8")
    paras = [_html.unescape(p) for p in _PARA_RE.findall(doc)]
    return " ".join(paras)


def extract_title(html_bytes: bytes) -> str:
    m = _TITLE_RE.search(html_bytes.decode("utf-8"))
    return _html.unescape(m.group(1)) if m else ""


def extract_text_udf():
    """Arrow-vectorized pandas UDF Series[binary] -> Series[string]
    (SURVEY.md §2.12 UDF #2)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(lambda b: extract_text(bytes(b)) if b is not None else None)

    return _extract


# ---------------------------------------------------------------------------
# Charset sniffing + decode (the WHATWG HTML encoding-detection prescan)
# ---------------------------------------------------------------------------

HTML_PRESCAN_BYTES = 1024  # the spec's prescan window

# WHATWG encoding labels -> python codecs. The spec maps the whole
# Latin-1 family to windows-1252 (public "Encoding" standard rule);
# unknown labels fall back to utf-8 like a lenient browser.
CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf-16": "utf-16-le",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_META_CHARSET_RE = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""")


def detect_charset(html_bytes: bytes) -> tuple:
    """(python_codec, source): BOM first (spec: a BOM wins over any
    declaration), then a <meta charset=...> / <meta http-equiv
    Content-Type> declaration inside the first HTML_PRESCAN_BYTES,
    else the utf-8 default. source in {"bom", "meta", "default"}."""
    if html_bytes.startswith(b"\xef\xbb\xbf"):
        return "utf-8", "bom"
    if html_bytes.startswith(b"\xff\xfe"):
        return "utf-16-le", "bom"
    if html_bytes.startswith(b"\xfe\xff"):
        return "utf-16-be", "bom"
    m = _META_CHARSET_RE.search(html_bytes[:HTML_PRESCAN_BYTES])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        return CHARSET_ALIASES.get(label, "utf-8"), "meta"
    return "utf-8", "default"


def decode_html(html_bytes: bytes) -> str:
    """Decode per the detected charset; a leading BOM is consumed (the
    spec strips it), malformed bytes become U+FFFD (never raise on a
    crawled page)."""
    cs, src = detect_charset(html_bytes)
    if src == "bom":
        html_bytes = html_bytes[3 if cs == "utf-8" else 2:]
    return html_bytes.decode(cs, errors="replace")


def sniff_charset_udf():
    """Series[binary] -> struct<charset, source> (Arrow-batched; the
    binary column never leaves the executor)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("charset string, source string")
    def _sniff(s: pd.Series) -> pd.DataFrame:
        pairs = [
            detect_charset(bytes(b)) if b is not None else (None, None)
            for b in s
        ]
        return pd.DataFrame(pairs, columns=["charset", "source"])

    return _sniff


def decode_html_udf():
    """Series[binary] -> Series[string]: detected-charset decode."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: decode_html(bytes(b)) if b is not None else None)

    return _decode


def charset_report(df, html_col: str = "html", id_col: str = "doc_id"):
    """(doc, charset, source, text): one UDF pass — sniff + decode per
    page. The crawl-ingest front door: downstream operators see ONE
    canonical utf-8 text column regardless of on-wire encoding."""
    from pyspark.sql import functions as F

    sniffed = df.select(
        F.col(id_col).alias("doc"),
        sniff_charset_udf()(F.col(html_col)).alias("_cs"),
        decode_html_udf()(F.col(html_col)).alias("text"),
    )
    return sniffed.select(
        "doc",
        F.col("_cs")["charset"].alias("charset"),
        F.col("_cs")["source"].alias("source"),
        "text",
    )
