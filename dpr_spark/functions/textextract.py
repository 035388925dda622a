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
