"""Mojibake (encoding-damage) repair for web text.

Common Crawl pages carry a well-known damage class: UTF-8 bytes
misdecoded as ISO-8859-1 or windows-1252 somewhere upstream, leaving
sequences like "\u00c3\u00a9" for "\u00e9" (e-acute) and
"\u00e2\u20ac\u2122" for U+2019 (right single quote). The repair is the public
ftfy algorithm's core roundtrip: re-encode with the wrong codec
(recovering the original bytes) and decode as UTF-8, guarded so clean
text never changes and damage never compounds.

Two tiers, matching Spark's execution model:

- `fix_mojibake_latin1` — a PURE JVM expression (encode/decode +
  regex guards): zero shuffle, zero Python, whole-stage codegen over
  the corpus scan. Covers the Latin-1 damage class (every damaged char
  in U+0080-U+00FF). This is the 100 TB path.
- `fix_mojibake_udf` — Arrow-batched pandas UDF for the cp1252 class
  (smart quotes, em dash, euro: bytes 0x80-0x9F decode to punctuation
  OUTSIDE Latin-1, and Spark's encode() charset set has no cp1252), a
  strict-codec fixed-point loop with a regex pre-filter so clean rows
  never pay the roundtrip.

Reference parity: the reference normalizes its corpus text at load
(`/root/reference/dpr/data/retriever_data.py` normalize_passage);
encoding repair is the web-crawl-scale generalization of that step.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf resolves 'pd.Series' here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a UTF-8 lead byte misdecoded as Latin-1/cp1252 shows up as a char in
# U+00C2-U+00DF (2-byte lead) or U+00E0-U+00EF (3-byte lead) followed
# by continuation-byte chars (U+0080-U+00BF); cp1252 damage maps bytes
# 0x80-0x9F to punctuation (euro, dagger, smart quotes, em dash, TM,
# ...), so those chars count as continuations too
_MOJI_CONT = (
    "\u0080-\u00bf"          # raw continuation-byte chars
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160"
    "\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014"
    "\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"  # cp1252 0x80-0x9f
)
MOJIBAKE_MARKER_RX = (
    "[\u00c2-\u00df][" + _MOJI_CONT + "]"
    "|[\u00e0-\u00ef][" + _MOJI_CONT + "]{2}"
    "|[\u00f0-\u00f4][" + _MOJI_CONT + "]{3}"
)


def fix_mojibake_latin1(col: Column) -> Column:
    """Repair UTF-8 misdecoded as ISO-8859-1, as a pure JVM expression:
    re-encode to Latin-1 (recovering the original UTF-8 bytes) and
    decode as UTF-8. Applied only when provably safe — the text shows a
    mojibake marker, every char is in the Latin-1 range (so the
    re-encode is lossless), and the roundtrip decodes cleanly (no
    U+FFFD) — otherwise the input passes through unchanged."""
    repaired = F.decode(F.encode(col, "ISO-8859-1"), "UTF-8")
    safe = (
        col.rlike(MOJIBAKE_MARKER_RX)
        & ~col.rlike("[\u0100-\uffff]")
        & ~repaired.contains("\ufffd")
    )
    return F.when(safe, repaired).otherwise(col)


def _sloppy_c2b():
    """char -> byte table of the "sloppy windows-1252" codec (ftfy's
    public trick): cp1252 everywhere it is defined, the five undefined
    bytes (0x81 8D 8F 90 9D) as their C1 control chars, PLUS the C1
    control chars for the defined 0x80-0x9F bytes — so text damaged by
    a Latin-1 decode (raw C1 chars), a cp1252 decode (displaced
    punctuation), or any byte-wise mix of the two re-encodes to the
    original bytes with one table."""
    c2b = {}
    for b in range(256):
        try:
            c = bytes([b]).decode("cp1252")
        except UnicodeDecodeError:
            c = chr(b)
        c2b[c] = b
    for b in range(0x80, 0xA0):
        c2b.setdefault(chr(b), b)
    return c2b


def fix_mojibake_udf():
    """Arrow-batched full repair: while the text shows a mojibake
    marker, re-encode via the sloppy-cp1252 table and strict-decode as
    UTF-8 — so damage never compounds; stop at a fixed point, when a
    char has no byte (genuinely non-Latin text), on a UTF-8 failure
    (marker was a false positive), or after 2 rounds (double-encoded
    text converges in 2)."""
    import re

    from pyspark.sql.functions import pandas_udf

    marker = re.compile(MOJIBAKE_MARKER_RX)
    c2b = _sloppy_c2b()

    def _fix_one(x):
        if x is None:
            return None
        cur = x
        for _ in range(2):
            if not marker.search(cur):
                break
            try:
                b = bytes(c2b[c] for c in cur)
            except KeyError:
                break
            try:
                dec = b.decode("utf-8", errors="strict")
            except UnicodeDecodeError:
                break
            if dec == cur:
                break
            cur = dec
        return cur

    @pandas_udf("string")
    def fix(s: pd.Series) -> pd.Series:
        return s.map(_fix_one)

    return fix


def fix_mojibake(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, fixed, changed): Latin-1-class mojibake repaired JVM-side.
    The driver-entry surface for the codegen fast path; pipelines that
    need cp1252 smart-quote repair chain fix_mojibake_udf after it."""
    fixed = fix_mojibake_latin1(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc"),
        fixed.alias("fixed"),
        (fixed != F.col(text_col)).alias("changed"),
    )
