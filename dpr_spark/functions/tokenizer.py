"""DPR-faithful tokenization (SURVEY.md T1/T2).

The reference tokenizer is DrQA's ``SimpleTokenizer``
(`/root/reference/dpr/utils/tokenizers.py:157-199`): the regex alternation
``([\\p{L}\\p{N}\\p{M}]+)|([^\\p{Z}\\p{C}])`` compiled with the `regex`
module under IGNORECASE|UNICODE|MULTILINE; query/answer matching uses
``words(uncased=True)`` i.e. each token lowercased
(`tokenizers.py:51-60`).

Three faithful implementations, byte-identical on the fixture corpus
(asserted in tests/test_tokenizer.py):

1. :func:`tokenize` — pure Python, used by the single-node oracle.
2. :func:`tokenize_udf` — Arrow-vectorized pandas UDF (the engine's hot
   path; no per-row Python at the Spark API layer per
   BASELINE.json:input_hint).
3. :func:`tokenize_col` — pure Catalyst (``regexp_extract_all`` +
   ``transform(lower)``), JVM-side/codegen; used where a DuckDB SQL
   oracle must reproduce the exact same expression.

All three lowercase AFTER matching, like the reference (`words(uncased=True)`
lowercases the matched token, not the input text).
"""

from __future__ import annotations

import functools
from typing import List

import pandas as pd
import regex

ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
NON_WS = r"[^\p{Z}\p{C}]"
# Exact pattern of SimpleTokenizer (`tokenizers.py:158-168`).
TOKEN_PATTERN = "(%s)|(%s)" % (ALPHA_NUM, NON_WS)
# Same pattern in Java-regex (Spark) / RE2 (DuckDB) spelling — the \p
# one-letter general categories are shared syntax across all three engines.
TOKEN_PATTERN_SQL = r"([\p{L}\p{N}\p{M}]+)|([^\p{Z}\p{C}])"


@functools.lru_cache(maxsize=1)
def _compiled() -> "regex.Pattern":
    return regex.compile(
        TOKEN_PATTERN,
        flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
    )


@functools.lru_cache(maxsize=1)
def _compiled_fast() -> "regex.Pattern":
    """Non-capturing twin of the reference pattern: matches the exact same
    token language (groups don't affect matching), but lets findall()
    return whole matches directly — ~2x faster than finditer+group() in
    the Arrow UDF hot path. Equality with tokenize() is pytest-asserted
    on the unicode fixture corpus."""
    return regex.compile(
        "(?:%s)|(?:%s)" % (ALPHA_NUM, NON_WS),
        flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE,
    )


def tokenize_fast(text: str) -> List[str]:
    return [t.lower() for t in _compiled_fast().findall(text)]


# --- vectorized ASCII fast path (Arrow/RE2, ~5x the regex-module kernel) ---
#
# For pure-ASCII text the reference token language simplifies exactly:
# \p{L}\p{N}\p{M} == [0-9A-Za-z], \p{Z} == space (0x20), \p{C} ==
# [\x00-\x1f\x7f]; so tokens are maximal alnum runs plus every other
# printable char as a single token, and match-then-lower == lower-then-
# match. That lets the whole tokenize run as two RE2/C passes in pyarrow
# (ascii_lower, then ONE fused rewrite that space-pads punctuation and
# blanks controls — RE2 substitutes an unmatched group as the empty
# string, so "(punct)|control" -> " \1 " blanks a control to two spaces,
# which the whitespace split collapses identically) with no per-document
# Python. Equality with tokenize() on ASCII is asserted in
# tests/test_tokenizer.py (random ASCII + the fixture corpus); non-ASCII
# batches fall back to the regex-module kernel.
_CONTROLS = "[\\x00-\\x1f\\x7f]"
_PUNCT = "([^0-9a-z ])"
# punct (captured, space-padded) | control (uncaptured, blanked)
_PUNCT_OR_CONTROL = "([^0-9a-z \\x00-\\x1f\\x7f])|[\\x00-\\x1f\\x7f]"


def _all_ascii(arr) -> bool:
    """True when every (non-null) string in the Arrow array is ASCII
    (char count == byte count)."""
    import pyarrow.compute as pc

    ok = pc.all(pc.equal(pc.utf8_length(arr), pc.binary_length(arr)))
    return ok.as_py() is True


def tokenize_ascii_arrow(arr):
    """Tokenize an all-ASCII Arrow string array; returns (flat tokens
    StringArray, per-row token counts int64 numpy). Caller must have
    checked _all_ascii(arr) (and filled nulls with "")."""
    import numpy as np
    import pyarrow.compute as pc

    low = pc.ascii_lower(arr)  # ASCII-only input: == utf8_lower, no decode
    b = pc.replace_substring_regex(low, pattern=_PUNCT_OR_CONTROL, replacement=" \\1 ")
    trimmed = pc.ascii_trim_whitespace(b)
    toks = pc.ascii_split_whitespace(trimmed)
    flat = toks.flatten()
    lens = np.diff(toks.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
    # after trim, '' tokens arise ONLY from fully-empty rows (['']);
    # interior whitespace runs collapse and edges are trimmed
    empty_rows = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    if empty_rows.any():
        lens[empty_rows] = 0
        flat = flat.filter(pc.not_equal(flat, ""))
    return flat, lens


def tokenize(text: str, uncased: bool = True) -> List[str]:
    """Pure-Python reference tokenizer: `tokenizers.py:177-199` +
    `words(uncased=True)` (`:51-60`)."""
    pat = _compiled()
    if uncased:
        return [m.group().lower() for m in pat.finditer(text)]
    return [m.group() for m in pat.finditer(text)]


def tokenize_with_offsets(text: str):
    """Token + [start, end) char span, like ``Tokens.offsets()``
    (`tokenizers.py:62-64`)."""
    pat = _compiled()
    return [(m.group(), m.span()) for m in pat.finditer(text)]


def ngrams(tokens: List[str], n: int = 1) -> List[str]:
    """``Tokens.ngrams`` semantics (`tokenizers.py:96-118`): all n-grams of
    length 1..n, joined by space (uncased assumed already applied)."""
    out = []
    for s in range(len(tokens)):
        for e in range(s, min(s + n, len(tokens))):
            out.append(" ".join(tokens[s : e + 1]))
    return out


# ---------------------------------------------------------------------------
# Spark-side variants (imported lazily so the pure parts work without a JVM)
# ---------------------------------------------------------------------------


def tokenize_udf():
    """Arrow-vectorized pandas UDF: Series[str] -> Series[array<string>].

    The engine's hot path for index build (SURVEY.md §2.12 UDF #1).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        pat = _compiled_fast()
        return s.map(
            lambda t: [m.lower() for m in pat.findall(t)] if t is not None else None
        )

    return _tok


def tokenize_col(col, lowercase_first: bool = False):
    """Catalyst-native tokenizer: JVM regex, whole-stage-codegen friendly.

    ``lowercase_first=True`` lowers the whole string before matching —
    use only for ASCII-ish corpora where it equals match-then-lower
    (needed when a DuckDB oracle must run the same SQL).
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    if lowercase_first:
        return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN_SQL), 0)
    toks = F.regexp_extract_all(col, F.lit(TOKEN_PATTERN_SQL), 0)
    return F.transform(toks, lambda t: F.lower(t))


def duckdb_tokenize_sql(expr: str, lowercase_first: bool = False) -> str:
    """The DuckDB spelling of :func:`tokenize_col` for oracle SQL."""
    pat = TOKEN_PATTERN_SQL.replace("'", "''")
    if lowercase_first:
        return f"regexp_extract_all(lower({expr}), '{pat}')"
    return f"list_transform(regexp_extract_all({expr}, '{pat}'), t -> lower(t))"


def ngrams_col(toks, n: int = 2):
    """Catalyst-native ``Tokens.ngrams`` view (T2, `tokenizers.py:96-118`):
    all n-grams of length 1..n as space-joined strings, in the reference's
    (start asc, length asc) order. Pure column math — no UDF, no shuffle."""
    from pyspark.sql import functions as F

    if isinstance(toks, str):
        toks = F.col(toks)
    starts = F.sequence(F.lit(0), F.size(toks) - 1)
    grams = F.transform(
        starts,
        lambda s: F.transform(
            F.sequence(s, F.least(s + F.lit(n - 1), F.size(toks) - 1)),
            lambda e: F.concat_ws(" ", F.slice(toks, s + 1, e - s + 1)),
        ),
    )
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.flatten(grams)
    )
