"""Normalization operators P4/P5/P7/P9 (SURVEY.md §2.2), as both pure
Python (oracle side) and Catalyst column expressions (engine side).

Reference semantics:
- normalize_question: `’` -> `'`                (`dpr/utils/data_utils.py:63-65`)
- normalize_passage:  `\\n` -> ' ', `’` -> `'`, strip one wrapping `"`
                                                (`dpr/data/biencoder_data.py:174-180`)
- _normalize (NFD):   unicodedata NFD           (`dpr/data/qa_validation.py:235-236`)
- _normalize_answer:  lower -> remove punct -> drop articles -> squeeze ws
                                                (`qa_validation.py:218-232`)
"""

from __future__ import annotations

import re
import string
import unicodedata

import pandas as pd

# ---------------------------------------------------------------- pure python

_ARTICLES_RE = re.compile(r"\b(a|an|the)\b")
_PUNC = set(string.punctuation)


def normalize_question(q: str) -> str:
    return q.replace("’", "'")


def normalize_passage(t: str) -> str:
    t = t.replace("\n", " ").replace("’", "'")
    if t.startswith('"'):
        t = t[1:]
    if t.endswith('"'):
        t = t[:-1]
    return t


def nfd(t: str) -> str:
    return unicodedata.normalize("NFD", t)


def normalize_answer(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in _PUNC)
    s = _ARTICLES_RE.sub(" ", s)
    return " ".join(s.split())


# ------------------------------------------------------------- catalyst exprs


def normalize_question_col(col):
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    return F.replace(col, F.lit("’"), F.lit("'"))


def normalize_passage_col(col):
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    c = F.replace(col, F.lit("\n"), F.lit(" "))
    c = F.replace(c, F.lit("’"), F.lit("'"))
    return F.regexp_replace(F.regexp_replace(c, '^"', ""), '"$', "")


def normalize_answer_col(col):
    """P9 as pure column math; identical to :func:`normalize_answer` for
    ASCII punctuation (string.punctuation is ASCII-only, like the ref)."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    c = F.lower(col)
    # string.punctuation, regex-escaped as a character class
    c = F.regexp_replace(c, r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]""", "")
    c = F.regexp_replace(c, r"\b(a|an|the)\b", " ")
    c = F.regexp_replace(F.trim(c), r"\s+", " ")
    return c


def normalize_answer_sql(expr: str) -> str:
    """DuckDB spelling of :func:`normalize_answer_col` (same regexes)."""
    return (
        "regexp_replace(trim(regexp_replace(regexp_replace(lower(%s),"
        " '[!\"#$%%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g'),"
        " '\\b(a|an|the)\\b', ' ', 'g')), '\\s+', ' ', 'g')" % expr
    )


def nfd_udf():
    """P7: no Catalyst builtin for unicode NFD -> Arrow pandas UDF."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfd(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize("NFD", t) if t is not None else None)

    return _nfd
