"""Tokenizer fidelity: pure / pandas-UDF / Catalyst variants must agree
(SURVEY.md §5 property tests; reference semantics
`/root/reference/dpr/utils/tokenizers.py:157-199`)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dpr_spark.functions.tokenizer import (
    ngrams,
    tokenize,
    tokenize_col,
    tokenize_udf,
    tokenize_with_offsets,
)

EDGE_TEXTS = [
    "Hello, World!",
    "O’Brien’s café — 东京 3.5kg!",
    "naïve  crème-brûlée\tzürich\nüber",
    "a.b.c 1,000,000 x=y+z",
    "ΕΛΛΆΔΑ Москва ελλάδα",
    "éclair (NFD combining accent)",
    "",
    "   ",
    "«quoted» “smart” 'plain'",
    "emoji 🙂 mixed 😀text",
    "tab\tsep nbsp ls",
]


def test_reference_semantics_basic():
    assert tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    # alphanumeric runs stay together incl. marks; punctuation is single chars
    assert tokenize("3.5kg") == ["3", ".", "5kg"]
    # combining mark (NFD) stays inside the token (\p{M})
    assert tokenize("éclair") == ["éclair"]


def test_offsets_cover_text():
    text = "Hello,  World!"
    toks = tokenize_with_offsets(text)
    assert [t for t, _ in toks] == ["Hello", ",", "World", "!"]
    for t, (s, e) in toks:
        assert text[s:e] == t


def test_ngrams():
    assert ngrams(["a", "b", "c"], 2) == ["a", "a b", "b", "b c", "c"]


def test_udf_matches_pure(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": EDGE_TEXTS}))
    got = [r.toks for r in sdf.select(tokenize_udf()(F.col("text")).alias("toks")).collect()]
    assert got == [tokenize(t) for t in EDGE_TEXTS]


def test_catalyst_matches_pure_on_fixture_corpus(spark, pages_pdf):
    """The JVM-regex variant must agree with the regex-module reference on
    the whole fixture corpus (incl. unicode sprinkles)."""
    texts = pages_pdf["text"].tolist()[:100]
    sdf = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r.toks for r in sdf.select(tokenize_col("text").alias("toks")).collect()]
    assert got == [tokenize(t) for t in texts]


def test_catalyst_matches_pure_on_edges(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"text": EDGE_TEXTS}))
    got = [r.toks for r in sdf.select(tokenize_col("text").alias("toks")).collect()]
    expect = [tokenize(t) for t in EDGE_TEXTS]
    for g, e, t in zip(got, expect, EDGE_TEXTS):
        assert g == e, repr(t)


@pytest.mark.parametrize("n", [500])
def test_property_random_unicode(n):
    """Seeded random unicode strings: pure tokenizer is total (no crash)
    and tokens contain no separator/control chars."""
    import random

    rng = random.Random(42)
    pools = [(0x20, 0x7E), (0xA0, 0x2FF), (0x370, 0x3FF), (0x4E00, 0x4FFF), (0x2000, 0x206F)]
    for _ in range(n):
        s = "".join(
            chr(rng.randint(*pools[rng.randrange(len(pools))])) for _ in range(rng.randrange(0, 40))
        )
        toks = tokenize(s)
        for t in toks:
            assert t == t.lower()
