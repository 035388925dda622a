"""Row-identity of the vectorized Arrow n-gram kernel
(functions/ngrams_fast.ngram_rows) with the Catalyst
transform/concat_ws shapes it replaced — all modes, including empty /
null / short / non-ASCII documents (the regex fallback path)."""

import pytest
from pyspark.sql import functions as F

from dpr_spark.functions.ngrams_fast import ngram_rows
from dpr_spark.functions.tokenizer import tokenize_col

ROWS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "a b"),
    (3, ""),
    (4, None),
    (5, "punct! and, stuff... x9 42-z"),
    (6, "café zürich naïve — ünïcode test"),
    (7, "one"),
    (8, "dup dup dup dup"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _grams_catalyst(toks, n):
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_full_mode_matches_catalyst(docs, n):
    ref = docs.select(
        "doc_id", tokenize_col("text", lowercase_first=True).alias("_t")
    ).select("doc_id", F.explode(_grams_catalyst(F.col("_t"), n)).alias("gram"))
    got = ngram_rows(docs, n, lowercase_first=True, mode="full", out_id="doc_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_short_tail_distinct_matches_shingles_shape(docs):
    n = 3
    toks = F.col("_t")
    ref = (
        docs.select("doc_id", tokenize_col("text").alias("_t"))
        .select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                    )
                )
            ).alias("gram"),
        )
        .filter(F.col("gram") != "")
    )
    got = ngram_rows(
        docs, n, lowercase_first=False, mode="short_tail", distinct=True,
        out_id="doc_id",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_string_id_column_passes_through(spark):
    # the streaming near-dup ledger keys shingles by string doc keys —
    # the kernel must carry the id column's source type, not assume long
    df = spark.createDataFrame(
        [("u1", "alpha beta gamma"), ("u2", "beta gamma delta")],
        "k string, text string",
    )
    got = ngram_rows(
        df, 3, id_col="k", lowercase_first=False, mode="short_tail",
        distinct=True, out_id="doc",
    )
    rows = sorted(map(tuple, got.collect()))
    assert rows == [("u1", "alpha beta gamma"), ("u2", "beta gamma delta")]
    assert dict(got.dtypes)["doc"] == "string"


def test_uni_bi_matches_dsir_shape(docs):
    toks = F.col("_t")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ref = docs.select(
        "doc_id", tokenize_col("text", lowercase_first=True).alias("_t")
    ).select("doc_id", F.explode(F.concat(toks, bigrams)).alias("gram"))
    got = ngram_rows(docs, 2, lowercase_first=True, mode="uni_bi", out_id="doc_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
