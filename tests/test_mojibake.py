"""Mojibake repair vs the defining property: fix(corrupt(x)) == x and
fix(clean) == clean (dpr_spark/extras/mojibake.py)."""

import pytest
from pyspark.sql import functions as F

# real-unicode originals: Latin-1 accents (2-byte UTF-8), punctuation
# and CJK (3-byte), an astral char (4-byte)
ORIGINALS = [
    "café naïve déjà vu",
    "Zürich über alles",
    "niño piñata ça va",
    "the — em dash ‘quoted’ “words”",
    "日本語 text inside",
    "astral \U0001f600 grin",
]
CLEAN = [
    "plain ascii only",
    "real accents café stay put",
    "real cjk 日本語 stays",
    "",
]


def _corrupt_latin1(x: str) -> str:
    return x.encode("utf-8").decode("latin-1")


def _corrupt_cp1252(x: str) -> str:
    """What a sloppy cp1252 viewer shows for UTF-8 bytes: cp1252 where
    defined, the raw C1 control char for the five undefined bytes."""
    out = []
    for b in x.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def test_latin1_repair_roundtrip(spark):
    from dpr_spark.extras.mojibake import fix_mojibake

    rows = [(i, _corrupt_latin1(x)) for i, x in enumerate(ORIGINALS)]
    rows += [(100 + i, x) for i, x in enumerate(CLEAN)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: (r.fixed, r.changed) for r in fix_mojibake(df).collect()}
    for i, x in enumerate(ORIGINALS):
        assert got[i] == (x, True), f"doc {i}"
    for i, x in enumerate(CLEAN):
        assert got[100 + i] == (x, False), f"clean doc {i}"


def test_latin1_never_touches_out_of_range(spark):
    """Text mixing a mojibake-looking bigram with real non-Latin-1
    chars is NOT latin-1 damage; the guard must pass it through."""
    from dpr_spark.extras.mojibake import fix_mojibake

    tricky = "Ã© but also 日本語"
    df = spark.createDataFrame([(0, tricky)], "doc_id long, text string")
    r = fix_mojibake(df).collect()[0]
    assert (r.fixed, r.changed) == (tricky, False)


@pytest.mark.parametrize("rounds", [1, 2])
def test_cp1252_udf_roundtrip(spark, rounds):
    from dpr_spark.extras.mojibake import fix_mojibake_udf

    def corrupt(x):
        for _ in range(rounds):
            x = _corrupt_cp1252(x)
        return x

    # cp1252-encodable damage only (smart quotes / dashes / accents)
    cases = [x for x in ORIGINALS if "\U0001f600" not in x]
    rows = [(i, corrupt(x)) for i, x in enumerate(cases)]
    rows += [(100 + i, x) for i, x in enumerate(CLEAN)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select("doc_id", fix_mojibake_udf()(F.col("text")).alias("f"))
    got = {r.doc_id: r.f for r in out.collect()}
    for i, x in enumerate(cases):
        assert got[i] == x, f"doc {i} rounds={rounds}"
    for i, x in enumerate(CLEAN):
        assert got[100 + i] == x


def test_cp1252_udf_never_corrupts_valid_text(spark):
    """Strict codecs: text that LOOKS marked but whose roundtrip is not
    valid UTF-8 stays unchanged (damage never compounds)."""
    from dpr_spark.extras.mojibake import fix_mojibake_udf

    # "Ã©" decodes, but the trailing lone "Ã" (a dangling UTF-8 lead
    # byte) makes the whole roundtrip invalid UTF-8
    bogus = "Ã©Ã"
    df = spark.createDataFrame([(0, bogus)], "doc_id long, text string")
    out = df.select(fix_mojibake_udf()(F.col("text")).alias("f"))
    assert out.collect()[0].f == bogus
