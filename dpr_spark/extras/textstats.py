"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting. All pure
column math (JVM/codegen) over the shared tokenizer."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dpr_spark.functions.tokenizer import tokenize_col

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_PROFILES = {
    "en": "the of and to a in is was for on as with by at from it".split(),
    "de": "der die das und ist von mit für auf des nicht ein im".split(),
    "fr": "le la les de et des un une du est pour dans par au".split(),
    "es": "el la los las de y del un una es en que por con para".split(),
}


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred, lang_scores map): argmax of stopword-hit ratio per
    language profile; 'und' (undetermined) when no profile scores."""
    toks = tokenize_col(text_col)
    d = df.select(F.col(id_col).alias("doc"), toks.alias("toks"))
    n = F.greatest(F.size("toks"), F.lit(1)).cast("double")
    arrays = {lang: F.array(*[F.lit(w) for w in words]) for lang, words in _PROFILES.items()}

    def _hits(arr):
        return F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))

    scores = {lang: _hits(arr) / n for lang, arr in arrays.items()}
    d = d.select(
        "doc", *[s.alias(f"s_{lang}") for lang, s in scores.items()]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _PROFILES])
    pred = F.lit("und")
    for lang in _PROFILES:
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return d.select(
        "doc",
        pred.alias("lang_pred"),
        F.map_from_arrays(
            F.array(*[F.lit(lang) for lang in _PROFILES]),
            F.array(*[F.round(F.col(f"s_{lang}"), 6) for lang in _PROFILES]),
        ).alias("lang_scores"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars, alpha_ratio, punct_ratio, stop_ratio,
    mean_word_len, quality): composable quality facets + a [0,1] score —
    the C4/Gopher-style cheap filters."""
    toks = tokenize_col(text_col)
    d = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"), toks.alias("toks"))
    n = F.greatest(F.size("toks"), F.lit(1)).cast("double")
    stop = _PROFILES["en"]
    alpha = F.size(F.filter("toks", lambda t: t.rlike("^[a-z]+$"))) / n
    punct = F.size(F.filter("toks", lambda t: t.rlike(r"^\p{Punct}$"))) / n
    stopr = F.size(
        F.filter("toks", lambda t: F.array_contains(F.array(*[F.lit(w) for w in stop]), t))
    ) / n
    mwl = F.aggregate("toks", F.lit(0.0), lambda acc, t: acc + F.length(t)) / n
    d = d.select(
        "doc",
        F.size("toks").cast("long").alias("n_tokens"),
        F.length("t").cast("long").alias("n_chars"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stopr, 6).alias("stop_ratio"),
        F.round(mwl, 6).alias("mean_word_len"),
    )
    # simple monotone blend; weights are policy, facets are the product
    q = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.3
        + F.least(F.col("stop_ratio") * F.lit(5.0), F.lit(1.0)) * 0.2
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(5.0), F.lit(1.0))) * 0.2
    )
    return d.withColumn("quality", F.round(q, 6))


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, ws_tokens, simple_tokens, bpe_ish_tokens): whitespace split,
    reference tokenizer count, and a BPE-ish subword estimate (regex
    word-piece split on 4-char chunks of long words)."""
    toks = tokenize_col(text_col)
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return df.select(
        F.col(id_col).alias("doc"),
        ws.cast("long").alias("ws_tokens"),
        F.size(toks).cast("long").alias("simple_tokens"),
        bpe.alias("bpe_ish_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): order-sensitive polynomial rolling hash over
    token hashes mod 2^31-1 (deterministic; the content-defined analog of
    the reference's table dedup key `biencoder_data.py:379-380`)."""
    P, R = 2147483647, 1000003
    toks = tokenize_col(text_col)
    fp = F.aggregate(
        F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(P))),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(R) + x) % F.lit(P),
    )
    return df.select(F.col(id_col).alias("doc"), fp.alias("fingerprint"))


def bigram_lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    ppl_round: int = 4,
) -> DataFrame:
    """(doc, n_bigrams, ppl) — per-document perplexity under an
    add-α-smoothed bigram LM fit on the corpus itself: the
    KenLM/CCNet-style quality filter of web-scale pipelines (junk pages
    score high perplexity against the corpus LM). p(v|u) =
    (C(uv)+α) / (C(u)+α·V) with C() corpus occurrence counts and V the
    unigram vocabulary; ppl = exp(mean −ln p) over the doc's bigrams.

    Plan shape (the 100 TB one): two count aggregations with map-side
    combine (unigram and bigram tables), then the doc-bigram stream
    joins the bigram table ON ITS KEY — a co-partitioned shuffle join,
    the bigram table being far too large to broadcast; hot bigrams
    (stopword pairs) are the usual skew and take the salting treatment
    if AQE's skew-join doesn't. Docs shorter than 2 tokens drop (no
    bigrams to score). ppl rounds at `ppl_round` so cross-engine ln/sum
    ulp noise can't flip a hash."""
    # tokens into a NAMED column first: element_at(tokenizer-expr, ...)
    # inside the transform() lambda re-runs the regex tokenizer PER
    # ARRAY ELEMENT in interpreted HOF eval (measured 10x on the n-gram
    # shape); the multi-referenced alias survives CollapseProject
    toks = F.col("_toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("u"),
                F.concat_ws(
                    " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,g:string>>"))
    # bg feeds both the bigram counts and the scoring join; uni feeds
    # the vocab count and the join — persist both or the tokenize pass
    # re-runs once per consumer (it was 4 corpus passes)
    bg = (
        df.select(
            F.col(id_col).alias("doc"), tokenize_col(text_col).alias("_toks")
        )
        .select("doc", F.explode(pairs).alias("p"))
        .select("doc", F.col("p.u").alias("u"), F.col("p.g").alias("g"))
        .persist()
    )
    uni = (
        df.select(F.explode(tokenize_col(text_col)).alias("u"))
        .groupBy("u")
        .agg(F.count("*").alias("cu"))
        .persist()
    )
    v = uni.count()
    big = bg.groupBy("g").agg(F.count("*").alias("cg"))
    lp = F.log(
        (F.col("cg").cast("double") + F.lit(alpha))
        / (F.col("cu").cast("double") + F.lit(alpha * v))
    )
    scored = (
        bg.join(big, "g")
        .join(uni, "u")
        .groupBy("doc")
        .agg(F.count("*").alias("n_bigrams"), F.sum(lp).alias("s"))
    )
    out = scored.select(
        "doc",
        "n_bigrams",
        F.round(F.exp(-F.col("s") / F.col("n_bigrams")), ppl_round).alias("ppl"),
    ).localCheckpoint()
    bg.unpersist()
    uni.unpersist()
    return out
