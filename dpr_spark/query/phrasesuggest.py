"""Phrase suggester — the ES `phrase` suggester ("did you mean" for the
WHOLE query): candidate rewrites of the query phrase scored with a
corpus bigram language model, not per-token spell checks in isolation
(that is query/fuzzy.spell_suggest, the `term` suggester).

Contract (deterministic, twin-checked):

- the query tokenizes in order (positions matter, duplicates kept);
- candidate generation (ES `direct_generator`): per position, up to
  `per_term` dictionary terms within `max_edits` Levenshtein distance
  sharing a `prefix_len` prefix, ranked (dist ASC, df DESC, term ASC);
- candidate phrases = the original phrase plus every single-position
  substitution (ES default max_errors≈1 — one corrected term per
  suggestion);
- each phrase scores with a stupid-backoff bigram LM over the corpus
  (Brants et al. 2007, the large-LM standard; ES uses the same family
  on its shingle field):

      score = log P(w1) + Σ_j log P(w_{j+1} | w_j)
      P(w' | w)  = c(w, w') / c(w)              if c(w, w') > 0
                 = alpha · P_uni(w')            otherwise
      P_uni(w)   = (c(w) + 1) / (T + V)         (Laplace)

  with T = total corpus tokens, V = unigram vocabulary size. The log
  fold is ordered by position for engine/twin float identity;
- top-`topn` per query by (score DESC, suggestion ASC).

Scale shape: the bigram LM is ONE extra aggregation over the tokenized
corpus (map-side combined (w1, w2) counts — the same shuffle class as
the dictionary build, vocab²-bounded in theory, Zipf-bounded in
practice). At query time everything query-sized broadcasts INTO the
big-side scans: positions into the dictionary for candidate expansion
(pushed levenshtein + prefix), the candidate pair set into the bigram
and unigram tables; the LM never shuffles or broadcasts. Suggestion
scoring folds ≤ positions·per_term rows per query.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpr_spark.index.build import InvertedIndex


@dataclass
class BigramLM:
    """Corpus bigram/unigram counts + scalars for stupid backoff."""

    bigrams: DataFrame  # w1, w2, c
    unigrams: DataFrame  # w, c
    total_tokens: int  # T
    vocab_size: int  # V


def build_bigram_lm(docs: DataFrame) -> BigramLM:
    """One tokenize pass over `docs(doc_id, text)` → adjacency counts.
    Counts the RAW token stream (identity analysis chain — the phrase
    suggester corrects surface forms, so the LM must see surface forms;
    an analyzed index still generates candidates from its own
    dictionary)."""
    from dpr_spark.functions.tokenizer import tokenize_col

    toks = tokenize_col("text", lowercase_first=True)
    t = docs.select(toks.alias("toks"))
    t = t.persist()
    uni = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n = F.size("toks")
    bi = (
        t.select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("w1"),
                    F.slice("toks", 2, n - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    uni = uni.persist()
    bi = bi.persist()
    # one job for both scalars (sum + vocab size ride the same agg)
    srow = uni.agg(F.sum("c").alias("s"), F.count("*").alias("v")).collect()[0]
    total = srow["s"] or 0
    vocab = srow["v"]
    t.unpersist()
    return BigramLM(bigrams=bi, unigrams=uni, total_tokens=int(total), vocab_size=int(vocab))


def _positions(queries: Sequence[Tuple[int, str]]):
    from dpr_spark.functions.normalize import normalize_question
    from dpr_spark.functions.tokenizer import tokenize

    rows, toks_by_qid = [], {}
    for qid, q in queries:
        toks = tokenize(normalize_question(q))
        toks_by_qid[qid] = toks
        for i, t in enumerate(toks):
            rows.append((qid, i + 1, t))
    return rows, toks_by_qid


def suggest_phrases(
    spark: SparkSession,
    queries: Sequence[Tuple[int, str]],
    index: InvertedIndex,
    lm: BigramLM,
    max_edits: int = 1,
    per_term: int = 3,
    topn: int = 3,
    alpha: float = 0.4,
    prefix_len: int = 1,
) -> DataFrame:
    """(qid, rank, suggestion, score) — top-`topn` whole-phrase rewrites
    per query (the original phrase always competes)."""
    pos_rows, toks_by_qid = _positions(queries)
    if not pos_rows:
        raise ValueError("no tokenizable queries")
    pdf = spark.createDataFrame(pos_rows, "qid long, pos int, token string")

    # --- candidate generation: positions broadcast INTO the dictionary
    # scan; pushed prefix filter (Lucene DirectSpellChecker pruning)
    dic = index.dictionary.select("term", "df")
    prefixes = sorted({t[:prefix_len] for _, _, t in pos_rows if t})
    if prefix_len > 0 and prefixes:
        from functools import reduce

        dic = dic.filter(
            reduce(
                lambda a, b: a | b,
                [F.col("term").startswith(p) for p in prefixes],
            )
        )
    cond = (F.levenshtein(F.col("term"), F.col("token"), max_edits) >= 1) & (
        F.levenshtein(F.col("term"), F.col("token"), max_edits) <= max_edits
    )
    if prefix_len > 0:
        cond = cond & (
            F.substring("term", 1, prefix_len)
            == F.substring("token", 1, prefix_len)
        )
    cand = (
        F.broadcast(pdf).join(dic, cond)
        .withColumn("dist", F.levenshtein(F.col("term"), F.col("token"), max_edits))
    )
    w = Window.partitionBy("qid", "pos").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    cand = (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= per_term)
        .select("qid", "pos", F.col("term").alias("cand"))
    )
    # the original phrase competes: substituting position 1 with its own
    # token reproduces it (expansion rows all have dist >= 1, no dupes)
    orig = spark.createDataFrame(
        [(qid, 1, toks[0]) for qid, toks in toks_by_qid.items() if toks],
        "qid long, pos int, cand string",
    )
    cand = cand.unionByName(orig)

    # --- per-suggestion bigram rows: original pairs (driver literal,
    # query-sized) with the substituted position patched in
    pair_rows, head_rows = [], []
    for qid, toks in toks_by_qid.items():
        if not toks:
            continue
        head_rows.append((qid, toks[0]))
        for j in range(1, len(toks)):
            pair_rows.append((qid, j, toks[j - 1], toks[j]))
    heads = spark.createDataFrame(head_rows, "qid long, h string")
    cand = cand.join(F.broadcast(heads), "qid")
    if pair_rows:
        pairs = spark.createDataFrame(
            pair_rows, "qid long, j int, w1 string, w2 string"
        )
        sp = cand.join(F.broadcast(pairs), "qid").select(
            "qid",
            "pos",
            "cand",
            "j",
            # pair j spans positions (j, j+1): w1 is position j, w2 is
            # position j+1 — patch whichever the substitution hits
            F.when(F.col("j") == F.col("pos"), F.col("cand"))
            .otherwise(F.col("w1"))
            .alias("w1"),
            F.when(F.col("j") == F.col("pos") - 1, F.col("cand"))
            .otherwise(F.col("w2"))
            .alias("w2"),
        )
    else:
        sp = None
    head_w = F.when(F.col("pos") == 1, F.col("cand")).otherwise(F.col("h"))
    heads_sub = cand.select("qid", "pos", "cand", head_w.alias("w"))

    # --- LM probabilities: candidate pair/term sets broadcast INTO the
    # count-table scans (the LM is the big side)
    t_v = float(lm.total_tokens + lm.vocab_size)
    alpha = float(alpha)

    def uni_prob(cu):
        return (cu.cast("double") + F.lit(1.0)) / F.lit(t_v)

    hscore = (
        heads_sub.join(
            # the semi-joined unigram slice is query-bounded — broadcast
            # it (the left side of a left join can't be the build side)
            F.broadcast(
                lm.unigrams.join(
                    F.broadcast(heads_sub.select(F.col("w")).distinct()), "w"
                ).withColumnRenamed("c", "cu")
            ),
            "w",
            "left",
        )
        .select(
            "qid", "pos", "cand",
            F.lit(0).alias("j"),
            F.log(uni_prob(F.coalesce(F.col("cu"), F.lit(0)))).alias("lp"),
        )
    )
    parts = [hscore]
    if sp is not None:
        pair_keys = sp.select("w1", "w2").distinct()
        bi = lm.bigrams.join(F.broadcast(pair_keys), ["w1", "w2"]).withColumnRenamed(
            "c", "cb"
        )
        u1_keys = sp.select(F.col("w1").alias("w")).distinct()
        u2_keys = sp.select(F.col("w2").alias("w")).distinct()
        u1 = lm.unigrams.join(F.broadcast(u1_keys), "w").select(
            F.col("w").alias("w1"), F.col("c").alias("cu1")
        )
        u2 = lm.unigrams.join(F.broadcast(u2_keys), "w").select(
            F.col("w").alias("w2"), F.col("c").alias("cu2")
        )
        scored_pairs = (
            sp.join(F.broadcast(bi), ["w1", "w2"], "left")
            .join(F.broadcast(u1), "w1", "left")
            .join(F.broadcast(u2), "w2", "left")
            .select(
                "qid", "pos", "cand", "j",
                F.log(
                    F.when(
                        F.coalesce(F.col("cb"), F.lit(0)) > 0,
                        F.col("cb").cast("double") / F.col("cu1").cast("double"),
                    ).otherwise(
                        F.lit(alpha)
                        * uni_prob(F.coalesce(F.col("cu2"), F.lit(0)))
                    )
                ).alias("lp"),
            )
        )
        parts.append(scored_pairs)
    allparts = parts[0]
    for p in parts[1:]:
        allparts = allparts.unionByName(p)
    # ordered log fold (j ascending) for float determinism
    scored = (
        allparts.groupBy("qid", "pos", "cand")
        .agg(F.sort_array(F.collect_list(F.struct("j", "lp"))).alias("lps"))
        .select(
            "qid", "pos", "cand",
            F.aggregate("lps", F.lit(0.0), lambda a, x: a + x["lp"]).alias(
                "score"
            ),
        )
    )
    # suggestion text: the original token array with position `pos`
    # replaced by the candidate
    toks_df = spark.createDataFrame(
        [(qid, toks) for qid, toks in toks_by_qid.items()],
        "qid long, toks array<string>",
    )
    scored = scored.join(F.broadcast(toks_df), "qid").select(
        "qid",
        F.concat_ws(
            " ",
            F.zip_with(
                "toks",
                F.sequence(F.lit(1), F.size("toks")),
                lambda t, i: F.when(i == F.col("pos"), F.col("cand")).otherwise(t),
            ),
        ).alias("suggestion"),
        "score",
    )
    # identical suggestions from different substitutions collapse
    # (max = same score either way up to float noise; keep the max)
    scored = scored.groupBy("qid", "suggestion").agg(F.max("score").alias("score"))
    wq = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("suggestion"))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= topn)
        .select("qid", "rank", "suggestion", "score")
    )
